"""Convert pytorch-fid InceptionV3 weights for the flax metric pipeline.

Run once wherever the torch weights are available (this environment has
torch-cpu but no network access to download them):

  python scripts/convert_inception.py --src pt_inception-2015-12-05.pth \
      --out inception_v3_fid.npz
  export INDM_INCEPTION_WEIGHTS=$PWD/inception_v3_fid.npz

`--src` accepts either a torch state_dict file or a torchscript archive;
without --src it tries torchvision/pytorch-fid download (needs network).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--src", default=None,
                 help="torch .pth state_dict (pytorch-fid layout)")
  p.add_argument("--out", default="inception_v3_fid.npz")
  args = p.parse_args()

  import torch

  os.environ.setdefault("JAX_PLATFORMS", "cpu")
  from indm_tpu.metrics import inception

  if args.src:
    try:
      # cleanfid torchscript archive (`inception-2015-12-05.pt`,
      # /root/reference/cleanfid/features.py:13-48): tfhub graph names
      ts = torch.jit.load(args.src, map_location="cpu")
      named = dict(ts.named_parameters())
      named.update(dict(ts.named_buffers()))
      state_dict = inception.torchscript_to_fid_state_dict(named)
    except RuntimeError:
      obj = torch.load(args.src, map_location="cpu", weights_only=False)
      state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj
      if any(k.split(".")[0].startswith(("mixed", "conv", "layers", "output"))
             for k in state_dict):
        state_dict = inception.torchscript_to_fid_state_dict(state_dict)
  else:
    # pytorch-fid's canonical weights (requires network access)
    url = ("https://github.com/mseitzer/pytorch-fid/releases/download/"
           "fid_weights/pt_inception-2015-12-05-6726825d.pth")
    state_dict = torch.hub.load_state_dict_from_url(url, map_location="cpu")

  inception.convert_torch_state_dict(state_dict, args.out)
  print(f"wrote {args.out}; set INDM_INCEPTION_WEIGHTS={os.path.abspath(args.out)}")


if __name__ == "__main__":
  main()
