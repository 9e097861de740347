"""Wolf flow presets (the reference's second, JSON config layer).

The reference selects a JSON file via `config.flow.model_config`
(`flow_models/flow_model.py:102`); the INDM experiments only ever use the
`resflow-gaussian-uni` presets. We keep the same path strings as keys so
reference configs resolve unchanged, and expose them as plain dicts.
Structure mirrors e.g.
`/root/reference/flow_models/wolf/wolf_configs/cifar10/glow/resflow-gaussian-uni.json`.
"""

import copy
import json
import os

_RESFLOW_GAUSSIAN_UNI_32 = {
    "generator": {"flow": {"type": "resflow"}},
    "discriminator": {
        "type": "gaussian",
        "encoder": {
            "type": "global_resnet_bn",
            "levels": 3,
            "in_planes": 3,
            "hidden_planes": [48, 96, 96],
            "out_planes": 8,
            "activation": "elu",
        },
        "in_dim": 128,
        "dim": 64,
        "prior": {
            "type": "flow",
            "num_steps": 2,
            "in_features": 64,
            "hidden_features": 256,
            "activation": "elu",
            "transform": "affine",
            "alpha": 1.0,
            "coupling_type": "mlp",
        },
    },
    "dequantizer": {"type": "uniform"},
}

# 64x64 preset: input is squeezed (flow.squeeze=True) so the encoder sees
# 12 input planes on a 32x32 grid.
_RESFLOW_GAUSSIAN_UNI_64 = copy.deepcopy(_RESFLOW_GAUSSIAN_UNI_32)
_RESFLOW_GAUSSIAN_UNI_64["discriminator"]["encoder"]["in_planes"] = 12

PRESETS = {
    "flow_models/wolf/wolf_configs/cifar10/glow/resflow-gaussian-uni.json":
        _RESFLOW_GAUSSIAN_UNI_32,
    "flow_models/wolf/wolf_configs/imagenet/64x64/glow/resflow-gaussian-uni.json":
        _RESFLOW_GAUSSIAN_UNI_64,
}


def load_wolf_params(model_config: str) -> dict:
  """Resolve a wolf model config: a registered preset key, a vendored JSON
  under indm_tpu/configs/wolf_configs/ (the full 22-preset matrix, addressed
  by the reference's path strings), or a filesystem JSON path."""
  if model_config in PRESETS:
    return copy.deepcopy(PRESETS[model_config])
  rel = model_config
  prefix = "flow_models/wolf/wolf_configs/"
  if rel.startswith(prefix):
    rel = rel[len(prefix):]
  vendored = os.path.join(os.path.dirname(__file__), "wolf_configs", rel)
  if os.path.exists(vendored):
    with open(vendored) as f:
      return json.load(f)
  if os.path.exists(model_config):
    with open(model_config) as f:
      return json.load(f)
  raise KeyError(f"Unknown wolf model config: {model_config!r}")
