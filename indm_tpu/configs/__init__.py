"""Named experiment configs.

`get_config("vp/CIFAR10/indm_nll")` resolves the same experiment matrix the
reference ships as Python files under `/root/reference/configs/`.
"""

from indm_tpu.configs.defaults import get_default_configs, ve_indm, vp_indm

_REGISTRY = {
    "vp/CIFAR10/indm_nll": lambda: vp_indm("CIFAR10", nll=True),
    "vp/CIFAR10/indm_fid": lambda: vp_indm("CIFAR10", nll=False),
    "vp/CELEBA/indm_nll": lambda: vp_indm("CELEBA", nll=True),
    "vp/CELEBA/indm_fid": lambda: vp_indm("CELEBA", nll=False),
    "ve/CIFAR10/indm": lambda: ve_indm("CIFAR10"),
    "ve/CELEBA/indm": lambda: ve_indm("CELEBA"),
}


def list_configs():
  return sorted(_REGISTRY)


def get_config(name: str):
  name = name.replace(".py", "").strip("/")
  if name.startswith("configs/"):
    name = name[len("configs/"):]
  if name not in _REGISTRY:
    raise KeyError(f"Unknown config {name!r}; available: {list_configs()}")
  return _REGISTRY[name]()
