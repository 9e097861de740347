"""Experiment config (same path layout as the reference configs/)."""
from indm_tpu.configs import get_config as _get


def get_config():
  return _get("vp/CIFAR10/indm_nll")
