"""Running meters (port of the reference's standalone training utilities,
`flow_models/resflow/utils.py` RunningAverageMeter / ExponentialMovingAverage
helpers)."""

from __future__ import annotations


class RunningAverageMeter:
  """EMA of a scalar metric."""

  def __init__(self, momentum: float = 0.99):
    self.momentum = momentum
    self.reset()

  def reset(self):
    self.val = None
    self.avg = 0.0

  def update(self, val: float):
    if self.val is None:
      self.avg = val
    else:
      self.avg = self.avg * self.momentum + val * (1 - self.momentum)
    self.val = val
    return self.avg
