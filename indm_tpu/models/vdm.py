"""VDM variant: NCSN++ taking learned gamma(t) labels + trainable noise
schedule.

Port of `/root/reference/models/vdm.py`: the network is NCSN++ with two
behavioral differences — (1) the down/up resampling modules exist only when
auxiliary_resblock is on (`vdm.py:168-171,236-239`), and (2) no
scale_by_sigma output scaling (`vdm.py:409-411` removes it). The learnable
noise schedule is a monotone-ish MLP t -> gamma
(`vdm.py:413-421`), used via `models/utils.get_gamma_fn`
(`models/utils.py:127-138`).

Since INDM's shipped configs never enable the ddpm-resblock or
non-auxiliary paths for VDM, we reuse NCSNpp directly with a config shim:
for the supported configurations (biggan + auxiliary_resblock, the ones the
reference can actually run) the two module lists are identical.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from indm_tpu.models.ncsnpp import NCSNpp
from indm_tpu.models.registry import register_model


@register_model(name="vdm")
class VDM(nn.Module):
  config: Any

  @nn.compact
  def __call__(self, x, gamma_labels, train: bool = True):
    assert self.config.model.resblock_type.lower() == "biggan" and \
        self.config.model.auxiliary_resblock, (
            "VDM is supported for the biggan+auxiliary_resblock "
            "configuration (the only one the reference runs).")
    assert not self.config.model.scale_by_sigma, \
        "VDM has no scale_by_sigma output scaling (`vdm.py:409-411`)."
    return NCSNpp(self.config, name="backbone")(x, gamma_labels, train)


class NoiseSchedule(nn.Module):
  """Trainable scalar schedule t -> gamma (`vdm.py:413-421`):
  d1(t) + d3(sigmoid(d2(d1(t)))) with widths 1 -> 1024 -> 1."""

  @nn.compact
  def __call__(self, t):
    t = t.reshape(-1, 1)
    d1 = nn.Dense(1)(t)
    h = jax.nn.sigmoid(nn.Dense(1024)(d1))
    return (d1 + nn.Dense(1)(h)).reshape(-1)


def get_gamma_fn(config, gamma_minmax, schedule_params, schedule_module):
  """`models/utils.py:127-138`: normalize the schedule to [gamma0, gamma1]."""
  mn = schedule_module.apply(schedule_params, jnp.zeros((1,)))
  mx = schedule_module.apply(schedule_params, jnp.ones((1,)))

  def gamma_fn(t, detach: bool = True):
    g = schedule_module.apply(schedule_params, t)
    if detach:
      g = jax.lax.stop_gradient(g)
    return gamma_minmax[0] + (gamma_minmax[1] - gamma_minmax[0]) \
        * (g - mn) / (mx - mn)

  return gamma_fn
