"""MaCow: masked convolutional flows (wolf family), flax/NHWC.

Re-design of `/root/reference/flow_models/wolf/flows/macow.py`,
`couplings/coupling.py:403-628` (MaskedConvFlow) and
`nnet/shift_conv.py` (ShiftedConv2d). The autoregressive inverse — a
Python loop over rows/columns writing into a padded buffer in the
reference (`coupling.py:548-600`) — becomes a `lax.fori_loop` with
dynamic slices, fully on device.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu.flows.wolf import _ACTS
from indm_tpu.flows.wolf_glow import (ActNorm2dFlow, Conv1x1Flow,
                                      Conv2dWeightNorm, GlobalLinearCondNet,
                                      LocalLinearCondNet, NICE2d, _affine,
                                      _additive, register_flow, split2d,
                                      squeeze2d, unsplit2d, unsqueeze2d)

_TRANSFORMS = {"affine": (_affine, 2), "additive": (_additive, 1)}


class ShiftedConv2d(nn.Module):
  """Causally shifted conv (`nnet/shift_conv.py:8-61`), NHWC.
  order A: sees rows strictly above; B: strictly below; C: cols strictly
  left; D: strictly right."""
  features: int
  kernel_size: Tuple[int, int]
  order: str = "A"

  @nn.compact
  def __call__(self, x, shifted: bool = True):
    kh, kw = self.kernel_size
    if shifted:
      if self.order == "A":
        pad = ((kh, 0), ((kw - 1) // 2, (kw - 1) // 2))
        cut = (0, -1, 0, 0)
      elif self.order == "B":
        pad = ((0, kh), ((kw - 1) // 2, (kw - 1) // 2))
        cut = (1, 0, 0, 0)
      elif self.order == "C":
        pad = (((kh - 1) // 2, (kh - 1) // 2), (kw, 0))
        cut = (0, 0, 0, -1)
      elif self.order == "D":
        pad = (((kh - 1) // 2, (kh - 1) // 2), (0, kw))
        cut = (0, 0, 1, 0)
      else:
        raise ValueError(self.order)
      x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
      t, b, l, r = cut
      x = x[:, t: x.shape[1] + b, l: x.shape[2] + r, :]
    return nn.Conv(self.features, self.kernel_size, padding="VALID",
                   use_bias=False)(x)


class MCFBlock(nn.Module):
  """shifted conv -> (+h) -> act -> weight-norm 1x1
  (`couplings/blocks.py:124-153`)."""
  out_channels: int
  kernel_size: Tuple[int, int]
  hidden_channels: int
  order: str
  activation: str = "relu"

  def setup(self):
    self.shift_conv = ShiftedConv2d(self.hidden_channels, self.kernel_size,
                                    order=self.order)
    # zero-init, as the reference's MCFBlock.init (`blocks.py:152`)
    self.conv1x1 = Conv2dWeightNorm(self.out_channels, (1, 1),
                                    init_scale=0.0)

  def __call__(self, x, h=None, shifted: bool = True):
    c = self.shift_conv(x, shifted=shifted)
    if h is not None:
      c = c + h
    c = _ACTS[self.activation](c)
    return self.conv1x1(c)


class MaskedConvFlow(nn.Module):
  """Autoregressive masked-conv flow (`coupling.py:403-628`)."""
  in_channels: int
  kernel_size: Tuple[int, int]
  hidden_channels: Optional[int] = None
  h_channels: int = 0
  h_type: Optional[str] = None
  activation: str = "relu"
  order: str = "A"
  transform: str = "affine"
  alpha: float = 1.0

  def setup(self):
    hidden = self.hidden_channels
    if hidden is None:
      hidden = (4 * self.in_channels if self.in_channels <= 96
                else min(2 * self.in_channels, 512))
    self._hidden = hidden
    fn, mult = _TRANSFORMS[self.transform]
    self._tfn = fn
    self.net = MCFBlock(self.in_channels * mult, self.kernel_size, hidden,
                        self.order, self.activation)
    if self.h_type is None:
      self.h_net = None
    elif self.h_type == "local_linear":
      self.h_net = LocalLinearCondNet(hidden)
    elif self.h_type == "global_linear":
      self.h_net = GlobalLinearCondNet(hidden)
    else:
      raise NotImplementedError(self.h_type)

  def __call__(self, x, h=None, reverse: bool = False, train: bool = True):
    hc = self.h_net(h) if self.h_net is not None else None
    if not reverse:
      params = self.net(x, h=hc, shifted=True)
      out, ld = self._tfn(params, x, False, self.alpha)
      return out, ld
    out = self._invert(x, hc)
    params = self.net(out, h=hc, shifted=True)
    _, ld = self._tfn(params, out, False, self.alpha)
    return out, -ld

  def _invert(self, z, hc):
    """Autoregressive inverse (`coupling.py:548-600`) as a fori_loop over
    rows (orders A/B) or columns (C/D)."""
    if self.order in ("C", "D"):
      return self._invert_cols(z, hc, reverse=(self.order == "D"))
    return self._invert_rows(z, hc, reverse=(self.order == "B"))

  def _invert_rows(self, z, hc, reverse: bool):
    """`coupling.py:548-573` backward_height."""
    b, H, W, c = z.shape
    kh, kw = self.kernel_size
    cw = kw // 2
    buf = jnp.zeros((b, H + kh, W + 2 * cw, c), z.dtype)

    def solve_row(i, buf):
      hrow = (H - 1 - i) if reverse else i
      s_h = hrow + 1 if reverse else hrow
      curr_h = hrow if reverse else hrow + kh
      window = jax.lax.dynamic_slice(buf, (0, s_h, 0, 0),
                                     (b, kh, W + 2 * cw, c))
      hc_curr = None
      if hc is not None:
        if hc.shape[1] == 1 and hc.shape[2] == 1:
          hc_curr = hc
        else:
          hc_curr = jax.lax.dynamic_slice(
              hc, (0, hrow, 0, 0), (b, 1, hc.shape[2], hc.shape[3]))
      params = self.net(window, h=hc_curr, shifted=False)  # (b,1,W,·)
      in_row = jax.lax.dynamic_slice(z, (0, hrow, 0, 0), (b, 1, W, c))
      new_row, _ = self._tfn(params, in_row, True, self.alpha)
      new_row = jnp.pad(new_row, ((0, 0), (0, 0), (cw, cw), (0, 0)))
      return jax.lax.dynamic_update_slice(buf, new_row, (0, curr_h, 0, 0))

    buf = jax.lax.fori_loop(0, H, solve_row, buf)
    if reverse:
      return buf[:, :H, cw:cw + W, :]
    return buf[:, kh:, cw:cw + W, :]

  def _invert_cols(self, z, hc, reverse: bool):
    """`coupling.py:575-600` backward_width."""
    b, H, W, c = z.shape
    kh, kw = self.kernel_size
    ch = kh // 2
    buf = jnp.zeros((b, H + 2 * ch, W + kw, c), z.dtype)

    def solve_col(i, buf):
      wcol = (W - 1 - i) if reverse else i
      s_w = wcol + 1 if reverse else wcol
      curr_w = wcol if reverse else wcol + kw
      window = jax.lax.dynamic_slice(buf, (0, 0, s_w, 0),
                                     (b, H + 2 * ch, kw, c))
      hc_curr = None
      if hc is not None:
        if hc.shape[1] == 1 and hc.shape[2] == 1:
          hc_curr = hc
        else:
          hc_curr = jax.lax.dynamic_slice(
              hc, (0, 0, wcol, 0), (b, hc.shape[1], 1, hc.shape[3]))
      params = self.net(window, h=hc_curr, shifted=False)  # (b,H,1,·)
      in_col = jax.lax.dynamic_slice(z, (0, 0, wcol, 0), (b, H, 1, c))
      new_col, _ = self._tfn(params, in_col, True, self.alpha)
      new_col = jnp.pad(new_col, ((0, 0), (ch, ch), (0, 0), (0, 0)))
      return jax.lax.dynamic_update_slice(buf, new_col, (0, 0, curr_w, 0))

    buf = jax.lax.fori_loop(0, W, solve_col, buf)
    if reverse:
      return buf[:, ch:ch + H, :W, :]
    return buf[:, ch:ch + H, kw:, :]


class MaCowUnit(nn.Module):
  """MCF(A) MCF(B) actnorm MCF(C) MCF(D) actnorm (`macow.py:15-100`)."""
  in_channels: int
  kernel_size: Tuple[int, int]
  h_channels: int = 0
  transform: str = "affine"
  alpha: float = 1.0
  h_type: Optional[str] = None
  activation: str = "relu"

  def setup(self):
    kh, kw = self.kernel_size
    kw_args = dict(in_channels=self.in_channels, h_channels=self.h_channels,
                   transform=self.transform, alpha=self.alpha,
                   h_type=self.h_type, activation=self.activation)
    self.conv1 = MaskedConvFlow(kernel_size=(kh, kw), order="A", **kw_args)
    self.conv2 = MaskedConvFlow(kernel_size=(kh, kw), order="B", **kw_args)
    self.actnorm1 = ActNorm2dFlow(self.in_channels)
    self.conv3 = MaskedConvFlow(kernel_size=(kw, kh), order="C", **kw_args)
    self.conv4 = MaskedConvFlow(kernel_size=(kw, kh), order="D", **kw_args)
    self.actnorm2 = ActNorm2dFlow(self.in_channels)

  def __call__(self, x, h=None, reverse: bool = False, train: bool = True):
    mods = [self.conv1, self.conv2, self.actnorm1, self.conv3, self.conv4,
            self.actnorm2]
    if reverse:
      mods = mods[::-1]
    ld_total = jnp.zeros((x.shape[0],))
    for m in mods:
      if isinstance(m, ActNorm2dFlow):
        x, ld = m(x, reverse=reverse)
      else:
        x, ld = m(x, h=h, reverse=reverse, train=train)
      ld_total += ld
    return x, ld_total


class MaCowStep(nn.Module):
  """actnorm, 1x1 conv, 2 MaCow units, coupling pair, actnorm, 2 units,
  coupling pair (`macow.py:102-228`)."""
  in_channels: int
  kernel_size: Tuple[int, int]
  hidden_channels: int = 512
  h_channels: int = 0
  transform: str = "affine"
  alpha: float = 1.0
  h_type: Optional[str] = None
  activation: str = "relu"
  normalize: Optional[str] = None
  num_groups: Optional[int] = None

  def setup(self):
    nkw = dict(in_channels=self.in_channels,
               hidden_channels=self.hidden_channels,
               h_channels=self.h_channels, transform=self.transform,
               alpha=self.alpha, h_type=self.h_type,
               activation=self.activation, normalize=self.normalize,
               num_groups=self.num_groups)
    ukw = dict(in_channels=self.in_channels, kernel_size=self.kernel_size,
               h_channels=self.h_channels, transform=self.transform,
               alpha=self.alpha, h_type=self.h_type,
               activation=self.activation)
    self.actnorm1 = ActNorm2dFlow(self.in_channels)
    self.conv1x1 = Conv1x1Flow(self.in_channels)
    self.units1 = [MaCowUnit(**ukw) for _ in range(2)]
    self.coupling1_up = NICE2d(split_type="continuous", order="up", **nkw)
    self.coupling1_dn = NICE2d(split_type="continuous", order="down", **nkw)
    self.actnorm2 = ActNorm2dFlow(self.in_channels)
    self.units2 = [MaCowUnit(**ukw) for _ in range(2)]
    self.coupling2_up = NICE2d(split_type="skip", order="up", **nkw)
    self.coupling2_dn = NICE2d(split_type="skip", order="down", **nkw)

  def _mods(self):
    return ([self.actnorm1, self.conv1x1] + list(self.units1)
            + [self.coupling1_up, self.coupling1_dn, self.actnorm2]
            + list(self.units2)
            + [self.coupling2_up, self.coupling2_dn])

  def __call__(self, x, h=None, reverse: bool = False, train: bool = True):
    mods = self._mods()
    if reverse:
      mods = mods[::-1]
    ld_total = jnp.zeros((x.shape[0],))
    for m in mods:
      if isinstance(m, (ActNorm2dFlow, Conv1x1Flow)):
        x, ld = m(x, reverse=reverse)
      elif isinstance(m, NICE2d):
        x, ld = m(x, h=h, reverse=reverse, train=train)
      else:
        x, ld = m(x, h=h, reverse=reverse, train=train)
      ld_total += ld
    return x, ld_total


@register_flow("macow")
class MaCow(nn.Module):
  """MaCow over the wolf multi-scale architecture (`macow.py:229-250`).
  Shares the Glow multi-scale plumbing."""
  levels: int
  num_steps: Sequence
  in_channels: int
  factors: Sequence[int]
  hidden_channels: Sequence[int]
  kernel_size: Tuple[int, int] = (2, 3)
  h_channels: int = 0
  transform: str = "affine"
  prior_transform: str = "affine"
  alpha: float = 1.0
  h_type: Optional[str] = None
  activation: str = "relu"
  normalize: Optional[str] = None
  num_groups: Optional[Sequence[int]] = None

  def setup(self):
    from indm_tpu.flows.wolf_glow import MultiScalePrior
    assert self.levels > 1 and self.levels == len(self.num_steps)
    factors = [0] + list(self.factors) + [0]
    blocks, meta = [], []
    in_ch, h_ch = self.in_channels, self.h_channels
    squeeze_h = self.h_type is not None and self.h_type.startswith("local")
    self._squeeze_h = squeeze_h
    for level in range(self.levels):
      hidden = self.hidden_channels[level]
      ng = (self.num_groups[level] if self.normalize == "group_norm"
            else None)
      common = dict(kernel_size=tuple(self.kernel_size),
                    hidden_channels=hidden, h_channels=h_ch,
                    transform=self.transform, alpha=self.alpha,
                    h_type=self.h_type, activation=self.activation,
                    normalize=self.normalize, num_groups=ng)
      if level in (0, self.levels - 1):
        if level > 0:
          in_ch *= 4
          if squeeze_h:
            h_ch *= 4
        blocks.append([MaCowStep(in_channels=in_ch, **common)
                       for _ in range(self.num_steps[level])])
        meta.append(("external", None))
      else:
        in_ch *= 4
        if squeeze_h:
          h_ch *= 4
        factor = factors[level]
        layers, priors = [], []
        channel_step = in_ch // factor
        cc, ff = in_ch, factor
        for ns in self.num_steps[level]:
          layers.append([MaCowStep(in_channels=cc, **common)
                         for _ in range(ns)])
          priors.append(MultiScalePrior(
              in_channels=cc, hidden_channels=hidden, h_channels=h_ch,
              factor=ff, transform=self.prior_transform, alpha=self.alpha,
              h_type=self.h_type, activation=self.activation,
              normalize=self.normalize, num_groups=ng))
          cc -= channel_step
          ff -= 1
        blocks.append((layers, priors))
        meta.append(("internal", cc))
        in_ch = cc
    self.blocks_ = blocks
    self._meta = meta

  # multi-scale forward/backward identical in shape to wolf_glow.Glow
  __call__ = None  # replaced below

  @classmethod
  def from_params(cls, params: Dict) -> "MaCow":
    return MaCow(**params)


# Share the multi-scale traversal with Glow (identical logic).
from indm_tpu.flows.wolf_glow import Glow as _Glow  # noqa: E402

MaCow._run_block = _Glow._run_block
MaCow.__call__ = _Glow.__call__
