"""Shared layers for the score networks (NHWC, flax.linen).

Port of the building blocks in `/root/reference/models/layers.py` and
`models/layerspp.py`, re-designed for TPU: NHWC layout, channels-last
contractions (MXU-friendly), initializers expressed as flax initializers.
"""

from __future__ import annotations

import contextlib
import contextvars
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
from flax.linen import normalization as _flax_norm
import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu import ops


def get_act(name: str) -> Callable:
  """Activation dispatch (`models/layers.py:29-41`)."""
  name = name.lower()
  if name == "elu":
    return jax.nn.elu
  if name == "relu":
    return jax.nn.relu
  if name == "lrelu":
    return lambda x: jax.nn.leaky_relu(x, 0.2)
  if name == "swish":
    return jax.nn.silu
  raise NotImplementedError(f"activation {name} does not exist")


def default_init(scale: float = 1.0):
  """DDPM initializer: variance-scaling fan_avg uniform
  (`models/layers.py:54-91`)."""
  scale = 1e-10 if scale == 0 else scale
  return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


# ---------------------------------------------------------------------------
# Mixed-precision compute dtype (TPU-first; no reference counterpart).
#
# A trace-time scope: when set to bfloat16, every conv/NIN/attention matmul
# created inside it computes at MXU bf16 rate with f32 master params
# (flax `dtype=` casts inputs+params for compute only) and f32 accumulation
# for the einsums; GroupNorm statistics stay f32 (flax upcasts internally).
# Models opt in per-apply (`model.mixed_precision`), so golden tests and the
# reference-faithful configuration are untouched by default.
# ---------------------------------------------------------------------------

_COMPUTE_DTYPE = contextvars.ContextVar("score_compute_dtype", default=None)


def compute_dtype():
  return _COMPUTE_DTYPE.get()


@contextlib.contextmanager
def compute_dtype_scope(dtype):
  token = _COMPUTE_DTYPE.set(dtype)
  try:
    yield
  finally:
    _COMPUTE_DTYPE.reset(token)


_FAST_DROPOUT = contextvars.ContextVar("fast_dropout", default=False)


@contextlib.contextmanager
def fast_dropout_scope(enabled: bool):
  token = _FAST_DROPOUT.set(bool(enabled))
  try:
    yield
  finally:
    _FAST_DROPOUT.reset(token)


class Dropout(nn.Module):
  """`nn.Dropout` with an optional cheap-mask path (TPU-first knob).

  Default (scope off): bit-identical masks to flax `nn.Dropout` — the
  same `make_rng("dropout")` fold at the same module path feeds the same
  threefry bernoulli draw. Threefry masks are deterministic under GSPMD
  sharding (sharded == single-device, asserted in `tests/test_joint.py`).

  Fast path (`model.fast_dropout`, bench headline config): mask bits come
  from XLA's hardware `rng-bit-generator` (`rbg`) seeded from the same
  folded key. xprof (round 5) showed the threefry mask generation fused
  into the hot convs/wgrads of every resblock at ~4-6 ms/step; rbg is an
  order of magnitude cheaper. rbg bit streams are not guaranteed stable
  across shardings/backends — statistically equivalent dropout, not
  bit-reproducible across topology changes, hence opt-in.

  Both paths apply the mask in the activation's own dtype (flax's
  `x / keep` upcast to f32 doubled the mask-multiply's HBM traffic under
  mixed precision).
  """
  rate: float

  @nn.compact
  def __call__(self, x, deterministic: bool = False):
    if deterministic or self.rate == 0.0:
      return x
    rng = self.make_rng("dropout")
    keep = 1.0 - self.rate
    if _FAST_DROPOUT.get():
      data = jnp.ravel(jax.random.key_data(rng)).astype(jnp.uint32)[:2]
      rbg = jax.random.wrap_key_data(jnp.tile(data, 2), impl="rbg")
      mask = jax.random.bernoulli(rbg, keep, x.shape)
      scale = jnp.asarray(1.0 / keep, x.dtype)
      return jnp.where(mask, x * scale, jnp.zeros((), x.dtype))
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


def conv3x3(out_ch: int, init_scale: float = 1.0, stride: int = 1,
            bias: bool = True, padding="SAME", name=None) -> nn.Conv:
  """3x3 conv with DDPM init (`models/layers.py:118-124`)."""
  return nn.Conv(out_ch, (3, 3), strides=(stride, stride), padding=padding,
                 use_bias=bias, kernel_init=default_init(init_scale),
                 bias_init=nn.initializers.zeros, name=name,
                 dtype=compute_dtype())


def conv1x1(out_ch: int, init_scale: float = 1.0, stride: int = 1,
            bias: bool = True, name=None) -> nn.Conv:
  """1x1 conv with DDPM init (`models/layers.py:100-105`)."""
  return nn.Conv(out_ch, (1, 1), strides=(stride, stride), padding="SAME",
                 use_bias=bias, kernel_init=default_init(init_scale),
                 bias_init=nn.initializers.zeros, name=name,
                 dtype=compute_dtype())


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           max_positions: int = 10000) -> jnp.ndarray:
  """Sinusoidal embedding (`models/layers.py:515-530`)."""
  assert timesteps.ndim == 1
  half_dim = embedding_dim // 2
  emb = math.log(max_positions) / (half_dim - 1)
  emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
  emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
  emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
  if embedding_dim % 2 == 1:
    emb = jnp.pad(emb, ((0, 0), (0, 1)))
  assert emb.shape == (timesteps.shape[0], embedding_dim)
  return emb


class NIN(nn.Module):
  """1x1 channel mixing via einsum (`models/layers.py:532-556`)."""
  num_units: int
  init_scale: float = 0.1

  @nn.compact
  def __call__(self, x):
    in_dim = x.shape[-1]
    W = self.param("W", default_init(self.init_scale),
                   (in_dim, self.num_units))
    b = self.param("b", nn.initializers.zeros, (self.num_units,))
    # explicit rank-N x rank-2 dot_general: jnp.einsum's "...c,cd->...d"
    # lowering introduced a size-1 trailing dim whose layout forced XLA to
    # copy the whole activation around every NIN on TPU (xprof round 5)
    cd = compute_dtype()
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    if cd is not None:
      y = jax.lax.dot_general(x.astype(cd), W.astype(cd), dims,
                              preferred_element_type=jnp.float32)
      return (y + b).astype(cd)
    return jax.lax.dot_general(x, W, dims) + b


class GaussianFourierProjection(nn.Module):
  """Gaussian Fourier features for noise levels
  (`models/layerspp.py:45-54`). W is a fixed random buffer."""
  embedding_size: int = 256
  scale: float = 1.0

  @nn.compact
  def __call__(self, x):
    W = self.variable(
        "buffers", "W",
        lambda: jax.random.normal(self.make_rng("params"),
                                  (self.embedding_size,)) * self.scale)
    x_proj = x[:, None] * W.value[None, :] * 2 * jnp.pi
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def fixed_fourier_projection(x):
  """Fixed input Fourier features (+4C channels)
  (`models/layerspp.py:31-43`), NHWC."""
  s1 = jnp.sin(x * 128 * jnp.pi)
  c1 = jnp.cos(x * 128 * jnp.pi)
  s2 = jnp.sin(x * 256 * jnp.pi)
  c2 = jnp.cos(x * 256 * jnp.pi)
  return jnp.concatenate([x, s1, c1, s2, c2], axis=-1)


# ---------------------------------------------------------------------------
# Fused GroupNorm(+act) scope (TPU-first; no reference counterpart).
#
# When on (`model.fused_groupnorm`), GroupNorm — and, at `group_norm_act`
# call sites, the following swish — executes as the one-pass Pallas kernel
# pair in `indm_tpu/ops/group_norm_pallas.py` (one HBM read + one write per
# pass instead of XLA's stats-read + normalize-read + write). Off by
# default: the reference-faithful path is the exact flax GroupNorm math.
# ---------------------------------------------------------------------------

_FUSED_GROUPNORM = contextvars.ContextVar("fused_groupnorm", default=False)


@contextlib.contextmanager
def fused_groupnorm_scope(enabled: bool):
  token = _FUSED_GROUPNORM.set(bool(enabled))
  try:
    yield
  finally:
    _FUSED_GROUPNORM.reset(token)


def _fusable_act_name(act) -> Optional[str]:
  """Map an activation callable to the fused kernel's `act` selector."""
  if act is None:
    return "none"
  if act in (jax.nn.silu, jax.nn.swish):
    return "swish"
  return None


class GroupNorm(nn.GroupNorm):
  """flax `nn.GroupNorm` with an optional fused Pallas kernel path.

  The class name is kept as "GroupNorm" so flax auto-naming produces the
  same parameter tree (`GroupNorm_N/{scale,bias}`) as plain `nn.GroupNorm`
  — checkpoints are interchangeable and the converter
  (`models/convert.py`) is unaffected. When the fused-groupnorm scope is
  off (the default), the math below is the verbatim flax 0.12 GroupNorm
  body (same `_compute_stats`/`_normalize` helpers), bit-identical to the
  parent class.

  `fuse_act`: activation fused into the kernel ("none"|"swish") when the
  scope is on; callers apply unfused activations themselves.
  """
  fuse_act: str = "none"

  @nn.compact
  def __call__(self, x, *, mask=None):
    channels = x.shape[-1]
    assert self.num_groups is not None and self.group_size is None
    num_groups = self.num_groups
    assert channels % num_groups == 0, (channels, num_groups)
    group_size = channels // num_groups

    from indm_tpu.ops import group_norm_pallas
    interpret = jax.default_backend() != "tpu"
    fuse = (_FUSED_GROUPNORM.get() and x.ndim == 4 and mask is None
            and self.reduction_axes is None and self.axis_name is None
            and self.use_bias and self.use_scale
            # the real Mosaic lowering needs full-lane channels; narrow
            # layers (and tiny test geometries) take the flax path
            and (interpret or group_norm_pallas.supported_on_tpu(x)))
    if fuse:
      scale = self.param("scale", self.scale_init, (channels,),
                         self.param_dtype)
      bias = self.param("bias", self.bias_init, (channels,),
                        self.param_dtype)
      if self.dtype is not None:
        # match flax `dtype=` semantics: f32 stats, stored act in dtype
        x = x.astype(self.dtype)
      return group_norm_pallas.fused_group_norm_act(
          x, scale, bias, num_groups, eps=self.epsilon, act=self.fuse_act,
          interpret=interpret)

    # Reshape-free TPU path (same math as flax's use_fast_variance body):
    # flax reshapes the activation to [..., G, gs] for the statistics, and on
    # TPU that rank-5 reshape cannot share the conv-friendly NHWC layout —
    # XLA inserted a full-tensor layout copy around EVERY GroupNorm, fwd and
    # bwd (~760 copies/step in the score net, xprof round 5). Computing the
    # per-(H,W) moments first and folding groups on the tiny [B, C] result
    # needs no activation reshape at all. Reductions are f32; the normalize
    # is one broadcast FMA in the storage dtype.
    if (x.ndim == 4 and mask is None and self.reduction_axes is None
        and self.axis_name is None and self.use_fast_variance
        and self.use_bias and self.use_scale):
      scale = self.param("scale", self.scale_init, (channels,),
                         self.param_dtype)
      bias = self.param("bias", self.bias_init, (channels,),
                        self.param_dtype)
      B = x.shape[0]
      xf = x.astype(jnp.float32)
      m1 = jnp.mean(xf, axis=(1, 2))            # [B, C], fused single pass
      m2 = jnp.mean(xf * xf, axis=(1, 2))       # with m1 by XLA
      g1 = jnp.mean(m1.reshape(B, num_groups, group_size), axis=-1)
      g2 = jnp.mean(m2.reshape(B, num_groups, group_size), axis=-1)
      var = jnp.maximum(g2 - g1 * g1, 0.0)
      rstd = jax.lax.rsqrt(var + self.epsilon)  # [B, G]
      mul = (jnp.repeat(rstd, group_size, axis=-1)
             * scale.astype(jnp.float32)[None, :])
      add = (bias.astype(jnp.float32)[None, :]
             - jnp.repeat(g1, group_size, axis=-1) * mul)
      out_dtype = self.dtype or jnp.result_type(x, scale, bias)
      y = (xf * mul[:, None, None, :] + add[:, None, None, :])
      return y.astype(out_dtype)

    # verbatim flax GroupNorm body (flax/linen/normalization.py)
    if self.reduction_axes is not None:
      reduction_axes = self.reduction_axes
    else:
      reduction_axes = list(range(1, x.ndim - 1)) + [-1]
    reduction_axes = _flax_norm._canonicalize_axes(x.ndim, reduction_axes)
    group_shape = x.shape[:-1] + (num_groups, group_size)
    if mask is not None:
      mask = mask.reshape(mask.shape[:-1] + (num_groups, group_size))
    mean, var = _flax_norm._compute_stats(
        x.reshape(group_shape),
        list(reduction_axes[:-1]) + [-1],
        self.dtype,
        self.axis_name,
        self.axis_index_groups,
        use_fast_variance=self.use_fast_variance,
        mask=mask,
        force_float32_reductions=self.force_float32_reductions,
    )
    mean = jnp.repeat(mean, group_size, axis=-1)
    var = jnp.repeat(var, group_size, axis=-1)
    return _flax_norm._normalize(
        self, x, mean, var, reduction_axes[:-1], (-1,),
        self.dtype, self.param_dtype, self.epsilon,
        self.use_bias, self.use_scale, self.bias_init, self.scale_init,
        self.force_float32_reductions,
    )


def group_norm(x_ch: int, fuse_act: str = "none") -> GroupNorm:
  # dtype follows the mixed-precision scope: flax computes the statistics
  # in f32 regardless (`_compute_stats` promotes), so bf16 here only changes
  # the STORED activation dtype — halving the norm's HBM traffic and killing
  # the f32<->bf16 convert passes around every conv (xprof round 3: ~15 ms
  # of the 113 ms score step was convert/copy traffic at norm boundaries).
  return GroupNorm(num_groups=min(x_ch // 4, 32), epsilon=1e-6,
                   dtype=compute_dtype(), fuse_act=fuse_act)


def group_norm_act(x, act: Optional[Callable] = None,
                   num_groups: Optional[int] = None):
  """GroupNorm followed by an activation, fused into one Pallas pass when
  the fused-groupnorm scope is on and the activation is fusable."""
  c = x.shape[-1]
  ng = num_groups if num_groups is not None else min(c // 4, 32)
  name = _fusable_act_name(act)
  fuse_act = name if (name is not None and _FUSED_GROUPNORM.get()) else "none"
  y = GroupNorm(num_groups=ng, epsilon=1e-6, dtype=compute_dtype(),
                fuse_act=fuse_act)(x)
  if act is not None and fuse_act != "swish":
    y = act(y)
  return y


class Combine(nn.Module):
  """Combine skip pyramid (`models/layerspp.py:57-72`)."""
  dim2: int
  method: str = "cat"

  @nn.compact
  def __call__(self, x, y):
    h = conv1x1(self.dim2)(x)
    if self.method == "cat":
      return jnp.concatenate([h, y], axis=-1)
    if self.method == "sum":
      return h + y
    raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(nn.Module):
  """Spatial self-attention over HxW positions
  (`models/layerspp.py:75-104`), NHWC einsum form. At 16x16 this is a
  256-token single-head attention; XLA fuses the two einsums + softmax."""
  skip_rescale: bool = False
  init_scale: float = 0.0

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    h = group_norm(C)(x)
    q = NIN(C)(h)
    k = NIN(C)(h)
    v = NIN(C)(h)
    # flatten HxW -> N tokens: batched rank-3 dots lower to clean batched
    # matmuls on TPU, where the 4-D "bhwc,bijc->bhwij" einsum form forced
    # layout-flip copies of q/k/v/out around every attention (xprof round 5).
    # The HxW merge is layout-compatible (bitcast), not a copy.
    N = H * W
    q = q.reshape(B, N, C)
    k = k.reshape(B, N, C)
    v = v.reshape(B, N, C)
    cd = compute_dtype()
    if cd is not None:
      # bf16 MXU matmuls with f32 logits/softmax/accumulation
      w = jnp.einsum("bnc,bmc->bnm", q.astype(cd), k.astype(cd),
                     preferred_element_type=jnp.float32) * (int(C) ** (-0.5))
      w = jax.nn.softmax(w, axis=-1)
      h = jnp.einsum("bnm,bmc->bnc", w.astype(cd), v.astype(cd),
                     preferred_element_type=jnp.float32)
    else:
      w = jnp.einsum("bnc,bmc->bnm", q, k) * (int(C) ** (-0.5))
      w = jax.nn.softmax(w, axis=-1)
      h = jnp.einsum("bnm,bmc->bnc", w, v)
    h = h.reshape(B, H, W, C)
    h = NIN(C, init_scale=self.init_scale)(h)
    if not self.skip_rescale:
      return x + h
    return (x + h) / np.sqrt(2.0)


class Upsample(nn.Module):
  """`models/layerspp.py:107-139`, NHWC."""
  out_ch: Optional[int] = None
  with_conv: bool = False
  fir: bool = False
  fir_kernel: Sequence[int] = (1, 3, 3, 1)

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    out_ch = self.out_ch or C
    if not self.fir:
      h = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
      if self.with_conv:
        h = conv3x3(out_ch)(h)
    else:
      if not self.with_conv:
        h = ops.upsample_2d(x, self.fir_kernel, factor=2)
      else:
        h = FIRConv2d(out_ch, kernel=3, up=True,
                      resample_kernel=self.fir_kernel)(x)
    return h


class Downsample(nn.Module):
  """`models/layerspp.py:142-176`, NHWC."""
  out_ch: Optional[int] = None
  with_conv: bool = False
  fir: bool = False
  fir_kernel: Sequence[int] = (1, 3, 3, 1)

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    out_ch = self.out_ch or C
    if not self.fir:
      if self.with_conv:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = conv3x3(out_ch, stride=2, padding="VALID")(x)
      else:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
    else:
      if not self.with_conv:
        x = ops.downsample_2d(x, self.fir_kernel, factor=2)
      else:
        x = FIRConv2d(out_ch, kernel=3, down=True,
                      resample_kernel=self.fir_kernel)(x)
    return x


class FIRConv2d(nn.Module):
  """StyleGAN2 conv with fused FIR up/down sampling
  (`models/up_or_down_sampling.py:23-56`), NHWC/HWIO."""
  out_ch: int
  kernel: int = 3
  up: bool = False
  down: bool = False
  resample_kernel: Sequence[int] = (1, 3, 3, 1)
  use_bias: bool = True
  kernel_init: Callable = default_init()

  @nn.compact
  def __call__(self, x):
    assert not (self.up and self.down)
    in_ch = x.shape[-1]
    w = self.param("weight", self.kernel_init,
                   (self.kernel, self.kernel, in_ch, self.out_ch))
    if self.up:
      x = ops.upsample_conv_2d(x, w, k=self.resample_kernel)
    elif self.down:
      x = ops.conv_downsample_2d(x, w, k=self.resample_kernel)
    else:
      x = jax.lax.conv_general_dilated(
          x, w, window_strides=(1, 1), padding="SAME",
          dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if self.use_bias:
      b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
      x = x + b
    return x


class ResnetBlockDDPMpp(nn.Module):
  """DDPM-style resblock (`models/layerspp.py:179-222`), NHWC."""
  act: Callable
  out_ch: Optional[int] = None
  conv_shortcut: bool = False
  dropout: float = 0.1
  skip_rescale: bool = False
  init_scale: float = 0.0

  @nn.compact
  def __call__(self, x, temb=None, train: bool = True):
    in_ch = x.shape[-1]
    out_ch = self.out_ch or in_ch
    h = group_norm_act(x, self.act)
    h = conv3x3(out_ch)(h)
    if temb is not None:
      h += nn.Dense(out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros,
                    dtype=compute_dtype())(
                        self.act(temb))[:, None, None, :]
    h = group_norm_act(h, self.act)
    h = Dropout(self.dropout)(h, deterministic=not train)
    h = conv3x3(out_ch, init_scale=self.init_scale)(h)
    if in_ch != out_ch:
      if self.conv_shortcut:
        x = conv3x3(out_ch)(x)
      else:
        x = NIN(out_ch)(x)
    if not self.skip_rescale:
      return x + h
    return (x + h) / np.sqrt(2.0)


class ResnetBlockBigGANpp(nn.Module):
  """BigGAN-style resblock with in-block resampling
  (`models/layerspp.py:225-287`), NHWC."""
  act: Callable
  out_ch: Optional[int] = None
  up: bool = False
  down: bool = False
  dropout: float = 0.1
  fir: bool = False
  fir_kernel: Sequence[int] = (1, 3, 3, 1)
  skip_rescale: bool = True
  init_scale: float = 0.0

  @nn.compact
  def __call__(self, x, temb=None, train: bool = True):
    in_ch = x.shape[-1]
    out_ch = self.out_ch or in_ch
    h = group_norm_act(x, self.act)

    if self.up:
      if self.fir:
        h = ops.upsample_2d(h, self.fir_kernel, factor=2)
        x = ops.upsample_2d(x, self.fir_kernel, factor=2)
      else:
        h = ops.naive_upsample_2d(h, factor=2)
        x = ops.naive_upsample_2d(x, factor=2)
    elif self.down:
      if self.fir:
        h = ops.downsample_2d(h, self.fir_kernel, factor=2)
        x = ops.downsample_2d(x, self.fir_kernel, factor=2)
      else:
        h = ops.naive_downsample_2d(h, factor=2)
        x = ops.naive_downsample_2d(x, factor=2)

    h = conv3x3(out_ch)(h)
    if temb is not None:
      h += nn.Dense(out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros,
                    dtype=compute_dtype())(
                        self.act(temb))[:, None, None, :]
    h = group_norm_act(h, self.act)
    h = Dropout(self.dropout)(h, deterministic=not train)
    h = conv3x3(out_ch, init_scale=self.init_scale)(h)

    if in_ch != out_ch or self.up or self.down:
      x = conv1x1(out_ch)(x)

    if not self.skip_rescale:
      return x + h
    return (x + h) / np.sqrt(2.0)
