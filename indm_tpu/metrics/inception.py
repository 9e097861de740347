"""InceptionV3 (FID variant) in flax, NHWC.

Re-implementation of the network behind the reference's two Inception paths
(`/root/reference/cleanfid/inception_pytorch.py:21-328` — the pytorch-fid
InceptionV3 with the FID modifications: count-exclude-pad average pools in
the A/C blocks and a max-pool branch in the last E block; 2048-d pool3
features + 1008-d logits).

Weights: this image has no network access and ships no Inception weights.
`load_params(path)` loads a converted .npz (see `convert_torch_state_dict`);
without a weight file, `random_params` builds deterministic random weights —
the full FID/KID/IS *pipeline* runs, with a loud warning that absolute
values are not comparable to reference FIDs until real weights are supplied
via $INDM_INCEPTION_WEIGHTS.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

POOL_DIM = 2048
LOGITS_DIM = 1008


class BasicConv(nn.Module):
  features: int
  kernel: Tuple[int, int]
  strides: Tuple[int, int] = (1, 1)
  padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0))

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = nn.Conv(self.features, self.kernel, strides=self.strides,
                padding=self.padding, use_bias=False)(x)
    x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(x)
    return jax.nn.relu(x)


def _avg_pool_exc_pad(x):
  """3x3 stride-1 avg pool, count_include_pad=False (FID modification)."""
  s = nn.pooling.pool(x, 0.0, jax.lax.add, (3, 3), (1, 1),
                      ((1, 1), (1, 1)))
  ones = jnp.ones_like(x[..., :1])
  cnt = nn.pooling.pool(ones, 0.0, jax.lax.add, (3, 3), (1, 1),
                        ((1, 1), (1, 1)))
  return s / cnt


def _max_pool(x, window=3, stride=2):
  return nn.max_pool(x, (window, window), strides=(stride, stride))


class InceptionA(nn.Module):
  pool_features: int

  @nn.compact
  def __call__(self, x, train=False):
    b1 = BasicConv(64, (1, 1), name="branch1x1")(x, train)
    b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x, train)
    b5 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)),
                   name="branch5x5_2")(b5, train)
    b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x, train)
    b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                   name="branch3x3dbl_2")(b3, train)
    b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                   name="branch3x3dbl_3")(b3, train)
    bp = _avg_pool_exc_pad(x)
    bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp, train)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
  @nn.compact
  def __call__(self, x, train=False):
    b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x, train)
    bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x, train)
    bd = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                   name="branch3x3dbl_2")(bd, train)
    bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(
        bd, train)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
  c7: int

  @nn.compact
  def __call__(self, x, train=False):
    c7 = self.c7
    b1 = BasicConv(192, (1, 1), name="branch1x1")(x, train)
    b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x, train)
    b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                   name="branch7x7_2")(b7, train)
    b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                   name="branch7x7_3")(b7, train)
    bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x, train)
    bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                   name="branch7x7dbl_2")(bd, train)
    bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                   name="branch7x7dbl_3")(bd, train)
    bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                   name="branch7x7dbl_4")(bd, train)
    bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                   name="branch7x7dbl_5")(bd, train)
    bp = _avg_pool_exc_pad(x)
    bp = BasicConv(192, (1, 1), name="branch_pool")(bp, train)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
  @nn.compact
  def __call__(self, x, train=False):
    b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x, train)
    b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(
        b3, train)
    b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x, train)
    b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                   name="branch7x7x3_2")(b7, train)
    b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                   name="branch7x7x3_3")(b7, train)
    b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(
        b7, train)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
  pool_type: str = "avg"  # FID: 'avg' for Mixed_7b, 'max' for Mixed_7c

  @nn.compact
  def __call__(self, x, train=False):
    b1 = BasicConv(320, (1, 1), name="branch1x1")(x, train)
    b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x, train)
    b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                    name="branch3x3_2a")(b3, train)
    b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                    name="branch3x3_2b")(b3, train)
    b3 = jnp.concatenate([b3a, b3b], axis=-1)
    bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x, train)
    bd = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)),
                   name="branch3x3dbl_2")(bd, train)
    bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                    name="branch3x3dbl_3a")(bd, train)
    bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                    name="branch3x3dbl_3b")(bd, train)
    bd = jnp.concatenate([bda, bdb], axis=-1)
    if self.pool_type == "avg":
      bp = _avg_pool_exc_pad(x)
    else:
      bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    bp = BasicConv(192, (1, 1), name="branch_pool")(bp, train)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
  """Pool3 features + logits. Input: [B, 299, 299, 3] in [0, 1]."""

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = 2 * x - 1  # TF normalization (inception_pytorch.py input scaling)
    x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x, train)
    x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x, train)
    x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)),
                  name="Conv2d_2b_3x3")(x, train)
    x = _max_pool(x)
    x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x, train)
    x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x, train)
    x = _max_pool(x)
    x = InceptionA(32, name="Mixed_5b")(x, train)
    x = InceptionA(64, name="Mixed_5c")(x, train)
    x = InceptionA(64, name="Mixed_5d")(x, train)
    x = InceptionB(name="Mixed_6a")(x, train)
    x = InceptionC(128, name="Mixed_6b")(x, train)
    x = InceptionC(160, name="Mixed_6c")(x, train)
    x = InceptionC(160, name="Mixed_6d")(x, train)
    x = InceptionC(192, name="Mixed_6e")(x, train)
    x = InceptionD(name="Mixed_7a")(x, train)
    x = InceptionE("avg", name="Mixed_7b")(x, train)
    x = InceptionE("max", name="Mixed_7c")(x, train)
    pool = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> 2048
    logits = nn.Dense(LOGITS_DIM, name="fc")(pool)
    return pool, logits


_MODULE = InceptionV3FID()


def random_params(seed: int = 0):
  """Deterministic random weights — pipeline-testing fallback."""
  logging.warning(
      "InceptionV3: no weight file found; using DETERMINISTIC RANDOM "
      "weights. FID/IS/KID values are internally consistent but NOT "
      "comparable to reference numbers. Set $INDM_INCEPTION_WEIGHTS to a "
      "converted .npz to enable real metrics.")
  x = jnp.zeros((1, 299, 299, 3))
  return _MODULE.init(jax.random.PRNGKey(seed), x, train=False)


# Provenance of the params most recently resolved by load_params /
# set_weights_source. weights_source() reports THIS (when set) rather than
# re-deriving from the environment, so a caller who loads custom params (or
# one who passes params= explicitly after announcing their source) gets an
# accurate provenance tag in FID reports.
_LAST_SOURCE: Optional[str] = None


def set_weights_source(source: str) -> None:
  """Record the provenance of externally-constructed Inception params so
  subsequent FID reports tag them correctly."""
  global _LAST_SOURCE
  _LAST_SOURCE = source


def weights_source(path: Optional[str] = None) -> str:
  """Provenance string for FID reports: the resolved weight-file path, or
  'random' when the deterministic fallback is in use. Every FID/IS/KID
  report carries this so random-weight pipeline numbers can never be
  mistaken for real FIDs. Prefers the source actually recorded at
  load_params time over env-var re-derivation."""
  if path is None and _LAST_SOURCE is not None:
    return _LAST_SOURCE
  path = path or os.environ.get("INDM_INCEPTION_WEIGHTS", "")
  if path and os.path.exists(path):
    return os.path.abspath(path)
  return "random"


def load_params(path: Optional[str] = None):
  """Load converted weights (.npz of flattened '/'-joined keys) or fall back
  to deterministic random weights."""
  global _LAST_SOURCE
  path = path or os.environ.get("INDM_INCEPTION_WEIGHTS", "")
  if not path or not os.path.exists(path):
    _LAST_SOURCE = "random"
    return random_params()
  import flax.serialization
  template = jax.eval_shape(
      lambda: _MODULE.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 299, 299, 3)), train=False))
  with open(path, "rb") as f:
    data = f.read()
  variables = flax.serialization.from_bytes(template, data)
  variables = jax.tree_util.tree_map(jnp.asarray, variables)
  logging.info("InceptionV3 weights loaded from %s", path)
  _LAST_SOURCE = os.path.abspath(path)
  return variables


# tfhub graph names of the FID inception ("pool_3" network) — the layout
# of the cleanfid torchscript `inception-2015-12-05.pt`
# (`/root/reference/cleanfid/features.py:13-48`) — keyed by the
# pytorch-fid module names this package's flax tree mirrors.
_TF_STEM = {
    "Conv2d_1a_3x3": "conv", "Conv2d_2a_3x3": "conv_1",
    "Conv2d_2b_3x3": "conv_2", "Conv2d_3b_1x1": "conv_3",
    "Conv2d_4a_3x3": "conv_4", "fc": "output",
}
_TF_MIXED = {
    "Mixed_5b": "mixed", "Mixed_5c": "mixed_1", "Mixed_5d": "mixed_2",
    "Mixed_6a": "mixed_3", "Mixed_6b": "mixed_4", "Mixed_6c": "mixed_5",
    "Mixed_6d": "mixed_6", "Mixed_6e": "mixed_7", "Mixed_7a": "mixed_8",
    "Mixed_7b": "mixed_9", "Mixed_7c": "mixed_10",
}
_TF_BRANCH = {
    # A blocks (5b/5c/5d)
    "branch1x1": "conv",
    "branch5x5_1": "tower.conv", "branch5x5_2": "tower.conv_1",
    "branch3x3dbl_1": "tower_1.conv", "branch3x3dbl_2": "tower_1.conv_1",
    "branch3x3dbl_3": "tower_1.conv_2",
    "branch_pool": "tower_2.conv",
    # B block (6a) reuses branch3x3dbl_* under 'tower'
    "branch3x3": "conv",
    # C blocks (6b-6e)
    "branch7x7_1": "tower.conv", "branch7x7_2": "tower.conv_1",
    "branch7x7_3": "tower.conv_2",
    "branch7x7dbl_1": "tower_1.conv", "branch7x7dbl_2": "tower_1.conv_1",
    "branch7x7dbl_3": "tower_1.conv_2", "branch7x7dbl_4": "tower_1.conv_3",
    "branch7x7dbl_5": "tower_1.conv_4",
    # D block (7a)
    "branch3x3_1": "tower.conv", "branch3x3_2": "tower.conv_1",
    "branch7x7x3_1": "tower_1.conv", "branch7x7x3_2": "tower_1.conv_1",
    "branch7x7x3_3": "tower_1.conv_2", "branch7x7x3_4": "tower_1.conv_3",
    # E blocks (7b/7c)
    "branch3x3_2a": "tower.mixed.conv", "branch3x3_2b": "tower.mixed.conv_1",
    "branch3x3dbl_3a": "tower_1.mixed.conv",
    "branch3x3dbl_3b": "tower_1.mixed.conv_1",
}
# 6a's branch3x3dbl_* live under 'tower' (not tower_1)
_TF_6A = {"branch3x3": "conv", "branch3x3dbl_1": "tower.conv",
          "branch3x3dbl_2": "tower.conv_1", "branch3x3dbl_3": "tower.conv_2"}


def _tf_unit_name(fid_module: str) -> str:
  """pytorch-fid module path -> tfhub unit name (e.g.
  'Mixed_6b.branch7x7dbl_3' -> 'mixed_5.tower_1.conv_2')."""
  parts = fid_module.split(".")
  if parts[0] in _TF_STEM:
    return _TF_STEM[parts[0]]
  block, branch = parts[0], parts[1]
  tf_block = _TF_MIXED[block]
  table = dict(_TF_BRANCH)
  if block == "Mixed_6a":
    table.update(_TF_6A)
  return f"{tf_block}.{table[branch]}"


def torchscript_to_fid_state_dict(named_tensors):
  """Translate the cleanfid torchscript layout
  (`/root/reference/cleanfid/features.py:13-48`: tfhub graph names —
  conv/conv_1..conv_4, mixed..mixed_10 with tower/tower_1/tower_2 branches,
  'output' logits head) into the pytorch-fid-style state_dict that
  `convert_torch_state_dict` consumes.

  `named_tensors`: flat {name: tensor} from the ScriptModule's
  named_parameters() + named_buffers(). Accepts '/'- or '.'-separated
  names with an optional leading 'layers.'/'base.'/'module.' prefix, and
  several conv/bn leaf spellings. TF inception fixes the BN scale at 1, so
  a missing gamma is synthesized as ones. Raises listing every unit it
  could not resolve — unknown layouts fail loudly, not silently."""
  import torch

  norm = {}
  for k, v in named_tensors.items():
    k = k.replace("/", ".")
    for prefix in ("layers.", "base.", "module.", "model."):
      if k.startswith(prefix):
        k = k[len(prefix):]
    norm[k] = v

  def find(unit, suffixes):
    for s in suffixes:
      if f"{unit}{s}" in norm:
        return norm[f"{unit}{s}"]
    return None

  fid_modules = (["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                  "Conv2d_3b_1x1", "Conv2d_4a_3x3"]
                 + [f"{b}.{br}" for b, branches in {
                     "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2",
                                  "branch3x3dbl_1", "branch3x3dbl_2",
                                  "branch3x3dbl_3", "branch_pool"],
                     "Mixed_6a": ["branch3x3", "branch3x3dbl_1",
                                  "branch3x3dbl_2", "branch3x3dbl_3"],
                     "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2",
                                  "branch7x7_3", "branch7x7dbl_1",
                                  "branch7x7dbl_2", "branch7x7dbl_3",
                                  "branch7x7dbl_4", "branch7x7dbl_5",
                                  "branch_pool"],
                     "Mixed_7a": ["branch3x3_1", "branch3x3_2",
                                  "branch7x7x3_1", "branch7x7x3_2",
                                  "branch7x7x3_3", "branch7x7x3_4"],
                     "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a",
                                  "branch3x3_2b", "branch3x3dbl_1",
                                  "branch3x3dbl_2", "branch3x3dbl_3a",
                                  "branch3x3dbl_3b", "branch_pool"],
                 }.items() for br in branches])
  # 5c/5d mirror 5b; 6c-6e mirror 6b; 7c mirrors 7b
  clones = {"Mixed_5c": "Mixed_5b", "Mixed_5d": "Mixed_5b",
            "Mixed_6c": "Mixed_6b", "Mixed_6d": "Mixed_6b",
            "Mixed_6e": "Mixed_6b", "Mixed_7c": "Mixed_7b"}
  for dst, src in clones.items():
    fid_modules += [m.replace(src, dst) for m in fid_modules
                    if m.startswith(src + ".")]

  out, missing = {}, []
  for m in fid_modules:
    unit = _tf_unit_name(m)
    w = find(unit, [".conv.weight", ".weight", ".w"])
    beta = find(unit, [".bn.bias", ".bn.beta", ".beta", ".bias"])
    mean = find(unit, [".bn.running_mean", ".bn.mean", ".mean",
                       ".running_mean"])
    var = find(unit, [".bn.running_var", ".bn.var", ".var", ".running_var"])
    gamma = find(unit, [".bn.weight", ".bn.gamma", ".gamma"])
    if w is None or beta is None or mean is None or var is None:
      missing.append((m, unit))
      continue
    out[f"{m}.conv.weight"] = w
    out[f"{m}.bn.weight"] = (gamma if gamma is not None
                             else torch.ones_like(beta))
    out[f"{m}.bn.bias"] = beta
    out[f"{m}.bn.running_mean"] = mean
    out[f"{m}.bn.running_var"] = var

  fc_w = find("output", [".weight", ".fc.weight", ".w"])
  fc_b = find("output", [".bias", ".fc.bias", ".b"])
  if fc_w is None or fc_b is None:
    missing.append(("fc", "output"))
  else:
    out["fc.weight"] = fc_w
    out["fc.bias"] = fc_b

  if missing:
    sample = sorted(norm)[:20]
    raise KeyError(
        f"torchscript layout: {len(missing)} units unresolved "
        f"(first: {missing[:5]}); available keys start with {sample}. "
        "Adapt the suffix tables in torchscript_to_fid_state_dict.")
  return out


def convert_torch_state_dict(state_dict, save_path: str):
  """Convert a pytorch-fid InceptionV3 state_dict (torch tensors) to the
  serialized flax variables this module loads. Run offline where torch
  weights are available."""
  import flax.serialization
  import flax.traverse_util as tu

  variables = jax.eval_shape(
      lambda: _MODULE.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 299, 299, 3)), train=False))
  flat = tu.flatten_dict(flax.serialization.to_state_dict(variables),
                         sep="/")
  out = {}
  for k in flat:
    parts = k.split("/")
    col = parts[0]  # 'params' | 'batch_stats'
    mod_path = parts[1:-1]
    leaf = parts[-1]
    torch_mod = ".".join(mod_path).replace("/", ".")
    # flax auto-names: BasicConv contains Conv_0 / BatchNorm_0
    torch_mod = torch_mod.replace(".Conv_0", ".conv").replace(
        ".BatchNorm_0", ".bn")
    if leaf == "kernel" and "fc" in torch_mod:
      t = state_dict[torch_mod + ".weight"].T
    elif leaf == "kernel":
      t = state_dict[torch_mod + ".weight"].permute(2, 3, 1, 0)
    elif leaf == "scale":
      t = state_dict[torch_mod + ".weight"]
    elif leaf == "bias":
      t = state_dict[torch_mod + ".bias"]
    elif leaf == "mean":
      t = state_dict[torch_mod + ".running_mean"]
    elif leaf == "var":
      t = state_dict[torch_mod + ".running_var"]
    else:
      raise KeyError(k)
    out[k] = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                        else t)
  unflat = tu.unflatten_dict({tuple(k.split("/")): v
                              for k, v in out.items()})
  with open(save_path, "wb") as f:
    f.write(flax.serialization.to_bytes(unflat))
  return save_path


def feature_extractor(params=None, batch_size: int = 64, mesh=None):
  """Return a callable images[0,1] NHWC (any size) -> (pool3, logits),
  resizing to 299 on device (bilinear; the clean-resize PIL path lives in
  indm_tpu.evaluation).

  The forward is sharded over the device mesh — the TPU-native equivalent
  of the reference's per-GPU tf.device Inception sharding
  (`evaluation.py:119-158`, SURVEY.md §2.7). Ragged tails are zero-padded
  to the fixed batch shape so every call hits the same executable."""
  from indm_tpu import parallel

  if params is None:
    params = load_params()
  if mesh is None:
    mesh = parallel.get_mesh()
  n_dev = len(mesh.devices.reshape(-1))
  batch_size = max(batch_size, n_dev) // n_dev * n_dev

  run = jax.jit(
      lambda x: _MODULE.apply(
          params,
          jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                           "bilinear"),
          train=False),
      in_shardings=parallel.batch_sharding(mesh))

  def run_with_retry(chunk):
    # Transient compile-service failures (this stack routes compiles
    # through a relay that can drop large programs) are retried —
    # the §5.3 self-healing ethos applied to eval infrastructure.
    for attempt in range(3):
      try:
        return run(jax.device_put(chunk, parallel.batch_sharding(mesh)))
      except jax.errors.JaxRuntimeError as e:  # pragma: no cover
        if "remote_compile" not in str(e) or attempt == 2:
          raise
        import time
        logging.warning("inception compile failed transiently (%s); "
                        "retrying (%d/3)", e, attempt + 2)
        time.sleep(5.0 * (attempt + 1))

  def extract(images: np.ndarray):
    pools, logits = [], []
    for i in range(0, len(images), batch_size):
      chunk = np.asarray(images[i:i + batch_size], np.float32)
      n = len(chunk)
      if n < batch_size:  # pad to the fixed shape, trim after
        chunk = np.concatenate(
            [chunk, np.zeros((batch_size - n,) + chunk.shape[1:],
                             np.float32)])
      p, l = run_with_retry(chunk)
      pools.append(np.asarray(p)[:n])
      logits.append(np.asarray(l)[:n])
    return np.concatenate(pools), np.concatenate(logits)

  return extract
