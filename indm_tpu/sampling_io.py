"""Sample caching + image grid IO.

Re-design of `/root/reference/sampling_lib.py`: every sampling artifact is
an npz cached by round index and skipped when present (idempotent eval —
SURVEY.md §5.3), PNG grids are written with PIL, and when only before-flow
samples exist the flow inverse is re-applied in chunks
(`sampling_lib.py:144-170`).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def image_grid(samples: np.ndarray, grid_size: Optional[int] = None):
  """Tile [N,H,W,C] uint8 samples into one grid image."""
  n, h, w, c = samples.shape
  if grid_size is None:
    grid_size = int(np.floor(np.sqrt(n)))
  k = grid_size * grid_size
  g = samples[:k].reshape(grid_size, grid_size, h, w, c)
  g = g.transpose(0, 2, 1, 3, 4).reshape(grid_size * h, grid_size * w, c)
  return g


def save_png(path: str, samples: np.ndarray):
  from PIL import Image
  g = image_grid(samples)
  if g.shape[-1] == 1:
    g = g[..., 0]
  Image.fromarray(g).save(path)


def _to_uint8(x) -> np.ndarray:
  x = np.asarray(x)
  return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def sample_paths(config, sample_dir, r):
  """Artifact names mirror the reference (`sampling_lib.py:31-109`).

  In the denoise/more_step variants the before-flow cache is suffixed too
  (`samples_{r}_before_flow_denoise_{t}.npz` / `..._before_flow_more_step.npz`,
  `sampling_lib.py:62,76,122`) — the UNsuffixed `samples_{r}_before_flow.npz`
  holds the base trajectory those variants resume from."""
  suffix = ""
  if config.sampling.pc_denoise:
    suffix = f"_denoise_{config.sampling.pc_denoise_time}"
  elif config.sampling.more_step:
    suffix = "_more_step"
  return {
      "after": os.path.join(sample_dir, f"samples_{r}{suffix}.npz"),
      "before": os.path.join(sample_dir,
                             f"samples_{r}_before_flow{suffix}.npz"),
      "base": os.path.join(sample_dir, f"samples_{r}_before_flow.npz"),
      "search": os.path.join(sample_dir,
                             f"samples_{r}_before_flow_for_search.npz"),
      "png": os.path.join(sample_dir, f"samples_{r}{suffix}.png"),
  }


def get_samples(config, flow_inverse, sample_round, step, r,
                sample_dir, rng=None, temperature: float = 1.0,
                data_mean=None, before_data=None):
  """Run one sampling round and cache npz + PNG; skip when cached
  (`sampling_lib.py:31-76`). Returns the after-flow uint8 samples.

  `sample_round(rng, temperature, data_mean, before_data)` is the jitted
  sampler (see run_lib.make_jit_sample_round); `flow_inverse` is kept for
  the cached before-flow re-application path."""
  os.makedirs(sample_dir, exist_ok=True)
  paths = sample_paths(config, sample_dir, r)
  if os.path.exists(paths["after"]):
    with np.load(paths["after"]) as z:
      return z["samples"]

  # re-use cached (variant-suffixed) before-flow samples when available
  if before_data is None and os.path.exists(paths["before"]):
    with np.load(paths["before"]) as z:
      before = z["samples"].astype(np.float32) / 255.0
    after = apply_flow_inverse_chunked(config, flow_inverse, before,
                                       temperature)
    np.savez_compressed(paths["after"], samples=_to_uint8(after))
    return _to_uint8(after)

  # denoise/more_step resume a previously cached trajectory instead of
  # sampling from the prior (`sampling_lib.py:60-109`): VE denoise-search
  # reloads the step-(N-2) state (`..._before_flow_for_search.npz`), the
  # others the final before-flow samples.
  final_time = (config.sampling.pc_denoise_time
                if config.sampling.pc_denoise else 0.0)
  if (before_data is None
      and (config.sampling.pc_denoise or config.sampling.more_step)):
    src = (paths["search"]
           if config.sampling.pc_denoise and config.training.sde == "vesde"
           else paths["base"])
    if os.path.exists(src):
      from indm_tpu import data as data_lib
      with np.load(src) as z:
        raw = z["samples"].astype(np.float32) / 255.0
      before_data = jnp.asarray(data_lib.get_data_scaler(config)(raw))
      logging.info("round %s: resuming cached trajectory %s "
                   "(final_time=%s)", r, os.path.basename(src), final_time)

  if rng is None:
    rng = jax.random.PRNGKey(int(step) * 1000 + int(r) % 1000)
  before, after, search, nfe = sample_round(
      rng, temperature=temperature, data_mean=data_mean,
      before_data=before_data, final_time=final_time)
  logging.info("sampling round %s done (nfe=%s)", r, int(nfe))

  before_u8 = _to_uint8(before)
  after_u8 = _to_uint8(after)
  np.savez_compressed(paths["before"], samples=before_u8)
  np.savez_compressed(paths["after"], samples=after_u8)
  if search is not None:
    np.savez_compressed(paths["search"], samples=_to_uint8(search))
  try:
    save_png(paths["png"], after_u8[:64])
  except Exception as e:  # PNG is best-effort
    logging.warning("PNG grid write failed: %s", e)
  return after_u8


def apply_flow_inverse_chunked(config, flow_inverse, before01: np.ndarray,
                               temperature: float, chunk: int = 16):
  """Re-apply the flow inverse in chunks of 16 (`sampling_lib.py:144-170`).
  `before01` holds inverse-scaled samples in [0,1]; the flow operates in
  model space, so we re-apply the scaler first."""
  from indm_tpu import data as data_lib
  scaler = data_lib.get_data_scaler(config)
  outs = []
  for i in range(0, len(before01), chunk):
    x = jnp.asarray(scaler(before01[i:i + chunk]))
    z = flow_inverse(x * temperature) if flow_inverse is not None else x
    inv = data_lib.get_data_inverse_scaler(config)
    outs.append(np.asarray(inv(z)))
  return np.concatenate(outs)


def load_all_samples(config, sample_dir) -> np.ndarray:
  """Collect every cached after-flow round (`evaluation.py` walks the same
  files)."""
  outs = []
  for name in sorted(os.listdir(sample_dir)):
    if name.startswith("samples_") and name.endswith(".npz") \
        and "before_flow" not in name:
      with np.load(os.path.join(sample_dir, name)) as z:
        outs.append(z["samples"])
  if not outs:
    return np.zeros((0, config.data.image_size, config.data.image_size,
                     config.data.num_channels), np.uint8)
  return np.concatenate(outs)
