"""2-D toy densities + flow visualization for the standalone resflow
trainer utilities (`flow_models/resflow/toy_data.py`,
`visualize_flow.py` parity — SURVEY.md §2.4).

Re-designed with an explicit numpy Generator (no global RNG, no sklearn
dependency: swissroll/circles/moons are generated from their closed
forms) so toy runs are reproducible under any parallel test harness.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

TOY_DATASETS = ("swissroll", "circles", "rings", "moons", "8gaussians",
                "pinwheel", "2spirals", "checkerboard", "line", "cos")


def inf_train_gen(data: str, batch_size: int = 200,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
  """One batch of the named 2-D toy dataset, float32 [batch, 2]."""
  r = rng if rng is not None else np.random.default_rng()

  if data == "swissroll":
    t = 1.5 * np.pi * (1 + 2 * r.random(batch_size))
    x = t * np.cos(t) + r.normal(scale=1.0, size=batch_size)
    y = t * np.sin(t) + r.normal(scale=1.0, size=batch_size)
    return (np.stack([x, y], 1) / 5.0).astype(np.float32)

  if data == "circles":
    half = batch_size // 2
    t = 2 * np.pi * r.random(batch_size)
    rad = np.where(np.arange(batch_size) < half, 1.0, 0.5)
    pts = np.stack([rad * np.cos(t), rad * np.sin(t)], 1)
    pts += r.normal(scale=0.08, size=pts.shape)
    return (pts * 3.0).astype(np.float32)

  if data == "rings":
    n4 = n3 = n2 = batch_size // 4
    n1 = batch_size - n4 - n3 - n2
    pieces = []
    for n, rad in ((n4, 1.0), (n3, 0.75), (n2, 0.5), (n1, 0.25)):
      t = np.linspace(0, 2 * np.pi, n, endpoint=False)
      pieces.append(np.stack([rad * np.cos(t), rad * np.sin(t)], 1))
    pts = np.concatenate(pieces) * 3.0
    r.shuffle(pts)
    pts = pts + r.normal(scale=0.08, size=pts.shape)
    return pts.astype(np.float32)

  if data == "moons":
    half = batch_size // 2
    t1 = np.pi * r.random(half)
    t2 = np.pi * r.random(batch_size - half)
    upper = np.stack([np.cos(t1), np.sin(t1)], 1)
    lower = np.stack([1 - np.cos(t2), -np.sin(t2) + 0.5], 1)
    pts = np.concatenate([upper, lower])
    pts += r.normal(scale=0.1, size=pts.shape)
    return (pts * 2 + np.array([-1, -0.2])).astype(np.float32)

  if data == "8gaussians":
    scale = 4.0
    s2 = 1.0 / math.sqrt(2)
    centers = scale * np.array(
        [(1, 0), (-1, 0), (0, 1), (0, -1), (s2, s2), (s2, -s2), (-s2, s2),
         (-s2, -s2)], np.float32)
    idx = r.integers(0, 8, size=batch_size)
    pts = r.normal(scale=0.5, size=(batch_size, 2)) + centers[idx]
    return (pts / 1.414).astype(np.float32)

  if data == "pinwheel":
    num_classes, rate = 5, 0.25
    num_per_class = batch_size // num_classes
    n = num_classes * num_per_class
    rads = np.linspace(0, 2 * np.pi, num_classes, endpoint=False)
    feats = r.normal(size=(n, 2)) * np.array([0.3, 0.1])
    feats[:, 0] += 1.0
    labels = np.repeat(np.arange(num_classes), num_per_class)
    angles = rads[labels] + rate * np.exp(feats[:, 0])
    rot = np.stack([np.cos(angles), -np.sin(angles),
                    np.sin(angles), np.cos(angles)])
    rot = rot.T.reshape(-1, 2, 2)
    pts = 2 * np.einsum("ti,tij->tj", feats, rot)
    return pts[r.permutation(n)].astype(np.float32)

  if data == "2spirals":
    half = batch_size // 2
    n = np.sqrt(r.random((half, 1))) * 540 * (2 * np.pi) / 360
    d1x = -np.cos(n) * n + r.random((half, 1)) * 0.5
    d1y = np.sin(n) * n + r.random((half, 1)) * 0.5
    pts = np.vstack([np.hstack([d1x, d1y]), np.hstack([-d1x, -d1y])]) / 3
    pts += r.normal(scale=0.1, size=pts.shape)
    return pts.astype(np.float32)

  if data == "checkerboard":
    x1 = r.random(batch_size) * 4 - 2
    x2 = (r.random(batch_size) - r.integers(0, 2, batch_size) * 2
          + (np.floor(x1) % 2))
    return (np.stack([x1, x2], 1) * 2).astype(np.float32)

  if data == "line":
    x = r.random(batch_size) * 5 - 2.5
    return np.stack([x, x], 1).astype(np.float32)

  if data == "cos":
    x = r.random(batch_size) * 5 - 2.5
    return np.stack([x, np.sin(x) * 2.5], 1).astype(np.float32)

  return inf_train_gen("8gaussians", batch_size, rng=r)


def density_grid(logprob_fn, low: float = -4.0, high: float = 4.0,
                 npts: int = 100) -> np.ndarray:
  """exp(logprob) on an [npts, npts] grid (`visualize_flow.py` density
  panels)."""
  side = np.linspace(low, high, npts, dtype=np.float32)
  xx, yy = np.meshgrid(side, side)
  pts = np.stack([xx.ravel(), yy.ravel()], 1)
  logp = np.asarray(logprob_fn(pts)).reshape(npts, npts)
  return np.exp(logp - logp.max())


def save_density_png(path: str, logprob_fn, low: float = -4.0,
                     high: float = 4.0, npts: int = 100):
  """Render the model density to a grayscale PNG (the matplotlib-free
  equivalent of `visualize_flow.plt_flow_density`)."""
  from PIL import Image
  dens = density_grid(logprob_fn, low, high, npts)
  img = (dens / (dens.max() + 1e-12) * 255).astype(np.uint8)
  Image.fromarray(img[::-1], mode="L").save(path)
  return path
