"""FID / KID / Inception Score math.

Port of the metric computations in `/root/reference/cleanfid/fid.py:27-98`
(frechet_distance via matrix sqrt, polynomial-kernel KID) and
`evaluation.py:274-337` (tfgan-style IS from logits). The matrix square
root runs on host via scipy (exactly like the reference); a Newton-Schulz
on-device variant is provided for TPU-resident pipelines.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
  """(mu, sigma) of [N, D] features."""
  mu = np.mean(features, axis=0)
  sigma = np.cov(features, rowvar=False)
  return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
  """FID between two Gaussians (`cleanfid/fid.py:27-81`)."""
  import scipy.linalg

  mu1 = np.atleast_1d(np.asarray(mu1, np.float64))
  mu2 = np.atleast_1d(np.asarray(mu2, np.float64))
  sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
  sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
  diff = mu1 - mu2

  covmean, _ = scipy.linalg.sqrtm(sigma1.dot(sigma2), disp=False)
  if not np.isfinite(covmean).all():
    offset = np.eye(sigma1.shape[0]) * eps
    covmean = scipy.linalg.sqrtm(
        (sigma1 + offset).dot(sigma2 + offset))
  if np.iscomplexobj(covmean):
    if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
      m = np.max(np.abs(covmean.imag))
      raise ValueError(f"Imaginary component {m}")
    covmean = covmean.real
  tr_covmean = np.trace(covmean)
  return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
               - 2 * tr_covmean)


def frechet_distance_newton_schulz(mu1, sigma1, mu2, sigma2,
                                   num_iters: int = 30) -> jnp.ndarray:
  """On-device FID via Newton-Schulz matrix sqrt (no host round trip)."""
  mu1, mu2 = jnp.asarray(mu1), jnp.asarray(mu2)
  s1, s2 = jnp.asarray(sigma1), jnp.asarray(sigma2)
  a = s1 @ s2
  d = a.shape[0]
  norm = jnp.linalg.norm(a)
  y = a / norm
  z = jnp.eye(d, dtype=a.dtype)

  def body(i, carry):
    y, z = carry
    t = 0.5 * (3.0 * jnp.eye(d, dtype=a.dtype) - z @ y)
    return y @ t, t @ z

  y, _ = jax.lax.fori_loop(0, num_iters, body, (y, z))
  sqrt_a = y * jnp.sqrt(norm)
  diff = mu1 - mu2
  return (diff @ diff + jnp.trace(s1) + jnp.trace(s2)
          - 2.0 * jnp.trace(sqrt_a))


def kernel_distance(feats1: np.ndarray, feats2: np.ndarray,
                    num_subsets: int = 100, max_subset_size: int = 1000,
                    seed: int = 0) -> float:
  """KID with the cubic polynomial kernel (`cleanfid/fid.py:83-98`)."""
  n = feats1.shape[1]
  m = min(min(feats1.shape[0], feats2.shape[0]), max_subset_size)
  rng = np.random.default_rng(seed)
  t = 0.0
  for _ in range(num_subsets):
    x = feats2[rng.choice(feats2.shape[0], m, replace=False)]
    y = feats1[rng.choice(feats1.shape[0], m, replace=False)]
    a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
    b = (x @ y.T / n + 1) ** 3
    t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
  return float(t / num_subsets / m)


def inception_score(logits: np.ndarray, splits: int = 1) -> float:
  """tfgan classifier-score from logits (`evaluation.py:274-337` path)."""
  scores = []
  n = logits.shape[0]
  probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
  probs = np.asarray(probs)
  for i in range(splits):
    part = probs[i * n // splits:(i + 1) * n // splits]
    kl = part * (np.log(part + 1e-12)
                 - np.log(np.mean(part, axis=0, keepdims=True) + 1e-12))
    scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
  return float(np.mean(scores))
