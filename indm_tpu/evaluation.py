"""Evaluation: FID/IS/KID over cached samples + the bits/dim harness.

Re-design of `/root/reference/evaluation.py` and the clean-fid pipelines
(`cleanfid/fid.py:109-384`): features come from the flax InceptionV3
(`indm_tpu.metrics.inception`) computed on the device mesh (replacing the
reference's per-GPU tf.device sharding, `evaluation.py:119-158`), dataset
statistics load from `assets/stats/*.npz` or are computed+cached from the
on-disk dataset, and every artifact (latents, statistics, reports) is an
idempotent npz cache (SURVEY.md §5.3).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu import data as data_lib
from indm_tpu.metrics import (compute_statistics, frechet_distance,
                              inception_score, kernel_distance)
from indm_tpu.metrics import inception as inception_lib


def clean_resize(images_u8: np.ndarray, size: int = 299) -> np.ndarray:
  """clean-fid resize: PIL float bicubic per channel
  (`cleanfid/resize.py:20-67`). Input uint8 NHWC -> float32 [0,255]."""
  from PIL import Image
  out = np.empty((len(images_u8), size, size, images_u8.shape[-1]),
                 np.float32)
  for i, img in enumerate(images_u8):
    for c in range(img.shape[-1]):
      ch = Image.fromarray(img[..., c].astype(np.float32), mode="F")
      out[i, ..., c] = np.asarray(
          ch.resize((size, size), resample=Image.BICUBIC))
  return out


def get_inception_features(images_u8: np.ndarray, params=None,
                           mode: str = "clean",
                           batch_size: int = 64) -> Tuple[np.ndarray,
                                                          np.ndarray]:
  """(pool3 [N,2048], logits [N,1008]) from uint8 NHWC samples."""
  if params is None:
    params = inception_lib.load_params()
  if mode == "clean":
    resized = clean_resize(images_u8) / 255.0
    extract = inception_lib.feature_extractor(params, batch_size)
    # already 299 — the extractor's resize is then a no-op
    return extract(resized)
  extract = inception_lib.feature_extractor(params, batch_size)
  return extract(images_u8.astype(np.float32) / 255.0)


def dataset_statistics(config, assetdir: Optional[str], params=None,
                       mode: str = "clean"):
  """Real-data (mu, sigma): load `assets/stats/{dataset}_stats.npz`
  (`evaluation.py:53-68`) if present, else compute from the on-disk
  dataset and cache (`cleanfid/fid.py:291-384`)."""
  name = config.data.dataset.lower()
  candidates = []
  if assetdir:
    candidates += [os.path.join(assetdir, f"{name}_stats.npz"),
                   os.path.join(assetdir, "stats", f"{name}_stats.npz")]
  candidates.append(os.path.join(config.datadir,
                                 f"{name}_fid_stats_{mode}.npz"))
  for path in candidates:
    if os.path.exists(path):
      with np.load(path) as z:
        if "mu" in z:
          return z["mu"], z["sigma"], path
        # score_sde-style stats store raw pool_3 features
        if "pool_3" in z:
          mu, sigma = compute_statistics(z["pool_3"])
          return mu, sigma, path

  logging.info("computing dataset FID statistics (cached afterwards)...")
  train, _ = data_lib.load_arrays(config)
  feats, _ = get_inception_features(train, params=params, mode=mode)
  mu, sigma = compute_statistics(feats)
  cache = candidates[-1]
  os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
  np.savez_compressed(cache, mu=mu, sigma=sigma)
  return mu, sigma, cache


def compute_fid_and_is(config, sample_dir, assetdir=None,
                       num_samples: Optional[int] = None, params=None,
                       mode: str = "clean"):
  """Walk cached sample npz rounds, extract features (cached per round),
  compute FID/IS/KID, persist a report npz (`evaluation.py:160-349`)."""
  if params is None:
    params = inception_lib.load_params()

  pools, logits = [], []
  for name in sorted(os.listdir(sample_dir)):
    if not (name.startswith("samples_") and name.endswith(".npz")):
      continue
    if "before_flow" in name:
      continue
    lat_path = os.path.join(sample_dir, name.replace("samples_",
                                                     "latents_"))
    if os.path.exists(lat_path):
      with np.load(lat_path) as z:
        pools.append(z["pool_3"])
        logits.append(z["logits"])
      continue
    with np.load(os.path.join(sample_dir, name)) as z:
      samples = z["samples"]
    p, l = get_inception_features(samples, params=params, mode=mode)
    np.savez_compressed(lat_path, pool_3=p, logits=l)
    pools.append(p)
    logits.append(l)

  if not pools:
    raise FileNotFoundError(f"no cached samples under {sample_dir}")
  pools = np.concatenate(pools)
  logits_all = np.concatenate(logits)
  if num_samples:
    pools = pools[:num_samples]
    logits_all = logits_all[:num_samples]

  mu_fake, sigma_fake = compute_statistics(pools)
  mu_real, sigma_real, stats_src = dataset_statistics(config, assetdir,
                                                      params, mode)
  fid = frechet_distance(mu_fake, sigma_fake, mu_real, sigma_real)
  is_score = inception_score(logits_all)
  report = {"fid": fid, "inception_score": is_score,
            "num_samples": len(pools),
            # 'random' => architecture-only weights: values are internally
            # consistent but NOT comparable to reference FID numbers.
            "weights": inception_lib.weights_source()}
  # KID needs RAW real features (`evaluation.py:322-333` uses the stats
  # file's pool_3 activations); available when the score_sde-style stats
  # npz carries them.
  real_feats = _raw_real_features(config, assetdir)
  if real_feats is not None:
    report["kid"] = kernel_distance(pools, real_feats)
  logging.info("FID: %.4f, IS: %.4f, KID: %s (N=%d, stats=%s, weights=%s)",
               fid, is_score, report.get("kid", "n/a"), len(pools),
               stats_src, report["weights"])
  np.savez_compressed(os.path.join(sample_dir, "report_all.npz"), **report)
  return report


def _raw_real_features(config, assetdir):
  """Raw real pool_3 activations when the stats file provides them
  (score_sde-style `assets/stats/*_stats.npz`)."""
  name = config.data.dataset.lower()
  for base in filter(None, [assetdir]):
    for path in (os.path.join(base, f"{name}_stats.npz"),
                 os.path.join(base, "stats", f"{name}_stats.npz")):
      if os.path.exists(path):
        with np.load(path) as z:
          if "pool_3" in z:
            return z["pool_3"]
  return None


def fid_folder(config, folder: str, assetdir=None, params=None,
               mode: str = "clean", batch_size: int = 64):
  """FID of a folder of images (PNG/JPG) against the dataset statistics —
  the `cleanfid.fid.fid_folder` pipeline (`cleanfid/fid.py:228-277`)."""
  from PIL import Image
  if params is None:
    params = inception_lib.load_params()
  files = sorted(
      os.path.join(folder, f) for f in os.listdir(folder)
      if f.lower().endswith((".png", ".jpg", ".jpeg", ".npy")))
  if not files:
    raise FileNotFoundError(f"no images under {folder}")
  imgs = []
  for f in files:
    if f.endswith(".npy"):
      imgs.append(np.load(f))
    else:
      imgs.append(np.asarray(Image.open(f).convert("RGB")))
  imgs = np.stack(imgs).astype(np.uint8)
  feats, _ = get_inception_features(imgs, params=params, mode=mode,
                                    batch_size=batch_size)
  mu, sigma = compute_statistics(feats)
  mu_r, sigma_r, _ = dataset_statistics(config, assetdir, params, mode)
  return frechet_distance(mu, sigma, mu_r, sigma_r)


# ---------------------------------------------------------------------------
# bits/dim harness (`evaluation.py:388-495`)
# ---------------------------------------------------------------------------


def get_bpd(config, eval_ds, scaler, nelbo_fn, nll_fn, score_fn,
            flow_forward_fn, step: int = 0, eval: bool = False):
  """NELBO x num_nelbo, 'NLL wrong' (no residual), 'NLL correct'
  (residual), and truncation-time-specific NLL over the test set."""
  num_data = config.eval.num_test_data if eval else config.eval.batch_size
  batch_size = config.eval.batch_size
  # cap at one epoch of the actual dataset (the reference's num_epochs=1
  # tf.data split makes this implicit, `datasets.py:181-183`)
  ds_size = len(getattr(eval_ds, "data", ())) or num_data
  num_data = min(num_data, ds_size)
  n_batches = max((num_data - 1) // batch_size + 1, 1)
  np_rng = np.random.default_rng(step)
  rng = jax.random.PRNGKey(step)

  jit_nelbo = jax.jit(lambda r, b: nelbo_fn(r, score_fn, flow_forward_fn, b))
  jit_nll = jax.jit(
      lambda r, b, res: nll_fn(r, score_fn, flow_forward_fn, b,
                               residual=res,
                               eps_bpd=config.training.truncation_time),
      static_argnums=2)

  def batches():
    it = iter(eval_ds)
    for i in range(n_batches):
      b = next(it)
      b = (255.0 * b + np_rng.random(b.shape, dtype=np.float32)) / 256.0
      yield jnp.asarray(scaler(b))

  # NELBO averaged over num_nelbo passes (`evaluation.py:400-427`).
  nelbos, nelbos_res = [], []
  for k in range(config.eval.num_nelbo):
    for i, b in enumerate(batches()):
      r = jax.random.fold_in(rng, k * 10000 + i)
      ne, ne_res = jit_nelbo(r, b)
      nelbos.append(np.asarray(ne))
      nelbos_res.append(np.asarray(ne_res))
  nelbo = float(np.concatenate(nelbos).mean())
  nelbo_res = float(np.concatenate(nelbos_res).mean())
  logging.info("step: %d, NELBO: %.5f, NELBO(residual): %.5f",
               step, nelbo, nelbo_res)

  results = {"nelbo": nelbo, "nelbo_residual": nelbo_res}
  if eval:
    if not config.eval.skip_nll_wrong:
      bpds = []
      for i, b in enumerate(batches()):
        bpd, _, nfe = jit_nll(jax.random.fold_in(rng, 5_000_000 + i), b,
                              False)
        bpds.append(np.asarray(bpd))
        logging.info("NLL(wrong) batch %d: %.5f (nfe %d)", i,
                     float(np.asarray(bpd).mean()), int(nfe))
      results["nll_wrong"] = float(np.concatenate(bpds).mean())
      logging.info("step: %d, NLL wrong: %.5f", step, results["nll_wrong"])

    bpds = []
    for i, b in enumerate(batches()):
      bpd, _, nfe = jit_nll(jax.random.fold_in(rng, 6_000_000 + i), b, True)
      bpds.append(np.asarray(bpd))
      logging.info("NLL(correct) batch %d: %.5f (nfe %d)", i,
                   float(np.asarray(bpd).mean()), int(nfe))
    results["nll_correct"] = float(np.concatenate(bpds).mean())
    logging.info("step: %d, NLL correct: %.5f", step,
                 results["nll_correct"])

  return results
