"""Evaluation: FID/IS/KID over cached samples + the bits/dim harness.

Re-design of `/root/reference/evaluation.py` and the clean-fid pipelines
(`cleanfid/fid.py:109-384`): features come from the flax InceptionV3
(`indm_tpu.metrics.inception`) computed on the device mesh (replacing the
reference's per-GPU tf.device sharding, `evaluation.py:119-158`), dataset
statistics load from `assets/stats/*.npz` or are computed+cached from the
on-disk dataset, and every artifact (latents, statistics, reports) is an
idempotent npz cache (SURVEY.md §5.3).

On the reference's SECOND feature extractor — the tfgan tfhub module
(`/root/reference/evaluation.py:35-50`, `tfgan/eval/inception/1`,
`inceptionv3=False` for every image_size < 256 dataset INDM trains on):
that tfhub graph is the SAME frozen 2015 "OpenAI-IS" Inception network
that clean-fid's torchscript `inception-2015-12-05.pt` wraps
(`cleanfid/features.py:13-48` downloads the torchscript trace of it).
Our single flax `InceptionV3FID` + the torchscript-layout converter
(`scripts/convert_inception.py`) therefore covers BOTH reference paths:
`pool_3` features for FID/KID and `logits` for the tfgan-style IS
(`indm_tpu.metrics.fid.inception_score`). The
`inceptionv3=True` tfhub branch (imagenet feature_vector, only used at
image_size >= 256) is out of INDM's trained-config envelope and is not
ported.
"""

from __future__ import annotations

import logging
import os
import time
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
  """The full bits/dim harness (`evaluation.py:388-495`): NELBO x num_nelbo,
  'NLL wrong' (no residual), 'NLL correct' (residual), and the fourth
  'NLL correct w/ eps = training truncation_time' pass. Runs ALL sections
  both in-training and at eval (the reference differs only in num_data:
  10000 NELBO / 1000 NLL in-training, `evaluation.py:392-395,430-431`)."""
  num_data = config.eval.num_test_data if eval else 10000
  batch_size = config.eval.batch_size
  ds_size = len(getattr(eval_ds, "data", ()))
  if ds_size and ds_size < num_data:
    # At eval=True the count is the explicitly-configured
    # eval.num_test_data: a smaller real dataset means a misconfigured
    # datadir — fail loudly rather than report a "test-set bpd" computed on
    # a fraction of it. In-training (eval=False) the 10000 is a hardcoded
    # reference default (`evaluation.py:392-395`); real datasets with
    # smaller test splits (e.g. the image-folder 95/5 split) must not crash
    # training at the first snapshot — warn and cap, like the reference's
    # self-healing tf.data iterator effectively does. The seeded synthetic
    # fallback always caps.
    if eval and not data_lib.is_synthetic(config):
      raise ValueError(
          f"eval dataset has {ds_size} images but "
          f"eval.num_test_data={num_data}; refusing to report a partial "
          "test-set bpd (check config.datadir)")
    logging.warning(
        "bpd harness: %s dataset (%d images) < num_data=%d; capping.",
        "SYNTHETIC" if data_lib.is_synthetic(config) else "on-disk",
        ds_size, num_data)
    num_data = ds_size
  np_rng = np.random.default_rng(step)
  rng = jax.random.PRNGKey(step)

  jit_nelbo = jax.jit(lambda r, b: nelbo_fn(r, score_fn, flow_forward_fn, b))
  jit_nll = jax.jit(
      lambda r, b, res, eps: nll_fn(r, score_fn, flow_forward_fn, b,
                                    residual=res, eps_bpd=eps),
      static_argnums=2)

  def batches(n):
    # fresh epoch-start pass per section: all four bpd sections must see
    # the SAME images in the SAME (deterministic) order, as the reference's
    # per-section `iter(tf_ds)` restart guarantees (`evaluation.py:400-493`)
    it = eval_ds.epoch() if hasattr(eval_ds, "epoch") else iter(eval_ds)
    for i in range(max((n - 1) // batch_size + 1, 1)):
      b = next(it)
      b = (255.0 * b + np_rng.random(b.shape, dtype=np.float32)) / 256.0
      yield jnp.asarray(scaler(b))

  # NELBO: num_nelbo full passes, averaged over pass-means
  # (`evaluation.py:400-427`).
  t_nelbo = time.time()
  pass_means, pass_means_res = [], []
  for k in range(config.eval.num_nelbo):
    nelbos, nelbos_res = [], []
    for i, b in enumerate(batches(num_data)):
      r = jax.random.fold_in(rng, k * 10000 + i)
      ne, ne_res = jit_nelbo(r, b)
      nelbos.append(np.asarray(ne))
      nelbos_res.append(np.asarray(ne_res))
    nelbos = np.concatenate(nelbos)
    nelbos_res = np.concatenate(nelbos_res)
    logging.info("step: %d, num samples: %d, mean nelbo bpd: %.5e, std "
                 "nelbo bpd: %.5e", step, len(nelbos), nelbos.mean(),
                 nelbos.std())
    logging.info("step: %d, num samples: %d, mean nelbo_residual bpd: "
                 "%.5e, std nelbo_residual bpd: %.5e", step,
                 len(nelbos_res), nelbos_res.mean(), nelbos_res.std())
    pass_means.append(float(nelbos.mean()))
    pass_means_res.append(float(nelbos_res.mean()))
  nelbo = float(np.mean(pass_means))
  nelbo_res = float(np.mean(pass_means_res))
  logging.info("step: %d, average nelbo bpd out of %d evaluations: %.5e",
               step, len(pass_means), nelbo)
  logging.info("step: %d, average nelbo residual bpd out of %d "
               "evaluations: %.5e", step, len(pass_means_res), nelbo_res)
  # per-section wall-clock: the in-training snapshot runs this harness at
  # the preemption cadence; an unexplained multi-hour stall should be
  # diagnosable from stdout.txt alone.
  logging.info("step: %d, [NELBO x%d] section wall-clock: %.1fs", step,
               config.eval.num_nelbo, time.time() - t_nelbo)
  results = {"nelbo": nelbo, "nelbo_residual": nelbo_res}

  # NLL sections run on the smaller in-training count
  # (`evaluation.py:430-431`).
  nll_num_data = num_data if eval else max(num_data // 10, 1)
  # eps override: eval.truncation_time=-1 means "use 1e-5"
  # (`evaluation.py:437-440`).
  eps_bpd = (1e-5 if config.eval.truncation_time == -1.0
             else config.eval.truncation_time)

  def nll_section(tag, residual, eps, salt):
    t_section = time.time()
    bpds = []
    nfe_total = 0
    for i, b in enumerate(batches(nll_num_data)):
      bpd, _, nfe = jit_nll(jax.random.fold_in(rng, salt + i), b, residual,
                            jnp.asarray(eps, jnp.float32))
      bpds.append(np.asarray(bpd))
      nfe_total += int(nfe)
      if eval:
        cat = np.concatenate(bpds)
        logging.info("step: %d, [%s] num samples: %d, mean nll bpd: %.5e, "
                     "std nll bpd: %.5e", step, tag, len(cat), cat.mean(),
                     cat.std())
    bpds = np.concatenate(bpds)
    logging.info("step: %d, [%s] num samples: %d, mean nll bpd: %.5e, std "
                 "nll bpd: %.5e (nfe %d)", step, tag, len(bpds),
                 bpds.mean(), bpds.std(), nfe_total)
    logging.info("step: %d, [%s] section wall-clock: %.1fs", step, tag,
                 time.time() - t_section)
    return float(bpds.mean())

  if not config.eval.skip_nll_wrong:
    results["nll_wrong"] = nll_section(
        f"NLL WRONG w/ eps={eps_bpd:.1e}", False, eps_bpd, 5_000_000)

  results["nll_correct"] = nll_section(
      f"NLL CORRECT w/ eps={eps_bpd:.1e}", True, eps_bpd, 6_000_000)

  # 'NLL correct w/ eps = training eps' (`evaluation.py:478-493`).
  if config.training.truncation_time != 1e-5:
    results["nll_correct_train_eps"] = nll_section(
        "NLL CORRECT w/ eps=eps", True, config.training.truncation_time,
        7_000_000)

  return results
