"""Data pipeline: numpy-backed, threaded prefetch, TPU-host friendly.

Replaces the reference's tf.data/tfds pipelines (`/root/reference/
datasets.py:136-288`) — TensorFlow is not part of this stack. Semantics
kept: images as float in [0,1] (uniform dequantization happens per-step in
the train loop, `run_lib.py:86`), random horizontal flips, shuffle, repeat,
drop-remainder batching, prefetch (threaded double-buffering replaces
AUTOTUNE), batch-size divisibility check against device count
(`datasets.py:174-176`), and a self-healing `get_batch`
(`datasets.py:106-128`).

Data sources (searched under config.datadir and $INDM_DATA_DIR):
  * `cifar-10-batches-py/` — the standard CIFAR-10 python pickle layout;
  * `<dataset>.npz` with 'train'/'test' uint8 NHWC arrays;
  * otherwise a deterministic synthetic dataset (seeded), so CPU driver
    configs run without network access (this image has zero egress).
"""

from __future__ import annotations

import logging
import os
import pickle
import queue
import threading
from typing import Optional, Tuple

import jax
import numpy as np


def get_data_scaler(config):
  """[0,1] -> [-1,1] when centered (`datasets.py:56-63`)."""
  if config.data.centered:
    return lambda x: x * 2.0 - 1.0
  return lambda x: x


def get_data_inverse_scaler(config):
  if config.data.centered:
    return lambda x: (x + 1.0) / 2.0
  return lambda x: x


def _search_dirs(config):
  dirs = [config.datadir, os.environ.get("INDM_DATA_DIR", ""),
          os.path.join(config.datadir, "data"), "/root/data", "./data"]
  return [d for d in dirs if d]


def _load_cifar10(dirname: str):
  base = os.path.join(dirname, "cifar-10-batches-py")
  if not os.path.isdir(base):
    return None
  def load_batch(name):
    with open(os.path.join(base, name), "rb") as f:
      d = pickle.load(f, encoding="bytes")
    x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return x
  train = np.concatenate([load_batch(f"data_batch_{i}")
                          for i in range(1, 6)])
  test = load_batch("test_batch")
  return train.astype(np.uint8), test.astype(np.uint8)


def _load_npz(dirname: str, dataset: str):
  for name in (f"{dataset.lower()}.npz", f"{dataset}.npz"):
    path = os.path.join(dirname, name)
    if os.path.exists(path):
      with np.load(path) as z:
        return z["train"].astype(np.uint8), z["test"].astype(np.uint8)
  return None


# ---------------------------------------------------------------------------
# Per-dataset geometry ops (`datasets.py:73-103,185-240`), PIL host-side.
# ---------------------------------------------------------------------------


def _central_crop(img, size: int):
  h, w = img.shape[:2]
  top, left = (h - size) // 2, (w - size) // 2
  return img[top:top + size, left:left + size]


def _pil_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
  from PIL import Image
  return np.asarray(Image.fromarray(img).resize((w, h), Image.BICUBIC))


def _resize_small(img: np.ndarray, size: int) -> np.ndarray:
  """Resize preserving aspect so the SMALLER side == size; target dims are
  FLOORED like the reference's `int(h * ratio)` (`datasets.py:87-96`)."""
  h, w = img.shape[:2]
  ratio = size / min(h, w)
  return _pil_resize(img, int(h * ratio), int(w * ratio))


def _crop_resize(img: np.ndarray, size: int) -> np.ndarray:
  """Center-crop to square then resize (`datasets.py:73-83`)."""
  crop = min(img.shape[:2])
  return _pil_resize(_central_crop(img, crop), size, size)


def _preprocess_image(config, img: np.ndarray) -> np.ndarray:
  """The reference's per-dataset resize_op (`datasets.py:185-240`)."""
  ds = config.data.dataset.upper()
  size = config.data.image_size
  if ds == "CELEBA":
    img = _central_crop(img, 140)
    img = _resize_small(img, size)
    img = _central_crop(img, size)
  elif ds == "LSUN":
    if size == 128:
      img = _resize_small(img, size)
      img = _central_crop(img, size)
    else:
      img = _crop_resize(img, size)
  elif img.shape[0] != size or img.shape[1] != size:
    img = _pil_resize(img, size, size)
  return img


_IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def _list_images(folder: str):
  out = []
  for root, _, files in os.walk(folder):
    for f in files:
      if f.lower().endswith(_IMG_EXTS):
        out.append(os.path.join(root, f))
  return sorted(out)


def _load_image_folder(config, dirname: str):
  """Folder datasets (the torch-DataLoader path of the reference,
  `datasets.py:40-54,145-161`): looks for `<dirname>/<dataset>/` (or the
  LSUN `<dataset>/<category>/`), with optional train/ + {test,val,valid}/
  subsplits; flat folders get a deterministic 95/5 split. Processed arrays
  are cached as `<dataset>_<size>.npz` beside the folder."""
  from PIL import Image
  ds = config.data.dataset
  candidates = [os.path.join(dirname, ds), os.path.join(dirname, ds.lower())]
  if ds.upper() == "LSUN" and config.data.get("category"):
    candidates = [os.path.join(dirname, "lsun", config.data.category),
                  os.path.join(dirname, "LSUN", config.data.category)]
  base = next((c for c in candidates if os.path.isdir(c)), None)
  if base is None:
    return None

  cache = os.path.join(dirname,
                       f"{ds.lower()}_{config.data.image_size}.npz")
  if os.path.exists(cache):
    with np.load(cache) as z:
      return z["train"], z["test"]

  def load_all(files):
    imgs = []
    for f in files:
      img = np.asarray(Image.open(f).convert("RGB"))
      imgs.append(_preprocess_image(config, img))
    return np.stack(imgs).astype(np.uint8)

  train_dir = os.path.join(base, "train")
  test_dir = next((os.path.join(base, n) for n in ("test", "val", "valid")
                   if os.path.isdir(os.path.join(base, n))), None)
  if os.path.isdir(train_dir):
    train_files = _list_images(train_dir)
    test_files = _list_images(test_dir) if test_dir else train_files[-1:]
  else:
    files = _list_images(base)
    if not files:
      return None
    n_test = max(1, len(files) // 20)
    train_files, test_files = files[:-n_test], files[-n_test:]
  if not train_files:
    return None
  train, test = load_all(train_files), load_all(test_files)
  try:
    np.savez_compressed(cache, train=train, test=test)
  except OSError:
    logging.warning("could not write dataset cache %s", cache)
  return train, test


def _synthetic(config, n_train=512, n_test=128):
  logging.warning(
      "No on-disk dataset found for %s; using deterministic synthetic data "
      "(seeded). Place cifar-10-batches-py/ or %s.npz under datadir for "
      "real training.", config.data.dataset, config.data.dataset.lower())
  s = config.data.image_size
  c = config.data.num_channels
  rng = np.random.default_rng(1234)
  def make(n):
    # smooth random images so flows/scores see non-trivial structure
    base = rng.normal(size=(n, s // 2 or 1, s // 2 or 1, c))
    img = np.repeat(np.repeat(base, 2, axis=1), 2, axis=2)[:, :s, :s]
    img = 1 / (1 + np.exp(-img))
    return (img * 255).astype(np.uint8)
  return make(n_train), make(n_test)


def is_synthetic(config) -> bool:
  """True when NO real on-disk source exists for config.data.dataset, i.e.
  `load_arrays` would return the seeded synthetic fallback. Existence check
  only (no loading) — used by harnesses to fail loudly on misconfigured
  datadirs while staying usable in pipeline tests."""
  ds = config.data.dataset
  for d in _search_dirs(config):
    if ds.upper() == "CIFAR10" and os.path.isdir(
        os.path.join(d, "cifar-10-batches-py")):
      return False
    if any(os.path.exists(os.path.join(d, n))
           for n in (f"{ds.lower()}.npz", f"{ds}.npz")):
      return False
    folders = [os.path.join(d, ds), os.path.join(d, ds.lower())]
    if ds.upper() == "LSUN" and config.data.get("category"):
      folders = [os.path.join(d, "lsun", config.data.category),
                 os.path.join(d, "LSUN", config.data.category)]
    if any(os.path.isdir(f) for f in folders):
      return False
    if os.path.exists(os.path.join(
        d, f"{ds.lower()}_{config.data.image_size}.npz")):
      return False
  return True


def load_arrays(config) -> Tuple[np.ndarray, np.ndarray]:
  """Return (train, test) uint8 NHWC arrays for config.data.dataset."""
  ds = config.data.dataset.upper()
  for d in _search_dirs(config):
    if ds == "CIFAR10":
      out = _load_cifar10(d)
      if out is not None:
        return out
    out = _load_npz(d, ds)
    if out is not None:
      return out
    out = _load_image_folder(config, d)
    if out is not None:
      return out
  return _synthetic(config)


class EpochIterator:
  """Shuffle-repeat-flip-batch over an in-memory array with threaded
  prefetch (the tf.data AUTOTUNE/threadpool equivalent,
  `datasets.py:266-282`)."""

  def __init__(self, data: np.ndarray, batch_size: int, shuffle: bool = True,
               random_flip: bool = True, repeat: bool = True, seed: int = 0,
               prefetch: int = 2, shard: Optional[Tuple[int, int]] = None):
    # shard=(process_id, num_processes): multi-host per-process slice —
    # every process draws the SAME seeded epoch permutation of
    # `batch_size` global indices and keeps only its contiguous
    # [pid*local, (pid+1)*local) part, so the union over processes is
    # exactly the reference's global batch (indm_tpu.parallel
    # host_local_slice). Yielded batches are local (batch_size //
    # num_processes examples).
    self.data = data
    self.batch_size = batch_size
    self.shard = shard
    if shard is not None:
      pid, nproc = shard
      if batch_size % nproc != 0:
        raise ValueError(f"global batch {batch_size} must divide process "
                         f"count {nproc}")
      assert 0 <= pid < nproc
    self.shuffle = shuffle
    self.random_flip = random_flip
    self.repeat = repeat
    self.rng = np.random.default_rng(seed)
    self.q: queue.Queue = queue.Queue(maxsize=prefetch)
    self._stop = threading.Event()
    self.thread = threading.Thread(target=self._producer, daemon=True)
    self.thread.start()

  def _epoch_order(self):
    n = len(self.data)
    return (self.rng.permutation(n) if self.shuffle else np.arange(n))

  def _producer(self):
    from indm_tpu import native
    batch_seed = 0
    while not self._stop.is_set():
      order = self._epoch_order()
      nb = len(order) // self.batch_size  # drop_remainder
      for i in range(nb):
        idx = order[i * self.batch_size:(i + 1) * self.batch_size]
        if self.shard is not None:
          pid, nproc = self.shard
          local = self.batch_size // nproc
          idx = idx[pid * local:(pid + 1) * local]
        # fused C++ gather+flip+normalize when the native loader built
        batch = native.fill_batch(self.data, idx, seed=batch_seed,
                                  random_flip=self.random_flip)
        batch_seed += 1
        if batch is None:  # numpy fallback
          batch = self.data[idx].astype(np.float32) / 255.0
          if self.random_flip:
            flips = self.rng.random(len(idx)) < 0.5
            batch[flips] = batch[flips, :, ::-1]
        self.q.put(batch)
        if self._stop.is_set():
          return
      if not self.repeat:
        self.q.put(None)
        return

  def __iter__(self):
    return self

  def epoch(self):
    """Deterministic epoch-start pass: yields sequential batches from
    data[0], no shuffle/flip, cycling at the end. The reference's bpd
    harness makes a fresh `iter(tf_ds)` per section, restarting the test
    set from the start (`evaluation.py:400-493`); the threaded queue of
    THIS iterator is a single stream, so sections must use this instead to
    see identical images in identical order."""
    i = 0
    n = len(self.data)
    while True:
      idx = np.arange(i, i + self.batch_size) % n
      yield self.data[idx].astype(np.float32) / 255.0
      i = (i + self.batch_size) % n

  def __next__(self) -> np.ndarray:
    item = self.q.get()
    if item is None:
      raise StopIteration
    return item

  def close(self):
    self._stop.set()
    try:
      while True:
        self.q.get_nowait()
    except queue.Empty:
      pass


def get_dataset(config, evaluation: bool = False):
  """(train_iter, eval_iter) of float32 NHWC batches in [0,1]
  (`datasets.py:136-288`). Batch sizes follow the reference: training uses
  config.training.batch_size, eval uses config.eval.batch_size."""
  batch_size = (config.eval.batch_size if evaluation
                else config.training.batch_size)
  n_dev = jax.device_count()
  if batch_size % n_dev != 0:
    raise ValueError(
        f"Batch size {batch_size} must be divisible by device count "
        f"{n_dev} (`datasets.py:174-176`).")
  train, test = load_arrays(config)
  # multi-host: every process feeds its own contiguous shard of the
  # global batch (seeded identically so permutations agree across hosts)
  shard = ((jax.process_index(), jax.process_count())
           if jax.process_count() > 1 else None)
  train_it = EpochIterator(train, batch_size, shuffle=True,
                           random_flip=config.data.random_flip, repeat=True,
                           seed=config.seed, shard=shard)
  eval_it = EpochIterator(test, batch_size, shuffle=False, random_flip=False,
                          repeat=True, seed=config.seed + 1, shard=shard)
  return train_it, eval_it


def get_batch(config, data_iter, ds):
  """Self-healing batch fetch (`datasets.py:106-128`): on ANY failure,
  restart the iterator."""
  try:
    return next(data_iter), data_iter
  except Exception:  # noqa: BLE001 — parity with the reference's bare except
    logging.info("data iterator exhausted/failed; restarting epoch")
    new_iter = iter(ds)
    return next(new_iter), new_iter
