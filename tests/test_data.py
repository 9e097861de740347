"""Data pipeline: image-folder datasets + per-dataset geometry ops
(`datasets.py:73-103,185-240` parity)."""

import os

import numpy as np
import pytest
from PIL import Image

from indm_tpu import data as data_lib
from indm_tpu.configs import get_config


def _cfg(tmp, dataset="CELEBA", size=16):
  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.data.dataset = dataset
  cfg.data.image_size = size
  cfg.datadir = str(tmp)
  return cfg


def test_celeba_resize_op_geometry(tmp_path):
  cfg = _cfg(tmp_path, "CELEBA", 16)
  img = np.random.default_rng(0).integers(0, 255, (218, 178, 3),
                                          dtype=np.uint8)
  out = data_lib._preprocess_image(cfg, img)
  # central_crop(140) -> resize_small(16) -> central_crop(16)
  assert out.shape == (16, 16, 3)


def test_lsun_crop_resize(tmp_path):
  cfg = _cfg(tmp_path, "LSUN", 8)
  img = np.zeros((300, 400, 3), np.uint8)
  out = data_lib._preprocess_image(cfg, img)
  assert out.shape == (8, 8, 3)


def test_image_folder_loading_and_cache(tmp_path):
  cfg = _cfg(tmp_path, "FFHQ", 8)
  folder = tmp_path / "ffhq"
  folder.mkdir()
  rng = np.random.default_rng(0)
  for i in range(25):
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                    "RGB").save(folder / f"{i:03d}.png")
  train, test = data_lib.load_arrays(cfg)
  assert train.shape[1:] == (8, 8, 3)
  assert train.dtype == np.uint8
  assert len(train) + len(test) == 25
  assert len(test) == 1  # 95/5 split, floor -> 1 of 25
  # cache written and reused
  cache = tmp_path / "ffhq_8.npz"
  assert cache.exists()
  train2, _ = data_lib.load_arrays(cfg)
  np.testing.assert_array_equal(train, train2)


def test_image_folder_train_test_split_dirs(tmp_path):
  cfg = _cfg(tmp_path, "IMAGENET32", 8)
  base = tmp_path / "imagenet32"
  (base / "train").mkdir(parents=True)
  (base / "valid").mkdir()
  rng = np.random.default_rng(0)
  for i in range(6):
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                    "RGB").save(base / "train" / f"{i}.png")
  for i in range(2):
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                    "RGB").save(base / "valid" / f"{i}.png")
  train, test = data_lib.load_arrays(cfg)
  assert len(train) == 6 and len(test) == 2
