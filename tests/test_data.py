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
  """CelebA = central_crop(140) -> resize_small(image_size)
  (`datasets.py:211-215`); on the 178x218 source the 140-crop is square so
  resize_small lands exactly on (size, size)."""
  cfg = _cfg(tmp_path, "CELEBA", 64)
  img = np.random.default_rng(0).integers(0, 255, (218, 178, 3),
                                          dtype=np.uint8)
  out = data_lib._preprocess_image(cfg, img)
  assert out.shape == (64, 64, 3)

  # crop-window parity with the reference's top=(h-140)//2, left=(w-140)//2
  # (`datasets.py:100-104`): a marker pixel just inside the window survives
  # the crop, one just outside does not.
  top, left = (218 - 140) // 2, (178 - 140) // 2
  inside = img.copy()
  inside[top:top + 140, left:left + 140] = 200  # flat crop region
  out_flat = data_lib._preprocess_image(cfg, inside)
  np.testing.assert_array_equal(out_flat, np.full((64, 64, 3), 200,
                                                  np.uint8))
  # pixels OUTSIDE the window must not affect the output
  outside = inside.copy()
  outside[:top] = 0
  outside[top + 140:] = 0
  np.testing.assert_array_equal(data_lib._preprocess_image(cfg, outside),
                                out_flat)


def test_resize_small_floors_target_dims():
  """`int(h * ratio)` floor semantics (`datasets.py:87-96`): 218x178 ->
  resize_small(64) -> (int(218*64/178), 64) = (78, 64)."""
  img = np.zeros((218, 178, 3), np.uint8)
  out = data_lib._resize_small(img, 64)
  assert out.shape == (78, 64, 3)


def test_lsun_crop_resize(tmp_path):
  cfg = _cfg(tmp_path, "LSUN", 8)
  img = np.zeros((300, 400, 3), np.uint8)
  out = data_lib._preprocess_image(cfg, img)
  assert out.shape == (8, 8, 3)


def test_lsun_128_resize_small_then_crop(tmp_path):
  """LSUN at 128 uses resize_small + central_crop, not crop_resize
  (`datasets.py:223-229`)."""
  cfg = _cfg(tmp_path, "LSUN", 128)
  img = np.random.default_rng(1).integers(0, 255, (300, 400, 3),
                                          dtype=np.uint8)
  out = data_lib._preprocess_image(cfg, img)
  assert out.shape == (128, 128, 3)


def test_is_synthetic_detection(tmp_path):
  cfg = _cfg(tmp_path, "CIFAR10", 32)
  assert data_lib.is_synthetic(cfg)
  np.savez_compressed(tmp_path / "cifar10.npz",
                      train=np.zeros((4, 32, 32, 3), np.uint8),
                      test=np.zeros((2, 32, 32, 3), np.uint8))
  assert not data_lib.is_synthetic(cfg)


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
