"""Native (C++) runtime pieces with build-at-import + ctypes bindings.

The reference JIT-compiles its native extensions at import with
`torch.utils.cpp_extension.load` (`op/upfirdn2d.py:10-16`); this module does
the same with a plain g++ invocation cached by source hash — no pybind11,
no torch. Everything degrades gracefully: `fill_batch` is None when no
toolchain is available and callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "dataloader.cpp")

_lib = None
_load_attempted = False


def _build_and_load() -> Optional[ctypes.CDLL]:
  with open(_SRC, "rb") as f:
    digest = hashlib.sha256(f.read()).hexdigest()[:16]
  cache_dir = os.environ.get(
      "INDM_NATIVE_CACHE",
      os.path.join(tempfile.gettempdir(), "indm_tpu_native"))
  os.makedirs(cache_dir, exist_ok=True)
  so_path = os.path.join(cache_dir, f"dataloader_{digest}.so")
  if not os.path.exists(so_path):
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           _SRC, "-o", tmp]
    try:
      subprocess.run(cmd, check=True, capture_output=True, timeout=120)
      os.replace(tmp, so_path)
    except (subprocess.SubprocessError, OSError) as e:
      logging.warning("native dataloader build failed (%s); "
                      "falling back to numpy batch assembly", e)
      return None
  try:
    lib = ctypes.CDLL(so_path)
  except OSError as e:
    logging.warning("native dataloader load failed (%s)", e)
    return None
  lib.indm_fill_batch.argtypes = [
      ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
      ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
      ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int]
  lib.indm_fill_batch.restype = None
  lib.indm_loader_threads.restype = ctypes.c_int
  return lib


def get_lib() -> Optional[ctypes.CDLL]:
  global _lib, _load_attempted
  if not _load_attempted:
    _load_attempted = True
    if os.environ.get("INDM_DISABLE_NATIVE"):
      _lib = None
    else:
      _lib = _build_and_load()
  return _lib


FLAG_FLIP = 1
FLAG_DEQUANT = 2
FLAG_CENTER = 4


def fill_batch(data: np.ndarray, indices: np.ndarray, seed: int,
               random_flip: bool = False, dequantize: bool = False,
               centered: bool = False) -> Optional[np.ndarray]:
  """Fused gather+flip+dequant+scale. Returns None if the native library is
  unavailable (caller falls back to numpy)."""
  lib = get_lib()
  if lib is None:
    return None
  assert data.dtype == np.uint8 and data.ndim == 4 and data.flags.c_contiguous
  idx = np.ascontiguousarray(indices, np.int64)
  b = len(idx)
  _, h, w, c = data.shape
  out = np.empty((b, h, w, c), np.float32)
  flags = ((FLAG_FLIP if random_flip else 0)
           | (FLAG_DEQUANT if dequantize else 0)
           | (FLAG_CENTER if centered else 0))
  lib.indm_fill_batch(
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      b, h, w, c, ctypes.c_uint64(seed & (2 ** 64 - 1)), flags)
  return out
