"""ctypes bindings for the C++ nearest-neighbor-chain AHC (ahc.cc).

Builds libsct_ahc.so on first use (g++ via the Makefile) and caches it next
to this file; falls back cleanly (available() -> False) if no compiler is
present, in which case ahc.py uses its numpy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import typing

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsct_ahc.so")
_LINKAGE_CODES = {"complete": 0, "average": 1, "single": 2}

_lib = None
_tried = False


def _load():
  global _lib, _tried
  if _lib is not None or _tried:
    return _lib
  _tried = True
  if not os.path.exists(_SO):
    try:
      subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                     capture_output=True, timeout=120)
    except Exception:
      return None
  try:
    lib = ctypes.CDLL(_SO)
  except OSError:
    return None
  lib.sct_nn_chain_linkage.restype = ctypes.c_int
  lib.sct_nn_chain_linkage.argtypes = [
      ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
      ctypes.POINTER(ctypes.c_double)
  ]
  lib.sct_ahc_labels.restype = ctypes.c_int
  lib.sct_ahc_labels.argtypes = [
      ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
      ctypes.c_int64, ctypes.c_double, ctypes.c_int,
      ctypes.POINTER(ctypes.c_int64)
  ]
  _lib = lib
  return _lib


def available() -> bool:
  return _load() is not None


def _as_c(dist: np.ndarray):
  d = np.ascontiguousarray(dist, dtype=np.float64)
  return d, d.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def nn_chain_linkage(dist: np.ndarray, linkage: str) -> np.ndarray:
  lib = _load()
  n = dist.shape[0]
  d, dptr = _as_c(dist)
  merges = np.empty((n - 1, 3), dtype=np.float64)
  rc = lib.sct_nn_chain_linkage(
      dptr, n, _LINKAGE_CODES[linkage],
      merges.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
  if rc != 0:
    raise RuntimeError(f"sct_nn_chain_linkage failed with code {rc}")
  return merges


def ahc_labels(dist: np.ndarray, linkage: str,
               n_clusters: typing.Optional[int],
               distance_threshold: typing.Optional[float]) -> np.ndarray:
  lib = _load()
  n = dist.shape[0]
  d, dptr = _as_c(dist)
  labels = np.empty(n, dtype=np.int64)
  rc = lib.sct_ahc_labels(
      dptr, n, _LINKAGE_CODES[linkage],
      n_clusters if n_clusters is not None else -1,
      distance_threshold if distance_threshold is not None else 0.0,
      1 if distance_threshold is not None else 0,
      labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
  if rc != 0:
    raise RuntimeError(f"sct_ahc_labels failed with code {rc}")
  return labels
