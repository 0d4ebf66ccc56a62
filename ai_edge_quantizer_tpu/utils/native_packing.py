"""ctypes binding for the native (C++) sub-byte packing kernels.

Falls back by raising ImportError at module load if the shared library is
absent or unbuildable — callers (graph/serialize.py) catch that and use the
numpy implementation. Build with `make -C native` (done automatically here
when a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(
        __file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libaeqt_native.so')


def _ensure_built() -> str:
  if not os.path.exists(_LIB_PATH):
    src = os.path.join(_NATIVE_DIR, 'src', 'packing.cc')
    if not os.path.exists(src):
      raise ImportError('native sources not found')
    try:
      subprocess.run(
          ['make', '-C', _NATIVE_DIR], check=True, capture_output=True,
          timeout=120)
    except Exception as e:
      raise ImportError(f'failed to build native library: {e}') from e
  return _LIB_PATH


_lib = ctypes.CDLL(_ensure_built())

_i8p = np.ctypeslib.ndpointer(np.int8, flags='C_CONTIGUOUS')
_u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')

for _name, _argtypes in (
    ('aeqt_pack_int4', [_i8p, _u8p, ctypes.c_int64]),
    ('aeqt_unpack_int4', [_u8p, _i8p, ctypes.c_int64]),
    ('aeqt_pack_int2', [_i8p, _u8p, ctypes.c_int64]),
    ('aeqt_unpack_int2', [_u8p, _i8p, ctypes.c_int64]),
):
  fn = getattr(_lib, _name)
  fn.argtypes = _argtypes
  fn.restype = None


def pack_subbyte(data: np.ndarray, num_bits: int) -> np.ndarray:
  """int4/int2 (int8 container) -> dense uint8, layout-compatible with
  quant_numerics.pack_subbyte."""
  flat = np.ascontiguousarray(data, dtype=np.int8).reshape(-1)
  per_byte = 8 // num_bits
  out = np.zeros((flat.size + per_byte - 1) // per_byte, np.uint8)
  if num_bits == 4:
    _lib.aeqt_pack_int4(flat, out, flat.size)
  elif num_bits == 2:
    _lib.aeqt_pack_int2(flat, out, flat.size)
  else:
    raise ValueError(f'Unsupported sub-byte width: {num_bits}')
  return out


def unpack_subbyte(packed: np.ndarray, num_bits: int,
                   num_elements: int) -> np.ndarray:
  packed = np.ascontiguousarray(packed, dtype=np.uint8).reshape(-1)
  out = np.empty(num_elements, np.int8)
  if num_bits == 4:
    _lib.aeqt_unpack_int4(packed, out, num_elements)
  elif num_bits == 2:
    _lib.aeqt_unpack_int2(packed, out, num_elements)
  else:
    raise ValueError(f'Unsupported sub-byte width: {num_bits}')
  return out
