"""Build + ctypes binding for the native MAS kernel.

Compiles mas.cpp with g++ -O3 -fopenmp on first use (cached next to the
source). Falls back to the numpy oracle if no compiler is available, so
the package works everywhere; the native path is ~100x faster for the
host-side alignment tool.
"""

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

LOG = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "mas.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_mas.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        LOG.warning("native MAS build failed (%s); using numpy fallback", exc)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    path = _LIB_PATH
    if not os.path.exists(path) or (
        os.path.getmtime(path) < os.path.getmtime(_SRC)
    ):
        path = _compile()
        if path is None:
            _build_failed = True
            return None
    lib = ctypes.CDLL(path)
    lib.maximum_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.maximum_path_batch.restype = None
    _lib = lib
    return _lib


def maximum_path_native(neg_cent: np.ndarray,
                        attn_mask: np.ndarray) -> np.ndarray:
    """Native batch MAS; neg_cent/attn_mask [B, T_spec, T_text]."""
    lib = _load()
    if lib is None:
        from phoonnx_tpu.ops.mas import maximum_path_numpy

        return maximum_path_numpy(neg_cent, attn_mask)

    values = np.ascontiguousarray(neg_cent, dtype=np.float32).copy()
    b, t_y, t_x = values.shape
    paths = np.zeros((b, t_y, t_x), dtype=np.int32)
    t_ys = np.ascontiguousarray(
        np.maximum(attn_mask[:, :, 0].sum(1), 1).astype(np.int32)
    )
    t_xs = np.ascontiguousarray(
        np.maximum(attn_mask[:, 0, :].sum(1), 1).astype(np.int32)
    )
    lib.maximum_path_batch(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_y, t_x,
    )
    return paths.astype(np.float32) * np.asarray(attn_mask, np.float32)
