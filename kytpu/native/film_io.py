"""ctypes binding to the native film encoder (libkyfilm.so).

Importing this module raises ImportError when the library hasn't been built
(`python -m kytpu.native.build`); kytpu.film.io treats that as "fall back to
numpy".
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

_LIB_PATH = pathlib.Path(__file__).parent / "libkyfilm.so"
if not _LIB_PATH.exists():
    raise ImportError(f"native encoder not built: {_LIB_PATH}")

_lib = ctypes.CDLL(str(_LIB_PATH))
for _fn in (_lib.ky_write_bmp, _lib.ky_write_hdr):
    _fn.restype = ctypes.c_int
    _fn.argtypes = [ctypes.c_char_p,
                    np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                    ctypes.c_int, ctypes.c_int]


def _as_img(img) -> np.ndarray:
    img = np.ascontiguousarray(np.asarray(img, np.float32))
    assert img.ndim == 3 and img.shape[2] == 3, img.shape
    return img


def write_bmp(path: str, img) -> None:
    img = _as_img(img)
    h, w, _ = img.shape
    rc = _lib.ky_write_bmp(str(path).encode(), img, w, h)
    if rc:
        raise OSError(f"ky_write_bmp failed with code {rc} for {path}")


def write_hdr(path: str, img) -> None:
    img = _as_img(img)
    h, w, _ = img.shape
    rc = _lib.ky_write_hdr(str(path).encode(), img, w, h)
    if rc:
        raise OSError(f"ky_write_hdr failed with code {rc} for {path}")
