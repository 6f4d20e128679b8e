"""Image writers: PPM (P3), BMP (24-bit bottom-up BGR), Radiance HDR (RGBE).

Reference parity: store_ppm_impl (ky.cpp:1646-1659), store_bmp_impl
(ky.cpp:1661-1737), store_hdr_impl (ky.cpp:1739-1782). Encoding is
re-implemented from the file-format specs with numpy vectorization; when the
optional C++ encoder (kytpu/native) has been built, the BMP/HDR hot loops
dispatch to it.
"""

from __future__ import annotations

import struct

import numpy as np

from kytpu.film.film import gamma_encode

try:  # optional native encoder (built by kytpu/native/build.py)
    from kytpu.native import film_io as _native
except Exception:  # pragma: no cover - absence is fine
    _native = None


def write_ppm(path: str, img) -> str:
    """ASCII P3 PPM, gamma-encoded, same element order as the reference
    (store_ppm_impl, ky.cpp:1646-1659: space-separated decimals, one
    trailing space). Vectorized: each u8 becomes its decimal digits +
    ' ' in a (N, 4) byte grid; a boolean mask drops leading zeros, so
    the whole body is one numpy compaction + tobytes."""
    img = np.asarray(img)
    h, w, _ = img.shape
    d = gamma_encode(img).reshape(-1).astype(np.uint32)
    buf = np.empty((d.shape[0], 4), np.uint8)
    buf[:, 0] = 48 + d // 100
    buf[:, 1] = 48 + (d // 10) % 10
    buf[:, 2] = 48 + d % 10
    buf[:, 3] = 32
    keep = np.ones(buf.shape, bool)
    keep[:, 0] = d >= 100
    keep[:, 1] = d >= 10
    with open(path, "wb") as f:
        f.write(f"P3\n{w} {h}\n255\n".encode())
        f.write(buf[keep].tobytes())
    return path


def write_bmp(path: str, img) -> str:
    """24-bit uncompressed BMP: 54-byte header, bottom-up rows, BGR order."""
    img = np.asarray(img)
    h, w, _ = img.shape
    if _native is not None:
        _native.write_bmp(path, img)
        return path
    rgb = gamma_encode(img)
    bgr = rgb[::-1, :, ::-1]  # bottom-up rows, BGR channels
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for y in range(h):
        body += bgr[y].tobytes()
        body += b"\x00" * pad
    file_size = 54 + len(body)
    header = b"BM" + struct.pack(
        "<IIIIiiHHIIIIII",
        file_size, 0, 54,        # file size, reserved, data offset
        40,                      # info header size
        w, h, 1, 24,             # dims, planes, bpp
        0, 0, 0, 0, 0, 0)        # compression .. colors important
    with open(path, "wb") as f:
        f.write(header)
        f.write(bytes(body))
    return path


def write_hdr(path: str, img) -> str:
    """Radiance .hdr, flat (non-RLE) RGBE scanlines."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    if _native is not None:
        _native.write_hdr(path, img)
        return path
    v = img.max(axis=-1)
    ok = v >= 1e-32
    # v = m * 2^e with m in [0.5, 1); byte = channel * m * 256 / v
    m, e = np.frexp(np.where(ok, v, 1.0))
    scale = np.where(ok, m * 256.0 / np.where(ok, v, 1.0), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(ok, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    return path


def read_hdr(path: str) -> np.ndarray:
    """Read back a flat RGBE .hdr written by write_hdr (for tests)."""
    with open(path, "rb") as f:
        data = f.read()
    idx = data.index(b"\n\n") + 2
    dims_end = data.index(b"\n", idx)
    dims = data[idx:dims_end].decode().split()
    h, w = int(dims[1]), int(dims[3])
    rgbe = np.frombuffer(data[dims_end + 1:], np.uint8).reshape(h, w, 4)
    e = rgbe[..., 3].astype(np.int32) - 128 - 8
    scale = np.ldexp(1.0, e)
    out = rgbe[..., :3].astype(np.float32) * scale[..., None]
    out[rgbe[..., 3] == 0] = 0.0
    return out


def write_image(path: str, img, fmt: str | None = None) -> str:
    """Dispatch by extension (film_t::store_image, ky.cpp:1606-1644)."""
    fmt = fmt or path.rsplit(".", 1)[-1].lower()
    if fmt == "ppm":
        return write_ppm(path, img)
    if fmt == "bmp":
        return write_bmp(path, img)
    if fmt == "hdr":
        return write_hdr(path, img)
    raise ValueError(f"unsupported image format {fmt!r}")
