"""Image IO: format correctness, HDR roundtrip, native/numpy equivalence."""

import shutil
import struct
import subprocess

import numpy as np
import pytest

import kytpu.film.io as fio
from kytpu.film.film import FilmGrid, gamma_encode


@pytest.fixture()
def img():
    rng = np.random.default_rng(0)
    return (rng.random((19, 23, 3)) * 2.0).astype(np.float32)


def test_bmp_layout(tmp_path, img):
    p = tmp_path / "x.bmp"
    fio.write_bmp(str(p), img)
    data = p.read_bytes()
    assert data[:2] == b"BM"
    file_size, _, offset = struct.unpack("<III", data[2:14])
    assert file_size == len(data) and offset == 54
    w, h = struct.unpack("<ii", data[18:26])
    assert (w, h) == (23, 19)
    bpp = struct.unpack("<H", data[28:30])[0]
    assert bpp == 24
    # bottom-left pixel comes first, BGR
    expect = gamma_encode(img[-1, 0])[::-1]
    assert data[54:57] == bytes(expect)


def test_hdr_roundtrip(tmp_path, img):
    p = tmp_path / "x.hdr"
    fio.write_hdr(str(p), img)
    back = fio.read_hdr(str(p))
    # RGBE has an 8-bit mantissa: 1/256 relative quantization per pixel max
    rel = np.abs(back - img) / np.maximum(img.max(axis=-1, keepdims=True), 1e-9)
    assert rel.max() < 1.0 / 128


def test_ppm(tmp_path, img):
    p = tmp_path / "x.ppm"
    fio.write_ppm(str(p), img)
    toks = p.read_text().split()
    assert toks[0] == "P3" and toks[1:4] == ["23", "19", "255"]
    vals = np.array(toks[4:], np.int32)
    assert (vals == gamma_encode(img).reshape(-1)).all()


def test_ppm_bytes_match_naive_join(tmp_path, img):
    """The vectorized digit-grid writer is byte-identical to the
    str-join formulation of store_ppm_impl (ky.cpp:1646-1659):
    space-separated minimal decimals with one trailing space."""
    p = tmp_path / "x.ppm"
    fio.write_ppm(str(p), img)
    data = gamma_encode(img).reshape(-1)
    naive = ("P3\n23 19\n255\n"
             + " ".join(str(int(v)) for v in data) + " ").encode()
    assert p.read_bytes() == naive


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_matches_numpy(tmp_path, img):
    from kytpu.native import build
    build.build(verbose=False)
    import importlib
    import kytpu.native.film_io as nat
    importlib.reload(nat)

    saved = fio._native
    try:
        fio._native = None
        fio.write_bmp(str(tmp_path / "np.bmp"), img)
        fio.write_hdr(str(tmp_path / "np.hdr"), img)
        fio._native = nat
        fio.write_bmp(str(tmp_path / "cc.bmp"), img)
        fio.write_hdr(str(tmp_path / "cc.hdr"), img)
    finally:
        fio._native = saved
    for ext in ("bmp", "hdr"):
        a = (tmp_path / f"np.{ext}").read_bytes()
        b = (tmp_path / f"cc.{ext}").read_bytes()
        assert a == b, f"{ext} differs"


def test_film_grid():
    g = FilmGrid(2, 3, 4, 5)
    for i in range(6):
        g.place(np.full((5, 4, 3), i, np.float32))
    assert g.pixels.shape == (10, 12, 3)
    assert g.pixels[0, 0, 0] == 0
    assert g.pixels[0, 11, 0] == 2
    assert g.pixels[9, 0, 0] == 3
    assert g.pixels[9, 11, 0] == 5
