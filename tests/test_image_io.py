"""Image IO round trips, including compressed EXR variants.

Reference parity: core/src/image_io.rs reads any EXR via the exr crate;
here NONE/RLE/ZIPS/ZIP scanline EXRs are supported (the schemes pbrt-family
assets use). The compressed test files are synthesized with the exact
OpenEXR chunk layout (predictor + interleave + zlib/RLE).
"""
import struct
import zlib

import numpy as np
import pytest

from pbrt_tpu.io.image_io import (write_exr, read_exr, write_pfm, read_pfm,
                                  _exr_predict, _exr_unpredict)


def _exr_attr(name, atype, value):
    return name + b"\x00" + atype + b"\x00" + struct.pack("<i", len(value)) + value


def _write_exr_compressed(path, rgb, comp):
    """Minimal scanline RGB float EXR writer with ZIPS(2)/ZIP(3) blocks."""
    h, w, _ = rgb.shape
    chans = b""
    for c in (b"B", b"G", b"R"):
        chans += c + b"\x00" + struct.pack("<i", 2) + b"\x00\x00\x00\x00" + \
            struct.pack("<ii", 1, 1)
    chans += b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b""
    header += _exr_attr(b"channels", b"chlist", chans)
    header += _exr_attr(b"compression", b"compression", bytes([comp]))
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\x00")
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"
    magic = struct.pack("<i", 20000630) + struct.pack("<i", 2)

    lines_per_block = 16 if comp == 3 else 1
    nblocks = -(-h // lines_per_block)
    chunks = []
    for b in range(nblocks):
        y = b * lines_per_block
        nl = min(lines_per_block, h - y)
        raw = b""
        for li in range(nl):
            raw += rgb[y + li, :, 2].astype("<f4").tobytes()
            raw += rgb[y + li, :, 1].astype("<f4").tobytes()
            raw += rgb[y + li, :, 0].astype("<f4").tobytes()
        cz = zlib.compress(_exr_predict(raw))
        if len(cz) >= len(raw):
            cz = raw
        chunks.append((y, cz))
    pos0 = len(magic) + len(header) + 8 * nblocks
    offsets = b""
    pos = pos0
    for y, cz in chunks:
        offsets += struct.pack("<Q", pos)
        pos += 8 + len(cz)
    with open(path, "wb") as f:
        f.write(magic + header + offsets)
        for y, cz in chunks:
            f.write(struct.pack("<ii", y, len(cz)))
            f.write(cz)


def test_predictor_roundtrip():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 1001, dtype=np.uint8).tobytes()
    assert _exr_unpredict(_exr_predict(raw)) == raw


def test_exr_uncompressed_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((13, 9, 3), np.float32)
    p = str(tmp_path / "u.exr")
    write_exr(p, img)
    assert np.allclose(read_exr(p), img)


@pytest.mark.parametrize("comp", [2, 3])
def test_exr_zip_read(tmp_path, comp):
    rng = np.random.default_rng(2)
    img = rng.random((37, 17, 3), np.float32)
    p = str(tmp_path / f"z{comp}.exr")
    _write_exr_compressed(p, img, comp)
    got = read_exr(p)
    assert got.shape == (37, 17, 3)
    assert np.allclose(got, img), np.abs(got - img).max()


def test_exr_zip_smooth_image_compresses(tmp_path):
    """A smooth image must actually take the compressed branch."""
    y, x = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64),
                       indexing="ij")
    img = np.stack([y, x, y * x], -1).astype(np.float32)
    p = str(tmp_path / "s.exr")
    _write_exr_compressed(p, img, 3)
    import os
    assert os.path.getsize(p) < 64 * 64 * 3 * 4  # smaller than raw
    assert np.allclose(read_exr(p), img)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.random((5, 7, 3), np.float32)
    p = str(tmp_path / "t.pfm")
    write_pfm(p, img)
    assert np.allclose(read_pfm(p), img)
