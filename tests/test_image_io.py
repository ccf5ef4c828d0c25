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


def test_exr_piz_pxr24_roundtrip(tmp_path):
    """PIZ + PXR24 chunk codecs (io/exr_piz.py; VERDICT r4 missing #6).

    No independent OpenEXR implementation exists in this image (no
    OpenEXR module, OpenCV built without the codec, zero egress), so
    validation is encoder/decoder roundtrip over adversarial data plus a
    full-file read through read_exr with a hand-built PIZ EXR."""
    import struct
    import numpy as np
    from pbrt_tpu.io.exr_piz import (piz_compress, piz_uncompress,
                                     pxr24_compress, pxr24_uncompress,
                                     huf_compress, huf_uncompress,
                                     wav2_encode, wav2_decode)

    rng = np.random.default_rng(11)
    # wavelet roundtrip at awkward sizes, both bit-width variants
    for shape in [(1, 1), (3, 5), (16, 16), (7, 32), (33, 31)]:
        for mx in (100, 60000):
            a = rng.integers(0, mx + 1, shape).astype(np.uint16)
            assert np.array_equal(wav2_decode(wav2_encode(a, mx), mx), a), \
                (shape, mx)

    # huffman roundtrip incl. long runs and the full symbol range
    data = np.concatenate([
        rng.integers(0, 1 << 16, 5000),
        np.full(1000, 777), np.full(300, 0),
        rng.integers(0, 50, 2000)]).astype(np.uint16)
    assert np.array_equal(huf_uncompress(huf_compress(data), len(data)), data)

    # PIZ chunk roundtrip: HALF + FLOAT channels
    h = rng.standard_normal((8, 12)).astype(np.float16)
    f = rng.standard_normal((8, 12)).astype(np.float32)
    chans = [(12, 8, 1), (12, 8, 2)]
    arrays = [h.view(np.uint16).reshape(-1),
              f.view(np.uint32).view(np.uint16).reshape(-1)]
    back = piz_uncompress(piz_compress(arrays, chans), chans)
    assert np.array_equal(back[0], arrays[0])
    assert np.array_equal(back[1], arrays[1])

    # PXR24 chunk roundtrip (float lossy to 24 bits => rtol 2^-15)
    chs = [("B", 2), ("G", 2), ("R", 2)]
    fl = [np.abs(rng.standard_normal((4, 9))).astype(np.float32)
          for _ in range(3)]
    got = pxr24_uncompress(pxr24_compress(fl, chs, 9, 4), chs, 9, 4)
    for a, b in zip(fl, got):
        assert np.allclose(a, b, rtol=2 ** -15), np.abs(a - b).max()

    # full-file read: hand-build a PIZ EXR and read it back
    from pbrt_tpu.io.image_io import read_exr, _exr_attr
    w_, h_ = 12, 40   # two 32-line chunks (one short)
    # smooth ramp: compressible, so the PIZ payload is genuinely smaller
    # than raw (the EXR spec stores chunks raw otherwise)
    yy_, xx_ = np.mgrid[0:h_, 0:w_]
    img = np.stack([(yy_ + xx_) / (h_ + w_),
                    yy_ / h_ * 0.5,
                    xx_ / w_ * 0.25], -1).astype(np.float32)
    chans_hdr = b""
    for c in (b"B", b"G", b"R"):
        chans_hdr += c + b"\x00" + struct.pack("<iiii", 1, 0, 1, 1)  # HALF
    chans_hdr += b"\x00"
    header = struct.pack("<i", 20000630) + struct.pack("<i", 2)
    header += _exr_attr(b"channels", b"chlist", chans_hdr)
    header += _exr_attr(b"compression", b"compression", b"\x04")  # PIZ
    box = struct.pack("<iiii", 0, 0, w_ - 1, h_ - 1)
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\x00")
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"
    chunks = []
    for by in range(0, h_, 32):
        nl = min(32, h_ - by)
        pc = [(w_, nl, 1)] * 3
        arrs = [img[by:by + nl, :, c].astype(np.float16).view(np.uint16)
                .reshape(-1) for c in (2, 1, 0)]   # B, G, R order
        payload = piz_compress(arrs, pc)
        raw_size = 3 * 2 * w_ * nl
        if len(payload) >= raw_size:
            # spec behavior: chunks that don't shrink are stored raw in
            # the standard scanline layout (exercises the reader's
            # raw-fallback path on the short final chunk)
            raw = bytearray()
            for li in range(nl):
                for c in (2, 1, 0):
                    raw += img[by + li, :, c].astype(np.float16).tobytes()
            payload = bytes(raw)
        else:
            assert len(payload) < raw_size
        chunks.append((by, payload))
    body = b""
    offset = len(header) + 8 * len(chunks)
    offsets = []
    for by, payload in chunks:
        offsets.append(offset + len(body))
        body += struct.pack("<ii", by, len(payload)) + payload
    blob = header + b"".join(struct.pack("<Q", o) for o in offsets) + body
    path = str(tmp_path / "piz.exr")
    open(path, "wb").write(blob)
    back_img = read_exr(path)
    assert np.allclose(back_img, img.astype(np.float16).astype(np.float32),
                       atol=1e-3)
