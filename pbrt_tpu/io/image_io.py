"""Image IO: PNG (8-bit, gamma), PFM, and uncompressed EXR.

Reference: core/src/image_io.rs (EXR/PFM/PNG read/write with sRGB gamma).
PNG goes through PIL; PFM and EXR are implemented directly (EXR: minimal
scanline float32, no compression — readable by OpenEXR tooling).
"""
from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def write_image(path: str, rgb: np.ndarray):
    """Dispatch on extension (image_io.rs write_image)."""
    ext = os.path.splitext(path)[1].lower()
    rgb = np.asarray(rgb, np.float32)
    if ext == ".png" or ext == "":
        write_png(path if ext else path + ".png", rgb)
    elif ext == ".pfm":
        write_pfm(path, rgb)
    elif ext == ".exr":
        write_exr(path, rgb)
    else:
        write_png(os.path.splitext(path)[0] + ".png", rgb)


def write_png(path: str, rgb_linear: np.ndarray):
    from PIL import Image
    v = np.clip(rgb_linear, 0.0, 1.0)
    srgb = np.where(v <= 0.0031308, 12.92 * v,
                    1.055 * np.power(np.maximum(v, 1e-8), 1.0 / 2.4) - 0.055)
    u8 = (np.clip(srgb, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(u8, "RGB").save(path)


def read_image(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pfm":
        return read_pfm(path)
    if ext == ".exr":
        return read_exr(path)
    from pbrt_tpu.textures.image import load_image
    return load_image(path)


# ---------------------------------------------------------------------------
# PFM (image_io.rs pfm section)
# ---------------------------------------------------------------------------

def write_pfm(path: str, rgb: np.ndarray):
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little endian
        # PFM stores bottom-up
        f.write(np.flipud(rgb).astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        dtype = "<f4" if scale < 0 else ">f4"
        count = w * h * (3 if color else 1)
        data = np.frombuffer(f.read(count * 4), dtype).reshape(h, w, -1)
        img = np.flipud(data).astype(np.float32)
        if not color:
            img = np.repeat(img, 3, axis=-1)
        return img


# ---------------------------------------------------------------------------
# EXR — minimal uncompressed scanline float32 RGB
# ---------------------------------------------------------------------------

def _exr_attr(name: bytes, atype: bytes, data: bytes) -> bytes:
    return name + b"\x00" + atype + b"\x00" + struct.pack("<i", len(data)) + data


def write_exr(path: str, rgb: np.ndarray):
    h, w = rgb.shape[:2]
    rgb = np.asarray(rgb, np.float32)
    channels = b""
    for name in (b"B", b"G", b"R"):
        channels += name + b"\x00" + struct.pack("<i", 2)  # FLOAT
        channels += struct.pack("<i", 0)                   # pLinear+reserved
        channels += struct.pack("<ii", 1, 1)               # sampling
    channels += b"\x00"
    header = b""
    header += _exr_attr(b"channels", b"chlist", channels)
    header += _exr_attr(b"compression", b"compression", b"\x00")  # none
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\x00")
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"

    magic = struct.pack("<i", 20000630) + struct.pack("<i", 2)
    offset_table_pos = len(magic) + len(header)
    line_size = 8 + w * 4 * 3
    offsets = b"".join(struct.pack("<Q", offset_table_pos + 8 * h + i * line_size)
                       for i in range(h))
    with open(path, "wb") as f:
        f.write(magic + header + offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, w * 4 * 3))
            f.write(rgb[y, :, 2].astype("<f4").tobytes())
            f.write(rgb[y, :, 1].astype("<f4").tobytes())
            f.write(rgb[y, :, 0].astype("<f4").tobytes())


def read_exr(path: str) -> np.ndarray:
    """Reads the minimal EXRs we write (uncompressed scanline RGB float)."""
    with open(path, "rb") as f:
        data = f.read()
    assert struct.unpack("<i", data[:4])[0] == 20000630, "not an EXR"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\x00", pos)
        name = data[pos:e].decode()
        pos = e + 1
        e = data.index(b"\x00", pos)
        atype = data[pos:e].decode()
        pos = e + 1
        size = struct.unpack("<i", data[pos:pos + 4])[0]
        pos += 4
        attrs[name] = (atype, data[pos:pos + size])
        pos += size
    pos += 1
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    # scanlines per chunk by compression scheme (image_io.rs reads any EXR
    # via the exr crate; here NONE/RLE/ZIPS/ZIP plus PIZ and PXR24 via
    # io/exr_piz.py — B44/B44A/DWA remain unsupported)
    lines_per_block = {0: 1, 1: 1, 2: 1, 3: 16, 4: 32, 5: 16}.get(comp)
    if lines_per_block is None:
        raise ValueError(f"unsupported EXR compression {comp} "
                         "(supported: none/RLE/ZIPS/ZIP/PIZ/PXR24)")
    # channel list
    chs = []
    cdata = attrs["channels"][1]
    cpos = 0
    while cdata[cpos] != 0:
        e = cdata.index(b"\x00", cpos)
        cname = cdata[cpos:e].decode()
        cpos = e + 1
        ctype = struct.unpack("<i", cdata[cpos:cpos + 4])[0]
        cpos += 16
        chs.append((cname, ctype))
    nblocks = -(-h // lines_per_block)
    pos += 8 * nblocks  # skip offset table
    bpp = {0: 4, 1: 2, 2: 4}
    line_bytes = sum(w * bpp[ct] for _, ct in chs)
    out = np.zeros((h, w, 3), np.float32)
    cmap = {"R": 0, "G": 1, "B": 2, "Y": 0}
    for _ in range(nblocks):
        by, size = struct.unpack("<ii", data[pos:pos + 8])
        pos += 8
        nlines = min(lines_per_block, h - (by - y0))
        raw_size = line_bytes * nlines
        payload = data[pos:pos + size]
        pos += size
        if comp == 4 and size < raw_size:
            # PIZ: per-channel u16 planes (io/exr_piz.py)
            from pbrt_tpu.io.exr_piz import piz_uncompress
            pchans = [(w, nlines, 1 if ct == 1 else 2) for _, ct in chs]
            planes = piz_uncompress(payload, pchans)
            for (cname, ctype), pl in zip(chs, planes):
                if ctype == 1:
                    vals = pl.reshape(nlines, w).view(np.float16)                         .astype(np.float32)
                else:
                    v32 = pl.reshape(nlines, w * 2).view(np.uint32)                         .reshape(nlines, w)
                    vals = v32.view(np.float32) if ctype == 2                         else v32.astype(np.float32)
                if cname in cmap:
                    out[by - y0:by - y0 + nlines, :, cmap[cname]] = vals
            continue
        if comp == 5 and size < raw_size:
            from pbrt_tpu.io.exr_piz import pxr24_uncompress
            planes = pxr24_uncompress(payload, chs, w, nlines)
            for (cname, ctype), pl in zip(chs, planes):
                if cname in cmap:
                    out[by - y0:by - y0 + nlines, :, cmap[cname]] =                         pl.astype(np.float32)
            continue
        if comp == 0 or size >= raw_size:
            raw = payload  # stored raw when compression didn't shrink it
        elif comp in (2, 3):
            import zlib
            raw = _exr_unpredict(zlib.decompress(payload))
        else:
            raw = _exr_unpredict(_exr_rle_decode(payload))
        off = 0
        for li in range(nlines):
            yy = by - y0 + li
            for cname, ctype in chs:   # stored alphabetically per line
                if ctype == 2:
                    vals = np.frombuffer(raw, "<f4", w, off)
                    off += 4 * w
                elif ctype == 1:
                    vals = np.frombuffer(raw, "<f2", w, off).astype(np.float32)
                    off += 2 * w
                else:
                    vals = np.frombuffer(raw, "<u4", w, off).astype(np.float32)
                    off += 4 * w
                if cname in cmap:
                    out[yy, :, cmap[cname]] = vals
    if all(c[0] == "Y" for c in chs):
        out[:, :, 1] = out[:, :, 0]
        out[:, :, 2] = out[:, :, 0]
    return out


def _exr_unpredict(t: bytes) -> bytes:
    """OpenEXR ZIP/RLE postprocess: undo the byte delta predictor, then
    de-interleave the two halves (even bytes first, odd bytes second)."""
    d = np.frombuffer(t, np.uint8).astype(np.int64)
    d[1:] -= 128
    rec = (np.cumsum(d) % 256).astype(np.uint8)
    n = len(rec)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = rec[:half]
    out[1::2] = rec[half:]
    return out.tobytes()


def _exr_predict(t: bytes) -> bytes:
    """Inverse of _exr_unpredict (used by tests/writers)."""
    a = np.frombuffer(t, np.uint8)
    n = len(a)
    half = (n + 1) // 2
    inter = np.concatenate([a[0::2], a[1::2]])
    d = inter.astype(np.int64)
    d[1:] = d[1:] - d[:-1] + 128
    return (d % 256).astype(np.uint8).tobytes()


def _exr_rle_decode(src: bytes) -> bytes:
    """OpenEXR RLE: signed count byte — negative: copy -n literals;
    non-negative: repeat next byte n+1 times."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        c = src[i]
        i += 1
        if c > 127:          # negative i8: literal run
            cnt = 256 - c
            out += src[i:i + cnt]
            i += cnt
        else:
            out += bytes([src[i]]) * (c + 1)
            i += 1
    return bytes(out)
