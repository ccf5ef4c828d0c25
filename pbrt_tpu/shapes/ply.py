"""Minimal PLY mesh reader (ascii + binary little/big endian).

Reference: shapes/src/plymesh.rs (ply-rs loader). Supports vertex
properties x/y/z, nx/ny/nz, u/v (or s/t), and triangle/quads face lists.
"""
from __future__ import annotations

import struct
import numpy as np

_TYPES = {
    "char": ("i1", 1), "int8": ("i1", 1),
    "uchar": ("u1", 1), "uint8": ("u1", 1),
    "short": ("i2", 2), "int16": ("i2", 2),
    "ushort": ("u2", 2), "uint16": ("u2", 2),
    "int": ("i4", 4), "int32": ("i4", 4),
    "uint": ("u4", 4), "uint32": ("u4", 4),
    "float": ("f4", 4), "float32": ("f4", 4),
    "double": ("f8", 8), "float64": ("f8", 8),
}


def read_ply(path: str):
    """Returns (verts [V,3], normals [V,3] | None, uv [V,2] | None, faces [F,3])."""
    with open(path, "rb") as fh:
        data = fh.read()
    # header
    end = data.find(b"end_header\n")
    if end < 0:
        raise ValueError("not a PLY file (no end_header)")
    header = data[:end].decode("ascii", "replace").splitlines()
    body = data[end + len(b"end_header\n"):]
    fmt = "ascii"
    elements = []  # (name, count, [(ptype, name) or ('list', ctype, itype, name)])
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append([parts[1], int(parts[2]), []])
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
            else:
                elements[-1][2].append((parts[1], parts[2]))

    verts = normals = uv = None
    faces = []
    if fmt == "ascii":
        toks = body.decode("ascii", "replace").split()
        ti = 0
        for name, count, props in elements:
            if name == "vertex":
                cols = [p[1] for p in props]
                arr = np.array(toks[ti:ti + count * len(cols)], np.float64).reshape(count, len(cols))
                ti += count * len(cols)
                verts, normals, uv = _extract_vertex(arr, cols)
            elif name == "face":
                for _ in range(count):
                    n = int(toks[ti]); ti += 1
                    idx = [int(toks[ti + k]) for k in range(n)]; ti += n
                    for k in range(1, n - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
            else:
                for _ in range(count):
                    for p in props:
                        if p[0] == "list":
                            n = int(toks[ti]); ti += 1 + n
                        else:
                            ti += 1
    else:
        endian = "<" if "little" in fmt else ">"
        off = 0
        for name, count, props in elements:
            if name == "vertex" and all(p[0] != "list" for p in props):
                dtype = np.dtype([(p[1], endian + _TYPES[p[0]][0]) for p in props])
                arr = np.frombuffer(body, dtype, count, off)
                off += dtype.itemsize * count
                cols = [p[1] for p in props]
                mat = np.stack([arr[c].astype(np.float64) for c in cols], -1)
                verts, normals, uv = _extract_vertex(mat, cols)
            elif name == "face":
                for _ in range(count):
                    for p in props:
                        if p[0] == "list":
                            ct, it = _TYPES[p[1]], _TYPES[p[2]]
                            n = int(np.frombuffer(body, endian + ct[0], 1, off)[0])
                            off += ct[1]
                            idx = np.frombuffer(body, endian + it[0], n, off).astype(np.int64)
                            off += it[1] * n
                            if p[3] in ("vertex_indices", "vertex_index"):
                                for k in range(1, n - 1):
                                    faces.append([idx[0], idx[k], idx[k + 1]])
                        else:
                            off += _TYPES[p[0]][1]
            else:
                for _ in range(count):
                    for p in props:
                        if p[0] == "list":
                            ct, it = _TYPES[p[1]], _TYPES[p[2]]
                            n = int(np.frombuffer(body, endian + ct[0], 1, off)[0])
                            off += ct[1] + it[1] * n
                        else:
                            off += _TYPES[p[0]][1]
    return (np.asarray(verts, np.float32),
            None if normals is None else np.asarray(normals, np.float32),
            None if uv is None else np.asarray(uv, np.float32),
            np.asarray(faces, np.int32).reshape(-1, 3))


def _extract_vertex(arr, cols):
    ci = {c: i for i, c in enumerate(cols)}
    verts = np.stack([arr[:, ci["x"]], arr[:, ci["y"]], arr[:, ci["z"]]], -1)
    normals = uv = None
    if all(k in ci for k in ("nx", "ny", "nz")):
        normals = np.stack([arr[:, ci["nx"]], arr[:, ci["ny"]], arr[:, ci["nz"]]], -1)
    for ukey, vkey in (("u", "v"), ("s", "t"), ("texture_u", "texture_v")):
        if ukey in ci and vkey in ci:
            uv = np.stack([arr[:, ci[ukey]], arr[:, ci[vkey]]], -1)
            break
    return verts, normals, uv


def write_ply(path, verts, faces):
    """ASCII writer (test fixtures)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
