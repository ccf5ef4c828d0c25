"""Shape name -> records dispatch (the make_shape registry,
api/src/graphics_state.rs:254-287)."""
from __future__ import annotations

import os
import numpy as np

from pbrt_tpu.scene.paramset import ParamSet
from pbrt_tpu.shapes.triangle import TriangleMeshData, mesh_from_params
from pbrt_tpu.shapes import quadrics as Q
from pbrt_tpu.shapes.loopsubdiv import loop_subdivide
from pbrt_tpu.shapes.ply import read_ply

QUADRIC_KINDS = {"sphere", "cylinder", "disk", "cone", "paraboloid", "hyperboloid"}


def make_shapes(kind: str, ps: ParamSet, o2w, api):
    from pbrt_tpu.scene.api import ShapeRecord
    if kind == "trianglemesh":
        mesh = mesh_from_params(ps.as_plain_dict(), o2w)
        return [ShapeRecord("trianglemesh", mesh=mesh)]
    if kind == "plymesh":
        fname = ps.find_one_string("filename", "")
        path = fname if os.path.isabs(fname) else os.path.join(api.cwd if hasattr(api, "cwd") else ".", fname)
        if not os.path.exists(path):
            import logging
            logging.getLogger(__name__).warning("PLY not found: %s", path)
            return []
        v, n, uv, f = read_ply(path)
        mesh = TriangleMeshData(f.astype(np.int32),
                                np.asarray(o2w.point(v), np.float32),
                                None if n is None else np.asarray(o2w.normal(n), np.float32),
                                None, uv,
                                transform_swaps_handedness=o2w.swaps_handedness())
        return [ShapeRecord("trianglemesh", mesh=mesh)]
    if kind == "loopsubdiv":
        idx = ps.find_ints("indices").reshape(-1, 3)
        p = ps.find_point3s("P")
        levels = ps.find_one_int("levels", ps.find_one_int("nlevels", 3))
        v2, f2, n2 = loop_subdivide(p, idx, levels)
        mesh = TriangleMeshData(f2.astype(np.int32),
                                np.asarray(o2w.point(v2), np.float32),
                                np.asarray(o2w.normal(n2), np.float32),
                                transform_swaps_handedness=o2w.swaps_handedness())
        return [ShapeRecord("trianglemesh", mesh=mesh)]
    if kind in QUADRIC_KINDS:
        qt, qp, area = Q.build_quadric(kind, ps.as_plain_dict())
        return [ShapeRecord(kind, quad_type=qt, quad_params=qp, quad_area=area,
                            o2w=o2w.m.copy(), w2o=o2w.m_inv.copy())]
    if kind == "curve":
        from pbrt_tpu.shapes.curve import curve_records
        return curve_records(ps, o2w)
    raise ValueError(f"unknown shape kind {kind!r}")
