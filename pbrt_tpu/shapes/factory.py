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


def _resolve_alpha(ps: ParamSet, api, pname: str) -> int:
    """'texture alpha' / 'float alpha' -> float-texture id (-1 = no mask).

    Reference: shapes/src/triangle.rs:27-55 (alpha_mask/shadow_alpha_mask
    from_props). A float constant < 1 is wrapped in a constant texture."""
    if ps.is_texture(pname):
        name = ps.texture_name(pname)
        return api.gs.float_textures.get(name,
                                         api.gs.spectrum_textures.get(name, -1))
    vals = ps.values.get(pname)
    if vals and float(vals[0]) < 1.0:
        from pbrt_tpu.scene.api import TextureDecl
        cps = ParamSet()
        cps.declare("float", "value", [float(vals[0])])
        tid = len(api.scene.textures)
        api.scene.textures.append(TextureDecl("constant", "float", cps,
                                              name=f"__alpha{tid}"))
        return tid
    return -1


def _apply_alpha(mesh, ps, api):
    mesh.alpha_tex = _resolve_alpha(ps, api, "alpha")
    sa = _resolve_alpha(ps, api, "shadowalpha")
    mesh.shadow_alpha_tex = sa if sa >= 0 else mesh.alpha_tex
    return mesh


def make_shapes(kind: str, ps: ParamSet, o2w, api):
    from pbrt_tpu.scene.api import ShapeRecord
    if kind == "trianglemesh":
        mesh = _apply_alpha(mesh_from_params(ps.as_plain_dict(), o2w), ps, api)
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
        return [ShapeRecord("trianglemesh", mesh=_apply_alpha(mesh, ps, api))]
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
