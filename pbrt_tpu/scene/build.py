"""Scene flattening: SceneDescription -> CompiledScene (device arrays).

The analog of WorldEnd's make_scene (api/src/lib.rs:447-507 +
render_options.rs:179): concat all meshes into the global triangle SoA,
build the BVH, compile texture/material/light tables, precompute the light
power distribution, and assemble camera/film/sampler specs.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.scene.api import SceneDescription
from pbrt_tpu.scene.types import SceneData, SceneFlags, CompiledScene
from pbrt_tpu.scene.paramset import ParamSet
from pbrt_tpu.accel.bvh import build_bvh, BVH
from pbrt_tpu.accel.kdtree import build_kdtree, KdTree
from pbrt_tpu.materials import compile_materials, MaterialTable
from pbrt_tpu.textures import TextureTable, KIND_IDS as TEX_KIND_IDS
from pbrt_tpu.textures.image import load_image, build_atlas
from pbrt_tpu.lights import LightTable, KIND_IDS as LIGHT_KIND_IDS, light_power, L_AREA, L_INFINITE, L_DISTANT, L_SPOT, L_POINT, L_PROJECTION, L_GONIO
from pbrt_tpu.shapes import quadrics as Q
from pbrt_tpu.core.sampling import Distribution1D
from pbrt_tpu.core.transform import Transform, AnimatedTransform
from pbrt_tpu.cameras import make_camera
from pbrt_tpu.filters import make_filter
from pbrt_tpu.film import make_film
from pbrt_tpu.samplers import make_sampler

MIN_BVH_TRIS = 64   # below this brute-force beats the traversal loop


def _scalar(v):
    """ParamSet values arrive as lists; unwrap single-element ones."""
    if isinstance(v, (list, tuple)) and v:
        return str(v[0])
    return str(v)


def _param_bool(v):
    """ParamSet bool: may arrive as [True], ["true"], "false", or a bool —
    NOT via _scalar (bool("False") is True)."""
    if isinstance(v, (list, tuple)):
        v = v[0] if v else False
    if isinstance(v, str):
        return v.strip().lower() == "true"
    return bool(v)


def compile_textures(decls, cwd="."):
    X = max(len(decls), 1)
    kind = np.zeros(X, np.int32)
    params = np.zeros((X, 16), np.float32)
    child = np.full((X, 2), -1, np.int32)
    w2t = np.tile(np.eye(4, dtype=np.float32), (X, 1, 1))
    image_id = np.full(X, -1, np.int32)
    images = []
    image_cache = {}

    for i, d in enumerate(decls):
        kind[i] = TEX_KIND_IDS.get(d.kind, 0)
        ps = d.params
        # constant/fallback colors
        params[i, 0:3] = ps.find_one_rgb("value", ps.find_one_rgb("tex1", [1, 1, 1]))
        params[i, 3:6] = ps.find_one_rgb("tex2", [0, 0, 0])
        if d.kind == "bilerp":
            params[i, 0:3] = ps.find_one_rgb("v00", [0, 0, 0])
            params[i, 3:6] = ps.find_one_rgb("v01", [1, 1, 1])
            params[i, 13:16] = ps.find_one_rgb("v10", [0, 0, 0])
            params[i, 11] = ps.find_one_rgb("v11", [1, 1, 1])[0]
        # 2D mapping
        mapping = ps.find_one_string("mapping", "uv")
        params[i, 6] = {"uv": 0, "spherical": 1, "cylindrical": 2, "planar": 3}.get(mapping, 0)
        params[i, 7] = ps.find_one_float("uscale", 1.0)
        params[i, 8] = ps.find_one_float("vscale", 1.0)
        params[i, 9] = ps.find_one_float("udelta", 0.0)
        params[i, 10] = ps.find_one_float("vdelta", 0.0)
        if d.world_to_texture is not None:
            w2t[i] = d.world_to_texture
        if mapping == "planar":
            v1 = ps.find_one_rgb("v1", [1, 0, 0])
            v2 = ps.find_one_rgb("v2", [0, 1, 0])
            w2t[i, 0, :3] = v1
            w2t[i, 1, :3] = v2
        # children
        for pname, cid in d.children.items():
            if pname in ("tex1", "value"):
                child[i, 0] = cid
            elif pname == "tex2":
                child[i, 1] = cid
            elif pname == "amount":
                child[i, 1] = cid  # mix amount texture -> slot 1 (documented)
        if d.kind == "mix":
            params[i, 11] = ps.find_one_float("amount", 0.5)
        if d.kind == "dots":
            for pname, cid in d.children.items():
                if pname == "inside":
                    child[i, 0] = cid
                elif pname == "outside":
                    child[i, 1] = cid
            params[i, 0:3] = ps.find_one_rgb("inside", [1, 1, 1])
            params[i, 3:6] = ps.find_one_rgb("outside", [0, 0, 0])
        if d.kind in ("fbm", "wrinkled", "marble", "windy"):
            params[i, 11] = ps.find_one_float("variation", 0.2)
            params[i, 12] = ps.find_one_float("roughness", ps.find_one_float("omega", 0.5))
            params[i, 13] = ps.find_one_float("scale", 1.0)
        if d.kind == "checkerboard" and ps.find_one_int("dimension", 2) == 3:
            kind[i] = TEX_KIND_IDS["checkerboard"] + 1  # T_CHECKER3D
        if d.kind == "imagemap":
            fname = ps.find_one_string("filename", "")
            import os
            path = fname if os.path.isabs(fname) else os.path.join(cwd, fname)
            if path not in image_cache:
                try:
                    img = load_image(path, gamma=ps.find_one_bool("gamma", path.lower().endswith((".png", ".tga", ".jpg"))))
                except Exception:
                    img = np.full((2, 2, 3), 0.5, np.float32)
                image_cache[path] = len(images)
                images.append(img)
            image_id[i] = image_cache[path]
            params[i, 0:3] = ps.find_one_float("scale", 1.0)

    atlas, sizes, nlevels = build_atlas(images)
    return TextureTable(jnp.asarray(kind), jnp.asarray(params), jnp.asarray(child),
                        jnp.asarray(w2t), jnp.asarray(image_id),
                        jnp.asarray(atlas), jnp.asarray(sizes),
                        jnp.asarray(nlevels))


def build_scene(desc: SceneDescription, options=None, cwd=".", seed=0) -> CompiledScene:
    # ---- geometry: concat meshes, collect quadrics ----
    from pbrt_tpu.media import compile_media
    media_tab, med_ids, any_grid_media = compile_media(desc.media)
    tri_p, tri_n, tri_uv, tri_prim, tri_has_n = [], [], [], [], []
    quads = []
    prim_material, prim_light, prim_rev = [], [], []
    prim_medium = []
    prim_alpha = []   # (alpha_tex, shadow_alpha_tex) per prim; -1 = none
    shape_tri_range = {}   # shape index -> (start, count) for area lights
    shape_quad_index = {}
    shape_quad_rev = {}

    n_tri = 0
    for si, rec in enumerate(desc.shapes):
        pid = len(prim_material)
        prim_material.append(rec.material)
        prim_light.append(rec.area_light)
        prim_medium.append((med_ids.get(rec.medium_inside, -1),
                            med_ids.get(rec.medium_outside, -1)))
        if rec.mesh is not None:
            prim_alpha.append((rec.mesh.alpha_tex, rec.mesh.shadow_alpha_tex))
        else:
            prim_alpha.append((-1, -1))
        if rec.mesh is not None:
            m = rec.mesh
            rev = rec.reverse_orientation ^ m.transform_swaps_handedness
            prim_rev.append(rev)
            idx = m.indices
            T = idx.shape[0]
            tri_p.append(m.p[idx])            # [T,3,3]
            if m.n is not None:
                tri_n.append(m.n[idx])
                tri_has_n.append(np.ones(T, bool))
            else:
                tri_n.append(np.zeros((T, 3, 3), np.float32))
                tri_has_n.append(np.zeros(T, bool))
            if m.uv is not None:
                tri_uv.append(m.uv[idx])
            else:
                default_uv = np.array([[0, 0], [1, 0], [1, 1]], np.float32)
                tri_uv.append(np.tile(default_uv, (T, 1, 1)))
            tri_prim.append(np.full(T, pid, np.int32))
            shape_tri_range[si] = (n_tri, T)
            n_tri += T
        else:
            rev = rec.reverse_orientation ^ Transform(rec.o2w).swaps_handedness()
            prim_rev.append(rev)
            shape_quad_rev[si] = rev
            shape_quad_index[si] = len(quads)
            quads.append((rec.quad_type, rec.o2w, rec.w2o, rec.quad_params,
                          rec.quad_area, pid))

    if n_tri == 0:
        # one degenerate far-away triangle keeps shapes static
        tri_p = [np.full((1, 3, 3), 1e30, np.float32)]
        tri_n = [np.zeros((1, 3, 3), np.float32)]
        tri_has_n = [np.zeros(1, bool)]
        tri_uv = [np.zeros((1, 3, 2), np.float32)]
        tri_prim = [np.zeros(1, np.int32)]
        n_tri_real = 0
        n_tri = 1
    else:
        n_tri_real = n_tri

    # ---- shared-prototype instances (transformed_primitive.rs:16): each
    # prototype's triangles are appended ONCE in prototype space, after the
    # world triangles — the world BVH covers only rows [0, n_world_tri) and
    # the instance kernel's prototype subtrees index the shared rows, so
    # uv/material/normal gathers downstream are uniform ----
    n_world_tri = n_tri
    proto_info = []
    proto_gids = []
    for precs in desc.prototypes:
        pp0, pp1, pp2, gids = [], [], [], []
        for rec in precs:
            pid = len(prim_material)
            prim_material.append(rec.material)
            prim_light.append(-1)
            prim_medium.append((med_ids.get(rec.medium_inside, -1),
                                med_ids.get(rec.medium_outside, -1)))
            prim_alpha.append((rec.mesh.alpha_tex, rec.mesh.shadow_alpha_tex))
            m = rec.mesh
            prim_rev.append(rec.reverse_orientation
                            ^ m.transform_swaps_handedness)
            idx = m.indices
            T = idx.shape[0]
            tri_p.append(m.p[idx])
            if m.n is not None:
                tri_n.append(m.n[idx])
                tri_has_n.append(np.ones(T, bool))
            else:
                tri_n.append(np.zeros((T, 3, 3), np.float32))
                tri_has_n.append(np.zeros(T, bool))
            if m.uv is not None:
                tri_uv.append(m.uv[idx])
            else:
                default_uv = np.array([[0, 0], [1, 0], [1, 1]], np.float32)
                tri_uv.append(np.tile(default_uv, (T, 1, 1)))
            tri_prim.append(np.full(T, pid, np.int32))
            verts = m.p[idx].astype(np.float32)
            pp0.append(verts[:, 0])
            pp1.append(verts[:, 1])
            pp2.append(verts[:, 2])
            gids.append(np.arange(n_tri, n_tri + T, dtype=np.int32))
            n_tri += T
        p0 = np.concatenate(pp0)
        p1 = np.concatenate(pp1)
        p2 = np.concatenate(pp2)
        plo = np.minimum(np.minimum(p0, p1), p2)
        phi = np.maximum(np.maximum(p0, p1), p2)
        proto_info.append((plo, phi, p0, p1, p2))
        proto_gids.append(np.concatenate(gids))

    tp = np.concatenate(tri_p).astype(np.float32)
    tn = np.concatenate(tri_n).astype(np.float32)
    thn = np.concatenate(tri_has_n)
    tuv = np.concatenate(tri_uv).astype(np.float32)
    tprim = np.concatenate(tri_prim)

    if not quads:
        quads = [(0, np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32),
                  np.zeros(8, np.float32), 0.0, 0)]
        n_quad_real = 0
    else:
        n_quad_real = len(quads)
    qt = np.array([q[0] for q in quads], np.int32)
    qo2w = np.stack([q[1] for q in quads]).astype(np.float32)
    qw2o = np.stack([q[2] for q in quads]).astype(np.float32)
    qp = np.stack([q[3] for q in quads]).astype(np.float32)
    qarea = np.array([q[4] for q in quads], np.float32)
    qprim = np.array([q[5] for q in quads], np.int32)

    if not prim_material:
        prim_material, prim_light, prim_rev = [0], [-1], [False]
        prim_medium = [(-1, -1)]
        prim_alpha = [(-1, -1)]

    # ---- BVH over WORLD triangles (prototype rows excluded) ----
    wtp = tp[:n_world_tri]
    lo = wtp.min(axis=1)
    hi = wtp.max(axis=1)
    eps = 1e-5 * np.maximum(np.abs(lo) + np.abs(hi), 1.0)
    split_method = desc.accelerator_params.find_one_string("splitmethod", "sah")
    bvh, bvh_host = build_bvh(lo - eps, hi + eps, split_method=split_method,
                              with_host=True)
    use_bvh = n_tri_real >= MIN_BVH_TRIS
    accel = "bvh"
    kd = None
    # Pallas traversal kernel: TPU backend + tables fit the VMEM budget
    # (accel/pallas_traverse.py; opt out with PBRT_TPU_PALLAS=0)
    pbvh = None
    use_pallas = False
    import os as _os
    _pal_env = _os.environ.get("PBRT_TPU_PALLAS", "auto")
    if (use_bvh and desc.accelerator_kind != "kdtree" and _pal_env != "0"
            and (jax.default_backend() == "tpu" or _pal_env == "1")):
        from pbrt_tpu.accel.pallas_traverse import pack_pallas_bvh
        cand, leaf_order = pack_pallas_bvh(bvh_host, wtp[:, 0], wtp[:, 1],
                                           wtp[:, 2])
        if cand.vmem_bytes <= 12 * 1024 * 1024:
            pbvh = cand
            use_pallas = True

    # ---- packed per-triangle attribute table (scene/types.py AT_*) ----
    # one f32 row per triangle with everything hit assembly needs; the
    # slot-keyed copy lets the Pallas kernel's leaf-slot output index
    # attributes with a single gather and no slot->tri indirection
    from pbrt_tpu.scene.types import AT_K
    _pm = np.asarray(prim_material, np.int32)
    _pl = np.asarray(prim_light, np.int32)
    _pr = np.asarray(prim_rev, bool)
    _pa = np.asarray(prim_alpha, np.int32).reshape(-1, 2)
    Tn = tp.shape[0]
    attr = np.zeros((Tn, AT_K), np.float32)
    attr[:, 0:3] = tp[:, 0]
    attr[:, 3:6] = tp[:, 1]
    attr[:, 6:9] = tp[:, 2]
    attr[:, 9:18] = tn.reshape(Tn, 9)
    attr[:, 18:24] = tuv.reshape(Tn, 6)
    attr[:, 24] = thn.astype(np.float32)
    attr[:, 25] = tprim.astype(np.float32)
    attr[:, 26] = _pm[tprim].astype(np.float32)
    attr[:, 27] = _pl[tprim].astype(np.float32)
    attr[:, 28] = _pr[tprim].astype(np.float32)
    attr[:, 29] = np.arange(Tn, dtype=np.float32)
    attr[:, 30:32] = _pa[tprim].astype(np.float32)
    slot_attr = None
    if pbvh is not None:
        order = leaf_order
        slot_attr = attr[np.maximum(order, 0)].copy()
        slot_attr[order < 0] = 0.0
        slot_attr[order < 0, 29] = -1.0
        slot_attr[order < 0, 27] = -1.0
        slot_attr[order < 0, 30:32] = -1.0

    # ---- instance world (two-level traversal, accel/pallas_instance.py) --
    ibvh = None
    n_instances = len(desc.instances)
    if n_instances:
        from pbrt_tpu.accel.pallas_instance import pack_instance_world
        ibvh, iwlo, iwhi = pack_instance_world(proto_info, proto_gids, desc.instances)
    if desc.accelerator_kind == "kdtree" and use_bvh:
        kd = build_kdtree(lo - eps, hi + eps)
        if kd is not None:
            accel = "kdtree"
    if kd is None:  # 1-node placeholder keeps the pytree structure static
        z1 = np.zeros(1, np.int32)
        kd = KdTree(jnp.asarray(np.full(1, 3, np.int32)), jnp.zeros(1, jnp.float32),
                    jnp.asarray(z1), jnp.asarray(z1), jnp.asarray(z1),
                    jnp.asarray(z1), jnp.zeros(3, jnp.float32),
                    jnp.zeros(3, jnp.float32))

    # ---- world bounds ----
    pts = [lo, hi]
    if ibvh is not None:
        pts.extend([iwlo[None], iwhi[None]])
    for i in range(len(quads)):
        if n_quad_real == 0:
            break
        qlo, qhi = Q.quadric_object_bounds(int(qt[i]), qp[i])
        corners = np.array([[x, y, z] for x in (qlo[0], qhi[0])
                            for y in (qlo[1], qhi[1]) for z in (qlo[2], qhi[2])])
        wpts = corners @ qo2w[i][:3, :3].T + qo2w[i][:3, 3]
        pts.extend([wpts.min(0)[None], wpts.max(0)[None]] if wpts.ndim > 1 else [wpts])
    allpts = np.concatenate([p.reshape(-1, 3) for p in pts])
    allpts = allpts[np.abs(allpts).max(-1) < 1e29]
    if allpts.size == 0:
        wc = np.zeros(3, np.float32)
        wr = 1.0
    else:
        wlo, whi = allpts.min(0), allpts.max(0)
        wc = 0.5 * (wlo + whi)
        wr = float(np.linalg.norm(whi - wlo) * 0.5 + 1e-6)

    # ---- textures & materials ----
    tex = compile_textures(desc.textures, cwd)
    # static texture-kind set for eval_texture code gating (flags.tex_kinds)
    tex_kinds = tuple(sorted({TEX_KIND_IDS.get(d.kind, 0)
                              for d in desc.textures} |
                             ({TEX_KIND_IDS["checkerboard"] + 1}
                              if any(d.kind == "checkerboard"
                                     and d.params.find_one_int("dimension", 2) == 3
                                     for d in desc.textures) else set())))
    mats, has_tex_slot, fourier_tables, has_subsurface = compile_materials(
        desc.materials, cwd=cwd)
    from pbrt_tpu.materials.fourier import build_fourier_table
    fourier_tab = build_fourier_table(fourier_tables)

    # ---- lights ----
    lights_rows = []
    light_images = []   # projection/gonio 64x64 map atlas (params[8] ids)
    tri_cdf_all, tri_area_all, ltri_all = [], [], []
    env_image = np.zeros((1, 1, 3), np.float32)
    env_built = None
    for li, lr in enumerate(desc.lights):
        kid = LIGHT_KIND_IDS.get(lr.kind)
        if kid is None:
            continue
        ps = lr.params
        params = np.zeros(12, np.float32)
        params[8] = -1
        scale = ps.find_one_rgb("scale", [1, 1, 1])
        if kid == L_POINT:
            L = ps.find_one_rgb("I", [1, 1, 1]) * scale
            params[0:3] = np.asarray(Transform(lr.l2w).point(ps.find_one_rgb("from", [0, 0, 0])))
        elif kid == L_SPOT:
            L = ps.find_one_rgb("I", [1, 1, 1]) * scale
            frm = ps.find_one_rgb("from", [0, 0, 0])
            to = ps.find_one_rgb("to", [0, 0, 1])
            t = Transform(lr.l2w)
            params[0:3] = np.asarray(t.point(frm))
            d = np.asarray(t.point(to)) - params[0:3]
            params[3:6] = d / max(np.linalg.norm(d), 1e-9)
            cone = ps.find_one_float("coneangle", 30.0)
            delta = ps.find_one_float("conedeltaangle", 5.0)
            params[6] = np.cos(np.radians(cone))
            params[7] = np.cos(np.radians(cone - delta))
        elif kid in (L_PROJECTION, L_GONIO):
            L = ps.find_one_rgb("I", [1, 1, 1]) * scale
            t = Transform(lr.l2w)
            params[0:3] = np.asarray(t.point([0, 0, 0]))
            params[3:6] = np.asarray(t.vector([0, 0, 1.0]))
            fov = ps.find_one_float("fov", 45.0)
            params[6] = np.cos(np.radians(fov))
            params[7] = np.tan(np.radians(fov) * 0.5)
            # image map (projection.rs MIPMap / goniometric.rs photometric
            # map), resampled to the fixed 64x64 atlas tile
            mapname = ps.find_one_string("mapname", "")
            if mapname:
                try:
                    from pbrt_tpu.io.image_io import read_image
                    img = np.asarray(read_image(
                        os.path.join(cwd, mapname)), np.float32)
                    if img.ndim == 2:
                        img = np.repeat(img[:, :, None], 3, -1)

                    ys = np.linspace(0, img.shape[0] - 1, 64).astype(int)
                    xs = np.linspace(0, img.shape[1] - 1, 64).astype(int)
                    params[8] = len(light_images)
                    # source aspect (projection.rs screen window from map
                    # aspect): t axis of the frustum scales by h/w so
                    # non-square maps keep their shape despite the square
                    # 64x64 atlas tile
                    params[9] = img.shape[0] / max(img.shape[1], 1)
                    light_images.append(img[ys][:, xs, :3])
                except Exception as e:  # noqa: BLE001
                    print(f"warning: light map {mapname!r}: {e}")
        elif kid == L_DISTANT:
            L = ps.find_one_rgb("L", [1, 1, 1]) * scale
            frm = ps.find_one_rgb("from", [0, 0, 0])
            to = ps.find_one_rgb("to", [0, 0, 1])
            t = Transform(lr.l2w)
            w = np.asarray(t.point(frm)) - np.asarray(t.point(to))
            params[3:6] = w / max(np.linalg.norm(w), 1e-9)
        elif kid == L_AREA:
            L = ps.find_one_rgb("L", [1, 1, 1]) * scale
            params[5] = 1.0 if ps.find_one_bool("twosided", False) else 0.0
            sidx = lr.shape_index
            if sidx in shape_tri_range:
                start, count = shape_tri_range[sidx]
                light_tris = tp[start:start + count]      # [T,3,3]
                params[0] = 1.0
            elif sidx in shape_quad_index:
                qi = shape_quad_index[sidx]
                # quadric emitter: dense build-time tessellation so every
                # area light samples through the same triangle-CDF gather
                # kernel (reference samples quadrics analytically per shape,
                # shapes/src/sphere.rs sample — divergent per-kind code the
                # wavefront design avoids)
                from pbrt_tpu.shapes.quadrics import tessellate_quadric
                light_tris = tessellate_quadric(int(qt[qi]), qp[qi], qo2w[qi],
                                                flip_normal=shape_quad_rev.get(sidx, False))
                params[0] = 0.0
                params[1] = qi
            else:
                continue
            P0, P1, P2 = light_tris[:, 0], light_tris[:, 1], light_tris[:, 2]
            areas = 0.5 * np.linalg.norm(np.cross(P1 - P0, P2 - P0), axis=-1)
            total = float(areas.sum())
            params[2] = sum(len(c) for c in tri_cdf_all)   # ltri offset
            params[3] = len(areas)
            params[4] = max(total, 1e-12)
            params[6] = params[2]                          # cdf offset
            cdf = np.cumsum(areas) / max(total, 1e-12)
            tri_cdf_all.append(cdf.astype(np.float32))
            tri_area_all.append(areas.astype(np.float32))
            ltri_all.append(light_tris.astype(np.float32))
        elif kid == L_INFINITE:
            L = ps.find_one_rgb("L", [1, 1, 1]) * scale
            mapname = ps.find_one_string("mapname", "")
            if mapname:
                path = mapname if os.path.isabs(mapname) else os.path.join(cwd, mapname)
                try:
                    if path.lower().endswith(".exr") or path.lower().endswith(".pfm"):
                        from pbrt_tpu.io.image_io import read_image
                        env_image = read_image(path)
                    else:
                        env_image = load_image(path)
                    params[8] = 0
                except Exception:
                    params[8] = -1
        else:
            L = np.ones(3, np.float32)
        lmid = med_ids.get(getattr(lr, "medium", ""), -1)
        lights_rows.append((kid, L, params, lr.l2w, lr.w2l, lmid))

    Lc = max(len(lights_rows), 1)
    l_kind = np.zeros(Lc, np.int32)
    l_L = np.zeros((Lc, 3), np.float32)
    l_params = np.zeros((Lc, 12), np.float32)
    l_params[:, 8] = -1
    l_l2w = np.tile(np.eye(4, dtype=np.float32), (Lc, 1, 1))
    l_w2l = np.tile(np.eye(4, dtype=np.float32), (Lc, 1, 1))
    l_med = np.full(Lc, -1, np.int32)
    for i, (k, L, p, m, mi, lmid) in enumerate(lights_rows):
        l_kind[i] = k
        l_L[i] = L
        l_params[i] = p
        l_l2w[i] = m
        l_w2l[i] = mi
        l_med[i] = lmid
    n_lights = len(lights_rows)

    tri_cdf = np.concatenate(tri_cdf_all) if tri_cdf_all else np.zeros(1, np.float32)
    tri_area = np.concatenate(tri_area_all) if tri_area_all else np.zeros(1, np.float32)
    ltri = (np.concatenate(ltri_all) if ltri_all
            else np.zeros((1, 3, 3), np.float32))

    # env importance distribution (luminance * sin(theta))
    H, W = env_image.shape[:2]
    lum = env_image @ np.array([0.212671, 0.715160, 0.072169], np.float32)
    sin_w = np.sin((np.arange(H) + 0.5) / H * np.pi).astype(np.float32)
    f2d = (lum * sin_w[:, None]).astype(np.float32)
    cond_cdf = np.concatenate([np.zeros((H, 1), np.float32),
                               np.cumsum(f2d, -1, dtype=np.float64).astype(np.float32) / W], -1)
    cond_int = cond_cdf[:, -1].copy()
    safe = np.where(cond_int > 0, cond_int, 1.0)
    cond_cdf = cond_cdf / safe[:, None]
    cond_cdf[:, -1] = 1.0
    marg_cdf = np.concatenate([[0.0], np.cumsum(cond_int, dtype=np.float64).astype(np.float32) / H]).astype(np.float32)
    marg_int = float(marg_cdf[-1])
    if marg_int > 0:
        marg_cdf = marg_cdf / marg_int
    marg_cdf[-1] = 1.0

    light_tab = LightTable(
        jnp.asarray(l_kind), jnp.asarray(l_L), jnp.asarray(l_params),
        jnp.asarray(l_l2w), jnp.asarray(l_w2l),
        jnp.asarray(tri_cdf), jnp.asarray(tri_area),
        jnp.asarray(f2d), jnp.asarray(cond_cdf), jnp.asarray(cond_int),
        jnp.asarray(cond_int), jnp.asarray(marg_cdf), jnp.asarray(np.float32(marg_int)),
        jnp.asarray(env_image),
        jnp.asarray(ltri[:, 0]), jnp.asarray(ltri[:, 1]), jnp.asarray(ltri[:, 2]),
        jnp.asarray(np.stack(light_images).astype(np.float32) if light_images
                    else np.zeros((1, 1, 1, 3), np.float32)),
        medium=jnp.asarray(l_med))

    # light selection distribution (power strategy,
    # core/src/light_distrib/mod.rs power)
    env_mean = float(lum.mean()) if H > 1 else 1.0
    powers = [light_power(int(l_kind[i]), l_L[i], l_params[i], wr, env_mean)
              for i in range(n_lights)]
    if not powers or sum(powers) <= 0:
        powers = [1.0] * max(n_lights, 1)
    light_distr = Distribution1D.build(np.asarray(powers, np.float32))

    data = SceneData(
        jnp.asarray(tp[:, 0]), jnp.asarray(tp[:, 1]), jnp.asarray(tp[:, 2]),
        jnp.asarray(tn), jnp.asarray(thn), jnp.asarray(tuv), jnp.asarray(tprim),
        jnp.asarray(qt), jnp.asarray(qo2w), jnp.asarray(qw2o), jnp.asarray(qp),
        jnp.asarray(qprim),
        bvh, kd,
        jnp.asarray(np.asarray(prim_material, np.int32)),
        jnp.asarray(np.asarray(prim_light, np.int32)),
        jnp.asarray(np.asarray(prim_rev, bool)),
        jnp.asarray(np.asarray(prim_medium, np.int32).reshape(-1, 2)),
        jnp.asarray(np.asarray(prim_alpha, np.int32).reshape(-1, 2)),
        mats, tex, light_tab, light_distr,
        fourier_tab,
        media_tab,
        jnp.asarray(np.int32(med_ids.get(desc.camera_medium_name, -1))),
        jnp.asarray(wc.astype(np.float32)), jnp.asarray(np.float32(wr)))
    data = data._replace(tri_attr=jnp.asarray(attr))
    if slot_attr is not None:
        data = data._replace(slot_attr=jnp.asarray(slot_attr))
    if pbvh is not None:
        data = data._replace(pbvh=pbvh)
    if ibvh is not None:
        data = data._replace(ibvh=ibvh)

    from pbrt_tpu.materials import material_families
    flags = SceneFlags(
        n_tris=n_tri_real, n_quadrics=n_quad_real, n_lights=n_lights,
        n_instances=n_instances, n_world_tris=n_world_tri,
        any_animated_inst=any(i.get("animated") for i in desc.instances),
        bsdf_fams=tuple(material_families(desc.materials)),
        n_materials=len(desc.materials),
        has_infinite=any(k == L_INFINITE for k in l_kind[:n_lights]),
        infinite_light_ids=tuple(i for i, k in enumerate(l_kind[:n_lights])
                                 if k == L_INFINITE),
        has_area_lights=any(k == L_AREA for k in l_kind[:n_lights]),
        use_bvh=use_bvh, accel=accel, has_tex_slot=has_tex_slot,
        any_normals=bool(thn.any()), any_uv=True,
        n_media=len(desc.media),
        any_grid_media=any_grid_media and len(desc.media) > 0,
        has_subsurface=has_subsurface,
        tex_kinds=tex_kinds,
        has_fourier=bool(fourier_tables),
        use_pallas=use_pallas,
        has_alpha=bool(np.any(np.asarray(prim_alpha, np.int32) >= 0)),
        light_strategy=_scalar(desc.integrator_params.as_plain_dict().get(
            "lightsamplestrategy", "power")),
        # spectral mode: subsurface transport keeps its 3-channel diffusion
        # profiles, so scenes with BSSRDFs fall back to RGB
        spectral=_param_bool(desc.integrator_params.as_plain_dict().get(
            "spectral", False)) and not has_subsurface
        and not bool(fourier_tables))

    # spatial light-selection voxel grid (path.rs:314 lightsamplestrategy;
    # eager vectorized build, lights/distrib.py)
    if flags.light_strategy == "spatial" and n_lights > 0:
        from pbrt_tpu.lights.distrib import build_spatial_distrib
        sv = desc.integrator_params.as_plain_dict().get("spatialvoxels")
        sv = int(sv[0]) if sv else None
        data = data._replace(
            light_spatial=build_spatial_distrib(data, flags, max_voxels=sv))

    # ---- specs ----
    res_params = desc.film_params
    filt = make_filter(desc.filter_kind, desc.filter_params.as_plain_dict())
    film = make_film(res_params.as_plain_dict(), filt, options)
    resolution = film.full_resolution
    cam2world = AnimatedTransform(desc.camera_to_world[0], 0.0,
                                  desc.camera_to_world[1], 1.0)
    camera = make_camera(desc.camera_kind, desc.camera_params.as_plain_dict(),
                         cam2world, resolution)
    sampler = make_sampler(desc.sampler_kind, desc.sampler_params.as_plain_dict(),
                           resolution, seed)
    return CompiledScene(data, flags, camera, film, sampler, filt,
                         desc.integrator_kind,
                         desc.integrator_params.as_plain_dict())


def load_scene(path: str, options=None, seed: int = 0) -> CompiledScene:
    """Parse + build a .pbrt file end to end (main.rs render())."""
    import os
    from pbrt_tpu.scene.api import Api
    from pbrt_tpu.scene.parser import parse_file
    api = Api()
    api.cwd = os.path.dirname(os.path.abspath(path))
    parse_file(path, api)
    return build_scene(api.scene, options, cwd=api.cwd, seed=seed)


def load_scene_string(text: str, options=None, cwd=".", seed: int = 0) -> CompiledScene:
    from pbrt_tpu.scene.api import Api
    from pbrt_tpu.scene.parser import parse_string
    api = Api()
    api.cwd = cwd
    parse_string(text, api, cwd)
    return build_scene(api.scene, options, cwd=cwd, seed=seed)
