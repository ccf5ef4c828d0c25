"""Texture tables + wavefront evaluation.

Reference: textures/src/ (constant/scale/mix/bilerp/imagemap/uv/checkerboard/
dots/fbm/wrinkled/windy/marble) + core/src/texture/ (2D/3D mappings, Perlin
noise). TPU re-design: textures live in one SoA table; evaluation runs
top-down with a STATIC recursion depth — children of every lane's texture
are evaluated for the whole wavefront then combined per-kind with masks.
Procedural noise uses hash-based gradient Perlin (same capability as the
reference's permutation-table Perlin; core/src/texture/common.rs:45).

Table layout:
  kind    [X] int32
  params  [X, 16] float32:
      [0:3]  constant rgb / scale factors / tex1 color fallback
      [3:6]  tex2 color fallback
      [6]    mapping kind (0 uv, 1 spherical, 2 cylindrical, 3 planar)
      [7:11] uscale, vscale, udelta, vdelta   (planar: packed vs/vt + deltas
             live in w2t rows)
      [11]   aux0 (checker dims / octaves / variation)
      [12]   aux1 (omega / checker aamode)
      [13]   aux2
  child   [X, 2] int32 (tex1, tex2 / inner textures; -1 = use params color)
  w2t     [X, 4, 4] world->texture transform for 3D mappings
  image   [X] int32 image id (imagemap; -1 none)
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import dot, normalize
from pbrt_tpu.samplers.hashing import pcg_hash, hash3, u32_to_float

(T_CONSTANT, T_SCALE, T_MIX, T_BILERP, T_UV, T_CHECKER2D, T_CHECKER3D,
 T_DOTS, T_FBM, T_WRINKLED, T_WINDY, T_MARBLE, T_IMAGEMAP, T_PTEX) = range(14)

KIND_IDS = {"constant": T_CONSTANT, "scale": T_SCALE, "mix": T_MIX,
            "bilerp": T_BILERP, "uv": T_UV, "checkerboard": T_CHECKER2D,
            "dots": T_DOTS, "fbm": T_FBM, "wrinkled": T_WRINKLED,
            "windy": T_WINDY, "marble": T_MARBLE, "imagemap": T_IMAGEMAP}

MAX_TEX_DEPTH = 4


class TextureTable(NamedTuple):
    kind: jnp.ndarray
    params: jnp.ndarray
    child: jnp.ndarray
    w2t: jnp.ndarray
    image_id: jnp.ndarray
    # image atlas: every image Lanczos-resampled to a square pow2 and packed
    # as a "mip strip" (level 0 + stacked levels; textures/image.py)
    atlas: jnp.ndarray         # [n_images, S, S + S//2, 3]
    atlas_size: jnp.ndarray    # [n_images, 2] (S, S)
    atlas_levels: jnp.ndarray  # [n_images] number of mip levels


# ---------------------------------------------------------------------------
# Perlin noise (hash-gradient; core/src/texture/common.rs noise/fbm/turbulence)
# ---------------------------------------------------------------------------

def _grad(ix, iy, iz, fx, fy, fz):
    h = hash3(ix.astype(jnp.uint32), iy.astype(jnp.uint32), iz.astype(jnp.uint32))
    h = h & jnp.uint32(15)
    u = jnp.where(h < 8, fx, fy)
    v = jnp.where(h < 4, fy, jnp.where((h == 12) | (h == 14), fx, fz))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def noise3(p):
    """Perlin gradient noise in [-1, 1], p [...,3]."""
    pi = jnp.floor(p)
    pf = p - pi
    ix = pi[..., 0].astype(jnp.int32)
    iy = pi[..., 1].astype(jnp.int32)
    iz = pi[..., 2].astype(jnp.int32)
    fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]
    u, v, w = _fade(fx), _fade(fy), _fade(fz)

    def g(dx, dy, dz):
        return _grad(ix + dx, iy + dy, iz + dz, fx - dx, fy - dy, fz - dz)

    x00 = vm.lerp(u, g(0, 0, 0), g(1, 0, 0))
    x10 = vm.lerp(u, g(0, 1, 0), g(1, 1, 0))
    x01 = vm.lerp(u, g(0, 0, 1), g(1, 0, 1))
    x11 = vm.lerp(u, g(0, 1, 1), g(1, 1, 1))
    y0 = vm.lerp(v, x00, x10)
    y1 = vm.lerp(v, x01, x11)
    return vm.lerp(w, y0, y1)


def fbm(p, omega, max_octaves: int):
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(max_octaves):
        total = total + o * noise3(p * lam)
        lam *= 1.99
        o *= omega
    return total


def turbulence(p, omega, max_octaves: int):
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(max_octaves):
        total = total + o * jnp.abs(noise3(p * lam))
        lam *= 1.99
        o *= omega
    return total


# ---------------------------------------------------------------------------
# mapping
# ---------------------------------------------------------------------------

def _map_st(params, w2t, uv, p):
    """2D mapping of hit -> (s, t) per lane (core/src/texture/mapping/)."""
    mk = params[:, 6].astype(jnp.int32)
    us, vs, ud, vd = params[:, 7], params[:, 8], params[:, 9], params[:, 10]
    # uv mapping
    st_uv = jnp.stack([uv[:, 0] * us + ud, uv[:, 1] * vs + vd], -1)
    # spherical: project p through w2t onto unit sphere
    pt = jnp.einsum("nij,nj->ni", w2t[:, :3, :3], p) + w2t[:, :3, 3]
    vec = normalize(pt)
    theta = vm.spherical_theta(vec)
    phi = vm.spherical_phi(vec)
    st_sph = jnp.stack([theta * (1.0 / vm.PI), phi * (1.0 / (2 * vm.PI))], -1)
    # cylindrical
    st_cyl = jnp.stack([phi * (1.0 / (2 * vm.PI)), pt[:, 2]], -1)
    # planar: vs/vt vectors stored in w2t rows 0/1 (build packs them there)
    st_pla = jnp.stack([dot(p, w2t[:, 0, :3]) + ud, dot(p, w2t[:, 1, :3]) + vd], -1)
    st = jnp.where((mk == 1)[:, None], st_sph,
                   jnp.where((mk == 2)[:, None], st_cyl,
                             jnp.where((mk == 3)[:, None], st_pla, st_uv)))
    return st


def _map_p3(w2t, p):
    return jnp.einsum("nij,nj->ni", w2t[:, :3, :3], p) + w2t[:, :3, 3]


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def eval_texture(tex: TextureTable, tex_id, uv, p, depth: int = MAX_TEX_DEPTH,
                 duv=None, kinds=None):
    """[N,3] value of per-lane texture ids (-1 -> zeros).

    kinds: STATIC tuple of texture-kind ids present in the scene
    (SceneFlags.tex_kinds) — the texture analog of the bsdf_fams lobe
    gating. Absent kinds emit no code, which matters doubly here because
    the child recursion would otherwise instantiate 2^depth copies of
    every kind's eval (incl. the mip/EWA image machinery) in the graph —
    a measured multi-minute XLA:CPU compile bomb on textured scenes.
    None = all kinds (back-compat)."""
    all_kinds = tuple(range(14))
    kset = frozenset(all_kinds if kinds is None else kinds)

    def has(*ks):
        return any(k in kset for k in ks)

    tid = jnp.maximum(tex_id, 0)
    kind = tex.kind[tid]
    params = tex.params[tid]
    w2t = tex.w2t[tid]
    const_rgb = params[:, 0:3]

    if depth <= 0 or not has(*[k for k in kset if k != T_CONSTANT]):
        return jnp.where((tex_id < 0)[:, None], 0.0, const_rgb)

    needs_children = has(T_SCALE, T_MIX, T_CHECKER2D, T_CHECKER3D, T_DOTS)
    if needs_children:
        child = tex.child[tid]
        # child fallbacks: -1 means "use packed constant color"
        c1 = jnp.where((child[:, 0] >= 0)[:, None],
                       eval_texture(tex, child[:, 0], uv, p, depth - 1, duv,
                                    kinds=kinds), params[:, 0:3])
        c2 = jnp.where((child[:, 1] >= 0)[:, None],
                       eval_texture(tex, child[:, 1], uv, p, depth - 1, duv,
                                    kinds=kinds), params[:, 3:6])

    st = _map_st(params, w2t, uv, p) if has(T_SCALE, T_MIX, T_BILERP, T_UV,
                                            T_CHECKER2D, T_DOTS,
                                            T_IMAGEMAP) else None
    p3 = _map_p3(w2t, p) if has(T_CHECKER3D, T_FBM, T_WRINKLED, T_WINDY,
                                T_MARBLE) else None

    out = const_rgb  # T_CONSTANT
    if has(T_SCALE):
        out = jnp.where((kind == T_SCALE)[:, None], c1 * c2, out)
    if has(T_MIX):
        amt = params[:, 11:12]
        out = jnp.where((kind == T_MIX)[:, None],
                        (1.0 - amt) * c1 + amt * c2, out)
    # bilerp: 4 corner values v00/v01/v10/v11 packed in params[0:3],[3:6] and
    # child slots for the other two? round-1: corners in params only
    if has(T_BILERP):
        v00 = params[:, 0:3]
        v01 = params[:, 3:6]
        v10 = params[:, 13:16]
        v11m = params[:, 11]  # grayscale 4th corner fallback
        v11 = jnp.stack([v11m, v11m, v11m], -1)
        su, tv = st[:, 0:1], st[:, 1:2]
        bil = (1 - su) * (1 - tv) * v00 + (1 - su) * tv * v01             + su * (1 - tv) * v10 + su * tv * v11
        out = jnp.where((kind == T_BILERP)[:, None], bil, out)
    if has(T_UV):
        uvc = jnp.stack([st[:, 0] - jnp.floor(st[:, 0]),
                         st[:, 1] - jnp.floor(st[:, 1]),
                         jnp.zeros_like(st[:, 0])], -1)
        out = jnp.where((kind == T_UV)[:, None], uvc, out)
    if has(T_CHECKER2D):
        check2 = (jnp.floor(st[:, 0]) + jnp.floor(st[:, 1])) % 2.0
        out = jnp.where((kind == T_CHECKER2D)[:, None],
                        jnp.where((check2 == 0)[:, None], c1, c2), out)
    if has(T_CHECKER3D):
        check3 = (jnp.floor(p3[:, 0]) + jnp.floor(p3[:, 1])
                  + jnp.floor(p3[:, 2])) % 2.0
        out = jnp.where((kind == T_CHECKER3D)[:, None],
                        jnp.where((check3 == 0)[:, None], c1, c2), out)
    if has(T_DOTS):
        # polka dots (textures/src/dots.rs): one random dot per integer cell
        scell = jnp.floor(st[:, 0] + 0.5).astype(jnp.int32)
        tcell = jnp.floor(st[:, 1] + 0.5).astype(jnp.int32)
        h1 = u32_to_float(hash3(scell.astype(jnp.uint32), tcell.astype(jnp.uint32), jnp.uint32(1)))
        h2 = u32_to_float(hash3(scell.astype(jnp.uint32), tcell.astype(jnp.uint32), jnp.uint32(2)))
        h3 = u32_to_float(hash3(scell.astype(jnp.uint32), tcell.astype(jnp.uint32), jnp.uint32(3)))
        has_dot = h1 < 0.5
        radius = 0.35
        center_s = scell + (-0.5 + radius) + (1.0 - 2 * radius) * h2
        center_t = tcell + (-0.5 + radius) + (1.0 - 2 * radius) * h3
        ds = st[:, 0] - center_s
        dt = st[:, 1] - center_t
        inside = has_dot & (ds * ds + dt * dt < radius * radius)
        out = jnp.where((kind == T_DOTS)[:, None],
                        jnp.where(inside[:, None], c1, c2), out)
    octaves = 6
    if has(T_FBM):
        fb = fbm(p3, 0.5, octaves)[..., None]
        out = jnp.where((kind == T_FBM)[:, None],
                        jnp.broadcast_to(fb, out.shape), out)
    if has(T_WRINKLED):
        tb = turbulence(p3, 0.5, octaves)[..., None]
        out = jnp.where((kind == T_WRINKLED)[:, None],
                        jnp.broadcast_to(tb, out.shape), out)
    if has(T_WINDY):
        # windy: low-frequency strength * high-frequency waves
        ws = fbm(0.1 * p3, 0.5, 3)
        wh = fbm(p3, 0.5, 6)
        wind = (jnp.abs(ws) * wh)[..., None]
        out = jnp.where((kind == T_WINDY)[:, None],
                        jnp.broadcast_to(wind, out.shape), out)
    if has(T_MARBLE):
        # marble (textures/src/marble.rs spline through marble colors)
        variation = params[:, 11]
        variation = jnp.where(variation == 0.0, 0.2, variation)
        scale_m = jnp.where(params[:, 13] == 0.0, 1.0, params[:, 13])
        tmarb = jnp.clip(
            0.5 + 0.5 * jnp.sin(scale_m * p3[:, 1]
                                + variation * turbulence(p3 * scale_m[..., None], 0.5, octaves)),
            0.0, 1.0)
        marble_c = _marble_spline(tmarb)
        out = jnp.where((kind == T_MARBLE)[:, None], marble_c, out)
    # imagemap: anisotropic mip filtering when screen-space differentials
    # are tracked (EWA re-design, textures/image.py), bilinear L0 otherwise
    if tex.atlas.shape[0] > 0 and has(T_IMAGEMAP):
        from pbrt_tpu.textures.image import sample_atlas, sample_atlas_aniso
        if duv is None:
            img = sample_atlas(tex, tid, st)
        else:
            us, vs = params[:, 7], params[:, 8]
            dst0 = jnp.stack([duv[0] * us, duv[1] * vs], -1)
            dst1 = jnp.stack([duv[2] * us, duv[3] * vs], -1)
            img = sample_atlas_aniso(tex, tid, st, dst0, dst1)
        out = jnp.where((kind == T_IMAGEMAP)[:, None], img, out)
    return jnp.where((tex_id < 0)[:, None], 0.0, out)


_MARBLE_COLORS = np.array([
    [0.58, 0.58, 0.6], [0.58, 0.58, 0.6], [0.58, 0.58, 0.6],
    [0.5, 0.5, 0.5], [0.6, 0.59, 0.58], [0.58, 0.58, 0.6],
    [0.58, 0.58, 0.6], [0.2, 0.2, 0.33], [0.58, 0.58, 0.6]], np.float32)


def _marble_spline(t):
    c = jnp.asarray(_MARBLE_COLORS)
    nseg = c.shape[0] - 3
    x = jnp.clip(t, 0.0, 0.9999) * nseg
    i = jnp.floor(x).astype(jnp.int32)
    f = (x - i.astype(jnp.float32))[..., None]
    c0 = c[i]
    c1 = c[i + 1]
    c2 = c[i + 2]
    c3 = c[i + 3]
    # catmull-rom-ish cubic (pbrt uses bezier on sliding window)
    s0 = vm.lerp(f, c0, c1)
    s1 = vm.lerp(f, c1, c2)
    s2 = vm.lerp(f, c2, c3)
    s01 = vm.lerp(f, s0, s1)
    s12 = vm.lerp(f, s1, s2)
    return 1.5 * vm.lerp(f, s01, s12)
