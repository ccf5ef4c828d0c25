"""Image texture atlas: loading, mip pyramid, trilinear + anisotropic sampling.

Reference: core/src/mipmap/ (MIPMap pyramid, trilinear mipmap/mod.rs:226, EWA
:252, Lanczos resample :380) and textures/src/imagemap.rs. TPU re-design:

  * every image is Lanczos-resampled to a square power-of-two and packed into
    ONE "mip strip" canvas per image: level 0 fills x in [0, S); levels l>=1
    stack vertically in the right strip at x offset Smax, y offset
    S - (S >> (l-1)). All level offsets are closed-form shifts, so a whole
    wavefront samples ANY per-lane (image, level, s, t) with one fused gather
    — no per-level dispatch, no ragged pyramids.
  * trilinear filtering = two such bilinear gathers + lerp, exactly the
    reference's MIPMap::lookup width->level mapping.
  * anisotropic filtering re-designs EWA for lockstep lanes: the reference's
    data-dependent ellipse-bbox loop (mipmap/mod.rs:252-330) becomes a FIXED
    number of Gaussian-weighted bilinear probes along the ellipse's major
    axis at the level where the minor axis spans ~1 texel (the classical
    hardware-anisotropy formulation of EWA; same max-eccentricity clamp).

The reference's BlockedArray 2D tiling (core/src/memory.rs) has no TPU
analog: XLA owns HBM layout.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

MAX_ANISOTROPY = 8.0
N_EWA_PROBES = 8


def load_image(path: str, gamma: bool = True) -> np.ndarray:
    """[H, W, 3] float32 linear."""
    if path.lower().endswith(".exr"):
        from pbrt_tpu.io.image_io import read_exr
        return read_exr(path).astype(np.float32)
    if path.lower().endswith(".pfm"):
        from pbrt_tpu.io.image_io import read_pfm
        return read_pfm(path).astype(np.float32)
    from PIL import Image
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    if gamma:
        arr = np.where(arr <= 0.04045, arr / 12.92,
                       ((arr + 0.055) / 1.055) ** 2.4)
    return arr.astype(np.float32)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _resample_pow2_square(im: np.ndarray) -> np.ndarray:
    """Lanczos-resample [H,W,3] to [S,S,3], S = next pow2 of max(H,W)
    (mipmap/mod.rs:380 resampled_weights; PIL Lanczos is the same kernel)."""
    from PIL import Image
    h, w = im.shape[:2]
    s = _next_pow2(max(h, w))
    if h == s and w == s:
        return im.astype(np.float32)
    # PIL float resize per channel (mode "F") to avoid quantization
    chans = []
    for c in range(im.shape[2]):
        ch = Image.fromarray(im[..., c].astype(np.float32), mode="F")
        chans.append(np.asarray(ch.resize((s, s), Image.LANCZOS), np.float32))
    return np.clip(np.stack(chans, -1), 0.0, None)


def _downsample2(im: np.ndarray) -> np.ndarray:
    """One mip level down: 2x2 box average (reference MIPMap::new pyramid)."""
    h, w = im.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    im = im[: h2 * 2, : w2 * 2]
    if h >= 2 and w >= 2:
        return 0.25 * (im[0::2, 0::2] + im[1::2, 0::2]
                       + im[0::2, 1::2] + im[1::2, 1::2])
    if w >= 2:
        return 0.5 * (im[:, 0::2] + im[:, 1::2])
    if h >= 2:
        return 0.5 * (im[0::2] + im[1::2])
    return im


def build_atlas(images):
    """Pack images into one mip-strip canvas.

    Returns (atlas [n, Smax, Smax + Smax//2, 3] f32,
             sizes [n, 2] int32 (S, S),
             n_levels [n] int32).
    """
    if not images:
        return (np.zeros((0, 1, 2, 3), np.float32),
                np.zeros((0, 2), np.int32), np.zeros((0,), np.int32))
    sq = [_resample_pow2_square(np.asarray(im, np.float32)) for im in images]
    smax = max(im.shape[0] for im in sq)
    canvas_w = smax + max(smax // 2, 1)
    atlas = np.zeros((len(sq), smax, canvas_w, 3), np.float32)
    sizes = np.zeros((len(sq), 2), np.int32)
    nlev = np.zeros((len(sq),), np.int32)
    for i, im in enumerate(sq):
        s = im.shape[0]
        sizes[i] = (s, s)
        atlas[i, :s, :s] = im
        lv = im
        level = 1
        while lv.shape[0] > 1:
            lv = _downsample2(lv)
            sl = lv.shape[0]
            yoff = s - (s >> (level - 1))
            atlas[i, yoff:yoff + sl, smax:smax + sl] = lv
            level += 1
        nlev[i] = level  # levels 0..level-1 exist
    return atlas, sizes, nlev


def _bilinear_at_level(tex, img, st, level):
    """Bilinear sample at per-lane integer mip level from the mip strip.

    img: [N] image ids (>=0), st: [N,2] wrapped uv, level: [N] int32.
    """
    S = tex.atlas_size[img, 0]                   # [N] pow2 image size
    smax = tex.atlas.shape[1]                    # static canvas size
    wl = jnp.maximum(S >> level, 1)              # level dims
    is0 = level == 0
    xoff = jnp.where(is0, 0, smax)
    yoff = jnp.where(is0, 0, S - (S >> jnp.maximum(level - 1, 0)))
    wf = wl.astype(jnp.float32)
    s = st[:, 0] - jnp.floor(st[:, 0])
    t = st[:, 1] - jnp.floor(st[:, 1])
    x = s * wf - 0.5
    y = (1.0 - t) * wf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def pix(xx, yy):
        xx = jnp.mod(xx, wl)
        yy = jnp.mod(yy, wl)
        # flat 2-D row gather: multi-index gathers from the 4-D atlas lower
        # ~10-25x slower on TPU (see core/math.py gather_rows)
        K, Ha, Wa = tex.atlas.shape[:3]
        lin = (img * Ha + (yoff + yy)) * Wa + (xoff + xx)
        return tex.atlas.reshape(K * Ha * Wa, 3)[lin]

    return (pix(x0, y0) * (1 - fx) * (1 - fy) + pix(x0 + 1, y0) * fx * (1 - fy)
            + pix(x0, y0 + 1) * (1 - fx) * fy + pix(x0 + 1, y0 + 1) * fx * fy)


def sample_atlas(tex, tid, st):
    """Bilinear sample at level 0 (no differentials path)."""
    img = jnp.maximum(tex.image_id[tid], 0)
    lvl = jnp.zeros(img.shape, jnp.int32)
    return _bilinear_at_level(tex, img, st, lvl)


def sample_atlas_trilinear(tex, tid, st, width):
    """MIPMap::lookup (mipmap/mod.rs:226): width in uv units -> fractional
    level, lerp of two bilinear levels."""
    img = jnp.maximum(tex.image_id[tid], 0)
    n_levels = tex.atlas_levels[img].astype(jnp.float32)
    # level 0 has S texels: width w covers w*S texels; level so that the
    # filter spans <= 1 texel: L-1 + log2(width)
    lvl_f = n_levels - 1.0 + jnp.log2(jnp.maximum(width, 1e-8))
    lvl_f = jnp.clip(lvl_f, 0.0, n_levels - 1.0)
    l0 = jnp.floor(lvl_f).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, (n_levels - 1.0).astype(jnp.int32))
    f = (lvl_f - l0.astype(jnp.float32))[:, None]
    c0 = _bilinear_at_level(tex, img, st, l0)
    c1 = _bilinear_at_level(tex, img, st, l1)
    return (1.0 - f) * c0 + f * c1


def sample_atlas_aniso(tex, tid, st, dst0, dst1):
    """True EWA anisotropic lookup (mipmap/mod.rs:252-380), bounded form.

    The EWA footprint is the image of the unit disk under (dst0, dst1):
    p(s, t) = st + s*dst0 + t*dst1 with the reference's Gaussian
    exp(-2 r^2) in canonical (s, t) coordinates. Instead of the
    reference's data-dependent per-texel bounding-box walk (hostile to a
    static TPU graph), the integral is quadratured on a FIXED 5x3 lattice
    inside the unit disk — exact ellipse geometry (axes, eccentricity
    clamp to MAX_ANISOTROPY by scaling the minor axis up, level from the
    minor-axis width) with a bounded probe count, and the reference's
    two-level lerp (each tap is trilinear between floor/ceil levels)."""
    img = jnp.maximum(tex.image_id[tid], 0)
    n_levels = tex.atlas_levels[img].astype(jnp.float32)
    len0 = jnp.sqrt(jnp.sum(dst0 * dst0, -1))
    len1 = jnp.sqrt(jnp.sum(dst1 * dst1, -1))
    swap = len1 > len0
    maj_v = jnp.where(swap[:, None], dst1, dst0)
    min_v = jnp.where(swap[:, None], dst0, dst1)
    major_len = jnp.where(swap, len1, len0)
    minor_len = jnp.where(swap, len0, len1)
    # eccentricity clamp: scale the minor AXIS VECTOR up so that
    # major/minor <= MAX_ANISOTROPY (mipmap/mod.rs lookup_ewa entry)
    too_thin = (minor_len * MAX_ANISOTROPY < major_len) & (minor_len > 0)
    scale = jnp.where(too_thin,
                      major_len / jnp.maximum(minor_len * MAX_ANISOTROPY,
                                              1e-12), 1.0)
    min_v = min_v * scale[:, None]
    minor_len = minor_len * scale
    degenerate = minor_len < 1e-8

    # level where the (clamped) minor axis spans ~one texel; two-level lerp
    lvl_f = n_levels - 1.0 + jnp.log2(jnp.maximum(minor_len, 1e-8))
    lvl_f = jnp.clip(lvl_f, 0.0, n_levels - 1.0)
    l0 = jnp.floor(lvl_f).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, (n_levels - 1.0).astype(jnp.int32))
    fr = (lvl_f - l0.astype(jnp.float32))[:, None]

    # fixed quadrature of the EWA integral: lattice in the unit disk,
    # Gaussian alpha = exp(-2 r^2) (same falloff table the reference bakes)
    ss_ = np.linspace(-0.8, 0.8, 5).astype(np.float32)
    ts_ = np.array([-0.6, 0.0, 0.6], np.float32)
    pts, wts = [], []
    for s_ in ss_:
        for t_ in ts_:
            r2 = s_ * s_ + t_ * t_
            if r2 <= 1.0:
                pts.append((s_, t_))
                wts.append(np.exp(-2.0 * r2))
    wsum = float(np.sum(wts))
    acc = jnp.zeros((tid.shape[0], 3), jnp.float32)
    for (s_, t_), w_ in zip(pts, wts):
        p_st = st + maj_v * s_ + min_v * t_
        c = _bilinear_at_level(tex, img, p_st, l0) * (1.0 - fr) \
            + _bilinear_at_level(tex, img, p_st, l1) * fr
        acc = acc + (w_ / wsum) * c
    tri = sample_atlas_trilinear(tex, tid, st, jnp.maximum(major_len, minor_len))
    return jnp.where(degenerate[:, None], tri, acc)
