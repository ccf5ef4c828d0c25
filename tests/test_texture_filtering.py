"""MIPMap pyramid, trilinear/anisotropic filtering, ray differentials.

Reference: core/src/mipmap/ lookup semantics (trilinear :226, EWA :252) and
surface_interaction.rs:203 compute_differentials.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.textures.image import (build_atlas, sample_atlas,
                                     sample_atlas_trilinear, sample_atlas_aniso)
from pbrt_tpu.textures import TextureTable
from pbrt_tpu.core.interaction import (SurfaceInteraction, make_frame,
                                       compute_differentials)
from pbrt_tpu.core.ray import Rays


def _table(images):
    atlas, sizes, nlev = build_atlas(images)
    return TextureTable(kind=None, params=None, child=None, w2t=None,
                        image_id=jnp.arange(len(images), dtype=jnp.int32),
                        atlas=jnp.asarray(atlas), atlas_size=jnp.asarray(sizes),
                        atlas_levels=jnp.asarray(nlev))


def test_constant_image_invariant_across_levels():
    im = np.full((64, 48, 3), [0.25, 0.5, 0.75], np.float32)
    tt = _table([im])
    st = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 2)), jnp.float32)
    tid = jnp.zeros(32, jnp.int32)
    assert np.allclose(np.asarray(sample_atlas(tt, tid, st)),
                       [0.25, 0.5, 0.75], atol=2e-3)
    for w in (1e-3, 0.05, 1.0):
        c = sample_atlas_trilinear(tt, tid, st, jnp.full(32, w))
        assert np.allclose(np.asarray(c), [0.25, 0.5, 0.75], atol=3e-3), w


def test_checker_filters_to_mean():
    im = ((np.indices((128, 128)) // 8).sum(0) % 2).astype(np.float32)
    im = np.stack([im] * 3, -1)
    tt = _table([im])
    st = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (256, 2)), jnp.float32)
    tid = jnp.zeros(256, jnp.int32)
    wide = sample_atlas_trilinear(tt, tid, st, jnp.full(256, 1.0))
    assert abs(float(wide.mean()) - 0.5) < 0.03
    narrow = sample_atlas_trilinear(tt, tid, st, jnp.full(256, 1e-4))
    assert float(narrow.std()) > 0.3   # sharp at fine level
    # anisotropic: blur along s only -> rows mix, finite values
    dst0 = jnp.tile(jnp.asarray([[0.3, 0.0]], jnp.float32), (256, 1))
    dst1 = jnp.tile(jnp.asarray([[0.0, 1e-3]], jnp.float32), (256, 1))
    an = sample_atlas_aniso(tt, tid, st, dst0, dst1)
    assert np.isfinite(np.asarray(an)).all()
    assert abs(float(an.mean()) - 0.5) < 0.05


def test_compute_differentials_plane():
    N = 8
    p = np.zeros((N, 3), np.float32)
    p[:, 0] = np.linspace(-1, 1, N)
    ns = np.tile([0, 0, 1.0], (N, 1)).astype(np.float32)
    dpdu = np.tile([2.0, 0, 0], (N, 1)).astype(np.float32)  # u = x/2
    dpdv = np.tile([0, 1.0, 0], (N, 1)).astype(np.float32)
    z = jnp.zeros(N, jnp.float32)
    ss, ts = make_frame(jnp.asarray(ns), jnp.asarray(dpdu))
    si = SurfaceInteraction(
        valid=jnp.ones(N, bool), t=jnp.ones(N), p=jnp.asarray(p),
        p_err=jnp.zeros((N, 3)), wo=jnp.asarray(ns), ng=jnp.asarray(ns),
        ns=jnp.asarray(ns), ss=ss, ts=ts, uv=jnp.zeros((N, 2)),
        dpdu=jnp.asarray(dpdu), dpdv=jnp.asarray(dpdv),
        prim=jnp.zeros(N, jnp.int32), material=jnp.zeros(N, jnp.int32),
        area_light=jnp.full(N, -1, jnp.int32), dudx=z, dvdx=z, dudy=z, dvdy=z)
    o = p + np.array([0, 0, 1.0], np.float32)
    d = np.tile([0, 0, -1.0], (N, 1)).astype(np.float32)
    rays = Rays.make(jnp.asarray(o), jnp.asarray(d))
    rays = rays._replace(rx_o=jnp.asarray(o + [0.1, 0, 0]), rx_d=jnp.asarray(d),
                         ry_o=jnp.asarray(o + [0, 0.05, 0]), ry_d=jnp.asarray(d))
    si2 = compute_differentials(si, rays)
    assert np.allclose(np.asarray(si2.dudx), 0.05, atol=1e-5)  # 0.1 / 2
    assert np.allclose(np.asarray(si2.dvdy), 0.05, atol=1e-5)
    assert np.allclose(np.asarray(si2.dvdx), 0.0, atol=1e-6)


def test_specular_diff_rays_mirror_passthrough():
    """Reflection off a flat mirror preserves differential spacing
    (sampler_integrator.rs:312-367 with dndx=0 on a flat surface)."""
    from pbrt_tpu.core.interaction import specular_diff_rays
    N = 8
    p = np.zeros((N, 3), np.float32)
    p[:, 0] = np.linspace(-1, 1, N)
    nz = np.tile([0, 0, 1.0], (N, 1)).astype(np.float32)
    dpdu = np.tile([1.0, 0, 0], (N, 1)).astype(np.float32)
    z = jnp.zeros(N, jnp.float32)
    ss, ts = make_frame(jnp.asarray(nz), jnp.asarray(dpdu))
    si = SurfaceInteraction(
        valid=jnp.ones(N, bool), t=jnp.ones(N), p=jnp.asarray(p),
        p_err=jnp.zeros((N, 3)), wo=jnp.asarray(nz), ng=jnp.asarray(nz),
        ns=jnp.asarray(nz), ss=ss, ts=ts, uv=jnp.zeros((N, 2)),
        dpdu=jnp.asarray(dpdu), dpdv=jnp.asarray(np.tile([0, 1.0, 0], (N, 1))),
        prim=jnp.zeros(N, jnp.int32), material=jnp.zeros(N, jnp.int32),
        area_light=jnp.full(N, -1, jnp.int32), dudx=z, dvdx=z, dudy=z, dvdy=z)
    o = p + np.array([0, 0, 1.0], np.float32)
    d = np.tile([0, 0, -1.0], (N, 1)).astype(np.float32)
    rays = Rays.make(jnp.asarray(o), jnp.asarray(d))
    rays = rays._replace(rx_o=jnp.asarray(o + [0.1, 0, 0]), rx_d=jnp.asarray(d),
                         ry_o=jnp.asarray(o + [0, 0.05, 0]), ry_d=jnp.asarray(d))
    wi = jnp.asarray(np.tile([0, 0, 1.0], (N, 1)).astype(np.float32))
    spec = jnp.ones(N, bool)
    out = specular_diff_rays(si, rays, wi, spec, jnp.zeros(N, bool),
                             jnp.full(N, 1.5))
    # mirror at normal incidence: aux spacing preserved, aux dirs = wi
    assert np.allclose(np.asarray(out.rx_o - out.o), [0.1, 0, 0], atol=1e-5)
    assert np.allclose(np.asarray(out.ry_o - out.o), [0, 0.05, 0], atol=1e-5)
    assert np.allclose(np.asarray(out.rx_d), [0, 0, 1.0], atol=1e-5)
    # non-specular lanes: zeroed aux dirs (degenerate -> level 0)
    out2 = specular_diff_rays(si, rays, wi, jnp.zeros(N, bool),
                              jnp.zeros(N, bool), jnp.full(N, 1.5))
    assert np.allclose(np.asarray(out2.rx_d), 0.0)


def test_checker_in_mirror_is_filtered():
    """VERDICT r3 missing #5: a subpixel checker seen THROUGH a mirror
    renders filtered (mip-averaged ~0.5, low pixel variance), not
    point-sampled binary noise — differentials survive the specular
    bounce."""
    import os
    import tempfile
    from pbrt_tpu.scene import load_scene_string
    from pbrt_tpu.render import render
    from pbrt_tpu.io.image_io import write_png
    im = ((np.indices((64, 64)) // 4).sum(0) % 2).astype(np.float32)
    im = np.stack([im * 0.8 + 0.1] * 3, -1)
    path = os.path.join(tempfile.mkdtemp(), "check.png")
    write_png(path, im)
    scene = f"""
LookAt 0 0 0  0 0 1  0 1 0
Camera "perspective" "float fov" 40
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "02sequence" "integer pixelsamples" 4
Integrator "path" "integer maxdepth" 2
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
AttributeBegin
  Material "mirror" "rgb Kr" [1 1 1]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-20 -20 3  20 -20 3  20 20 3  -20 20 3]
AttributeEnd
AttributeBegin
  Texture "chk" "spectrum" "imagemap" "string filename" "{path}"
    "float uscale" 400 "float vscale" 400
  Material "matte" "texture Kd" "chk"
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-200 -200 -50  200 -200 -50  200 200 -50  -200 200 -50]
    "float uv" [0 0 1 0 1 1 0 1]
AttributeEnd
WorldEnd
"""
    img = render(load_scene_string(scene))
    mid = img[6:18, 6:18].mean(-1)
    # filtered: every pixel near the checker mean; unfiltered point
    # sampling gives binary noise with std ~0.2 at 4 spp
    assert mid.std() < 0.08, f"reflected checker not filtered: std={mid.std():.3f}"
    assert 0.25 < mid.mean() < 0.75


def test_ewa_preserves_detail_across_minor_axis():
    """True-EWA property (mipmap/mod.rs:252-380): a footprint elongated
    along s must average ACROSS s while keeping t-varying stripes sharp;
    isotropic trilinear at the major width destroys them."""
    im = ((np.indices((128, 128))[0] // 16) % 2).astype(np.float32)  # t-stripes
    im = np.stack([im] * 3, -1)
    tt = _table([im])
    # probe two points: middle of a white stripe and middle of a black one
    st = jnp.asarray([[0.5, 0.1875], [0.5, 0.3125]], jnp.float32)
    tid = jnp.zeros(2, jnp.int32)
    dst0 = jnp.tile(jnp.asarray([[0.4, 0.0]], jnp.float32), (2, 1))   # major: s
    dst1 = jnp.tile(jnp.asarray([[0.0, 0.004]], jnp.float32), (2, 1))  # minor: t
    a = np.asarray(sample_atlas_aniso(tt, tid, st, dst0, dst1))[:, 0]
    contrast_ewa = abs(a[0] - a[1])
    tri = np.asarray(sample_atlas_trilinear(tt, tid, st, jnp.full(2, 0.4)))[:, 0]
    contrast_tri = abs(tri[0] - tri[1])
    assert contrast_ewa > 0.5, f"EWA lost stripe contrast: {a}"
    assert contrast_tri < 0.2, f"trilinear control should blur: {tri}"
