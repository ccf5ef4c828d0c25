"""Subsurface (BSSRDF) transport through the path integrator.

Reference: path.rs:208-262 BSSRDF hook + tabulated_bssrdf.rs; our transport
is the Burley normalized-diffusion redesign (materials/bssrdf.py).
"""
import numpy as np
import pytest

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.render import render

SSS_SCENE = """
LookAt 0 2 5  0 0.5 0  0 1 0
Camera "perspective" "float fov" 35
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "02sequence" "integer pixelsamples" 16
Integrator "path" "integer maxdepth" 5
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
AttributeBegin
  Material "subsurface" "string name" "Marble" "float scale" 2
  Translate 0 0.5 0
  Shape "sphere" "float radius" 0.8
AttributeEnd
AttributeBegin
  Material "matte" "rgb Kd" [0.4 0.4 0.4]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-10 -0.3 -10  10 -0.3 -10  10 -0.3 10  -10 -0.3 10]
AttributeEnd
WorldEnd
"""


@pytest.mark.heavy
def test_subsurface_scene_renders_light():
    img = render(load_scene_string(SSS_SCENE))
    assert np.isfinite(img).all()
    # the sphere occupies the image center; diffusion transport must carry
    # energy through (marble is bright) — not black, not blowing up
    center = img[7:13, 7:13].mean()
    assert 0.05 < center < 3.0, center


@pytest.mark.heavy
def test_kdsubsurface_compiles_and_is_finite():
    scene = SSS_SCENE.replace(
        'Material "subsurface" "string name" "Marble" "float scale" 2',
        'Material "kdsubsurface" "rgb Kd" [0.5 0.3 0.2] "float mfp" 0.5')
    img = render(load_scene_string(scene))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_beam_diffusion_table_properties():
    """The tabulated profile (tabulated_bssrdf.rs:559) must integrate to
    its effective albedo and invert consistently."""
    import jax.numpy as jnp
    from pbrt_tpu.materials import bssrdf as S
    rho, radii, prof, cdf, reff = S.build_bssrdf_table()
    # profile CDF's last entry IS the effective albedo
    np.testing.assert_allclose(cdf[:, -1], reff, rtol=1e-5)
    # higher albedo -> higher effective albedo, bounded near 1
    assert reff[10] < reff[60] < reff[99] < 1.1
    # invert_rho_eff is the inverse of the rho -> rho_eff map
    for target in (0.2, 0.5, 0.8):
        r = S.invert_rho_eff(np.array([target] * 3))[0]
        idx = np.searchsorted(rho, r)
        got = np.interp(r, rho, reff)
        np.testing.assert_allclose(got, target, atol=0.01)


def test_table_sample_pdf_consistency():
    """sample_sr / pdf_sr agree: E[1/pdf weight] reproduces rho_eff."""
    import jax.numpy as jnp
    from pbrt_tpu.materials import bssrdf as S
    sigma_t = np.array([1.0, 2.0, 4.0], np.float32)
    rho_ch = np.array([0.6, 0.6, 0.6], np.float32)
    prow, crow, reff = S.dense_channel_rows(sigma_t, rho_ch)
    n = 4096
    u = (np.arange(n) + 0.5) / n
    radii = jnp.asarray(S.radii_knots())
    prof = jnp.broadcast_to(jnp.asarray(prow), (n, 3, 64))
    cdfs = jnp.broadcast_to(jnp.asarray(crow), (n, 3, 64))
    reffs = jnp.broadcast_to(jnp.asarray(reff), (n, 3))
    sts = jnp.broadcast_to(jnp.asarray(sigma_t), (n, 3))
    ch = 0
    r = S.table_sample_sr(cdfs[:, ch], reffs[:, ch], sts[:, ch], radii,
                          jnp.asarray(u, jnp.float32))
    pdf = S.table_pdf_sr(prof, reffs, sts, r)[:, ch]
    sr = S.table_sr(prof, sts, r)[:, ch]
    # MC estimate of the plane integral of Sr via these samples:
    # E[sr(r) * 2 pi r / (pdf(r) * 2 pi r)] ... the polar pdf convention
    # makes the weight sr/pdf = rho_eff identically (both share the profile)
    w = np.asarray(sr / np.maximum(np.asarray(pdf), 1e-12))
    good = np.asarray(pdf) > 1e-9
    np.testing.assert_allclose(w[good], reff[ch], rtol=0.02)
