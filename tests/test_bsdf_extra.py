"""FourierBSDF table reader/eval + BSSRDF profile math.

The fourier test writes a synthetic lambertian SCATFUN table and checks the
densified evaluation returns rho/pi (fourier_bsdf.rs f() semantics:
value = CosineSeries(ak, cosPhi) / |mu_i|).
"""
import struct

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.materials.fourier import (read_bsdf_file, build_fourier_table,
                                        eval_fourier)
from pbrt_tpu.materials import bssrdf as SSS


def _write_lambertian_bsdf(path, rho=0.6, n_mu=64):
    """Synthetic single-channel table: a0(i,j) = rho/pi * |mu_i|."""
    mu = np.linspace(-1, 1, n_mu).astype(np.float32)
    oal = np.zeros((n_mu * n_mu, 2), np.int32)
    coeffs = []
    for i in range(n_mu):
        for j in range(n_mu):
            oal[i * n_mu + j] = (len(coeffs), 1)
            coeffs.append(rho / np.pi * abs(mu[i]))
    a = np.asarray(coeffs, np.float32)
    with open(path, "wb") as f:
        f.write(b"SCATFUN\x01")
        f.write(struct.pack("<9i", 1, n_mu, len(a), 1, 1, 1, 0, 0, 0))
        f.write(struct.pack("<f", 1.5))
        f.write(struct.pack("<4i", 0, 0, 0, 0))
        f.write(mu.tobytes())
        f.write(np.zeros(n_mu * n_mu, np.float32).tobytes())  # cdf (unused)
        f.write(oal.tobytes())
        f.write(a.tobytes())


def test_fourier_lambertian_roundtrip(tmp_path):
    p = str(tmp_path / "lambert.bsdf")
    _write_lambertian_bsdf(p, rho=0.6)
    t = read_bsdf_file(p)
    assert t["eta"] == 1.5
    tab = build_fourier_table([t])
    rng = np.random.default_rng(3)
    N = 64
    # keep |mu| >= 0.2: near-grazing |mu_i| interpolation error is a grid
    # resolution artifact, not an eval property
    wo = rng.normal(size=(N, 3)); wo[:, 2] = np.abs(wo[:, 2]) + 0.2
    wi = rng.normal(size=(N, 3)); wi[:, 2] = np.abs(wi[:, 2]) + 0.2
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    f = eval_fourier(tab, jnp.zeros(N, jnp.int32), jnp.asarray(wo, jnp.float32),
                     jnp.asarray(wi, jnp.float32))
    assert np.allclose(np.asarray(f), 0.6 / np.pi, rtol=0.08), \
        (np.asarray(f).min(), np.asarray(f).max())
    # masked lanes
    f2 = eval_fourier(tab, jnp.full(N, -1, jnp.int32),
                      jnp.asarray(wo, jnp.float32), jnp.asarray(wi, jnp.float32))
    assert float(jnp.abs(f2).max()) == 0.0


def test_bssrdf_profile_normalization():
    """Integral of Sr over the plane equals the albedo; sampler inverts the
    cdf; pdf matches the normalized profile."""
    d = jnp.asarray([0.7], jnp.float32)
    rho = jnp.asarray([0.8], jnp.float32)
    r = np.linspace(1e-4, 30.0, 200000).astype(np.float32)
    sr = SSS.sr_profile(jnp.asarray(r), d, rho)
    integral = float(jnp.sum(sr * 2 * np.pi * r * (r[1] - r[0])))
    assert abs(integral - 0.8) < 0.01, integral
    # cdf/sample roundtrip
    us = jnp.asarray(np.linspace(0.01, 0.99, 64), jnp.float32)
    rs = SSS.sr_sample(us, jnp.full(64, 0.7, jnp.float32))
    back = SSS.sr_cdf(rs, 0.7)
    assert np.allclose(np.asarray(back), np.asarray(us), atol=1e-3)


def test_measured_media_lookup():
    got = SSS.get_medium_scattering_properties("marble")
    assert got is not None
    sa, sps = got
    assert sa.shape == (3,) and sps.shape == (3,)
    assert SSS.get_medium_scattering_properties("nope") is None


def test_fresnel_moments_sane():
    # classic check: fm1(1.33) ~ 0.18..0.25 band, fm1(1) ~ 0.5*int(1-1)=...
    f1 = float(SSS.fresnel_moment1(jnp.asarray(1.33)))
    assert 0.05 < f1 < 0.35, f1
    f2 = float(SSS.fresnel_moment2(jnp.asarray(1.33)))
    assert 0.0 < f2 < 0.3, f2
