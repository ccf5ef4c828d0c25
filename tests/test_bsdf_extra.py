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


def _write_glossy_bsdf(path, n_mu=32, m=24, p=8):
    """Synthetic glossy SCATFUN table: azimuth lobe (0.5-0.5 cos phi)^p
    (peaked at dphi=pi — the specular side in the -wi convention) times a
    radial factor peaked at the mirror configuration mu_i ~ -mu_o."""
    mu = np.linspace(-1, 1, n_mu).astype(np.float32)
    phis = np.linspace(0, 2 * np.pi, 512, endpoint=False)
    vals = (0.5 - 0.5 * np.cos(phis)) ** p
    # real cosine coefficients of the positive azimuth profile
    ak_phi = np.fft.rfft(vals).real / len(phis)
    ak_phi = np.concatenate([[ak_phi[0]], 2 * ak_phi[1:m]])
    oal = np.zeros((n_mu * n_mu, 2), np.int32)
    coeffs = []
    for i in range(n_mu):
        for j in range(n_mu):
            radial = np.exp(-6.0 * (mu[i] + mu[j]) ** 2) * abs(mu[i])
            c = (ak_phi * radial).astype(np.float32)
            oal[i * n_mu + j] = (len(coeffs), len(c))
            coeffs.extend(c)
    a = np.asarray(coeffs, np.float32)
    with open(path, "wb") as f:
        f.write(b"SCATFUN\x01")
        f.write(struct.pack("<9i", 1, n_mu, len(a), m, 1, 1, 0, 0, 0))
        f.write(struct.pack("<f", 1.0))
        f.write(struct.pack("<4i", 0, 0, 0, 0))
        f.write(mu.tobytes())
        f.write(np.zeros(n_mu * n_mu, np.float32).tobytes())
        f.write(oal.tobytes())
        f.write(a.tobytes())


def test_fourier_cdf_sampling(tmp_path):
    """VERDICT r4 missing #2: Fourier CDF importance sampling
    (fourier_bsdf.rs:124,173). Checks (a) the sampler's pdf is a true
    density (integrates to 1), (b) the importance-sampled albedo matches
    an independent uniform-sphere quadrature (pdf matches the sampler),
    (c) variance beats cosine-hemisphere sampling on a glossy table."""
    import jax
    from pbrt_tpu.materials.fourier import (sample_fourier_bsdf, pdf_fourier)

    p = str(tmp_path / "glossy.bsdf")
    _write_glossy_bsdf(p)
    tab = build_fourier_table([read_bsdf_file(p)])
    N = 200000
    cos_o = 0.6
    wo = jnp.broadcast_to(
        jnp.asarray([np.sqrt(1 - cos_o ** 2), 0.0, cos_o], jnp.float32),
        (N, 3))
    tid = jnp.zeros((N,), jnp.int32)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    u2 = jax.random.uniform(k1, (N, 2))
    uf = jax.random.uniform(k2, (N,))

    # (a) pdf integrates to 1 over the sphere (dw = dmu dphi)
    u3 = jax.random.uniform(k3, (N, 2))
    z = 1 - 2 * u3[:, 0]
    phi = 2 * np.pi * u3[:, 1]
    r = jnp.sqrt(jnp.maximum(1 - z * z, 0))
    wi_u = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    pdf_u = pdf_fourier(tab, tid, wo, wi_u)
    integral = float((pdf_u * 4 * np.pi).mean())
    assert abs(integral - 1.0) < 0.05, integral

    # (b) sampled albedo == quadrature albedo (unbiasedness / pdf match)
    wi_s, pdf_s = sample_fourier_bsdf(tab, tid, wo, u2, uf)
    f_s = eval_fourier(tab, tid, wo, wi_s)[:, 0]
    w_s = jnp.where(pdf_s > 1e-9,
                    f_s * jnp.abs(wi_s[:, 2]) / jnp.maximum(pdf_s, 1e-9), 0.0)
    # cross-check: pdf_fourier at the sampled directions equals pdf_s
    pdf_re = pdf_fourier(tab, tid, wo, wi_s)
    ok = pdf_s > 1e-6
    rel = np.asarray(jnp.abs(pdf_re - pdf_s)
                     / jnp.maximum(pdf_s, 1e-9))[np.asarray(ok)]
    assert np.median(rel) < 0.02, np.median(rel)
    f_u = eval_fourier(tab, tid, wo, wi_u)[:, 0]
    alb_quad = float((f_u * jnp.abs(z) * 4 * np.pi).mean())
    alb_samp = float(w_s.mean())
    assert abs(alb_samp - alb_quad) < 0.05 * max(alb_quad, 1e-3), \
        (alb_samp, alb_quad)

    # (c) variance beats cosine sampling at equal sample count
    zc = jnp.sqrt(u3[:, 0])
    rc = jnp.sqrt(jnp.maximum(1 - u3[:, 0], 0))
    wi_c = jnp.stack([rc * jnp.cos(phi), rc * jnp.sin(phi), zc], -1)
    # glossy table reflects into wi.z > 0 for wo.z > 0; cosine covers that
    f_c = eval_fourier(tab, tid, wo, wi_c)[:, 0]
    w_c = f_c * np.pi  # f * |cos| / (cos/pi)
    var_f = float(jnp.var(w_s))
    var_c = float(jnp.var(w_c))
    assert var_f < 0.5 * var_c, (var_f, var_c)
