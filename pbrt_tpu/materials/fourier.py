"""FourierBSDF: binary .bsdf table reader + wavefront evaluation.

Reference: core/src/reflection/fourier_bsdf.rs (:12) + the binary table
reader core/src/reflection/bsdf_reader.rs (:15-34) used by
materials/src/fourier.rs. The file format is the public pbrt-v3 / layerlab
"SCATFUN" format (header magic + nMu/nCoeffs/mMax/nChannels + mu grid +
sparse per-(i,j) Fourier coefficient lists).

TPU re-design: the reference stores SPARSE per-direction-pair coefficient
lists and walks them with data-dependent offsets per ray. Here the table is
DENSIFIED at scene-compile time into one [nMu, nMu, m_cap, channels] array
(a few MB), so a whole wavefront evaluates with one fused gather + a
fixed-length cosine-series recurrence — no per-lane list walking. Harmonic
count is capped at m_cap=128 (smooth lobes need far fewer; the cap only
soft-clips near-specular tables). Sampling uses the cosine hemisphere with
the exact f/pdf ratio (the reference's Catmull-Rom CDF inversion is a scalar
search; variance, not bias, is the only cost of this substitution).
"""
from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

M_CAP = 128


class FourierTable(NamedTuple):
    """Dense device form. Leading axis = table id (one per fourier material).

    a0y/cdf power the CDF importance sampler (fourier_bsdf.rs:124,173
    sample_fourier / sample_catmull_rom_2d): a0y is the luminance 0th
    Fourier coefficient (the phi-average of f at each (mu_i, mu_o) pair) and
    cdf its running trapezoid integral over mu_i — computed at build from
    the densified coefficients, so the sampler is self-consistent with the
    evaluator rather than trusting the file's stored cdf block."""
    mu: jnp.ndarray     # [B, n_mu] zenith-cosine grid (padded with +1)
    a: jnp.ndarray      # [B, n_mu, n_mu, m_cap, 3] cosine-series coefficients
    eta: jnp.ndarray    # [B]
    n_mu: jnp.ndarray   # [B] valid grid size
    a0y: jnp.ndarray    # [B, n_mu, n_mu] luminance a0 (i = mu_i, j = mu_o)
    cdf: jnp.ndarray    # [B, n_mu, n_mu] trapezoid cumsum of a0y over i

    @staticmethod
    def empty():
        return FourierTable(jnp.ones((1, 2), jnp.float32) * jnp.asarray([-1.0, 1.0]),
                            jnp.zeros((1, 2, 2, 1, 3), jnp.float32),
                            jnp.ones((1,), jnp.float32),
                            jnp.full((1,), 2, jnp.int32),
                            jnp.zeros((1, 2, 2), jnp.float32),
                            jnp.zeros((1, 2, 2), jnp.float32))


def read_bsdf_file(path: str):
    """Parse one .bsdf file -> dict(mu [n], a_dense [n,n,m,3], eta, m_max).

    Layout per bsdf_reader.rs:15-34 (pbrt-v3 FourierBSDFTable::Read).
    """
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:8] != b"SCATFUN\x01":
        raise ValueError(f"{path}: bad magic")
    (flags, n_mu, n_coeffs, m_max, n_channels, n_bases,
     _u0, _u1, _u2) = struct.unpack_from("<9i", raw, 8)
    (eta,) = struct.unpack_from("<f", raw, 8 + 36)
    off = 8 + 36 + 4 + 16  # header + 9 ints + eta + 4 unused ints
    if flags != 1 or n_bases != 1 or n_channels not in (1, 3):
        raise ValueError(f"{path}: unsupported layout "
                         f"(flags={flags} bases={n_bases} ch={n_channels})")
    mu = np.frombuffer(raw, "<f4", n_mu, off); off += 4 * n_mu
    off += 4 * n_mu * n_mu  # cdf (used only by the reference's CDF sampling)
    oal = np.frombuffer(raw, "<i4", 2 * n_mu * n_mu, off).reshape(-1, 2)
    off += 8 * n_mu * n_mu
    a = np.frombuffer(raw, "<f4", n_coeffs, off)

    m_cap = min(m_max, M_CAP)
    dense = np.zeros((n_mu, n_mu, m_cap, 3), np.float32)
    for idx in range(n_mu * n_mu):
        o, ln = oal[idx]
        if ln <= 0:
            continue
        i, j = idx // n_mu, idx % n_mu
        m = min(ln, m_cap)
        if n_channels == 1:
            c = a[o:o + m]
            dense[i, j, :m, 0] = c
            dense[i, j, :m, 1] = c
            dense[i, j, :m, 2] = c
        else:
            # channel order Y, R, B (fourier_bsdf.rs); G from luminance fit
            y = a[o:o + m]
            r = a[o + ln:o + ln + m]
            b = a[o + 2 * ln:o + 2 * ln + m]
            g = 1.39829 * y - 0.100913 * r - 0.297375 * b
            dense[i, j, :m, 0] = r
            dense[i, j, :m, 1] = g
            dense[i, j, :m, 2] = b
    return dict(mu=mu.copy(), a=dense, eta=float(eta), m_max=m_max)


def build_fourier_table(tables: list) -> FourierTable:
    """Pad per-material tables into one device pytree."""
    if not tables:
        return FourierTable.empty()
    n_mu_max = max(t["mu"].shape[0] for t in tables)
    m_max = max(t["a"].shape[2] for t in tables)
    B = len(tables)
    mu = np.ones((B, n_mu_max), np.float32)
    a = np.zeros((B, n_mu_max, n_mu_max, m_max, 3), np.float32)
    eta = np.ones(B, np.float32)
    nm = np.zeros(B, np.int32)
    a0y = np.zeros((B, n_mu_max, n_mu_max), np.float32)
    cdf = np.zeros((B, n_mu_max, n_mu_max), np.float32)
    for b, t in enumerate(tables):
        n = t["mu"].shape[0]
        mu[b, :n] = t["mu"]
        mu[b, n:] = t["mu"][-1] + np.arange(1, n_mu_max - n + 1)  # strictly inc
        a[b, :n, :n, :t["a"].shape[2]] = t["a"]
        eta[b] = t["eta"]
        nm[b] = n
        # luminance a0 (invert the G-from-Y fit of read_bsdf_file exactly)
        r0 = t["a"][:, :, 0, 0]
        g0 = t["a"][:, :, 0, 1]
        b0 = t["a"][:, :, 0, 2]
        y0 = np.maximum((g0 + 0.100913 * r0 + 0.297375 * b0) / 1.39829, 0.0)
        a0y[b, :n, :n] = y0
        dmu = np.diff(t["mu"]).astype(np.float64)
        seg = 0.5 * (y0[:-1, :] + y0[1:, :]) * dmu[:, None]
        cdf[b, 1:n, :n] = np.cumsum(seg, axis=0)
        cdf[b, n:, :n] = cdf[b, n - 1, :n]  # monotone pad for searchsorted
    return FourierTable(jnp.asarray(mu), jnp.asarray(a), jnp.asarray(eta),
                        jnp.asarray(nm), jnp.asarray(a0y), jnp.asarray(cdf))


def _catmull_rom_weights(nodes, n_valid, x):
    """Per-lane interval + 4 weights over the padded node grid
    (the reference's catmull_rom_weights, interpolation.rs)."""
    # searchsorted per-lane (nodes is [N, K] gathered per lane)
    K = nodes.shape[1]
    idx = jnp.sum((nodes <= x[:, None]).astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, n_valid - 2)
    lanes = jnp.arange(x.shape[0])
    x0 = nodes[lanes, idx]
    x1 = nodes[lanes, jnp.minimum(idx + 1, K - 1)]
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    t2, t3 = t * t, t * t * t
    w1 = 2 * t3 - 3 * t2 + 1
    w2 = -2 * t3 + 3 * t2
    # derivative terms with one-sided differences at the ends
    has_m1 = idx > 0
    has_p2 = idx + 2 < n_valid
    xm1 = nodes[lanes, jnp.maximum(idx - 1, 0)]
    x2v = nodes[lanes, jnp.minimum(idx + 2, K - 1)]
    d0 = t3 - 2 * t2 + t
    d1 = t3 - t2
    dx = x1 - x0
    w0 = jnp.where(has_m1, -d0 * dx / jnp.maximum(x1 - xm1, 1e-12), 0.0)
    w1 = w1 + jnp.where(has_m1, 0.0, -d0)
    w2c = w2 + jnp.where(has_m1, d0 * dx / jnp.maximum(x1 - xm1, 1e-12), d0)
    w3 = jnp.where(has_p2, d1 * dx / jnp.maximum(x2v - x0, 1e-12), 0.0)
    w1c = w1 + jnp.where(has_p2, -d1 * dx / jnp.maximum(x2v - x0, 1e-12), -d1)
    w2c = w2c + jnp.where(has_p2, 0.0, d1)
    return idx - 1, jnp.stack([w0, w1c, w2c, w3], -1)  # offsets idx-1..idx+2


def _cos_dphi(wo, wi):
    """cos of the azimuth difference of (-wi, wo) — CosDPhi(-wi, wo)."""
    mu_i = -wi[:, 2]
    mu_o = wo[:, 2]
    sin_i = jnp.sqrt(jnp.maximum(1 - mu_i * mu_i, 0.0))
    sin_o = jnp.sqrt(jnp.maximum(1 - mu_o * mu_o, 0.0))
    cos_phi_i = jnp.where(sin_i > 1e-6, -wi[:, 0] / jnp.maximum(sin_i, 1e-12), 1.0)
    sin_phi_i = jnp.where(sin_i > 1e-6, -wi[:, 1] / jnp.maximum(sin_i, 1e-12), 0.0)
    cos_phi_o = jnp.where(sin_o > 1e-6, wo[:, 0] / jnp.maximum(sin_o, 1e-12), 1.0)
    sin_phi_o = jnp.where(sin_o > 1e-6, wo[:, 1] / jnp.maximum(sin_o, 1e-12), 0.0)
    return jnp.clip(cos_phi_i * cos_phi_o + sin_phi_i * sin_phi_o, -1.0, 1.0)


def _blend_ak(tab: FourierTable, tid, mu_i, mu_o):
    """Catmull-Rom 4x4 blend of the coefficient table -> ak [N, m, 3]."""
    mu_nodes = tab.mu[tid]                      # [N, K]
    n_valid = tab.n_mu[tid]
    oi, wts_i = _catmull_rom_weights(mu_nodes, n_valid, mu_i)
    oj, wts_j = _catmull_rom_weights(mu_nodes, n_valid, mu_o)
    K = mu_nodes.shape[1]
    ak = 0.0
    for a4 in range(4):
        for b4 in range(4):
            ii = jnp.clip(oi + a4, 0, K - 1)
            jj = jnp.clip(oj + b4, 0, K - 1)
            w = (wts_i[:, a4] * wts_j[:, b4])[:, None, None]
            ak = ak + w * tab.a[tid, ii, jj]
    return ak


def _series(ak, cos_phi):
    """sum_k ak[:, k] cos(k phi) via the double-angle recurrence.
    ak: [N, m] or [N, m, 3]."""
    m = ak.shape[1]

    def bc(c):
        return c[:, None] if ak.ndim == 3 else c

    c_km1 = jnp.ones_like(cos_phi)
    c_k = cos_phi
    out = ak[:, 0] * bc(c_km1)
    if m > 1:
        out = out + ak[:, 1] * bc(c_k)
    for k in range(2, m):
        c_next = 2.0 * cos_phi * c_k - c_km1
        out = out + ak[:, k] * bc(c_next)
        c_km1, c_k = c_k, c_next
    return out


def _ak_lum(ak):
    """Luminance coefficients from the RGB ones (exact inverse of the
    G-from-Y fit applied in read_bsdf_file)."""
    return (ak[:, :, 1] + 0.100913 * ak[:, :, 0]
            + 0.297375 * ak[:, :, 2]) / 1.39829


def eval_fourier(tab: FourierTable, table_id, wo, wi):
    """f(wo, wi) [N,3] for per-lane table ids (shading-frame directions).

    fourier_bsdf.rs f(): the table convention is mu_i = cosThetaI of the
    INCOMING direction negated; cosPhi is the azimuth difference cosine.
    Returns 0 for table_id < 0 lanes.
    """
    tid = jnp.maximum(table_id, 0)
    mu_i = -wi[:, 2]
    mu_o = wo[:, 2]
    cos_phi = _cos_dphi(wo, wi)
    ak = _blend_ak(tab, tid, mu_i, mu_o)
    out = _series(ak, cos_phi)
    out = out / jnp.maximum(jnp.abs(mu_i), 1e-6)[:, None]
    valid = (table_id >= 0)
    return jnp.where(valid[:, None], jnp.maximum(out, 0.0), 0.0)


def _mu_marginal(tab: FourierTable, tid, mu_o):
    """Per-lane piecewise-linear marginal over mu_i at this mu_o:
    (nodes [N,K], y [N,K] density values, cdf [N,K], total [N])."""
    nodes = tab.mu[tid]
    n_valid = tab.n_mu[tid]
    K = nodes.shape[1]
    lanes = jnp.arange(mu_o.shape[0])
    j = jnp.sum((nodes <= mu_o[:, None]).astype(jnp.int32), axis=1) - 1
    j = jnp.clip(j, 0, n_valid - 2)
    x0 = nodes[lanes, j]
    x1 = nodes[lanes, jnp.minimum(j + 1, K - 1)]
    t = jnp.clip((mu_o - x0) / jnp.maximum(x1 - x0, 1e-12), 0.0, 1.0)
    y = (1 - t)[:, None] * tab.a0y[tid, :, j] + t[:, None] * tab.a0y[tid, :, jnp.minimum(j + 1, K - 1)]
    cdf = (1 - t)[:, None] * tab.cdf[tid, :, j] + t[:, None] * tab.cdf[tid, :, jnp.minimum(j + 1, K - 1)]
    total = cdf[lanes, n_valid - 1]
    return nodes, y, cdf, total


PHI_BISECT = 20


def sample_fourier_bsdf(tab: FourierTable, table_id, wo, u2, u_flip):
    """Importance-sample the FourierBSDF (fourier_bsdf.rs sample_f via
    sample_catmull_rom_2d + sample_fourier).

    TPU re-design: the mu_i marginal is the build-time trapezoid CDF of the
    luminance a0 grid — piecewise-LINEAR density, inverted in closed form
    per segment (no scalar Newton walk); the azimuth is drawn from the
    blended cosine series by fixed-depth bisection of its analytic CDF.
    Returns (wi [N,3], pdf [N]); pdf matches this sampler exactly and is
    also computable from directions alone via pdf_fourier."""
    n = wo.shape[0]
    tid = jnp.maximum(table_id, 0)
    mu_o = wo[:, 2]
    lanes = jnp.arange(n)
    nodes, y, cdf, total = _mu_marginal(tab, tid, mu_o)
    n_valid = tab.n_mu[tid]
    K = nodes.shape[1]
    u = u2[:, 0] * jnp.maximum(total, 1e-12)
    i = jnp.sum((cdf <= u[:, None]).astype(jnp.int32), axis=1) - 1
    i = jnp.clip(i, 0, n_valid - 2)
    x0 = nodes[lanes, i]
    x1 = nodes[lanes, jnp.minimum(i + 1, K - 1)]
    yl = y[lanes, i]
    yr = y[lanes, jnp.minimum(i + 1, K - 1)]
    cl = cdf[lanes, i]
    dx = jnp.maximum(x1 - x0, 1e-12)
    du = jnp.maximum(u - cl, 0.0)
    k_slope = (yr - yl) / dx
    # solve 0.5 k s^2 + yl s = du (stable form; linear fallback)
    disc = jnp.sqrt(jnp.maximum(yl * yl + 2.0 * k_slope * du, 0.0))
    s_quad = 2.0 * du / jnp.maximum(yl + disc, 1e-12)
    s = jnp.clip(s_quad, 0.0, dx)
    mu_i = x0 + s
    y_at = yl + k_slope * s
    pdf_mu = y_at / jnp.maximum(total, 1e-12)

    # azimuth from the blended luminance series at (mu_i, mu_o)
    ak = _blend_ak(tab, tid, mu_i, mu_o)
    ak_y = _ak_lum(ak)                       # [N, m]
    m = ak_y.shape[1]
    a0 = jnp.maximum(ak_y[:, 0], 1e-12)
    v = jnp.minimum(u2[:, 1], 0.999999)

    def cdf_phi(phi):
        """Phi(phi) = (a0 phi + sum_k ak sin(k phi)/k) / (pi a0), phi in
        [0, pi] — the analytic integral of the cosine series. sin(k phi)
        rides the same Chebyshev recurrence as the cosine chain."""
        cos1 = jnp.cos(phi)
        acc = a0 * phi
        s_km1 = jnp.zeros_like(phi)          # sin(0 phi)
        s_k = jnp.sin(phi)                   # sin(1 phi)
        if m > 1:
            acc = acc + ak_y[:, 1] * s_k
        for k in range(2, m):
            s_next = 2.0 * cos1 * s_k - s_km1
            acc = acc + ak_y[:, k] * s_next / k
            s_km1, s_k = s_k, s_next
        return acc / (jnp.pi * a0)

    lo = jnp.zeros((n,), jnp.float32)
    hi = jnp.full((n,), jnp.pi, jnp.float32)
    for _ in range(PHI_BISECT):
        mid = 0.5 * (lo + hi)
        below = cdf_phi(mid) < v
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    phi = 0.5 * (lo + hi)
    phi = jnp.where(u_flip < 0.5, -phi, phi)

    cos_phi = jnp.cos(phi)
    fy = jnp.maximum(_series(ak_y, cos_phi), 0.0)
    pdf_phi = fy / (2.0 * jnp.pi * a0)
    pdf = pdf_mu * pdf_phi

    # reconstruct wi: rotate wo's azimuth by phi, negate (sample_f)
    sin_i = jnp.sqrt(jnp.maximum(1 - mu_i * mu_i, 0.0))
    sin_o = jnp.sqrt(jnp.maximum(1 - mu_o * mu_o, 0.0))
    cpo = jnp.where(sin_o > 1e-6, wo[:, 0] / jnp.maximum(sin_o, 1e-12), 1.0)
    spo = jnp.where(sin_o > 1e-6, wo[:, 1] / jnp.maximum(sin_o, 1e-12), 0.0)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    wi = -jnp.stack([sin_i * (cp * cpo - sp * spo),
                     sin_i * (sp * cpo + cp * spo),
                     mu_i], -1)
    ok = (table_id >= 0) & (total > 1e-12)
    return wi, jnp.where(ok, pdf, 0.0)


def pdf_fourier(tab: FourierTable, table_id, wo, wi):
    """Density of sample_fourier_bsdf at (wo, wi) [N]."""
    n = wo.shape[0]
    tid = jnp.maximum(table_id, 0)
    mu_i = -wi[:, 2]
    mu_o = wo[:, 2]
    lanes = jnp.arange(n)
    nodes, y, cdf, total = _mu_marginal(tab, tid, mu_o)
    n_valid = tab.n_mu[tid]
    K = nodes.shape[1]
    i = jnp.sum((nodes <= mu_i[:, None]).astype(jnp.int32), axis=1) - 1
    i = jnp.clip(i, 0, n_valid - 2)
    x0 = nodes[lanes, i]
    x1 = nodes[lanes, jnp.minimum(i + 1, K - 1)]
    yl = y[lanes, i]
    yr = y[lanes, jnp.minimum(i + 1, K - 1)]
    t = jnp.clip((mu_i - x0) / jnp.maximum(x1 - x0, 1e-12), 0.0, 1.0)
    pdf_mu = (yl + (yr - yl) * t) / jnp.maximum(total, 1e-12)
    ak_y = _ak_lum(_blend_ak(tab, tid, mu_i, mu_o))
    a0 = jnp.maximum(ak_y[:, 0], 1e-12)
    fy = jnp.maximum(_series(ak_y, _cos_dphi(wo, wi)), 0.0)
    pdf = pdf_mu * fy / (2.0 * jnp.pi * a0)
    ok = (table_id >= 0) & (total > 1e-12)
    return jnp.where(ok, pdf, 0.0)
