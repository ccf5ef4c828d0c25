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
    """Dense device form. Leading axis = table id (one per fourier material)."""
    mu: jnp.ndarray     # [B, n_mu] zenith-cosine grid (padded with +1)
    a: jnp.ndarray      # [B, n_mu, n_mu, m_cap, 3] cosine-series coefficients
    eta: jnp.ndarray    # [B]
    n_mu: jnp.ndarray   # [B] valid grid size

    @staticmethod
    def empty():
        return FourierTable(jnp.ones((1, 2), jnp.float32) * jnp.asarray([-1.0, 1.0]),
                            jnp.zeros((1, 2, 2, 1, 3), jnp.float32),
                            jnp.ones((1,), jnp.float32),
                            jnp.full((1,), 2, jnp.int32))


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
    for b, t in enumerate(tables):
        n = t["mu"].shape[0]
        mu[b, :n] = t["mu"]
        mu[b, n:] = t["mu"][-1] + np.arange(1, n_mu_max - n + 1)  # strictly inc
        a[b, :n, :n, :t["a"].shape[2]] = t["a"]
        eta[b] = t["eta"]
        nm[b] = n
    return FourierTable(jnp.asarray(mu), jnp.asarray(a), jnp.asarray(eta),
                        jnp.asarray(nm))


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


def eval_fourier(tab: FourierTable, table_id, wo, wi):
    """f(wo, wi) [N,3] for per-lane table ids (shading-frame directions).

    fourier_bsdf.rs f(): muI = cos(theta_i) of -wi? — the table convention is
    mu_i = cosThetaI of the INCOMING direction negated; cosPhi is the azimuth
    difference cosine. Returns 0 for table_id < 0 lanes.
    """
    tid = jnp.maximum(table_id, 0)
    mu_nodes = tab.mu[tid]                      # [N, K]
    n_valid = tab.n_mu[tid]
    mu_i = -wi[:, 2]
    mu_o = wo[:, 2]
    # azimuth difference cosine
    sin2_i = jnp.maximum(1 - mu_i * mu_i, 0.0)
    sin2_o = jnp.maximum(1 - mu_o * mu_o, 0.0)
    sin_i = jnp.sqrt(sin2_i)
    sin_o = jnp.sqrt(sin2_o)
    # azimuth difference of (-wi, wo): fourier_bsdf.rs uses CosDPhi(-wi, wo)
    cos_phi_i = jnp.where(sin_i > 1e-6, -wi[:, 0] / jnp.maximum(sin_i, 1e-12), 1.0)
    sin_phi_i = jnp.where(sin_i > 1e-6, -wi[:, 1] / jnp.maximum(sin_i, 1e-12), 0.0)
    cos_phi_o = jnp.where(sin_o > 1e-6, wo[:, 0] / jnp.maximum(sin_o, 1e-12), 1.0)
    sin_phi_o = jnp.where(sin_o > 1e-6, wo[:, 1] / jnp.maximum(sin_o, 1e-12), 0.0)
    cos_phi = jnp.clip(cos_phi_i * cos_phi_o + sin_phi_i * sin_phi_o, -1.0, 1.0)

    oi, wts_i = _catmull_rom_weights(mu_nodes, n_valid, mu_i)
    oj, wts_j = _catmull_rom_weights(mu_nodes, n_valid, mu_o)

    # blend 4x4 coefficient vectors: ak [N, m, 3]
    K = mu_nodes.shape[1]
    ak = 0.0
    for a4 in range(4):
        for b4 in range(4):
            ii = jnp.clip(oi + a4, 0, K - 1)
            jj = jnp.clip(oj + b4, 0, K - 1)
            w = (wts_i[:, a4] * wts_j[:, b4])[:, None, None]
            ak = ak + w * tab.a[tid, ii, jj]
    # cosine series sum_k ak cos(k phi) via the double-angle recurrence
    m = tab.a.shape[3]
    c_km1 = jnp.ones_like(cos_phi)          # cos(0)
    c_k = cos_phi                            # cos(1)
    out = ak[:, 0] * c_km1[:, None]
    if m > 1:
        out = out + ak[:, 1] * c_k[:, None]
    for k in range(2, m):
        c_next = 2.0 * cos_phi * c_k - c_km1
        out = out + ak[:, k] * c_next[:, None]
        c_km1, c_k = c_k, c_next
    out = out / jnp.maximum(jnp.abs(mu_i), 1e-6)[:, None]
    valid = (table_id >= 0)
    return jnp.where(valid[:, None], jnp.maximum(out, 0.0), 0.0)
