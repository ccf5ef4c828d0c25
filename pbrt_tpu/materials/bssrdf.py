"""Separable BSSRDF: measured media table + normalized-diffusion profile.

Reference: core/src/bssrdf.rs (SeparableBSSRDF :72, fresnel moments :143,158),
core/src/reflection/tabulated_bssrdf.rs (TabulatedBSSRDF + BSSRDFTable beam
diffusion precompute + sample_s/sample_sp/pdf_sp) and
core/src/medium/measured_ss.rs (named media coefficients).

TPU re-design: the reference precomputes a (rho, radius) beam-diffusion table
at startup and samples it with Catmull-Rom inversion — a scalar,
data-dependent search per event. Here the radial profile is the
Christensen-Burley normalized diffusion approximation, which matches the
beam-diffusion profile closely and has CLOSED-FORM eval / pdf / (numeric but
fixed-iteration) inverse-CDF sampling — every lane evaluates the same handful
of exp()s, ideal for lockstep wavefronts. Same separable factorization
S = (1-Fr) Sp Sw and the same per-channel importance sampling over RGB.

Measured sigma_a / sigma_s' coefficients are the published Jensen et al. 2001
"A Practical Model for Subsurface Light Transport" values (the same data the
reference embeds in measured_ss.rs).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# name -> (sigma_prime_s RGB [1/mm], sigma_a RGB [1/mm]) — Jensen et al. 2001,
# Table 1 (also the head entries of measured_ss.rs).
MEASURED_SS = {
    "Apple": ([2.29, 2.39, 1.97], [0.0030, 0.0034, 0.046]),
    "Chicken1": ([0.15, 0.21, 0.38], [0.015, 0.077, 0.19]),
    "Chicken2": ([0.19, 0.25, 0.32], [0.018, 0.088, 0.20]),
    "Cream": ([7.38, 5.47, 3.15], [0.0002, 0.0028, 0.0163]),
    "Ketchup": ([0.18, 0.07, 0.03], [0.061, 0.97, 1.45]),
    "Marble": ([2.19, 2.62, 3.00], [0.0021, 0.0041, 0.0071]),
    "Potato": ([0.68, 0.70, 0.55], [0.0024, 0.0090, 0.12]),
    "Skimmilk": ([0.70, 1.22, 1.90], [0.0014, 0.0025, 0.0142]),
    "Skin1": ([0.74, 0.88, 1.01], [0.032, 0.17, 0.48]),
    "Skin2": ([1.09, 1.59, 1.79], [0.013, 0.070, 0.145]),
    "Spectralon": ([11.6, 20.4, 14.9], [0.00, 0.00, 0.00]),
    "Wholemilk": ([2.55, 3.21, 3.77], [0.0011, 0.0024, 0.014]),
}


def get_medium_scattering_properties(name: str):
    """(sigma_a, sigma_prime_s) RGB in 1/mm, or None (measured_ss lookup)."""
    for k, (sps, sa) in MEASURED_SS.items():
        if k.lower() == name.lower():
            return (np.asarray(sa, np.float32), np.asarray(sps, np.float32))
    return None


# ---------------------------------------------------------------------------
# fresnel moments (bssrdf.rs:143 fresnel_moment1 / :158 fresnel_moment2)
# ---------------------------------------------------------------------------

def fresnel_moment1(eta):
    """First moment of the Fresnel reflectance (polynomial fit)."""
    eta = jnp.asarray(eta, jnp.float32)
    e2, e3, e4, e5 = eta * eta, eta ** 3, eta ** 4, eta ** 5
    lo = (0.45966 - 1.73965 * eta + 3.37668 * e2 - 3.904945 * e3
          + 2.49277 * e4 - 0.68441 * e5)
    hi = (-4.61686 + 11.1136 * eta - 10.4646 * e2 + 5.11455 * e3
          - 1.27198 * e4 + 0.12746 * e5)
    return jnp.where(eta < 1.0, lo, hi)


def fresnel_moment2(eta):
    eta = jnp.asarray(eta, jnp.float32)
    e2, e3, e4, e5 = eta * eta, eta ** 3, eta ** 4, eta ** 5
    lo = (0.27614 - 0.87350 * eta + 1.12077 * e2 - 0.65095 * e3
          - 0.07883 * e4 + 0.04860 * e5)
    r_1 = -547.033 + 45.3087 / (eta ** 3) - 218.725 / e2 + 458.843 / eta \
        + 404.557 * eta - 189.519 * e2 + 54.9327 * e3 - 9.00603 * e4 \
        + 0.63942 * e5
    return jnp.where(eta < 1.0, lo, r_1)


# ---------------------------------------------------------------------------
# Burley normalized diffusion profile
# ---------------------------------------------------------------------------

def burley_scaling(albedo):
    """Single-scattering albedo -> dimensionless scaling s (Christensen-
    Burley 2015 fit for the searchlight configuration)."""
    a = jnp.clip(albedo, 0.0, 1.0)
    return 1.9 - a + 3.5 * (a - 0.8) ** 2


def burley_d(albedo, sigma_t):
    """Per-channel diffusion length d = 1 / (s * sigma_t)."""
    s = burley_scaling(albedo)
    return 1.0 / jnp.maximum(s * sigma_t, 1e-8)


def sr_profile(r, d, albedo):
    """Radial profile Sr(r): albedo * (e^{-r/d} + e^{-r/3d}) / (8 pi d r).
    Integrates (over the plane, times 2*pi*r dr) to `albedo`."""
    r = jnp.maximum(r, 1e-6)
    return albedo * (jnp.exp(-r / d) + jnp.exp(-r / (3.0 * d))) \
        / (8.0 * jnp.pi * d * r)


def sr_cdf(r, d):
    """CDF of the (normalized) profile: 1 - e^{-r/d}/4 - 3 e^{-r/3d}/4."""
    return 1.0 - 0.25 * jnp.exp(-r / d) - 0.75 * jnp.exp(-r / (3.0 * d))


def sr_pdf(r, d):
    """pdf of r under polar sampling of the normalized profile:
    p(r) = (e^{-r/d} + e^{-r/3d}) / (8 pi d r) * 2 pi r = ... per unit AREA
    the reference convention: pdf over the disk (per unit area)."""
    r = jnp.maximum(r, 1e-6)
    return (jnp.exp(-r / d) + jnp.exp(-r / (3.0 * d))) / (8.0 * jnp.pi * d * r)


def sr_sample(u, d):
    """Invert sr_cdf by fixed-iteration Newton (every lane runs the same 12
    steps — the lockstep replacement of the reference's Catmull-Rom
    invert_catmull_rom search)."""
    # initialize from the dominant exponential mixture component
    r = jnp.where(u < 0.25, -jnp.log1p(-jnp.minimum(u * 4.0, 0.999)) * d,
                  -jnp.log1p(-jnp.minimum((u - 0.25) / 0.75, 0.999)) * 3.0 * d)
    r = jnp.maximum(r, 1e-6)
    for _ in range(12):
        f = sr_cdf(r, d) - u
        dfdr = (0.25 / d) * jnp.exp(-r / d) + (0.25 / d) * jnp.exp(-r / (3.0 * d))
        r = jnp.clip(r - f / jnp.maximum(dfdr, 1e-12), 1e-6, 1e6)
    return r


def sr_sample_max(d):
    """Radius beyond which the profile is negligible (reference uses the
    table's last radius; here the 0.999 quantile of the wider exponential)."""
    return -jnp.log(0.001) * 3.0 * d


# ---------------------------------------------------------------------------
# material -> (sigma_t, rho) remaps
# ---------------------------------------------------------------------------

def subsurface_sigmas(sigma_a, sigma_s, scale=1.0):
    """(sigma_t, albedo rho) from absorption/scattering (subsurface.rs)."""
    st = (sigma_a + sigma_s) * scale
    rho = jnp.where(st > 0, sigma_s * scale / jnp.maximum(st, 1e-12), 0.0)
    return st, rho


def kdsubsurface_remap(kd, mfp):
    """kdsubsurface.rs: diffuse reflectance Kd + mean free path -> (sigma_t,
    rho) via the Burley inverse mapping (SubsurfaceFromDiffuse analog)."""
    rho_eff = jnp.clip(kd, 0.0, 1.0)
    # invert A(rho): effective albedo of the profile equals rho itself for
    # normalized diffusion, so rho = rho_eff and sigma_t = 1/mfp
    return 1.0 / jnp.maximum(mfp, 1e-6), rho_eff
