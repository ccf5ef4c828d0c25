"""Spectrum representation and color conversions.

The compute-path spectrum is RGB: a [..., 3] float32 array (reference:
core/src/spectrum/mod.rs selects RGBSpectrum by default). Radiance stays a
plain jnp array so every spectrum op is a fused VPU op and film accumulation
is a [H, W, 3] tensor.

Conversions (XYZ<->RGB, blackbody) mirror core/src/spectrum/common.rs. CIE
matching functions use the analytic multi-Gaussian fits of Wyman, Sloan &
Shirley (JCGT 2013) instead of the reference's 471-entry tables — accurate to
well under 1% for the blackbody/illuminant uses here and table-free on device.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

N_SPECTRAL_SAMPLES = 60  # used by the sampled-spectrum utilities
LAMBDA_START, LAMBDA_END = 400.0, 700.0

# sRGB / Rec.709 primaries with D65 white (same matrices as the reference)
_XYZ_TO_RGB = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]], np.float32)
_RGB_TO_XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]], np.float32)


def xyz_to_rgb(xyz):
    return xyz @ jnp.asarray(_XYZ_TO_RGB).T if isinstance(xyz, jnp.ndarray) \
        else np.asarray(xyz, np.float32) @ _XYZ_TO_RGB.T


def rgb_to_xyz(rgb):
    return rgb @ jnp.asarray(_RGB_TO_XYZ).T if isinstance(rgb, jnp.ndarray) \
        else np.asarray(rgb, np.float32) @ _RGB_TO_XYZ.T


def luminance(rgb):
    """y component of XYZ (reference RGBSpectrum::y())."""
    w = jnp.asarray(_RGB_TO_XYZ[1])
    return jnp.sum(jnp.asarray(rgb) * w, axis=-1)


def is_black(rgb):
    return jnp.all(rgb == 0.0, axis=-1)


# ---------------------------------------------------------------------------
# CIE 1931 matching functions — analytic fits (Wyman/Sloan/Shirley 2013)
# ---------------------------------------------------------------------------

def _g(x, alpha, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    t = (x - mu) / s
    return alpha * np.exp(-0.5 * t * t)


def cie_xyz_bar(lam):
    """CIE X,Y,Z matching values at wavelength(s) lam [nm] (host numpy)."""
    lam = np.asarray(lam, np.float64)
    x = _g(lam, 1.056, 599.8, 37.9, 31.0) + _g(lam, 0.362, 442.0, 16.0, 26.7) \
        + _g(lam, -0.065, 501.1, 20.4, 26.2)
    y = _g(lam, 0.821, 568.8, 46.9, 40.5) + _g(lam, 0.286, 530.9, 16.3, 31.1)
    z = _g(lam, 1.217, 437.0, 11.8, 36.0) + _g(lam, 0.681, 459.0, 26.0, 13.8)
    return np.stack([x, y, z], -1)


def blackbody(lam_nm, t_kelvin):
    """Planck's law: emitted radiance at wavelength lam [nm], temp T [K]."""
    lam = np.asarray(lam_nm, np.float64) * 1e-9
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    l5 = lam ** 5
    return (2.0 * h * c * c) / (l5 * (np.expm1((h * c) / (lam * kb * t_kelvin))))


def blackbody_normalized_rgb(t_kelvin, scale=1.0):
    """RGB of a blackbody at T, normalized so peak spectral radiance == 1,
    times scale (reference: BlackbodySpectrum / paramset blackbody handling:
    api/src/parser/mod.rs blackbody params)."""
    lam = np.linspace(360.0, 830.0, 128)
    le = blackbody(lam, t_kelvin)
    # Wien's displacement law peak
    lam_max = 2.8977721e-3 / t_kelvin * 1e9
    le = le / blackbody(np.array([lam_max]), t_kelvin)[0]
    xyz = (cie_xyz_bar(lam) * le[:, None]).sum(0)
    # normalize by integral of y-bar so a flat SPD of 1 maps to Y=1
    y_int = cie_xyz_bar(lam)[:, 1].sum()
    xyz = xyz / y_int
    rgb = np.asarray(xyz, np.float32) @ _XYZ_TO_RGB.T
    return np.maximum(rgb * scale, 0.0).astype(np.float32)


def spd_to_rgb(lambdas, values, illuminant=False):
    """Piecewise-linear SPD samples -> RGB (reference: from_sampled,
    core/src/spectrum/common.rs). Used for 'spectrum' paramset values and
    metal eta/k curves."""
    lambdas = np.asarray(lambdas, np.float64)
    values = np.asarray(values, np.float64)
    order = np.argsort(lambdas)
    lambdas, values = lambdas[order], values[order]
    lam = np.linspace(360.0, 830.0, 471)
    v = np.interp(lam, lambdas, values, left=values[0], right=values[-1])
    bar = cie_xyz_bar(lam)
    xyz = (bar * v[:, None]).sum(0)
    y_int = bar[:, 1].sum()
    xyz /= y_int
    rgb = np.asarray(xyz, np.float32) @ _XYZ_TO_RGB.T
    return np.maximum(rgb, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# gamma (sRGB transfer, reference core/src/image_io.rs gamma_correct)
# ---------------------------------------------------------------------------

def gamma_correct(v):
    v = jnp.asarray(v)
    return jnp.where(v <= 0.0031308, 12.92 * v,
                     1.055 * jnp.power(jnp.maximum(v, 1e-8), 1.0 / 2.4) - 0.055)


def inverse_gamma_correct(v):
    v = jnp.asarray(v)
    return jnp.where(v <= 0.04045, v / 12.92,
                     jnp.power((v + 0.055) / 1.055, 2.4))


# ---------------------------------------------------------------------------
# SampledSpectrum mode (reference: core/src/spectrum/sampled_spectrum.rs:16,
# selected by the sampled-spectrum feature in core/src/spectrum/mod.rs:16-34)
#
# TPU re-design: "Spectrum" stays a plain [..., C] array so every op in the
# wavefront pipeline is channel-count agnostic; spectral mode just widens
# C from 3 to N_SPECTRAL_SAMPLES at the scene boundaries (material/light
# color lift) and converts back to RGB at the film. The RGB->spectrum lift
# follows Smits' method (as the reference's from_rgb does): 7 smooth basis
# spectra (white/cyan/magenta/yellow/red/green/blue) mixed by the sorted
# channel structure of the input color. Unlike the reference we SOLVE for
# the bases at import instead of shipping Smits' 32-sample tables: each
# basis is the smoothest spectrum (min second-difference energy) whose
# CIE-integrated RGB equals its target color — the same criterion Smits
# optimized, reproduced rather than copied.
# ---------------------------------------------------------------------------

_SPECTRAL_CACHE = {}


def spectral_lambdas():
    """Bin-center wavelengths of the sampled representation."""
    i = np.arange(N_SPECTRAL_SAMPLES) + 0.5
    return LAMBDA_START + (LAMBDA_END - LAMBDA_START) * i / N_SPECTRAL_SAMPLES


def _solve_bases(Q, At, targets):
    """Smoothest-metamer bases: min ||D2 s||^2  s.t.  At s = target.

    Active-set iteration clamps negative bins to 0 and re-solves the
    equality-constrained problem on the free bins, so the converted RGB
    stays exact even for saturated targets (plain clipping costs up to
    ~10% roundtrip error on saturated greens)."""
    C = Q.shape[0]
    bases = []
    for t in targets:
        free = np.ones(C, bool)
        s = np.zeros(C)
        for _ in range(6):
            F = np.flatnonzero(free)
            Qf = Q[np.ix_(F, F)]
            Af = At[:, F]
            KKTf = np.block([[Qf, Af.T], [Af, np.zeros((3, 3))]])
            rhs = np.concatenate([np.zeros(len(F)), t])
            try:
                sol = np.linalg.solve(KKTf, rhs)[:len(F)]
            except np.linalg.LinAlgError:
                break
            s = np.zeros(C)
            s[F] = sol
            neg = s < -1e-9
            if not neg.any():
                break
            free &= ~neg
        bases.append(np.maximum(s, 0.0))
    return np.stack(bases)


def _spectral_tables():
    """(to_rgb [C,3], illum bases [7,C], refl bases [7,C]) — cached solve.

    Two basis sets, the same convention as the reference's separate
    RGBIllum2Spect/RGBRefl2Spect tables: illuminant bases satisfy
    T(s) = rgb under the film conversion T, and REFLECTANCE bases satisfy
    T(s_refl * s_white_illum) = rgb — i.e. they are exact under the white
    illuminant, so a white-light first bounce reproduces the RGB render
    exactly and only genuine metamer products (colored light x colored
    surface, deep bounces) deviate."""
    if "tabs" in _SPECTRAL_CACHE:
        return _SPECTRAL_CACHE["tabs"]
    C = N_SPECTRAL_SAMPLES
    lam = spectral_lambdas()
    bar = cie_xyz_bar(lam)                      # [C,3]
    y_int = bar[:, 1].sum()
    # film operator: rgb = (S @ bar / y_int) @ XYZ_TO_RGB^T
    A = (bar / y_int).astype(np.float64) @ _XYZ_TO_RGB.astype(np.float64).T
    D = np.zeros((C - 2, C))
    for i in range(C - 2):
        D[i, i:i + 3] = (1.0, -2.0, 1.0)
    Q = D.T @ D + 1e-6 * np.eye(C)
    targets = np.array([[1, 1, 1], [0, 1, 1], [1, 0, 1], [1, 1, 0],
                        [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64)
    illum = _solve_bases(Q, A.T, targets)
    # reflectance operator: weighted by the white-illuminant spectrum
    A_refl = A * illum[0][:, None]
    refl = _solve_bases(Q, A_refl.T, targets)
    tabs = (A.astype(np.float32), illum.astype(np.float32),
            refl.astype(np.float32))
    _SPECTRAL_CACHE["tabs"] = tabs
    return tabs


def spectrum_to_rgb(s):
    """[..., C] sampled spectrum -> [..., 3] linear RGB (film-side
    conversion; sampled_spectrum.rs to_xyz + xyz_to_rgb)."""
    A, _, _ = _spectral_tables()
    return s @ jnp.asarray(A)


def rgb_to_spectrum(rgb, clamp: bool = True, reflectance: bool = False):
    """[..., 3] RGB -> [..., C] sampled spectrum (Smits-style mix of the 7
    solved bases, branch structure of sampled_spectrum.rs from_rgb).
    reflectance=True uses the illuminant-weighted basis set (material
    colors); default is the illuminant set (light emission)."""
    _, BI, BR = _spectral_tables()
    B = jnp.asarray(BR if reflectance else BI)
    w, c, m, y, r, g, b = (B[i] for i in range(7))
    R, G, Bl = rgb[..., 0:1], rgb[..., 1:2], rgb[..., 2:3]

    def mix(lo, mid_c, mid_s, hi_c, hi_s):
        # lo*white + (mid-lo)*secondary + (hi-mid)*primary
        return lo * w + (mid_c - lo) * mid_s + (hi_c - mid_c) * hi_s

    # r smallest
    s_r = jnp.where((G <= Bl), mix(R, G, c, Bl, b), mix(R, Bl, c, G, g))
    # g smallest
    s_g = jnp.where((R <= Bl), mix(G, R, m, Bl, b), mix(G, Bl, m, R, r))
    # b smallest
    s_b = jnp.where((R <= G), mix(Bl, R, y, G, g), mix(Bl, G, y, R, r))
    r_min = (R <= G) & (R <= Bl)
    g_min = (G <= R) & (G <= Bl) & ~r_min
    s = jnp.where(r_min, s_r, jnp.where(g_min, s_g, s_b))
    return jnp.maximum(s, 0.0) if clamp else s
