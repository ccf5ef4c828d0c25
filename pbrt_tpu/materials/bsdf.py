"""BSDF lobe algebra — branch-free wavefront shading.

Reference: core/src/reflection/ (BxDF enum of 12 lobes, BSDF of up to 8
lobes, bsdf.rs:12,71), core/src/microfacet/ (Beckmann + Trowbridge-Reitz).

TPU re-design: the reference dispatches dynamically over a per-surface vec
of BxDF enums. Here EVERY surface's BSDF is one fixed `Lobes` parameter
block with three masked lobe families:

  diffuse   : Lambertian / Oren-Nayar reflection + Lambertian transmission
  glossy    : microfacet reflection (dielectric / conductor Fresnel, or
              Ashikhmin-Shirley FresnelBlend) + microfacet transmission
  specular  : perfect reflection / transmission, incl. the coupled
              FresnelSpecular R/T pair of smooth glass

A lobe is "absent" when its weight is zero, so f/sample/pdf are pure masked
arithmetic — no per-lane control flow, everything fuses on the VPU. The
material stage (materials/__init__.py) maps each pbrt material to a Lobes
block; that's the analog of Material::compute_scattering_functions
(core/src/material.rs:34).

Directions: wo/wi in LOCAL shading space (z = shading normal), unit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import vec3, dot, normalize, PI, INV_PI
from pbrt_tpu.core.sampling import cosine_sample_hemisphere, concentric_sample_disk

# microfacet distribution ids
DIST_GGX, DIST_BECKMANN = 0, 1
# glossy fresnel kinds
GF_DIELECTRIC, GF_CONDUCTOR, GF_BLEND = 0, 1, 2
# specular fresnel kinds
SF_DIELECTRIC, SF_CONDUCTOR, SF_NOOP = 0, 1, 2


class Lobes(NamedTuple):
    """Per-lane BSDF parameter block ([N] leading axis everywhere)."""
    kd: jnp.ndarray        # [N,3] diffuse reflectance
    sigma: jnp.ndarray     # [N] Oren-Nayar sigma (radians already converted)
    kt_diff: jnp.ndarray   # [N,3] diffuse transmission (translucent)
    ks: jnp.ndarray        # [N,3] glossy reflection weight
    rough_u: jnp.ndarray   # [N] alpha_x of glossy refl
    rough_v: jnp.ndarray   # [N]
    glossy_kind: jnp.ndarray  # [N] int32 GF_*
    dist: jnp.ndarray      # [N] int32 DIST_*
    eta: jnp.ndarray       # [N] relative ior (interface)
    eta3: jnp.ndarray      # [N,3] conductor eta
    k3: jnp.ndarray        # [N,3] conductor k
    rd_blend: jnp.ndarray  # [N,3] FresnelBlend diffuse color (substrate Kd)
    kt_gloss: jnp.ndarray  # [N,3] glossy transmission weight
    rough_tu: jnp.ndarray  # [N]
    rough_tv: jnp.ndarray  # [N]
    spec_r: jnp.ndarray    # [N,3] specular reflection weight
    spec_t: jnp.ndarray    # [N,3] specular transmission weight
    spec_fresnel: jnp.ndarray  # [N] int32 SF_*
    # BSSRDF transport parameters (bssrdf.py; zero when not subsurface)
    sss_flag: jnp.ndarray  # [N] bool
    sss_d: jnp.ndarray     # [N,3] per-channel diffusion length
    sss_rho: jnp.ndarray   # [N,3] profile albedo
    fourier_id: jnp.ndarray  # [N] int32 fourier table id (-1 none)

    @staticmethod
    def zeros(n):
        z = jnp.zeros((n,), jnp.float32)
        z3 = jnp.zeros((n, 3), jnp.float32)
        i = jnp.zeros((n,), jnp.int32)
        return Lobes(z3, z, z3, z3, z, z, i, i, jnp.ones((n,), jnp.float32),
                     z3, z3, z3, z3, z, z, z3, z3, i,
                     jnp.zeros((n,), bool), z3, z3, i - 1)


def black(c):
    return jnp.all(c <= 0.0, axis=-1)


# ---------------------------------------------------------------------------
# local-frame trig (reflection/mod.rs helpers)
# ---------------------------------------------------------------------------

def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0


def reflect_z(wo):
    return vec3(-wo[..., 0], -wo[..., 1], wo[..., 2])


def refract(wi, n, eta_ratio):
    """Snell refraction; returns (ok, wt). n oriented same side as wi."""
    cos_i = dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta_ratio * eta_ratio * sin2_i
    ok = sin2_t < 1.0
    # floor for reverse-mode: sin2_t depends on eta, and sqrt(0) at the
    # exact TIR boundary has an infinite tangent (lane is masked forward
    # via ok, but the cotangent forms before the mask)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    wt = eta_ratio[..., None] * (-wi) + (eta_ratio * cos_i - cos_t)[..., None] * n
    return ok, wt


# ---------------------------------------------------------------------------
# Fresnel (reflection/fresnel.rs)
# ---------------------------------------------------------------------------

def fresnel_dielectric(cos_i, eta):
    """Unpolarized dielectric Fresnel. eta = eta_t/eta_i for cos_i>0 side."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    eta_i = jnp.where(entering, 1.0, eta)
    eta_t = jnp.where(entering, eta, 1.0)
    ci = jnp.abs(cos_i)
    sin_t = eta_i / eta_t * jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = (eta_t * ci - eta_i * ct) / jnp.maximum(eta_t * ci + eta_i * ct, 1e-9)
    r_perp = (eta_i * ci - eta_t * ct) / jnp.maximum(eta_i * ci + eta_t * ct, 1e-9)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fresnel_conductor(cos_i, eta, k):
    """Conductor Fresnel per channel; eta/k [...,3] (fresnel.rs conductor)."""
    ci = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)[..., None]
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2 = eta * eta
    k2 = k * k
    t0 = eta2 - k2 - si2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * k2, 0.0))
    t1 = a2b2 + ci2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-9)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-9)
    return 0.5 * (rp + rs)


def schlick_fresnel(cos_i, rs):
    """Schlick approximation with rgb R0 (FresnelBlend)."""
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return rs + (m ** 5)[..., None] * (1.0 - rs)


# ---------------------------------------------------------------------------
# microfacet distributions (core/src/microfacet/)
# ---------------------------------------------------------------------------

def _tan2_theta(w):
    c2 = w[..., 2] * w[..., 2]
    s2 = jnp.maximum(0.0, 1.0 - c2)
    return s2 / jnp.maximum(c2, 1e-9)


def _cos2_phi(w):
    s2 = jnp.maximum(0.0, 1.0 - w[..., 2] ** 2)
    sin_t = jnp.sqrt(s2)
    cp = jnp.where(sin_t == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.maximum(sin_t, 1e-9), -1.0, 1.0))
    return cp * cp


def mf_d(dist, wh, ax, ay):
    """Distribution D(wh); dist is per-lane int (GGX/Beckmann), masked mix."""
    t2 = _tan2_theta(wh)
    c2 = wh[..., 2] ** 2
    c4 = c2 * c2
    c2p = _cos2_phi(wh)
    s2p = 1.0 - c2p
    # GGX
    e = (c2p / jnp.maximum(ax * ax, 1e-9) + s2p / jnp.maximum(ay * ay, 1e-9)) * t2
    d_ggx = 1.0 / jnp.maximum(PI * ax * ay * c4 * (1.0 + e) ** 2, 1e-12)
    # Beckmann
    d_beck = jnp.exp(-t2 * (c2p / jnp.maximum(ax * ax, 1e-9) + s2p / jnp.maximum(ay * ay, 1e-9))) \
        / jnp.maximum(PI * ax * ay * c4, 1e-12)
    d = jnp.where(dist == DIST_GGX, d_ggx, d_beck)
    return jnp.where(jnp.isinf(t2) | (c2 <= 0.0), 0.0, d)


def mf_lambda(dist, w, ax, ay):
    # sqrt floor keeps reverse-mode finite at normal incidence: sqrt(0) has
    # an infinite tangent, and the final isnan/where guard cannot scrub a
    # NaN that already formed in the cotangent (the double-where problem —
    # this poisoned the ROUGHNESS-slot gradient of every glossy material)
    abs_tan = jnp.sqrt(jnp.maximum(_tan2_theta(w), 1e-18))
    c2p = _cos2_phi(w)
    alpha = jnp.sqrt(jnp.maximum(c2p * ax * ax + (1.0 - c2p) * ay * ay, 1e-12))
    # GGX
    a2t2 = (alpha * abs_tan) ** 2
    lam_ggx = 0.5 * (-1.0 + jnp.sqrt(1.0 + a2t2))
    # Beckmann (rational approx)
    a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-9)
    lam_beck = jnp.where(a >= 1.6, 0.0,
                         (1.0 - 1.259 * a + 0.396 * a * a)
                         / jnp.maximum(3.535 * a + 2.181 * a * a, 1e-9))
    lam = jnp.where(dist == DIST_GGX, lam_ggx, lam_beck)
    return jnp.where(jnp.isinf(abs_tan) | (abs_tan == 0.0) | jnp.isnan(lam), 0.0, lam)


def mf_g(dist, wo, wi, ax, ay):
    return 1.0 / (1.0 + mf_lambda(dist, wo, ax, ay) + mf_lambda(dist, wi, ax, ay))


def mf_g1(dist, w, ax, ay):
    return 1.0 / (1.0 + mf_lambda(dist, w, ax, ay))


def mf_sample_wh(dist, wo, u, ax, ay):
    """Sample the full distribution D (sample_visible_area=false path of the
    reference; pdf = D * |cos|)."""
    # GGX anisotropic
    u0, u1 = u[..., 0], u[..., 1]
    phi_g = jnp.arctan2(ay * jnp.sin(2 * PI * u1 + 0.5 * PI),
                        ax * jnp.cos(2 * PI * u1 + 0.5 * PI))
    # fall back to isotropic phi when ax==ay for accuracy
    phi_g = jnp.where(jnp.abs(ax - ay) < 1e-7, 2 * PI * u1, phi_g)
    c2p = jnp.cos(phi_g) ** 2
    alpha2 = 1.0 / jnp.maximum(c2p / jnp.maximum(ax * ax, 1e-12)
                               + (1.0 - c2p) / jnp.maximum(ay * ay, 1e-12), 1e-12)
    tan2_g = alpha2 * u0 / jnp.maximum(1.0 - u0, 1e-9)
    cos_g = 1.0 / jnp.sqrt(1.0 + tan2_g)
    # Beckmann
    log_s = jnp.log(jnp.maximum(1.0 - u0, 1e-38))
    tan2_b = -alpha2 * log_s
    cos_b = 1.0 / jnp.sqrt(1.0 + tan2_b)
    cos_h = jnp.where(dist == DIST_GGX, cos_g, cos_b)
    # sqrt floor: at u0=0 cos_h is exactly 1 and sqrt(0)'s infinite tangent
    # poisons the roughness gradient (cos_h depends on alpha); the 1e-18
    # floor perturbs wh by ~1e-9 and keeps reverse-mode finite
    sin_h = jnp.sqrt(jnp.maximum(1e-18, 1.0 - cos_h * cos_h))
    wh = vec3(sin_h * jnp.cos(phi_g), sin_h * jnp.sin(phi_g), cos_h)
    wh = jnp.where(same_hemisphere(wo, wh)[..., None], wh, -wh)
    return wh


def mf_pdf(dist, wo, wh, ax, ay):
    return mf_d(dist, wh, ax, ay) * abs_cos_theta(wh)


def roughness_to_alpha(rough):
    """pbrt's RoughnessToAlpha remap (microfacet common)."""
    x = jnp.log(jnp.maximum(rough, 1e-3))
    return 1.62142 + 0.819955 * x + 0.1734 * x * x + 0.0171201 * x ** 3 + 0.000640711 * x ** 4


# ---------------------------------------------------------------------------
# lobe evaluation
# ---------------------------------------------------------------------------

def _oren_nayar_f(kd, sigma, wo, wi):
    s2 = sigma * sigma
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    sin_to = jnp.sqrt(jnp.maximum(0.0, 1.0 - wo[..., 2] ** 2))
    sin_ti = jnp.sqrt(jnp.maximum(0.0, 1.0 - wi[..., 2] ** 2))
    # max(0, cos(phi_i - phi_o))
    denom_i = jnp.maximum(sin_ti, 1e-9)
    denom_o = jnp.maximum(sin_to, 1e-9)
    cos_dphi = (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]) / (denom_i * denom_o)
    max_cos = jnp.where((sin_ti > 1e-4) & (sin_to > 1e-4), jnp.maximum(0.0, cos_dphi), 0.0)
    big = abs_cos_theta(wi) > abs_cos_theta(wo)
    sin_alpha = jnp.where(big, sin_to, sin_ti)
    tan_beta = jnp.where(big, sin_ti / jnp.maximum(abs_cos_theta(wi), 1e-9),
                         sin_to / jnp.maximum(abs_cos_theta(wo), 1e-9))
    return kd * (INV_PI * (a + b * max_cos * sin_alpha * tan_beta))[..., None]


def _glossy_f(lb: Lobes, wo, wi):
    """Masked microfacet reflection (torrance-sparrow)."""
    co = abs_cos_theta(wo)
    ci = abs_cos_theta(wi)
    wh = wi + wo
    wh_ok = vm.length_squared(wh) > 1e-12
    wh = normalize(jnp.where(wh_ok[..., None], wh, jnp.array([0.0, 0, 1.0])))
    d = mf_d(lb.dist, wh, lb.rough_u, lb.rough_v)
    g = mf_g(lb.dist, wo, wi, lb.rough_u, lb.rough_v)
    cos_wh = dot(wi, wh)
    f_diel = fresnel_dielectric(cos_wh, lb.eta)[..., None] * jnp.ones((1, lb.ks.shape[-1]))
    f_cond = fresnel_conductor(cos_wh, lb.eta3, lb.k3)
    F = jnp.where((lb.glossy_kind == GF_CONDUCTOR)[..., None], f_cond, f_diel)
    spec = lb.ks * F * (d * g / jnp.maximum(4.0 * co * ci, 1e-9))[..., None]
    # FresnelBlend (Ashikhmin-Shirley, substrate): ks=Rs, rd_blend=Rd
    pow5 = lambda x: (1.0 - x) ** 5
    diff_ab = (28.0 / (23.0 * PI)) * lb.rd_blend * (1.0 - lb.ks) \
        * (1.0 - pow5(0.5 * ci))[..., None] * (1.0 - pow5(0.5 * co))[..., None]
    schlick = schlick_fresnel(dot(wi, wh), lb.ks)
    spec_ab = (d / jnp.maximum(4.0 * jnp.abs(cos_wh) * jnp.maximum(ci, co), 1e-9))[..., None] * schlick
    blend = diff_ab + spec_ab
    f = jnp.where((lb.glossy_kind == GF_BLEND)[..., None], blend, spec)
    ok = same_hemisphere(wo, wi) & (co > 0) & (ci > 0) & wh_ok
    return jnp.where(ok[..., None], f, 0.0)


def _glossy_t_f(lb: Lobes, wo, wi):
    """Microfacet transmission (rough glass); reflection/mod.rs
    MicrofacetTransmission::f."""
    co = cos_theta(wo)
    ci = cos_theta(wi)
    ok = (~same_hemisphere(wo, wi)) & (jnp.abs(co) > 1e-7) & (jnp.abs(ci) > 1e-7)
    eta = jnp.where(co > 0.0, lb.eta, 1.0 / jnp.maximum(lb.eta, 1e-9))
    wh = normalize(wo + wi * eta[..., None])
    wh = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    same_side = (dot(wo, wh) * dot(wi, wh)) > 0.0
    ok = ok & ~same_side
    d = mf_d(lb.dist, wh, lb.rough_tu, lb.rough_tv)
    g = mf_g(lb.dist, wo, wi, lb.rough_tu, lb.rough_tv)
    F = fresnel_dielectric(dot(wo, wh), lb.eta)
    denom = dot(wo, wh) + eta * dot(wi, wh)
    denom2 = jnp.maximum(denom * denom, 1e-12)
    # radiance transport: factor 1/eta^2
    val = lb.kt_gloss * ((1.0 - F) * d * g
                         * jnp.abs(dot(wi, wh)) * jnp.abs(dot(wo, wh))
                         / jnp.maximum(jnp.abs(ci) * jnp.abs(co) * denom2, 1e-12)
                         / (eta * eta))[..., None]
    return jnp.where(ok[..., None], val, 0.0)


ALL_FAMS = (True, True, True, True, True)
# fams = (dift, glossy, glossy_t, oren, spec): STATIC per-scene family
# presence (materials/__init__.py material_families) — an absent family's
# arithmetic is skipped entirely, the wavefront analog of the reference
# only pushing matching BxDFs into a surface's BSDF


def bsdf_f(lb: Lobes, wo, wi, ftab=None, fams=None):
    """Total non-specular f (specular lobes are delta — excluded, like the
    reference's BSDF::f which skips them implicitly via matching flags).
    ftab: FourierTable when the scene has fourier materials."""
    dift, glossy, glossy_t, oren, _spec = fams or ALL_FAMS
    refl = same_hemisphere(wo, wi)
    # diffuse reflection
    lam = lb.kd * INV_PI
    if oren:
        on = _oren_nayar_f(lb.kd, lb.sigma, wo, wi)
        dif = jnp.where((lb.sigma > 1e-5)[..., None], on, lam)
    else:
        dif = lam
    f = jnp.where(refl[..., None], dif, 0.0)
    # diffuse transmission
    if dift:
        f = f + jnp.where((~refl)[..., None], lb.kt_diff * INV_PI, 0.0)
    # glossy
    if glossy:
        has_gloss = ~black(lb.ks) | ~black(lb.rd_blend)
        f = f + jnp.where(has_gloss[..., None], _glossy_f(lb, wo, wi), 0.0)
    if glossy_t:
        has_gt = ~black(lb.kt_gloss)
        f = f + jnp.where(has_gt[..., None], _glossy_t_f(lb, wo, wi), 0.0)
    if ftab is not None:
        from pbrt_tpu.materials.fourier import eval_fourier
        f = f + eval_fourier(ftab, lb.fourier_id, wo, wi)
    return f


def _lobe_weights(lb: Lobes):
    """Per-lane sampling weights for (diffuse, diffuse_t, glossy, glossy_t,
    specular) lobes — uniform over present lobes like the reference's
    matching-component count (bsdf.rs sample_f)."""
    present = jnp.stack([
        ~black(lb.kd) | ~black(lb.kt_diff) | (lb.fourier_id >= 0),
        jnp.zeros_like(black(lb.kd)),  # diffuse_t folded into diffuse slot
        ~black(lb.ks) | ~black(lb.rd_blend),
        ~black(lb.kt_gloss),
        ~black(lb.spec_r) | ~black(lb.spec_t),
    ], axis=-1)
    w = present.astype(jnp.float32)
    total = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    return w / total, present


def bsdf_pdf(lb: Lobes, wo, wi, ftab=None, fams=None):
    """pdf of non-specular sampling strategies (mixture)."""
    dift, glossy, glossy_t, _oren, _spec = fams or ALL_FAMS
    w, present = _lobe_weights(lb)
    refl = same_hemisphere(wo, wi)
    # diffuse lobe samples cosine hemisphere on wo's side (or transmission side)
    pd_refl = abs_cos_theta(wi) * INV_PI
    if dift:
        # translucent: half/half reflect-transmit within the diffuse slot
        has_kt = ~black(lb.kt_diff)
        p_dif = jnp.where(has_kt, 0.5 * pd_refl, jnp.where(refl, pd_refl, 0.0))
    else:
        p_dif = jnp.where(refl, pd_refl, 0.0)
    if ftab is not None:
        # fourier lanes replace the diffuse slot's cosine density with the
        # CDF sampler's exact density (fourier_bsdf.rs:124,173)
        from pbrt_tpu.materials.fourier import pdf_fourier
        four = lb.fourier_id >= 0
        p_dif = jnp.where(four, pdf_fourier(ftab, lb.fourier_id, wo, wi),
                          p_dif)
    pdf = w[..., 0] * p_dif
    if glossy:
        wh = normalize(jnp.where((vm.length_squared(wo + wi) > 1e-12)[..., None],
                                 wo + wi, jnp.array([0.0, 0, 1.0])))
        p_gl = mf_pdf(lb.dist, wo, wh, lb.rough_u, lb.rough_v) \
            / jnp.maximum(4.0 * jnp.abs(dot(wo, wh)), 1e-9)
        pdf = pdf + w[..., 2] * jnp.where(refl, p_gl, 0.0)
    if glossy_t:
        eta = jnp.where(cos_theta(wo) > 0.0, lb.eta, 1.0 / jnp.maximum(lb.eta, 1e-9))
        wht = normalize(wo + wi * eta[..., None])
        # the sampler can only produce wi whose half-vector separates wo/wi
        # (MicrofacetTransmission::pdf same-side rejection,
        # core/src/reflection/mod.rs); without this the mixture pdf gains
        # phantom density on transmitted directions and biases co-present
        # transmission lobes down ~7%
        sep = (dot(wo, wht) * dot(wi, wht)) <= 0.0
        dwh_dwi = jnp.abs((eta * eta * dot(wi, wht))
                          / jnp.maximum((dot(wo, wht) + eta * dot(wi, wht)) ** 2, 1e-12))
        p_gt = mf_pdf(lb.dist, wo, wht, lb.rough_tu, lb.rough_tv) * dwh_dwi
        pdf = pdf + w[..., 3] * jnp.where((~refl) & sep, p_gt, 0.0)
    return pdf


class BsdfSample(NamedTuple):
    wi: jnp.ndarray        # [N,3] local
    f: jnp.ndarray         # [N,3]
    pdf: jnp.ndarray       # [N]
    is_specular: jnp.ndarray   # [N] bool
    is_transmission: jnp.ndarray  # [N] bool
    eta_scale: jnp.ndarray     # [N] radiance scale factor eta^2 tracking


def bsdf_sample(lb: Lobes, wo, u_lobe, u2, ftab=None, fams=None):
    """Sample one lobe; mirrors BSDF::sample_f (bsdf.rs).

    u_lobe: [N] selects the lobe; u2: [N,2] directional sample.
    """
    n = wo.shape[0]
    F_dift, F_glossy, F_glossy_t, _F_oren, F_spec = fams or ALL_FAMS
    w, present = _lobe_weights(lb)
    cdf = jnp.cumsum(w, axis=-1)
    sel = jnp.sum((cdf <= u_lobe[..., None]).astype(jnp.int32), -1)  # 0..4
    sel = jnp.clip(sel, 0, 4)
    # remap u_lobe within the chosen slot for reuse
    lo = jnp.take_along_axis(jnp.concatenate([jnp.zeros((n, 1)), cdf], -1), sel[:, None], -1)[:, 0]
    wsel = jnp.take_along_axis(w, sel[:, None], -1)[:, 0]
    u_re = jnp.clip((u_lobe - lo) / jnp.maximum(wsel, 1e-9), 0.0, vm.ONE_MINUS_EPSILON)

    # --- diffuse: cosine hemisphere (with translucent two-sidedness) ---
    wi_d = cosine_sample_hemisphere(u2)
    wi_d = jnp.where((cos_theta(wo) < 0.0)[..., None], -wi_d, wi_d)
    if F_dift:
        has_kt = ~black(lb.kt_diff)
        go_trans = has_kt & (u_re < 0.5)
        wi_d = jnp.where(go_trans[..., None],
                         vec3(wi_d[..., 0], wi_d[..., 1], -wi_d[..., 2]), wi_d)
    else:
        go_trans = jnp.zeros(n, bool)
    if ftab is not None:
        # fourier lanes ride the diffuse slot but draw wi from the table's
        # CDF sampler (marginal-mu inversion + series-CDF azimuth); u_re is
        # the slot-remapped uniform, reused as the azimuth sign flip
        from pbrt_tpu.materials.fourier import sample_fourier_bsdf
        four_l = lb.fourier_id >= 0
        wi_four, _ = sample_fourier_bsdf(ftab, lb.fourier_id, wo, u2, u_re)
        wi_d = jnp.where(four_l[..., None], wi_four, wi_d)
    else:
        four_l = jnp.zeros(n, bool)

    wo_up = jnp.where((cos_theta(wo) < 0.0)[..., None], -wo, wo)
    cos_o = cos_theta(wo)
    eta_t = jnp.where(cos_o > 0.0, 1.0 / jnp.maximum(lb.eta, 1e-9), lb.eta)

    # --- glossy reflection: sample wh, reflect ---
    if F_glossy:
        wh = mf_sample_wh(lb.dist, wo_up, u2, lb.rough_u, lb.rough_v)
        wh = jnp.where((cos_theta(wo) < 0.0)[..., None], -wh, wh)
        wi_g = 2.0 * dot(wo, wh)[..., None] * wh - wo
    else:
        wh = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wo.shape)
        wi_g = wi_d

    # --- glossy transmission ---
    if F_glossy_t:
        wht = mf_sample_wh(lb.dist, wo_up, u2, lb.rough_tu, lb.rough_tv)
        wht = jnp.where((cos_theta(wo) < 0.0)[..., None], -wht, wht)
        ok_t, wi_t = refract(wo, jnp.where((dot(wo, wht) < 0)[..., None],
                                           -wht, wht), eta_t)
    else:
        ok_t, wi_t = jnp.ones(n, bool), wi_d

    # --- specular: coupled Fresnel R/T ---
    if F_spec:
        Fr = fresnel_dielectric(cos_o, lb.eta)
        has_sr = ~black(lb.spec_r)
        has_st = ~black(lb.spec_t)
        both = has_sr & has_st
        pr = jnp.where(both, Fr, jnp.where(has_sr, 1.0, 0.0))
        choose_r = u_re < pr
        wi_sr = reflect_z(wo)
        nz = vec3(jnp.zeros(n), jnp.zeros(n), jnp.where(cos_o > 0, 1.0, -1.0))
        ok_st, wi_st = refract(wo, nz, eta_t)
        f_cond = fresnel_conductor(cos_o, lb.eta3, lb.k3)
        f_diel3 = Fr[..., None] * jnp.ones((1, lb.spec_r.shape[-1]))
        Fspec = jnp.where((lb.spec_fresnel == SF_CONDUCTOR)[..., None], f_cond,
                          jnp.where((lb.spec_fresnel == SF_NOOP)[..., None], 1.0, f_diel3))
        wi_s = jnp.where(choose_r[..., None], wi_sr, wi_st)
        aci_s = jnp.maximum(abs_cos_theta(wi_s), 1e-9)
        f_sr = lb.spec_r * Fspec / aci_s[..., None]
        # transmission: (1-F) * T / |cos|; radiance transport scales by
        # (eta_i/eta_t)^2 — eta_t here IS the ratio eta_i/eta_t passed to refract
        f_st = lb.spec_t * ((1.0 - Fr) * eta_t * eta_t)[..., None] / aci_s[..., None]
        f_s = jnp.where(choose_r[..., None], f_sr, f_st)
        pdf_s = jnp.where(both, jnp.where(choose_r, pr, 1.0 - pr), 1.0)
        spec_valid = jnp.where(choose_r, jnp.ones_like(ok_st), ok_st)
    else:
        choose_r = jnp.zeros(n, bool)
        has_st = jnp.zeros(n, bool)
        wi_s = wi_d
        f_s = jnp.zeros_like(lb.spec_r)
        pdf_s = jnp.ones(n, jnp.float32)
        spec_valid = jnp.ones(n, bool)

    # --- select by lobe ---
    is_spec = sel == 4
    is_gloss = sel == 2
    is_gt = sel == 3
    is_dif = sel <= 1
    wi = jnp.where(is_spec[..., None], wi_s,
                   jnp.where(is_gloss[..., None], wi_g,
                             jnp.where(is_gt[..., None], wi_t, wi_d)))
    # evaluate non-specular mixture f and pdf at the sampled wi
    f_ns = bsdf_f(lb, wo, wi, ftab, fams=fams)
    pdf_ns = bsdf_pdf(lb, wo, wi, ftab, fams=fams)
    f = jnp.where(is_spec[..., None], f_s, f_ns)
    pdf = jnp.where(is_spec, pdf_s * w[..., 4], pdf_ns)
    valid = jnp.where(is_spec, spec_valid,
                      jnp.where(is_gloss, same_hemisphere(wo, wi_g) & (dot(wo, wh) > 0),
                                jnp.where(is_gt, ok_t & ~same_hemisphere(wo, wi_t),
                                          jnp.ones(n, bool))))
    pdf = jnp.where(valid, pdf, 0.0)
    is_trans = jnp.where(is_spec, ~choose_r & has_st,
                         is_gt | (is_dif & go_trans)
                         | (is_dif & four_l & ~same_hemisphere(wo, wi)))
    # eta^2 factor that cancels the transport scaling at RR time
    # (path.rs:264-276 eta_scale): entering *= eta^2, exiting *= 1/eta^2
    eta_rr = jnp.where(cos_o > 0,
                       lb.eta * lb.eta, 1.0 / jnp.maximum(lb.eta * lb.eta, 1e-9))
    eta_scale = jnp.where(is_trans & (is_spec | is_gt), eta_rr, jnp.ones(n))
    return BsdfSample(wi, f, pdf, is_spec, is_trans, eta_scale)
