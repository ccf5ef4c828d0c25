"""Material tables: .pbrt materials -> device lobe blocks.

Reference: materials/src/{matte,plastic,glass,mirror,metal,substrate,
translucent,uber,fourier,mix,subsurface,kdsubsurface}.rs, each implementing
Material::compute_scattering_functions (core/src/material.rs:34).

TPU re-design: a material is a ROW in a table (kind + texture-slot refs +
constant fallbacks). `compute_lobes` maps a wavefront of hit material ids to
the branch-free `Lobes` block of materials/bsdf.py: texture slots are
evaluated for the whole wavefront (host skips slots no material textures),
then each material kind writes its lobe params under a mask.

Slot semantics (mat_tex/mat_const index):
  0 Kd (metal: eta rgb)   1 Ks (metal: k rgb)   2 Kr   3 Kt
  4 roughness             5 uroughness          6 vroughness
  7 opacity               8 sigma (matte) / amount (mix)
  9 bumpmap
mat_misc: [eta, remap_flag, dist_kind, two_sided?, ...]
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.materials import bsdf as B
from pbrt_tpu.textures import eval_texture, TextureTable

(M_MATTE, M_PLASTIC, M_GLASS, M_MIRROR, M_METAL, M_SUBSTRATE, M_TRANSLUCENT,
 M_UBER, M_FOURIER, M_MIX, M_SUBSURFACE, M_KDSUBSURFACE, M_NONE) = range(13)

KIND_IDS = {"matte": M_MATTE, "plastic": M_PLASTIC, "glass": M_GLASS,
            "mirror": M_MIRROR, "metal": M_METAL, "substrate": M_SUBSTRATE,
            "translucent": M_TRANSLUCENT, "uber": M_UBER, "fourier": M_FOURIER,
            "mix": M_MIX, "subsurface": M_SUBSURFACE,
            "kdsubsurface": M_KDSUBSURFACE, "none": M_NONE, "": M_NONE}

N_SLOTS = 10

# copper eta/k RGB (reference metal.rs defaults use the sampled Cu curves;
# these are those curves integrated against CIE -> sRGB)
COPPER_ETA = np.array([0.2004, 0.9240, 1.1022], np.float32)
COPPER_K = np.array([3.9129, 2.4528, 2.1421], np.float32)


class MaterialTable(NamedTuple):
    kind: jnp.ndarray       # [M]
    tex: jnp.ndarray        # [M, N_SLOTS]
    const: jnp.ndarray      # [M, N_SLOTS, 3]
    misc: jnp.ndarray       # [M, 8]
    child: jnp.ndarray      # [M, 2] mix children
    sss: jnp.ndarray        # [M, 7] (flag, sigma_t rgb, albedo rho rgb)
    # tabulated beam-diffusion profile rows, collapsed to the material's
    # per-channel albedo at build (tabulated_bssrdf.rs BSSRDFTable; see
    # materials/bssrdf.py dense_channel_rows)
    sss_prof: jnp.ndarray   # [M, 3, 64]
    sss_cdf: jnp.ndarray    # [M, 3, 64]
    sss_rhoeff: jnp.ndarray  # [M, 3]


def compile_materials(decls, tex_name_to_id=None, cwd="."):
    """Host: list[MaterialDecl] -> (MaterialTable, has_tex_slot, fourier
    tables list for build_fourier_table)."""
    M = len(decls)
    kind = np.zeros(M, np.int32)
    tex = np.full((M, N_SLOTS), -1, np.int32)
    const = np.zeros((M, N_SLOTS, 3), np.float32)
    misc = np.zeros((M, 8), np.float32)
    child = np.full((M, 2), -1, np.int32)
    sss = np.zeros((M, 7), np.float32)
    sss_prof = np.zeros((M, 3, 64), np.float32)
    sss_cdf = np.zeros((M, 3, 64), np.float32)
    sss_rhoeff = np.zeros((M, 3), np.float32)
    fourier_tables = []

    slot_names = ["Kd", "Ks", "Kr", "Kt", "roughness", "uroughness",
                  "vroughness", "opacity", "sigma", "bumpmap"]

    for i, d in enumerate(decls):
        k = KIND_IDS.get(d.kind, M_MATTE)
        # BSSRDF materials: glass-like boundary lobes (subsurface.rs builds
        # the same smooth/rough dielectric interface) + normalized-diffusion
        # transport parameters consumed by the path integrator (bssrdf.py)
        if k in (M_SUBSURFACE, M_KDSUBSURFACE):
            k_eff = M_GLASS
        elif k == M_FOURIER:
            k_eff = M_FOURIER  # table id resolved below; matte on read failure
        else:
            k_eff = k
        kind[i] = k_eff
        ps = d.params
        defaults = {
            M_MATTE: {"Kd": 0.5, "sigma": 0.0},
            # opacity slot must default to 1: plastic has no opacity param
            # in pbrt (only uber does) but compute_lobes scales Kd/Ks by the
            # slot for both kinds — a 0 default renders plastic black
            M_PLASTIC: {"Kd": 0.25, "Ks": 0.25, "roughness": 0.1,
                        "opacity": 1.0},
            M_GLASS: {"Kr": 1.0, "Kt": 1.0, "roughness": 0.0},
            M_MIRROR: {"Kr": 0.9},
            M_METAL: {"roughness": 0.01},
            M_SUBSTRATE: {"Kd": 0.5, "Ks": 0.5, "roughness": 0.1},
            M_TRANSLUCENT: {"Kd": 0.25, "Ks": 0.25, "roughness": 0.1,
                            "reflect": 0.5, "transmit": 0.5},
            M_UBER: {"Kd": 0.25, "Ks": 0.25, "Kr": 0.0, "Kt": 0.0,
                     "roughness": 0.1, "opacity": 1.0},
            M_NONE: {},
            M_MIX: {"amount": 0.5},
        }.get(k_eff, {})
        for s, name in enumerate(slot_names):
            dv = defaults.get(name)
            if name in d.tex_refs:
                tex[i, s] = d.tex_refs[name]
            elif name in ps:
                const[i, s] = ps.find_one_rgb(name, [0, 0, 0])
            elif dv is not None:
                const[i, s] = dv
            elif name == "roughness" and "uroughness" not in ps:
                const[i, s] = 0.0
        # rough default for u/v: fall back to roughness slot at eval time
        misc[i, 0] = ps.find_one_float("eta", ps.find_one_float("index", {
            M_GLASS: 1.5, M_PLASTIC: 1.5, M_TRANSLUCENT: 1.5,
            M_SUBSTRATE: 1.5, M_UBER: 1.5}.get(k_eff, 1.5)))
        misc[i, 1] = 1.0 if ps.find_one_bool("remaproughness", True) else 0.0
        if k_eff == M_METAL:
            const[i, 0] = ps.find_one_rgb("eta", COPPER_ETA)
            const[i, 1] = ps.find_one_rgb("k", COPPER_K)
        if k == M_MIX:
            child[i] = d.children
            const[i, 8] = ps.find_one_rgb("amount", [0.5, 0.5, 0.5])
            kind[i] = M_MIX
        if k_eff == M_TRANSLUCENT:
            # pack reflect/transmit into misc
            misc[i, 2:5] = ps.find_one_rgb("reflect", [0.5] * 3)
            misc[i, 5:8] = ps.find_one_rgb("transmit", [0.5] * 3)
        if k == M_FOURIER:
            import os
            from pbrt_tpu.materials.fourier import read_bsdf_file
            fname = ps.find_one_string("bsdffile", "")
            path = fname if os.path.isabs(fname) else os.path.join(cwd, fname)
            try:
                t = read_bsdf_file(path)
                misc[i, 2] = float(len(fourier_tables))
                misc[i, 0] = t["eta"]
                fourier_tables.append(t)
            except Exception:
                kind[i] = M_MATTE  # unreadable table -> matte fallback
                const[i, 0] = 0.5
        if k in (M_SUBSURFACE, M_KDSUBSURFACE):
            from pbrt_tpu.materials import bssrdf as SSS
            const[i, 2] = ps.find_one_rgb("Kr", [1, 1, 1])
            const[i, 3] = ps.find_one_rgb("Kt", [1, 1, 1])
            misc[i, 0] = ps.find_one_float("eta", 1.33)
            scale = ps.find_one_float("scale", 1.0)
            if k == M_SUBSURFACE:
                sa = np.asarray(ps.find_one_rgb("sigma_a", [0.0011, 0.0024, 0.014]), np.float32)
                sp = np.asarray(ps.find_one_rgb("sigma_prime_s",
                                ps.find_one_rgb("sigma_s", [2.55, 3.21, 3.77])), np.float32)
                name = ps.find_one_string("name", "")
                if name:
                    got = SSS.get_medium_scattering_properties(name)
                    if got is not None:
                        sa, sp = got
                st = (sa + sp) * scale
                rho = np.where(st > 0, sp * scale / np.maximum(st, 1e-12), 0.0)
            else:  # kdsubsurface.rs: Kd + mean free path
                kd_r = np.clip(np.asarray(ps.find_one_rgb("Kd", [0.5] * 3),
                                          np.float32), 0, 1)
                mfp = ps.find_one_float("mfp", 1.0)
                # subsurface_from_diffuse (tabulated_bssrdf.rs:543): albedo
                # whose beam-diffusion EFFECTIVE albedo equals Kd
                rho = SSS.invert_rho_eff(kd_r).astype(np.float32)
                st = np.full(3, 1.0 / max(mfp * scale, 1e-6), np.float32)
            sss[i, 0] = 1.0
            sss[i, 1:4] = np.maximum(st, 1e-6)
            sss[i, 4:7] = rho
            g_hg = ps.find_one_float("g", 0.0)
            prow, crow, reff = SSS.dense_channel_rows(
                sss[i, 1:4], rho, g=float(g_hg), eta=float(misc[i, 0] or 1.33))
            sss_prof[i] = prow
            sss_cdf[i] = crow
            sss_rhoeff[i] = reff

    has_tex_slot = tuple(bool((tex[:, s] >= 0).any()) for s in range(N_SLOTS))
    # host-side flag: device readback would poison dispatch latency
    has_subsurface = bool((sss[:, 0] > 0).any())
    return MaterialTable(jnp.asarray(kind), jnp.asarray(tex), jnp.asarray(const),
                         jnp.asarray(misc), jnp.asarray(child),
                         jnp.asarray(sss), jnp.asarray(sss_prof),
                         jnp.asarray(sss_cdf),
                         jnp.asarray(sss_rhoeff)), has_tex_slot, fourier_tables, \
        has_subsurface


def _remap(rough, do_remap):
    a = jnp.where(do_remap, B.roughness_to_alpha(rough), rough)
    return jnp.maximum(a, 1e-3)


def compute_lobes(mats: MaterialTable, tex: TextureTable, mat_id, uv, p,
                  u_mix, has_tex_slot=None, duv=None,
                  tex_kinds=None) -> B.Lobes:
    """Wavefront material stage: ids -> Lobes. u_mix: [N] random for the
    stochastic mix-material selection (one-sample MC estimator of the
    reference's lobe-scaled mix, materials/src/mix.rs)."""
    from pbrt_tpu.core.math import gather_rows
    n = mat_id.shape[0]
    mat_id = jnp.maximum(mat_id, 0)
    # resolve mix materials (2 levels). All table rows ride one-hot matmul
    # row-gathers (core/math.py gather_rows): per-scalar XLA gathers from
    # these 4-to-64-row tables cost ~700us each at 64K lanes in-context.
    for _ in range(2):
        kindv = gather_rows(mats.kind, mat_id)
        is_mix = kindv == M_MIX
        amt = gather_rows(mats.const, mat_id)[:, 8, 0]
        pick1 = u_mix < amt
        childv = gather_rows(mats.child, mat_id)
        chosen = jnp.where(pick1, childv[:, 0], childv[:, 1])
        mat_id = jnp.where(is_mix & (chosen >= 0), chosen, mat_id)

    kindv = gather_rows(mats.kind, mat_id)
    misc = gather_rows(mats.misc, mat_id)
    texv = gather_rows(mats.tex, mat_id)        # [N, N_SLOTS]
    constv = gather_rows(mats.const, mat_id)    # [N, N_SLOTS+, 3]

    def slot(s):
        cid = texv[:, s]
        cv = constv[:, s]
        if has_tex_slot is not None and not has_tex_slot[s]:
            return cv
        tv = eval_texture(tex, cid, uv, p, duv=duv, kinds=tex_kinds)
        return jnp.where((cid >= 0)[:, None], tv, cv)

    Kd = slot(0)
    Ks = slot(1)
    Kr = slot(2)
    Kt = slot(3)
    rough = slot(4)[:, 0]
    urough_raw = slot(5)[:, 0]
    vrough_raw = slot(6)[:, 0]
    opacity = slot(7)
    sigma = slot(8)[:, 0]
    urough = jnp.where(urough_raw > 0.0, urough_raw, rough)
    vrough = jnp.where(vrough_raw > 0.0, vrough_raw, rough)
    do_remap = misc[:, 1] > 0.5
    au = _remap(urough, do_remap)
    av = _remap(vrough, do_remap)
    eta = misc[:, 0]

    lb = B.Lobes.zeros(n)
    z3 = jnp.zeros((n, 3), jnp.float32)
    onev = jnp.ones((n,), jnp.float32)

    def m3(cond, a, b):
        return jnp.where(cond[:, None], a, b)

    is_matte = kindv == M_MATTE
    is_plastic = kindv == M_PLASTIC
    is_glass = kindv == M_GLASS
    is_mirror = kindv == M_MIRROR
    is_metal = kindv == M_METAL
    is_substrate = kindv == M_SUBSTRATE
    is_transl = kindv == M_TRANSLUCENT
    is_uber = kindv == M_UBER

    glass_smooth = is_glass & (urough <= 1e-6) & (vrough <= 1e-6)
    glass_rough = is_glass & ~glass_smooth

    kd = m3(is_matte, Kd, z3)
    kd = kd + m3(is_plastic | is_uber, Kd * opacity, z3)
    kd = kd + m3(is_transl, Kd * misc[:, 2:5], z3)
    kt_diff = m3(is_transl, Kd * misc[:, 5:8], z3)

    ks = m3(is_plastic | is_uber, Ks * opacity, z3)
    ks = ks + m3(is_metal, jnp.ones((n, 3)), z3)
    ks = ks + m3(is_substrate, Ks, z3)
    ks = ks + m3(glass_rough, Kr, z3)
    ks = ks + m3(is_transl, Ks * misc[:, 2:5], z3)
    kt_gloss = m3(glass_rough, Kt, z3) + m3(is_transl, Ks * misc[:, 5:8], z3)

    glossy_kind = jnp.where(is_metal, B.GF_CONDUCTOR,
                            jnp.where(is_substrate, B.GF_BLEND, B.GF_DIELECTRIC)).astype(jnp.int32)
    rd_blend = m3(is_substrate, Kd, z3)

    spec_r = m3(glass_smooth, Kr, z3)
    spec_r = spec_r + m3(is_mirror, Kr, z3)
    spec_r = spec_r + m3(is_uber, Kr * opacity, z3)
    spec_t = m3(glass_smooth, Kt, z3)
    spec_t = spec_t + m3(is_uber, Kt * opacity + (1.0 - opacity), z3)
    spec_fresnel = jnp.where(is_mirror, B.SF_NOOP, B.SF_DIELECTRIC).astype(jnp.int32)
    # uber's (1-opacity) passthrough uses eta=1 -> handled by fresnel noop if
    # only passthrough; keep dielectric otherwise (approximation noted)

    from pbrt_tpu.materials.bssrdf import burley_d
    sssr = gather_rows(mats.sss, mat_id)
    sss_rho = sssr[:, 4:7]
    sss_d = burley_d(sss_rho, sssr[:, 1:4])
    return B.Lobes(
        kd=kd, sigma=jnp.where(is_matte, jnp.radians(sigma), 0.0),
        kt_diff=kt_diff, ks=ks, rough_u=au, rough_v=av,
        glossy_kind=glossy_kind,
        dist=jnp.full((n,), B.DIST_GGX, jnp.int32),
        eta=jnp.where(eta > 0, eta, 1.5),
        eta3=m3(is_metal, constv[:, 0], jnp.ones((n, 3))),
        k3=m3(is_metal, constv[:, 1], z3),
        rd_blend=rd_blend, kt_gloss=kt_gloss, rough_tu=au, rough_tv=av,
        spec_r=spec_r, spec_t=spec_t, spec_fresnel=spec_fresnel,
        sss_flag=sssr[:, 0] > 0.5, sss_d=sss_d, sss_rho=sss_rho,
        fourier_id=jnp.where(kindv == M_FOURIER,
                             misc[:, 2].astype(jnp.int32), -1))


LIFT_FIELDS = ("kd", "kt_diff", "ks", "rd_blend", "kt_gloss",
               "spec_r", "spec_t", "eta3", "k3")


def lift_lobes(lb):
    """RGB Lobes -> sampled-spectrum Lobes ([N,3] color fields widened to
    [N,60] via the Smits-style lift, core/spectrum.py). Conductor eta/k are
    lifted with the same smooth-metamer basis — the reference reads true
    sampled Cu curves (metal.rs); here the lifted curves are the smooth
    spectra whose CIE-integrated RGB matches the same data (documented
    approximation). BSSRDF fields stay 3-channel (spectral+sss is gated
    off at build)."""
    from pbrt_tpu.core.spectrum import rgb_to_spectrum
    return lb._replace(**{f: rgb_to_spectrum(getattr(lb, f),
                                             reflectance=True)
                          for f in LIFT_FIELDS})


def material_families(decls):
    """Static lobe-family presence for the scene's material set
    -> (dift, glossy, glossy_t, oren, spec).

    bsdf_f/pdf/sample skip an entire family's arithmetic when no material
    in the scene can populate it (the wavefront analog of the reference
    only pushing matching BxDFs into a surface's BSDF). Conservative: a
    textured or nonzero parameter keeps the family on.
    """
    dift = glossy = glossy_t = oren = spec = False
    for d in decls:
        k = d.kind
        ps = d.params

        def has(name, default=0.0):
            vals = ps.as_plain_dict().get(name)
            if vals is None:
                return default != 0.0
            if isinstance(vals[0], str):
                return True          # textured
            return any(abs(float(v)) > 1e-9 for v in vals)

        if k == "matte":
            oren |= has("sigma")
        elif k in ("plastic", "metal", "substrate"):
            glossy = True
        elif k == "glass":
            spec = True
            if has("roughness") or has("uroughness") or has("vroughness"):
                glossy = glossy_t = True
        elif k == "mirror":
            spec = True
        elif k == "translucent":
            dift = glossy = glossy_t = True
        elif k == "uber":
            glossy = spec = True
            oren |= has("sigma")
        elif k in ("subsurface", "kdsubsurface"):
            spec = True
            if has("roughness") or has("uroughness"):
                glossy = glossy_t = True
        elif k in ("fourier", "mix"):
            pass                     # fourier gated by ftab; mix children
                                     # appear as their own decls
        else:
            dift = glossy = glossy_t = oren = spec = True
    return (dift, glossy, glossy_t, oren, spec)
