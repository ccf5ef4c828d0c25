"""Surface interaction wavefront record.

Reference: core/src/interaction/surface_interaction.rs. One NamedTuple of
[N]-leading arrays for the whole wavefront; `valid` masks misses.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import normalize, cross, dot


class SurfaceInteraction(NamedTuple):
    valid: jnp.ndarray    # [N] bool — hit anything
    t: jnp.ndarray        # [N] hit distance
    p: jnp.ndarray        # [N,3]
    p_err: jnp.ndarray    # [N,3]
    wo: jnp.ndarray       # [N,3]
    ng: jnp.ndarray       # [N,3] geometric normal
    ns: jnp.ndarray       # [N,3] shading normal
    ss: jnp.ndarray       # [N,3] shading tangent
    ts: jnp.ndarray       # [N,3] shading bitangent
    uv: jnp.ndarray       # [N,2]
    dpdu: jnp.ndarray     # [N,3]
    dpdv: jnp.ndarray     # [N,3]
    prim: jnp.ndarray     # [N] int32 primitive id (-1 miss)
    material: jnp.ndarray  # [N] int32 material id
    area_light: jnp.ndarray  # [N] int32 light id or -1
    # texture differentials (zero when not tracked)
    dudx: jnp.ndarray
    dvdx: jnp.ndarray
    dudy: jnp.ndarray
    dvdy: jnp.ndarray

    def world_to_local(self, v):
        """World dir -> shading frame (z = ns)."""
        return jnp.stack([dot(v, self.ss), dot(v, self.ts), dot(v, self.ns)], -1)

    def local_to_world(self, v):
        return (v[..., 0:1] * self.ss + v[..., 1:2] * self.ts
                + v[..., 2:3] * self.ns)

    def spawn_origin(self, w):
        """Robust ray origin offset along ng toward direction w
        (interaction/mod.rs:189 spawn_ray)."""
        return vm.offset_ray_origin(self.p, self.p_err + 1e-5, self.ng, w)

    @property
    def duv(self):
        return (self.dudx, self.dvdx, self.dudy, self.dvdy)


def compute_differentials(si: SurfaceInteraction, rays) -> SurfaceInteraction:
    """Fill dudx/dvdx/dudy/dvdy from camera ray differentials
    (surface_interaction.rs:203 compute_differentials): intersect the
    auxiliary rays with the tangent plane at p, then least-squares solve
    duv from dpdx/dpdy against (dpdu, dpdv). Fully vectorized; lanes with
    degenerate geometry fall back to zeros (-> mip level 0)."""
    if rays.rx_o is None:
        return si
    n, p = si.ng, si.p
    d_plane = dot(n, p)

    def plane_hit(o, d):
        denom = dot(n, d)
        tt = (d_plane - dot(n, o)) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        return o + tt[:, None] * d, jnp.abs(denom) > 1e-9

    px, okx = plane_hit(rays.rx_o, rays.rx_d)
    py, oky = plane_hit(rays.ry_o, rays.ry_d)
    dpdx = px - p
    dpdy = py - p

    # pick the two coordinate axes where |n| is smallest (book 10.1.1)
    an = jnp.abs(n)
    # dims: if nx largest -> use (y,z); ny largest -> (x,z); else (x,y)
    use_yz = (an[:, 0] > an[:, 1]) & (an[:, 0] > an[:, 2])
    use_xz = ~use_yz & (an[:, 1] > an[:, 2])
    d0 = jnp.where(use_yz, 1, 0)
    d1 = jnp.where(use_yz | use_xz, 2, 1)
    lanes = jnp.arange(p.shape[0])

    def pick2(v):
        return jnp.stack([v[lanes, d0], v[lanes, d1]], -1)

    A0 = pick2(si.dpdu)
    A1 = pick2(si.dpdv)
    det = A0[:, 0] * A1[:, 1] - A1[:, 0] * A0[:, 1]
    ok = (jnp.abs(det) > 1e-12) & okx & oky & si.valid
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)

    def solve(b2):
        du = (b2[:, 0] * A1[:, 1] - b2[:, 1] * A1[:, 0]) * inv_det
        dv = (b2[:, 1] * A0[:, 0] - b2[:, 0] * A0[:, 1]) * inv_det
        return du, dv

    dudx, dvdx = solve(pick2(dpdx))
    dudy, dvdy = solve(pick2(dpdy))
    clampf = lambda v: jnp.where(ok, jnp.clip(jnp.nan_to_num(v), -1e8, 1e8), 0.0)
    return si._replace(dudx=clampf(dudx), dvdx=clampf(dvdx),
                       dudy=clampf(dudy), dvdy=clampf(dvdy))


def specular_diff_rays(si, rays, wi, is_specular, is_transmission, eta):
    """Propagate camera ray differentials through a specular bounce.

    Reference: core/src/integrator/sampler_integrator.rs:312-415
    (specular_reflect / specular_transmit). Flat-normal approximation:
    dndx = dndy = 0 — the curvature terms need dndu/dndv which the SoA
    does not store; for the dominant flat mirror/glass case they are
    exactly zero. Non-specular lanes get zeroed auxiliary directions,
    which compute_differentials treats as degenerate (-> mip level 0),
    matching the reference's path behavior of dropping differentials on
    non-specular scatters.

    Returns a Rays pytree whose (rx_o, rx_d, ry_o, ry_d) describe the
    scattered ray's differentials.
    """
    from pbrt_tpu.core.ray import Rays
    if rays.rx_o is None:
        return rays
    n, p, wo = si.ns, si.p, si.wo
    d_plane = dot(si.ng, p)

    def plane_hit(o, d):
        denom = dot(si.ng, d)
        tt = (d_plane - dot(si.ng, o)) / jnp.where(jnp.abs(denom) < 1e-9,
                                                   1e-9, denom)
        return o + tt[:, None] * d

    px = plane_hit(rays.rx_o, rays.rx_d)
    py = plane_hit(rays.ry_o, rays.ry_d)

    # reflect: rd = wi - dwodx + 2 (wo.n dndx + dDNdx n), dndx = 0
    dwodx = -rays.rx_d - wo
    dwody = -rays.ry_d - wo
    dDNdx = dot(dwodx, n)
    dDNdy = dot(dwody, n)
    rx_refl = wi - dwodx + 2.0 * dDNdx[:, None] * n
    ry_refl = wi - dwody + 2.0 * dDNdy[:, None] * n

    # transmit (sampler_integrator.rs:369-415): flip to the incident side
    ent = dot(wo, n) >= 0.0
    nf = jnp.where(ent[:, None], n, -n)
    etaf = jnp.where(ent, 1.0 / jnp.maximum(eta, 1e-6), eta)
    # pbrt convention: eta here is etaI/etaT for the refracted direction
    w_neg = -wo
    mu = etaf * dot(w_neg, nf) - dot(wi, nf)
    wiN = jnp.where(jnp.abs(dot(wi, nf)) < 1e-6, 1e-6, dot(wi, nf))
    dmudx = (etaf - (etaf * etaf * dot(w_neg, nf)) / wiN) * dDNdx
    dmudy = (etaf - (etaf * etaf * dot(w_neg, nf)) / wiN) * dDNdy
    rx_tran = wi + etaf[:, None] * dwodx - dmudx[:, None] * nf
    ry_tran = wi + etaf[:, None] * dwody - dmudy[:, None] * nf

    tm = is_transmission[:, None]
    rx_d = jnp.where(tm, rx_tran, rx_refl)
    ry_d = jnp.where(tm, ry_tran, ry_refl)
    keep = (is_specular & si.valid)[:, None]
    zero = jnp.zeros_like(wi)
    return Rays(p, wi, rays.t_max, rays.time,
                rx_o=jnp.where(keep, px, p),
                rx_d=jnp.where(keep, rx_d, zero),
                ry_o=jnp.where(keep, py, p),
                ry_d=jnp.where(keep, ry_d, zero))


def make_frame(si_ns, dpdu):
    """Orthonormal shading frame from ns + dpdu (bsdf.rs constructor)."""
    ss = normalize(dpdu - si_ns * dot(si_ns, dpdu)[..., None])
    bad = vm.length_squared(ss) < 1e-12
    alt, _ = vm.coordinate_system(si_ns)
    ss = jnp.where(bad[..., None], alt, ss)
    ts = cross(si_ns, ss)
    return ss, ts
