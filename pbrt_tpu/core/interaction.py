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


def make_frame(si_ns, dpdu):
    """Orthonormal shading frame from ns + dpdu (bsdf.rs constructor)."""
    ss = normalize(dpdu - si_ns * dot(si_ns, dpdu)[..., None])
    bad = vm.length_squared(ss) < 1e-12
    alt, _ = vm.coordinate_system(si_ns)
    ss = jnp.where(bad[..., None], alt, ss)
    ts = cross(si_ns, ss)
    return ss, ts
