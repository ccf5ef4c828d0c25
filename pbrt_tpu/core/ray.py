"""Ray wavefront SoA.

Reference: core/src/geometry/ray.rs defines Ray + RayDifferential per-ray
structs. TPU-first, a "Ray" is a pytree of [..., 3]/[...] arrays covering a
whole wavefront; differentials are carried as optional fields of the same
batch shape. Being a NamedTuple it is a pytree: jit/vmap/scan-friendly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from pbrt_tpu.core.math import INF, vec3


class Rays(NamedTuple):
    o: jnp.ndarray            # [..., 3] origins
    d: jnp.ndarray            # [..., 3] directions (not necessarily unit)
    t_max: jnp.ndarray        # [...]
    time: jnp.ndarray         # [...]
    # ray differentials (None when not tracked)
    rx_o: Optional[jnp.ndarray] = None
    rx_d: Optional[jnp.ndarray] = None
    ry_o: Optional[jnp.ndarray] = None
    ry_d: Optional[jnp.ndarray] = None

    @staticmethod
    def make(o, d, t_max=None, time=None):
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        batch = jnp.broadcast_shapes(o.shape[:-1], d.shape[:-1])
        if t_max is None:
            t_max = jnp.full(batch, INF)
        else:
            t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), batch)
        if time is None:
            time = jnp.zeros(batch, jnp.float32)
        else:
            time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), batch)
        return Rays(o, d, t_max, time)

    def at(self, t):
        return self.o + self.d * t[..., None]

    @property
    def batch_shape(self):
        return self.t_max.shape

    def with_tmax(self, t_max):
        return self._replace(t_max=jnp.broadcast_to(t_max, self.batch_shape))

    def scaled_differentials(self, s):
        """Scale differentials to account for spp spacing
        (reference ray.rs scale_differentials)."""
        if self.rx_o is None:
            return self
        return self._replace(
            rx_o=self.o + (self.rx_o - self.o) * s,
            ry_o=self.o + (self.ry_o - self.o) * s,
            rx_d=self.d + (self.rx_d - self.d) * s,
            ry_d=self.d + (self.ry_d - self.d) * s,
        )
