"""Monte-Carlo warps + sampling distributions.

Warps mirror core/src/sampling/common.rs; Distribution1D/2D mirror
core/src/sampling/distribution_{1d,2d}.rs but are re-designed for TPU:
the CDF lives as a padded device array and inversion is a vectorized
`searchsorted` over the whole wavefront (one gather-heavy but fully
data-parallel op) instead of the reference's per-call binary search.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.math import PI, INV_PI, INV_2PI, INV_4PI, PI_OVER_2, PI_OVER_4, vec3, ONE_MINUS_EPSILON


# ---------------------------------------------------------------------------
# warps (all broadcast over leading axes; u is [..., 2] or scalar [...])
# ---------------------------------------------------------------------------

def uniform_sample_hemisphere(u):
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_hemisphere_pdf():
    return INV_2PI


def uniform_sample_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_sphere_pdf():
    return INV_4PI


def concentric_sample_disk(u):
    """Shirley-Chiu concentric map (reference sampling/common.rs:138),
    branchless via where()."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe = lambda d: jnp.where(d == 0.0, 1.0, d)
    theta = jnp.where(use_x, PI_OVER_4 * (oy / safe(ox)),
                      PI_OVER_2 - PI_OVER_4 * (ox / safe(oy)))
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return jnp.stack([x, y], axis=-1)


def cosine_sample_hemisphere(u):
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return vec3(d[..., 0], d[..., 1], z)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_cone(u, cos_theta_max):
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = u[..., 1] * 2.0 * PI
    return vec3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * PI * (1.0 - cos_theta_max))


def uniform_sample_triangle(u):
    """Barycentric (b0, b1) from uniform square (sampling/common.rs:198)."""
    su0 = jnp.sqrt(jnp.maximum(u[..., 0], 0.0))
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """Beta=2 power heuristic for MIS (sampling/common.rs:239)."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.where(denom > 0.0, denom, 1.0), 0.0)


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    denom = nf * f_pdf + ng * g_pdf
    return jnp.where(denom > 0.0, nf * f_pdf / jnp.where(denom > 0.0, denom, 1.0), 0.0)


# ---------------------------------------------------------------------------
# Distribution1D — CDF inversion by vectorized searchsorted
# ---------------------------------------------------------------------------

class Distribution1D(NamedTuple):
    """Piecewise-constant 1D distribution as a device pytree.

    func: [n] (the unnormalized function), cdf: [n+1], func_int: scalar.
    Sampling is `searchsorted` over the wavefront, fully parallel.
    """
    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray

    @staticmethod
    def build(f) -> "Distribution1D":
        f = np.maximum(np.asarray(f, np.float32), 0.0)
        n = f.shape[-1]
        cdf = np.concatenate([np.zeros(f.shape[:-1] + (1,), np.float32),
                              np.cumsum(f, -1, dtype=np.float64).astype(np.float32) / n], -1)
        func_int = cdf[..., -1].copy()
        safe = np.where(func_int > 0.0, func_int, 1.0)
        cdf = np.where(func_int[..., None] > 0.0, cdf / safe[..., None],
                       np.linspace(0.0, 1.0, n + 1, dtype=np.float32))
        cdf[..., -1] = 1.0
        return Distribution1D(jnp.asarray(f), jnp.asarray(cdf), jnp.asarray(func_int))

    @property
    def count(self):
        return self.func.shape[-1]

    def sample_continuous(self, u):
        """Returns (x in [0,1), pdf, offset)."""
        n = self.count
        offset = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1, 0, n - 1)
        c0 = self.cdf[offset]
        c1 = self.cdf[offset + 1]
        du = jnp.where(c1 > c0, (u - c0) / jnp.where(c1 > c0, c1 - c0, 1.0), u - c0)
        fv = self.func[offset]
        pdf = jnp.where(self.func_int > 0.0, fv / jnp.where(self.func_int > 0.0, self.func_int, 1.0), 0.0)
        x = (offset.astype(jnp.float32) + du) / n
        return x, pdf, offset

    def sample_discrete(self, u):
        """Returns (offset, pmf, u_remapped)."""
        n = self.count
        offset = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1, 0, n - 1)
        pmf = self.discrete_pdf(offset)
        c0 = self.cdf[offset]
        c1 = self.cdf[offset + 1]
        u_remap = jnp.where(c1 > c0, (u - c0) / jnp.where(c1 > c0, c1 - c0, 1.0), 0.0)
        return offset, pmf, jnp.minimum(u_remap, ONE_MINUS_EPSILON)

    def discrete_pdf(self, index):
        denom = jnp.where(self.func_int > 0.0, self.func_int * self.count, 1.0)
        return jnp.where(self.func_int > 0.0, self.func[index] / denom, 0.0)

    def pdf_continuous(self, x):
        """pdf at continuous x in [0,1)."""
        n = self.count
        i = jnp.clip((x * n).astype(jnp.int32), 0, n - 1)
        return jnp.where(self.func_int > 0.0,
                         self.func[i] / jnp.where(self.func_int > 0.0, self.func_int, 1.0), 0.0)


class Distribution2D(NamedTuple):
    """2D piecewise-constant distribution (env-map importance sampling,
    reference distribution_2d.rs): row-conditional CDFs [h, w+1] + marginal
    CDF over rows [h+1]. Both inversions are batched searchsorteds.
    """
    cond_func: jnp.ndarray      # [h, w]
    cond_cdf: jnp.ndarray       # [h, w+1]
    cond_int: jnp.ndarray       # [h]
    marg_func: jnp.ndarray      # [h]
    marg_cdf: jnp.ndarray       # [h+1]
    marg_int: jnp.ndarray       # scalar

    @staticmethod
    def build(f) -> "Distribution2D":
        f = np.maximum(np.asarray(f, np.float32), 0.0)  # [h, w]
        h, w = f.shape
        cond_cdf = np.concatenate([np.zeros((h, 1), np.float32),
                                   np.cumsum(f, -1, dtype=np.float64).astype(np.float32) / w], -1)
        cond_int = cond_cdf[:, -1].copy()
        safe = np.where(cond_int > 0, cond_int, 1.0)
        cond_cdf = np.where(cond_int[:, None] > 0, cond_cdf / safe[:, None],
                            np.linspace(0, 1, w + 1, dtype=np.float32)[None])
        cond_cdf[:, -1] = 1.0
        marg = cond_int
        marg_cdf = np.concatenate([[0.0], np.cumsum(marg, dtype=np.float64).astype(np.float32) / h])
        marg_int = marg_cdf[-1].copy()
        msafe = marg_int if marg_int > 0 else 1.0
        if marg_int > 0:
            marg_cdf = marg_cdf / msafe
        else:
            marg_cdf = np.linspace(0, 1, h + 1, dtype=np.float32)
        marg_cdf[-1] = 1.0
        return Distribution2D(jnp.asarray(f), jnp.asarray(cond_cdf), jnp.asarray(cond_int),
                              jnp.asarray(marg), jnp.asarray(marg_cdf.astype(np.float32)),
                              jnp.asarray(np.float32(marg_int)))

    def sample_continuous(self, u):
        """u: [..., 2] -> ((u,v) in [0,1)^2, pdf)."""
        h = self.marg_func.shape[0]
        w = self.cond_func.shape[1]
        iy = jnp.clip(jnp.searchsorted(self.marg_cdf, u[..., 1], side="right") - 1, 0, h - 1)
        c0 = self.marg_cdf[iy]
        c1 = self.marg_cdf[iy + 1]
        dy = jnp.where(c1 > c0, (u[..., 1] - c0) / jnp.where(c1 > c0, c1 - c0, 1.0), 0.0)
        pdf_y = jnp.where(self.marg_int > 0, self.marg_func[iy] / self.marg_int, 0.0)
        y = (iy.astype(jnp.float32) + dy) / h

        row_cdf = self.cond_cdf[iy]  # [..., w+1]
        ux = u[..., 0]
        ix = jnp.clip(_row_searchsorted(row_cdf, ux) - 1, 0, w - 1)
        r0 = jnp.take_along_axis(row_cdf, ix[..., None], -1)[..., 0]
        r1 = jnp.take_along_axis(row_cdf, (ix + 1)[..., None], -1)[..., 0]
        dx = jnp.where(r1 > r0, (ux - r0) / jnp.where(r1 > r0, r1 - r0, 1.0), 0.0)
        fi = self.cond_func[iy, ix]
        ci = self.cond_int[iy]
        pdf_x = jnp.where(ci > 0, fi / jnp.where(ci > 0, ci, 1.0), 0.0)
        x = (ix.astype(jnp.float32) + dx) / w
        return jnp.stack([x, y], -1), pdf_x * pdf_y

    def pdf(self, uv):
        h = self.marg_func.shape[0]
        w = self.cond_func.shape[1]
        ix = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        return jnp.where(self.marg_int > 0,
                         self.cond_func[iy, ix] / jnp.where(self.marg_int > 0, self.marg_int, 1.0), 0.0)


def _row_searchsorted(cdf_rows, u):
    """searchsorted of u[...] into per-row cdfs cdf_rows[..., n+1]."""
    return jnp.sum((cdf_rows <= u[..., None]).astype(jnp.int32), axis=-1)
