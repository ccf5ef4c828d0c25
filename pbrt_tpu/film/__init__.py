"""Film: filter-weighted radiance accumulation + splats.

Reference: core/src/film/{mod,film_tile}.rs. The reference merges per-thread
FilmTiles into an RwLock'd pixel vec; the TPU film is a functional pytree
(rgb_sum, weight_sum, splat) and EVERY wavefront deposits with one batched
scatter-add over a static filter footprint — the deterministic XLA replacement
for tile merging and AtomicFloat splats (SURVEY.md sect. 5.2). Under
shard_map, each device owns a local film and the merge is a single psum.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.filters import FilterSpec, build_table, FILTER_TABLE_WIDTH
from pbrt_tpu.core.spectrum import luminance


@dataclasses.dataclass(frozen=True)
class FilmSpec:
    full_resolution: Tuple[int, int] = (640, 480)   # (x, y)
    crop_window: Tuple[float, float, float, float] = (0.0, 1.0, 0.0, 1.0)
    filter: FilterSpec = dataclasses.field(default_factory=FilterSpec)
    filename: str = "out.png"
    scale: float = 1.0
    diagonal_m: float = 0.035  # 35mm sensor diagonal (meters)
    max_sample_luminance: float = float("inf")

    # -- derived ---------------------------------------------------------
    @property
    def pixel_bounds(self):
        """Cropped integer pixel bounds (x0, x1, y0, y1) — film/mod.rs:100."""
        rx, ry = self.full_resolution
        x0y0x1y1 = self.crop_window
        x0 = int(np.ceil(rx * x0y0x1y1[0]))
        x1 = max(x0 + 1, int(np.ceil(rx * x0y0x1y1[1])))
        y0 = int(np.ceil(ry * x0y0x1y1[2]))
        y1 = max(y0 + 1, int(np.ceil(ry * x0y0x1y1[3])))
        return (x0, x1, y0, y1)

    @property
    def cropped_resolution(self):
        x0, x1, y0, y1 = self.pixel_bounds
        return (x1 - x0, y1 - y0)

    @property
    def sample_bounds(self):
        """Pixel bounds expanded by filter radius: where camera samples are
        generated (film/mod.rs get_sample_bounds)."""
        x0, x1, y0, y1 = self.pixel_bounds
        rx, ry = self.filter.radius
        return (int(np.floor(x0 + 0.5 - rx)), int(np.ceil(x1 - 0.5 + rx)),
                int(np.floor(y0 + 0.5 - ry)), int(np.ceil(y1 - 0.5 + ry)))

    def filter_table(self):
        return jnp.asarray(build_table(self.filter))


def make_film(params: dict, filt: FilterSpec, options=None) -> FilmSpec:
    """From a .pbrt Film ParamSet (reference film/mod.rs:427-470)."""
    xres = int(params.get("xresolution", [640])[0])
    yres = int(params.get("yresolution", [480])[0])
    crop = params.get("cropwindow", [0.0, 1.0, 0.0, 1.0])
    filename = str(params.get("filename", ["out.png"])[0])
    if options is not None:
        if options.quick:
            xres = max(1, xres // 4)
            yres = max(1, yres // 4)
        if options.outfile:
            filename = options.outfile
        if options.crop_window is not None:
            crop = list(options.crop_window)
    return FilmSpec((xres, yres), tuple(float(c) for c in crop), filt, filename,
                    scale=float(params.get("scale", [1.0])[0]),
                    diagonal_m=float(params.get("diagonal", [35.0])[0]) * 0.001,
                    max_sample_luminance=float(params.get("maxsampleluminance",
                                                          [float("inf")])[0]))


class FilmState(NamedTuple):
    rgb_sum: jnp.ndarray     # [H, W, 3]
    weight_sum: jnp.ndarray  # [H, W]
    splat: jnp.ndarray       # [H, W, 3]

    @staticmethod
    def zeros(spec: FilmSpec) -> "FilmState":
        w, h = spec.cropped_resolution
        return FilmState(jnp.zeros((h, w, 3), jnp.float32),
                         jnp.zeros((h, w), jnp.float32),
                         jnp.zeros((h, w, 3), jnp.float32))


def _footprint(spec: FilmSpec):
    rx, ry = spec.filter.radius
    kx = int(np.floor(2.0 * rx)) + 1
    ky = int(np.floor(2.0 * ry)) + 1
    return kx, ky


def add_samples(spec: FilmSpec, state: FilmState, p_film, L, ray_weight=None,
                active=None, table=None) -> FilmState:
    """Deposit a wavefront of samples.

    p_film: [N, 2] continuous raster coords (absolute, in full-res space).
    L: [N, 3] radiance; ray_weight: [N]; active: [N] bool.
    Static filter footprint kx*ky scatter-adds (film_tile.rs:62 add_sample).
    """
    x0, x1, y0, y1 = spec.pixel_bounds
    H, W = state.rgb_sum.shape[:2]
    rx, ry = spec.filter.radius
    kx, ky = _footprint(spec)
    if table is None:
        table = spec.filter_table()
    N = p_film.shape[0]
    if ray_weight is None:
        ray_weight = jnp.ones((N,), jnp.float32)
    if active is None:
        active = jnp.ones((N,), bool)

    # NaN/inf radiance is dropped (sampler_integrator.rs:373-397) and bright
    # outliers are clamped to max_sample_luminance (film_tile.rs).
    finite = jnp.all(jnp.isfinite(L), axis=-1) & jnp.isfinite(ray_weight)
    active = active & finite
    L = jnp.where(finite[:, None], L, 0.0)
    if np.isfinite(spec.max_sample_luminance):
        ly = luminance(L)
        f = jnp.where(ly > spec.max_sample_luminance,
                      spec.max_sample_luminance / jnp.maximum(ly, 1e-20), 1.0)
        L = L * f[:, None]

    pdx = p_film[:, 0] - 0.5
    pdy = p_film[:, 1] - 0.5
    px0 = jnp.ceil(pdx - rx).astype(jnp.int32)
    py0 = jnp.ceil(pdy - ry).astype(jnp.int32)
    pxe = jnp.floor(pdx + rx).astype(jnp.int32)
    pye = jnp.floor(pdy + ry).astype(jnp.int32)

    rgb = state.rgb_sum
    wsum = state.weight_sum
    ntab = table.shape[0]
    for j in range(ky):
        for i in range(kx):
            px = px0 + i
            py = py0 + j
            fx = jnp.minimum((jnp.abs(px.astype(jnp.float32) - pdx) / rx
                              * ntab).astype(jnp.int32), ntab - 1)
            fy = jnp.minimum((jnp.abs(py.astype(jnp.float32) - pdy) / ry
                              * ntab).astype(jnp.int32), ntab - 1)
            w = table[fy, fx] * ray_weight
            ok = active & (px <= pxe) & (py <= pye) & \
                (px >= x0) & (px < x1) & (py >= y0) & (py < y1)
            ix = jnp.where(ok, px - x0, W)   # W/H out of range -> dropped
            iy = jnp.where(ok, py - y0, H)
            w = jnp.where(ok, w, 0.0)
            rgb = rgb.at[iy, ix].add(w[:, None] * L, mode="drop")
            wsum = wsum.at[iy, ix].add(w, mode="drop")
    return FilmState(rgb, wsum, state.splat)


def add_splats(spec: FilmSpec, state: FilmState, p_film, v, active=None) -> FilmState:
    """Splat deposits (BDPT t=1 / MLT; film/mod.rs:315 add_splat).
    Nearest-pixel, unfiltered, later scaled by splat_scale at develop."""
    x0, x1, y0, y1 = spec.pixel_bounds
    H, W = state.splat.shape[:2]
    if active is None:
        active = jnp.ones(p_film.shape[:1], bool)
    finite = jnp.all(jnp.isfinite(v), axis=-1)
    active = active & finite
    v = jnp.where(finite[:, None], v, 0.0)
    px = jnp.floor(p_film[:, 0]).astype(jnp.int32)
    py = jnp.floor(p_film[:, 1]).astype(jnp.int32)
    ok = active & (px >= x0) & (px < x1) & (py >= y0) & (py < y1)
    ix = jnp.where(ok, px - x0, W)
    iy = jnp.where(ok, py - y0, H)
    v = jnp.where(ok[:, None], v, 0.0)
    return state._replace(splat=state.splat.at[iy, ix].add(v, mode="drop"))


def develop(spec: FilmSpec, state: FilmState, splat_scale: float = 1.0):
    """Final [H, W, 3] linear RGB (film/mod.rs:356 write_image math)."""
    w = state.weight_sum
    rgb = jnp.where(w[..., None] > 0.0, state.rgb_sum / jnp.maximum(w[..., None], 1e-20), 0.0)
    rgb = rgb + splat_scale * state.splat
    return jnp.maximum(rgb * spec.scale, 0.0)
