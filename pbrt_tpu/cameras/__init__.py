"""Cameras: film sample -> world-space ray wavefronts.

Reference: core/src/camera.rs trait + cameras/src/{perspective,orthographic,
environment,realistic_camera}.rs. TPU re-design: a frozen `CameraSpec` with
precomputed raster<->camera matrices; `generate_rays` maps a whole wavefront
of CameraSamples to Rays (with differentials) in one fused computation —
dispatch over camera kind happens at trace time (static), not per ray.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import vec3, normalize, PI
from pbrt_tpu.core.ray import Rays
from pbrt_tpu.core.transform import Transform, AnimatedTransform, perspective, orthographic, scale, translate, apply_point, apply_vector
from pbrt_tpu.core.sampling import concentric_sample_disk


class CameraSamples(NamedTuple):
    p_film: jnp.ndarray   # [N, 2] raster coords
    p_lens: jnp.ndarray   # [N, 2] in [0,1)^2
    time: jnp.ndarray     # [N] in [0,1)


@dataclasses.dataclass(frozen=True)
class CameraSpec:
    kind: str                       # perspective | orthographic | environment | realistic
    cam_to_world: AnimatedTransform
    shutter_open: float = 0.0
    shutter_close: float = 1.0
    # projective cameras
    raster_to_camera: Optional[np.ndarray] = None      # [4,4]
    camera_to_raster: Optional[np.ndarray] = None
    lens_radius: float = 0.0
    focal_distance: float = 1e6
    resolution: Tuple[int, int] = (640, 480)
    # perspective differential basis
    dx_camera: Optional[np.ndarray] = None
    dy_camera: Optional[np.ndarray] = None
    # perspective importance normalization (area of z=1 screen window)
    screen_area: float = 1.0
    # realistic lens system: [n_elements, 4] rows of
    # (curvature_radius, thickness, eta, aperture_radius) — realistic_camera.rs:33
    lens_elements: Optional[np.ndarray] = None
    simple_weighting: bool = True


def _screen_window(aspect, given=None):
    if given is not None:
        return tuple(given)
    if aspect > 1.0:
        return (-aspect, aspect, -1.0, 1.0)
    return (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)


def _screen_to_raster(res, sw):
    x0, x1, y0, y1 = sw
    return (scale([res[0], res[1], 1.0])
            * scale([1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0])
            * translate([-x0, -y1, 0.0]))


def make_camera(kind: str, params: dict, cam_to_world: AnimatedTransform,
                resolution: Tuple[int, int]) -> CameraSpec:
    """From .pbrt Camera ParamSet (graphics_state.rs:630 make_camera)."""
    aspect = float(params.get("frameaspectratio", [resolution[0] / resolution[1]])[0])
    sw = _screen_window(aspect, params.get("screenwindow"))
    shutter_open = float(params.get("shutteropen", [0.0])[0])
    shutter_close = float(params.get("shutterclose", [1.0])[0])
    lens_radius = float(params.get("lensradius", [0.0])[0])
    focal = float(params.get("focaldistance", [1e6])[0])

    if kind in ("perspective", "orthographic"):
        if kind == "perspective":
            fov = float(params.get("fov", [90.0])[0])
            halffov = params.get("halffov")
            if halffov is not None:
                fov = 2.0 * float(halffov[0])
            cam_to_screen = perspective(fov, 1e-2, 1000.0)
        else:
            cam_to_screen = orthographic(0.0, 1.0)
        s2r = _screen_to_raster(resolution, sw)
        raster_to_screen = s2r.inverse()
        r2c = cam_to_screen.inverse() * raster_to_screen
        dx = apply_point(r2c.m, np.array([1.0, 0, 0])) - apply_point(r2c.m, np.zeros(3)) \
            if kind == "orthographic" else None
        # perspective stores point-differentials; computed on the fly there
        pmin = apply_point(r2c.m, np.zeros(3))
        pmax = apply_point(r2c.m, np.array([resolution[0], resolution[1], 0.0], np.float64))
        if kind == "perspective":
            pmin = pmin / pmin[2]
            pmax = pmax / pmax[2]
        area = abs((pmax[0] - pmin[0]) * (pmax[1] - pmin[1]))
        return CameraSpec(kind, cam_to_world, shutter_open, shutter_close,
                          raster_to_camera=r2c.m,
                          camera_to_raster=np.linalg.inv(r2c.m.astype(np.float64)).astype(np.float32),
                          lens_radius=lens_radius, focal_distance=focal,
                          resolution=resolution, screen_area=float(area))
    if kind == "environment":
        return CameraSpec(kind, cam_to_world, shutter_open, shutter_close,
                          resolution=resolution)
    if kind == "realistic":
        from pbrt_tpu.cameras.realistic import load_lens_system
        lens = load_lens_system(params)
        aperture = float(params.get("aperturediameter", [1.0])[0])
        focus = float(params.get("focusdistance", [10.0])[0])
        spec = CameraSpec(kind, cam_to_world, shutter_open, shutter_close,
                          resolution=resolution, lens_elements=lens,
                          focal_distance=focus,
                          simple_weighting=bool(params.get("simpleweighting", [True])[0]))
        from pbrt_tpu.cameras.realistic import focus_lens_system
        return focus_lens_system(spec, resolution, sw)
    raise ValueError(f"unknown camera kind {kind!r}")


def generate_rays(spec: CameraSpec, cs: CameraSamples, differentials: bool = True):
    """-> (Rays [N], weight [N]). Wavefront equivalent of
    generate_ray_differential (core/src/camera.rs:29)."""
    time = spec.shutter_open + cs.time * (spec.shutter_close - spec.shutter_open)
    if spec.kind == "perspective":
        rays, w = _perspective_rays(spec, cs, differentials)
    elif spec.kind == "orthographic":
        rays, w = _orthographic_rays(spec, cs, differentials)
    elif spec.kind == "environment":
        rays, w = _environment_rays(spec, cs)
    elif spec.kind == "realistic":
        from pbrt_tpu.cameras.realistic import realistic_rays
        rays, w = realistic_rays(spec, cs)
    else:
        raise ValueError(spec.kind)
    # camera -> world (per-ray interpolated matrix when animated)
    c2w = spec.cam_to_world.interpolate(time)
    def xform_p(p):
        return jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], p) + c2w[..., :3, 3]
    def xform_v(v):
        return jnp.einsum("...ij,...j->...i", c2w[..., :3, :3], v)
    rays = Rays(
        o=xform_p(rays.o), d=xform_v(rays.d), t_max=rays.t_max, time=time,
        rx_o=None if rays.rx_o is None else xform_p(rays.rx_o),
        rx_d=None if rays.rx_d is None else xform_v(rays.rx_d),
        ry_o=None if rays.ry_o is None else xform_p(rays.ry_o),
        ry_d=None if rays.ry_d is None else xform_v(rays.ry_d))
    return rays, w


def _apply44(m, p):
    m = jnp.asarray(m)
    out = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    return out / w[..., None]


def _lens_offset(spec, cs, p_camera_dir, o, d):
    """Depth of field resampling shared by projective cameras."""
    p_lens = spec.lens_radius * concentric_sample_disk(cs.p_lens)
    ft = spec.focal_distance / d[..., 2]
    p_focus = o + d * ft[..., None]
    o2 = jnp.concatenate([p_lens, jnp.zeros_like(p_lens[..., :1])], -1)
    d2 = normalize(p_focus - o2)
    return o2, d2


def _perspective_rays(spec, cs, differentials):
    N = cs.p_film.shape[0]
    p_film3 = jnp.concatenate([cs.p_film, jnp.zeros((N, 1), jnp.float32)], -1)
    p_cam = _apply44(spec.raster_to_camera, p_film3)
    o = jnp.zeros((N, 3), jnp.float32)
    d = normalize(p_cam)
    if spec.lens_radius > 0.0:
        o, d = _lens_offset(spec, cs, p_cam, o, d)
    rays = Rays.make(o, d)
    if differentials:
        px = _apply44(spec.raster_to_camera, p_film3 + jnp.array([1.0, 0, 0]))
        py = _apply44(spec.raster_to_camera, p_film3 + jnp.array([0, 1.0, 0]))
        dx = normalize(px)
        dy = normalize(py)
        ox = oy = o
        if spec.lens_radius > 0.0:
            ox, dx = _lens_offset(spec, cs, px, o, dx)
            oy, dy = _lens_offset(spec, cs, py, o, dy)
        rays = rays._replace(rx_o=ox, rx_d=dx, ry_o=oy, ry_d=dy)
    return rays, jnp.ones((N,), jnp.float32)


def _orthographic_rays(spec, cs, differentials):
    N = cs.p_film.shape[0]
    p_film3 = jnp.concatenate([cs.p_film, jnp.zeros((N, 1), jnp.float32)], -1)
    o = _apply44(spec.raster_to_camera, p_film3)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (N, 3))
    if spec.lens_radius > 0.0:
        o, d = _lens_offset(spec, cs, o, o, d)
    rays = Rays.make(o, d)
    if differentials:
        ox = _apply44(spec.raster_to_camera, p_film3 + jnp.array([1.0, 0, 0]))
        oy = _apply44(spec.raster_to_camera, p_film3 + jnp.array([0, 1.0, 0]))
        rays = rays._replace(rx_o=ox, rx_d=d, ry_o=oy, ry_d=d)
    return rays, jnp.ones((N,), jnp.float32)


def _environment_rays(spec, cs):
    N = cs.p_film.shape[0]
    theta = PI * cs.p_film[:, 1] / spec.resolution[1]
    phi = 2.0 * PI * cs.p_film[:, 0] / spec.resolution[0]
    d = vec3(jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta), jnp.sin(theta) * jnp.sin(phi))
    rays = Rays.make(jnp.zeros((N, 3), jnp.float32), d)
    return rays, jnp.ones((N,), jnp.float32)
