"""Gradient correctness: jax.grad vs finite differences (BASELINE config 5).

Checks d(loss)/d(albedo) and d(loss)/d(light intensity) on a textured scene.
Because samplers are counter-based, AD and FD evaluate the SAME paths, so
agreement is tight even at low spp (path-replay property).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.diff import get_params, render_samples

SCENE = """
LookAt 0 4 4  0 0 0  0 1 0
Camera "perspective" "float fov" 35
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "02sequence" "integer pixelsamples" 8
Integrator "path" "integer maxdepth" 3
WorldBegin
LightSource "point" "point from" [2 5 1] "rgb I" [40 40 40]
LightSource "infinite" "rgb L" [0.2 0.2 0.25]
AttributeBegin
  Material "matte" "rgb Kd" [0.6 0.3 0.2]
  Shape "sphere" "float radius" 1
AttributeEnd
AttributeBegin
  Texture "check" "color" "checkerboard" "rgb tex1" [0.8 0.8 0.8] "rgb tex2" [0.2 0.2 0.2]
  Material "matte" "texture Kd" "check"
  Translate 0 -1 0
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-8 0 -8  8 0 -8  8 0 8  -8 0 8]
AttributeEnd
WorldEnd
"""


@pytest.fixture(scope="module")
def setup():
    cs = load_scene_string(SCENE)
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    px = jnp.asarray(xs.ravel(), jnp.int32)
    py = jnp.asarray(ys.ravel(), jnp.int32)
    p0 = get_params(cs)

    def loss(p):
        # 4 sample indices in ONE batched pass (4x smaller XLA graph than a
        # python loop of passes; identical estimator)
        k = 4
        pxs = jnp.tile(px, (k,))
        pys = jnp.tile(py, (k,))
        sidx = jnp.repeat(jnp.arange(k), px.shape[0]).astype(jnp.int32)
        return jnp.mean(render_samples(cs, p, pxs, pys, sidx, max_depth=2))

    jloss = jax.jit(loss)
    grad = jax.jit(jax.grad(loss))(p0)
    return p0, jloss, grad


def _fd(jloss, p0, set_eps, eps=1e-3):
    lp = float(jloss(set_eps(p0, +eps)))
    lm = float(jloss(set_eps(p0, -eps)))
    return (lp - lm) / (2 * eps)


def test_grad_albedo_matches_fd(setup):
    p0, jloss, grad = setup
    # material 1 = the sphere matte; slot 0 = Kd, red channel
    def bump(p, e):
        return p._replace(mat_const=p.mat_const.at[1, 0, 0].add(e))
    fd = _fd(jloss, p0, bump)
    ad = float(grad.mat_const[1, 0, 0])
    assert abs(ad - fd) < 0.05 * max(abs(fd), 1e-4), (ad, fd)
    assert ad > 0.0  # more albedo -> more radiance


def test_grad_texture_matches_fd(setup):
    p0, jloss, grad = setup
    # texture 0 = checkerboard tex1 color (params[0:3])
    def bump(p, e):
        return p._replace(tex_params=p.tex_params.at[0, 1].add(e))
    fd = _fd(jloss, p0, bump)
    ad = float(grad.tex_params[0, 1])
    assert abs(ad - fd) < 0.05 * max(abs(fd), 1e-4), (ad, fd)


def test_grad_light_intensity_matches_fd(setup):
    p0, jloss, grad = setup
    def bump(p, e):
        return p._replace(light_L=p.light_L.at[0, 1].add(e))
    fd = _fd(jloss, p0, bump, eps=1e-2)
    ad = float(grad.light_L[0, 1])
    assert abs(ad - fd) < 0.05 * max(abs(fd), 1e-4), (ad, fd)
    assert ad > 0.0
