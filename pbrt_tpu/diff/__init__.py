"""Differentiable rendering: gradients of radiance w.r.t. scene parameters.

BASELINE north star: differentiate pixel radiance w.r.t. material/texture/
light parameters via path-replay-style backprop, grad-check vs finite
differences. Because every sampler is a pure counter-based function
(pbrt_tpu/samplers), the whole forward render IS the replay: jax.grad of
the estimator differentiates shading along the exact same paths while
geometry decisions (intersections, visibility) are constants of the tape —
pbrt-style "detached" discontinuities (SURVEY sect. 7 hard part 5).

`param_view` exposes the differentiable leaves (material constants, texture
params, light emission) as one pytree; `render_loss` re-threads a perturbed
pytree into the scene and renders.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.scene.types import CompiledScene


class DiffParams(NamedTuple):
    """Differentiable scene-parameter pytree."""
    mat_const: jnp.ndarray   # [M, slots, 3] material constants (albedos etc.)
    tex_params: jnp.ndarray  # [X, 16] texture parameters (colors, scales)
    light_L: jnp.ndarray     # [L, 3] light emission


def get_params(cs: CompiledScene) -> DiffParams:
    return DiffParams(cs.data.mats.const, cs.data.tex.params, cs.data.lights.L)


def with_params(cs: CompiledScene, p: DiffParams) -> CompiledScene:
    data = cs.data._replace(
        mats=cs.data.mats._replace(const=p.mat_const),
        tex=cs.data.tex._replace(params=p.tex_params),
        lights=cs.data.lights._replace(L=p.light_L))
    return CompiledScene(data, cs.flags, cs.camera, cs.film, cs.sampler,
                         cs.filter_spec, cs.integrator_kind, cs.integrator_params)


def render_samples(cs: CompiledScene, params: DiffParams, px, py, sample_idx,
                   max_depth: int = 3):
    """Differentiable radiance for given pixels/samples."""
    from pbrt_tpu.integrators.path import li_path
    cs2 = with_params(cs, params)
    L, p_film, w = li_path(cs2, px, py, sample_idx, max_depth=max_depth)
    return L


def grad_wrt_params(cs: CompiledScene, px, py, n_samples: int = 8,
                    max_depth: int = 3, loss_fn=None):
    """jax.grad of a scalar image loss w.r.t. all DiffParams."""
    loss_fn = loss_fn or (lambda L: jnp.mean(L))
    p0 = get_params(cs)

    def loss(p):
        total = 0.0
        for s in range(n_samples):
            sidx = jnp.full(px.shape, s, jnp.int32)
            total = total + loss_fn(render_samples(cs, p, px, py, sidx, max_depth))
        return total / n_samples

    return jax.jit(jax.value_and_grad(loss))(p0)
