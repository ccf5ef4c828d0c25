"""Metropolis light transport — primary-sample-space MLT, wavefront chains.

Reference: integrators/src/mlt/ (PSSMLT over BDPT path space: bootstrap ->
Distribution1D over weights -> b -> n_chains Metropolis chains splatting
accept/reject, mod.rs :167-358; lazy-mutation MLTSampler mlt_sampler.rs).

TPU re-design: the reference runs chains on a CPU worker pool with lazily
mutated per-chain sampler state. Here THOUSANDS of chains advance in
lockstep (SURVEY P3: independent Markov chains = the embarrassingly
parallel axis): chain state is a dense [n_chains, U] primary-sample matrix,
mutations are whole-matrix ops (large-step refresh or per-dim Gaussian
perturbation — the reference's exact mutation kernel, mlt_sampler.rs).

The DEFAULT target is the reference's: BDPT path space with one (s,t)
strategy per mutation, the strategy index drawn from the connection stream
and the result multiplied by n_strategies (mlt/mod.rs l() :101-160). The
PSS vector's dim ranges are exactly the reference's three sample streams —
[0, 5+8D) camera stream, [.., +5+8(D-1)) light stream, the rest connection
stream — because the BDPT dim layout already partitions them statically.
A chain explores one path DEPTH, assigned round-robin from its bootstrap
index like the reference (mod.rs :199, depth = i % (max_depth+1)).
"string target" "path" selects the simpler Kelemen-style unidirectional
target instead.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.spectrum import luminance
from pbrt_tpu.samplers.hashing import hash3, hash4, u32_to_float, U32
from pbrt_tpu.integrators.path import li_path
from pbrt_tpu.integrators.common import CAMERA_DIMS, BOUNCE_DIMS
from pbrt_tpu.film import FilmState, add_splats, develop
from pbrt_tpu.utils.options import OPTIONS

SIGMA = 0.01
P_LARGE = 0.3


def _n_dims(max_depth):
    return CAMERA_DIMS + BOUNCE_DIMS * (max_depth + 1)


def _n_dims_bdpt(max_depth):
    """Total PSS dims for the BDPT target: camera stream + light stream +
    connection stream + 1 strategy-selection dim (the last column)."""
    D = max_depth + 1
    return 5 + 8 * D + 5 + 8 * (D - 1) + 4 * (D + 2) + 1


def _eval_bdpt_target(cs, u, max_depth, depth_lane):
    """L_{s,t}(u): one BDPT strategy per lane, s drawn from the last PSS dim
    among the lane's depth+2 strategies, scaled by n_strategies
    (mlt/mod.rs l())."""
    n = u.shape[0]
    D = max_depth + 1
    x0, x1, y0, y1 = cs.film.sample_bounds
    fx = x0 + u[:, 0] * (x1 - x0)
    fy = y0 + u[:, 1] * (y1 - y0)
    p_film = jnp.stack([fx, fy], -1)
    px = jnp.clip(fx.astype(jnp.int32), x0, x1 - 1)
    py = jnp.clip(fy.astype(jnp.int32), y0, y1 - 1)

    def sampler_fn(dim):
        return u[:, min(dim, u.shape[1] - 2)]

    n_str = jnp.where(depth_lane == 0, 1, depth_lane + 2)
    u_strat = u[:, -1]
    s_lane = jnp.where(
        depth_lane == 0, 0,
        jnp.minimum((u_strat * n_str.astype(jnp.float32)).astype(jnp.int32),
                    n_str - 1))
    t_lane = jnp.where(depth_lane == 0, 2, depth_lane + 2 - s_lane)

    from pbrt_tpu.integrators.bdpt import _bdpt_sample
    L, raster, _, _ = _bdpt_sample(cs, px, py, jnp.zeros(n, jnp.int32), D,
                                   sampler_fn=sampler_fn,
                                   p_film_override=p_film,
                                   st_select=(s_lane, t_lane))
    L = L * n_str.astype(jnp.float32)[:, None]
    L = jnp.nan_to_num(L, nan=0.0, posinf=0.0, neginf=0.0)
    return L, raster


def _eval_target(cs, u, max_depth):
    """L(u): drive the path estimator from the PSS vector u [N, U]."""
    n = u.shape[0]
    resx, resy = cs.film.full_resolution
    x0, x1, y0, y1 = cs.film.sample_bounds
    fx = x0 + u[:, 0] * (x1 - x0)
    fy = y0 + u[:, 1] * (y1 - y0)
    p_film = jnp.stack([fx, fy], -1)
    px = jnp.clip(fx.astype(jnp.int32), x0, x1 - 1)
    py = jnp.clip(fy.astype(jnp.int32), y0, y1 - 1)

    def sampler_fn(dim):
        return u[:, min(dim, u.shape[1] - 1)]

    L, pf, w = li_path(cs, px, py, jnp.zeros(n, jnp.int32), max_depth=max_depth,
                       sampler_fn=sampler_fn, p_film_override=p_film)
    L = jnp.nan_to_num(L, nan=0.0, posinf=0.0, neginf=0.0)
    return L, p_film


def render_mlt(cs, options=None, verbose=False):
    options = options or OPTIONS
    p = cs.integrator_params
    max_depth = int(p.get("maxdepth", [5])[0])
    n_bootstrap = int(p.get("bootstrapsamples", [65536])[0])
    n_chains = int(p.get("chains", [4096])[0])
    mutations_pp = int(p.get("mutationsperpixel", [100])[0])
    sigma = float(p.get("sigma", [0.01])[0])
    p_large = float(p.get("largestepprobability", [0.3])[0])
    if options.quick:
        n_bootstrap //= 8
        mutations_pp = max(4, mutations_pp // 8)
    target = str(p.get("target", ["bdpt"])[0])

    W, H = cs.film.cropped_resolution
    n_pix = W * H
    total_mutations = mutations_pp * n_pix
    n_steps = max(1, total_mutations // n_chains)
    n_depths = max_depth + 1

    if target == "bdpt":
        U = _n_dims_bdpt(max_depth)

        def eval_t(u, depth_lane):
            return _eval_bdpt_target(cs, u, max_depth, depth_lane)
    else:
        U = _n_dims(max_depth)

        def eval_t(u, depth_lane):
            return _eval_target(cs, u, max_depth)
    eval_t = jax.jit(eval_t)

    # ---- bootstrap: b over uniform PSS vectors; bootstrap i explores path
    # depth i % n_depths (mlt/mod.rs :199) ----
    def boot_u(i0, count):
        idx = jnp.arange(count, dtype=jnp.uint32) + U32(i0)
        cols = [u32_to_float(hash3(idx, U32(d), U32(0xB007)))
                for d in range(U)]
        return jnp.stack(cols, -1)

    def boot_depth(i0, count):
        idx = jnp.arange(count, dtype=jnp.uint32) + U32(i0)
        return (idx % U32(n_depths)).astype(jnp.int32)

    chunk = min(n_bootstrap, 16384)
    ws = []
    for i0 in range(0, n_bootstrap, chunk):
        L, _ = eval_t(boot_u(i0, chunk), boot_depth(i0, chunk))
        ws.append(np.asarray(luminance(L)))
    w_boot = np.concatenate(ws)[:n_bootstrap]
    b = float(w_boot.mean())
    if target == "bdpt":
        # each bootstrap sample explores ONE depth, so the mean estimates
        # (1/n_depths) * total integral: b = func_int * (max_depth + 1)
        # (mlt/mod.rs :251-252)
        b *= n_depths
    if b <= 0:
        return np.zeros((H, W, 3), np.float32)

    # ---- chain starts: sample bootstrap indices proportional to weight ----
    cdf = np.cumsum(w_boot)
    cdf /= cdf[-1]
    rng = np.random.default_rng(7)
    starts = np.searchsorted(cdf, rng.uniform(size=n_chains)).astype(np.uint32)
    u0 = np.zeros((n_chains, U), np.float32)
    for d in range(U):
        u0[:, d] = np.asarray(u32_to_float(hash3(jnp.asarray(starts), U32(d), U32(0xB007))))
    depth_lane = jnp.asarray((starts % n_depths).astype(np.int32))
    u_cur = jnp.asarray(u0)
    L_cur, pf_cur = eval_t(u_cur, depth_lane)
    y_cur = luminance(L_cur)

    # ---- Metropolis chains ----
    @functools.partial(jax.jit, donate_argnums=(0,))
    def mlt_step(film, u_cur, L_cur, y_cur, pf_cur, step):
        ci = jnp.arange(n_chains, dtype=jnp.uint32)
        su = step.astype(jnp.uint32)
        r_large = u32_to_float(hash3(ci, su, U32(1)))
        large = r_large < p_large
        prop = []
        for d in range(U):
            fresh = u32_to_float(hash4(ci, su, U32(d), U32(2)))
            g1 = u32_to_float(hash4(ci, su, U32(d), U32(3)))
            g2 = u32_to_float(hash4(ci, su, U32(d), U32(4)))
            # Box-Muller gaussian perturbation (mlt_sampler.rs mutate)
            gauss = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(g1, 1e-12))) * \
                jnp.cos(2.0 * np.pi * g2)
            pert = u_cur[:, d] + sigma * gauss
            pert = pert - jnp.floor(pert)
            prop.append(jnp.where(large, fresh, pert))
        u_prop = jnp.stack(prop, -1)
        if target == "bdpt":
            L_prop, pf_prop = _eval_bdpt_target(cs, u_prop, max_depth,
                                                depth_lane)
        else:
            L_prop, pf_prop = _eval_target(cs, u_prop, max_depth)
        y_prop = luminance(L_prop)
        a = jnp.clip(y_prop / jnp.maximum(y_cur, 1e-12), 0.0, 1.0)

        # splat both states (mlt/mod.rs :305-340 weights)
        w_new = (a + large.astype(jnp.float32)) / jnp.maximum(y_prop / b + p_large, 1e-12)
        w_old = (1.0 - a) / jnp.maximum(y_cur / b + p_large, 1e-12)
        film = add_splats(cs.film, film, pf_prop, w_new[:, None] * L_prop)
        film = add_splats(cs.film, film, pf_cur, w_old[:, None] * L_cur)

        u_accept = u32_to_float(hash3(ci, su, U32(5)))
        acc = u_accept < a
        u_cur = jnp.where(acc[:, None], u_prop, u_cur)
        L_cur = jnp.where(acc[:, None], L_prop, L_cur)
        y_cur = jnp.where(acc, y_prop, y_cur)
        pf_cur = jnp.where(acc[:, None], pf_prop, pf_cur)
        return film, u_cur, L_cur, y_cur, pf_cur, jnp.sum(
            acc.astype(jnp.float32))

    import time as _time
    from pbrt_tpu.utils.stats import STATS
    t0 = _time.time()
    film = FilmState.zeros(cs.film)
    n_acc = jnp.float32(0)
    for step in range(n_steps):
        film, u_cur, L_cur, y_cur, pf_cur, acc_s = mlt_step(
            film, u_cur, L_cur, y_cur, pf_cur, jnp.uint32(step + 1))
        n_acc = n_acc + acc_s
        if verbose and (step + 1) % 50 == 0:
            print(f"  mlt step {step+1}/{n_steps}")
    # stats parity (mlt/mod.rs declares acceptance-rate stats)
    STATS.report_ratio("Integrator/Acceptance rate",
                       float(n_acc), float(n_steps * n_chains))
    STATS.report_counter("Integrator/MLT mutations", n_steps * n_chains)
    STATS.report_counter("Integrator/MLT bootstrap samples", n_bootstrap)
    STATS.report_distribution("Performance/MLT render seconds",
                              _time.time() - t0)

    # final image = splats / mutations_per_pixel. (The reference's write uses
    # b/mutationsPerPixel because its splat weights carry 1/b via the
    # y/b-normalized denominators per stream; with our single-stream weights
    # the b factors cancel exactly — verified against the path integrator.)
    scale = 1.0 / max(n_steps * n_chains / n_pix, 1e-9)
    return np.asarray(develop(cs.film, film, splat_scale=scale))
