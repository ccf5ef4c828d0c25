"""Render driver: CompiledScene -> image.

The analog of pbrt_world_end's render drive (api/src/lib.rs:447-507) and the
reference's tile loop (sampler_integrator.rs:243-300), TPU-first: instead of
CPU threads pulling tiles off a channel, ONE jitted step renders a whole
sample-index wavefront (all pixels x spp_batch) and deposits into the film
pytree with donated buffers; the host loops over sample batches. Under a
device mesh the same step shards rays and psum-reduces film (parallel/).
"""
from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.film import FilmState, add_samples, develop
from pbrt_tpu.scene.types import CompiledScene
from pbrt_tpu.utils.options import OPTIONS
from pbrt_tpu.io.image_io import write_image


def _morton2_np(x, y, bits=16):
    m = np.zeros_like(x, dtype=np.uint64)
    for b in range(bits):
        m |= np.uint64(((x >> b) & 1).astype(np.uint64) << np.uint64(2 * b)) \
            | np.uint64(((y >> b) & 1).astype(np.uint64) << np.uint64(2 * b + 1))
    return m


def _sample_pixels(cs):
    """All pixel coords in the film's sample bounds, in Morton order (host).

    Wavefront lanes are dispatched in this order; the Pallas traversal
    kernel's 128-lane packets then cover compact ~11x11 pixel tiles instead
    of 2 full raster rows — 3.5x faster traversal (tools/bench_order.py).
    The film deposit is a scatter-add, so pixel order is free to choose."""
    x0, x1, y0, y1 = cs.film.sample_bounds
    xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
    xs = xs.ravel().astype(np.int32)
    ys = ys.ravel().astype(np.int32)
    order = np.argsort(_morton2_np(xs - x0, ys - y0), kind="stable")
    return xs[order], ys[order]


def _li_fn(cs):
    kind = cs.integrator_kind
    p = cs.integrator_params
    if kind == "path":
        from pbrt_tpu.integrators.path import li_path
        max_depth = int(p.get("maxdepth", [5])[0])
        rr = float(p.get("rrthreshold", [1.0])[0])
        return functools.partial(li_path, max_depth=max_depth, rr_threshold=rr)
    if kind == "volpath":
        from pbrt_tpu.integrators.volpath import li_volpath
        max_depth = int(p.get("maxdepth", [5])[0])
        rr = float(p.get("rrthreshold", [1.0])[0])
        return functools.partial(li_volpath, max_depth=max_depth, rr_threshold=rr)
    if kind == "whitted":
        from pbrt_tpu.integrators.whitted import li_whitted
        return functools.partial(li_whitted, max_depth=int(p.get("maxdepth", [5])[0]))
    if kind == "directlighting":
        from pbrt_tpu.integrators.direct import li_direct
        return functools.partial(
            li_direct, max_depth=int(p.get("maxdepth", [5])[0]),
            strategy=str(p.get("strategy", ["all"])[0]))
    # bdpt/mlt/sppm have their own render drivers (integrators/<name>.py)
    from pbrt_tpu.integrators.path import li_path
    return functools.partial(li_path, max_depth=int(p.get("maxdepth", [5])[0]))


def render(cs: CompiledScene, options=None, verbose=False):
    """Returns the final [H, W, 3] linear RGB image (numpy)."""
    options = options or OPTIONS
    kind = cs.integrator_kind
    if kind == "sppm":
        from pbrt_tpu.integrators.sppm import render_sppm
        return render_sppm(cs, options, verbose)
    if kind == "bdpt":
        from pbrt_tpu.integrators.bdpt import render_bdpt
        return render_bdpt(cs, options, verbose)
    if kind == "mlt":
        from pbrt_tpu.integrators.mlt import render_mlt
        return render_mlt(cs, options, verbose)
    if options.devices and options.devices > 1:
        from pbrt_tpu.parallel.mesh import render_sharded, make_ray_mesh
        return render_sharded(cs, make_ray_mesh(options.devices), options, verbose)
    return render_sampler_integrator(cs, options, verbose)


def render_sampler_integrator(cs: CompiledScene, options=None, verbose=False,
                              li_fn=None):
    options = options or OPTIONS
    px, py = _sample_pixels(cs)
    n_pix = px.shape[0]
    spp = cs.sampler.rounded_spp()
    if options.quick:
        spp = max(1, spp // 4)
    li = li_fn or _li_fn(cs)

    # batch: k sample-indices per pass so a pass is >= ~64k rays
    k = max(1, min(spp, options.wavefront_size // max(n_pix, 1)))
    table = cs.film.filter_table()

    # device-counter stats ride the step iff the integrator supports them
    import inspect
    base_fn = li.func if isinstance(li, functools.partial) else li
    has_stats = (options.stats_device
                 and "with_stats" in inspect.signature(base_fn).parameters)

    @functools.lru_cache(maxsize=None)
    def make_step(kk):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(film, sample_lo):
            pxs = jnp.tile(jnp.asarray(px), (kk,))
            pys = jnp.tile(jnp.asarray(py), (kk,))
            sidx = (sample_lo
                    + jnp.repeat(jnp.arange(kk), n_pix)).astype(jnp.int32)
            if has_stats:
                L, p_film, ray_w, cnt = li(cs, pxs, pys, sidx, with_stats=True)
            else:
                L, p_film, ray_w = li(cs, pxs, pys, sidx)
                cnt = None
            return add_samples(cs.film, film, p_film, L, ray_w,
                               table=table), cnt
        return step

    from pbrt_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
    film = FilmState.zeros(cs.film)
    t0 = time.time()
    s = 0
    batch = 0
    ck = options.checkpoint_path
    if ck and options.resume:
        loaded = load_checkpoint(ck)
        if loaded is not None:
            film, s, _ = loaded
            if verbose:
                print(f"  resumed from {ck} at spp {s}/{spp}")
    cnt_total = None
    while s < spp:
        # clamp to remaining samples (resume parity: no overshoot past spp)
        film, cnt = make_step(min(k, spp - s))(film, jnp.int32(s))
        if cnt is not None:
            cnt_total = cnt if cnt_total is None else \
                jax.tree.map(jnp.add, cnt_total, cnt)
        s += k
        batch += 1
        if ck and options.checkpoint_every \
                and batch % options.checkpoint_every == 0 and s < spp:
            save_checkpoint(ck, film, s)
        if verbose:
            film.rgb_sum.block_until_ready()
            done = min(s, spp)
            el = time.time() - t0
            print(f"  spp {done}/{spp}  ({el:.1f}s, {n_pix*done/max(el,1e-9)/1e6:.2f} Mpaths/s)")
        if options.preview_every and batch % options.preview_every == 0 and s < spp:
            # progressive preview (GUI analog): develop a copy, keep rendering
            prev = jax.tree.map(lambda x: x, film)
            img = develop(cs.film, prev)
            write_image(options.preview_path or (options.outfile or cs.film.filename),
                        np.asarray(img))
    img = develop(cs.film, film)

    # render statistics (reference stats registry analog, utils/stats.py)
    from pbrt_tpu.utils.stats import STATS, merge_device_counters
    el = time.time() - t0
    if cnt_total is not None:
        merge_device_counters(STATS, cnt_total)
    STATS.report_counter("Integrator/Camera rays traced", n_pix * spp)
    STATS.report_counter("Integrator/Sample batches", batch)
    STATS.report_counter("Integrator/Wavefront size", n_pix * k)
    STATS.report_distribution("Performance/Mpaths per second",
                              n_pix * spp / max(el, 1e-9) / 1e6)
    STATS.report_counter("Memory/Film pixels",
                         cs.film.full_resolution[0] * cs.film.full_resolution[1])
    STATS.report_ratio("Film/Nonzero pixels",
                       float((np.asarray(img).sum(-1) > 0).sum()),
                       float(np.asarray(img).shape[0] * np.asarray(img).shape[1]))
    return np.asarray(img)


def render_file(path: str, options=None, verbose=False):
    """Parse, render, write (bin/src/main.rs render())."""
    from pbrt_tpu.scene import load_scene
    options = options or OPTIONS
    cs = load_scene(path, options)
    img = render(cs, options, verbose)
    out = options.outfile or cs.film.filename
    write_image(out, img)
    return out, img
