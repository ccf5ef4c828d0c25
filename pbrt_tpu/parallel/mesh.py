"""SPMD rendering over a jax.sharding.Mesh.

Reference parallel model: N CPU threads pull image tiles from a crossbeam
channel and merge FilmTiles under a lock (sampler_integrator.rs:251-296,
SURVEY sect. 2.6). TPU-native replacement (SURVEY sect. 5.8): the ray
wavefront is SHARDED statically over the device mesh ("rays" axis = the
DP/SP analog), the scene pytree is REPLICATED in HBM (it is read-only, like
the reference's Arc<Scene>), and the film merge is one psum over ICI —
deterministic, lock-free, no work queue. Load balance comes from shuffling
pixel->device assignment (camera rays are interleaved across devices), the
statistical analog of work stealing.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pbrt_tpu.film import FilmState, add_samples, develop
from pbrt_tpu.render import _sample_pixels, _li_fn
from pbrt_tpu.utils.options import OPTIONS


def make_ray_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("rays",))


def _pad_to(arr, m):
    pad = (-len(arr)) % m
    if pad:
        arr = np.concatenate([arr, arr[:pad]])
    return arr, pad


def render_sharded(cs, mesh: Mesh = None, options=None, verbose=False):
    """Multi-device render: returns final [H, W, 3] image (numpy).

    Feature parity with the single-device driver (render.py): device-side
    stat counters psum across the mesh (the reference's P8 thread-local ->
    global stats merge, stats/macros.rs), checkpoint/resume of the
    replicated film, and progressive preview dumps.
    """
    import functools
    import inspect
    options = options or OPTIONS
    mesh = mesh or make_ray_mesh()
    n_dev = mesh.devices.size
    li = _li_fn(cs)
    px, py = _sample_pixels(cs)
    # interleave pixels across devices for statistical load balance
    order = np.random.default_rng(0).permutation(len(px))
    px, py = px[order], py[order]
    px, _ = _pad_to(px, n_dev)
    py, _ = _pad_to(py, n_dev)
    n_pix = len(px)
    spp = cs.sampler.rounded_spp()
    if options and options.quick:
        spp = max(1, spp // 4)
    k = max(1, min(spp, options.wavefront_size * n_dev // max(n_pix, 1)))
    table = cs.film.filter_table()

    base_fn = li.func if isinstance(li, functools.partial) else li
    has_stats = (options.stats_device
                 and "with_stats" in inspect.signature(base_fn).parameters)

    def shard_step(pxs, pys, sidx):
        if has_stats:
            L, p_film, ray_w, cnt = li(cs, pxs, pys, sidx, with_stats=True)
            # P8: per-device counters merge across the mesh
            cnt = jax.tree.map(lambda x: jax.lax.psum(x, "rays"), cnt)
        else:
            L, p_film, ray_w = li(cs, pxs, pys, sidx)
            cnt = jnp.zeros(())
        local = add_samples(cs.film, FilmState.zeros(cs.film), p_film, L,
                            ray_w, table=table)
        return jax.lax.psum(local, "rays"), cnt

    sharded = shard_map(shard_step, mesh=mesh, check_vma=False,
                        in_specs=(P("rays"), P("rays"), P("rays")),
                        out_specs=(P(), P()))

    @functools.lru_cache(maxsize=None)
    def make_step(kk):
        @jax.jit
        def step(film, sample_lo):
            pxs = jnp.tile(jnp.asarray(px), (kk,))
            pys = jnp.tile(jnp.asarray(py), (kk,))
            sidx = (sample_lo
                    + jnp.repeat(jnp.arange(kk), n_pix)).astype(jnp.int32)
            f, cnt = sharded(pxs, pys, sidx)
            return FilmState(film.rgb_sum + f.rgb_sum,
                             film.weight_sum + f.weight_sum,
                             film.splat + f.splat), cnt
        return step

    from pbrt_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
    film = FilmState.zeros(cs.film)
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
        # clamp the batch to the remaining samples: overshooting spp would
        # fold extra sample indices into the estimator, so a resumed run
        # would not reproduce a straight-through one
        film, cnt = make_step(min(k, spp - s))(film, jnp.int32(s))
        if has_stats:
            cnt_total = cnt if cnt_total is None else \
                jax.tree.map(jnp.add, cnt_total, cnt)
        s += k
        batch += 1
        if ck and options.checkpoint_every \
                and batch % options.checkpoint_every == 0 and s < spp:
            save_checkpoint(ck, film, s)
        if options.preview_every and batch % options.preview_every == 0 \
                and s < spp:
            from pbrt_tpu.render import write_image
            prev = jax.tree.map(lambda x: x, film)
            write_image(options.preview_path
                        or (options.outfile or cs.film.filename),
                        np.asarray(develop(cs.film, prev)))
        if verbose:
            film.rgb_sum.block_until_ready()
            print(f"  spp {min(s, spp)}/{spp} over {n_dev} devices")
    if cnt_total is not None:
        from pbrt_tpu.utils.stats import STATS, merge_device_counters
        merge_device_counters(STATS, cnt_total)
    return np.asarray(develop(cs.film, film))
