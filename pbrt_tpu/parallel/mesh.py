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
    """Multi-device render: returns final [H, W, 3] image (numpy)."""
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

    def shard_step(pxs, pys, sidx):
        L, p_film, ray_w = li(cs, pxs, pys, sidx)
        local = add_samples(cs.film, FilmState.zeros(cs.film), p_film, L,
                            ray_w, table=table)
        return jax.lax.psum(local, "rays")

    sharded = shard_map(shard_step, mesh=mesh, check_vma=False,
                        in_specs=(P("rays"), P("rays"), P("rays")),
                        out_specs=P())

    @jax.jit
    def step(film, sample_lo):
        pxs = jnp.tile(jnp.asarray(px), (k,))
        pys = jnp.tile(jnp.asarray(py), (k,))
        sidx = (sample_lo + jnp.repeat(jnp.arange(k), n_pix)).astype(jnp.int32)
        f = sharded(pxs, pys, sidx)
        return FilmState(film.rgb_sum + f.rgb_sum,
                         film.weight_sum + f.weight_sum,
                         film.splat + f.splat)

    film = FilmState.zeros(cs.film)
    s = 0
    while s < spp:
        film = step(film, jnp.int32(s))
        s += k
    return np.asarray(develop(cs.film, film))
