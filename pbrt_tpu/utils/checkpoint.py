"""Checkpoint/resume of progressive renders.

Reference gap (SURVEY sect. 5.4): the reference never serializes film state;
long SPPM/MLT runs cannot resume. Here the film accumulator pytree +
sample cursor IS the full renderer state (functional design), so checkpoints
are one np.savez and restarts are exact.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.film import FilmState


def save_checkpoint(path: str, film: FilmState, sample_index: int, meta: dict = None):
    # atomic: write a sibling temp file, then os.replace — a kill mid-save
    # (the exact scenario checkpointing exists for) must never leave a
    # truncated .npz at the resume path
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f,
                            rgb_sum=np.asarray(film.rgb_sum),
                            weight_sum=np.asarray(film.weight_sum),
                            splat=np.asarray(film.splat),
                            sample_index=np.int64(sample_index),
                            **{f"meta_{k}": v for k, v in (meta or {}).items()})
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """-> (FilmState, sample_index, meta) or None if absent/corrupt."""
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path)
        film = FilmState(jnp.asarray(z["rgb_sum"]), jnp.asarray(z["weight_sum"]),
                         jnp.asarray(z["splat"]))
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
        return film, int(z["sample_index"]), meta
    except Exception:
        return None   # corrupt checkpoint -> restart from scratch
