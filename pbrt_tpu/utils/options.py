"""Global run-shape options (reference: core/src/app/options.rs).

The reference keeps a clap-derive singleton with --nthreads/--tilesize etc.
The TPU analog replaces thread/tile knobs with wavefront/device-mesh knobs:
wavefront size, spp batching, mesh axis sizes. A module-level mutable
singleton `OPTIONS` mirrors the reference's LazyLock OPTIONS.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class Options:
    # reference-compatible flags (options.rs:9-96)
    quick: bool = False          # quarter resolution, reduced spp
    quiet: bool = False
    outfile: str = ""            # overrides Film "filename"
    crop_window: Optional[Tuple[float, float, float, float]] = None
    sppm_radius: float = 0.0     # override SPPM initial radius
    # TPU-native run shape (replaces --nthreads/--tilesize)
    wavefront_size: int = 1 << 17   # rays in flight per device per pass
    spp_batch: int = 0              # 0 = auto: chosen so wavefront fits
    mesh_shape: Tuple[int, ...] = ()  # () = single device
    devices: int = 0                # shard rays over N devices (0/1 = single)
    mesh_axis_names: Tuple[str, ...] = ("rays",)
    donate_film: bool = True
    precision: str = "f32"          # radiance accumulation precision
    seed: int = 0
    # progressive preview: write the in-progress image every N sample
    # batches (0 = off). TPU-native replacement of the reference's winit
    # GUI tile preview (core/src/app/gui.rs)
    preview_every: int = 0
    preview_path: str = ""
    # checkpoint/resume (SURVEY sect. 5.4): film pytree + sample cursor is
    # the whole renderer state, so checkpoints are exact
    checkpoint_path: str = ""
    checkpoint_every: int = 0       # save every N sample batches (0 = off)
    resume: bool = False            # resume from checkpoint_path if present
    stats_device: bool = True       # thread device counters through the step

    def copy(self) -> "Options":
        return dataclasses.replace(self)


OPTIONS = Options()


def set_options(**kw) -> Options:
    for k, v in kw.items():
        if not hasattr(OPTIONS, k):
            raise ValueError(f"unknown option {k!r}")
        setattr(OPTIONS, k, v)
    return OPTIONS
