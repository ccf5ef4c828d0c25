"""CLI: python -m pbrt_tpu [options] scene1.pbrt scene2.pbrt ...

Reference: bin/src/main.rs (:29 main, :56 render_all) + the clap flag set
(core/src/app/options.rs). GUI preview maps to --preview (periodic PNG
dumps; SURVEY: winit window explicitly not ported).
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pbrt_tpu",
                                 description="TPU-native pbrt-class renderer")
    ap.add_argument("scenes", nargs="+", help=".pbrt scene files")
    ap.add_argument("--quick", action="store_true",
                    help="quarter resolution, reduced spp")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--outfile", default="", help="override output filename")
    ap.add_argument("--cropwindow", nargs=4, type=float, default=None,
                    metavar=("X0", "X1", "Y0", "Y1"))
    ap.add_argument("--sppm-radius", type=float, default=0.0)
    ap.add_argument("--wavefront", type=int, default=1 << 17,
                    help="rays in flight per pass (replaces --nthreads/--tilesize)")
    ap.add_argument("--devices", type=int, default=0,
                    help="shard over N devices (0 = all)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stats", action="store_true", help="print statistics")
    ap.add_argument("--preview", type=int, default=0, metavar="N",
                    help="write the in-progress image every N sample batches")
    ap.add_argument("--checkpoint", default="", metavar="PATH",
                    help="checkpoint file (.npz) for save/resume")
    ap.add_argument("--checkpoint-every", type=int, default=0, metavar="N",
                    help="save a checkpoint every N sample batches")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint if it exists")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (cpu/tpu) even when the "
                         "environment pre-pins one")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    # persistent XLA compile cache (integrator graphs take minutes cold)
    import os
    import jax as _jax
    try:
        _jax.config.update("jax_compilation_cache_dir",
                           os.path.expanduser("~/.cache/pbrt_tpu_xla"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from pbrt_tpu.utils.options import set_options
    opts = set_options(quick=args.quick, quiet=args.quiet, outfile=args.outfile,
                       crop_window=tuple(args.cropwindow) if args.cropwindow else None,
                       sppm_radius=args.sppm_radius, wavefront_size=args.wavefront,
                       seed=args.seed, preview_every=args.preview,
                       devices=args.devices, checkpoint_path=args.checkpoint,
                       checkpoint_every=args.checkpoint_every,
                       resume=args.resume)

    from pbrt_tpu.render import render_file
    from pbrt_tpu.utils.stats import STATS
    for path in args.scenes:
        t0 = time.time()
        try:
            out, img = render_file(path, opts, verbose=not args.quiet)
        except Exception as e:  # noqa: BLE001 — log and continue (main.rs:63-66)
            print(f"error rendering {path}: {e}", file=sys.stderr)
            continue
        if not args.quiet:
            print(f"{path} -> {out}  ({time.time() - t0:.1f}s)")
        if args.stats:
            print(STATS.format())
            STATS.clear()
    return 0


if __name__ == "__main__":
    sys.exit(main())
