"""Sweep candidate reference fixture scenes for golden-test viability.

Renders each self-contained scene's center crop (CPU) and reports the
block-mean MAD vs the reference's committed PNG. Used to pick the golden
set in tests/test_golden.py.
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), "tests", ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
import test_golden as G  # noqa: E402

CANDIDATES = [
    ("cameras/perspective.pbrt", "cameras/perspective.png"),
    ("cameras/orthographic.pbrt", "cameras/orthographic.png"),
    ("cameras/environment.pbrt", "cameras/environment.png"),
    ("cameras/depth-of-field.pbrt", "cameras/depth-of-field.png"),
    ("geometry/cube.pbrt", None),
    ("lights/goniometric.pbrt", "lights/goniometric.png"),
    ("objects/instances.pbrt", "objects/instances.png"),
    ("samplers/random.pbrt", "samplers/random.png"),
    ("samplers/stratified.pbrt", "samplers/stratified.png"),
    ("samplers/halton.pbrt", "samplers/halton.png"),
    ("samplers/sobol.pbrt", "samplers/sobol.png"),
    ("samplers/02sequence.pbrt", "samplers/02sequence.png"),
    ("samplers/maxmindist.pbrt", "samplers/maxmindist.png"),
    ("shapes/triangles-alpha-mask.pbrt", "shapes/triangles-alpha-mask.png"),
    ("textures/2d-mappings.pbrt", "textures/2d-mappings.png"),
    ("textures/bilerp.pbrt", "textures/bilerp.png"),
    ("textures/constant.pbrt", "textures/constant.png"),
    ("textures/dots.pbrt", "textures/dots.png"),
    ("textures/fbm.pbrt", "textures/fbm.png"),
    ("textures/marble.pbrt", "textures/marble.png"),
    ("textures/mix.pbrt", "textures/mix.png"),
    ("textures/scale.pbrt", "textures/scale.png"),
    ("textures/uv.pbrt", "textures/uv.png"),
    ("textures/windy.pbrt", "textures/windy.png"),
    ("textures/wrinkled.pbrt", "textures/wrinkled.png"),
    ("test/example.pbrt", "test/example.png"),
]


def main():
    for scene, png in CANDIDATES:
        if png is None:
            print(f"{scene}: no reference png, skip", flush=True)
            continue
        try:
            mad, mx = G._compare(scene, png, tol=1e9)
            print(f"{scene}: MAD={mad:.4f} max-block={mx:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{scene}: FAIL {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
