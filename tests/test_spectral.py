"""SampledSpectrum render mode (VERDICT r4 missing #1).

Reference: core/src/spectrum/sampled_spectrum.rs:16 renders with 60-bin
spectra behind the sampled-spectrum feature (core/src/spectrum/mod.rs:16-34).
Here the switch is per-scene (`Integrator "path" "bool spectral" "true"`,
scene/types.py SceneFlags.spectral): colors widen to 60 bins at the
material/light boundaries and convert back at the film (core/spectrum.py).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.core import spectrum as S
from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.render import render


def test_rgb_spectrum_roundtrip_exact():
    """The solved Smits-style bases reproduce their RGB exactly (the
    active-set solve keeps A s = rgb feasible even for saturated colors)."""
    rgbs = np.array([[1, 1, 1], [0.4, 0.6, 0.8], [0.8, 0.2, 0.1],
                     [0.1, 0.9, 0.3], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [0.5, 0.5, 0.5], [0, 0, 0]], np.float32)
    back = np.asarray(S.spectrum_to_rgb(S.rgb_to_spectrum(jnp.asarray(rgbs))))
    assert np.abs(back - rgbs).max() < 2e-3


def test_spectrum_nonnegative_and_smooth():
    sp = np.asarray(S.rgb_to_spectrum(jnp.asarray([[0.2, 0.7, 0.4]])))[0]
    assert (sp >= 0).all()
    # smooth metamer: bounded second difference relative to magnitude
    d2 = np.abs(np.diff(sp, 2))
    assert d2.max() < 0.2 * (sp.max() + 1e-6)


SCENE = """
LookAt 0 0 5  0 0 0  0 1 0
Camera "orthographic" "float screenwindow" [-1.3 1.3 -1.3 1.3]
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Sampler "02sequence" "integer pixelsamples" 8
Integrator "path" "integer maxdepth" 4 {SPECTRAL}
WorldBegin
LightSource "infinite" "rgb L" [{LIGHT}]
AttributeBegin
  Material "matte" "rgb Kd" [{KD}]
  Shape "sphere" "float radius" 1
AttributeEnd
WorldEnd
"""


def _render_pair(light, kd):
    imgs = {}
    for mode, tok in (("rgb", ""), ("spec", '"bool spectral" "true"')):
        sc = load_scene_string(SCENE.replace("{SPECTRAL}", tok)
                               .replace("{LIGHT}", light).replace("{KD}", kd))
        if mode == "spec":
            assert sc.flags.spectral, "spectral flag not set"
        imgs[mode] = np.asarray(render(sc))
    return imgs["rgb"], imgs["spec"]


def test_spectral_furnace_matches_rgb():
    """White furnace, colored matte ball: spectral pipeline agrees with RGB
    within the metamer-product tolerance."""
    rgb, spec = _render_pair("1 1 1", ".4 .6 .8")
    c_rgb = rgb[4:8, 4:8].mean(axis=(0, 1))
    c_spec = spec[4:8, 4:8].mean(axis=(0, 1))
    assert np.isfinite(spec).all()
    assert np.abs(c_spec - c_rgb).max() < 0.04, (c_rgb, c_spec)


def test_spectral_blackbody_illuminant():
    """Blackbody-colored illuminant (3000K RGB from the Planck utilities):
    spectral vs RGB render agree — colored-light x colored-surface products
    differ only by the documented metamer tolerance."""
    bb = S.blackbody_normalized_rgb(3000.0, scale=2.0)
    light = " ".join(f"{v:.5f}" for v in bb)
    rgb, spec = _render_pair(light, ".6 .5 .4")
    c_rgb = rgb[4:8, 4:8].mean(axis=(0, 1))
    c_spec = spec[4:8, 4:8].mean(axis=(0, 1))
    rel = np.abs(c_spec - c_rgb) / np.maximum(np.abs(c_rgb), 1e-3)
    assert rel.max() < 0.12, (c_rgb, c_spec)
