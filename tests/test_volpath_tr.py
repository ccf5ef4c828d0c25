"""Shadow-ray transmittance through null interfaces (intersect_tr).

Reference: core/src/scene.rs:106 Scene::intersect_tr +
core/src/light/visibility_tester.rs tr(). A point light shining through a
medium-filled null-material sphere must be attenuated by exp(-sigma_t * s),
NOT blacked out (the round-1 code treated any surface, including null
medium interfaces, as an occluder).
"""
import numpy as np
import pytest

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.render import render

I = 40.0
KD = 0.6
SIGMA = 0.4


def scene(with_shell):
    shell = f"""
AttributeBegin
  Material ""
  MediumInterface "smoke" ""
  Translate 0 2 0
  Shape "sphere" "float radius" 1
AttributeEnd
""" if with_shell else ""
    return f"""
LookAt 0 0.9 6  0 0 0  0 1 0
Camera "perspective" "float fov" 25
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "02sequence" "integer pixelsamples" 8
Integrator "volpath" "integer maxdepth" 2
WorldBegin
MakeNamedMedium "smoke" "string type" "homogeneous"
  "rgb sigma_a" [{SIGMA} {SIGMA} {SIGMA}] "rgb sigma_s" [0 0 0]
LightSource "point" "point from" [0 4 0] "rgb I" [{I} {I} {I}]
{shell}
AttributeBegin
  Material "matte" "rgb Kd" [{KD} {KD} {KD}]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-10 0 -10  10 0 -10  10 0 10  -10 0 10]
AttributeEnd
WorldEnd
"""


def _center_lum(img):
    h, w, _ = img.shape
    return float(img[h // 2 - 1:h // 2 + 1, w // 2 - 1:w // 2 + 1].mean())


@pytest.mark.heavy
def test_shadow_through_null_interface_attenuates():
    """Plane point under the sphere: chord length 2 -> Tr = exp(-2 sigma)."""
    img_clear = render(load_scene_string(scene(False)))
    img_smoke = render(load_scene_string(scene(True)))
    base = KD / np.pi * I / 16.0          # d=4, cos=1
    np.testing.assert_allclose(_center_lum(img_clear), base, rtol=0.05)
    want = base * np.exp(-2.0 * SIGMA)
    got = _center_lum(img_smoke)
    assert got > 0.1 * base, "null interface must not hard-occlude the light"
    np.testing.assert_allclose(got, want, rtol=0.12)
