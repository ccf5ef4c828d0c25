"""Subsurface (BSSRDF) transport through the path integrator.

Reference: path.rs:208-262 BSSRDF hook + tabulated_bssrdf.rs; our transport
is the Burley normalized-diffusion redesign (materials/bssrdf.py).
"""
import numpy as np
import pytest

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.render import render

SSS_SCENE = """
LookAt 0 2 5  0 0.5 0  0 1 0
Camera "perspective" "float fov" 35
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "02sequence" "integer pixelsamples" 16
Integrator "path" "integer maxdepth" 5
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
AttributeBegin
  Material "subsurface" "string name" "Marble" "float scale" 2
  Translate 0 0.5 0
  Shape "sphere" "float radius" 0.8
AttributeEnd
AttributeBegin
  Material "matte" "rgb Kd" [0.4 0.4 0.4]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-10 -0.3 -10  10 -0.3 -10  10 -0.3 10  -10 -0.3 10]
AttributeEnd
WorldEnd
"""


def test_subsurface_scene_renders_light():
    img = render(load_scene_string(SSS_SCENE))
    assert np.isfinite(img).all()
    # the sphere occupies the image center; diffusion transport must carry
    # energy through (marble is bright) — not black, not blowing up
    center = img[7:13, 7:13].mean()
    assert 0.05 < center < 3.0, center


def test_kdsubsurface_compiles_and_is_finite():
    scene = SSS_SCENE.replace(
        'Material "subsurface" "string name" "Marble" "float scale" 2',
        'Material "kdsubsurface" "rgb Kd" [0.5 0.3 0.2] "float mfp" 0.5')
    img = render(load_scene_string(scene))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
