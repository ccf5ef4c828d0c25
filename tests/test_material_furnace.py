"""Material-level image validation: furnace closure for every BSDF kind.

VERDICT r3 missing #6: the reference's 12 material fixture scenes
(/root/reference/scenes/materials/, USAGE.md:162-164) need unmounted
external assets; these self-authored furnace scenes replace them with
QUANTITATIVE assertions. Under a uniform white environment (L=1) an
energy-conserving BSDF ball must render ~1 where lossless (matte Kd=1,
mirror Kr=1, glass) and never exceed 1 (closure); lossy-but-sane kinds
(metal Fresnel, plastic/uber/substrate/translucent with 0.5/0.5 splits)
must stay in a physical band. fourier is excluded (needs a SCATFUN
asset, covered by tests/test_bsdf_extra.py); subsurface has its own
suite (tests/test_subsurface.py).
"""
import numpy as np
import pytest

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.render import render

MATS = [
    ('matte', 'Material "matte" "rgb Kd" [1 1 1]', 0.93, 1.05),
    ('mirror', 'Material "mirror" "rgb Kr" [1 1 1]', 0.93, 1.05),
    ('glass', 'Material "glass"', 0.90, 1.06),
    ('metal', 'Material "metal" "float roughness" 0.2', 0.55, 1.05),
    ('plastic', 'Material "plastic" "rgb Kd" [.5 .5 .5] "rgb Ks" [.5 .5 .5]',
     0.60, 1.05),
    ('uber', 'Material "uber" "rgb Kd" [.5 .5 .5] "rgb Ks" [.5 .5 .5]',
     0.60, 1.05),
    ('substrate',
     'Material "substrate" "rgb Kd" [.5 .5 .5] "rgb Ks" [.5 .5 .5]',
     0.60, 1.05),
    ('translucent', 'Material "translucent"', 0.60, 1.05),
    ('mix',
     'MakeNamedMaterial "a" "string type" "matte" "rgb Kd" [1 1 1]\n'
     '  MakeNamedMaterial "b" "string type" "mirror" "rgb Kr" [1 1 1]\n'
     '  Material "mix" "string namedmaterial1" "a" "string namedmaterial2" "b"',
     0.85, 1.06),
]


def furnace_scene(mat_line):
    return f"""
LookAt 0 0 5  0 0 0  0 1 0
Camera "orthographic" "float screenwindow" [-1.3 1.3 -1.3 1.3]
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "02sequence" "integer pixelsamples" 8
Integrator "path" "integer maxdepth" 8
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
AttributeBegin
  {mat_line}
  Shape "sphere" "float radius" 1
AttributeEnd
WorldEnd
"""


@pytest.mark.parametrize("name,mat,lo,hi", MATS)
def test_furnace_closure(name, mat, lo, hi):
    img = render(load_scene_string(furnace_scene(mat)))
    # center block: sphere fills [-1,1] of the [-1.3,1.3] window
    c = img[7:13, 7:13].mean()
    assert np.isfinite(img).all(), name
    assert lo < c < hi, f"{name}: furnace mean {c:.4f} not in ({lo},{hi})"
