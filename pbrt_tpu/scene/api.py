"""Scene-compiler state machine: directives -> host SceneDescription.

Reference: api/src/lib.rs (Api FSM: Uninitialized/OptionsBlock/WorldBlock,
CTM + attribute stacks, object instancing, WorldEnd render driving) and
api/src/graphics_state.rs (the name->plugin registry). Here the "plugins"
are table rows: each directive appends typed records that scene/build.py
flattens into device arrays. Object instances are baked (geometry duplicated
under the instance CTM) — the TPU analog of TransformedPrimitive for static
scenes; a two-level BVH is a later optimization.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from pbrt_tpu.core import transform as tf
from pbrt_tpu.core.transform import Transform
from pbrt_tpu.scene.paramset import ParamSet

MAX_TRANSFORMS = 2
START_BIT, END_BIT = 1, 2
ALL_BITS = START_BIT | END_BIT


@dataclasses.dataclass
class TextureDecl:
    kind: str
    ttype: str                      # "float" | "spectrum"
    params: ParamSet
    # resolved child texture ids (scale/mix/checker inner textures)
    children: Dict[str, int] = dataclasses.field(default_factory=dict)
    world_to_texture: Optional[np.ndarray] = None   # 3D mappings
    name: str = ""


@dataclasses.dataclass
class MaterialDecl:
    kind: str
    params: ParamSet
    # param name -> texture id (resolved from the graphics state's maps)
    tex_refs: Dict[str, int] = dataclasses.field(default_factory=dict)
    # mix material children (material ids)
    children: Tuple[int, int] = (-1, -1)


@dataclasses.dataclass
class ShapeRecord:
    kind: str                       # trianglemesh | quadric kinds | curve
    mesh: object = None             # TriangleMeshData for meshes
    quad_type: int = -1
    quad_params: Optional[np.ndarray] = None
    quad_area: float = 0.0
    o2w: Optional[np.ndarray] = None
    w2o: Optional[np.ndarray] = None
    material: int = -1
    area_light: int = -1            # filled when an area light wraps this
    reverse_orientation: bool = False
    medium_inside: str = ""
    medium_outside: str = ""



@dataclasses.dataclass
class LightRecord:
    kind: str
    params: ParamSet
    l2w: np.ndarray
    w2l: np.ndarray
    shape_index: int = -1           # area lights: index into shapes
    medium: str = ""                # ambient medium at declaration (the
                                    # emitter's MediumInterface outside)


@dataclasses.dataclass
class GraphicsState:
    material: int = 0               # current material id (0 = default matte)
    float_textures: Dict[str, int] = dataclasses.field(default_factory=dict)
    spectrum_textures: Dict[str, int] = dataclasses.field(default_factory=dict)
    named_materials: Dict[str, int] = dataclasses.field(default_factory=dict)
    area_light: Optional[Tuple[str, ParamSet]] = None
    reverse_orientation: bool = False
    medium_inside: str = ""
    medium_outside: str = ""

    def clone(self):
        return GraphicsState(self.material, dict(self.float_textures),
                             dict(self.spectrum_textures), dict(self.named_materials),
                             self.area_light, self.reverse_orientation,
                             self.medium_inside, self.medium_outside)


class TransformSet:
    """CTM pair for animation (api/src/transform_set.rs)."""

    def __init__(self):
        self.t = [Transform(), Transform()]

    def clone(self):
        ts = TransformSet()
        ts.t = list(self.t)
        return ts

    def is_animated(self):
        return not np.allclose(self.t[0].m, self.t[1].m)


class SceneDescription:
    """Everything build.py needs, accumulated host-side."""

    def __init__(self):
        self.textures: List[TextureDecl] = []
        self.materials: List[MaterialDecl] = []
        self.shapes: List[ShapeRecord] = []
        self.lights: List[LightRecord] = []
        self.media: Dict[str, Tuple[str, ParamSet]] = {}
        # shared-prototype instancing (TransformedPrimitive analog,
        # core/src/primitives/transformed_primitive.rs): prototypes hold
        # geometry ONCE; instances reference it with a (possibly animated)
        # transform pair. Filled by Api.object_instance / animated shapes.
        self.prototypes: List[List[ShapeRecord]] = []
        self.instances: List[dict] = []
        # global options
        self.camera_kind = "perspective"
        self.camera_params = ParamSet()
        self.camera_to_world = (Transform(), Transform())
        self.camera_times = (0.0, 1.0)
        self.sampler_kind = "halton"
        self.sampler_params = ParamSet()
        self.camera_medium_name = ""

        self.film_params = ParamSet()
        self.filter_kind = "box"
        self.filter_params = ParamSet()
        self.integrator_kind = "path"
        self.integrator_params = ParamSet()
        self.accelerator_kind = "bvh"
        self.accelerator_params = ParamSet()
        # default material 0 = matte
        self.materials.append(MaterialDecl("matte", ParamSet()))


class Api:
    """The pbrt_* directive surface (api/src/lib.rs:50,85)."""

    def __init__(self):
        self.scene = SceneDescription()
        self.ctm = TransformSet()
        self.active = ALL_BITS
        self.named_coord_systems: Dict[str, TransformSet] = {}
        self.gs = GraphicsState()
        self.attr_stack: List[Tuple[GraphicsState, TransformSet]] = []
        self.xform_stack: List[TransformSet] = []
        self.in_world = False
        # object instancing
        self.current_object: Optional[str] = None
        self.objects: Dict[str, List[ShapeRecord]] = {}
        self.proto_ids: Dict[str, int] = {}
        self._transform_times = (0.0, 1.0)

    # -- transforms ------------------------------------------------------
    def _apply(self, t: Transform):
        for i in range(MAX_TRANSFORMS):
            if self.active & (1 << i):
                self.ctm.t[i] = self.ctm.t[i] * t

    def identity(self):
        for i in range(MAX_TRANSFORMS):
            if self.active & (1 << i):
                self.ctm.t[i] = Transform()

    def translate(self, x, y, z):
        self._apply(tf.translate([x, y, z]))

    def scale(self, x, y, z):
        self._apply(tf.scale([x, y, z]))

    def rotate(self, angle, x, y, z):
        self._apply(tf.rotate(angle, [x, y, z]))

    def look_at(self, ex, ey, ez, lx, ly, lz, ux, uy, uz):
        # LookAt gives world->camera as the CTM contribution (cam2world inverse)
        c2w = tf.look_at([ex, ey, ez], [lx, ly, lz], [ux, uy, uz])
        self._apply(c2w.inverse())

    def transform(self, *m16):
        t = Transform(np.asarray(m16, np.float32).reshape(4, 4).T)
        for i in range(MAX_TRANSFORMS):
            if self.active & (1 << i):
                self.ctm.t[i] = t

    def concat_transform(self, *m16):
        self._apply(Transform(np.asarray(m16, np.float32).reshape(4, 4).T))

    def coordinate_system(self, name):
        self.named_coord_systems[name] = self.ctm.clone()

    def coord_sys_transform(self, name):
        if name in self.named_coord_systems:
            self.ctm = self.named_coord_systems[name].clone()

    def active_transform(self, which):
        self.active = {"All": ALL_BITS, "StartTime": START_BIT,
                       "EndTime": END_BIT}.get(which, ALL_BITS)

    def transform_times(self, t0, t1):
        self._transform_times = (t0, t1)

    def transform_begin(self):
        self.xform_stack.append(self.ctm.clone())

    def transform_end(self):
        self.ctm = self.xform_stack.pop()

    def attribute_begin(self):
        self.attr_stack.append((self.gs.clone(), self.ctm.clone()))

    def attribute_end(self):
        self.gs, self.ctm = self.attr_stack.pop()

    def reverse_orientation(self):
        self.gs.reverse_orientation = not self.gs.reverse_orientation

    # -- options ---------------------------------------------------------
    def camera(self, kind, ps):
        self.scene.camera_kind = kind
        self.scene.camera_params = ps
        self.scene.camera_medium_name = self.gs.medium_outside
        # CTM here is world->camera; camera_to_world is its inverse
        self.scene.camera_to_world = (self.ctm.t[0].inverse(), self.ctm.t[1].inverse())
        self.named_coord_systems["camera"] = self.ctm.clone()

    def sampler(self, kind, ps):
        self.scene.sampler_kind = kind
        self.scene.sampler_params = ps

    def film(self, kind, ps):
        self.scene.film_params = ps

    def pixel_filter(self, kind, ps):
        self.scene.filter_kind = kind
        self.scene.filter_params = ps

    def integrator(self, kind, ps):
        self.scene.integrator_kind = kind
        self.scene.integrator_params = ps

    def accelerator(self, kind, ps):
        self.scene.accelerator_kind = kind
        self.scene.accelerator_params = ps

    def option(self, name, ps):
        pass

    # -- world -----------------------------------------------------------
    def world_begin(self):
        self.in_world = True
        self.ctm = TransformSet()
        self.named_coord_systems["world"] = self.ctm.clone()

    def world_end(self):
        self.in_world = False

    # -- textures / materials -------------------------------------------
    def texture(self, name, ttype, tclass, ps: ParamSet):
        decl = TextureDecl(tclass, "float" if ttype == "float" else "spectrum",
                           ps, name=name)
        # resolve nested texture refs against current maps
        for pname in list(ps.values.keys()):
            if ps.is_texture(pname):
                tname = ps.texture_name(pname)
                tid = self.gs.float_textures.get(tname,
                                                 self.gs.spectrum_textures.get(tname, -1))
                if tid >= 0:
                    decl.children[pname] = tid
        if tclass in ("checkerboard", "dots", "fbm", "wrinkled", "windy", "marble"):
            # 3D mappings use world->texture = inverse CTM
            decl.world_to_texture = self.ctm.t[0].m_inv.copy()
        tid = len(self.scene.textures)
        self.scene.textures.append(decl)
        if decl.ttype == "float":
            self.gs.float_textures[name] = tid
        else:
            self.gs.spectrum_textures[name] = tid
        return tid

    def _make_material(self, kind, ps: ParamSet) -> int:
        decl = MaterialDecl(kind, ps)
        for pname in list(ps.values.keys()):
            if ps.is_texture(pname):
                tname = ps.texture_name(pname)
                tid = self.gs.spectrum_textures.get(
                    tname, self.gs.float_textures.get(tname, -1))
                if tid >= 0:
                    decl.tex_refs[pname] = tid
        if kind == "mix":
            m1 = self.gs.named_materials.get(ps.find_one_string("namedmaterial1", ""), 0)
            m2 = self.gs.named_materials.get(ps.find_one_string("namedmaterial2", ""), 0)
            decl.children = (m1, m2)
        if kind == "":
            kind = "none"
            decl.kind = "none"
        self.scene.materials.append(decl)
        return len(self.scene.materials) - 1

    def material(self, kind, ps):
        self.gs.material = self._make_material(kind, ps)

    def make_named_material(self, name, ps):
        kind = ps.find_one_string("type", "matte")
        self.gs.named_materials[name] = self._make_material(kind, ps)

    def named_material(self, name):
        self.gs.material = self.gs.named_materials.get(name, 0)

    # -- lights ----------------------------------------------------------
    def light_source(self, kind, ps):
        l2w = self.ctm.t[0]
        self.scene.lights.append(LightRecord(kind, ps, l2w.m.copy(),
                                             l2w.m_inv.copy(),
                                             medium=self.gs.medium_outside))

    def area_light_source(self, kind, ps):
        self.gs.area_light = (kind, ps)

    # -- media -----------------------------------------------------------
    def make_named_medium(self, name, ps):
        kind = ps.find_one_string("type", "homogeneous")
        self.scene.media[name] = (kind, ps, self.ctm.t[0].m.copy())

    def medium_interface(self, inside, outside):
        self.gs.medium_inside = inside
        self.gs.medium_outside = outside

    # -- shapes ----------------------------------------------------------
    def shape(self, kind, ps: ParamSet):
        from pbrt_tpu.shapes.factory import make_shapes
        o2w = self.ctm.t[0]
        records = make_shapes(kind, ps, o2w, self)
        for rec in records:
            rec.material = self.gs.material
            rec.reverse_orientation = self.gs.reverse_orientation
            rec.medium_inside = self.gs.medium_inside
            rec.medium_outside = self.gs.medium_outside
            if self.gs.area_light is not None:
                akind, aps = self.gs.area_light
                li = len(self.scene.lights)
                self.scene.lights.append(LightRecord(
                    "area", aps, o2w.m.copy(), o2w.m_inv.copy(),
                    shape_index=-1))  # patched after append below
                rec.area_light = li
            if self.current_object is not None:
                self.objects[self.current_object].append(rec)
            elif (self.ctm.is_animated() and rec.mesh is not None
                  and rec.area_light < 0):
                # animated shape -> implicit single-instance prototype with
                # the CTM pair as its motion (api/src/lib.rs:813-874 wraps
                # animated shapes in a TransformedPrimitive). Vertices carry
                # the START transform, so the instance motion is the delta.
                pid = len(self.scene.prototypes)
                self.scene.prototypes.append([rec])
                m0 = Transform()                       # identity at t0
                m1 = self.ctm.t[1] * self.ctm.t[0].inverse()
                self.scene.instances.append(dict(
                    proto=pid,
                    m_p2w0=m0.m.copy(), m_w2p0=m0.m_inv.copy(),
                    m_p2w1=m1.m.copy(), m_w2p1=m1.m_inv.copy(),
                    animated=True))
            else:
                idx = len(self.scene.shapes)
                self.scene.shapes.append(rec)
                if rec.area_light >= 0:
                    self.scene.lights[rec.area_light].shape_index = idx

    # -- instancing ------------------------------------------------------
    def object_begin(self, name):
        self.attribute_begin()
        self.current_object = name
        self.objects[name] = []

    def object_end(self):
        self.current_object = None
        self.attribute_end()

    def object_instance(self, name):
        """Instance the named prototype under the current CTM
        (api/src/lib.rs:909-988; transformed_primitive.rs).

        Pure triangle-mesh prototypes without area lights share ONE copy of
        their geometry behind a per-instance transform — a 1000-instance
        scene stays O(prototype) HBM, and the transform pair carries motion
        blur. Prototypes with quadrics or emitters fall back to baking
        (geometry duplicated per instance), the round-1/2 behavior."""
        recs = self.objects.get(name, [])
        shared_ok = recs and all(r.mesh is not None and r.area_light < 0
                                 for r in recs)
        if shared_ok:
            if name not in self.proto_ids:
                self.proto_ids[name] = len(self.scene.prototypes)
                self.scene.prototypes.append(list(recs))
            # reference semantics (api/src/lib.rs pbrt_object_instance):
            # prototype vertices are baked with the FULL definition-time CTM
            # (including any transform active at ObjectBegin), and the raw
            # instance CTM maps that instance space to world — matching
            # _bake_instance below
            m0 = self.ctm.t[0]
            m1 = self.ctm.t[1]
            self.scene.instances.append(dict(
                proto=self.proto_ids[name],
                m_p2w0=m0.m.copy(), m_w2p0=m0.m_inv.copy(),
                m_p2w1=m1.m.copy(), m_w2p1=m1.m_inv.copy(),
                animated=not np.allclose(m0.m, m1.m)))
            return
        self._bake_instance(name)

    def _bake_instance(self, name):
        """Geometry-duplicating fallback for prototypes the shared path
        cannot represent (quadrics, emitting shapes)."""
        import copy
        inst = self.ctm.t[0]
        for rec in self.objects.get(name, []):
            r = copy.copy(rec)
            if r.mesh is not None:
                m = r.mesh
                import dataclasses as dc
                r.mesh = dc.replace(
                    m, p=np.asarray(inst.point(m.p), np.float32),
                    n=None if m.n is None else np.asarray(inst.normal(m.n), np.float32),
                    s=None if m.s is None else np.asarray(inst.vector(m.s), np.float32))
            else:
                comb = inst * Transform(r.o2w)
                r.o2w = comb.m
                r.w2o = comb.m_inv
            idx = len(self.scene.shapes)
            self.scene.shapes.append(r)
            if r.area_light >= 0:
                # instanced area-light shapes each need their own light record
                src = self.scene.lights[r.area_light]
                li = len(self.scene.lights)
                self.scene.lights.append(LightRecord(
                    "area", src.params, inst.m @ src.l2w, src.w2l @ inst.m_inv,
                    shape_index=idx))
                r.area_light = li
