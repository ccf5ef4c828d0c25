"""Typed parameter sets from .pbrt declarations.

Reference: core/src/paramset/mod.rs (ParamSet typed multimap) and the typed
param grammar (api/src/parser/mod.rs:449-602: point3/vector3/normal/point2/
string/bool/float/int/rgb/xyz/blackbody/spectrum/texture).

Host-side only. A ParamSet here is a dict {name: list-of-values} plus a
type map; spectral inputs (xyz/blackbody/spectrum files) are converted to
RGB at parse time since the device spectrum is RGB.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from pbrt_tpu.core.spectrum import blackbody_normalized_rgb, spd_to_rgb

_XYZ_TO_RGB = None

SPECTRAL_TYPES = {"rgb", "color", "xyz", "blackbody", "spectrum"}
ALL_TYPES = {"integer", "float", "point2", "vector2", "point3", "vector3",
             "point", "vector", "normal", "string", "bool", "texture"} | SPECTRAL_TYPES


class ParamSet:
    """name -> values with declared types. find_one_* mirror paramset find
    macros; `textures` records which names were declared as texture refs."""

    def __init__(self):
        self.values: Dict[str, list] = {}
        self.types: Dict[str, str] = {}

    def declare(self, ptype: str, name: str, raw: list, cwd: str = "."):
        if ptype == "integer":
            vals = [int(v) for v in raw]
        elif ptype == "float":
            vals = [float(v) for v in raw]
        elif ptype == "bool":
            vals = [str(v).strip('"') in ("true", "True") for v in raw]
        elif ptype in ("string", "texture"):
            vals = [str(v).strip('"') for v in raw]
        elif ptype in ("rgb", "color"):
            vals = [float(v) for v in raw]
        elif ptype == "xyz":
            from pbrt_tpu.core.spectrum import xyz_to_rgb
            arr = np.asarray([float(v) for v in raw], np.float32).reshape(-1, 3)
            vals = list(np.maximum(xyz_to_rgb(arr), 0.0).reshape(-1))
        elif ptype == "blackbody":
            arr = [float(v) for v in raw]
            out = []
            # pairs of (temperature, scale) — parser/mod.rs blackbody params
            for i in range(0, len(arr), 2):
                t = arr[i]
                s = arr[i + 1] if i + 1 < len(arr) else 1.0
                out.extend(blackbody_normalized_rgb(t, s).tolist())
            vals = out
        elif ptype == "spectrum":
            if raw and isinstance(raw[0], str):
                # spectrum file: whitespace floats lambda value pairs
                path = os.path.join(cwd, raw[0].strip('"'))
                try:
                    data = np.loadtxt(path).reshape(-1, 2)
                    vals = list(spd_to_rgb(data[:, 0], data[:, 1]))
                except OSError:
                    vals = [0.5, 0.5, 0.5]
            else:
                arr = np.asarray([float(v) for v in raw], np.float32).reshape(-1, 2)
                vals = list(spd_to_rgb(arr[:, 0], arr[:, 1]))
        elif ptype in ("point", "point3", "vector", "vector3", "normal",
                       "point2", "vector2"):
            vals = [float(v) for v in raw]
        else:
            raise ValueError(f"unknown param type {ptype!r}")
        self.values[name] = vals
        self.types[name] = ptype

    # -- typed getters ---------------------------------------------------
    def get(self, name, default=None):
        return self.values.get(name, default)

    def __contains__(self, name):
        return name in self.values

    def find_one_float(self, name, default):
        v = self.values.get(name)
        return float(v[0]) if v else float(default)

    def find_one_int(self, name, default):
        v = self.values.get(name)
        return int(v[0]) if v else int(default)

    def find_one_bool(self, name, default):
        v = self.values.get(name)
        return bool(v[0]) if v else bool(default)

    def find_one_string(self, name, default):
        v = self.values.get(name)
        return str(v[0]) if v else str(default)

    def find_one_rgb(self, name, default):
        """First 3-vector of any spectral OR geometric 3-component type
        (positions/directions share this accessor at build time)."""
        v = self.values.get(name)
        t = self.types.get(name)
        if v and (t in SPECTRAL_TYPES or t in ("point", "point3", "vector",
                                               "vector3", "normal")):
            if len(v) >= 3:
                return np.asarray(v[:3], np.float32)
            return np.full(3, float(v[0]), np.float32)
        if v and t in ("float", "integer"):
            return np.full(3, float(v[0]), np.float32)
        return np.asarray(default, np.float32)

    def find_point3s(self, name):
        v = self.values.get(name)
        return None if v is None else np.asarray(v, np.float32).reshape(-1, 3)

    def find_point2s(self, name):
        v = self.values.get(name)
        return None if v is None else np.asarray(v, np.float32).reshape(-1, 2)

    def find_ints(self, name):
        v = self.values.get(name)
        return None if v is None else np.asarray(v, np.int32)

    def find_floats(self, name):
        v = self.values.get(name)
        return None if v is None else np.asarray(v, np.float32)

    def is_texture(self, name):
        return self.types.get(name) == "texture"

    def texture_name(self, name):
        return self.values[name][0] if self.is_texture(name) else None

    def as_plain_dict(self):
        """Compatibility with modules taking {name: [values]} dicts."""
        return dict(self.values)

    def __repr__(self):
        return f"ParamSet({self.types})"
