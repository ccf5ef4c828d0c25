""".pbrt scene-description parser.

Reference: api/src/parser/ (pest PEG grammar + pest_consume tree walk).
The format is a flat token stream — a hand-rolled tokenizer + recursive
descent is simpler and faster than a grammar engine and keeps zero deps.
Handles Include recursion with path resolution (parser/mod.rs parse()),
quoted strings, bracketed value lists, comments, and typed params.
"""
from __future__ import annotations

import os
import re
from typing import Iterator, List, Tuple

from pbrt_tpu.scene.paramset import ParamSet, ALL_TYPES

_TOKEN_RE = re.compile(r"""
    "(?:[^"\\]|\\.)*"      # quoted string
  | \[ | \]
  | [^\s"\[\]\#]+          # bare token (number / directive)
  | \#[^\n]*               # comment
""", re.VERBOSE)

# Directives with fixed numeric argument counts
_NUMERIC_ARGS = {
    "Translate": 3, "Scale": 3, "Rotate": 4, "LookAt": 9,
    "Transform": 16, "ConcatTransform": 16, "TransformTimes": 2,
}
# Directives followed by one quoted name then a ParamSet
_TYPED_WITH_PARAMS = {
    "Camera", "Sampler", "Film", "PixelFilter", "Filter", "Integrator",
    "Accelerator", "Shape", "Material", "MakeNamedMaterial", "LightSource",
    "AreaLightSource", "MakeNamedMedium", "Option",
}
_NAME_ONLY = {"NamedMaterial", "ObjectBegin", "ObjectInstance",
              "CoordinateSystem", "CoordSysTransform", "Include", "Import",
              "ActiveTransform"}
_BARE = {"AttributeBegin", "AttributeEnd", "TransformBegin", "TransformEnd",
         "ObjectEnd", "WorldBegin", "WorldEnd", "ReverseOrientation",
         "Identity"}


def tokenize(text: str) -> List[str]:
    out = []
    for m in _TOKEN_RE.finditer(text):
        t = m.group(0)
        if t.startswith("#"):
            continue
        out.append(t)
    return out


def _is_quoted(t: str) -> bool:
    return t.startswith('"')


def _unquote(t: str) -> str:
    return t[1:-1] if _is_quoted(t) else t


class _Stream:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def done(self):
        return self.i >= len(self.toks)


def _parse_params(s: _Stream, cwd: str) -> ParamSet:
    """Consume '"type name" [values]' groups until the next directive."""
    ps = ParamSet()
    while not s.done():
        t = s.peek()
        if not _is_quoted(t):
            break
        decl = _unquote(t).split()
        if len(decl) != 2 or decl[0] not in ALL_TYPES:
            break  # next directive's name string, not a param decl
        s.next()
        ptype, name = decl
        vals = []
        if s.peek() == "[":
            s.next()
            while s.peek() != "]":
                tok = s.next()
                vals.append(_unquote(tok) if _is_quoted(tok) else tok)
            s.next()
        else:
            tok = s.next()
            vals.append(_unquote(tok) if _is_quoted(tok) else tok)
        ps.declare(ptype, name, vals, cwd)
    return ps


def parse_tokens(tokens: List[str], api, cwd: str = "."):
    """Drive the Api with directives (the analog of Pbrt::process,
    api/src/parser/common.rs:19)."""
    s = _Stream(tokens)
    while not s.done():
        tok = s.next()
        if _is_quoted(tok):
            raise SyntaxError(f"unexpected string {tok} at top level")
        d = tok
        if d in _BARE:
            getattr(api, _snake(d))()
        elif d in _NUMERIC_ARGS:
            n = _NUMERIC_ARGS[d]
            args = [float(s.next()) for _ in range(n)]
            getattr(api, _snake(d))(*args)
        elif d in ("Include", "Import"):
            path = _unquote(s.next())
            full = path if os.path.isabs(path) else os.path.join(cwd, path)
            if os.path.exists(full):
                parse_file(full, api)
            else:
                # missing include: log + skip, keep compiling the rest
                # (reference logs and errors per-file, bin/src/main.rs:63-66)
                import logging
                logging.getLogger(__name__).warning("Include not found: %s", full)
        elif d == "Texture":
            name = _unquote(s.next())
            ttype = _unquote(s.next())     # "float" | "color" | "spectrum"
            tclass = _unquote(s.next())    # "checkerboard" | ...
            ps = _parse_params(s, cwd)
            api.texture(name, ttype, tclass, ps)
        elif d == "MediumInterface":
            inside = _unquote(s.next())
            outside = _unquote(s.next()) if (s.peek() and _is_quoted(s.peek())) else ""
            api.medium_interface(inside, outside)
        elif d == "ActiveTransform":
            which = s.next()
            api.active_transform(which)
        elif d in _NAME_ONLY:
            name = _unquote(s.next())
            getattr(api, _snake(d))(name)
        elif d in _TYPED_WITH_PARAMS:
            name = _unquote(s.next())
            ps = _parse_params(s, cwd)
            meth = "pixel_filter" if d == "Filter" else _snake(d)
            getattr(api, meth)(name, ps)
        else:
            raise SyntaxError(f"unknown directive {d!r}")


_SNAKE_RE = re.compile(r"(?<!^)(?=[A-Z])")


def _snake(name: str) -> str:
    return _SNAKE_RE.sub("_", name).lower()


def parse_file(path: str, api):
    with open(path, "r") as f:
        text = f.read()
    parse_tokens(tokenize(text), api, cwd=os.path.dirname(os.path.abspath(path)))


def parse_string(text: str, api, cwd: str = "."):
    parse_tokens(tokenize(text), api, cwd=cwd)
