"""JSON rendering of proofs/failures, byte-compatible with the reference.

Reference: /root/reference/src/FSharp.Data.Validation/Proof.fs:28-79 —
``Invalid`` renders as ``{"failures":[str(f)...],"fields":{"camelCase.dotted.
[i].path":[str(f)...]}}`` with fields iterated in sorted-key order (F# Map)
and values escaped like System.Text.Json's default (HTML-safe) encoder.
Golden strings pinned at tests/.../Tests/Proof.fs:101,127.
"""

from __future__ import annotations

import json
from typing import Any

from .names import render_path
from .proof import Proof

# System.Text.Json's default JavaScriptEncoder escapes HTML-sensitive ASCII
# and everything non-ASCII as \uXXXX.
_HTML_SENSITIVE = set("<>&'+`\"")


def _escape(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif o < 0x20:
            out.append(json.dumps(ch)[1:-1])
        elif ch in _HTML_SENSITIVE or o > 0x7E:
            out.append(f"\\u{o:04x}")
        else:
            out.append(ch)
    return "".join(out)


# public alias: the Spark report compiler escapes compile-time literals
# (codes, static path segments) with the exact kernel encoder
escape_json = _escape


def render_failures_json(gfs, lfs) -> str:
    """ValidationFailuresConverter.Write (Proof.fs:28-45)."""
    parts = ['{"failures":[']
    parts.append(",".join(f'"{_escape(str(f))}"' for f in gfs))
    parts.append('],"fields":{')
    fields = []
    for path in sorted(lfs.keys()):
        vals = ",".join(f'"{_escape(str(f))}"' for f in lfs[path])
        fields.append(f'"{_escape(render_path(path))}":[{vals}]')
    parts.append(",".join(fields))
    parts.append("}}")
    return "".join(parts)


def render_proof_json(p: Proof, value_serializer=None) -> str:
    """ProofConverter.Write (Proof.fs:74-79): Valid -> JSON of the value;
    Invalid -> the failures document."""
    if p.valid:
        if value_serializer is not None:
            return value_serializer(p.value)
        return json.dumps(p.value, separators=(",", ":"), default=str)
    return render_failures_json(list(p.failures), p.fields)
