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
        elif o > 0xFFFF:
            # System.Text.Json renders astral chars as a UTF-16 surrogate
            # pair (\udXXX\udXXX), not a single out-of-range \uXXXXX
            hi, lo = divmod(o - 0x10000, 0x400)
            out.append(f"\\u{0xD800 + hi:04x}\\u{0xDC00 + lo:04x}")
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


def dumps_stj(value: Any) -> str:
    """Compact JSON of a plain value, escaped like ``JsonSerializer.
    Serialize`` with default options (the HTML-safe encoder) — the encoder
    the reference's Valid branch goes through (Proof.fs:74-76; golden
    ``{"MyName":"John Smith","MyInt":42}`` at Tests/Proof.fs:92-101).
    Dict keys keep insertion order (F# record fields serialize in
    declaration order, NOT camelCased — unlike failure paths). Floats render
    via Python ``repr`` (matches .NET shortest-round-trip for values whose
    decimal expansion is shared; documented divergence otherwise); other
    unknown types via ``str()`` then string-escaped."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, str):
        return f'"{_escape(value)}"'
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return json.dumps(value)
    if isinstance(value, dict):
        items = ",".join(
            f'"{_escape(str(k))}":{dumps_stj(v)}' for k, v in value.items()
        )
        return "{" + items + "}"
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(dumps_stj(v) for v in value) + "]"
    return f'"{_escape(str(value))}"'


def render_proof_json(p: Proof, value_serializer=None) -> str:
    """ProofConverter.Write (Proof.fs:74-79): Valid -> JSON of the value
    (through the same System.Text.Json default encoder the reference uses);
    Invalid -> the failures document."""
    if p.valid:
        if value_serializer is not None:
            return value_serializer(p.value)
        return dumps_stj(p.value)
    return render_failures_json(list(p.failures), p.fields)
