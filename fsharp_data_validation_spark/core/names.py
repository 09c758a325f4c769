"""Name / path algebra.

Semantics pinned by the reference (mta-solutions/fsharp-data-validation):
- ``mk_name``: /root/reference/src/FSharp.Data.Validation/Types.fs:6-13 —
  trims, rejects null/whitespace-only strings.
- element names ``"[i]"``: /root/reference/src/FSharp.Data.Validation/VCtx.fs:31-34.
- camelCase-dotted rendering: /root/reference/src/FSharp.Data.Validation/Proof.fs:13-25.

A *path* in this engine is a tuple of name segments, outermost first, e.g.
``("myObj", "myInt")`` or ``("tags", "[0]")``.
"""

from __future__ import annotations

from typing import Optional, Tuple

Path = Tuple[str, ...]


def mk_name(n: Optional[str]) -> Optional[str]:
    """Smart constructor: trimmed, non-empty name or None."""
    if n is None:
        return None
    t = n.strip()
    return t if t else None


def element_name(i: int) -> str:
    """Path segment for the i-th element of a collection (``"[i]"``)."""
    return f"[{i}]"


def to_camel_case(s: str) -> str:
    """First char lowered, rest untouched (Proof.fs:21-25)."""
    if len(s) <= 1:
        return s.lower()
    return s[0].lower() + s[1:]


def render_path(path: Path) -> str:
    """Dotted camelCase rendering of a name chain (Proof.fs:13-20).

    ``("MyObj", "MyInt")`` -> ``"myObj.myInt"``; empty path -> ``""``.
    """
    return ".".join(to_camel_case(seg) for seg in path)
