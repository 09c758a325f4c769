"""Failure-map algebra.

``FailureMap`` is a mapping ``path -> [failure, ...]`` where the list keeps
append order and duplicates (reference: Map<Name list, 'F list>,
/root/reference/src/FSharp.Data.Validation/Types.fs:15).

``merge_failures`` is the key-wise list-append merge, left entries first
(/root/reference/src/FSharp.Data.Validation/Utilities.fs:20-31).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

from .names import Path

FailureMap = Dict[Path, List[Any]]


def merge_failures(a: FailureMap, b: FailureMap) -> FailureMap:
    """Key-union merge; shared keys append b's list after a's."""
    out: FailureMap = {k: list(v) for k, v in a.items()}
    # F# Map.toList iterates sorted by key; result content is identical either
    # way (per-key append order is what matters), but sort for determinism.
    for k in sorted(b.keys()):
        if k in out:
            out[k] = out[k] + list(b[k])
        else:
            out[k] = list(b[k])
    return out


def map_keys(fn: Callable[[Path], Path], m: FailureMap) -> FailureMap:
    """Re-key a failure map (Utilities.fs:33-34); used to prefix paths."""
    return {fn(k): list(v) for k, v in m.items()}


def prefix_keys(name: str, m: FailureMap) -> FailureMap:
    return map_keys(lambda ns: (name,) + ns, m)
