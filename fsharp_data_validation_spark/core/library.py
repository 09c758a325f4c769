"""Helper predicates/validators — port of the reference's default library.

Reference: /root/reference/src/FSharp.Data.Validation/Library.fs:16-121 and
Utilities.fs:4-39. Comparison helpers are *argument-flipped* so the validated
value is the second (curried-last) argument, pinned by
tests/.../Tests/Library.fs:201-248: ``is_less_than(a)(b)`` is True iff
``b < a``. ``is_null``/``is_not_null`` test *sequence emptiness*, not SQL
NULL (tests/.../Tests/Library.fs:126-139).

Results for refuting validators are ``(ok: bool, payload)`` pairs:
``(True, new_value)`` or ``(False, failure)``.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, List, Optional, Tuple


# --- refuting ----------------------------------------------------------------


def is_required(f: Any) -> Callable[[Any], Tuple[bool, Any]]:
    """None -> (False, f); Some a -> (True, a). Library.fs:16-19."""

    def go(ma: Any) -> Tuple[bool, Any]:
        if ma is None:
            return (False, f)
        return (True, ma)

    return go


# --- disputing ---------------------------------------------------------------


def is_required_when(f: Any, b: bool) -> Callable[[Any], Optional[Any]]:
    """Required only if condition true (disputing). Library.fs:24-30."""

    def go(ma: Any) -> Optional[Any]:
        if not b:
            return None
        return f if ma is None else None

    return go


def is_required_unless(f: Any, b: bool) -> Callable[[Any], Optional[Any]]:
    """Library.fs:35."""
    return is_required_when(f, not b)


def is_error(e: Tuple[bool, Any]) -> bool:
    """Result-state check (Library.fs:39-43); e is an (ok, payload) pair."""
    return not e[0]


def is_ok(e: Tuple[bool, Any]) -> bool:
    """Library.fs:45-49."""
    return bool(e[0])


def is_null(a: Iterable) -> bool:
    """Sequence *emptiness* (Library.fs:53) — '' counts as null."""
    return len(list(a)) == 0


def is_not_null(a: Iterable) -> bool:
    """Library.fs:57."""
    return len(list(a)) > 0


def min_length(l: int) -> Callable[[Iterable], bool]:
    """Library.fs:61."""
    return lambda a: len(list(a)) >= l


def max_length(l: int) -> Callable[[Iterable], bool]:
    """Library.fs:65."""
    return lambda a: len(list(a)) <= l


def is_length(l: int) -> Callable[[Iterable], bool]:
    """Library.fs:69."""
    return lambda a: len(list(a)) == l


def is_equal(a: Any) -> Callable[[Any], bool]:
    """Library.fs:73."""
    return lambda b: a == b


def is_not_equal(a: Any) -> Callable[[Any], bool]:
    """Library.fs:77."""
    return lambda b: a != b


def is_less_than(a: Any) -> Callable[[Any], bool]:
    """True iff validated value < a (Library.fs:81, flipped)."""
    return lambda b: b < a


def is_greater_than(a: Any) -> Callable[[Any], bool]:
    """True iff validated value > a (Library.fs:85, flipped)."""
    return lambda b: b > a


def is_less_than_or_equal(a: Any) -> Callable[[Any], bool]:
    """True iff validated value <= a (Library.fs:89, flipped)."""
    return lambda b: b <= a


def is_greater_than_or_equal(a: Any) -> Callable[[Any], bool]:
    """True iff validated value >= a (Library.fs:93, flipped)."""
    return lambda b: b >= a


def has_elem(e: Any) -> Callable[[Iterable], bool]:
    """Library.fs:97."""
    return lambda a: e in list(a)


def does_not_have_elem(e: Any) -> Callable[[Iterable], bool]:
    """Library.fs:101."""
    return lambda a: e not in list(a)


# --- utilities (Utilities.fs) -------------------------------------------------


def cat_options(l: Iterable[Optional[Any]]) -> List[Any]:
    """Utilities.fs:4."""
    return [x for x in l if x is not None]


def oks(l: Iterable[Tuple[bool, Any]]) -> List[Any]:
    """Utilities.fs:6-11."""
    return [p for ok, p in l if ok]


def errors(l: Iterable[Tuple[bool, Any]]) -> List[Any]:
    """Utilities.fs:13-18."""
    return [p for ok, p in l if not ok]


def test_match(f: Any, a1: Any) -> Callable[[Any], Optional[Any]]:
    """Equality -> failure option (Utilities.fs:36-39)."""
    return lambda a2: None if a1 == a2 else f
