"""VCtx — the in-flight, three-state validation context, plus the full
combinator set of the reference's ``VCtxBuilder``.

This is the engine's *row-level semantic oracle*: the Spark compiler
(`fsharp_data_validation_spark.functions.compiler`) must produce, for every
row, exactly the failures this kernel produces for the same value. The
reference test suite is ported against this module 1:1.

Reference semantics (file:line in /root/reference/src/FSharp.Data.Validation/):
- 3-state ``ValidCtx | DisputedCtx | RefutedCtx``: VCtx.fs:8-12
- ``bind`` (Disputed carries failures forward, Refuted short-circuits): VCtx.fs:15-23
- ``MergeSources`` (applicative ``and!``; ANY failure on either side collapses
  to Refuted with merged failures — values survive only if both Valid;
  test-pinned by tests/.../Tests/VCtx.fs:176-266): VCtx.fs:53-63
- ``applyFailures`` path prefixing: VCtx.fs:36-47
- ``optional``: VCtx.fs:110-133 — ``None`` passes through untouched
- ``validateEach`` fold: VCtx.fs:136-176
- refute*/dispute* family: VCtx.fs:194-447

Known reference divergence: ``disputeAllWithMany`` (VCtx.fs:386-395) has an
inverted condition (fires when every element *passes*, adding an empty
failure set); we implement the *documented* semantics (VCtx.fs:382-384,
README.md) — if every element fails, add all distinct failures — and pin the
divergence in tests/test_core_vctx.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterable, List, Optional, Sequence, Tuple

from .failures import FailureMap, merge_failures, prefix_keys
from .names import element_name
from .proof import Invalid, Proof, Valid
from .valuectx import ELEMENT, FIELD, GLOBAL, ValueCtx

VALID = "valid"
DISPUTED = "disputed"
REFUTED = "refuted"


@dataclass(frozen=True)
class VCtx:
    state: str
    gfs: Tuple[Any, ...] = ()  # global failures, order-preserving
    lfs: Any = None  # FailureMap
    value: Any = None  # absent semantically when REFUTED

    def __post_init__(self):
        if self.lfs is None:
            object.__setattr__(self, "lfs", {})

    def __eq__(self, other):
        if not isinstance(other, VCtx):
            return NotImplemented
        if self.state != other.state:
            return False
        if self.state == VALID:
            return self.value == other.value
        if self.state == REFUTED:
            return tuple(self.gfs) == tuple(other.gfs) and self.lfs == other.lfs
        return (
            tuple(self.gfs) == tuple(other.gfs)
            and self.lfs == other.lfs
            and self.value == other.value
        )

    def __repr__(self):
        if self.state == VALID:
            return f"ValidCtx({self.value!r})"
        if self.state == REFUTED:
            return f"RefutedCtx({list(self.gfs)!r}, {self.lfs!r})"
        return f"DisputedCtx({list(self.gfs)!r}, {self.lfs!r}, {self.value!r})"


def valid_ctx(a: Any) -> VCtx:
    return VCtx(VALID, value=a)


def disputed_ctx(gfs: Iterable[Any], lfs: FailureMap, a: Any) -> VCtx:
    return VCtx(DISPUTED, gfs=tuple(gfs), lfs=dict(lfs), value=a)


def refuted_ctx(gfs: Iterable[Any], lfs: FailureMap) -> VCtx:
    return VCtx(REFUTED, gfs=tuple(gfs), lfs=dict(lfs))


# --- core combinators (VCtx module) ---------------------------------------


def bind(fn: Callable[[Any], VCtx], c: VCtx) -> VCtx:
    """VCtx.fs:15-23."""
    if c.state == VALID:
        return fn(c.value)
    if c.state == REFUTED:
        return c
    r = fn(c.value)
    if r.state == VALID:
        return disputed_ctx(c.gfs, c.lfs, r.value)
    if r.state == DISPUTED:
        return disputed_ctx(
            tuple(c.gfs) + tuple(r.gfs), merge_failures(c.lfs, r.lfs), r.value
        )
    return refuted_ctx(tuple(c.gfs) + tuple(r.gfs), merge_failures(c.lfs, r.lfs))


def vmap(fn: Callable[[Any], Any], c: VCtx) -> VCtx:
    """VCtx.fs:25-29."""
    if c.state == VALID:
        return valid_ctx(fn(c.value))
    if c.state == DISPUTED:
        return disputed_ctx(c.gfs, c.lfs, fn(c.value))
    return c


def apply_failures(
    v: ValueCtx,
    acc: Tuple[Iterable[Any], FailureMap],
    child: Tuple[Iterable[Any], FailureMap],
) -> Tuple[Tuple[Any, ...], FailureMap]:
    """Re-prefix a child context's failures with the parent Field/Element name
    (VCtx.fs:36-47). Child *global* failures become field failures keyed
    ``[name]`` (entry added even when empty — faithful to Map.add); under
    Global they merge as-is."""
    gfs, lfs = tuple(acc[0]), dict(acc[1])
    cgfs, clfs = list(child[0]), dict(child[1])
    if v.tag == GLOBAL:
        return gfs + tuple(cgfs), merge_failures(lfs, clfs)
    n = element_name(v.index) if v.tag == ELEMENT else v.name
    lfs2 = prefix_keys(n, clfs)
    lfs3 = {(n,): cgfs}
    return gfs, merge_failures(lfs, merge_failures(lfs3, lfs2))


def merge_sources(v1: VCtx, v2: VCtx) -> VCtx:
    """Applicative zip (``and!``), VCtx.fs:53-63: values survive only when
    both sides are Valid; any failure anywhere -> Refuted with all failures
    merged (even Valid+Disputed)."""
    if v1.state == VALID and v2.state == VALID:
        return valid_ctx((v1.value, v2.value))
    return refuted_ctx(tuple(v1.gfs) + tuple(v2.gfs), merge_failures(v1.lfs, v2.lfs))


def from_vctx(c: VCtx) -> Proof:
    """Finalize (Library.fs:8-12): Valid->Valid; Disputed/Refuted->Invalid."""
    if c.state == VALID:
        return Valid(c.value)
    return Invalid(list(c.gfs), dict(c.lfs))


# --- builder operations (VCtxBuilder); each takes/returns VCtx whose value
# --- is a ValueCtx, mirroring the CE custom operations -----------------------


def with_value(b: Any) -> VCtx:
    """VCtx.fs:106-107 — start Global scope."""
    return valid_ctx(ValueCtx.global_(b))


def with_field(name: Optional[str], b: Any) -> VCtx:
    """VCtx.fs:80-88 — start Field scope; None name falls back to Global."""
    if name is None:
        return with_value(b)
    return valid_ctx(ValueCtx.field(name, b))


def _file_many(v: ValueCtx, fs: List[Any], state: str) -> VCtx:
    """Shared filing for RefuteMany (VCtx.fs:203-208) / DisputeMany (299-304):
    Element i -> path ("[i]",); Field n -> (n,); Global -> type-level list."""
    mk = refuted_ctx if state == REFUTED else (lambda g, l: disputed_ctx(g, l, v))
    if v.tag == ELEMENT:
        return mk([], {(element_name(v.index),): list(fs)})
    if v.tag == FIELD:
        return mk([], {(v.name,): list(fs)})
    return mk(list(fs), {})


def refute(c: VCtx, f: Any) -> VCtx:
    return refute_many(c, [f])


def refute_many(c: VCtx, fs: List[Any]) -> VCtx:
    if not fs:
        raise ValueError("refute_many requires a non-empty failure list")
    return bind(lambda v: _file_many(v, fs, REFUTED), c)


def refute_with(c: VCtx, fn: Callable[[Any], Tuple[bool, Any]]) -> VCtx:
    """VCtx.fs:213-219. ``fn`` returns ``(True, new_value)`` or ``(False, failure)``."""

    def go(v: ValueCtx) -> VCtx:
        ok, out = fn(v.get_value())
        if ok:
            return valid_ctx(v.set_value(out))
        return _file_many(v, [out], REFUTED)

    return bind(go, c)


def refute_with_many(c: VCtx, fn: Callable[[Any], Tuple[bool, Any]]) -> VCtx:
    """VCtx.fs:224-230. ``fn`` returns ``(True, new_value)`` or ``(False, [failures])``."""

    def go(v: ValueCtx) -> VCtx:
        ok, out = fn(v.get_value())
        if ok:
            return valid_ctx(v.set_value(out))
        return _file_many(v, list(out), REFUTED)

    return bind(go, c)


def refute_with_proof(c: VCtx, fn: Callable[[Any], Proof]) -> VCtx:
    """VCtx.fs:253-269 — compose a whole child validator on this field;
    on Invalid, child global failures are filed under this field's path and
    child field failures are path-prefixed."""

    def go(v: ValueCtx) -> VCtx:
        p = fn(v.get_value())
        if p.valid:
            return valid_ctx(v.set_value(p.value))
        gfs, lfs = list(p.failures), dict(p.fields)
        if v.tag == ELEMENT:
            key = (element_name(v.index),)
        elif v.tag == FIELD:
            key = (v.name,)
        else:
            return refuted_ctx(gfs, lfs)
        merged = dict(lfs)
        merged[key] = gfs  # Map.add semantics: replaces any existing entry
        return refuted_ctx([], merged)

    return bind(go, c)


def dispute(c: VCtx, f: Any) -> VCtx:
    return dispute_many(c, [f])


def dispute_many(c: VCtx, fs: List[Any]) -> VCtx:
    if not fs:
        raise ValueError("dispute_many requires a non-empty failure list")
    return bind(lambda v: _file_many(v, fs, DISPUTED), c)


def dispute_with(c: VCtx, fn: Callable[[Any], Optional[Any]]) -> VCtx:
    """VCtx.fs:309-315 — fn returns a failure or None."""
    return dispute_with_many(c, lambda a: [] if fn(a) is None else [fn(a)])


def dispute_with_many(c: VCtx, fn: Callable[[Any], List[Any]]) -> VCtx:
    """VCtx.fs:320-326."""

    def go(v: ValueCtx) -> VCtx:
        fs = fn(v.get_value())
        if not fs:
            return valid_ctx(v)
        return _file_many(v, list(fs), DISPUTED)

    return bind(go, c)


def dispute_with_fact(c: VCtx, f: Any, fn: Callable[[Any], bool]) -> VCtx:
    """VCtx.fs:405-411 — add failure when predicate is False."""
    return dispute_with(c, lambda a: None if fn(a) else f)


def qed(c: VCtx, fn: Optional[Callable[[Any], Any]] = None) -> VCtx:
    """VCtx.fs:184-191 — end scope: strip ValueCtx, optionally transform."""
    if fn is None:
        return vmap(lambda v: v.get_value(), c)
    return vmap(lambda v: fn(v.get_value()), c)


def optional(c: VCtx, fn: Callable[[Any], VCtx]) -> VCtx:
    """VCtx.fs:110-133 — apply child validation only when value is not None;
    None passes through; child failures re-prefixed via apply_failures."""
    if c.state == REFUTED:
        return c
    v: ValueCtx = c.value
    a = v.get_value()
    if c.state == VALID:
        if a is None:
            return valid_ctx(v.set_value(None))
        r = fn(a)
        if r.state == VALID:
            return valid_ctx(r.value.map(lambda b: b))
        if r.state == DISPUTED:
            gfs, lfs = apply_failures(v, ((), {}), (r.gfs, r.lfs))
            return disputed_ctx(gfs, lfs, r.value.map(lambda b: b))
        return refuted_ctx(*apply_failures(v, ((), {}), (r.gfs, r.lfs)))
    # DISPUTED
    if a is None:
        return disputed_ctx(c.gfs, c.lfs, v.set_value(None))
    r = fn(a)
    if r.state == VALID:
        return disputed_ctx(c.gfs, c.lfs, r.value.map(lambda b: b))
    if r.state == DISPUTED:
        gfs, lfs = apply_failures(v, (c.gfs, c.lfs), (r.gfs, r.lfs))
        return disputed_ctx(gfs, lfs, r.value.map(lambda b: b))
    return refuted_ctx(*apply_failures(v, (c.gfs, c.lfs), (r.gfs, r.lfs)))


def validate_each(c: VCtx, fn: Callable[[int, Any], VCtx]) -> VCtx:
    """VCtx.fs:136-176 — full child validation per element; element failures
    filed under ``"[i]"`` then prefixed by the list's own scope; any element
    Refuted => list Refuted."""

    def go(v1: ValueCtx) -> VCtx:
        xs = list(v1.get_value())
        ys: List[VCtx] = []
        for i, x in enumerate(xs):
            r = fn(i, x)
            if r.state == VALID:
                ys.append(valid_ctx(ValueCtx.element(i, r.value.get_value())))
            elif r.state == DISPUTED:
                v2 = ValueCtx.element(i, r.value.get_value())
                gfs, lfs = apply_failures(v2, ((), {}), (r.gfs, r.lfs))
                ys.append(disputed_ctx(gfs, lfs, v2))
            else:
                v2 = ValueCtx.element(i, None)
                gfs, lfs = apply_failures(v2, ((), {}), (r.gfs, r.lfs))
                ys.append(refuted_ctx(gfs, lfs))

        def append_to_ctx(d: ValueCtx, d2: ValueCtx) -> ValueCtx:
            return d.map(lambda zs: list(zs) + [d2.get_value()])

        acc = valid_ctx(v1.set_value([]))
        for x in ys:
            if acc.state == VALID and x.state == VALID:
                acc = valid_ctx(append_to_ctx(acc.value, x.value))
            elif acc.state == VALID and x.state == DISPUTED:
                gfs, lfs = apply_failures(v1, ((), {}), (x.gfs, x.lfs))
                acc = disputed_ctx(gfs, lfs, append_to_ctx(acc.value, x.value))
            elif acc.state == VALID and x.state == REFUTED:
                acc = refuted_ctx(*apply_failures(v1, ((), {}), (x.gfs, x.lfs)))
            elif acc.state == DISPUTED and x.state == VALID:
                acc = disputed_ctx(acc.gfs, acc.lfs, append_to_ctx(acc.value, x.value))
            elif acc.state == DISPUTED and x.state == DISPUTED:
                gfs, lfs = apply_failures(v1, (acc.gfs, acc.lfs), (x.gfs, x.lfs))
                acc = disputed_ctx(gfs, lfs, append_to_ctx(acc.value, x.value))
            elif acc.state == DISPUTED and x.state == REFUTED:
                acc = refuted_ctx(*apply_failures(v1, (acc.gfs, acc.lfs), (x.gfs, x.lfs)))
            elif acc.state == REFUTED and x.state == VALID:
                pass
            else:  # REFUTED + (DISPUTED|REFUTED)
                acc = refuted_ctx(*apply_failures(v1, (acc.gfs, acc.lfs), (x.gfs, x.lfs)))
        return acc

    return bind(go, c)


def refute_each_with(c: VCtx, fn: Callable[..., Tuple[bool, Any]]) -> VCtx:
    """VCtx.fs:236-248; fn(a) or fn(i, a) -> (ok, out)."""
    fn2 = _indexed(fn)

    def per_elem(i: int, a: Any) -> VCtx:
        ok, out = fn2(i, a)
        if ok:
            return valid_ctx(ValueCtx.global_(out))
        return refuted_ctx([out], {})

    return validate_each(c, per_elem)


def refute_each_with_proof(c: VCtx, fn: Callable[..., Proof]) -> VCtx:
    """VCtx.fs:275-287."""
    fn2 = _indexed(fn)

    def per_elem(i: int, a: Any) -> VCtx:
        p = fn2(i, a)
        if p.valid:
            return valid_ctx(ValueCtx.global_(p.value))
        return refuted_ctx(list(p.failures), dict(p.fields))

    return validate_each(c, per_elem)


def dispute_any_with(c: VCtx, fn: Callable[..., Optional[Any]]) -> VCtx:
    """VCtx.fs:331-344 — per-element check; failures filed at element paths,
    validation continues."""
    fn2 = _indexed(fn)
    return dispute_any_with_many(c, lambda i, a: [] if fn2(i, a) is None else [fn2(i, a)])


def dispute_any_with_many(c: VCtx, fn: Callable[..., List[Any]]) -> VCtx:
    """VCtx.fs:349-362."""
    fn2 = _indexed(fn)

    def per_elem(i: int, a: Any) -> VCtx:
        fs = fn2(i, a)
        if not fs:
            return valid_ctx(ValueCtx.global_(a))
        return disputed_ctx(list(fs), {}, ValueCtx.global_(a))

    return validate_each(c, per_elem)


def dispute_any_with_fact(c: VCtx, f: Any, fn: Callable[..., bool]) -> VCtx:
    """VCtx.fs:416-429."""
    fn2 = _indexed(fn)
    return dispute_any_with(c, lambda i, a: None if fn2(i, a) else f)


def dispute_all_with(c: VCtx, fn: Callable[..., Optional[Any]]) -> VCtx:
    """VCtx.fs:367-380."""
    fn2 = _indexed(fn)
    return dispute_all_with_many(c, lambda i, a: [] if fn2(i, a) is None else [fn2(i, a)])


def dispute_all_with_many(c: VCtx, fn: Callable[..., List[Any]]) -> VCtx:
    """*Documented* semantics of VCtx.fs:385-395 (doc comment 382-384): if
    EVERY element fails, add all distinct failures (order of first appearance)
    and continue; otherwise no failures. The reference implementation inverts
    the condition (fires on all-pass with an empty failure set) — a bug with
    no covering test; see module docstring."""
    fn2 = _indexed(fn)

    def go(v: ValueCtx) -> VCtx:
        xs = [fn2(i, a) for i, a in enumerate(v.get_value())]
        if xs and all(len(fs) > 0 for fs in xs):
            seen, distinct = set(), []
            for fs in xs:
                for f in fs:
                    if f not in seen:
                        seen.add(f)
                        distinct.append(f)
            return disputed_ctx(distinct, {}, v)
        return valid_ctx(v)

    return bind(go, c)


def dispute_all_with_fact(c: VCtx, f: Any, fn: Callable[..., bool]) -> VCtx:
    """VCtx.fs:434-447."""
    fn2 = _indexed(fn)
    return dispute_all_with(c, lambda i, a: None if fn2(i, a) else f)


def _indexed(fn: Callable) -> Callable[[int, Any], Any]:
    """Accept either fn(a) or fn(i, a) — mirrors the reference's overloads."""
    import inspect

    try:
        n = len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        n = 1
    if n >= 2:
        return fn
    return lambda i, a: fn(a)


# --- chainable builder (ergonomic equivalent of the CE) ---------------------


class Validation:
    """Chainable wrapper over the combinators, mirroring the reference's
    ``validation { ... }`` computation expression. Example::

        proof = (Validation.value(s)
                 .dispute_with_fact("too_small", is_greater_than_or_equal(1))
                 .qed(UserId)
                 .proof())
    """

    def __init__(self, ctx: VCtx):
        self.ctx = ctx

    # -- scope introduction
    @staticmethod
    def value(b: Any) -> "Validation":
        return Validation(with_value(b))

    @staticmethod
    def field(name: Optional[str], b: Any) -> "Validation":
        return Validation(with_field(name, b))

    # -- refute family
    def refute(self, f: Any) -> "Validation":
        return Validation(refute(self.ctx, f))

    def refute_many(self, fs: List[Any]) -> "Validation":
        return Validation(refute_many(self.ctx, fs))

    def refute_with(self, fn) -> "Validation":
        return Validation(refute_with(self.ctx, fn))

    def refute_with_many(self, fn) -> "Validation":
        return Validation(refute_with_many(self.ctx, fn))

    def refute_with_proof(self, fn) -> "Validation":
        return Validation(refute_with_proof(self.ctx, fn))

    def refute_each_with(self, fn) -> "Validation":
        return Validation(refute_each_with(self.ctx, fn))

    def refute_each_with_proof(self, fn) -> "Validation":
        return Validation(refute_each_with_proof(self.ctx, fn))

    # -- dispute family
    def dispute(self, f: Any) -> "Validation":
        return Validation(dispute(self.ctx, f))

    def dispute_many(self, fs: List[Any]) -> "Validation":
        return Validation(dispute_many(self.ctx, fs))

    def dispute_with(self, fn) -> "Validation":
        return Validation(dispute_with(self.ctx, fn))

    def dispute_with_many(self, fn) -> "Validation":
        return Validation(dispute_with_many(self.ctx, fn))

    def dispute_with_fact(self, f: Any, fn) -> "Validation":
        return Validation(dispute_with_fact(self.ctx, f, fn))

    def dispute_any_with(self, fn) -> "Validation":
        return Validation(dispute_any_with(self.ctx, fn))

    def dispute_any_with_many(self, fn) -> "Validation":
        return Validation(dispute_any_with_many(self.ctx, fn))

    def dispute_any_with_fact(self, f: Any, fn) -> "Validation":
        return Validation(dispute_any_with_fact(self.ctx, f, fn))

    def dispute_all_with(self, fn) -> "Validation":
        return Validation(dispute_all_with(self.ctx, fn))

    def dispute_all_with_many(self, fn) -> "Validation":
        return Validation(dispute_all_with_many(self.ctx, fn))

    def dispute_all_with_fact(self, f: Any, fn) -> "Validation":
        return Validation(dispute_all_with_fact(self.ctx, f, fn))

    # -- structure
    def optional(self, fn: Callable[[Any], "Validation"]) -> "Validation":
        return Validation(optional(self.ctx, lambda a: fn(a).ctx))

    def validate_each(self, fn: Callable[..., "Validation"]) -> "Validation":
        fn2 = _indexed(fn)
        return Validation(validate_each(self.ctx, lambda i, a: fn2(i, a).ctx))

    def qed(self, fn: Optional[Callable[[Any], Any]] = None) -> "Validation":
        return Validation(qed(self.ctx, fn))

    def and_(self, other: "Validation") -> "Validation":
        """``and!`` — applicative MergeSources."""
        return Validation(merge_sources(self.ctx, other.ctx))

    def map(self, fn: Callable[[Any], Any]) -> "Validation":
        return Validation(vmap(fn, self.ctx))

    def bind(self, fn: Callable[[Any], "Validation"]) -> "Validation":
        return Validation(bind(lambda a: fn(a).ctx, self.ctx))

    def proof(self) -> Proof:
        return from_vctx(self.ctx)


def merge_all(vs: Sequence[Validation]) -> Validation:
    """Fold ``and!`` over several branches, yielding a tuple of all values
    (flattened, unlike the reference's nested pairs) when all are Valid."""
    if not vs:
        raise ValueError("merge_all requires at least one branch")
    acc = vs[0].map(lambda a: (a,))
    for v in vs[1:]:
        acc = Validation(merge_sources(acc.ctx, v.ctx)).map(lambda t: t[0] + (t[1],))
    return acc
