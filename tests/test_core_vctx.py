"""Port of tests/FSharp.Data.Validation.Tests/Tests/VCtx.fs (state-transition
matrix, MergeSources 3x3, optional 8-case, refute/dispute filing by scope)."""

from hypothesis import given
from hypothesis import strategies as st

from fsharp_data_validation_spark.core import (
    Validation,
    ValueCtx,
    bind,
    disputed_ctx,
    from_vctx,
    merge_sources,
    refuted_ctx,
    valid_ctx,
    vmap,
    with_field,
    with_value,
)
from fsharp_data_validation_spark.core.failures import merge_failures
from fsharp_data_validation_spark.core.vctx import (
    dispute,
    dispute_all_with_fact,
    dispute_all_with_many,
    dispute_any_with_fact,
    dispute_with,
    dispute_with_fact,
    qed,
    refute,
    refute_with,
    refute_with_proof,
    validate_each,
)
from fsharp_data_validation_spark.core.proof import Invalid, Valid

ints = st.integers(-1000, 1000)


# --- map / bind state table (VCtx.fs tests 10-110) --------------------------


@given(ints)
def test_map_transforms_valid(a):
    assert vmap(str, valid_ctx(a)) == valid_ctx(str(a))


@given(ints, ints, ints)
def test_map_preserves_disputed_failures(a, lf1, gf1):
    c = disputed_ctx([gf1], {("f1",): [lf1]}, a)
    assert vmap(str, c) == disputed_ctx([gf1], {("f1",): [lf1]}, str(a))


@given(ints, ints)
def test_map_no_change_refuted(lf1, gf1):
    c = refuted_ctx([gf1], {("f1",): [lf1]})
    assert vmap(str, c) == c


@given(ints)
def test_bind_transforms_valid(a):
    assert bind(lambda b: valid_ctx(str(b)), valid_ctx(a)) == valid_ctx(str(a))


@given(ints, ints)
def test_bind_no_change_refuted(lf1, gf1):
    c = refuted_ctx([gf1], {("f1",): [lf1]})
    assert bind(lambda a: valid_ctx(a + 1), c) == c


@given(ints, ints, ints)
def test_bind_disputed_with_valid(a, lf1, gf1):
    c = disputed_ctx([gf1], {("f1",): [lf1]}, a)
    assert bind(lambda x: valid_ctx(x + 1), c) == disputed_ctx(
        [gf1], {("f1",): [lf1]}, a + 1
    )


@given(ints, ints, ints, ints, ints)
def test_bind_disputed_with_disputed_merges(a, lf1, lf2, gf1, gf2):
    c = disputed_ctx([gf1], {("f1",): [lf1]}, a)
    r = bind(lambda x: disputed_ctx([gf2], {("f1",): [lf2]}, x + 1), c)
    assert r == disputed_ctx(
        [gf1, gf2], merge_failures({("f1",): [lf1]}, {("f1",): [lf2]}), a + 1
    )
    assert r.lfs == {("f1",): [lf1, lf2]}  # order-preserving append


@given(ints, ints, ints, ints, ints)
def test_bind_disputed_with_refuted_merges(a, lf1, lf2, gf1, gf2):
    c = disputed_ctx([gf1], {("f1",): [lf1]}, a)
    r = bind(lambda _: refuted_ctx([gf2], {("f1",): [lf2]}), c)
    assert r == refuted_ctx([gf1, gf2], {("f1",): [lf1, lf2]})


# --- MergeSources full 3x3 matrix (VCtx.fs tests 176-266) --------------------


def _d(gf, lf, a):
    return disputed_ctx([gf], {("f1",): [lf]}, a)


def _r(gf, lf):
    return refuted_ctx([gf], {("f1",): [lf]})


@given(ints, ints)
def test_merge_valid_valid(a, b):
    assert merge_sources(valid_ctx(a), valid_ctx(b)) == valid_ctx((a, b))


@given(ints, ints, ints, ints)
def test_merge_valid_disputed_refutes(a, b, gf, lf):
    # Valid + Disputed => Refuted with only the disputed side's failures:
    # values survive ONLY when both sides are Valid (VCtx.fs:56).
    assert merge_sources(valid_ctx(a), _d(gf, lf, b)) == _r(gf, lf)
    assert merge_sources(_d(gf, lf, a), valid_ctx(b)) == _r(gf, lf)


@given(ints, ints, ints)
def test_merge_valid_refuted(a, gf, lf):
    assert merge_sources(valid_ctx(a), _r(gf, lf)) == _r(gf, lf)
    assert merge_sources(_r(gf, lf), valid_ctx(a)) == _r(gf, lf)


@given(ints, ints, ints, ints, ints, ints)
def test_merge_failing_pairs_merge_failures(a, b, gf1, lf1, gf2, lf2):
    expected = refuted_ctx([gf1, gf2], {("f1",): [lf1, lf2]})
    assert merge_sources(_d(gf1, lf1, a), _d(gf2, lf2, b)) == expected
    assert merge_sources(_d(gf1, lf1, a), _r(gf2, lf2)) == expected
    assert merge_sources(_r(gf1, lf1), _d(gf2, lf2, b)) == expected
    assert merge_sources(_r(gf1, lf1), _r(gf2, lf2)) == expected


# --- refute / dispute filing by scope (VCtx.fs:194-208, 290-304) -------------


def test_refute_files_by_scope():
    assert refute(with_value(1), "F") == refuted_ctx(["F"], {})
    assert refute(with_field("N", 1), "F") == refuted_ctx([], {("N",): ["F"]})
    assert refute(valid_ctx(ValueCtx.element(3, 1)), "F") == refuted_ctx(
        [], {("[3]",): ["F"]}
    )


def test_dispute_files_by_scope_and_continues():
    r = dispute(with_field("N", 1), "F")
    assert r == disputed_ctx([], {("N",): ["F"]}, ValueCtx.field("N", 1))
    # continues: a later dispute accumulates
    r2 = dispute(r, "G")
    assert r2.lfs == {("N",): ["F", "G"]}
    assert r2.state == "disputed"


def test_refute_short_circuits_later_validators():
    r = refute(with_field("N", 1), "F")
    r2 = dispute(r, "G")  # must not run
    assert r2 == r


# --- refute_with / dispute_with ----------------------------------------------


def test_refute_with_transforms_on_ok():
    c = refute_with(with_field("N", "5"), lambda s: (True, int(s)))
    assert c == valid_ctx(ValueCtx.field("N", 5))


def test_refute_with_files_on_error():
    c = refute_with(with_field("N", "x"), lambda s: (False, "NotAnInt"))
    assert c == refuted_ctx([], {("N",): ["NotAnInt"]})


def test_dispute_with_fact_global():
    c = dispute_with_fact(with_value(0), "TooSmall", lambda v: v >= 1)
    assert c == disputed_ctx(["TooSmall"], {}, ValueCtx.global_(0))


def test_dispute_with_none_passes():
    c = dispute_with(with_value(5), lambda v: None)
    assert c == valid_ctx(ValueCtx.global_(5))


# --- refute_with_proof nested provenance (VCtx.fs:253-269) --------------------


def test_refute_with_proof_field_prefixes_child_failures():
    child = Invalid(["G1"], {("Inner",): ["L1"]})
    c = refute_with_proof(with_field("Outer", 1), lambda a: child)
    assert c == refuted_ctx([], {("Outer",): ["G1"], ("Inner",): ["L1"]})


def test_refute_with_proof_global_merges_as_is():
    child = Invalid(["G1"], {("Inner",): ["L1"]})
    c = refute_with_proof(with_value(1), lambda a: child)
    assert c == refuted_ctx(["G1"], {("Inner",): ["L1"]})


def test_refute_with_proof_valid_passes_value():
    c = refute_with_proof(with_field("Outer", 1), lambda a: Valid(a + 1))
    assert c == valid_ctx(ValueCtx.field("Outer", 2))


# --- validate_each / element paths (VCtx.fs:136-176) --------------------------


def test_validate_each_files_element_failures():
    def child(a):
        v = with_value(a)
        return dispute_with_fact(v, "Neg", lambda x: x >= 0)

    c = validate_each(with_field("Xs", [1, -2, 3]), lambda i, a: child(a))
    assert c.state == "disputed"
    # element failure path: field name + "[i]" (global child failure filed
    # under the element key), plus the faithful empty-entry quirk under (Xs,)
    assert c.lfs[("Xs", "[1]")] == ["Neg"]
    assert list(c.value.get_value()) == [1, -2, 3]


def test_validate_each_refuted_element_refutes_list():
    def child(a):
        v = with_value(a)
        return refute(v, "Bad") if a < 0 else v

    c = validate_each(with_field("Xs", [1, -2]), lambda i, a: child(a))
    assert c.state == "refuted"
    assert c.lfs[("Xs", "[1]")] == ["Bad"]


def test_dispute_any_with_fact_element_paths():
    c = dispute_any_with_fact(with_field("Xs", [1, -2, -3]), "Neg", lambda a: a >= 0)
    assert c.state == "disputed"
    assert c.lfs[("Xs", "[1]")] == ["Neg"]
    assert c.lfs[("Xs", "[2]")] == ["Neg"]


def test_dispute_all_documented_semantics():
    # every element fails -> distinct failures added, validation continues
    c = dispute_all_with_fact(with_field("Xs", [-1, -2]), "AllNeg", lambda a: a >= 0)
    assert c.state == "disputed"
    # like the reference structure (VCtx.fs:392): failures land in the global
    # list, un-prefixed, regardless of scope (no applyFailures on this path)
    assert list(c.gfs) == ["AllNeg"]
    assert c.lfs == {}
    # any element passes -> no failures (reference impl inverts this; we pin
    # the DOCUMENTED behavior — see vctx.py module docstring)
    c2 = dispute_all_with_fact(with_field("Xs", [-1, 2]), "AllNeg", lambda a: a >= 0)
    assert c2.state == "valid"


# --- optional 8-case matrix (VCtx.fs:110-133; tests 284-368) -------------------


def _opt_child_valid(a):
    return with_value(a * 2)


def _opt_child_disputed(a):
    return dispute(with_value(a), "D")


def _opt_child_refuted(a):
    return refute(with_value(a), "R")


def test_optional_valid_none_passes_through():
    from fsharp_data_validation_spark.core.vctx import optional

    c = optional(with_field("N", None), _opt_child_valid)
    assert c == valid_ctx(ValueCtx.field("N", None))


def test_optional_valid_some_child_valid():
    from fsharp_data_validation_spark.core.vctx import optional

    c = optional(with_field("N", 3), _opt_child_valid)
    # child's ValueCtx tag survives (reference: ValueCtx.map Some b)
    assert c == valid_ctx(ValueCtx.global_(6))


def test_optional_valid_some_child_disputed_prefixes():
    from fsharp_data_validation_spark.core.vctx import optional

    c = optional(with_field("N", 3), _opt_child_disputed)
    assert c.state == "disputed"
    assert c.lfs == {("N",): ["D"]}


def test_optional_valid_some_child_refuted_prefixes():
    from fsharp_data_validation_spark.core.vctx import optional

    c = optional(with_field("N", 3), _opt_child_refuted)
    assert c == refuted_ctx([], {("N",): ["R"]})


def test_optional_disputed_none_keeps_failures():
    from fsharp_data_validation_spark.core.vctx import optional

    base = dispute(with_field("N", None), "Pre")
    c = optional(base, _opt_child_valid)
    assert c.state == "disputed"
    assert c.lfs == {("N",): ["Pre"]}
    assert c.value.get_value() is None


def test_optional_disputed_some_child_disputed_merges():
    from fsharp_data_validation_spark.core.vctx import optional

    base = dispute(with_field("N", 3), "Pre")
    c = optional(base, _opt_child_disputed)
    assert c.state == "disputed"
    assert c.lfs == {("N",): ["Pre", "D"]}


def test_optional_disputed_some_child_refuted():
    from fsharp_data_validation_spark.core.vctx import optional

    base = dispute(with_field("N", 3), "Pre")
    c = optional(base, _opt_child_refuted)
    assert c == refuted_ctx([], {("N",): ["Pre", "R"]})


def test_optional_refuted_unchanged():
    from fsharp_data_validation_spark.core.vctx import optional

    base = refuted_ctx(["G"], {("N",): ["R"]})
    c = optional(base, _opt_child_valid)
    assert c == base


# --- qed / from_vctx -----------------------------------------------------------


def test_qed_unwraps_and_transforms():
    c = qed(with_field("N", 3), lambda a: a + 1)
    assert c == valid_ctx(4)
    assert qed(with_field("N", 3)) == valid_ctx(3)


def test_from_vctx():
    assert from_vctx(valid_ctx(1)) == Valid(1)
    assert from_vctx(disputed_ctx(["G"], {("N",): ["L"]}, 1)) == Invalid(
        ["G"], {("N",): ["L"]}
    )
    assert from_vctx(refuted_ctx(["G"], {})) == Invalid(["G"], {})


# --- chainable builder smoke ----------------------------------------------------


def test_validation_builder_chain():
    p = (
        Validation.value(0)
        .dispute_with_fact("TooSmall", lambda v: v >= 1)
        .qed(lambda v: ("UserId", v))
        .proof()
    )
    assert p == Invalid(["TooSmall"], {})
