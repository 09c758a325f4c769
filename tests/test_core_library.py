"""Port of tests/.../Tests/Library.fs (helper predicates, incl. flipped
comparisons pinned at Library.fs tests 201-248 and isNull-means-empty at
126-139) and tests/.../Tests/Utilities.fs (mergeFailures laws)."""

from hypothesis import given
from hypothesis import strategies as st

from fsharp_data_validation_spark.core import library as L
from fsharp_data_validation_spark.core.failures import merge_failures, map_keys

ints = st.integers(-10_000, 10_000)


def test_is_required():
    assert L.is_required("F")(None) == (False, "F")
    assert L.is_required("F")(5) == (True, 5)


def test_is_required_when():
    assert L.is_required_when("F", False)(None) is None
    assert L.is_required_when("F", True)(None) == "F"
    assert L.is_required_when("F", True)(1) is None


def test_is_required_unless():
    assert L.is_required_unless("F", True)(None) is None
    assert L.is_required_unless("F", False)(None) == "F"


def test_is_ok_is_error():
    assert L.is_ok((True, 1)) and not L.is_error((True, 1))
    assert L.is_error((False, "f")) and not L.is_ok((False, "f"))


def test_is_null_means_empty():
    # Library.fs tests 126-139: emptiness, not SQL NULL — "" is "null"
    assert L.is_null("")
    assert L.is_null([])
    assert not L.is_null("x")
    assert L.is_not_null("x")
    assert not L.is_not_null([])


@given(st.text(max_size=30), st.integers(0, 10))
def test_length_helpers(s, n):
    assert L.min_length(n)(s) == (len(s) >= n)
    assert L.max_length(n)(s) == (len(s) <= n)
    assert L.is_length(n)(s) == (len(s) == n)


@given(ints, ints)
def test_flipped_comparisons(a, b):
    # pinned: is_less_than(a)(b) iff b < a (Library.fs:81-93 flipped args)
    assert L.is_less_than(a)(b) == (b < a)
    assert L.is_greater_than(a)(b) == (b > a)
    assert L.is_less_than_or_equal(a)(b) == (b <= a)
    assert L.is_greater_than_or_equal(a)(b) == (b >= a)


@given(ints, ints)
def test_equality_helpers(a, b):
    assert L.is_equal(a)(b) == (a == b)
    assert L.is_not_equal(a)(b) == (a != b)


def test_elem_helpers():
    assert L.has_elem(2)([1, 2, 3])
    assert not L.has_elem(9)([1, 2, 3])
    assert L.does_not_have_elem(9)([1, 2, 3])


def test_test_match():
    assert L.test_match("F", 1)(1) is None
    assert L.test_match("F", 1)(2) == "F"


def test_cat_options_oks_errors():
    assert L.cat_options([1, None, 2, None]) == [1, 2]
    rs = [(True, 1), (False, "a"), (True, 2), (False, "b")]
    assert L.oks(rs) == [1, 2]
    assert L.errors(rs) == ["a", "b"]


# --- Utilities.fs merge laws (tests/.../Tests/Utilities.fs:58-122) ------------


def test_merge_failures_key_union():
    a = {("x",): [1], ("y",): [2]}
    b = {("y",): [3], ("z",): [4]}
    assert merge_failures(a, b) == {("x",): [1], ("y",): [2, 3], ("z",): [4]}


def test_merge_failures_left_entries_first():
    a = {("k",): [1, 2]}
    b = {("k",): [3]}
    assert merge_failures(a, b)[("k",)] == [1, 2, 3]


def test_merge_failures_keeps_duplicates():
    a = {("k",): [1]}
    b = {("k",): [1]}
    assert merge_failures(a, b)[("k",)] == [1, 1]


def test_merge_failures_empty_identity():
    a = {("k",): [1]}
    assert merge_failures(a, {}) == a
    assert merge_failures({}, a) == a


def test_map_keys():
    m = {("a",): [1], ("b",): [2]}
    assert map_keys(lambda k: ("p",) + k, m) == {("p", "a"): [1], ("p", "b"): [2]}
