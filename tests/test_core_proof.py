"""Port of tests/.../Tests/Proof.fs: map/mapInvalid/combine laws, the two
golden JSON strings (lines 101, 127), and ValueCtx laws (Tests/ValueCtx.fs)."""

import json

from fsharp_data_validation_spark.core import (
    Invalid,
    Valid,
    ValueCtx,
    combine,
    flatten_proofs,
    is_invalid,
    is_valid,
    map_invalid,
    proof_map,
    raise_if_invalid,
    to_result,
    to_validation_failures,
)
from fsharp_data_validation_spark.core.names import render_path, to_camel_case, mk_name
from fsharp_data_validation_spark.core.proof import InvalidProofException
from fsharp_data_validation_spark.core.serialize import (
    render_failures_json,
    render_proof_json,
)


def test_proof_map():
    assert proof_map(lambda a: a + 1, Valid(1)) == Valid(2)
    inv = Invalid(["g"], {("f",): ["l"]})
    assert proof_map(lambda a: a + 1, inv) == inv


def test_map_invalid_maps_globals_and_fields():
    inv = Invalid(["g"], {("f",): ["l"]})
    assert map_invalid(lambda f: ("W", f), inv) == Invalid(
        [("W", "g")], {("f",): [("W", "l")]}
    )
    assert map_invalid(lambda f: ("W", f), Valid(1)) == Valid(1)


def test_combine():
    # Proof.fs tests 80-88
    i1 = Invalid(["g1"], {("Field1",): ["l1"]})
    i2 = Invalid(["g2"], {("Field1",): ["l2"], ("Field2",): ["l3"]})
    assert combine(lambda a, b: a + b, i1, i2) == Invalid(
        ["g1", "g2"], {("Field1",): ["l1", "l2"], ("Field2",): ["l3"]}
    )
    assert combine(lambda a, b: a + b, Valid(1), Valid(2)) == Valid(3)
    assert combine(lambda a, b: a + b, Valid(1), i1) == i1
    assert combine(lambda a, b: a + b, i1, Valid(1)) == i1


def test_flatten_proofs():
    assert flatten_proofs([Valid(1), Valid(2)]) == Valid([1, 2])
    r = flatten_proofs([Valid(1), Invalid(["a"], {}), Invalid(["b"], {})])
    assert r == Invalid(["a", "b"], {})


def test_to_result_and_projections():
    assert is_valid(Valid(1)) and not is_invalid(Valid(1))
    assert to_validation_failures(Valid(1)) is None
    vf = to_validation_failures(Invalid(["g"], {("f",): ["l"]}))
    assert tuple(vf.failures) == ("g",) and vf.fields == {("f",): ["l"]}
    assert to_result(Valid(1)) == ("ok", 1)
    tag, err = to_result(Invalid(["g"], {}))
    assert tag == "error" and tuple(err.failures) == ("g",)


def test_raise_if_invalid():
    assert raise_if_invalid("msg", Valid(7)) == 7
    try:
        raise_if_invalid("msg", Invalid(["g"], {("f",): ["l"]}))
        assert False, "should raise"
    except InvalidProofException as e:
        assert e.global_failures == ["g"]
        assert e.field_failures == {("f",): ["l"]}


# --- name / path rendering -----------------------------------------------------


def test_mk_name():
    assert mk_name("  x ") == "x"
    assert mk_name("   ") is None
    assert mk_name(None) is None
    assert mk_name("") is None


def test_to_camel_case():
    assert to_camel_case("MyName") == "myName"
    assert to_camel_case("X") == "x"
    assert to_camel_case("") == ""
    assert to_camel_case("[0]") == "[0]"


def test_render_path():
    assert render_path(("MyObj", "MyInt")) == "myObj.myInt"
    assert render_path(()) == ""
    assert render_path(("Tags", "[0]")) == "tags.[0]"


# --- golden JSON (Proof.fs tests at lines 92-127) --------------------------------


class _MyFailure:
    def __init__(self, s):
        self.s = s

    def __str__(self):
        return self.s


def test_golden_valid_json():
    p = Valid({"MyName": "John Smith", "MyInt": 42})
    assert render_proof_json(p) == '{"MyName":"John Smith","MyInt":42}'


def test_golden_invalid_json():
    gfs = [_MyFailure("John Smith's number can only be 42, not 41.")]
    lfs = {
        ("MyName",): [_MyFailure("MyName cannot be empty.")],
        ("MyObj", "MyInt"): [_MyFailure("MyInt cannot be less than 42.")],
    }
    expected = (
        '{"failures":["John Smith\\u0027s number can only be 42, not 41."],'
        '"fields":{"myName":["MyName cannot be empty."],'
        '"myObj.myInt":["MyInt cannot be less than 42."]}}'
    )
    assert render_failures_json(gfs, lfs) == expected
    assert render_proof_json(Invalid(gfs, lfs)) == expected
    # and it is valid JSON
    doc = json.loads(render_failures_json(gfs, lfs))
    assert doc["fields"]["myObj.myInt"] == ["MyInt cannot be less than 42."]


# --- ValueCtx laws (Tests/ValueCtx.fs:9-76) --------------------------------------


def test_valuectx_get_set_map_bind():
    e = ValueCtx.element(2, 10)
    f = ValueCtx.field("N", 10)
    g = ValueCtx.global_(10)
    for v in (e, f, g):
        assert v.get_value() == 10
        assert v.set_value(11).get_value() == 11
        assert v.set_value(11).tag == v.tag
        assert v.map(lambda a: a + 1).get_value() == 11
        assert v.map(lambda a: a + 1).tag == v.tag
        assert v.bind(lambda a: ValueCtx.global_(a * 2)) == ValueCtx.global_(20)
    assert e.set_value(11).index == 2
    assert f.set_value(11).name == "N"
