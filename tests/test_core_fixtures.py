"""Port of tests/.../Tests/Fixtures.fs — the reference's end-to-end fixtures
(UserId, PhoneNumber, EmailAddress primitives and the UserContactDTO record
with required/conditional/optional fields, nested proof mapping and a global
rule). Expected outputs pinned at Fixtures.fs:159-275."""

import re

from hypothesis import given
from hypothesis import strategies as st

from fsharp_data_validation_spark.core import (
    Invalid,
    Valid,
    Validation,
    from_vctx,
    map_invalid,
    merge_all,
)
from fsharp_data_validation_spark.core import library as L

# --- primitives (Fixtures.fs:11-92) -------------------------------------------


def make_user_id(s: int):
    return (
        Validation.value(s)
        .dispute_with_fact("LessThanOneFailure", L.is_greater_than_or_equal(1))
        .qed(lambda v: ("UserId", v))
        .proof()
    )


def make_phone_number(s: str):
    return (
        Validation.value(s)
        .dispute_with_fact("LengthFailure", L.is_length(7))
        .dispute_with_fact(
            "NonDigitFailure", lambda a: re.fullmatch(r"[0-9]*", a) is not None
        )
        .qed(lambda v: ("PhoneNumber", v))
        .proof()
    )


def make_email_address(s: str):
    return (
        Validation.value(s)
        .dispute_with_fact(
            "InvalidEmail",
            lambda a: re.fullmatch(r"[a-zA-Z0-9+._-]+@[a-zA-Z-]+\.[a-z]+", a)
            is not None,
        )
        .qed(lambda v: ("EmailAddress", v))
        .proof()
    )


@given(st.integers(1, 10_000))
def test_user_id_valid_when_ge_1(a):
    assert make_user_id(a) == Valid(("UserId", a))


@given(st.integers(-10_000, -1))
def test_user_id_fails_when_negative(a):
    assert make_user_id(a) == Invalid(["LessThanOneFailure"], {})


def test_user_id_fails_when_zero():
    assert make_user_id(0) == Invalid(["LessThanOneFailure"], {})


def test_phone_number_cases():
    assert make_phone_number("1231234") == Valid(("PhoneNumber", "1231234"))
    assert make_phone_number("1") == Invalid(["LengthFailure"], {})
    assert make_phone_number("123134!") == Invalid(["NonDigitFailure"], {})
    # both failures accumulate, in order (Fixtures.fs:66-68)
    assert make_phone_number("-12312345678!") == Invalid(
        ["LengthFailure", "NonDigitFailure"], {}
    )


def test_email_address_cases():
    assert make_email_address("test@test.com") == Valid(("EmailAddress", "test@test.com"))
    assert make_email_address("test@test") == Invalid(["InvalidEmail"], {})


# --- UserContactDTO (Fixtures.fs:94-275) ----------------------------------------

EMAIL, PHONE = "Email", "Phone"


def make_user_contact(vm: dict):
    uid = (
        Validation.field("UserId", vm.get("UserId"))
        .refute_with(L.is_required("MissingUserId"))
        .refute_with_proof(
            lambda a: map_invalid(lambda f: ("UserIdFailure", f), make_user_id(a))
        )
        .qed()
    )
    cp = (
        Validation.field("ContactPreference", vm.get("ContactPreference"))
        .refute_with(L.is_required("MissingContractPreference"))
        .qed()
    )
    pn = (
        Validation.field("PhoneNumber", vm.get("PhoneNumber"))
        .dispute_with(
            L.is_required_when(
                "MissingConditionalPhone", vm.get("ContactPreference") == PHONE
            )
        )
        .optional(
            lambda v: Validation.value(v).refute_with_proof(
                lambda a: map_invalid(
                    lambda f: ("PhoneNumberFailure", f), make_phone_number(a)
                )
            )
        )
        .qed()
    )
    ea = (
        Validation.field("EmailAddress", vm.get("EmailAddress"))
        .dispute_with(
            L.is_required_unless(
                "MissingConditionalEmail", vm.get("ContactPreference") != EMAIL
            )
        )
        .optional(
            lambda v: Validation.value(v).refute_with_proof(
                lambda a: map_invalid(
                    lambda f: ("EmailAddressFailure", f), make_email_address(a)
                )
            )
        )
        .qed()
    )
    glob = (
        Validation.value(vm)
        .dispute_with_fact("OtherFailure", lambda a: a.get("UserId") != 0)
        .qed()
    )
    merged = merge_all([uid, cp, pn, ea, glob])

    def build(t):
        uid_v, cp_v, pn_v, ea_v, _ = t
        return {
            "UserId": uid_v,
            "PhoneNumber": pn_v,
            "EmailAddress": ea_v,
            "ContactPreference": cp_v,
        }

    return from_vctx(merged.map(build).ctx)


def _dto(uid=None, phone=None, email=None, cp=None):
    return {
        "UserId": uid,
        "PhoneNumber": phone,
        "EmailAddress": email,
        "ContactPreference": cp,
    }


@given(st.integers(1, 10_000))
def test_contact_valid_when_all_pass(uid):
    r = make_user_contact(_dto(uid=uid, email="test@test.com", cp=EMAIL))
    assert r == Valid(
        {
            "UserId": ("UserId", uid),
            "PhoneNumber": None,
            "EmailAddress": ("EmailAddress", "test@test.com"),
            "ContactPreference": EMAIL,
        }
    )


@given(st.integers(1, 10_000))
def test_contact_single_failure_invalid_email(uid):
    r = make_user_contact(_dto(uid=uid, email="test@test", cp=EMAIL))
    assert r == Invalid(
        [], {("EmailAddress",): [("EmailAddressFailure", "InvalidEmail")]}
    )


@given(st.integers(-10_000, -1))
def test_contact_multi_failure_email_and_userid(uid):
    r = make_user_contact(_dto(uid=uid, email="test@test", cp=EMAIL))
    assert r == Invalid(
        [],
        {
            ("UserId",): [("UserIdFailure", "LessThanOneFailure")],
            ("EmailAddress",): [("EmailAddressFailure", "InvalidEmail")],
        },
    )


def test_contact_email_invalid_and_userid_missing():
    r = make_user_contact(_dto(uid=None, email="test@test", cp=EMAIL))
    assert r == Invalid(
        [],
        {
            ("UserId",): ["MissingUserId"],
            ("EmailAddress",): [("EmailAddressFailure", "InvalidEmail")],
        },
    )


def test_contact_global_failure_when_userid_zero():
    r = make_user_contact(_dto(uid=0, email="test@test", cp=EMAIL))
    assert r == Invalid(
        ["OtherFailure"],
        {
            ("UserId",): [("UserIdFailure", "LessThanOneFailure")],
            ("EmailAddress",): [("EmailAddressFailure", "InvalidEmail")],
        },
    )


@given(st.integers(1, 10_000))
def test_contact_missing_conditional_phone(uid):
    r = make_user_contact(_dto(uid=uid, email="test@test", cp=PHONE))
    assert r == Invalid(
        [],
        {
            ("EmailAddress",): [("EmailAddressFailure", "InvalidEmail")],
            ("PhoneNumber",): ["MissingConditionalPhone"],
        },
    )
