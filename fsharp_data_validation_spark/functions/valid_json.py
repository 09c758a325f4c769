"""Spark-side Valid-branch JSON rendering, byte-compatible with the kernel's
``render_proof_json`` / the reference's ``ProofConverter.Write`` Valid arm
(/root/reference/src/FSharp.Data.Validation/Proof.fs:74-79; golden
``{"MyName":"John Smith","MyInt":42}`` at Tests/Proof.fs:92-101).

The reference serializes the validated value with ``JsonSerializer.Serialize``
default options: field names as declared (NOT camelCased — unlike failure
paths), values through the HTML-safe encoder (quote/backslash/control/
``<>&'+`` + backtick escaped, non-ASCII as ``\\uXXXX``, astral chars as a
UTF-16 surrogate pair). ``valid_json_column`` reproduces that for a row of
plain columns.

Design: the structure (braces, quoted keys, separators) is compile-time
literal concat — codegen'd. Dynamic string values take a two-tier escape:
a codegen'd ``rlike`` fast path passes strings made only of JSON-safe ASCII
through untouched (the overwhelming majority of real text), and only strings
containing a sensitive char fall into a per-character higher-order-function
rewrite (interpreted, but evaluated on the rare dirty slice — same policy as
``report_json_column``). No Python UDFs anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..core.serialize import escape_json

# JSON-safe ASCII: 0x20..0x7E minus  " \ < > & ' + `
_SAFE_CHARS = "".join(
    chr(o) for o in range(0x20, 0x7F) if chr(o) not in set('"\\<>&\'+`')
)
# character class for rlike: escape regex metacharacters
_SAFE_CLASS = "".join(
    "\\" + c if c in r"\^]-[" else c for c in _SAFE_CHARS
)
_SAFE_RE = f"^[{_SAFE_CLASS}]*$"

# control chars with short escapes, per json.dumps (the kernel's choice)
_SHORT = {0x08: "\\b", 0x09: "\\t", 0x0A: "\\n", 0x0C: "\\f", 0x0D: "\\r"}


def _escape_char(c: Column) -> Column:
    """Escape ONE character (a 1-element string column) exactly like the
    kernel ``_escape``. Handles both UTF-16-unit and codepoint splitting:
    if the engine hands us a full astral codepoint, emit the surrogate
    pair; if it hands surrogate halves, each half lands in the \\uXXXX arm.
    """
    o = F.ascii(c)
    hex4 = lambda x: F.lpad(F.lower(F.hex(x)), 4, "0")  # noqa: E731
    short = None
    for code, rep in _SHORT.items():
        cond = F.when(o == code, F.lit(rep))
        short = cond if short is None else short.when(o == code, F.lit(rep))
    astral_hi = F.floor((o - 0x10000) / 0x400).cast("int") + F.lit(0xD800)
    astral_lo = F.pmod(o - 0x10000, F.lit(0x400)).cast("int") + F.lit(0xDC00)
    return (
        F.when(c == '"', F.lit('\\"'))
        .when(c == "\\", F.lit("\\\\"))
        .when((o < 0x20) & o.isin(list(_SHORT)), short)
        .when(o < 0x20, F.concat(F.lit("\\u"), hex4(o)))
        .when(
            o > 0xFFFF,
            F.concat(F.lit("\\u"), hex4(astral_hi), F.lit("\\u"), hex4(astral_lo)),
        )
        .when((o > 0x7E) | c.isin(list('<>&\'+`')), F.concat(F.lit("\\u"), hex4(o)))
        .otherwise(c)
    )


def escape_json_column(col: Column) -> Column:
    """Kernel-``_escape``-equivalent escaping of a dynamic string column.
    Fast path: strings of only JSON-safe ASCII pass through a codegen'd
    ``rlike`` untouched; dirty strings are rewritten per character with a
    higher-order function (interpreted — rare slice only)."""
    slow = F.array_join(
        F.transform(F.split(col, ""), lambda c: _escape_char(c)), ""
    )
    return F.when(col.rlike(_SAFE_RE), col).otherwise(slow)


def _render_value(col: Column, dtype: str) -> Column:
    """JSON text of one column value per Spark dtype, matching what the
    kernel's ``dumps_stj`` does to the collected Python value:
    - string    -> quoted + escaped
    - integral  -> decimal digits
    - boolean   -> true/false
    - timestamp -> quoted ``str(datetime)`` form (``yyyy-MM-dd HH:mm:ss``
                   with ``.SSSSSS`` only when the microsecond part is
                   nonzero — exactly Python ``str()``)
    - float/double/decimal -> JVM string rendering; documented divergence
      from Python ``repr`` for values where shortest-round-trip differs
      (byte-parity is claimed and tested for the non-float types)
    NULL of any type -> ``null``.
    """
    if dtype == "string":
        body = F.concat(F.lit('"'), escape_json_column(col), F.lit('"'))
    elif dtype in ("int", "bigint", "smallint", "tinyint", "long", "integer"):
        body = col.cast("string")
    elif dtype == "boolean":
        body = F.when(col, F.lit("true")).otherwise(F.lit("false"))
    elif dtype == "timestamp":
        micros = F.pmod(F.unix_micros(col), F.lit(1_000_000))
        base = F.date_format(col, "yyyy-MM-dd HH:mm:ss")
        frac = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        body = F.concat(
            F.lit('"'), F.when(micros == 0, base).otherwise(frac), F.lit('"')
        )
    elif dtype == "date":
        body = F.concat(F.lit('"'), F.date_format(col, "yyyy-MM-dd"), F.lit('"'))
    else:  # float/double/decimal and anything else: JVM rendering
        body = col.cast("string")
    return F.coalesce(body, F.lit("null"))


def valid_json_column(
    df: DataFrame, fields: Optional[Sequence[str]] = None
) -> Column:
    """One JSON document per (validated) row: ``{"field":value,...}`` in
    declared column order with field names as-is — the Spark analogue of the
    kernel's ``render_proof_json(Proof.valid(row_dict))``. Field-name
    literals are escaped at compile time with the exact kernel encoder."""
    names = list(fields) if fields is not None else [f.name for f in df.schema.fields]
    dtypes = dict(df.dtypes)
    parts: list[Column] = [F.lit("{")]
    for i, name in enumerate(names):
        prefix = ("," if i else "") + f'"{escape_json(name)}":'
        parts.append(F.lit(prefix))
        parts.append(_render_value(F.col(name), dtypes[name]))
    parts.append(F.lit("}"))
    return F.concat(*parts)
