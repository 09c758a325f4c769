"""Dataset-level check suite — declarative metric assertions evaluated in
ONE aggregation pass (the Deequ architecture: Schelter et al., "Automating
Large-Scale Data Quality Verification", VLDB 2018 — public work).

This is the dataset-granularity counterpart of the row-level Proof suite
(functions/compiler.py): the reference's ``qed``/``Proof.combine`` semantics
(Proof.fs:102-113, Library.fs:113-115) lifted from "one value passes its
validators" to "one table passes its metric thresholds". Every metric is an
associative aggregate, so Spark computes the whole suite with map-side
partial aggregation + one tiny final reduce — one scan of only the referenced
columns, one row shuffled per partition, any scale. The check table itself is
O(#checks) rows: at 10^12 turns the output is the same ~10 rows.
"""

from __future__ import annotations

import math
import re

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: comparison operators a check may assert (kept to a closed set so the
#: status expression stays a plain Column and the DuckDB oracle can mirror it)
_OPS = {">=", "<=", ">", "<", "=="}


@dataclass(frozen=True)
class Check:
    """One metric assertion: ``name`` labels the output row, ``metric`` is an
    AGGREGATE Column (count/avg/sum/min/max/countDistinct compositions),
    ``op`` + ``threshold`` form the pass predicate ``metric op threshold``."""

    name: str
    metric: Column
    op: str
    threshold: float

    def __post_init__(self) -> None:
        if self.op not in _OPS:
            raise ValueError(f"unsupported check op {self.op!r} (allowed: {_OPS})")
        # the name is interpolated into a selectExpr stack() literal — keep
        # it to a safe charset so a quote can't produce invalid/injected SQL
        if not re.fullmatch(r"[A-Za-z0-9_.\- ]+", self.name or ""):
            raise ValueError(
                f"check name {self.name!r} must match [A-Za-z0-9_.- ]+ "
                "(it is embedded in a SQL string literal)"
            )


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value — Deequ's Completeness."""
    return F.avg(F.col(col).isNotNull().cast("double"))


def compliance(predicate: Column) -> Column:
    """Fraction of rows satisfying ``predicate`` (NULL counts as failing) —
    Deequ's Compliance."""
    return F.avg(F.coalesce(predicate.cast("double"), F.lit(0.0)))


def uniqueness(cols: Sequence[str]) -> Column:
    """distinct(keys) / count(*) — 1.0 iff the key is unique. Exact
    (two-children aggregate, still one pass); swap the countDistinct for
    ``approx_count_distinct`` at 10^12 rows for a sketch-backed ratio."""
    return F.countDistinct(*[F.col(c) for c in cols]) / F.count(F.lit(1))


def dataset_checks(
    df: DataFrame, checks: Sequence[Check], round_to: int = 4
) -> DataFrame:
    """Evaluate a check suite in one aggregation pass.

    Returns (check_name, metric_value, op, threshold, status) — one row per
    check, ``status`` in {'pass','fail'}. All metrics land in a single
    ``agg`` (so the input is scanned once and only the referenced columns are
    read); the wide one-row result is unpivoted with ``stack`` exactly like
    ``column_profile`` (operators/stats.py:38-62). Metric values are rounded
    BEFORE the threshold comparison so pass/fail is reproducible across
    engines at the published precision.
    """
    if not checks:
        raise ValueError("dataset_checks needs at least one Check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("check names must be unique")
    aggs = [
        F.round(c.metric.cast("double"), round_to).alias(f"_m_{i}")
        for i, c in enumerate(checks)
    ]
    wide = df.agg(*aggs)
    # one stack row per check: (name, value, op, threshold) are literals
    # except the metric — the comparison itself is a plain Column per row
    rows = ", ".join(
        f"'{c.name}', _m_{i}, '{c.op}', CAST({c.threshold!r} AS DOUBLE)"
        for i, c in enumerate(checks)
    )
    unpivoted = wide.selectExpr(
        f"stack({len(checks)}, {rows}) AS (check_name, metric_value, op, threshold)"
    )
    passed = (
        F.when(F.col("op") == ">=", F.col("metric_value") >= F.col("threshold"))
        .when(F.col("op") == "<=", F.col("metric_value") <= F.col("threshold"))
        .when(F.col("op") == ">", F.col("metric_value") > F.col("threshold"))
        .when(F.col("op") == "<", F.col("metric_value") < F.col("threshold"))
        .otherwise(F.col("metric_value") == F.col("threshold"))
    )
    return unpivoted.select(
        "check_name",
        "metric_value",
        "op",
        "threshold",
        F.when(passed, F.lit("pass")).otherwise(F.lit("fail")).alias("status"),
    )


def fd_violations(
    df: DataFrame,
    fds: Sequence[tuple[Sequence[str], str]],
    round_to: int = 4,
) -> DataFrame:
    """Functional-dependency violation profile: for each candidate FD
    ``lhs -> rhs``, how many lhs keys map to MORE than one distinct rhs
    value (and how many rows sit under those keys).

    The dataset-level generalization of the reference's per-field
    ``isEqual``/uniqueness gates (Library.fs:87-96): instead of asserting a
    single value, it measures whether a column is FUNCTIONALLY DETERMINED —
    the standard data-profiling primitive for catching fan-out bugs
    (duplicate (conv_id, turn_idx) pairs carrying different payloads).

    One hash aggregate per FD (keyed on its own lhs, so each is an
    independent map-side-combined shuffle) followed by an O(keys)→1-row
    reduce; the unioned output is |fds| rows at any data scale. NULL lhs
    values group as a key and NULL rhs values don't count as a distinct
    value — identical semantics in Spark and ANSI SQL, so the DuckDB oracle
    is a literal UNION ALL of the same grouped subqueries."""
    if not fds:
        raise ValueError("fd_violations needs at least one candidate FD")
    outs = []
    for lhs, rhs in fds:
        label = ",".join(lhs) + "->" + rhs
        keyed = df.groupBy(*[F.col(c) for c in lhs]).agg(
            F.countDistinct(F.col(rhs)).alias("_n_rhs"),
            F.count(F.lit(1)).alias("_n_rows"),
        )
        bad = F.col("_n_rhs") > 1
        outs.append(
            keyed.agg(
                F.lit(label).alias("fd"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(bad.cast("long")).alias("violating_keys"),
                F.sum(F.when(bad, F.col("_n_rows")).otherwise(F.lit(0))).alias(
                    "violating_rows"
                ),
                F.round(F.avg(bad.cast("double")), round_to).alias("violation_rate"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


#: Benford expected first-digit probabilities log10(1 + 1/d), d = 1..9.
_BENFORD = [0.0] + [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_check(
    df: DataFrame, value_col: str, round_to: int = 4
) -> DataFrame:
    """First-significant-digit distribution of a positive integer column vs
    Benford's law, with the chi-square distance attached.

    Digit extraction is string-based (first character of the integer's
    decimal rendering) rather than ``floor(v/10^floor(log10 v))`` — the
    log form misclassifies exact powers of ten when log10 lands at
    2.9999999999…, and the string form is bit-identical across Spark and
    DuckDB. One hash aggregate over the (at most 9)-row digit space with
    map-side combine, joined to the full 1..9 digit spine (a digit that
    NEVER occurs is the strongest non-conformance signal and must still
    contribute its expected mass N·p_d to chi² — dropping unobserved
    digits would understate the statistic exactly when it matters most),
    then a window over those 9 rows for the total and the shared chi².
    O(1) output at any scale.

    Returns (digit, n, obs_p, exp_p, chi2) — 9 rows always; ``chi2`` =
    Σ(n_d − N·p_d)²/(N·p_d) over ALL digits, constant across rows (0 on
    empty input)."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("bigint")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    agg = (
        df.filter(v > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    full = spine.join(agg, "digit", "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    exp_p = F.element_at(F.lit(_BENFORD), F.col("digit") + 1)
    w = Window.partitionBy()
    tot = F.sum("n").over(w)
    expected = tot * exp_p
    nonempty = tot > 0
    return (
        full.select(
            "digit",
            "n",
            F.when(nonempty, F.col("n") / tot).otherwise(F.lit(0.0)).alias("_obs"),
            exp_p.alias("_exp"),
            F.sum(
                F.when(
                    nonempty,
                    (F.col("n") - expected) * (F.col("n") - expected) / expected,
                ).otherwise(F.lit(0.0))
            )
            .over(w)
            .alias("_chi2"),
        )
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round("_obs", round_to).alias("obs_p"),
            F.round("_exp", round_to).alias("exp_p"),
            F.round("_chi2", round_to).alias("chi2"),
        )
    )
