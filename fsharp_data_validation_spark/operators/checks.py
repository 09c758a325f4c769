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
