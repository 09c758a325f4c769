"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full transcript row-constraint suite on
sf0.001, returning the violation rows with name-path provenance.

``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
north-rule table-level checks). Each callable: (spark, sf_dir) -> DataFrame.

``oracle_sql()`` — DuckDB-dialect equivalents over the same parquet views.
The ``transcripts`` input (BASELINE.json input_hint) is derived
*deterministically* from the driver's ``events`` table by a SQL snippet that
runs identically on Spark and DuckDB (fsharp_data_validation_spark.sources.
transcripts), so every transcript query is oracle-checked end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from fsharp_data_validation_spark.operators.crossrow import (
    ordering_violations,
    referential_violations,
    uniqueness_violations,
)
from fsharp_data_validation_spark.operators.drift import histogram, ks, psi
from fsharp_data_validation_spark.operators.stats import column_profile, exact_quantiles
from fsharp_data_validation_spark.operators.transcript_suite import transcript_row_suite
from fsharp_data_validation_spark.sources.transcripts import (
    ROLES,
    derive_transcripts,
    tool_catalog,
    with_transcripts,
)

KEY = ["conv_id", "turn_idx", "ts"]


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_transcripts(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    t = _transcripts(spark, "/root/testdata/sf0.001")
    res = transcript_row_suite().run(t, KEY)
    return res.violations.select(
        "conv_id", "turn_idx", "ts", F.col("path_str").alias("path"), "code"
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q_row_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized refute/dispute suite -> violation rows (SURVEY.md §2.3-2.5)."""
    t = _transcripts(spark, sf_dir)
    res = transcript_row_suite().run(t, KEY)
    return res.violations.select(
        "conv_id", "turn_idx", "ts", F.col("path_str").alias("path"), "code"
    )


def q_valid_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MergeSources collapse: rows with ANY failure emit no valid row."""
    t = _transcripts(spark, sf_dir)
    res = transcript_row_suite().run(t, KEY)
    return res.valid.groupBy("role").agg(F.count(F.lit(1)).alias("n_valid"))


def q_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition pass/fail verdict + metrics (north rule)."""
    t = _transcripts(spark, sf_dir).withColumn("part_date", F.to_date("ts"))
    res = transcript_row_suite().run(t, KEY)
    return res.verdict(["part_date"], t).select(
        "part_date",
        "rows_scanned",
        "rows_with_violations",
        "violations",
        "constraints_evaluated",
        F.col("pass").alias("is_pass"),
    )


def q_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness on (conv_id, turn_idx) — hash agg w/ map-side combine."""
    return uniqueness_violations(_transcripts(spark, sf_dir), ["conv_id", "turn_idx"])


def q_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tool -> allowed-tool-catalog via broadcast LEFT ANTI join."""
    t = _transcripts(spark, sf_dir)
    return referential_violations(
        t, "tool", tool_catalog(spark), "tool", ["conv_id", "turn_idx", "tool"]
    )


def q_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts regressions against turn order (lag window per conversation)."""
    return ordering_violations(_transcripts(spark, sf_dir))


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null rate + exact distinct count, single agg pass."""
    t = _transcripts(spark, sf_dir)
    return column_profile(t, ["conv_id", "turn_idx", "role", "text", "tool"])


def q_text_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of turn length (oracle-checkable
    variant of the t-digest path)."""
    t = _transcripts(spark, sf_dir).select(F.length("text").alias("text_len"))
    return exact_quantiles(t, "text_len", [0.25, 0.5, 0.75, 0.95])


def _epoch_s(c) -> "F.Column":
    """Whole-second epoch for Timestamp/TimestampNTZ (UTC session tz);
    matches DuckDB ``CAST(FLOOR(epoch(ts)) AS BIGINT)``."""
    return F.unix_seconds(F.col(c).cast("timestamp"))


def _split_halves(t: DataFrame):
    """Deterministic first/second half split by epoch midpoint (identical
    arithmetic on the DuckDB side)."""
    mid = t.agg(
        F.round((F.min(_epoch_s("ts")) + F.max(_epoch_s("ts"))) / 2).alias("mid")
    ).collect()[0]["mid"]
    return t.filter(_epoch_s("ts") < mid), t.filter(_epoch_s("ts") >= mid)


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI on turn-length histograms, first half vs second half by event
    time (epsilon-clamped closed form over bucketed proportions)."""
    t = _transcripts(spark, sf_dir).select(F.length("text").alias("text_len"), "ts")
    fa, fb = _split_halves(t)
    a = histogram(fa, "text_len", 10.0, 20)
    b = histogram(fb, "text_len", 10.0, 20)
    return psi(a, b)


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS statistic on the same split (max |ECDF diff| over buckets)."""
    t = _transcripts(spark, sf_dir).select(F.length("text").alias("text_len"), "ts")
    fa, fb = _split_halves(t)
    a = histogram(fa, "text_len", 10.0, 20)
    b = histogram(fb, "text_len", 10.0, 20)
    return ks(a, b)


def q_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (relational agg coverage)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "row_suite": q_row_suite,
        "valid_turns": q_valid_turns,
        "verdict": q_verdict,
        "uniqueness": q_uniqueness,
        "referential": q_referential,
        "ordering": q_ordering,
        "column_profile": q_column_profile,
        "text_len_quantiles": q_text_len_quantiles,
        "psi_drift": q_psi_drift,
        "ks_drift": q_ks_drift,
        "q1_pricing": q_q1_pricing,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB dialect)
# --------------------------------------------------------------------------

_ROLES_SQL = ",".join(f"'{r}'" for r in ROLES)

# per-constraint failure conditions with refute masks made explicit;
# mirrors transcript_row_suite() constraint-for-constraint
_FAIL_CONDS = [
    ("conv_id", "conv_id_required", "conv_id IS NULL"),
    (
        "conv_id",
        "conv_id_format",
        "conv_id IS NOT NULL AND NOT regexp_matches(conv_id, '^c[0-9]+$')",
    ),
    ("turn_idx", "turn_idx_required", "turn_idx IS NULL"),
    ("turn_idx", "turn_idx_negative", "turn_idx IS NOT NULL AND turn_idx < 0"),
    ("role", "role_required", "role IS NULL"),
    ("role", "role_enum", f"role IS NOT NULL AND role NOT IN ({_ROLES_SQL})"),
    ("text", "text_required", "text IS NULL"),
    ("text", "text_empty", "text IS NOT NULL AND length(text) < 1"),
    ("text", "text_too_long", "text IS NOT NULL AND length(text) > 10000"),
    (
        "tool",
        "tool_format",
        "tool IS NOT NULL AND NOT regexp_matches(tool, '^tool_[0-9]+$')",
    ),
    ("tool", "tool_missing_for_tool_role", "role = 'tool' AND tool IS NULL"),
    ("", "tool_on_non_tool_role", "COALESCE(role = 'tool' OR tool IS NULL, TRUE) = FALSE"),
]

_ROW_SUITE_ORACLE = with_transcripts(
    "SELECT conv_id, turn_idx, ts, path, code FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT conv_id, turn_idx, ts, '{p}' AS path, '{c}' AS code FROM transcripts WHERE {w}"
        for p, c, w in _FAIL_CONDS
    )
    + "\n) v"
)

_NF_EXPR = " + ".join(f"(CASE WHEN {w} THEN 1 ELSE 0 END)" for _, _, w in _FAIL_CONDS)

_MID_SQL = (
    "SELECT ROUND((MIN(CAST(FLOOR(epoch(ts)) AS BIGINT))"
    " + MAX(CAST(FLOOR(epoch(ts)) AS BIGINT))) / 2) AS mid FROM transcripts"
)

_HIST_SQL = """
SELECT LEAST(GREATEST(CAST(FLOOR(length(text) / 10.0) AS INT), 0), 19) AS bucket,
       COUNT(*) AS n
FROM transcripts
WHERE text IS NOT NULL AND CAST(FLOOR(epoch(ts)) AS BIGINT) {op} (SELECT mid FROM m)
GROUP BY 1
"""


def oracle_sql() -> dict[str, str]:
    roles = _ROLES_SQL
    return {
        "row_suite": _ROW_SUITE_ORACLE,
        "valid_turns": with_transcripts(
            f"SELECT role, COUNT(*) AS n_valid FROM transcripts WHERE ({_NF_EXPR}) = 0 GROUP BY role"
        ),
        "verdict": with_transcripts(
            f"""
            SELECT CAST(ts AS DATE) AS part_date,
                   COUNT(*) AS rows_scanned,
                   CAST(SUM(CASE WHEN nf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_violations,
                   CAST(SUM(nf) AS BIGINT) AS violations,
                   {len(_FAIL_CONDS)} AS constraints_evaluated,
                   (SUM(nf) = 0) AS is_pass
            FROM (SELECT ts, ({_NF_EXPR}) AS nf FROM transcripts) f
            GROUP BY 1
            """
        ),
        "uniqueness": with_transcripts(
            "SELECT conv_id, turn_idx, COUNT(*) AS n_dups FROM transcripts "
            "GROUP BY conv_id, turn_idx HAVING COUNT(*) > 1"
        ),
        "referential": with_transcripts(
            "SELECT conv_id, turn_idx, tool FROM transcripts "
            "WHERE tool IS NOT NULL AND tool NOT IN (SELECT tool FROM tool_catalog)"
        ),
        "ordering": with_transcripts(
            """
            SELECT conv_id, turn_idx, ts, prev_ts FROM (
              SELECT conv_id, turn_idx, ts,
                     LAG(turn_idx) OVER w AS prev_idx,
                     LAG(ts) OVER w AS prev_ts
              FROM transcripts
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts)
            ) x
            WHERE prev_idx IS NOT NULL AND turn_idx > prev_idx AND ts < prev_ts
            """
        ),
        "column_profile": with_transcripts(
            "\nUNION ALL\n".join(
                f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
                f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
                f"ROUND(CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS null_rate, "
                f"COUNT(DISTINCT {c}) AS n_distinct FROM transcripts"
                for c in ["conv_id", "turn_idx", "role", "text", "tool"]
            )
        ),
        "text_len_quantiles": with_transcripts(
            "SELECT "
            + ", ".join(
                f"ROUND(quantile_cont(length(text), {q}), 4) AS q{int(q * 100)}"
                for q in [0.25, 0.5, 0.75, 0.95]
            )
            + " FROM transcripts WHERE text IS NOT NULL"
        ),
        "psi_drift": with_transcripts(
            f"""
            , m AS ({_MID_SQL})
            , ha AS ({_HIST_SQL.format(op='<')})
            , hb AS ({_HIST_SQL.format(op='>=')})
            , j AS (
              SELECT COALESCE(ha.bucket, hb.bucket) AS bucket,
                     COALESCE(ha.n, 0) AS na, COALESCE(hb.n, 0) AS nb
              FROM ha FULL OUTER JOIN hb ON ha.bucket = hb.bucket
            )
            SELECT ROUND(SUM((p - q) * LN(p / q)), 4) AS psi FROM (
              SELECT GREATEST(na * 1.0 / (SELECT SUM(na) FROM j), 1e-6) AS p,
                     GREATEST(nb * 1.0 / (SELECT SUM(nb) FROM j), 1e-6) AS q
              FROM j
            ) t
            """
        ),
        "ks_drift": with_transcripts(
            f"""
            , m AS ({_MID_SQL})
            , ha AS ({_HIST_SQL.format(op='<')})
            , hb AS ({_HIST_SQL.format(op='>=')})
            , j AS (
              SELECT COALESCE(ha.bucket, hb.bucket) AS bucket,
                     COALESCE(ha.n, 0) AS na, COALESCE(hb.n, 0) AS nb
              FROM ha FULL OUTER JOIN hb ON ha.bucket = hb.bucket
            )
            SELECT ROUND(MAX(ABS(ca * 1.0 / (SELECT SUM(na) FROM j)
                               - cb * 1.0 / (SELECT SUM(nb) FROM j))), 4) AS ks
            FROM (
              SELECT SUM(na) OVER (ORDER BY bucket) AS ca,
                     SUM(nb) OVER (ORDER BY bucket) AS cb
              FROM j
            ) t
            """
        ),
        "q1_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "COUNT(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
        ),
    }
