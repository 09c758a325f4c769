"""Distribution-drift checks (KS / PSI) — north-rule requirement with no
reference counterpart (SURVEY.md §2.8).

Both are computed from *histograms* built with pure DataFrame math (one
aggregation pass per segment, mergeable, no per-row Python): PSI is a
closed-form sum over matched buckets; KS is the max |ECDF_a - ECDF_b| over
bucket boundaries via window cumulative sums. Histograms are a few KB
regardless of input scale, so the final arithmetic is negligible — the cost
is one scan + one tiny shuffle per segment, which survives 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

EPS = 1e-6


def bucketize(df: DataFrame, value_col: str, bucket_width: float, n_buckets: int) -> DataFrame:
    """Fixed-width bucketing clamped to [0, n_buckets-1]; NULLs dropped."""
    b = F.least(
        F.greatest(F.floor(F.col(value_col) / F.lit(bucket_width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    return df.filter(F.col(value_col).isNotNull()).select(b.alias("bucket"))


def histogram(df: DataFrame, value_col: str, bucket_width: float, n_buckets: int) -> DataFrame:
    return (
        bucketize(df, value_col, bucket_width, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _joined_hist(hist_a: DataFrame, hist_b: DataFrame) -> DataFrame:
    a = hist_a.select("bucket", F.col("n").alias("na"))
    b = hist_b.select("bucket", F.col("n").alias("nb"))
    return a.join(b, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )


def psi(hist_a: DataFrame, hist_b: DataFrame, round_to: int = 4) -> DataFrame:
    """Population Stability Index between two histograms:
    sum((p - q) * ln(p / q)) with epsilon-clamped proportions.
    Returns a single row (psi)."""
    j = _joined_hist(hist_a, hist_b)
    totals = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    p = F.greatest(F.col("na") / F.col("ta"), F.lit(EPS))
    q = F.greatest(F.col("nb") / F.col("tb"), F.lit(EPS))
    return (
        j.crossJoin(F.broadcast(totals))
        .select(((p - q) * F.log(p / q)).alias("term"))
        .agg(F.round(F.sum("term"), round_to).alias("psi"))
    )


def ks(hist_a: DataFrame, hist_b: DataFrame, round_to: int = 4) -> DataFrame:
    """Kolmogorov-Smirnov statistic from bucketed ECDFs:
    max |cum_a/total_a - cum_b/total_b| over bucket boundaries.
    (Exact for the bucketed distributions; bucket width bounds the error vs
    the continuous statistic.) Returns a single row (ks)."""
    j = _joined_hist(hist_a, hist_b)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    totals = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    return (
        j.select("bucket", F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb"))
        .crossJoin(F.broadcast(totals))
        .select(F.abs(F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb")).alias("d"))
        .agg(F.round(F.max("d"), round_to).alias("ks"))
    )


def psi_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_width: float,
    n_buckets: int,
    round_to: int = 4,
) -> DataFrame:
    """Per-partition drift: PSI of each group's value distribution against
    the whole-table baseline, from ONE scan. Bucket counts aggregate per
    (group, bucket); the global baseline is the sum of the same aggregate
    (no second scan); PSI is computed over the full group x baseline-bucket
    grid so buckets a group is *missing* still contribute (epsilon-clamped).
    Returns (group, n_rows, psi).

    Scale: the (group, bucket) aggregate is partial+final — its output is
    |groups| x |buckets| rows (KBs at any input size); everything after is
    arithmetic on that tiny relation, fully distributed, no per-row Python."""
    b = F.least(
        F.greatest(F.floor(F.col(value_col) / F.lit(bucket_width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    per = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), b.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    glob = per.groupBy("bucket").agg(F.sum("n").alias("gn"))
    tg = per.groupBy("grp").agg(F.sum("n").alias("tg"))
    tot = per.agg(F.sum("n").alias("t"))
    grid = tg.crossJoin(F.broadcast(glob))
    j = (
        grid.join(per, ["grp", "bucket"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    p = F.greatest(F.col("n") / F.col("tg"), F.lit(EPS))
    q = F.greatest(F.col("gn") / F.col("t"), F.lit(EPS))
    return (
        j.select("grp", "tg", ((p - q) * F.log(p / q)).alias("term"))
        .groupBy("grp")
        .agg(
            F.first("tg").alias("n_rows"),
            F.round(F.sum("term"), round_to).alias("psi"),
        )
        .select(F.col("grp").alias(group_col), "n_rows", "psi")
    )


def ks_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_width: float,
    n_buckets: int,
    round_to: int = 4,
) -> DataFrame:
    """Per-partition KS: max |group ECDF - global ECDF| over bucket
    boundaries, same one-scan shape as ``psi_by_group`` (the grid is
    bucket-complete per group, so one window per group also accumulates the
    global ECDF). Returns (group, n_rows, ks)."""
    b = F.least(
        F.greatest(F.floor(F.col(value_col) / F.lit(bucket_width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    per = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), b.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    gbase = per.groupBy("bucket").agg(F.sum("n").alias("gn"))
    tg = per.groupBy("grp").agg(F.sum("n").alias("tg"))
    tot = per.agg(F.sum("n").alias("t"))
    grid = tg.crossJoin(F.broadcast(gbase))
    j = (
        grid.join(per, ["grp", "bucket"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    w = Window.partitionBy("grp").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = F.abs(
        F.sum("n").over(w) / F.col("tg") - F.sum("gn").over(w) / F.col("t")
    )
    return (
        j.select("grp", "tg", d.alias("d"))
        .groupBy("grp")
        .agg(
            F.first("tg").alias("n_rows"),
            F.round(F.max("d"), round_to).alias("ks"),
        )
        .select(F.col("grp").alias(group_col), "n_rows", "ks")
    )
