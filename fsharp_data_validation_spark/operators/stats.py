"""Per-column statistics — the dataset-profile side of the north rule:
null rate, distinct count (exact + HLL sketch), min/max, quantiles
(built-in approx + t-digest via Arrow-batched applyInPandas).

≅ the reference's ``flattenProofs``/``Proof.combine`` aggregation semantics
(Library.fs:113-115, Proof.fs:102-113): every statistic here is an
associative merge, so Spark's partial (map-side) + final aggregation applies
— one pass, one small shuffle, any scale.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..cache import persist_tracked
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)


def column_profile(
    df: DataFrame, cols: Sequence[str], exact_distinct: bool = True, round_to: int = 4
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, null_rate, n_distinct).

    Single aggregation pass over the table: all per-column measures are
    computed in one ``agg`` and unpivoted with ``stack`` — the scan is read
    once regardless of column count. ``exact_distinct=False`` switches to
    ``approx_count_distinct`` (HLL++, mergeable sketch) for the 100 TB path.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"_dist_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}" for c in cols
    )
    return (
        wide.selectExpr(
            "_n",
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)",
        )
        .select(
            "col_name",
            F.col("_n").alias("n_rows"),
            "n_nulls",
            F.round(F.col("n_nulls") / F.col("_n"), round_to).alias("null_rate"),
            "n_distinct",
        )
    )


def numeric_minmax(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, min_value, max_value) for numeric/orderable columns, one pass."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("double").alias(f"_min_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', _min_{c}, _max_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, min_value, max_value)"
    )


def exact_quantiles(
    df: DataFrame, col: str, qs: Sequence[float], round_to: int = 4
) -> DataFrame:
    """Exact continuous-interpolation percentiles (built-in ``percentile``)
    — the oracle-checkable variant; use t-digest below at scale."""
    exprs = [
        F.round(F.expr(f"percentile({col}, {q})"), round_to).alias(f"q{int(q * 100)}")
        for q in qs
    ]
    return df.agg(*exprs)


def approx_quantiles(df: DataFrame, col: str, qs: Sequence[float]) -> DataFrame:
    """Built-in mergeable sketch (``percentile_approx``; GK-style) —
    single-pass, partial-aggregating, the default at 100 TB."""
    exprs = [
        F.expr(f"percentile_approx({col}, {q}, 10000)").alias(f"q{int(q * 100)}")
        for q in qs
    ]
    return df.agg(*exprs)


# --- t-digest quantiles (Arrow-batched; zero per-row Python) -------------------
#
# Partition-local digests built vectorized over numpy arrays inside
# applyInPandas, merged on the driver (digests are ~KB each). This follows the
# published t-digest merging-digest algorithm (Dunning & Ertl,
# "Computing Extremely Accurate Quantiles Using t-Digests", 2019).


def _compress(means, weights, delta: int):
    import numpy as np

    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    if total == 0:
        return means[:0], weights[:0]
    out_m: List[float] = []
    out_w: List[float] = []
    cum = 0.0
    cur_m, cur_w = float(means[0]), float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cur_w / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= max(limit, 1.0):
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    import numpy as np

    return np.asarray(out_m), np.asarray(out_w)


def _digest_quantile(means, weights, q: float) -> float:
    """Interpolated quantile from a compressed digest (midpoint rule)."""
    import numpy as np

    cum = weights.cumsum() - weights / 2.0
    total = weights.sum()
    target = q * total
    idx = int(np.searchsorted(cum, target))
    if idx <= 0:
        return float(means[0])
    if idx >= len(means):
        return float(means[-1])
    lo, hi = cum[idx - 1], cum[idx]
    frac = 0.0 if hi == lo else (target - lo) / (hi - lo)
    return float(means[idx - 1] + frac * (means[idx] - means[idx - 1]))


def tdigest_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    delta: int = 200,
    fanout: int = 32,
    round_to: int = 4,
) -> DataFrame:
    """Fully distributed t-digest quantiles: per-partition digests via
    applyInPandas (Arrow batches; numpy-vectorized, no per-row Python), then
    a TWO-LEVEL TREE MERGE inside Spark — level 1 merges partition digests
    into ``fanout`` groups, level 2 merges those into the final digest and
    evaluates the quantiles. Returns a ONE-ROW DataFrame (q50, q95, ...)
    like the sibling quantile operators; the driver never materializes
    digests and the final task merges <= fanout of them, so the merge cost
    is independent of partition count (vs the old driver-side collect()).

    Deterministic for a fixed partitioning: every merge kernel sorts its
    inputs by group key before concatenating, so Arrow batch arrival order
    cannot change the result."""
    import numpy as np

    digest_schema = StructType(
        [
            StructField("gid", StringType()),
            StructField("means", ArrayType(DoubleType())),
            StructField("weights", ArrayType(DoubleType())),
        ]
    )

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = str(int(pdf["_pid"].iloc[0]) % fanout)
        vals = pdf[col].dropna().to_numpy(dtype=float)
        if len(vals) == 0:
            return pd.DataFrame({"gid": [gid], "means": [[]], "weights": [[]]})
        m, w = _compress(vals, np.ones_like(vals), delta)
        return pd.DataFrame(
            {"gid": [gid], "means": [m.tolist()], "weights": [w.tolist()]}
        )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("gid", kind="stable")  # deterministic order
        means = np.concatenate([np.asarray(x, dtype=float) for x in pdf["means"]])
        weights = np.concatenate(
            [np.asarray(x, dtype=float) for x in pdf["weights"]]
        )
        gid = str(pdf["gid"].iloc[0])
        if len(means) == 0:
            return pd.DataFrame({"gid": [gid], "means": [[]], "weights": [[]]})
        m, w = _compress(means, weights, delta)
        return pd.DataFrame(
            {"gid": [gid], "means": [m.tolist()], "weights": [w.tolist()]}
        )

    qcols = [f"q{int(q * 100)}" for q in qs]
    final_schema = StructType([StructField(c, DoubleType()) for c in qcols])

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("gid", kind="stable")
        means = np.concatenate([np.asarray(x, dtype=float) for x in pdf["means"]])
        weights = np.concatenate(
            [np.asarray(x, dtype=float) for x in pdf["weights"]]
        )
        if len(means) == 0:
            return pd.DataFrame({c: [float("nan")] for c in qcols})
        m, w = _compress(means, weights, delta)
        return pd.DataFrame(
            {
                c: [round(_digest_quantile(m, w, q), round_to)]
                for c, q in zip(qcols, qs)
            }
        )

    part = (
        df.select(F.col(col))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .applyInPandas(per_partition, schema=digest_schema)
    )
    level1 = part.groupBy("gid").applyInPandas(merge_group, schema=digest_schema)
    return (
        level1.withColumn("_z", F.lit(0))
        .groupBy("_z")
        .applyInPandas(finalize, schema=final_schema)
    )


def exact_quantiles_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    qs: Sequence[float],
    round_to: int = 4,
) -> DataFrame:
    """Per-group exact percentiles — the per-partition profile variant of
    ``exact_quantiles``. One hash aggregation (Spark's ``percentile`` is a
    partial-aggregating ImperativeAggregate, so map-side combine applies);
    at 100 TB swap for ``percentile_approx``/t-digest with the same shape."""
    exprs = [
        F.round(F.expr(f"percentile({col}, {q})"), round_to).alias(f"q{int(q * 100)}")
        for q in qs
    ]
    return df.groupBy(group_col).agg(*exprs)


def hll_partition_sketches(
    df: DataFrame,
    part_col: str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Materialize a mergeable Apache DataSketches HLL sketch of
    ``value_col``'s distinct values PER PARTITION: (part, sketch, estimate).

    This is the 10^12-row profile architecture: sketch each ingest
    partition ONCE (one pass, map-side combinable, a sketch is ~KBs at any
    cardinality), persist the tiny sketch table alongside the manifest, and
    answer any later distinct-count question — any date range, the whole
    table, month-over-month overlap growth — by UNIONING sketches
    (``hll_rollup``) without ever rescanning the data. lg_k=12 gives
    ~1.6% relative standard error."""
    return df.groupBy(F.col(part_col).alias("part")).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
        ).alias("estimate"),
    )


def hll_rollup(sketches: DataFrame, parts: Sequence[str] | None = None) -> DataFrame:
    """Distinct-count for an arbitrary partition subset from the sketch
    table alone (no data rescan): union the per-partition sketches and
    estimate. One row: (n_parts, distinct_estimate)."""
    s = sketches if parts is None else sketches.filter(F.col("part").isin(list(parts)))
    return s.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "distinct_estimate"
        ),
    )


def mad_outliers_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Robust per-group outlier profile: a row is an outlier when
    ``|x - median_g| > k * 1.4826 * MAD_g`` (median absolute deviation,
    scaled to sigma-equivalence for normal data) — the outlier check
    mean/stddev z-scores get wrong under heavy tails, because both the
    center and the spread estimate are themselves robust.

    Shape: three column-pruned scans of (group, value) — group medians
    (one partial-aggregating percentile), deviation medians (join back the
    KB-scale median table, broadcast), and the final flag pass (both tiny
    tables broadcast). The two-level median is inherently two-pass; at
    10^12 rows swap ``percentile`` for ``percentile_approx``/t-digest with
    the same shape. MAD = 0 (a majority-constant group) flags every
    off-median row, deterministically on both engines (strict >).
    Returns (group, n_rows, med, mad, n_outliers, outlier_rate)."""
    base = df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("x")).filter(
        F.col("x").isNotNull()
    )
    # the per-group stat tables are KB-scale but feed 2 branches each —
    # persist them (tracked) or every consumer re-executes the percentile
    # pass over the data (no common-subplan dedup in Spark)
    med = persist_tracked(
        base.groupBy("grp").agg(F.expr("percentile(x, 0.5)").alias("_med"))
    )
    mad = persist_tracked(
        base.join(F.broadcast(med), "grp")
        .select("grp", F.abs(F.col("x") - F.col("_med")).alias("_dev"))
        .groupBy("grp")
        .agg(F.expr("percentile(_dev, 0.5)").alias("_mad"))
    )
    out = F.abs(F.col("x") - F.col("_med")) > F.lit(k * 1.4826) * F.col("_mad")
    return (
        base.join(F.broadcast(med), "grp")
        .join(F.broadcast(mad), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.first("_med"), round_to).alias("med"),
            F.round(F.first("_mad"), round_to).alias("mad"),
            F.sum(out.cast("long")).alias("n_outliers"),
            F.round(F.sum(out.cast("long")) / F.count(F.lit(1)), round_to).alias(
                "outlier_rate"
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_rows",
            "med",
            "mad",
            "n_outliers",
            "outlier_rate",
        )
    )


# --- Misra-Gries frequent-items sketches (mergeable, like the HLL rollup) ------
#
# Public basis: Misra & Gries 1982 ("Finding repeated elements") and the
# mergeable-summaries treatment (Agarwal et al., PODS 2012): a size-k summary
# whose per-item estimate undercounts the true frequency by at most d, the
# count subtracted at truncation (d <= n/(k+1)); summaries merge by item-wise
# addition with error bounds adding.


def mg_partition_sketches(
    df: DataFrame,
    part_col: str,
    value_col: str,
    k: int = 1024,
) -> DataFrame:
    """Materialize a size-<=k Misra-Gries frequent-items summary of
    ``value_col`` PER PARTITION: (part, item, est, err) where ``est``
    undercounts the partition-true count by at most ``err`` (constant per
    part) and never overcounts.

    Same architecture as ``hll_partition_sketches``: sketch each ingest
    partition once, persist the k-row-per-partition sketch table next to the
    manifest, answer later heavy-hitter questions over any partition subset
    by merging sketches (``mg_rollup``) without rescanning the data.

    Shape: the build is an exact (part, item) hash aggregation — map-side
    combine, one shuffle, per-task state bounded by distinct-per-task — then
    the exact->MG reduction entirely JVM-side: rank items per part (count
    desc, item asc: deterministic), subtract the (k+1)-th count from the
    kept k and drop non-positives. The MATERIALIZED summary is what's
    bounded (k rows/part at any scale); for adversarially unbounded vocab
    swap the build stage for a streaming per-partition MG (applyInPandas)
    with the same merge contract."""
    from pyspark.sql import Window

    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(part_col).alias("part"), F.col(value_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("part").orderBy(F.desc("n"), F.asc("item"))
    ranked = persist_tracked(
        counts.select("part", "item", "n", F.row_number().over(w).alias("rnk"))
    )
    # per-part truncation threshold d = count of the (k+1)-th item (0 if none)
    thresh = ranked.filter(F.col("rnk") == k + 1).select(
        "part", F.col("n").alias("d")
    )
    return (
        ranked.filter(F.col("rnk") <= k)
        .join(F.broadcast(thresh), "part", "left")
        .select(
            "part",
            "item",
            (F.col("n") - F.coalesce(F.col("d"), F.lit(0))).alias("est"),
            F.coalesce(F.col("d"), F.lit(0)).alias("err"),
        )
        .filter(F.col("est") > 0)
    )


def mg_rollup(
    sketches: DataFrame,
    parts: Sequence[str] | None = None,
    k: int | None = None,
    top: int | None = None,
) -> DataFrame:
    """Heavy hitters for an arbitrary partition subset from the sketch table
    alone (no data rescan): item-wise sum of estimates, error bounds adding
    across merged sketches (Agarwal et al. merge rule). Optional ``k``
    re-truncates the merged summary to size k (the subtracted count joins
    the error bound); ``top`` keeps the top-``top`` rows by (est desc, item
    asc). Returns (item, est_count, err_bound): for every true count c,
    est_count <= c <= est_count + err_bound. All KB-scale arithmetic —
    the sketch table is k rows per partition regardless of data size."""
    from pyspark.sql import Window

    s = sketches if parts is None else sketches.filter(F.col("part").isin(list(parts)))
    err_total = s.groupBy("part").agg(F.first("err").alias("e")).agg(
        F.coalesce(F.sum("e"), F.lit(0)).alias("err_bound")
    )
    merged = s.groupBy("item").agg(F.sum("est").alias("est_count"))
    w = Window.orderBy(F.desc("est_count"), F.asc("item"))
    ranked = merged.select(
        "item", "est_count", F.row_number().over(w).alias("_rnk")
    )
    if k is not None:
        d_row = ranked.filter(F.col("_rnk") == k + 1).select(
            F.col("est_count").alias("_d")
        )
        ranked = (
            ranked.filter(F.col("_rnk") <= k)
            .crossJoin(F.broadcast(d_row.agg(F.coalesce(F.max("_d"), F.lit(0)).alias("_d"))))
            .select(
                "item",
                (F.col("est_count") - F.col("_d")).alias("est_count"),
                "_rnk",
                F.col("_d").alias("_extra_err"),
            )
            .filter(F.col("est_count") > 0)
        )
    else:
        ranked = ranked.withColumn("_extra_err", F.lit(0))
    if top is not None:
        ranked = ranked.filter(F.col("_rnk") <= top)
    return ranked.crossJoin(F.broadcast(err_total)).select(
        "item",
        "est_count",
        (F.col("err_bound") + F.col("_extra_err")).cast("bigint").alias("err_bound"),
    )


def moments_partition_sketches(
    df: DataFrame, part_col: str, value_col: str
) -> DataFrame:
    """Mergeable MOMENTS sketch per partition: (part, n, mean, m2, m3, m4)
    with ``mk`` the k-th central SUM Σ(x-μ_part)^k.

    The exact-statistics companion to the HLL (distinct) and Misra-Gries
    (heavy hitters) rollups above: sketch each ingest partition once, keep
    the O(partitions)-row sketch table, and answer mean/variance/skewness/
    kurtosis for ANY partition subset later via ``moments_rollup`` — without
    rescanning the data, and EXACTLY (central-sum merging is lossless,
    unlike HLL/MG). Per-partition sums come from inverting Spark's built-in
    population moments (var_pop, skewness = √n·M3/M2^1.5, kurtosis =
    n·M4/M2²−3 — all one codegen hash aggregate); constant or single-row
    partitions make those built-ins NaN/NULL, which correctly maps to zero
    central sums (nanvl/coalesce guards).

    Reference parity: dataset-granularity profiling in the spirit of
    ``Proof.combine``'s associative evidence merging
    (/root/reference/src/FSharp.Data.Validation/Proof.fs:102-113) — each
    partition contributes an independently-computed summary and the merge
    is exact and order-free."""
    v = F.col(value_col).cast("double")
    n = F.count(v)
    var = F.coalesce(F.nanvl(F.var_pop(v), F.lit(0.0)), F.lit(0.0))
    skew = F.coalesce(F.nanvl(F.skewness(v), F.lit(0.0)), F.lit(0.0))
    kurt = F.coalesce(F.nanvl(F.kurtosis(v), F.lit(0.0)), F.lit(0.0))
    return df.groupBy(F.col(part_col).alias("part")).agg(
        n.alias("n"),
        F.avg(v).alias("mean"),
        (var * n).alias("m2"),
        (skew * F.pow(var, F.lit(1.5)) * n).alias("m3"),
        ((kurt + F.lit(3.0)) * var * var * n).alias("m4"),
    )


def moments_rollup(
    sketches: DataFrame, parts: Sequence[str] | None = None, round_to: int = 4
) -> DataFrame:
    """Exact mean/var/skew/kurtosis for an arbitrary partition subset from
    the sketch table alone (no data rescan): Chan/Terriberry parallel-merge
    of central sums around the grand mean —

        M2 = Σ M2_i + Σ n_i·d_i²
        M3 = Σ M3_i + 3·Σ d_i·M2_i + Σ n_i·d_i³
        M4 = Σ M4_i + 4·Σ d_i·M3_i + 6·Σ d_i²·M2_i + Σ n_i·d_i⁴

    with d_i = mean_i − grand_mean. Two aggregates over the KB-scale sketch
    table (grand mean first, then the delta-corrected sums with the one-row
    total broadcast). Returns one row:
    (n_parts, n_values, mean, var_pop, skew, kurt) — population formulas,
    rounded so the DuckDB oracle (which recomputes Σ(x-μ)^k directly on the
    raw data) hash-matches.

    The sketch relation feeds BOTH aggregates, so it is persisted (tracked —
    see cache.py) before branching: without the persist each branch re-plans
    the subtree from the source and the data is scanned twice (the same
    multi-branch re-plan bug class the drift grids fixed in round 2;
    pinned by tests/test_plan_shapes.py)."""
    from ..cache import persist_tracked

    s = sketches if parts is None else sketches.filter(F.col("part").isin(list(parts)))
    s = persist_tracked(s)
    tot = s.agg(
        F.count(F.lit(1)).alias("_p"),
        F.sum("n").alias("_N"),
        (F.sum(F.col("mean") * F.col("n")) / F.sum("n")).alias("_MU"),
    )
    d = F.col("mean") - F.col("_MU")
    merged = (
        s.crossJoin(F.broadcast(tot))
        .agg(
            F.max("_p").alias("n_parts"),
            F.max("_N").alias("N"),
            F.max("_MU").alias("MU"),
            F.sum(F.col("m2") + F.col("n") * d * d).alias("M2"),
            F.sum(
                F.col("m3") + F.lit(3.0) * d * F.col("m2") + F.col("n") * d * d * d
            ).alias("M3"),
            F.sum(
                F.col("m4")
                + F.lit(4.0) * d * F.col("m3")
                + F.lit(6.0) * d * d * F.col("m2")
                + F.col("n") * d * d * d * d
            ).alias("M4"),
        )
    )
    safe = F.col("M2") > 0
    return merged.select(
        F.col("n_parts").cast("bigint").alias("n_parts"),
        F.col("N").cast("bigint").alias("n_values"),
        F.round("MU", round_to).alias("mean"),
        F.round(F.col("M2") / F.col("N"), round_to).alias("var_pop"),
        F.round(
            F.when(
                safe,
                F.sqrt(F.col("N")) * F.col("M3") / F.pow(F.col("M2"), F.lit(1.5)),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("skew"),
        F.round(
            F.when(
                safe,
                F.col("N") * F.col("M4") / (F.col("M2") * F.col("M2")) - F.lit(3.0),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("kurt"),
    )


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Join/aggregation-key skew diagnostic — the pre-flight check before
    any key-partitioned operation at scale: for each candidate key column,
    the top-``top`` heaviest values with their share of all rows, plus the
    key's distinct count. A share over ~1/shuffle-partitions means one
    task owns that value's entire partition — the signal to salt, use AQE
    skew-join, or broadcast the other side.

    One hash aggregate per key column (map-side combined, its own shuffle
    keyed on that column — independent, like ``fd_violations``), then
    top-k via distributed TakeOrdered and the per-column totals joined
    back from the same aggregate. NULL keys count as a value (they skew
    joins too — NULL-heavy keys are the classic accidental hot spot).

    Returns (key, value, rnk, n, share, n_distinct) — top rows per key."""
    total = df.count()
    outs = []
    for kc in key_cols:
        counts = persist_tracked(
            df.groupBy(
                F.coalesce(F.col(kc).cast("string"), F.lit("<NULL>")).alias("value")
            ).agg(F.count(F.lit(1)).alias("n"))
        )
        nd = counts.agg(F.count(F.lit(1)).alias("_nd"))
        topk = (
            counts.orderBy(F.desc("n"), F.asc("value"))
            .limit(top)
            .crossJoin(F.broadcast(nd))
        )
        from pyspark.sql import Window

        rnk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("value")))
        outs.append(
            topk.select(
                F.lit(kc).alias("key"),
                "value",
                rnk.cast("int").alias("rnk"),
                F.col("n").cast("bigint").alias("n"),
                F.round(F.col("n") / F.lit(float(total)), round_to).alias("share"),
                F.col("_nd").cast("bigint").alias("n_distinct"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
