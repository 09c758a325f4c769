"""Structured Streaming validation: the same compiled suite applied to a
stream — readStream -> with_failures -> split -> sinks, with event-time
watermarking for the windowed violation-rate aggregation.

The suite compiles to stateless column expressions, so it attaches to a
streaming DataFrame unchanged (no state store needed for the row checks).
Stateful additions here:
- watermarked per-window violation counts (late data handled by the
  watermark, not dropped silently);
- ``foreachBatch`` writer so violations/valid rows can go to any batch sink
  (parquet/Iceberg) with exactly-once per micro-batch semantics.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.compiler import Suite


def validate_stream(
    stream_df: DataFrame, suite: Suite, key_cols: Sequence[str]
):
    """Attach the suite to a streaming DataFrame; returns (valid, violations)
    streaming frames. Both share the single-projection plan — Spark evaluates
    the constraint expressions once per micro-batch pass."""
    flagged = suite.with_failures(stream_df)
    valid = flagged.filter(F.size("failures") == 0).drop("failures")
    violations = (
        flagged.filter(F.size("failures") > 0)
        .select(*key_cols, F.explode("failures").alias("f"))
        .select(
            *key_cols,
            F.array_join(
                F.transform(
                    "f.path",
                    lambda s: F.concat(
                        F.lower(F.substring(s, 1, 1)), F.substring(s, 2, 2_000_000)
                    ),
                ),
                ".",
            ).alias("path"),
            F.col("f.code").alias("code"),
        )
    )
    return valid, violations


def windowed_violation_rate(
    stream_df: DataFrame,
    suite: Suite,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed violation metrics with late-data watermarking:
    (window, rows, rows_with_violations, violations)."""
    flagged = suite.with_failures(stream_df).withWatermark(ts_col, watermark)
    return flagged.groupBy(F.window(ts_col, window).alias("win")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.size("failures") > 0).cast("long")).alias("rows_with_violations"),
        F.sum(F.size("failures")).alias("violations"),
    )


def turn_continuity_stream(
    stream_df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    watermark_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    per-conversation turn-index continuity across micro-batches.

    State per conv_id: the highest turn_idx seen so far. Each batch's turns
    are checked against it, emitting violation rows for
    - ``turn_gap``: turn_idx jumps by more than 1 vs the running max;
    - ``turn_regression``: turn_idx arrives at or below the running max
      (duplicate or out-of-order turn in a *later* micro-batch).

    This is the cross-batch generalization of the batch uniqueness/ordering
    checks — the reference library cannot express cross-value state at all
    (single-value design, SURVEY.md §2.8); Spark's state store makes it a
    keyed incremental computation. The kernel is pandas-vectorized (numpy
    on the batch's column arrays; no per-row Python beyond the group loop).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("code", StringType()),
            StructField("prev_max", IntegerType()),
        ]
    )
    state_schema = StructType([StructField("max_idx", LongType())])

    def check(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        (conv,) = key
        max_idx = state.get[0] if state.exists else -1
        out = []
        for pdf in pdfs:
            idx = np.sort(pdf[idx_col].to_numpy())
            prev = np.concatenate(([max_idx], idx[:-1]))
            gap = idx > prev + 1
            reg = idx <= prev
            if gap.any() or reg.any():
                bad = gap | reg
                out.append(
                    pd.DataFrame(
                        {
                            "conv_id": conv,
                            "turn_idx": idx[bad].astype("int32"),
                            "code": np.where(gap[bad], "turn_gap", "turn_regression"),
                            "prev_max": np.asarray(prev[bad], dtype="int64").astype(
                                "int32"
                            ),
                        }
                    )
                )
            if len(idx):
                max_idx = max(max_idx, int(idx[-1]))
        state.update((max_idx,))
        for o in out:
            yield o

    return (
        stream_df.withWatermark(watermark_col, watermark)
        .groupBy(conv_col)
        .applyInPandasWithState(
            check,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    suite: Suite,
    key_cols: Sequence[str],
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drive the stream with foreachBatch writing violations to parquet;
    ``available_now`` processes the backlog and stops (batch-like testing)."""
    _, violations = validate_stream(stream_df, suite, key_cols)

    def write_batch(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("append").parquet(out_dir)

    writer = (
        violations.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    return q


def run_suite_available_now(
    spark,
    batch_df: DataFrame,
    suite: Suite,
    key_cols: Sequence[str],
    work_dir: str,
    mem_table: str,
    n_files: int = 8,
    max_files_per_trigger: int = 2,
    timeout_sec: int = 600,
) -> DataFrame:
    """Drive the stateless suite through a REAL file stream end-to-end and
    return the violations as a batch DataFrame — the batch-equivalence
    attestation path for the streaming surface (driver query
    ``stream_suite``: its output must hash-equal the batch ``row_suite``,
    so it shares that query's DuckDB oracle).

    Shape: ``batch_df`` is materialized to ``work_dir/src`` as ``n_files``
    parquet files; ``readStream`` + ``availableNow`` with
    ``maxFilesPerTrigger`` then processes them in MULTIPLE micro-batches
    (genuinely incremental — not one batch wearing a streaming hat), the
    stateless suite violations stream appends into a memory sink, and the
    sink table is returned once the query terminates. The suite compiles to
    stateless column expressions, so no state store is involved and
    per-micro-batch results concatenate to exactly the batch answer.

    ``mem_table`` must be fresh per invocation (memory sinks accumulate per
    query name); callers pass a counter-suffixed name."""
    src = f"{work_dir}/src"
    batch_df.repartition(n_files).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src)
    )
    _, violations = validate_stream(stream, suite, key_cols)
    q = (
        violations.writeStream.format("memory")
        .queryName(mem_table)
        .outputMode("append")
        .option("checkpointLocation", f"{work_dir}/ckpt_{mem_table}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # defensive: never leave a stuck query behind
        q.stop()
        raise TimeoutError(f"stream_suite did not drain in {timeout_sec}s")
    return spark.table(mem_table)


def stream_dedup(
    stream_df: DataFrame,
    id_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose ``id_cols`` were already seen
    within the watermark horizon (``dropDuplicatesWithinWatermark`` — the
    state store keeps one entry per key and EVICTS it once the watermark
    passes, so state is bounded by the duplicate-arrival window, not the
    stream's lifetime; plain ``dropDuplicates`` on a stream would grow state
    forever). For content dedup, pre-compute a digest column (e.g.
    ``F.md5(text)``) and pass it as the key — state then stores 32-byte
    digests, never documents.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def windowed_drift_stream(
    stream_df: DataFrame,
    baseline_hist: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    bucket_width: float = 25.0,
    n_buckets: int = 20,
    round_to: int = 4,
) -> DataFrame:
    """Streaming PSI drift monitor against a static baseline: per
    event-time window, emit (win, rows, psi) where ``psi`` compares the
    window's distribution of ``value_col`` to ``baseline_hist`` (a batch
    histogram from ``operators.drift.histogram``, e.g. built over last
    month's validated corpus).

    Shape notes for streaming:
    - Structured Streaming forbids chained aggregations, so the histogram
      is built as ``n_buckets`` conditional sums inside the ONE watermarked
      window aggregation (same closed form as ``operators/drift.py``) and
      PSI is then a row-local expression over those count columns —
      append-mode compatible, state evicted by the watermark.
    - the baseline histogram is collected once on the driver: it is
      ``n_buckets`` rows (a few hundred bytes) REGARDLESS of how much data
      produced it, so this is a plan-literal, not a data collect. Baseline
      proportions use the same EPS clamp as the batch PSI.
    """
    from ..operators.drift import EPS

    base = {r["bucket"]: r["n"] for r in baseline_hist.collect()}
    tot = float(sum(base.values())) or 1.0

    b = F.least(
        F.greatest(F.floor(F.col(value_col) / F.lit(bucket_width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    bucketed = (
        stream_df.filter(F.col(value_col).isNotNull())
        .withColumn("_bkt", b)
        .withWatermark(ts_col, watermark)
    )
    counts = [
        F.sum((F.col("_bkt") == i).cast("long")).alias(f"_c{i}")
        for i in range(n_buckets)
    ]
    agg = bucketed.groupBy(F.window(ts_col, window).alias("win")).agg(
        F.count(F.lit(1)).alias("rows"), *counts
    )
    psi_col = None
    for i in range(n_buckets):
        p = F.greatest(F.col(f"_c{i}") / F.col("rows"), F.lit(EPS))
        q = max(base.get(i, 0) / tot, EPS)
        term = (p - F.lit(q)) * F.log(p / F.lit(q))
        psi_col = term if psi_col is None else psi_col + term
    return agg.select("win", "rows", F.round(psi_col, round_to).alias("psi"))


def windowed_chi2_stream(
    stream_df: DataFrame,
    baseline_counts: DataFrame,
    cat_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    round_to: int = 4,
) -> DataFrame:
    """Streaming CATEGORICAL drift monitor against a static baseline: per
    event-time window, emit (win, rows, chi2, dof) where chi2 is the
    Pearson statistic of the window's category counts vs
    ``baseline_counts`` (a batch (cat, n) aggregate, e.g. last month's
    validated role distribution) — the streaming lift of
    ``operators/drift.py:chi2_joined``, completing the windowed family
    (PSI covers binned numerics; this covers unordered categories).

    Shape notes (same discipline as ``windowed_drift_stream``):
    - one watermarked window aggregation with one conditional sum per
      baseline category plus an OTHER cell for categories the baseline has
      never seen (their appearance IS drift — they inflate chi2 through a
      zero-expectation-free margin cell rather than being dropped);
    - chi2/dof are row-local expressions over those count columns —
      append-mode compatible, state bounded by the watermark;
    - the baseline is |categories| rows collected once as plan literals,
      not a data collect. Cells empty in BOTH margins contribute 0 and
      drop out of dof.
    """
    # drop a NULL baseline category (the stream side filters NULLs too, and
    # sorted() cannot order None against str)
    base = {
        r["cat"]: float(r["n"])
        for r in baseline_counts.collect()
        if r["cat"] is not None
    }
    cats = sorted(base)
    g_tot = float(sum(base.values()))

    c = F.col(cat_col)
    sums = [
        F.sum((c == F.lit(cat)).cast("long")).alias(f"_c{i}")
        for i, cat in enumerate(cats)
    ] + [
        F.sum((~c.isin(list(cats))).cast("long")).alias("_other"),
    ]
    agg = (
        stream_df.filter(c.isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(F.count(F.lit(1)).alias("rows"), *sums)
    )
    tg = F.col("rows").cast("double")
    t = F.lit(g_tot)
    colsum = tg + t
    chi2 = None
    dof_cells = None
    cells = [(F.col(f"_c{i}"), base[cat]) for i, cat in enumerate(cats)]
    cells.append((F.col("_other"), 0.0))
    for n, g in cells:
        row = n + F.lit(g)
        e1 = row * tg / colsum
        e2 = row * t / colsum
        term = F.when(
            row > 0,
            (n - e1) ** 2 / e1 + (F.lit(g) - e2) ** 2 / e2,
        ).otherwise(F.lit(0.0))
        present = F.when(row > 0, 1).otherwise(0)
        chi2 = term if chi2 is None else chi2 + term
        dof_cells = present if dof_cells is None else dof_cells + present
    return agg.select(
        "win",
        "rows",
        F.round(chi2, round_to).alias("chi2"),
        (dof_cells - 1).cast("bigint").alias("dof"),
    )


def windowed_w1_stream(
    stream_df: DataFrame,
    baseline_hist: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    bucket_width: float = 25.0,
    n_buckets: int = 20,
    round_to: int = 4,
) -> DataFrame:
    """Streaming Wasserstein-1 drift monitor against a static baseline —
    the spread-sensitive numeric member of the windowed family (PSI reacts
    to per-bucket ratio changes, W1 to how far mass MOVED; chi2 covers
    unordered categories). Same discipline as ``windowed_drift_stream``:
    one watermarked window aggregation with a conditional sum per bucket,
    then W1 as a ROW-LOCAL expression — the bucket CDFs are running sums
    over the n_buckets literal columns, unrolled at plan-build time, so no
    chained aggregation and append mode stays legal. The baseline is
    n_buckets plan-literal proportions (collected once, KBs).

    W1 = Σ_b |F_win(b) − F_base(b)| · bucket_width over the full 0..n-1
    spine — gap buckets count, matching ``operators/drift.py:w1_joined``.
    Returns (win, rows, w1)."""
    base = {r["bucket"]: r["n"] for r in baseline_hist.collect()}
    tot = float(sum(base.values())) or 1.0

    b = F.least(
        F.greatest(F.floor(F.col(value_col) / F.lit(bucket_width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    bucketed = (
        stream_df.filter(F.col(value_col).isNotNull())
        .withColumn("_bkt", b)
        .withWatermark(ts_col, watermark)
    )
    counts = [
        F.sum((F.col("_bkt") == i).cast("long")).alias(f"_c{i}")
        for i in range(n_buckets)
    ]
    agg = bucketed.groupBy(F.window(ts_col, window).alias("win")).agg(
        F.count(F.lit(1)).alias("rows"), *counts
    )
    w1 = None
    cum_win = None
    cum_base = 0.0
    # the last bucket's CDF difference is always 0 (both CDFs reach 1)
    for i in range(n_buckets - 1):
        p = F.col(f"_c{i}") / F.col("rows")
        cum_win = p if cum_win is None else cum_win + p
        cum_base += base.get(i, 0) / tot
        term = F.abs(cum_win - F.lit(cum_base))
        w1 = term if w1 is None else w1 + term
    return agg.select(
        "win",
        "rows",
        F.round(w1 * F.lit(float(bucket_width)), round_to).alias("w1"),
    )


def windowed_rates_to_sink(
    stream_df: DataFrame,
    suite: Suite,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    round_to: int = 6,
) -> DataFrame:
    """Stage 1 of the streaming control chart: the watermarked windowed
    violation-rate aggregation flattened to the sink schema
    (win_start, n_rows, n_viol, rate) — write this append-mode to a
    parquet/Kafka sink; ``windowed_rate_anomaly_stream`` consumes that sink
    as its input stream (Spark does not allow a stateful operator after a
    streaming aggregation in one query, so the monitoring loop is the
    standard two-query topology)."""
    flagged = suite.with_failures(stream_df).withWatermark(ts_col, watermark)
    return (
        flagged.groupBy(F.window(ts_col, window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.size("failures") > 0).cast("long")).alias("n_viol"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "n_rows",
            "n_viol",
            F.round(F.col("n_viol") / F.col("n_rows"), round_to).alias("rate"),
        )
    )


def windowed_rate_anomaly_stream(
    rates_stream: DataFrame,
    baseline: int = 7,
    z_threshold: float = 3.0,
    min_history: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """STREAMING control-chart anomaly detection — the streaming sibling of
    ``operators/checks.rate_anomaly``, closing the Deequ monitoring loop on
    the live path: each CLOSED event-time window's violation rate is scored
    against the trailing ``baseline`` closed windows' mean ± z·stddev, the
    window itself excluded from its own baseline, with the same
    rounded-before-branching float discipline as the batch form (a raw
    stddev of ~1e-17 noise over identical rates must not divide a z).

    Input is the CLOSED-WINDOW rates stream — the sink written by
    ``windowed_rates_to_sink`` read back with ``readStream`` (the two-query
    topology; a stateful operator cannot follow a streaming aggregation in
    one query). A single control-plane key carries the trailing rate deque
    across micro-batches via ``applyInPandasWithState`` — state is
    O(baseline) floats and the operator sees one row per closed window, so
    the stateful stage is KB-scale at any stream rate. Windows inside one
    batch are scored in event-time order; watermark semantics make
    cross-batch closes monotone.

    Returns (win_start, n_rows, n_viol, rate, mean_rate, sd_rate, z,
    anomaly) in append mode; pytest pins the concatenated output equal to
    the batch ``rate_anomaly`` closed form over the same windows."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    rates = rates_stream.withColumn("_k", F.lit(1))

    out_schema = StructType(
        [
            StructField("win_start", TimestampType()),
            StructField("n_rows", LongType()),
            StructField("n_viol", LongType()),
            StructField("rate", DoubleType()),
            StructField("mean_rate", DoubleType()),
            StructField("sd_rate", DoubleType()),
            StructField("z", DoubleType()),
            StructField("anomaly", BooleanType()),
        ]
    )
    # carried baseline: the last ``baseline`` closed-window rates, oldest first
    state_schema = StructType([StructField("rates", ArrayType(DoubleType()))])

    def score(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd
        from decimal import Decimal, ROUND_HALF_UP

        def rnd(x: float, n: int) -> float:
            # Spark's ROUND on doubles = BigDecimal.valueOf(x) (shortest
            # repr, same as Python repr) quantized HALF_UP. Python's builtin
            # round() is banker's — means of 6-decimal rates land on exact
            # .5 boundaries at the 7th digit constantly, so the builtin
            # WOULD diverge from the batch form (caught by the oracle).
            q = Decimal(1).scaleb(-n)
            return float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))

        hist = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("win_start")
            out = {
                "win_start": [], "n_rows": [], "n_viol": [], "rate": [],
                "mean_rate": [], "sd_rate": [], "z": [], "anomaly": [],
            }
            for _, row in pdf.iterrows():
                rate = float(row["rate"])
                if hist:
                    # sequential sum/len, NOT np.mean (pairwise summation):
                    # the batch form's AVG accumulates sequentially in frame
                    # order, and the published 6-decimal round sits on .5
                    # boundaries often enough that the last ulp matters
                    acc = 0.0
                    for h in hist:
                        acc += h
                    m = rnd(acc / len(hist), round_to)
                    sd = rnd(float(np.std(hist)), round_to)
                    z = rnd((rate - m) / sd, 4) if sd > 0 else None
                    anom = len(hist) >= min_history and (
                        abs(z) > z_threshold if sd > 0 else rate != m
                    )
                else:
                    m = sd = z = None
                    anom = False
                out["win_start"].append(row["win_start"])
                out["n_rows"].append(int(row["n_rows"]))
                out["n_viol"].append(int(row["n_viol"]))
                out["rate"].append(rate)
                out["mean_rate"].append(m)
                out["sd_rate"].append(sd)
                out["z"].append(z)
                out["anomaly"].append(bool(anom))
                hist.append(rate)
                if len(hist) > baseline:
                    hist = hist[-baseline:]
            yield pd.DataFrame(out)
        state.update((hist,))

    return rates.groupBy("_k").applyInPandasWithState(
        score,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
