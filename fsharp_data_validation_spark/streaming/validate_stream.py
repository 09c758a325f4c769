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
