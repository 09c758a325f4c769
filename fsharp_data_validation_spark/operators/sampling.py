"""Deterministic sampling / splitting for training-data pipelines.

Hash-based splits are row-local (zero shuffle), reproducible across runs
and cluster sizes, and portable to the DuckDB oracle (md5-derived bucket,
see ``dedup.md5_int``) — unlike ``DataFrame.randomSplit``, which depends on
partitioning and seed plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import md5_int


def hash_split(
    df: DataFrame, id_col: str, train_pct: int = 80, salt: str = "split"
) -> DataFrame:
    """df + ``split`` column ('train'/'test'): bucket = salted md5 of the
    id mod 100; bucket < train_pct => train. Salting decorrelates the split
    from any other hash use of the id."""
    bucket = md5_int(F.col(id_col).cast("string"), salt=salt) % 100
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("test")),
    )
