"""Bucketed-layout evidence: identically bucketed tables join and
aggregate with no Exchange — the co-located layout for conv_id-keyed
cross-row checks at scale."""

from pyspark.sql import Row, functions as F

from fsharp_data_validation_spark.sources.transcripts import write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    rows = [Row(conv_id=f"c{i % 7}", turn_idx=i, n=i * 2) for i in range(200)]
    df = spark.createDataFrame(rows)
    write_bucketed(df, "t_a", "conv_id", 4, sort_cols="conv_id",
                   path=str(tmp_path / "t_a"))
    write_bucketed(df.select("conv_id", F.col("n").alias("m")), "t_b", "conv_id", 4,
                   sort_cols="conv_id", path=str(tmp_path / "t_b"))

    a, b = spark.table("t_a"), spark.table("t_b")
    # force a merge join (the tiny test table would otherwise broadcast);
    # on identically bucketed+sorted scans it needs neither shuffle nor sort
    joined = a.join(b.hint("merge"), "conv_id")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan  # co-located: no shuffle either side
    assert "SortMergeJoin" in plan

    agg = a.groupBy("conv_id").agg(F.sum("n").alias("s"))
    assert "Exchange" not in _plan(agg)  # bucket distribution satisfies agg

    # sanity: results correct
    assert joined.count() == sum(1 for x in rows for y in rows
                                 if x.conv_id == y.conv_id)


def test_bucketed_tables_cleanup(spark):
    spark.sql("DROP TABLE IF EXISTS t_a")
    spark.sql("DROP TABLE IF EXISTS t_b")
