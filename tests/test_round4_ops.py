"""Round-4 operator tests: ADVICE fixes (manifest legacy-pin grace, Check
name validation, cosine-pairs generic ids + zero-norm masking) and the new
round-4 surface (ANN recall attestation, BPE-ish tokenizer kernel)."""

import os

import pytest


# -- manifest legacy-pin grace ------------------------------------------------


def test_manifest_legacy_global_pin_not_drifted(spark, tmp_path):
    """A manifest written before per-partition pins existed recorded the
    table-global pin on every entry. Resuming over an UNCHANGED
    hive-partitioned input must not flag those entries as drifted
    (ADVICE r3: plans/manifest.py drifted_partitions)."""
    import json

    from pyspark.sql import functions as F

    from fsharp_data_validation_spark.operators.transcript_suite import (
        transcript_row_suite,
    )
    from fsharp_data_validation_spark.plans.manifest import (
        ValidationRun,
        parquet_snapshot,
    )
    from fsharp_data_validation_spark.sources.synth import synth_transcripts

    src = str(tmp_path / "legacy_src")
    out = str(tmp_path / "legacy_out")
    df = synth_transcripts(spark, 200, parallelism=2).withColumn(
        "part", (F.crc32(F.col("conv_id")) % 3).cast("string")
    )
    df.write.mode("overwrite").partitionBy("part").parquet(src)

    def mk(**kw):
        return ValidationRun(
            transcript_row_suite(),
            out,
            ["conv_id", "turn_idx"],
            "part",
            input_path=src,
            **kw,
        )

    run = mk()
    assert run.partition_snapshots  # hive layout detected -> per-partition pins
    run.run(spark.read.parquet(src))
    assert mk().drifted_partitions() == []

    # simulate a LEGACY manifest: rewrite every entry's pin to the global pin
    global_pin = parquet_snapshot(src)
    for name in os.listdir(run.manifest_dir):
        p = os.path.join(run.manifest_dir, name)
        with open(p) as f:
            doc = json.load(f)
        doc["input_snapshot"] = global_pin
        with open(p, "w") as f:
            json.dump(doc, f)

    # unchanged input: grace applies, clean no-op resume (no SnapshotDriftError)
    resumed = mk()  # default on_drift='error'
    assert resumed.drifted_partitions() == []
    assert resumed.run(spark.read.parquet(src)) == []

    # a genuine change still drifts legacy entries — ALL of them, since a
    # table-global pin cannot localize the change (conservative fallback)
    one_part = os.path.join(src, "part=0")
    data_files = [
        n for n in os.listdir(one_part) if not n.startswith((".", "_"))
    ]
    os.utime(os.path.join(one_part, data_files[0]))  # mtime bump -> new pin
    assert mk().drifted_partitions() == ["0", "1", "2"]

    # re-pin with per-partition pins (revalidate), then change ONE partition:
    # drift is now exact — only the rewritten partition is flagged
    mk(on_drift="revalidate").run(spark.read.parquet(src))
    assert mk().drifted_partitions() == []
    os.utime(os.path.join(one_part, data_files[0]))
    assert mk().drifted_partitions() == ["0"]


# -- Check name validation ----------------------------------------------------


def test_check_name_charset_validated():
    from pyspark.sql import functions as F

    from fsharp_data_validation_spark.operators.checks import Check, completeness

    Check("ok_name-1.x", completeness("text"), ">=", 0.9)  # fine
    for bad in ("bad'name", "", "semi;colon", 'dq"uote', "new\nline"):
        with pytest.raises(ValueError):
            Check(bad, F.count(F.lit(1)), ">=", 0.0)


# -- cross_corpus_cosine_pairs: generic ids + zero-norm masking ---------------


def test_cross_corpus_cosine_string_ids_and_zero_norm(spark):
    import numpy as np

    from fsharp_data_validation_spark.operators.similarity import (
        cross_corpus_cosine_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((6, 4))
    train_rows = [(f"t{i}", [float(x) for x in base[i]]) for i in range(6)]
    train_rows.append(("tz", [0.0, 0.0, 0.0, 0.0]))  # zero-norm train vector
    eval_rows = [
        ("e0", [float(x) for x in base[0]]),  # exact copy of t0 -> sim 1.0
        ("ez", [0.0, 0.0, 0.0, 0.0]),  # zero-norm eval vector
    ]
    t = spark.createDataFrame(train_rows, "vec_id string, embedding array<double>")
    e = spark.createDataFrame(eval_rows, "vec_id string, embedding array<double>")

    got = cross_corpus_cosine_pairs(t, e, threshold=0.99, blocks=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["sim"] for r in got}
    assert pairs[("t0", "e0")] == 1.0
    # zero-norm vectors never appear (no NaN rows)
    assert all("tz" != a and "ez" != b for (a, b) in pairs)
    assert all(r["sim"] == r["sim"] for r in got)  # no NaN

    # id-type mismatch fails loudly at plan-build time
    e_long = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(TypeError):
        cross_corpus_cosine_pairs(t, e_long)
