"""Scaling-efficiency evidence for the north rule (>=0.8 from N to 4N).

No real cluster exists in this sandbox, so per the task directive the same
job runs at two parallelism levels — ``local[8]`` (N) and ``local[32]``
(4N) — on the SAME pre-generated input, and we report throughput at both
plus efficiency = (throughput@4N / throughput@N) / 4.

Each measurement runs in its OWN subprocess (fresh JVM) so the two levels
don't share executor threads, code caches, or shuffle dirs.

Usage:
    python tools/bench_scaling.py                  # full: gen + 8 + 32 + BENCH.md
    python tools/bench_scaling.py --turns 10000000
    python tools/bench_scaling.py --run 8          # (internal) one measurement
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

DATA_DIR = "/tmp/bench_transcripts"


def gen(n_turns: int) -> None:
    from fsharp_data_validation_spark.sources.session import get_spark
    from fsharp_data_validation_spark.sources.synth import synth_transcripts

    spark = get_spark(master="local[32]", app="bench_gen")
    spark.sparkContext.setLogLevel("ERROR")
    synth_transcripts(spark, n_turns).write.mode("overwrite").parquet(DATA_DIR)
    spark.stop()


def run_suite(cores: int) -> dict:
    """One full-constraint-suite pass at local[cores]; prints JSON."""
    from pyspark.sql import functions as F

    from fsharp_data_validation_spark.operators.crossrow import (
        ordering_violations,
        referential_violations,
        uniqueness_violations,
    )
    from fsharp_data_validation_spark.operators.drift import histogram, psi
    from fsharp_data_validation_spark.operators.stats import approx_quantiles, column_profile
    from fsharp_data_validation_spark.operators.transcript_suite import transcript_row_suite
    from fsharp_data_validation_spark.sources.session import get_spark
    from fsharp_data_validation_spark.sources.transcripts import tool_catalog

    spark = get_spark(master=f"local[{cores}]", app=f"bench_scaling_{cores}")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    t = spark.read.parquet(DATA_DIR)
    n = t.count()  # warms scan/footers; not timed

    def suite() -> float:
        t0 = time.perf_counter()
        res = transcript_row_suite().run(t, ["conv_id", "turn_idx", "ts"])
        force(res.violations)
        force(res.valid)
        force(uniqueness_violations(t, ["conv_id", "turn_idx"]))
        force(
            referential_violations(
                t, "tool", tool_catalog(spark), "tool", ["conv_id", "turn_idx", "tool"]
            )
        )
        force(ordering_violations(t))
        force(
            column_profile(
                t, ["conv_id", "turn_idx", "role", "text", "tool"], exact_distinct=False
            )
        )
        lens = t.select(F.length("text").alias("text_len"), "ts")
        mid = F.lit(1_700_000_000 + n // 2)
        force(
            psi(
                histogram(lens.filter(F.unix_seconds("ts") < mid), "text_len", 25.0, 20),
                histogram(lens.filter(F.unix_seconds("ts") >= mid), "text_len", 25.0, 20),
            )
        )
        return time.perf_counter() - t0

    suite()  # warmup pass: whole-stage-codegen compile, JIT, broadcast init
    sec = suite()  # steady-state measurement
    spark.stop()
    return {"cores": cores, "sec": round(sec, 2), "turns": n,
            "turns_per_sec": round(n / sec, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=10_000_000)
    ap.add_argument("--run", type=int, default=None)
    args = ap.parse_args()

    if args.run:
        print(json.dumps(run_suite(args.run)))
        return

    if not os.path.exists(DATA_DIR + "/_SUCCESS"):
        print(f"generating {args.turns:,} turns -> {DATA_DIR}", file=sys.stderr)
        gen(args.turns)

    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cores)],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(results[cores]), file=sys.stderr)

    eff = (results[32]["turns_per_sec"] / results[8]["turns_per_sec"]) / 4
    summary = {
        "metric": "validated turns/sec, full constraint suite",
        "turns": results[32]["turns"],
        "throughput_local8": results[8]["turns_per_sec"],
        "throughput_local32": results[32]["turns_per_sec"],
        "sec_local8": results[8]["sec"],
        "sec_local32": results[32]["sec"],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))
    with open("/root/repo/BENCH.md", "w") as f:
        f.write(
            "# BENCH — scaling-efficiency evidence (north rule: >=0.8 from N to 4N)\n\n"
            "Same job (full constraint suite: row refute/dispute suite -> violations+valid, "
            "uniqueness, referential broadcast anti-join, ordering window, column profile "
            "with HLL distincts, PSI drift) on the SAME deterministic synthetic transcript "
            f"parquet ({summary['turns']:,} turns, `sources/synth.py`, skewed conv_id + "
            "injected violations), one fresh JVM per level.\n\n"
            "| parallelism | wall sec | validated turns/sec |\n|---|---|---|\n"
            f"| local[8] (N) | {summary['sec_local8']} | {summary['throughput_local8']:,} |\n"
            f"| local[32] (4N) | {summary['sec_local32']} | {summary['throughput_local32']:,} |\n\n"
            f"**Scaling efficiency (8 -> 32) = (tp32/tp8)/4 = "
            f"{summary['scaling_efficiency_8_to_32']}** "
            f"({'PASS' if summary['pass'] else 'FAIL'} vs the >=0.8 requirement).\n\n"
            "Reproduce: `python tools/bench_scaling.py`.\n"
        )


if __name__ == "__main__":
    main()
