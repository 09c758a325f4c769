"""Benchmark harness (driver contract).

Runs every headline query from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints the JSON record:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"row_suite": sec, ...}, "sf": 0.1, ...}

followed by a short headline-only summary line (same metric/value/unit,
no per-query dict) printed LAST so a bounded tail capture always ends
with a complete JSON object.

Each query is forced end-to-end with a ``noop``-format write (full
evaluation, no driver collect, no disk). The flagship throughput number
(validated turns/sec over the full row-constraint suite — the
BASELINE.json metric) is reported under ``turns_per_sec``.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
``tools/bench_scaling.py`` / BENCH.md, not here: the driver calls this
file once per round at a fixed parallelism.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    """Fully evaluate a DataFrame on executors (no collect)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fsharp_data_validation_spark.sources.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app="bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    from fsharp_data_validation_spark.cache import release_caches

    qs = entry.queries()

    # Warm the JVM + parquet footer caches once so per-query numbers
    # measure the plan, not first-touch overhead.
    force(qs["row_suite"](spark, sf_dir))
    release_caches(spark, sweep_rdds=True)

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        # min of 2 passes per query: this shared VM's capacity can move
        # several-fold mid-run (see BENCH.md), and the min is the least-
        # interference estimate of the plan's cost
        best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 4)
        except Exception as ex:  # never lose the whole bench to one query
            timings[name] = round(best, 4) if best is not None else -1.0
            print(f"[bench-error] {name}: {type(ex).__name__}: {ex}", file=sys.stderr)
        finally:
            # release the query's persisted intermediates + checkpoint
            # residue so one query's storage never pressures the next
            release_caches(spark, sweep_rdds=True)

    # Flagship throughput: validated turns/sec through the full row suite.
    from fsharp_data_validation_spark.sources.transcripts import derive_transcripts

    n_turns = derive_transcripts(spark, sf_dir).count()
    suite_sec = timings.get("row_suite") or 1e-9
    turns_per_sec = round(n_turns / suite_sec, 1) if suite_sec > 0 else None

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    total = round(sum(t for t in timings.values() if t > 0), 2)
    metric = "validated turns/sec, full constraint suite (+ headline query wall times)"
    # Line 1: the full per-query record (compact: 2-decimal timings, no
    # whitespace). Line 2 (printed LAST, deliberately short): the headline
    # fields alone, so the driver's ~2KB tail capture always ends with a
    # complete JSON object even if line 1 outgrows the capture window
    # (r3 post-mortem: 98-query line was truncated and BENCH_r03.json
    # recorded parsed: null).
    compact = {k: round(v, 2) for k, v in timings.items()}
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "queries": compact,
                "sf": sf_val,
                "turns": n_turns,
                "turns_per_sec": turns_per_sec,
                "cpus": int(cpus),
            },
            separators=(",", ":"),
        )
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "turns": n_turns,
                "turns_per_sec": turns_per_sec,
                "cpus": int(cpus),
                "n_queries": len(timings),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
