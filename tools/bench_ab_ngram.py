"""Same-session A/B for the r1->r2 ngram_jaccard bench regression
(1.08s -> 2.25s at sf0.1 while 39 other shared queries got faster).

`git diff e2d136c..HEAD` shows ngram_jaccard_pairs' PLAN is byte-identical
across rounds (only the persist bookkeeping changed), so the operator shape
is ruled out a priori; the live hypotheses are (a) storage pile-up from the
persisting queries that run before it in bench order — r2 inserted 30 new
queries, several of them cache-heavy, ahead of it — and (b) shared-VM session
noise (BENCH.md: ±1.5x between sessions).

Protocol (BENCH.md): one session, min-of-3 per condition, interleaved
conditions, CPU ceiling probe recorded. Conditions:

  isolated_release   fresh caches; release_caches(sweep) between reps
  isolated_norelease fresh start, then 3 reps with caches left in place
                     (reps 2-3 reuse the CacheManager entry — r2 bench's
                     min-of-2 semantics)
  piled_norelease    first run the 5 heaviest persisting queries WITHOUT
                     releasing (r2 bench-order simulation), then 3 reps
  piled_release      same pile-up, then release everything, then 3 reps

Usage: python tools/bench_ab_ngram.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

PILE = [
    "contamination_pairs",
    "simhash",
    "minhash_lsh",
    "containment_dedup",
    "dedup_components",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from fsharp_data_validation_spark.cache import release_caches
    from fsharp_data_validation_spark.sources.session import get_spark

    import __spark_entry__ as entry
    from tools.bench_scaling import cpu_ceiling

    spark = get_spark(master="local[32]", app="ab_ngram")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def force(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm JVM + parquet footers
    force("ngram_jaccard")
    release_caches(spark, sweep_rdds=True)

    def reps(release_between: bool, n: int = 3) -> list[float]:
        out = []
        for _ in range(n):
            out.append(round(force("ngram_jaccard"), 4))
            if release_between:
                release_caches(spark, sweep_rdds=True)
        return out

    results: dict[str, object] = {}

    # interleave the two isolated conditions to average out VM drift
    iso_rel, iso_norel = [], []
    for _ in range(3):
        release_caches(spark, sweep_rdds=True)
        iso_rel.append(round(force("ngram_jaccard"), 4))
        release_caches(spark, sweep_rdds=True)
        iso_norel.append(round(force("ngram_jaccard"), 4))  # cache left live
    release_caches(spark, sweep_rdds=True)
    results["isolated_release"] = iso_rel
    results["isolated_norelease_firsttouch"] = iso_norel

    # pile-up: heaviest persisting queries, caches left in place
    t_pile = {}
    for name in PILE:
        t_pile[name] = round(force(name), 4)
    results["pile_setup_sec"] = t_pile
    results["piled_norelease"] = reps(release_between=False)

    results["piled_release"] = reps(release_between=True)
    release_caches(spark, sweep_rdds=True)

    results["min"] = {
        k: min(v) for k, v in results.items() if isinstance(v, list)
    }
    results["cpu_ceiling"] = cpu_ceiling(8)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
