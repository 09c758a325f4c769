"""Checkpoint-resumable validation runs with per-partition lineage + metrics
(the north rule's resumability requirement; SURVEY.md §7 step 7).

Structured Streaming checkpoints don't fit batch-over-table validation, so
resume is app-level: a *manifest* of one JSON document per completed input
partition, written atomically (tmp + rename). A resumed run anti-joins the
manifest — completed partitions are skipped entirely (their input is never
scanned: partition pruning via the partition predicate).

Manifest entry fields:
  partition        partition value (string-rendered)
  status           "pass" | "fail"
  rows_scanned     rows validated in the partition
  rows_with_violations / violations
  constraints_evaluated
  input_snapshot   input pin — computed from the input's file listing
                   (``parquet_snapshot``), or caller-supplied (an Iceberg
                   snapshot id when a catalog is attached)
  started_at / finished_at (unix seconds)

Snapshot-drift semantics (the Iceberg-snapshot analogue for the parquet
fallback): every manifest entry records the input pin it validated against.
On resume, entries whose pin differs from the current input are DRIFTED —
their validation result describes data that no longer exists. ``on_drift``
selects the policy: ``"error"`` (default, fail loudly), ``"revalidate"``
(drifted partitions go back in the pending set), ``"ignore"``.

At 10^12-turn scale partitions are Iceberg day/bucket partitions; one
manifest entry per partition keeps the manifest tiny (thousands of entries)
regardless of row count.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compiler import PROOF_GATE, Suite


class SnapshotDriftError(RuntimeError):
    """The input changed under completed manifest entries (their pin no
    longer matches the current input snapshot)."""

    def __init__(self, drifted: List[str], current: str):
        super().__init__(
            f"input snapshot drift: {len(drifted)} completed partition(s) were "
            f"validated against a different input (current pin {current[:12]}…); "
            f"partitions: {drifted[:10]}{'…' if len(drifted) > 10 else ''}. "
            "Pass on_drift='revalidate' to redo them or on_drift='ignore' to keep."
        )
        self.drifted = drifted
        self.current = current


def parquet_snapshot(path: str) -> str:
    """Deterministic pin of a parquet directory's current state: sha256 over
    the sorted (relative path, size, mtime_ns) of every data file. This is
    the parquet-fallback analogue of an Iceberg snapshot id — any append,
    rewrite, or delete changes it, while re-reading unchanged data does not.
    Metadata-only (no file bytes read): O(files) stat calls, same cost class
    as Iceberg's manifest-list read, so it stays cheap at thousands of
    files. With a real Iceberg catalog attached, pass the table's
    ``snapshot_id`` as ``input_snapshot`` instead."""
    import hashlib

    entries = []
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.startswith((".", "_")) or name.endswith(".crc"):
                continue
            full = os.path.join(root, name)
            st = os.stat(full)
            entries.append(
                (os.path.relpath(full, path), st.st_size, st.st_mtime_ns)
            )
    h = hashlib.sha256()
    for rel, size, mtime in sorted(entries):
        h.update(f"{rel}\x00{size}\x00{mtime}\n".encode())
    return h.hexdigest()


def partition_snapshots(path: str, partition_col: str) -> dict:
    """Per-partition input pins for a hive-partitioned directory layout
    (``<path>/<partition_col>=<value>/...``): value -> pin of that
    partition's own files. This is the Iceberg per-partition-manifest
    analogue — a rewrite of ONE partition drifts only that partition's
    completed entries, so ``on_drift="revalidate"`` redoes exactly the
    rewritten partitions instead of the whole table. Returns {} when the
    input is not laid out by this partition column (the global
    ``parquet_snapshot`` pin then applies to every entry)."""
    out = {}
    prefix = partition_col + "="
    if not os.path.isdir(path):
        return out
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if os.path.isdir(full) and name.startswith(prefix):
            out[name[len(prefix):]] = parquet_snapshot(full)
    return out


def _atomic_write(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _safe_name(value) -> str:
    s = str(value)
    return "".join(c if c.isalnum() or c in "-_.=" else "_" for c in s)


@dataclass
class PartitionOutcome:
    partition: str
    status: str
    rows_scanned: int
    rows_with_violations: int
    violations: int
    constraints_evaluated: int


class ValidationRun:
    """Partition-at-a-time suite execution with manifest-based resume.

    ``run`` validates every partition not yet in the manifest, writes the
    violation rows (parquet, partitioned by the partition value) and one
    manifest entry per partition, and returns the outcomes. Re-invoking
    after an interruption resumes where it stopped.
    """

    def __init__(
        self,
        suite: Suite,
        out_dir: str,
        key_cols: Sequence[str],
        partition_col: str,
        input_snapshot: Optional[str] = None,
        input_path: Optional[str] = None,
        on_drift: str = "error",
        emit_reports: bool = False,
        emit_valid: bool = False,
    ):
        if on_drift not in ("error", "revalidate", "ignore"):
            raise ValueError(f"on_drift must be error|revalidate|ignore, got {on_drift!r}")
        self.suite = suite
        self.out_dir = out_dir
        self.emit_reports = emit_reports
        self.emit_valid = emit_valid
        self.key_cols = list(key_cols)
        self.partition_col = partition_col
        self.partition_snapshots: dict = {}
        if input_path is not None:
            # per-partition pins when the input is laid out by the partition
            # column (exact drift granularity); global pin otherwise
            self.partition_snapshots = partition_snapshots(input_path, partition_col)
            if input_snapshot is None:
                input_snapshot = parquet_snapshot(input_path)
        self.input_snapshot = input_snapshot
        self.on_drift = on_drift
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.violations_dir = os.path.join(out_dir, "violations")
        self.reports_dir = os.path.join(out_dir, "reports")
        self.valid_dir = os.path.join(out_dir, "valid")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.violations_dir, exist_ok=True)

    # -- manifest ------------------------------------------------------------
    def completed_partitions(self) -> dict:
        done = {}
        for name in os.listdir(self.manifest_dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.manifest_dir, name)) as f:
                doc = json.load(f)
            done[doc["partition"]] = doc
        return done

    def _record(self, outcome: PartitionOutcome, started: float) -> None:
        doc = {
            "partition": outcome.partition,
            "status": outcome.status,
            "rows_scanned": outcome.rows_scanned,
            "rows_with_violations": outcome.rows_with_violations,
            "violations": outcome.violations,
            "constraints_evaluated": outcome.constraints_evaluated,
            "input_snapshot": self._pin_for(outcome.partition),
            "started_at": int(started),
            "finished_at": int(time.time()),
        }
        _atomic_write(
            os.path.join(self.manifest_dir, _safe_name(outcome.partition) + ".json"),
            doc,
        )

    # -- execution -------------------------------------------------------------
    def _pin_for(self, partition: str) -> Optional[str]:
        """The input pin governing one partition: its own directory pin when
        the input is partition-laid-out, else the table-global pin."""
        return self.partition_snapshots.get(partition, self.input_snapshot)

    def drifted_partitions(self) -> List[str]:
        """Completed partitions whose recorded input pin differs from the
        pin governing them in this run (both sides non-null). With
        per-partition pins, a single-partition rewrite drifts exactly that
        partition; with only a global pin, any input change drifts every
        completed entry (the conservative fallback).

        Legacy-pin grace: manifests written before per-partition pins
        existed recorded the table-global pin for every entry, so an entry
        whose recorded pin equals EITHER the governing partition pin OR
        this run's global ``input_snapshot`` is treated as non-drifted —
        otherwise resuming an old manifest over an unchanged
        hive-partitioned input would flag every completed partition."""
        if self.input_snapshot is None and not self.partition_snapshots:
            return []

        def _drifted(p: str, doc: dict) -> bool:
            recorded = doc.get("input_snapshot")
            governing = self._pin_for(p)
            if recorded is None or governing is None:
                return False
            if recorded == governing:
                return False
            return recorded != self.input_snapshot  # legacy global-pin grace

        return sorted(
            p for p, doc in self.completed_partitions().items() if _drifted(p, doc)
        )

    def pending_partitions(self, df: DataFrame) -> List[str]:
        all_parts = [
            str(r[0])
            for r in df.select(self.partition_col).distinct().orderBy(self.partition_col).collect()
        ]
        done = self.completed_partitions()
        drifted = set(self.drifted_partitions())
        if drifted:
            if self.on_drift == "error":
                raise SnapshotDriftError(sorted(drifted), self.input_snapshot)
            if self.on_drift == "revalidate":
                return [p for p in all_parts if p not in done or p in drifted]
        return [p for p in all_parts if p not in done]

    def _violations_df(self, pdf: DataFrame) -> DataFrame:
        keys = list(self.key_cols)
        if self.partition_col not in keys:
            keys.append(self.partition_col)  # carried for the partitioned write
        return self.suite.run(pdf, keys).violations.select(
            *keys, F.col("path_str").alias("path"), "code"
        )

    def run(
        self,
        df: DataFrame,
        max_partitions: Optional[int] = None,
        batch_size: int = 1,
    ) -> List[PartitionOutcome]:
        """Validate pending partitions; ``batch_size`` partitions share one
        stats job + one partitioned write (dynamic overwrite), so the job
        count is 2*ceil(P/K) instead of 2*P — at thousands of Iceberg
        day/bucket partitions this is the difference between a scheduler
        stall and a handful of wide jobs. Manifest entries are recorded per
        batch; an interrupted run redoes at most one batch."""
        pending = self.pending_partitions(df)
        if max_partitions is not None:
            pending = pending[:max_partitions]
        nf = self.suite.failure_count_column()
        pcol = F.col(self.partition_col).cast("string")
        outcomes = []
        for i in range(0, len(pending), max(batch_size, 1)):
            batch = pending[i : i + max(batch_size, 1)]
            started = time.time()
            # partition predicates -> partition pruning on a partitioned table
            pdf = df.filter(pcol.isin(batch))
            stats = {
                r["_part"]: r
                for r in pdf.select(pcol.alias("_part"), nf.alias("_nf"))
                .groupBy("_part")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum((F.col("_nf") > 0).cast("long")).alias("rv"),
                    F.sum("_nf").alias("v"),
                )
                .collect()
            }
            viol = self._violations_df(pdf).withColumn("part", pcol)
            if self.partition_col not in self.key_cols and self.partition_col != "part":
                viol = viol.drop(self.partition_col)
            (
                viol.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("part")
                .parquet(self.violations_dir)
            )
            if self.emit_valid:
                # the pipeline-gate output (Giraffe-shape): only fully clean
                # rows flow onward, partitioned like the input
                valid = (
                    pdf.filter(~self.suite.any_failure_column())
                    .withColumn("part", pcol)
                )
                (
                    valid.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("part")
                    .parquet(self.valid_dir)
                )
            if self.emit_reports:
                # reference-wire-format JSON document per failing row
                reps = (
                    pdf.filter(self.suite.any_failure_column())
                    .select(
                        *self.key_cols,
                        self.suite.report_json_column().alias("report"),
                        pcol.alias("part"),
                    )
                )
                (
                    reps.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("part")
                    .parquet(self.reports_dir)
                )
            for part in batch:
                r = stats.get(part)
                outcome = PartitionOutcome(
                    partition=part,
                    status="pass" if r is None or (r["v"] or 0) == 0 else "fail",
                    rows_scanned=r["n"] if r is not None else 0,
                    rows_with_violations=(r["rv"] or 0) if r is not None else 0,
                    violations=(r["v"] or 0) if r is not None else 0,
                    constraints_evaluated=len(
                        [c for c in self.suite.constraints if c.kind != PROOF_GATE]
                    ),
                )
                self._record(outcome, started)
                outcomes.append(outcome)
        return outcomes

    def summary(self) -> dict:
        done = self.completed_partitions()
        return {
            "partitions": len(done),
            "pass": sum(1 for d in done.values() if d["status"] == "pass"),
            "fail": sum(1 for d in done.values() if d["status"] == "fail"),
            "rows_scanned": sum(d["rows_scanned"] for d in done.values()),
            "violations": sum(d["violations"] for d in done.values()),
        }


def diff_runs(spark, prev_out_dir: str, cur_out_dir: str):
    """Run-over-run validation regression report — CI for data: compare
    two ``ValidationRun`` outputs per (path, code) and classify each as
    new / resolved / increased / decreased / stable. The operational
    question after every scheduled run is "what changed since yesterday";
    diffing the violation OUTPUTS answers it without re-reading either
    input table.

    Scale: two partial+final aggregates over the violation rows (already a
    small fraction of the input) followed by a full-outer join on the
    |paths|x|codes|-row summaries — KBs at any input size.

    Returns (path, code, prev_n, cur_n, delta, status) ordered by
    |delta| descending."""
    from pyspark.sql import functions as F

    def counts(d, alias):
        return (
            spark.read.parquet(os.path.join(d, "violations"))
            .groupBy("path", "code")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    j = (
        counts(prev_out_dir, "prev_n")
        .join(counts(cur_out_dir, "cur_n"), ["path", "code"], "full_outer")
        .select(
            "path",
            "code",
            F.coalesce("prev_n", F.lit(0)).cast("bigint").alias("prev_n"),
            F.coalesce("cur_n", F.lit(0)).cast("bigint").alias("cur_n"),
        )
    )
    delta = F.col("cur_n") - F.col("prev_n")
    status = (
        F.when(F.col("prev_n") == 0, F.lit("new"))
        .when(F.col("cur_n") == 0, F.lit("resolved"))
        .when(delta > 0, F.lit("increased"))
        .when(delta < 0, F.lit("decreased"))
        .otherwise(F.lit("stable"))
    )
    return j.select(
        "path", "code", "prev_n", "cur_n",
        delta.cast("bigint").alias("delta"),
        status.alias("status"),
    ).orderBy(F.abs(F.col("delta")).desc(), "path", "code")
