"""Cache-lifecycle registry for persisting operators.

Several operators persist corpus-scale intermediates (shingle-set tables,
LSH bucket tables, drift histograms) because the intermediate feeds 2-3 plan
branches and must be computed once.  ``DataFrame.persist`` has no scope: the
storage lives until someone unpersists it, so a long session running many
operators (the 71-query bench; any real multi-stage curation pipeline)
accumulates executor storage monotonically — at 10^12-row scale that is an
executor-memory leak across operator invocations.

Every ``persist()`` in this package goes through :func:`persist_tracked`,
which registers the DataFrame in a process-wide registry.  Callers release
in one of three ways:

- :func:`release_caches` — unpersist everything tracked (and optionally
  sweep localCheckpoint residue).  ``bench.py`` and ``tools/check_oracle.py``
  call this between queries; ``jobs/validate.py`` calls it per stage.
- :func:`cache_scope` — context manager releasing only what was tracked
  inside the ``with`` block (safe inside a larger pipeline that has its own
  live caches).
- :func:`untrack` — release one superseded intermediate early (iterative
  loops).

Unpersisting a tracked DataFrame is always SAFE, never load-bearing: these
are ``persist()`` plans with full lineage, so a later re-evaluation simply
recomputes.  ``localCheckpoint`` RDDs (lineage truncated — CANNOT recompute)
are deliberately NOT tracked; they are freed by the JVM ContextCleaner once
unreferenced, or eagerly by ``release_caches(spark, sweep_rdds=True)`` AFTER
the consuming action has run.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_LIVE: list[DataFrame] = []
_LOCK = threading.Lock()


def persist_tracked(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + register in the release registry."""
    out = df.persist() if storage_level is None else df.persist(storage_level)
    with _LOCK:
        _LIVE.append(out)
    return out


def untrack(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist one tracked DataFrame early (superseded loop state)."""
    with _LOCK:
        try:
            _LIVE.remove(df)
        except ValueError:
            pass
    try:
        df.unpersist(blocking)
    except Exception:
        pass


def tracked_count() -> int:
    with _LOCK:
        return len(_LIVE)


def release_caches(
    spark: SparkSession | None = None,
    blocking: bool = False,
    sweep_rdds: bool = False,
) -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    ``sweep_rdds=True`` (requires ``spark``) additionally unpersists ALL
    remaining entries of ``sc.getPersistentRDDs()`` — the localCheckpoint
    residue of iterative operators (connected components), whose lineage is
    truncated.  Only sweep at a point where no live plan still references a
    checkpoint (bench/test teardown after the action has run): a swept
    checkpoint cannot be recomputed.
    """
    with _LOCK:
        live, _LIVE[:] = list(_LIVE), []
    n = 0
    for df in reversed(live):
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    if sweep_rdds and spark is not None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            try:
                jrdd.unpersist(blocking)
                n += 1
            except Exception:
                pass
    return n


@contextmanager
def cache_scope(blocking: bool = False) -> Iterator[None]:
    """Release (only) the caches tracked inside this block on exit."""
    with _LOCK:
        mark = len(_LIVE)
    try:
        yield
    finally:
        with _LOCK:
            scoped = _LIVE[mark:]
            del _LIVE[mark:]
        for df in reversed(scoped):
            try:
                df.unpersist(blocking)
            except Exception:
                pass
