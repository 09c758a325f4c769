"""fsharp_data_validation_spark — a PySpark-native schema + constraint
validation engine re-expressing mta-solutions/fsharp-data-validation's
applicative Proof/Validation semantics as vectorized DataFrame constraint
evaluation over tables of multi-turn transcripts.

Layout:
- ``core``       pure-Python semantic kernel (row-level oracle, ported tests)
- ``functions``  constraint -> Column compiler (zero per-row Python)
- ``operators``  cross-row / table-level operators (uniqueness, referential,
                 stats, drift, dedup, similarity, text analysis)
- ``sources``    table IO seam (parquet / Iceberg) + deterministic synthesis
- ``plans``      suite runner, verdicts, partition lineage / checkpoint-resume
- ``streaming``  Structured Streaming validation wrapper
"""

__version__ = "0.1.0"
