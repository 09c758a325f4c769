"""The documents corpus used by the dedup / text-analysis operators.

``DOCS_SQL`` augments the driver's ``documents`` table with *deterministic*
injected duplicates so the dedup operators have guaranteed positives that
both Spark and the DuckDB oracle derive identically:

- every ``doc_id % 13 == 0`` gains an EXACT duplicate (id + 2_000_000);
- every ``doc_id % 7 == 0`` gains a NEAR duplicate (id + 1_000_000, three
  words appended -> 3-gram Jaccard ≈ 0.94 for ~50-word docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCS_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text || ' extra near duplicate' AS text,
       lang, source, n_chars FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 2000000 AS doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id % 13 = 0
"""


def with_docs(sql: str) -> str:
    """Wrap a query in the shared ``docs`` CTE (runs on Spark and DuckDB)."""
    return f"WITH docs AS ({DOCS_SQL})\n" + sql


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(DOCS_SQL)


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# Embedding corpus with injected near-duplicates: every vec_id % 50 == 0
# gains a copy (id + 1_000_000) with +0.5 on coordinate 0 — cosine ~0.9x,
# guaranteed positives for near-dup / top-k queries. DuckDB equivalent below.
VECS_ORACLE_SQL = """
SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id,
       [CASE WHEN i = 1 THEN CAST(embedding[1] AS DOUBLE) + 0.5
             ELSE CAST(embedding[i] AS DOUBLE) END
        for i in range(1, len(embedding) + 1)] AS e
FROM embeddings WHERE vec_id % 50 = 0
"""


def load_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding: array<double>) with injected near-duplicates —
    semantics identical to VECS_ORACLE_SQL."""
    from pyspark.sql import functions as F

    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    bumped = base.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x + F.lit(0.5)).otherwise(x),
        ).alias("embedding"),
    )
    return base.unionByName(bumped)


def with_vecs(sql: str) -> str:
    """Wrap an oracle query in the DuckDB ``vecs`` CTE."""
    return f"WITH vecs AS ({VECS_ORACLE_SQL})\n" + sql
