"""Tests for training-data pipeline operators: dedup family agreement
(exact inverted-index vs prefix-filter vs MinHash-LSH), blocked-GEMM vs
naive all-pairs cosine, and the deterministic bench synthesizer."""

import pytest
from pyspark.sql import Row, functions as F

from fsharp_data_validation_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from fsharp_data_validation_spark.operators.similarity import (
    near_dup_pairs,
    near_dup_pairs_blocked,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base),  # exact dup of 1
        Row(doc_id=3, text=base + " tail"),  # near dup of 1/2
        Row(doc_id=4, text="completely different words in this sentence here"),
        Row(doc_id=5, text="short text"),  # < 3 words after split? no: 2 words
        Row(doc_id=6, text=base.replace("fox", "cat")),
    ]
    return spark.createDataFrame(rows)


def _pairs(df):
    return sorted((r["id_a"], r["id_b"], r["sim"]) for r in df.collect())


def test_exact_duplicates(spark):
    got = exact_duplicates(_docs(spark), "doc_id", "text").collect()
    assert len(got) == 1
    assert got[0]["n_dups"] == 2 and got[0]["min_id"] == 1


def test_prefix_jaccard_equals_lsh(spark):
    docs = _docs(spark)
    exact = _pairs(ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5))
    lsh = _pairs(minhash_lsh_pairs(docs, "doc_id", "text", 3, 32, 16, 0.5))
    assert exact, "fixture should contain near-dup pairs"
    assert (1, 2, 1.0) in exact
    assert exact == lsh  # high-recall banding -> identical verified output


def test_blocked_gemm_equals_naive_pairs(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((8, 16))
    vecs = []
    for i in range(40):
        v = base[i % 8] + rng.standard_normal(16) * (0.05 if i % 3 == 0 else 2.0)
        vecs.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    df = spark.createDataFrame(vecs)
    naive = _pairs(near_dup_pairs(df, threshold=0.8))
    blocked = _pairs(near_dup_pairs_blocked(df, threshold=0.8, blocks=4))
    assert naive, "fixture should contain near-dup vector pairs"
    assert naive == blocked


def test_lsh_near_dup_recall(spark):
    """Sign-sketch LSH candidates (scale path) recover a high fraction of
    the exact near-dup pairs, and every reported pair is exact-verified
    (precision 1.0 by construction)."""
    import numpy as np
    from pyspark.sql import Row

    from fsharp_data_validation_spark.operators.similarity import (
        lsh_near_dup_pairs,
        near_dup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((10, 64))
    rows = []
    for i in range(120):
        v = base[i % 10] + rng.standard_normal(64) * (0.15 if i % 2 == 0 else 3.0)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    df = spark.createDataFrame(rows)
    exact = {(r["id_a"], r["id_b"]) for r in near_dup_pairs(df, threshold=0.8).collect()}
    approx = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(df, threshold=0.8, dim=64).collect()
    }
    assert exact, "fixture should contain exact near-dup pairs"
    assert approx <= exact  # verified candidates: no false positives
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.7, recall


def test_simhash_banded_equals_allpairs(spark):
    """Pigeonhole banding loses nothing: banded candidates + verify produce
    exactly the all-pairs result."""
    from fsharp_data_validation_spark.operators.dedup import (
        simhash_banded_pairs,
        simhash_pairs,
    )

    docs = _docs(spark)
    allp = sorted(map(tuple, simhash_pairs(docs, "doc_id", "text", 8).collect()))
    banded = sorted(
        map(tuple, simhash_banded_pairs(docs, "doc_id", "text", 8).collect())
    )
    assert allp and allp == banded


def test_simhash_skew_guard_output_unchanged(spark):
    """A bucket_cap small enough to force EVERY bucket through the
    sub-banding fallback must still produce the exact all-pairs result
    (pigeonhole on the complement bits loses nothing), on a corpus with a
    dominant template (boilerplate prefix + small mutations) that drags
    signatures into shared chunk buckets."""
    from pyspark.sql import Row

    from fsharp_data_validation_spark.operators.dedup import (
        simhash_banded_pairs,
        simhash_pairs,
    )

    template = " ".join(f"boiler{i}" for i in range(40))
    rows = [
        Row(doc_id=i, text=f"{template} tail{i % 7} extra{i % 3} uniq{i // 9}")
        for i in range(120)
    ] + [Row(doc_id=200 + i, text=f"free text body {i} alpha beta") for i in range(20)]
    docs = spark.createDataFrame(rows)
    allp = sorted(map(tuple, simhash_pairs(docs, "doc_id", "text", 3).collect()))
    guarded = sorted(
        map(
            tuple,
            simhash_banded_pairs(docs, "doc_id", "text", 3, bucket_cap=5).collect(),
        )
    )
    unguarded = sorted(
        map(
            tuple,
            simhash_banded_pairs(docs, "doc_id", "text", 3, bucket_cap=None).collect(),
        )
    )
    assert allp, "fixture should contain near-dup pairs"
    assert guarded == allp == unguarded


def test_ivf_topk_recall(spark):
    """IVF with reduced probing keeps high top-k recall vs brute force; with
    full probing it is exactly brute force (also pinned by the oracle)."""
    import numpy as np
    from pyspark.sql import Row

    from fsharp_data_validation_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((6, 32)) * 4
    rows = [
        Row(
            vec_id=i,
            embedding=[
                float(x) for x in base[i % 6] + rng.standard_normal(32) * 0.5
            ],
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    qs = df.filter(F.col("vec_id") % 40 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, qs, k=5).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df, qs, k=5, n_cells=6, n_probe=6).collect()
    }
    assert full == exact  # full probing == brute force
    probed = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df, qs, k=5, n_cells=6, n_probe=2).collect()
    }
    recall = len(probed & exact) / len(exact)
    assert recall >= 0.8, recall


def test_salted_uniqueness_equivalent(spark):
    """Two-stage salted aggregation (adversarial hot-key path) returns the
    same duplicate groups as the direct hash agg."""
    from fsharp_data_validation_spark.operators.crossrow import uniqueness_violations

    t = spark.range(0, 5000, 1, 8).selectExpr(
        "concat('c', cast(id % 7 as string)) AS conv_id",  # 7 hot keys
        "cast(id % 40 as int) AS turn_idx",
    )
    direct = sorted(map(tuple, uniqueness_violations(t, ["conv_id", "turn_idx"]).collect()))
    salted = sorted(
        map(tuple, uniqueness_violations(t, ["conv_id", "turn_idx"], salt_buckets=8).collect())
    )
    assert direct and direct == salted


def test_tdigest_matches_exact_quantiles(spark):
    """Fully distributed t-digest (applyInPandas partials + two-level tree
    merge INSIDE Spark — no driver collect) returns a one-row DataFrame and
    tracks the exact interpolated percentiles within digest accuracy on a
    skewed column. Also deterministic across reruns."""
    from fsharp_data_validation_spark.operators.stats import (
        exact_quantiles,
        tdigest_quantiles,
    )

    df = spark.range(0, 20000, 1, 8).selectExpr("cast(id * id as double) AS v")
    qs = [0.25, 0.5, 0.75, 0.95]
    exact = exact_quantiles(df, "v", qs).collect()[0].asDict()
    out = tdigest_quantiles(df, "v", qs, round_to=6)
    assert out.columns == [f"q{int(q * 100)}" for q in qs]
    approx = out.collect()[0].asDict()
    for q in qs:
        key = f"q{int(q * 100)}"
        rel = abs(approx[key] - exact[key]) / max(exact[key], 1.0)
        assert rel < 0.02, (key, approx[key], exact[key])
    # determinism: merge order is pinned by the gid sort inside each kernel
    again = tdigest_quantiles(df, "v", qs, round_to=6).collect()[0].asDict()
    assert again == approx


def test_synth_transcripts_deterministic(spark):
    from fsharp_data_validation_spark.sources.synth import synth_transcripts

    a = synth_transcripts(spark, 5000, parallelism=4)
    assert a.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # deterministic across parallelism levels (the scaling-bench invariant)
    b = synth_transcripts(spark, 5000, parallelism=2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # injected violation classes all present
    t = a
    assert t.filter(F.col("text").isNull()).count() > 0
    assert t.filter(F.col("role") == "robot").count() > 0
    assert t.filter(F.col("tool") == "tool_unknown").count() > 0
    dups = (
        t.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count()
    )
    assert dups > 0
    # hot-key skew: the biggest conversation dwarfs the median
    sizes = t.groupBy("conv_id").count()
    mx = sizes.agg(F.max("count")).first()[0]
    assert mx > 50  # hot conversations concentrate ~1.25% of rows each


def test_rowlocal_signatures_equal_explode_formulation(spark):
    """Pin the shuffle-free (array_min over transform) MinHash signatures to
    the reference explode+groupBy formulation, and pin that distinct seeds
    produce distinct hash columns (guards the pyspark higher-order-function
    arity trap: a two-arg lambda binds (element, index), so a default-arg
    seed capture silently degrades every column to the same hash)."""
    from fsharp_data_validation_spark.operators.dedup import (
        _shingle_sets,
        minhash_signatures,
    )

    k = 8
    sets_df = _shingle_sets(_docs(spark), "doc_id", "text", 3)
    new = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(k)]
        for r in minhash_signatures(sets_df, k).collect()
    }
    ex = sets_df.select("doc_id", F.explode("sh").alias("x"))
    old = {
        r["doc_id"]: [r[f"m{i}"] for i in range(k)]
        for r in ex.groupBy("doc_id")
        .agg(
            *[
                F.min(F.xxhash64(F.lit(i), F.col("x"))).alias(f"m{i}")
                for i in range(k)
            ]
        )
        .collect()
    }
    assert new == old
    for sig in new.values():
        assert len(set(sig)) > 1, "seeds collapsed: every min-hash identical"


def test_near_dup_components_and_keep_first(spark):
    from fsharp_data_validation_spark.operators.dedup import (
        dedup_keep_first,
        near_dup_components,
    )

    docs = _docs(spark)
    comp = {
        r["doc_id"]: r["component"]
        for r in near_dup_components(docs, "doc_id", "text", 3, 0.5).collect()
    }
    # docs 1,2 are exact dups, 3 a near dup of both, 6 a near dup of 1/2/3
    # at the 0.5 threshold -> one cluster labeled by the smallest id
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[4] == 4 and comp[5] == 5  # singletons label themselves
    assert len(comp) == docs.count()

    kept = sorted(
        r["doc_id"] for r in dedup_keep_first(docs, "doc_id", "text").collect()
    )
    # only the exact-dup pair collapses (1 kept, 2 dropped)
    assert kept == [1, 3, 4, 5, 6]


def test_hash_split_deterministic(spark):
    from fsharp_data_validation_spark.operators.sampling import hash_split

    docs = _docs(spark)
    s1 = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", 80).collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", 80).collect()}
    assert s1 == s2 and set(s1.values()) <= {"train", "test"}
    # different salt -> decorrelated assignment is at least possible
    s3 = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", 80, salt="z").collect()}
    assert len(s3) == len(s1)


def test_stratified_sample_exact_k_and_lossless_prefilter(spark):
    """The hash-threshold prefilter must be lossless: output == plain
    per-stratum ROW_NUMBER over the full table. Also pins exact-k and
    the small-stratum keep-all branch."""
    from pyspark.sql import Window
    from fsharp_data_validation_spark.operators.dedup import md5_int
    from fsharp_data_validation_spark.operators.sampling import stratified_sample

    rows = [Row(id=i, s="big") for i in range(500)] + [
        Row(id=1000 + i, s="small") for i in range(3)
    ]
    df = spark.createDataFrame(rows)
    out = stratified_sample(df, "s", "id", k=5)
    got = sorted((r["s"], r["rnk"], r["id"]) for r in out.collect())

    w = Window.partitionBy("s").orderBy(
        md5_int(F.col("id").cast("string"), salt="strat"), F.col("id")
    )
    naive = (
        df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
    )
    want = sorted((r["s"], r["rnk"], r["id"]) for r in naive.collect())
    assert got == want
    by_stratum = {}
    for s, _, _ in got:
        by_stratum[s] = by_stratum.get(s, 0) + 1
    assert by_stratum == {"big": 5, "small": 3}  # min(k, n_s) per stratum


def test_time_rollup_grains_consistent(spark):
    """Rollup grains must re-aggregate consistently: day-level totals equal
    the sum of their (day, type) children; grand total equals input size."""
    from fsharp_data_validation_spark.operators.temporal import time_rollup
    from datetime import datetime

    rows = [
        Row(ts=datetime(2026, 1, 1 + d, h), event_type=t, value=float(d * 10 + h))
        for d in range(2)
        for h in (3, 15)
        for t in ("a", "b")
    ]
    df = spark.createDataFrame(rows)
    out = time_rollup(df, "ts", "event_type", "value").collect()
    fine = [r for r in out if r["grp_id"] == 0]
    day = {r["day"]: r for r in out if r["grp_id"] == 1}
    total = [r for r in out if r["grp_id"] == 3]
    assert len(total) == 1 and total[0]["n_events"] == len(rows)
    for d in day:
        kids = [r for r in fine if r["day"] == d]
        assert day[d]["n_events"] == sum(r["n_events"] for r in kids)
        assert abs(day[d]["total_value"] - round(sum(r["total_value"] for r in kids), 2)) < 1e-6


def test_conversation_digests_dup_and_flow(spark):
    """Two text-identical conversations share text_digest (keeper = min
    conv_id); a template-identical-but-different-text conversation shares
    only flow_digest. Turn order must not matter (digest sorts by turn_idx)."""
    from fsharp_data_validation_spark.operators.dedup import conversation_digests

    def conv(cid, turns, shuffle=False):
        ts = list(turns)
        if shuffle:
            ts = ts[::-1]
        return [
            Row(conv_id=cid, turn_idx=i, role=r, text=t, tool=tool)
            for (i, r, t, tool) in ts
        ]

    base = [(0, "user", "hi", None), (1, "assistant", "hello", None),
            (2, "tool", None, "tool_1")]
    rows = (
        conv("c1", base)
        + conv("c2", base, shuffle=True)          # same text, rows unordered
        + conv("c3", [(0, "user", "yo", None), (1, "assistant", "sup", None),
                      (2, "tool", None, "tool_1")])  # same flow, different text
    )
    out = {r["conv_id"]: r for r in conversation_digests(spark.createDataFrame(rows)).collect()}
    assert out["c1"]["text_digest"] == out["c2"]["text_digest"]
    assert out["c1"]["text_digest"] != out["c3"]["text_digest"]
    assert out["c1"]["flow_digest"] == out["c3"]["flow_digest"]
    assert out["c1"]["n_same_text"] == 2 and out["c3"]["n_same_text"] == 1
    assert out["c1"]["n_same_flow"] == 3
    assert out["c2"]["keep_conv_id"] == "c1"


def test_star_components_equal_propagation_and_handle_chains(spark):
    """large-star/small-star CC must agree with the doc-level propagation
    result on the near-dup graph, and converge on a long chain (diameter
    1000) in logarithmic rounds where plain propagation would need 1000."""
    from fsharp_data_validation_spark.operators.dedup import (
        connected_components_star,
    )

    # long chain 0-1-2-...-1000 plus two small cliques
    chain = [(i, i + 1) for i in range(1000)]
    cliques = [(2000, 2001), (2001, 2002), (3000, 3001)]
    edges = spark.createDataFrame(chain + cliques, ["u", "v"])
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges, max_iter=12).collect()
    }
    assert all(got[i] == 0 for i in range(1001))
    assert got[2000] == got[2001] == got[2002] == 2000
    assert got[3000] == got[3001] == 3000

    # star-backed near_dup_components must equal the propagation default
    from fsharp_data_validation_spark.operators.dedup import near_dup_components

    docs = _docs(spark)
    prop = sorted(map(tuple, near_dup_components(docs, "doc_id", "text", 3, 0.5).collect()))
    star = sorted(
        map(
            tuple,
            near_dup_components(
                docs, "doc_id", "text", 3, 0.5, algorithm="star"
            ).collect(),
        )
    )
    assert prop == star


def test_redact_pii_and_repetition_edges(spark):
    """Pins: email + number redaction with counts, NULL text passthrough,
    empty/1-word texts score 0 repetition, fully-repeated text scores
    (n-1)/n duplicated bigrams."""
    from fsharp_data_validation_spark.operators.text import (
        redact_pii,
        repetition_score,
    )

    rows = [
        Row(id=1, text="mail a@b.co and 12345 or 6"),
        Row(id=2, text=None),
        Row(id=3, text=""),
        Row(id=4, text="x x x x x"),      # 4 bigrams, 1 distinct
        Row(id=5, text="one"),
    ]
    df = spark.createDataFrame(rows)
    red = {r["id"]: r for r in redact_pii(df, "id", "text").collect()}
    assert red[1]["clean_text"] == "mail <EMAIL> and <NUM> or <NUM>"
    assert red[1]["n_emails"] == 1 and red[1]["n_nums"] == 2
    assert red[2]["clean_text"] is None and red[2]["n_nums"] == 0

    rep = {r["id"]: r for r in repetition_score(df, "id", "text").collect()}
    assert rep[4]["n_grams"] == 4 and rep[4]["n_distinct"] == 1
    assert rep[4]["rep_ratio"] == 0.75
    assert rep[3]["n_grams"] == 0 and rep[3]["rep_ratio"] == 0.0
    assert rep[5]["n_grams"] == 0
    assert rep[2]["n_grams"] == 0  # NULL text -> empty gram array


def test_contamination_cross_corpus_only(spark):
    """Decontamination: cross-corpus near-dups are reported, within-corpus
    dups are NOT; containment is 1.0 for a leaked doc, 0.0 for a fresh one,
    partial for a half-overlapping one."""
    from fsharp_data_validation_spark.operators.contamination import (
        cross_contamination_pairs,
        ngram_containment,
    )

    leaked = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text=leaked),
            Row(doc_id=2, text=leaked),  # within-train dup: must NOT appear
            Row(doc_id=3, text="one two three four five six seven eight"),
        ]
    )
    ev = spark.createDataFrame(
        [
            Row(doc_id=100, text=leaked),                      # exact leak
            Row(doc_id=101, text="totally fresh eval words here now ok"),
            Row(doc_id=102, text="alpha beta gamma delta nine ten"),  # partial
        ]
    )
    pairs = {
        (r["train_id"], r["eval_id"]): r["sim"]
        for r in cross_contamination_pairs(train, ev, "doc_id", "text", 3, 0.8).collect()
    }
    assert (1, 100) in pairs and pairs[(1, 100)] == 1.0
    assert (2, 100) in pairs
    assert all(t in (1, 2, 3) and e in (100, 101, 102) for t, e in pairs)

    cont = {
        r["eval_id"]: r for r in ngram_containment(train, ev, "doc_id", "text", 3).collect()
    }
    assert cont[100]["containment"] == 1.0
    assert cont[101]["containment"] == 0.0
    # doc 102: 4 trigrams, 2 present in train ("alpha beta gamma",
    # "beta gamma delta")
    assert cont[102]["n_grams"] == 4 and cont[102]["n_hit"] == 2
    assert cont[102]["containment"] == 0.5


def test_pack_context_windows_greedy(spark):
    """Pins the greedy packing recurrence: chunks never exceed the budget
    except a single over-budget turn, which still opens its own chunk;
    NULL text counts 0 tokens, '' counts 1; rn is stable 1-based order."""
    from fsharp_data_validation_spark.operators.text import pack_context_windows

    rows = [
        # c1: 3+3+3 tokens at budget 6 -> chunks [1, 1, 2]
        Row(conv_id="c1", turn_idx=0, text="a b c"),
        Row(conv_id="c1", turn_idx=1, text="d e f"),
        Row(conv_id="c1", turn_idx=2, text="g h i"),
        # c2: over-budget single turn opens chunk 1; next turn opens chunk 2
        Row(conv_id="c2", turn_idx=0, text="t1 t2 t3 t4 t5 t6 t7 t8"),
        Row(conv_id="c2", turn_idx=1, text="x"),
        # c3: NULL is 0 tokens (packs with anything), '' is 1 token
        Row(conv_id="c3", turn_idx=0, text=None),
        Row(conv_id="c3", turn_idx=1, text=""),
        Row(conv_id="c3", turn_idx=2, text="p q r s t u"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r["conv_id"], r["rn"]): r
        for r in pack_context_windows(df, "conv_id", "turn_idx", "text", 6).collect()
    }
    assert [out[("c1", i)]["chunk_id"] for i in (1, 2, 3)] == [1, 1, 2]
    assert out[("c2", 1)]["n_tokens"] == 8 and out[("c2", 1)]["chunk_id"] == 1
    assert out[("c2", 2)]["chunk_id"] == 2
    # c3: 0 + 1 = 1 <= 6 so first two pack together; 1 + 6 > 6 -> new chunk
    assert out[("c3", 1)]["n_tokens"] == 0
    assert out[("c3", 2)]["n_tokens"] == 1
    assert [out[("c3", i)]["chunk_id"] for i in (1, 2, 3)] == [1, 1, 2]
    assert all(r["turn_idx"] == r["rn"] - 1 for r in out.values())


def test_chunk_text_sliding_windows(spark):
    """Pins: short doc -> one chunk, overlap by width-stride tokens, tail
    chunk short but present (every token covered), NULL text -> no chunks,
    '' -> one 1-token chunk; plan stays shuffle-free (row-local explode)."""
    from fsharp_data_validation_spark.operators.text import chunk_text

    rows = [
        Row(id=1, text="a b c"),                      # 3 toks, w=4 -> 1 chunk
        Row(id=2, text="t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 9 toks, w=4 s=2 -> starts 0,2,4,6
        Row(id=3, text=None),
        Row(id=4, text=""),
    ]
    df = spark.createDataFrame(rows)
    out = chunk_text(df, "id", "text", 4, 2)
    got = {(r["id"], r["chunk_idx"]): r for r in out.collect()}

    assert got[(1, 0)]["chunk_text"] == "a b c" and got[(1, 0)]["n_chunk_tokens"] == 3
    assert sum(1 for k in got if k[0] == 1) == 1
    # doc 2: ceil((9-4)/2)+1 = 4 chunks at starts 0,2,4,6
    starts = [got[(2, i)]["start_tok"] for i in range(4)]
    assert starts == [0, 2, 4, 6]
    assert got[(2, 0)]["chunk_text"] == "t1 t2 t3 t4"
    assert got[(2, 1)]["chunk_text"] == "t3 t4 t5 t6"      # overlap = 2
    assert got[(2, 3)]["chunk_text"] == "t7 t8 t9"          # short tail
    assert got[(2, 3)]["n_chunk_tokens"] == 3
    # every token covered
    covered = set()
    for i in range(4):
        covered |= set(got[(2, i)]["chunk_text"].split(" "))
    assert covered == {f"t{j}" for j in range(1, 10)}
    assert not any(k[0] == 3 for k in got)                  # NULL -> none
    assert got[(4, 0)]["n_chunk_tokens"] == 1               # '' = one empty token
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_quota_and_temperature_sampling(spark):
    """Pins: rate 0 keeps nothing / 1 keeps everything / fraction ~rate;
    temperature tau<1 up-weights the tail group (its keep_rate hits the
    min(1,.) cap while the head is downsampled); determinism across calls."""
    from fsharp_data_validation_spark.operators.sampling import (
        quota_sample,
        temperature_sample,
    )

    df = spark.range(0, 2000).selectExpr(
        "id", "CASE WHEN id % 100 = 0 THEN 'tail' ELSE 'head' END AS grp"
    )
    kept = quota_sample(df, "grp", "id", {"head": 0.5, "tail": 1.0})
    by = {r["grp"]: r["n"] for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert by["tail"] == 20                      # rate 1.0 keeps all
    assert 850 <= by["head"] <= 1130             # ~0.5 of 1980
    assert quota_sample(df, "grp", "id", {"head": 0.0, "tail": 0.0}).count() == 0
    assert kept.collect() == quota_sample(
        df, "grp", "id", {"head": 0.5, "tail": 1.0}
    ).collect()                                  # deterministic

    ts = temperature_sample(df, "grp", "id", tau=0.5, target_frac=0.5)
    rates = {r["grp"]: r["keep_rate"] for r in ts.select("grp", "keep_rate").distinct().collect()}
    # w_tail/n_tail >> w_head/n_head at tau=0.5: tail rate capped at 1
    assert rates["tail"] == 1.0
    assert rates["head"] < 0.55
    n_kept = ts.count()
    assert abs(n_kept - 0.5 * 2000) < 200        # expected ~target_frac * N


def test_encoding_quality_signals(spark):
    """Pins: U+FFFD counted as mojibake, C0 controls counted (tab/newline
    exempt), ASCII ratio, NULL text -> NULL metrics, '' -> ratio NULL."""
    from fsharp_data_validation_spark.operators.text import encoding_quality

    rows = [
        Row(id=1, text="ok plain ascii"),
        Row(id=2, text="bad �� mojibake"),
        Row(id=3, text="ctrl\x01\x02 but tab\t and nl\n fine"),
        Row(id=4, text="café 中文"),   # 3 non-ascii of 7 chars
        Row(id=5, text=None),
        Row(id=6, text=""),
    ]
    out = {r["id"]: r for r in encoding_quality(
        spark.createDataFrame(rows), "id", "text").collect()}
    assert out[1]["n_repl"] == 0 and out[1]["ascii_ratio"] == 1.0
    assert out[2]["n_repl"] == 2
    assert out[3]["n_ctrl"] == 2                    # \t and \n not counted
    assert out[4]["n_chars"] == 7 and out[4]["ascii_ratio"] == 0.5714
    assert out[5]["n_chars"] is None and out[5]["ascii_ratio"] is None
    assert out[6]["n_chars"] == 0 and out[6]["ascii_ratio"] is None


def test_pack_windows_state_carries_across_arrow_batches(spark):
    """A conversation split across Arrow batches must pack identically to
    the single-batch run (mapInPandas carries (conv, chunk, acc, rn) state
    across batch boundaries)."""
    from fsharp_data_validation_spark.operators.text import pack_context_windows

    rows = [Row(conv_id="only", turn_idx=i, text="a b c") for i in range(50)]
    df = spark.createDataFrame(rows).coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        got = pack_context_windows(df, "conv_id", "turn_idx", "text", 7).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    want = pack_context_windows(df, "conv_id", "turn_idx", "text", 7).collect()
    key = lambda r: (r["conv_id"], r["rn"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    # budget 7, 3 tokens/turn -> 2 turns per chunk -> 25 chunks
    assert max(r["chunk_id"] for r in got) == 25


def test_global_shuffle_contiguous_and_plan(spark):
    """Bucketed global rank: ranks are exactly 1..N with no gaps, equal the
    naive single-window form, deterministic across calls, and the plan
    contains no single-partition global Sort (the scale hazard)."""
    from fsharp_data_validation_spark.operators.sampling import global_shuffle

    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    out = global_shuffle(df, "doc_id", n_buckets=16)
    ranks = [r["rank"] for r in out.select("rank").collect()]
    assert sorted(ranks) == list(range(1, 3001))
    naive = df.selectExpr(
        "doc_id",
        "CAST(ROW_NUMBER() OVER (ORDER BY "
        "CAST(conv(substring(md5(concat('shuffle','|',CAST(doc_id AS STRING))),1,15),16,10) AS BIGINT), "
        "doc_id) AS BIGINT) AS rank",
    )
    lhs = {(r["doc_id"], r["rank"]) for r in out.select("doc_id", "rank").collect()}
    rhs = {(r["doc_id"], r["rank"]) for r in naive.collect()}
    assert lhs == rhs
    # no global single-partition sort: every Sort in the plan is non-global
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Sort [" in line:
            # Spark prints "Sort [keys], <global>, 0" — require non-global
            assert "], false, 0" in line, line


def test_schema_contract_report_and_conform(spark):
    """Pins the schema-contract component: every violation class is
    detected; conform_schema reorders + widens + drops extras, raises on
    missing columns and non-widening casts, and the conformed frame
    matches the contract exactly."""
    import pytest
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from fsharp_data_validation_spark.functions.schema_contract import (
        conform_schema,
        schema_violations,
    )

    contract = StructType(
        [
            StructField("a", IntegerType(), nullable=False),
            StructField("b", StringType(), nullable=True),
            StructField("c", DoubleType(), nullable=True),
        ]
    )
    actual = StructType(
        [
            StructField("c", IntegerType(), nullable=True),   # widenable
            StructField("a", IntegerType(), nullable=True),   # nullability
            StructField("x", LongType(), nullable=True),      # extra
        ]
    )
    got = {v["column"]: v["status"] for v in schema_violations(actual, contract)}
    assert got == {"a": "nullability", "b": "missing", "c": "type_mismatch", "x": "extra"}

    df = spark.createDataFrame([(1, 2, 3)], "c INT, a INT, x BIGINT")
    with pytest.raises(ValueError, match="missing column b"):
        conform_schema(df, contract)
    df2 = spark.createDataFrame([("s", 1, 2)], "b STRING, a INT, c INT")
    out = conform_schema(df2, contract)
    assert [f.name for f in out.schema.fields] == ["a", "b", "c"]
    assert out.schema["c"].dataType.simpleString() == "double"
    with pytest.raises(ValueError, match="extra columns"):
        conform_schema(
            spark.createDataFrame([(1, "s", 1.0, 9)], "a INT, b STRING, c DOUBLE, z INT"),
            contract,
            on_extra="error",
        )
    with pytest.raises(ValueError, match="cannot conform"):
        conform_schema(
            spark.createDataFrame([("s", "s", 1.0)], "a STRING, b STRING, c DOUBLE"),
            contract,
        )


def test_containment_catches_snippet_jaccard_misses(spark):
    """A short snippet quoted inside a long doc has containment 1.0 but
    tiny Jaccard: containment_dedup_pairs reports it (oriented small->big),
    ngram_jaccard_pairs at the same threshold does not; unrelated docs are
    absent; exact dups orient by id."""
    from fsharp_data_validation_spark.operators.dedup import (
        containment_dedup_pairs,
        ngram_jaccard_pairs,
    )

    snippet = "alpha beta gamma delta epsilon"
    long_doc = " ".join(f"w{i}" for i in range(60)) + " " + snippet + " " + " ".join(
        f"v{i}" for i in range(60)
    )
    rows = [
        Row(doc_id=1, text=snippet),
        Row(doc_id=2, text=long_doc),
        Row(doc_id=3, text="totally unrelated words here in this doc"),
        Row(doc_id=4, text=snippet),   # exact dup of 1
    ]
    df = spark.createDataFrame(rows)
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_dedup_pairs(df, "doc_id", "text", 3, 0.8).collect()
    }
    assert cont[(1, 2)] == 1.0          # snippet contained in long doc
    assert cont[(4, 2)] == 1.0
    assert cont[(1, 4)] == 1.0          # equal sizes -> id order
    assert all(3 not in k for k in cont)
    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.8).collect()
    }
    assert (1, 2) not in jac            # Jaccard blind to containment
    assert (1, 4) in jac


def test_hll_sketch_rollup_merge_property(spark):
    """Per-partition HLL sketches answer subset distinct counts by UNION
    without rescanning: the union estimate over all partitions equals the
    whole-table sketch estimate exactly (same sketch algebra), per-subset
    estimates are within the published HLL error of exact, and sketches
    are small (KBs)."""
    from fsharp_data_validation_spark.operators.stats import (
        hll_partition_sketches,
        hll_rollup,
    )

    df = spark.range(0, 50_000).selectExpr(
        "cast(id % 10 as string) AS day",
        # ~5k distinct values per day, heavy cross-day overlap
        "concat('u', cast(id % 13337 as string)) AS user"
    )
    sk = hll_partition_sketches(df, "day", "user").cache()
    assert sk.count() == 10
    assert max(len(r["sketch"]) for r in sk.collect()) < 20_000  # bytes

    whole = hll_rollup(sk).collect()[0]
    exact_whole = df.selectExpr("count(distinct user) AS d").collect()[0]["d"]
    assert whole["n_parts"] == 10
    assert abs(whole["distinct_estimate"] - exact_whole) / exact_whole < 0.05

    subset = hll_rollup(sk, ["0", "1", "2"]).collect()[0]
    exact_subset = (
        df.filter("day in ('0','1','2')")
        .selectExpr("count(distinct user) AS d")
        .collect()[0]["d"]
    )
    assert subset["n_parts"] == 3
    assert abs(subset["distinct_estimate"] - exact_subset) / exact_subset < 0.05

    # merge property: union of all per-part sketches == one whole-table sketch
    from pyspark.sql import functions as F
    one_shot = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user"), F.lit(12))).alias("d")
    ).collect()[0]["d"]
    assert whole["distinct_estimate"] == one_shot
    sk.unpersist()


def test_dedup_lines_first_occurrence(spark):
    """Line dedup keeps FIRST occurrences in order, counts removals,
    passes unique text through unchanged, and propagates NULL."""
    from fsharp_data_validation_spark.operators.text import dedup_lines

    rows = [
        Row(id=1, text="a\nb\na\nc\nb\na"),
        Row(id=2, text="only\nunique\nlines"),
        Row(id=3, text=None),
        Row(id=4, text=""),
    ]
    out = {r["id"]: r for r in dedup_lines(
        spark.createDataFrame(rows), "id", "text").collect()}
    assert out[1]["clean_text"] == "a\nb\nc"
    assert out[1]["n_lines"] == 6 and out[1]["n_dupe_lines"] == 3
    assert out[2]["clean_text"] == "only\nunique\nlines"
    assert out[2]["n_dupe_lines"] == 0
    assert out[3]["clean_text"] is None and out[3]["n_lines"] is None
    assert out[4]["clean_text"] == "" and out[4]["n_lines"] == 1


def test_pack_windows_fuzz_vs_python_reference(spark):
    """Seeded structural fuzz: random corpora (duplicate turn indexes,
    NULL/empty texts, over-budget turns, many conversations) packed by the
    Spark operator must equal an independent pure-Python implementation of
    the greedy recurrence."""
    import random

    from fsharp_data_validation_spark.operators.text import pack_context_windows

    rng = random.Random(42)
    for trial in range(4):
        budget = rng.choice([1, 5, 16])
        rows = []
        for c in range(rng.randint(1, 8)):
            for t in range(rng.randint(1, 25)):
                r = rng.random()
                if r < 0.1:
                    text = None
                elif r < 0.2:
                    text = ""
                else:
                    text = " ".join("w" for _ in range(rng.randint(1, 24)))
                # ~20% duplicated turn_idx to exercise the (turn_idx, text)
                # tiebreak
                idx = t if rng.random() > 0.2 else max(0, t - 1)
                rows.append((f"c{c}", idx, text))
        df = spark.createDataFrame(rows, "conv_id STRING, turn_idx INT, text STRING")

        want = []
        by_conv = {}
        for conv, idx, text in rows:
            by_conv.setdefault(conv, []).append((idx, text))
        for conv, turns in by_conv.items():
            turns.sort(key=lambda p: (p[0], p[1] if p[1] is not None else ""))
            chunk, acc = 1, 0
            for rn, (idx, text) in enumerate(turns, 1):
                n = 0 if text is None else len(text.split(" "))
                if acc > 0 and acc + n > budget:
                    chunk, acc = chunk + 1, n
                else:
                    acc += n
                want.append((conv, rn, idx, n, chunk))

        got = sorted(
            tuple(r)
            for r in pack_context_windows(df, "conv_id", "turn_idx", "text", budget)
            .collect()
        )
        assert got == sorted(want), f"trial {trial} budget {budget}"


def test_replicate_sample_expected_copies(spark):
    """Upsampling: integer factor replicates exactly; fractional factor
    replicates floor(f) + Bernoulli(frac) with expectation ~f; factor 0
    drops the group; copy_idx enumerates 1..k; deterministic."""
    from fsharp_data_validation_spark.operators.sampling import replicate_sample

    df = spark.range(0, 3000).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS grp"
    )
    out = replicate_sample(df, "grp", "id", {"a": 3.0, "b": 1.5, "c": 0.0})
    by = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert by["a"] == 3000                       # exactly 3x 1000 rows
    assert 1350 <= by["b"] <= 1650               # ~1.5x 1000
    assert "c" not in by
    idxs = sorted(
        r["copy_idx"]
        for r in out.filter("grp = 'a' AND id = 0").collect()
    )
    assert idxs == [1, 2, 3]
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, replicate_sample(df, "grp", "id", {"a": 3.0, "b": 1.5, "c": 0.0}).collect())
    )


def test_mixture_report_shares_sum_to_one(spark):
    """Mixture report: per-group token counts are exact, shares sum to ~1,
    NULL text counts 0 tokens."""
    from fsharp_data_validation_spark.operators.text import mixture_report

    rows = [
        Row(lang="en", src="web", text="a b c"),
        Row(lang="en", src="web", text="d e"),
        Row(lang="fr", src="book", text="x"),
        Row(lang="fr", src="book", text=None),
    ]
    out = {
        (r["lang"], r["src"]): r
        for r in mixture_report(
            spark.createDataFrame(rows), ["lang", "src"]
        ).collect()
    }
    assert out[("en", "web")]["n_tokens"] == 5
    assert out[("fr", "book")]["n_docs"] == 2
    assert out[("fr", "book")]["n_tokens"] == 1
    assert abs(sum(r["token_share"] for r in out.values()) - 1.0) < 1e-6
    assert out[("en", "web")]["token_share"] == round(5 / 6, 6)


def test_schema_violations_fuzz_partition_property():
    """Hypothesis fuzz (pure Python, no Spark): for random actual/expected
    schema pairs, the report covers every expected column exactly once plus
    every extra actual column; an all-ok report implies identical
    name->type mapping with no nullability relaxations."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from fsharp_data_validation_spark.functions.schema_contract import (
        schema_violations,
    )

    types = st.sampled_from([IntegerType(), StringType(), DoubleType()])
    field = st.tuples(st.sampled_from("abcdef"), types, st.booleans())

    def mk(fields):
        seen, out = set(), []
        for name, t, nullable in fields:
            if name not in seen:
                seen.add(name)
                out.append(StructField(name, t, nullable))
        return StructType(out)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(field, max_size=6), st.lists(field, max_size=6))
    def check(actual_fields, expected_fields):
        actual, expected = mk(actual_fields), mk(expected_fields)
        report = schema_violations(actual, expected)
        exp_names = {f.name for f in expected.fields}
        act_names = {f.name for f in actual.fields}
        assert [v["column"] for v in report if v["status"] != "extra"] == [
            f.name for f in expected.fields
        ]
        assert {v["column"] for v in report if v["status"] == "extra"} == (
            act_names - exp_names
        )
        assert {v["column"] for v in report if v["status"] == "missing"} == (
            exp_names - act_names
        )
        if all(v["status"] == "ok" for v in report):
            assert act_names == exp_names
            for f in expected.fields:
                a = actual[f.name]
                assert a.dataType == f.dataType
                assert f.nullable or not a.nullable

    check()


def test_w1_counts_gap_buckets(spark):
    """W1 must integrate |CDF diff| across buckets EMPTY ON BOTH SIDES:
    point masses at buckets 0 and 9 are W1 = 9*width (the naive
    joined-buckets-only sum gives 1*width); identical histograms give 0;
    adjacent buckets give exactly width."""
    from pyspark.sql import Row

    from fsharp_data_validation_spark.operators.drift import w1

    def hist(d):
        return spark.createDataFrame([Row(bucket=b, n=n) for b, n in d.items()])

    val = lambda df: df.collect()[0]["w1"]  # noqa: E731
    assert val(w1(hist({0: 100}), hist({9: 100}), 10, 2.0)) == 18.0
    assert val(w1(hist({0: 50, 9: 50}), hist({0: 50, 9: 50}), 10)) == 0.0
    assert val(w1(hist({3: 10}), hist({4: 10}), 10, 5.0)) == 5.0
    # mixed mass: a=uniform(0,1), b=all at 1 -> |cdf diff| = 0.5 at bucket 0
    assert val(w1(hist({0: 5, 1: 5}), hist({1: 10}), 10)) == 0.5


def test_pack_vec_kernel_equals_loop_kernel():
    """The searchsorted chunk-jump kernel must reproduce the reference
    per-row recurrence exactly — including zero-token runs (NULL texts),
    over-budget single turns, conversations starting with zeros (the
    acc==0 join rule), and conversations split across Arrow batches at
    every possible boundary."""
    import random

    import numpy as np

    from fsharp_data_validation_spark.operators.text import (
        _pack_batch_loop,
        _pack_batch_vec,
    )

    rng = random.Random(7)

    def run(kern, convs, ns, splits, budget):
        state = [None, 1, 0, 0]
        chunks, rns = [], []
        prev = 0
        for cut in list(splits) + [len(ns)]:
            c, r = kern(
                np.array(convs[prev:cut], dtype=object),
                np.array(ns[prev:cut], dtype=np.int64),
                state,
                budget,
            )
            chunks.extend(c.tolist())
            rns.extend(r.tolist())
            prev = cut
        return chunks, rns, list(state)

    # adversarial hand-built case: zeros-then-overbudget join rule
    convs = ["a"] * 6 + ["b"] * 3
    ns = [0, 0, 100, 5, 0, 70, 64, 1, 0]
    for splits in ([], [1], [2], [3], [6], [2, 7], [1, 2, 3, 4, 5, 6, 7, 8]):
        assert run(_pack_batch_vec, convs, ns, splits, 64) == run(
            _pack_batch_loop, convs, ns, splits, 64
        )

    for trial in range(200):
        n = rng.randrange(1, 60)
        convs, ns = [], []
        cid = 0
        while len(ns) < n:
            cid += 1
            for _ in range(rng.randrange(1, 8)):
                convs.append(f"c{cid}")
                ns.append(
                    rng.choice([0, 0, 1, 3, 7, 20, 63, 64, 65, 200])
                )
        convs, ns = convs[:n], ns[:n]
        budget = rng.choice([1, 5, 64])
        n_cuts = rng.randrange(0, 4)
        splits = sorted(rng.sample(range(1, n), min(n_cuts, n - 1)))
        got = run(_pack_batch_vec, convs, ns, splits, budget)
        want = run(_pack_batch_loop, convs, ns, splits, budget)
        assert got == want, (trial, convs, ns, splits, budget, got, want)
