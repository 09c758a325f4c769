"""Round-3 operators: conversation-flow validation, chi-square categorical
drift, per-group W1 drift, MAD outliers, TF-IDF top terms, embedding-space
cross-corpus contamination. Semantics pinned on hand-built fixtures; the
sf0.01 DuckDB oracles cover the derived-table scale."""

import math

from pyspark.sql import Row, functions as F


def test_conversation_flow_violations(spark):
    from fsharp_data_validation_spark.operators.crossrow import (
        conversation_flow_violations,
    )

    rows = [
        # c1: clean user/assistant alternation
        Row(conv_id="c1", turn_idx=0, role="user", text="hi", tool=None, ts=0),
        Row(conv_id="c1", turn_idx=1, role="assistant", text="yo", tool=None, ts=1),
        Row(conv_id="c1", turn_idx=2, role="tool", text="r", tool="t1", ts=2),
        # c2: starts with assistant (violation), repeats role (violation)
        Row(conv_id="c2", turn_idx=0, role="assistant", text="a", tool=None, ts=0),
        Row(conv_id="c2", turn_idx=1, role="assistant", text="b", tool=None, ts=1),
        # c3: tool turn after user (orphan), and tool FIRST turn (start + orphan)
        Row(conv_id="c3", turn_idx=0, role="tool", text="x", tool="t1", ts=0),
        Row(conv_id="c3", turn_idx=1, role="user", text="q", tool=None, ts=1),
        Row(conv_id="c3", turn_idx=2, role="tool", text="y", tool="t2", ts=2),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["code"])
        for r in conversation_flow_violations(df).collect()
    )
    assert got == [
        ("c2", 0, "conversation_start"),
        ("c2", 1, "consecutive_same_role"),
        ("c3", 0, "conversation_start"),
        ("c3", 0, "orphan_tool_turn"),
        ("c3", 2, "orphan_tool_turn"),
    ]


def test_chi2_known_contingency(spark):
    """2x2 table with closed-form chi2: cells a=30,b=10 / c=10,d=30 ->
    chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) = 80*(900-100)^2/40^4 = 20."""
    from fsharp_data_validation_spark.operators.drift import chi2_joined

    counts = spark.createDataFrame(
        [("x", 30, 10), ("y", 10, 30)], "cat string, na long, nb long"
    )
    r = chi2_joined(counts).collect()[0]
    assert r["dof"] == 1
    assert abs(r["chi2"] - 20.0) < 1e-9

    # independence -> chi2 = 0
    indep = spark.createDataFrame(
        [("x", 20, 20), ("y", 30, 30)], "cat string, na long, nb long"
    )
    assert chi2_joined(indep).collect()[0]["chi2"] == 0.0


def test_w1_by_group_point_masses(spark):
    """A group identical to the baseline has w1=0; a group concentrated at
    bucket 0 vs a baseline spread to bucket 19 pays the gap distance —
    densified-grid semantics (matching w1_joined's)."""
    from fsharp_data_validation_spark.operators.drift import w1_by_group

    rows = [("same", float(v)) for v in (0, 190)] * 10 + [("far", 0.0)] * 20
    df = spark.createDataFrame(rows, "grp string, x double")
    out = {r["grp"]: r["w1"] for r in w1_by_group(df, "grp", "x", 10.0, 20).collect()}
    # baseline: 40 rows, 30 at bucket 0 and 10 at bucket 19
    # 'same' group: half at 0, half at 19 -> |CDF diff| = .25 over 19 gaps
    assert abs(out["far"] - (1 - 30 / 40) * 19 * 10.0) < 1e-6
    assert abs(out["same"] - abs(0.5 - 30 / 40) * 19 * 10.0) < 1e-6


def test_mad_outliers_robust_center(spark):
    from fsharp_data_validation_spark.operators.stats import mad_outliers_by_group

    # 9 values near 10 (MAD=1), one extreme value -> exactly one outlier;
    # the extreme value barely moves the median (robustness)
    vals = [9, 9, 10, 10, 10, 11, 11, 12, 8, 1000]
    df = spark.createDataFrame([("g", float(v)) for v in vals], "grp string, x double")
    r = mad_outliers_by_group(df, "grp", "x").collect()[0]
    assert r["med"] == 10.0
    assert r["n_outliers"] == 1 and r["n_rows"] == 10
    # constant group: MAD = 0 -> every off-median row flags (strict >)
    df2 = spark.createDataFrame(
        [("c", 5.0)] * 8 + [("c", 6.0)], "grp string, x double"
    )
    r2 = mad_outliers_by_group(df2, "grp", "x").collect()[0]
    assert r2["mad"] == 0.0 and r2["n_outliers"] == 1


def test_tfidf_top_terms_scores_and_ties(spark):
    from fsharp_data_validation_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "banana cherry shared"),
            (3, "cherry cherry cherry shared"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_top_terms(docs, "doc_id", "text", 2).collect()
    }
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert out[(1, 1)] == ("apple", 2, round(2 * math.log(3), 4))
    assert out[(1, 2)] == ("banana", 1, round(math.log(1.5), 4))
    # doc 2: banana and cherry tie (tf=1, df=2) -> lexicographic order
    assert out[(2, 1)][0] == "banana" and out[(2, 2)][0] == "cherry"
    # 'shared' in every doc -> idf ln(1)=0, never ranks above positives
    assert all(term != "shared" or rnk > 1 for (_, rnk), (term, _, _) in out.items())


def test_cross_corpus_cosine_equals_bruteforce(spark):
    import numpy as np

    from fsharp_data_validation_spark.operators.similarity import (
        cross_corpus_cosine_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 8))
    # eval vectors 0..4 are noisy copies of train vectors 0..4
    train_rows = [(int(i), [float(x) for x in base[i]]) for i in range(30)]
    eval_rows = [
        (int(100 + i), [float(x) for x in base[i] + 0.05 * rng.standard_normal(8)])
        for i in range(5)
    ] + [(int(200 + i), [float(x) for x in rng.standard_normal(8)]) for i in range(5)]
    t = spark.createDataFrame(train_rows, "vec_id long, embedding array<double>")
    e = spark.createDataFrame(eval_rows, "vec_id long, embedding array<double>")

    got = sorted(
        (r["id_a"], r["id_b"], r["sim"])
        for r in cross_corpus_cosine_pairs(t, e, threshold=0.8, blocks=4).collect()
    )

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    want = sorted(
        (ta, eb, round(cos(va, vb), 6))
        for ta, va in train_rows
        for eb, vb in eval_rows
        if round(cos(va, vb), 6) >= 0.8
    )
    assert got == want and len(want) >= 5


def test_dataset_checks_one_pass(spark):
    from fsharp_data_validation_spark.operators.checks import (
        Check,
        completeness,
        compliance,
        dataset_checks,
        uniqueness,
    )

    rows = [
        Row(conv_id="c1", turn_idx=0, role="user", text="hi"),
        Row(conv_id="c1", turn_idx=1, role="assistant", text=None),
        Row(conv_id="c1", turn_idx=1, role="weird", text="dup key"),
        Row(conv_id="c2", turn_idx=0, role="user", text="yo"),
    ]
    df = spark.createDataFrame(rows)
    out = dataset_checks(
        df,
        [
            Check("text_comp", completeness("text"), ">=", 0.8),
            Check("role_ok", compliance(F.col("role").isin("user", "assistant")), ">=", 1.0),
            Check("uniq", uniqueness(["conv_id", "turn_idx"]), ">=", 1.0),
            Check("rows", F.count(F.lit(1)), "==", 4.0),
        ],
    )
    got = {r["check_name"]: (r["metric_value"], r["status"]) for r in out.collect()}
    assert got["text_comp"] == (0.75, "fail")
    assert got["role_ok"] == (0.75, "fail")
    assert got["uniq"] == (0.75, "fail")  # 3 distinct keys / 4 rows
    assert got["rows"] == (4.0, "pass")
    # one aggregation pass: a single final physical aggregate, no join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_dataset_checks_rejects_bad_specs(spark):
    import pytest as _pytest

    from fsharp_data_validation_spark.operators.checks import Check, dataset_checks

    with _pytest.raises(ValueError):
        Check("x", F.count(F.lit(1)), "!=", 1.0)
    df = spark.range(1)
    with _pytest.raises(ValueError):
        dataset_checks(df, [])
    dup = [
        Check("same", F.count(F.lit(1)), ">=", 0.0),
        Check("same", F.count(F.lit(1)), ">=", 0.0),
    ]
    with _pytest.raises(ValueError):
        dataset_checks(df, dup)


def test_context_budget_violations(spark):
    from fsharp_data_validation_spark.operators.crossrow import (
        context_budget_violations,
    )

    rows = [
        # c1: 3 + 3 + 3 tokens -> cum 3, 6, 9; budget 7 flags only the last
        ("c1", 0, "user", "a b c", None, 0),
        ("c1", 1, "assistant", "d e f", None, 1),
        ("c1", 2, "user", "g h i", None, 2),
        # c2: NULL text counts 0 tokens; never over budget
        ("c2", 0, "user", None, None, 0),
        ("c2", 1, "assistant", "x", None, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = [
        (r["conv_id"], r["turn_idx"], r["n_tokens"], r["cum_tokens"])
        for r in context_budget_violations(df, budget=7).collect()
    ]
    assert got == [("c1", 2, 3, 9)]


def test_repeated_turns_scoped_to_conversation(spark):
    from fsharp_data_validation_spark.operators.crossrow import repeated_turns

    rows = [
        # c1: "Retry " repeated 3x under normalization (case/whitespace)
        Row(conv_id="c1", turn_idx=0, text="retry"),
        Row(conv_id="c1", turn_idx=1, text="Retry"),
        Row(conv_id="c1", turn_idx=5, text="  retry  "),
        Row(conv_id="c1", turn_idx=2, text="ok"),
        # same text in ANOTHER conversation: not a loop (scoped key)
        Row(conv_id="c2", turn_idx=0, text="retry"),
        # empty/NULL text excluded
        Row(conv_id="c3", turn_idx=0, text="   "),
        Row(conv_id="c3", turn_idx=1, text="   "),
        Row(conv_id="c3", turn_idx=2, text=None),
    ]
    got = repeated_turns(spark.createDataFrame(rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["conv_id"], r["n_repeats"], r["first_turn"], r["last_turn"]) == (
        "c1", 3, 0, 5,
    )


def test_cvm_closed_forms(spark):
    from fsharp_data_validation_spark.operators.drift import cvm_joined

    # identical histograms -> 0
    same = spark.createDataFrame(
        [(0, 10, 10), (1, 30, 30)], "bucket int, na long, nb long"
    )
    assert cvm_joined(same).collect()[0]["cvm"] == 0.0

    # fully disjoint mass: Fa=[1,1], Fb=[0,1], w=[.5,.5] -> 0.5*1 + 0.5*0
    disjoint = spark.createDataFrame(
        [(0, 10, 0), (1, 0, 10)], "bucket int, na long, nb long"
    )
    assert abs(cvm_joined(disjoint).collect()[0]["cvm"] - 0.5) < 1e-9


def test_misra_gries_sketch_bounds_and_merge(spark):
    from fsharp_data_validation_spark.operators.stats import (
        mg_partition_sketches,
        mg_rollup,
    )

    # two partitions with a known skewed stream; k=2 forces truncation
    data = (
        [("p1", "a")] * 10 + [("p1", "b")] * 6 + [("p1", "c")] * 3
        + [("p1", "d")] * 1
        + [("p2", "a")] * 4 + [("p2", "c")] * 5 + [("p2", "e")] * 2
    )
    df = spark.createDataFrame(data, "part string, v string")
    sk = mg_partition_sketches(df, "part", "v", k=2).collect()
    by_part = {}
    for r in sk:
        by_part.setdefault(r["part"], {})[r["item"]] = (r["est"], r["err"])
    # p1: counts a=10 b=6 c=3 d=1 -> d(threshold)=c's 3; kept a:7 b:3, err=3
    assert by_part["p1"] == {"a": (7, 3), "b": (3, 3)}
    # p2: counts c=5 a=4 e=2 -> threshold=2; kept c:3 a:2, err=2
    assert by_part["p2"] == {"c": (3, 2), "a": (2, 2)}

    rolled = {
        r["item"]: (r["est_count"], r["err_bound"])
        for r in mg_rollup(
            mg_partition_sketches(df, "part", "v", k=2)
        ).collect()
    }
    true = {"a": 14, "b": 6, "c": 8, "d": 1, "e": 2}
    # merge rule: est sums, errs add (3 + 2 = 5); est <= true <= est + err
    assert rolled == {"a": (9, 5), "b": (3, 5), "c": (3, 5)}
    for item, (est, err) in rolled.items():
        assert est <= true[item] <= est + err

    # re-truncation to k=1 moves the subtracted count into the error bound
    retrunc = mg_rollup(mg_partition_sketches(df, "part", "v", k=2), k=1).collect()
    assert len(retrunc) == 1
    r = retrunc[0]
    assert r["item"] == "a" and r["est_count"] == 6 and r["err_bound"] == 8
    assert r["est_count"] <= true["a"] <= r["est_count"] + r["err_bound"]

    # partition-subset rollup never rescans: restrict to p2 only
    only_p2 = {
        r["item"]: (r["est_count"], r["err_bound"])
        for r in mg_rollup(
            mg_partition_sketches(df, "part", "v", k=2), parts=["p2"]
        ).collect()
    }
    assert only_p2 == {"c": (3, 2), "a": (2, 2)}


def test_misra_gries_exact_when_k_exceeds_vocab(spark):
    from fsharp_data_validation_spark.operators.stats import (
        mg_partition_sketches,
        mg_rollup,
    )

    data = [("p1", "x")] * 3 + [("p1", "y")] * 2 + [("p2", "x")] * 4
    df = spark.createDataFrame(data, "part string, v string")
    rolled = {
        r["item"]: (r["est_count"], r["err_bound"])
        for r in mg_rollup(mg_partition_sketches(df, "part", "v", k=16)).collect()
    }
    assert rolled == {"x": (7, 0), "y": (2, 0)}


def test_moments_rollup_exact_merge(spark):
    """Chan-merged per-partition sketches must equal moments computed on
    the whole data directly — for skewed, multi-partition input including
    a constant partition (NaN-guard path) and a singleton partition."""
    import random

    rng = random.Random(7)
    rows = (
        [("a", rng.expovariate(0.1)) for _ in range(400)]
        + [("b", rng.gauss(50, 5)) for _ in range(300)]
        + [("c", 42.0) for _ in range(50)]  # constant partition: var_pop = 0
        + [("d", 999.0)]  # singleton partition
    )
    df = spark.createDataFrame(rows, "part string, v double")
    from fsharp_data_validation_spark.operators.stats import (
        moments_partition_sketches,
        moments_rollup,
    )

    got = moments_rollup(
        moments_partition_sketches(df, "part", "v"), round_to=6
    ).collect()[0]

    vals = [v for _, v in rows]
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((x - mu) ** 2 for x in vals)
    m3 = sum((x - mu) ** 3 for x in vals)
    m4 = sum((x - mu) ** 4 for x in vals)
    assert got["n_parts"] == 4 and got["n_values"] == n
    assert math.isclose(got["mean"], mu, rel_tol=1e-9, abs_tol=1e-6)
    assert math.isclose(got["var_pop"], m2 / n, rel_tol=1e-6)
    assert math.isclose(
        got["skew"], math.sqrt(n) * m3 / m2**1.5, rel_tol=1e-5, abs_tol=1e-5
    )
    assert math.isclose(
        got["kurt"], n * m4 / (m2 * m2) - 3, rel_tol=1e-5, abs_tol=1e-5
    )


def test_moments_rollup_subset_and_degenerate(spark):
    """Partition-subset rollup answers from the sketch table alone; an
    all-constant subset exercises the M2=0 guard (skew/kurt -> 0)."""
    from fsharp_data_validation_spark.operators.stats import (
        moments_partition_sketches,
        moments_rollup,
    )

    rows = [("a", 1.0), ("a", 3.0), ("b", 7.0), ("b", 7.0), ("b", 7.0)]
    sk = moments_partition_sketches(
        spark.createDataFrame(rows, "part string, v double"), "part", "v"
    )
    only_a = moments_rollup(sk, parts=["a"], round_to=6).collect()[0]
    assert only_a["n_values"] == 2 and only_a["mean"] == 2.0
    assert only_a["var_pop"] == 1.0  # population variance of {1,3}
    only_b = moments_rollup(sk, parts=["b"], round_to=6).collect()[0]
    assert only_b["var_pop"] == 0.0 and only_b["skew"] == 0.0
    assert only_b["kurt"] == 0.0  # guard, not NaN


def test_fd_violations_counts(spark):
    from fsharp_data_validation_spark.operators.checks import fd_violations

    rows = [
        # key (1,1) maps to two roles -> violating (3 rows under it)
        (1, 1, "user", "x"),
        (1, 1, "user", "x"),
        (1, 1, "tool", "x"),
        # key (1,2) is clean
        (1, 2, "user", "y"),
        # NULL rhs never counts as a distinct value
        (2, 1, "user", None),
        (2, 1, "user", "z"),
    ]
    df = spark.createDataFrame(rows, "conv int, turn int, role string, text string")
    got = {
        r["fd"]: r
        for r in fd_violations(
            df, [(["conv", "turn"], "role"), (["conv", "turn"], "text")]
        ).collect()
    }
    r = got["conv,turn->role"]
    assert (r["n_keys"], r["violating_keys"], r["violating_rows"]) == (3, 1, 3)
    assert abs(r["violation_rate"] - 1 / 3) < 1e-3
    t = got["conv,turn->text"]
    assert (t["violating_keys"], t["violating_rows"]) == (0, 0)

    import pytest

    with pytest.raises(ValueError):
        fd_violations(df, [])


def test_benford_digits_and_chi2(spark):
    """String-based first digit classifies exact powers of ten correctly;
    chi2 matches the hand-computed statistic."""
    from fsharp_data_validation_spark.operators.checks import benford_check

    vals = [1, 10, 100, 1000, 2, 25, 300, 9, 95, -5, 0]  # <=0 dropped
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["digit"]: r for r in benford_check(df, "v", round_to=6).collect()}
    assert set(got) == set(range(1, 10))  # full spine, zeros included
    assert got[1]["n"] == 4  # 1, 10, 100, 1000 all digit 1
    assert got[3]["n"] == 1 and got[9]["n"] == 2
    assert got[4]["n"] == 0 and got[4]["obs_p"] == 0.0
    n_tot = 9
    chi2 = 0.0
    for d in range(1, 10):
        exp = n_tot * math.log10(1 + 1 / d)
        obs = {1: 4, 2: 2, 3: 1, 9: 2}.get(d, 0)
        # unobserved digits still contribute their expected mass
        chi2 += (obs - exp) ** 2 / exp
    assert abs(got[1]["chi2"] - chi2) < 1e-4
    assert abs(got[1]["obs_p"] - 4 / 9) < 1e-5


def test_top_ngram_fraction_tiebreak_and_short_docs(spark):
    from fsharp_data_validation_spark.operators.text import top_ngram_fraction

    docs = [
        (1, "a b a b a b"),  # "a b" x3 beats "b a" x2
        (2, "x y"),  # single bigram
        (3, "solo"),  # < n words: no row
        (4, "t t t t"),  # "t t" x3
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["id"]: r for r in top_ngram_fraction(df, "doc_id", "text", 2).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1]["top_ngram"] == "a b" and got[1]["n_occurrences"] == 3
    # 3 occurrences x 3 chars / 11 chars
    assert abs(got[1]["char_frac"] - 9 / 11) < 1e-3
    # overlapping occurrences can cover > chars: fraction is capped at 1
    assert got[4]["n_occurrences"] == 3 and got[4]["char_frac"] == 1.0
    assert got[2]["top_ngram"] == "x y" and got[2]["char_frac"] == 1.0


def test_chi2_by_group_identical_and_skewed(spark):
    """A group distributed exactly like the baseline scores chi2 = 0
    (its contingency rows are proportional); a skewed group scores > 0,
    and a category the group is MISSING still contributes."""
    from fsharp_data_validation_spark.operators.drift import chi2_by_group

    rows = (
        [("g1", "a")] * 30 + [("g1", "b")] * 10
        + [("g2", "a")] * 30 + [("g2", "b")] * 10  # same 3:1 mix -> chi2 0
    )
    df = spark.createDataFrame(rows, "grp string, cat string")
    got = {r["grp"]: r for r in chi2_by_group(df, "grp", "cat").collect()}
    assert got["g1"]["chi2"] == 0.0 and got["g2"]["chi2"] == 0.0
    assert got["g1"]["dof"] == 1 and got["g1"]["n_rows"] == 40

    rows2 = [("g1", "a")] * 40 + [("g2", "b")] * 40  # disjoint categories
    got2 = {
        r["grp"]: r
        for r in chi2_by_group(
            spark.createDataFrame(rows2, "grp string, cat string"), "grp", "cat"
        ).collect()
    }
    assert got2["g1"]["chi2"] > 0 and got2["g1"]["dof"] == 1


def test_zipf_fit_exact_power_law(spark):
    """freq = 48/rank is exactly log-log linear: slope -1, r^2 = 1."""
    from fsharp_data_validation_spark.operators.text import zipf_fit

    text = " ".join(["a"] * 48 + ["b"] * 24 + ["c"] * 16 + ["d"] * 12)
    df = spark.createDataFrame([(text,)], "text string")
    got = zipf_fit(df, "text", top_k=10, min_count=2).collect()[0]
    assert got["n_types"] == 4
    assert abs(got["slope"] + 1.0) < 1e-6
    assert abs(got["r_squared"] - 1.0) < 1e-6


def test_dup_ngram_fraction_counts_and_cap(spark):
    from fsharp_data_validation_spark.operators.text import dup_ngram_fraction

    docs = [
        (1, "x y z x y z x y z"),  # all three 3-grams duplicated; cap at 1
        (2, "a b c d e"),  # no duplicated 3-gram: no row
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["id"]: r for r in dup_ngram_fraction(df, "doc_id", "text", 3).collect()}
    assert set(got) == {1}
    assert got[1]["n_dup_ngrams"] == 3
    assert got[1]["dup_char_frac"] == 1.0  # 35 covered chars / 17 -> capped


def test_pmi_bigrams_hand_value(spark):
    """Six 'a b' docs: p(ab)=1, p(a)=p(b)=1/2 -> PMI = ln 4."""
    from fsharp_data_validation_spark.operators.text import pmi_bigrams

    df = spark.createDataFrame([("a b",)] * 6, "text string")
    got = pmi_bigrams(df, "text", min_count=5, top_k=5).collect()
    assert len(got) == 1
    assert got[0]["bigram"] == "a b" and got[0]["n_ab"] == 6
    assert abs(got[0]["pmi"] - math.log(4.0)) < 1e-3


def test_pmi_total_uses_unfiltered_bigrams(spark):
    """min_count prunes which pairs are SCORED, not p(ab)'s denominator."""
    from fsharp_data_validation_spark.operators.text import pmi_bigrams

    # 5x "a b" + 2x "c d": nb must be 7, so pmi(a b) = ln((5/7)/(0.5^2 ... ))
    df = spark.createDataFrame([("a b",)] * 5 + [("c d",)] * 2, "text string")
    got = pmi_bigrams(df, "text", min_count=5, top_k=5).collect()
    assert len(got) == 1 and got[0]["bigram"] == "a b"
    # p(ab) = 5/7 over ALL bigram tokens; p(a) = p(b) = 5/14 unigram tokens
    expect = math.log((5 / 7) / ((5 / 14) * (5 / 14)))
    assert abs(got[0]["pmi"] - expect) < 1e-3


def test_vocab_growth_first_appearance(spark):
    from fsharp_data_validation_spark.operators.text import vocab_growth

    rows = [
        ("2024-01-01 00:00:00", "a b c"),
        ("2024-01-01 05:00:00", "a b"),  # no new tokens
        ("2024-01-02 00:00:00", "a d"),  # d is new
        ("2024-01-03 00:00:00", None),  # ignored
        ("2024-01-04 00:00:00", "e e e"),  # e counted once
    ]
    df = spark.createDataFrame(rows, "ts string, text string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {str(r["day"]): r for r in vocab_growth(df, "ts", "text").collect()}
    assert got["2024-01-01"]["new_tokens"] == 3
    assert got["2024-01-01"]["tokens"] == 5  # daily volume counts repeats
    assert got["2024-01-02"]["new_tokens"] == 1
    assert "2024-01-03" not in got  # NULL-text-only day: no data
    assert got["2024-01-04"]["new_tokens"] == 1  # e counted once
    assert got["2024-01-04"]["tokens"] == 3
    assert got["2024-01-04"]["vocab_size"] == 5


def test_gopher_kernels_equivalent(spark):
    """The zero-shuffle sorted-runs fold kernels must produce EXACTLY the
    explode + hash-agg spec's output — fuzzed over random short docs plus
    the adversarial edges (empty text, single word, all-same words,
    empty-string words from double spaces)."""
    import random

    from fsharp_data_validation_spark.operators.text import (
        dup_ngram_fraction,
        top_ngram_fraction,
    )

    rng = random.Random(23)
    rows = []
    for i in range(300):
        m = rng.randint(0, 15)
        rows.append((i, " ".join(rng.choice("abcx") for _ in range(m))))
    rows += [
        (900, None),
        (901, ""),
        (902, "solo"),
        (903, "t t t t t t"),
        (904, "a  b  a  b"),  # double spaces -> empty-string words
    ]
    # unicode tokens + longer docs (sort order exercised beyond ASCII)
    uni = ["héllo", "wörld", "日本", "ß", "a"]
    rows += [
        (1100 + i, " ".join(rng.choice(uni) for _ in range(rng.randint(20, 60))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (1, 2, 3):
        a = sorted(
            map(tuple, top_ngram_fraction(df, "doc_id", "text", n, kernel="local").collect())
        )
        b = sorted(
            map(tuple, top_ngram_fraction(df, "doc_id", "text", n, kernel="explode").collect())
        )
        assert a == b, f"top_ngram kernels diverge at n={n}"
        c = sorted(
            map(tuple, dup_ngram_fraction(df, "doc_id", "text", n, kernel="local").collect())
        )
        d = sorted(
            map(tuple, dup_ngram_fraction(df, "doc_id", "text", n, kernel="explode").collect())
        )
        assert c == d, f"dup_ngram kernels diverge at n={n}"


def test_pmi_prune_identical_output(spark):
    """The two-pass frequent-word-prefilter form must equal the single-pass
    form exactly — on a Zipf-ish corpus where the prune actually drops
    words (rare words below min_count), plus single-word and empty docs."""
    import random

    from fsharp_data_validation_spark.operators.text import pmi_bigrams

    rng = random.Random(5)
    vocab = ["the", "cat", "sat", "mat"] + [f"rare{i}" for i in range(40)]
    weights = [50, 30, 30, 20] + [1] * 40
    rows = []
    for _ in range(300):
        m = rng.randint(1, 10)
        rows.append((" ".join(rng.choices(vocab, weights=weights, k=m)),))
    rows += [("",), ("solo",)]
    df = spark.createDataFrame(rows, "text string")
    a = sorted(map(tuple, pmi_bigrams(df, "text", 3, 100, prune=False).collect()))
    b = sorted(map(tuple, pmi_bigrams(df, "text", 3, 100, prune=True).collect()))
    assert a == b and len(a) > 3


def test_weighted_sample_determinism_and_bias(spark):
    """A-ES: deterministic across runs, excludes non-positive weights, and
    heavily-weighted rows are sampled (far) more often — checked by giving
    one row overwhelming weight across many salts."""
    from fsharp_data_validation_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 if i else 10000.0) for i in range(50)] + [(99, 0.0), (98, -1.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = [tuple(r) for r in weighted_sample(df, "doc_id", "w", 10).collect()]
    b = [tuple(r) for r in weighted_sample(df, "doc_id", "w", 10).collect()]
    assert a == b and len(a) == 10  # deterministic
    assert all(r[0] not in (98, 99) for r in a)  # non-positive excluded
    assert [r[2] for r in a] == list(range(1, 11))  # rnk 1..k
    # doc 0 has 10000x the weight: it must appear, and essentially always
    # near the front, for any salt
    hits = 0
    for s in ("s1", "s2", "s3", "s4", "s5"):
        got = weighted_sample(df, "doc_id", "w", 10, salt=s).collect()
        hits += any(r["id"] == 0 for r in got)
    assert hits == 5


def test_embedding_health_flags(spark):
    from fsharp_data_validation_spark.operators.similarity import embedding_health

    rows = [
        (1, [3.0, 4.0]),          # norm 5
        (2, [0.0, 0.0]),          # zero vector
        (3, None),                # null
        (4, [1.0]),               # wrong dim
        (5, [float("nan"), 1.0]), # NaN component
        (6, [0.0, 2.0]),          # norm 2
    ]
    rows.append((7, [None, 1.0]))  # NULL component: its own defect class
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_health(df, "embedding", 2, round_to=6).collect()[0]
    assert (
        r["n_vecs"], r["n_null"], r["n_wrong_dim"], r["n_nan"],
        r["n_null_comp"], r["n_zero"],
    ) == (7, 1, 1, 1, 1, 1)
    assert r["mean_norm"] == 3.5 and r["min_norm"] == 2.0 and r["max_norm"] == 5.0


def test_violation_examples_null_key_hashing(spark):
    """The exemplar-ranking hash must COALESCE each key component: NULL
    conv_id rows (the conv_id-required violation class) still get a
    deterministic, engine-portable order. Pinned against the same formula
    computed with Python hashlib."""
    import hashlib

    from pyspark.sql import Window

    from fsharp_data_validation_spark.operators.dedup import md5_int

    rows = [
        (None, 0, 100),
        (None, 1, 200),
        ("c1", None, 300),
        ("c2", 2, None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, epoch long")
    key = F.concat_ws(
        "|",
        F.coalesce(F.col("conv_id"), F.lit("")),
        F.coalesce(F.col("turn_idx").cast("string"), F.lit("")),
        F.coalesce(F.col("epoch").cast("string"), F.lit("")),
    )
    h = md5_int(key, salt="ex")
    got = [
        (r["conv_id"], r["turn_idx"], r["epoch"])
        for r in df.withColumn("_h", h).orderBy("_h").collect()
    ]

    def py_h(c, t, e):
        s = "ex|" + "|".join("" if x is None else str(x) for x in (c, t, e))
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = sorted(rows, key=lambda r: py_h(*r))
    assert got == [tuple(r) for r in want]


def test_skew_report_null_and_shares(spark):
    from fsharp_data_validation_spark.operators.stats import skew_report

    rows = [("hot", "x")] * 6 + [(None, "x")] * 3 + [("a", "y")]
    df = spark.createDataFrame(rows, "k string, other string")
    got = {
        (r["key"], r["rnk"]): (r["value"], r["n"], r["share"], r["n_distinct"])
        for r in skew_report(df, ["k"], top=2).collect()
    }
    assert got[("k", 1)] == ("hot", 6, 0.6, 3)
    assert got[("k", 2)] == ("<NULL>", 3, 0.3, 3)  # NULL keys count


def test_audio_meta_roundtrip_and_hygiene(spark):
    """Real PCM WAV round-trip: build canonical RIFF files, parse them
    back exactly; malformed payloads (truncated, non-RIFF, NULL,
    zero-rate) flag ok=false with NULL fields instead of raising."""
    from fsharp_data_validation_spark.operators.multimodal import (
        decode_audio_meta,
        make_wav_payload,
    )

    good = make_wav_payload(16000, 2, 16, 160, seed=1)
    rows = [
        (1, good),
        (2, make_wav_payload(44100, 1, 8, 441, seed=2)),
        (3, good[:20]),  # truncated
        (4, b"not a wav at all" + bytes(40)),  # wrong magic
        (5, None),  # NULL payload
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_audio_meta(df).collect()}
    assert got[1]["ok"] and (
        got[1]["sample_rate"], got[1]["channels"], got[1]["bits"], got[1]["n_samples"]
    ) == (16000, 2, 16, 160)
    assert abs(got[1]["duration_s"] - 0.01) < 1e-9
    assert got[2]["ok"] and got[2]["n_samples"] == 441
    assert abs(got[2]["duration_s"] - 0.01) < 1e-9
    for mid in (3, 4, 5):
        assert got[mid]["ok"] is False and got[mid]["sample_rate"] is None


def test_cluster_size_histogram(spark):
    from fsharp_data_validation_spark.operators.dedup import cluster_size_histogram

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id int, component int",
    )
    got = {r["cluster_size"]: r for r in cluster_size_histogram(comp).collect()}
    assert got[3]["n_clusters"] == 1 and got[3]["n_docs"] == 3
    assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
    assert got[1]["n_clusters"] == 1 and got[1]["n_docs"] == 1
