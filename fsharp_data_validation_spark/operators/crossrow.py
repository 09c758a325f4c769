"""Cross-row constraints — the table-level checks the reference cannot
express (single-value library; §2.8 of SURVEY.md) but the north rule
requires: uniqueness, referential integrity, ordering/ts-gap.

Scale design (10^12 turns):
- uniqueness: hash aggregation with map-side partial combine — one shuffle on
  the key. Keys ``(conv_id, turn_idx)`` are near-unique, so per-group state is
  tiny; hot conv_ids do NOT skew this shuffle because turn_idx spreads them.
  For pathological single-key floods, ``salt`` splits the count into a salted
  partial + final stage.
- referential: the catalog is tiny — broadcast LEFT ANTI join, no shuffle of
  the fact side.
- ordering: per-conversation windows. Window partitions are bounded by the
  max conversation length (documented assumption), so no conv_id salting is
  needed for the window itself; AQE handles residual skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def uniqueness_violations(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = 0
) -> DataFrame:
    """Key groups with more than one row -> (keys..., n_dups).

    With ``salt_buckets > 0``, counts are computed in two stages —
    ``groupBy(keys, salt)`` partial then ``groupBy(keys)`` final — which
    bounds per-task state when a single key floods (skew salting per
    SURVEY.md §4). Partial aggregation already gives map-side combine in the
    unsalted path, so salting is only for adversarial key distributions.
    """
    if salt_buckets and salt_buckets > 1:
        # row-level salt, independent of physical partitioning: a hash of
        # monotonically_increasing_id spreads a flooded key uniformly over
        # the buckets even after AQE coalescing reshapes the input
        # partitions (spark_partition_id-based salt can collapse to a few
        # distinct values there). The salt never reaches the output, so the
        # id's nondeterminism across runs is irrelevant.
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
        salted = df.groupBy(*keys, salt.alias("_salt")).agg(
            F.count(F.lit(1)).alias("_partial")
        )
        counts = salted.groupBy(*keys).agg(F.sum("_partial").alias("n_dups"))
    else:
        counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_dups"))
    return counts.filter(F.col("n_dups") > 1)


def referential_violations(
    df: DataFrame,
    fk_col: str,
    catalog: DataFrame,
    pk_col: str,
    out_cols: Sequence[str],
) -> DataFrame:
    """Rows whose non-NULL ``fk_col`` has no match in the catalog
    (hasElem-at-scale, Library.fs:97 -> broadcast LEFT ANTI join)."""
    cat = F.broadcast(catalog.select(F.col(pk_col).alias(fk_col)).distinct())
    return (
        df.filter(F.col(fk_col).isNotNull())
        .join(cat, on=fk_col, how="left_anti")
        .select(*out_cols)
    )


def referential_passes(
    df: DataFrame, fk_col: str, catalog: DataFrame, pk_col: str
) -> DataFrame:
    """LEFT SEMI companion (valid side of the referential gate)."""
    cat = F.broadcast(catalog.select(F.col(pk_col).alias(fk_col)).distinct())
    return df.filter(F.col(fk_col).isNotNull()).join(cat, on=fk_col, how="left_semi")


def ordering_violations(
    df: DataFrame,
    part_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Timestamp regressions against turn ordering: within a conversation
    ordered by ``(turn_idx, ts)`` (total order; ts breaks duplicate-turn
    ties deterministically), flag rows where turn_idx advanced but ts went
    backwards. ≅ lag-window re-expression of per-turn ordering invariants."""
    w = Window.partitionBy(part_col).orderBy(idx_col, ts_col)
    lagged = df.select(
        part_col,
        idx_col,
        ts_col,
        F.lag(idx_col).over(w).alias("_prev_idx"),
        F.lag(ts_col).over(w).alias("_prev_ts"),
    )
    return lagged.filter(
        (F.col("_prev_idx").isNotNull())
        & (F.col(idx_col) > F.col("_prev_idx"))
        & (F.col(ts_col) < F.col("_prev_ts"))
    ).select(
        part_col,
        idx_col,
        F.col(ts_col),
        F.col("_prev_ts").alias("prev_ts"),
    )


def turn_gap_seconds(
    df: DataFrame,
    part_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-turn gap to the previous turn in whole seconds (NULL for the
    first turn of a conversation). Input to ts-gap stats and drift."""
    w = Window.partitionBy(part_col).orderBy(idx_col, ts_col)
    return df.select(
        part_col,
        idx_col,
        ts_col,
        (
            F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
        ).alias("gap_s"),
    )


def conversation_flow_violations(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    text_col: str = "text",
    tool_col: str = "tool",
    start_roles: Sequence[str] = ("system", "user"),
) -> DataFrame:
    """Structural conversation-flow validation — the cross-row shape of the
    reference's role-enum membership (Library.fs:97 ``hasElem``): the enum
    check constrains one turn's role, these constrain the SEQUENCE of roles.
    Flags, per turn, any of:

    - ``conversation_start``: the first turn's role is not in
      ``start_roles`` (a transcript must open with system/user);
    - ``consecutive_same_role``: a turn repeats the previous turn's role
      (turn-taking invariant);
    - ``orphan_tool_turn``: a ``tool`` turn not directly preceded by an
      ``assistant`` turn (tool results must answer an assistant call).

    Returns (conv, turn_idx, role, code); a turn can carry several codes.
    ONE window pass ordered by the total key (turn_idx, ts, role, text,
    tool) — ts alone can tie under injected duplicate turn indexes, and a
    lag comparison needs a total order to be deterministic on both engines
    — then a row-local code array + explode: one shuffle (zero on a
    conv_id-bucketed layout), output proportional to violations."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    o = F.coalesce(F.col(tool_col), F.lit(""))
    w = Window.partitionBy(conv_col).orderBy(idx_col, ts_col, role_col, t, o)
    role = F.col(role_col)
    lagged = df.select(
        conv_col,
        idx_col,
        role_col,
        F.lag(role_col).over(w).alias("_prev_role"),
        F.row_number().over(w).alias("_rn"),
    )
    prev = F.col("_prev_role")
    codes = F.array(
        F.when(
            (F.col("_rn") == 1) & ~role.isin(list(start_roles)),
            F.lit("conversation_start"),
        ),
        F.when(prev.isNotNull() & (role == prev), F.lit("consecutive_same_role")),
        F.when(
            (role == F.lit("tool")) & (prev.isNull() | (prev != F.lit("assistant"))),
            F.lit("orphan_tool_turn"),
        ),
    )
    return lagged.select(
        conv_col,
        idx_col,
        role_col,
        F.explode(F.filter(codes, lambda c: c.isNotNull())).alias("code"),
    )


def context_budget_violations(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    text_col: str = "text",
    tool_col: str = "tool",
    tokenizer: str = "whitespace",
) -> DataFrame:
    """Context-window budget validation: the running whitespace-token total
    of a conversation (ordered by turn) must stay within ``budget`` — the
    cross-row form of the reference's ``maxLength`` bound (Library.fs:80):
    maxLength constrains one value's size, this constrains the SUM of sizes
    along the conversation prefix. Flags every turn whose cumulative token
    count exceeds the budget: (conv, turn_idx, role, n_tokens, cum_tokens).

    Shape: one window pass per conversation — a single shuffle on conv_id
    (zero on a conv_id-bucketed layout); window state is bounded by max
    conversation length, not table size. The frame is an explicit ROWS
    running frame over the same total order as ``conversation_flow_violations``
    (turn_idx, ts, role, text, tool) so tie handling is engine-portable:
    fully-identical rows are the only possible ties, and their cum values
    form the same multiset under any tiebreak. Token rule matches
    ``operators/text.py:token_count`` (single-space split; NULL -> 0);
    ``tokenizer="bpe"`` budgets in greedy-subword tokens instead
    (``operators/text.py:bpe_token_count_col`` — still a column expr)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    o = F.coalesce(F.col(tool_col), F.lit(""))
    if tokenizer == "bpe":
        from .text import bpe_token_count_col

        n_tokens = bpe_token_count_col(text_col)
    elif tokenizer == "whitespace":
        n_tokens = (
            F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(F.size(F.split(F.col(text_col), " ")))
            .cast("bigint")
        )
    else:
        raise ValueError(f"tokenizer must be whitespace|bpe, got {tokenizer!r}")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col, ts_col, role_col, t, o)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = df.select(
        conv_col,
        idx_col,
        role_col,
        n_tokens.alias("n_tokens"),
        F.sum(n_tokens).over(w).alias("cum_tokens"),
    )
    return with_cum.filter(F.col("cum_tokens") > budget)


def repeated_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    min_repeats: int = 2,
) -> DataFrame:
    """Intra-conversation loop detection: the same normalized turn text
    appearing ``min_repeats``+ times within ONE conversation — the signature
    of a stuck agent loop (and of copy-paste template turns). Distinct from
    corpus-level dedup (operators/dedup.py): the group key is
    (conversation, content), so a phrase common ACROSS conversations is not
    flagged.

    Returns (conv, text_digest, n_repeats, first_turn, last_turn). Shape:
    one hash aggregation on (conv, md5(lower(trim(text)))) with map-side
    combine — per-group state is O(1); skew is bounded by max conversation
    length, not corpus frequency, because the digest is scoped to the
    conversation. Empty/NULL text is excluded (emptiness is the row suite's
    ``isNotNull`` job — Library.fs:62-67)."""
    norm = F.lower(F.trim(F.col(text_col)))
    return (
        df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .groupBy(
            F.col(conv_col),
            F.md5(norm).alias("text_digest"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_repeats"),
            F.min(idx_col).alias("first_turn"),
            F.max(idx_col).alias("last_turn"),
        )
        .filter(F.col("n_repeats") >= min_repeats)
    )
