"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting. All
built-in column expressions (JVM-side, whole-stage codegen) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "de": ["der", "die", "und"],
    "fr": ["le", "les", "des"],
}


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars): whitespace tokens + a BPE-ish subword
    estimate (ceil(chars/4) is the common public rule of thumb)."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.ceil(F.length(text_col) / 4).cast("bigint").alias("bpe_est"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str, round_to: int = 4) -> DataFrame:
    """Length / alpha-ratio / mean-word-length / stopword-ratio quality
    signals, one projection."""
    words = F.split(F.col(text_col), " ")
    n_tokens = F.size(words)
    n_chars = F.length(text_col)
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", ""))
    stop = F.size(
        F.filter(words, lambda w: w.isin("the", "a", "and", "of", "to", "in"))
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(alpha.cast("double") / n_chars, round_to).alias("alpha_ratio"),
        F.round((n_chars - n_tokens + 1).cast("double") / n_tokens, round_to).alias(
            "mean_word_len"
        ),
        F.round(stop.cast("double") / n_tokens, round_to).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language scoring: count hits per language's marker set,
    predict the argmax (ties broken by language order), 'und' when no hits.
    Heuristic n-gram language-ID re-expressed as pure column math."""
    words = F.split(F.col(text_col), " ")

    def score(markers):
        # single-arg lambda (pyspark treats 2-arg lambdas as (elem, idx))
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    scores = {lang: score(markers) for lang, markers in LANG_MARKERS.items()}
    best = None
    pred = F.lit("und")
    # evaluate in reverse so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        s = scores[lang]
        if best is None:
            best = s
            pred = F.when(s > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            pred = F.when((s > 0) & (s >= best), F.lit(lang)).otherwise(pred)
            best = F.greatest(s, best)
    return df.select(F.col(id_col), pred.alias("lang_pred"))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    word set (bag-of-words canonical form; catches shuffled duplicates)."""
    canon = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))), " "
    )
    return df.select(F.col(id_col), F.md5(canon).alias("fp"))
