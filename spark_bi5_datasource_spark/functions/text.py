"""Text-analysis column functions (north-star operators, SURVEY §2
Tier C).  Everything is a Catalyst expression — no Python UDFs — so
these run JVM-side inside whole-stage codegen and scale to 100 TB of
documents without an Arrow boundary.

Each helper returns a Column so callers compose them into selects;
the same formulas are mirrored in the DuckDB oracle SQL (plans/
llm_ops.py) for hash-checked correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "avg_token_len",
    "punct_ratio",
    "stopword_ratio",
    "uppercase_ratio",
    "quality_score",
    "lang_scores",
    "lang_id",
    "doc_fingerprint",
    "STOPWORDS",
]

# Minimal per-language stopword lists for the n-gram/stopword language
# heuristic.  Deliberately tiny and fixed: the heuristic (not the
# list) is the operator under test.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pas"],
    "es": ["el", "los", "las", "y", "es", "una", "que", "no"],
    "zh": ["的", "是", "了", "在", "我", "有", "他", "这"],
}

_ENGLISH_STOPWORDS = STOPWORDS["en"]


def _tokens(text_col: str) -> str:
    return f"split({text_col}, ' ')"


def token_count(text_col: str) -> Column:
    """Whitespace token count."""
    return F.expr(f"size({_tokens(text_col)})")


# BPE-style pre-tokenizer classes (simplified GPT-2 shape, kept to
# constructs whose semantics are identical in Java regex (Spark) and
# RE2 (DuckDB) so the oracle can mirror it): runs of letters, single
# digits, runs of other non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_ish_token_count(text_col: str) -> Column:
    """Approximate LLM token count: matches of a BPE-ish pre-tokenizer
    regex (letters-run | digit | symbol-run) — the cheap, deterministic
    stand-in for a real tokenizer when budgeting corpus token counts.

    The pattern is passed as a literal Column, not an SQL string —
    Spark's SQL literal parser strips unrecognized escapes (``\\s`` →
    ``s``), which would corrupt the character class."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def avg_token_len(text_col: str) -> Column:
    t = _tokens(text_col)
    return F.expr(f"aggregate({t}, 0D, (acc, x) -> acc + length(x)) / size({t})")


def punct_ratio(text_col: str) -> Column:
    """Punctuation chars / total chars."""
    return F.expr(
        f"length(regexp_replace({text_col}, '[^.,;:!?\\'\"()-]', '')) "
        f"/ greatest(length({text_col}), 1)"
    )


def uppercase_ratio(text_col: str) -> Column:
    return F.expr(
        f"length(regexp_replace({text_col}, '[^A-Z]', '')) / greatest(length({text_col}), 1)"
    )


def stopword_ratio(text_col: str, stopwords: list[str] | None = None) -> Column:
    words = stopwords or _ENGLISH_STOPWORDS
    lst = ", ".join(f"'{w}'" for w in words)
    t = _tokens(text_col)
    return F.expr(
        f"size(filter({t}, x -> lower(x) IN ({lst}))) / cast(size({t}) AS double)"
    )


def quality_score(text_col: str) -> Column:
    """Composite quality heuristic in [0, 1]: favors mid-length docs,
    low punctuation noise, presence of stopwords (prose-likeness).
    Mirrors common LLM-corpus filters (C4/Gopher-style rules) with a
    deterministic closed-form score."""
    n_tok = token_count(text_col)
    length_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(text_col) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text_col) * 4, F.lit(1.0))
    return F.round(
        length_score * 0.4 + punct_pen * 0.3 + stop_score * 0.3, 6
    )


def lang_scores(text_col: str) -> dict[str, Column]:
    """Per-language stopword hit counts over the token list."""
    t = _tokens(text_col)
    out = {}
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        out[lang] = F.expr(f"size(filter({t}, x -> lower(x) IN ({lst})))")
    return out


def lang_id(text_col: str) -> Column:
    """Stopword-vote language ID: the language with the highest hit
    count wins; ties and all-zero rows resolve to 'und' / first
    alphabetically.  Deterministic so the oracle can mirror it."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # Evaluate in reverse-alphabetical order so the alphabetically
    # first language wins ties (last WHEN evaluated first below).
    for lang in sorted(scores, reverse=True):
        result = F.when(scores[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best > 0, result).otherwise(F.lit("und"))


# Modulus for the rolling fingerprint: keeps 33*h + codepoint and
# 31*h + token_hash below 2^63, so the fold is exact BIGINT
# arithmetic in both Spark and DuckDB (no overflow, no ANSI trap).
FP_MOD = 1_000_000_000_000


def doc_fingerprint(text_col: str) -> Column:
    """Order-sensitive rolling polynomial fingerprint: fold each
    token's unicode codepoints (base 33), then chain token hashes
    (base 31), all mod 1e12.  Pure integer arithmetic with an exact
    DuckDB twin (list_reduce + unicode()), unlike the earlier
    xxhash64 chain which had no cross-engine oracle."""
    return F.expr(
        f"aggregate({_tokens(text_col)}, 0L, (h, tk) -> "
        f"pmod(h * 31 + aggregate(regexp_extract_all(tk, '(?s).', 0), 0L, "
        f"(a, c) -> pmod(a * 33 + ascii(c), {FP_MOD})), {FP_MOD}))"
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full stat set."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("avg_token_len", F.round(avg_token_len(text_col), 6))
        .withColumn("punct_ratio", F.round(punct_ratio(text_col), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(text_col), 6))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("fingerprint", doc_fingerprint(text_col))
    )
