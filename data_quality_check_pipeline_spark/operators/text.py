"""Text analysis operators: token counting, quality scoring, SQL-expressible
language guessing, document fingerprinting.

These are the pure-Column text utilities a training-data pipeline needs on
top of the UDF scorers (udfs/langid.py, udfs/perplexity.py): everything here
is SQL-expressible (and oracle-checked against DuckDB in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import norm_text, null_or_empty
from ..udfs.lexicon import LANGS, WORDS

# BPE-ish word-piece pattern: words / numbers / single non-space symbols —
# the common pre-tokenizer shape (public GPT-2-style pre-tokenization regex
# family), restricted to an RE2/Java-compatible subset.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    t = norm_text(col)
    return F.when(
        F.length(t) == 0, F.lit(0)
    ).otherwise(F.array_size(F.split(t, " "))).cast("int")


def bpe_token_count(c: Column | str) -> Column:
    """Count of BPE-ish word pieces via regexp_count — one codegen pass."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_count(col, F.lit(TOKEN_RE)).cast("int")


def quality_score_expr(c: Column | str) -> Column:
    """Heuristic quality score in [0,1]: blend of length band, alpha ratio,
    low symbol density, and word-length sanity. Pure Column arithmetic."""
    col = F.col(c) if isinstance(c, str) else c
    t = norm_text(col)
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z ]", "")).cast("double")
    sym = F.length(F.regexp_replace(t, r"[A-Za-z0-9 ]", "")).cast("double")
    words = F.array_size(F.split(t, " ")).cast("double")
    avg_word = (n - words + 1.0) / words
    len_band = F.least(n / F.lit(200.0), F.lit(1.0))
    alpha_ratio = alpha / F.greatest(n, F.lit(1.0))
    sym_penalty = F.lit(1.0) - F.least(
        sym / F.greatest(n, F.lit(1.0)) * 3.0, F.lit(1.0)
    )
    word_sanity = F.when(
        avg_word.between(2.0, 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    score = (
        len_band * 0.25 + alpha_ratio * 0.35 + sym_penalty * 0.25
        + word_sanity * 0.15
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(F.round(score, 6))


# top distinctive stopwords per language for the SQL-expressible guesser
_GUESS_WORDS = {lang: WORDS[lang][:12] for lang in LANGS}


def _stopword_hits(c: Column, lang: str) -> Column:
    pat = r"\b(" + "|".join(_GUESS_WORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat)).cast("double")


def lang_guess_expr(c: Column | str) -> Column:
    """SQL-expressible langid: argmax of per-language stopword hit counts
    (the heuristic baseline under the UDF scorer; ties -> first language in
    LANGS order, no-hits -> NULL). regexp_count keeps it one codegen pass."""
    col = F.col(c) if isinstance(c, str) else c
    hits = [_stopword_hits(col, lang) for lang in LANGS]
    best = F.greatest(*hits)
    expr = F.lit(None).cast("string")
    for lang, h in zip(reversed(LANGS), reversed(hits)):
        expr = F.when(h == best, F.lit(lang)).otherwise(expr)
    return F.when(best <= 0, F.lit(None).cast("string")).otherwise(expr)


STOPWORDS = sorted({w for ws in _GUESS_WORDS.values() for w in ws})


def stopword_ratio_expr(c: Column | str) -> Column:
    """Fraction of tokens that ARE (any-language) stopwords — the classic
    fluency signal: natural prose sits around 0.3-0.6, keyword spam and
    gibberish near 0. Token MEMBERSHIP, not substring regex hits: a regex
    count over the raw text can exceed the token count ("and/or" is one
    token with two stopword matches), pushing the "fraction" above 1.0
    and breaking any threshold built on it."""
    col = F.col(c) if isinstance(c, str) else c
    toks = F.split(norm_text(F.lower(col)), " ")
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("double")
    n = F.array_size(toks).cast("double")
    return F.when(
        null_or_empty(col) | (n <= 0), F.lit(0.0)
    ).otherwise(F.round(hits / n, 6))


def doc_fingerprint(c: Column | str) -> Column:
    """Deterministic 64-bit content fingerprint of the normalized text
    (rolling-hash family; xxhash64 JVM-side)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.xxhash64(norm_text(F.lower(col)))


def with_text_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach the full text-analysis bundle in one projection."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "ws_tokens": whitespace_token_count(c),
            "bpe_tokens": bpe_token_count(c),
            "quality_score": quality_score_expr(c),
            "lang_guess": lang_guess_expr(c),
            "stopword_ratio": stopword_ratio_expr(c),
            "fingerprint": doc_fingerprint(c),
        }
    )
