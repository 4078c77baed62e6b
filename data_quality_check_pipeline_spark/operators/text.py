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


def _nonempty_lines(c: Column) -> Column:
    """Trimmed non-empty lines of the RAW text (norm_text collapses
    newlines, so line structure must be read before normalizing)."""
    return F.filter(
        F.transform(F.split(c, "\n"), F.trim),
        lambda l: l != "",
    )


def dup_line_fraction_expr(c: Column | str) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier
    line (Gopher-family boilerplate signal: nav menus, repeated
    headers/footers and templated pages repeat lines; prose doesn't).
    1 - distinct/total over trimmed non-empty lines; 0.0 for missing
    text or single-line docs (no line structure = no evidence)."""
    col = F.col(c) if isinstance(c, str) else c
    lines = _nonempty_lines(col)
    n = F.array_size(lines).cast("double")
    d = F.array_size(F.array_distinct(lines)).cast("double")
    return F.when(
        null_or_empty(col) | (n <= 0), F.lit(0.0)
    ).otherwise(F.round(F.lit(1.0) - d / n, 6))


def bullet_line_fraction_expr(c: Column | str) -> Column:
    """Fraction of non-empty lines starting with a bullet marker
    (-, *, •). List-dominated pages carry little training-quality
    prose; Gopher drops docs above ~0.9."""
    col = F.col(c) if isinstance(c, str) else c
    lines = _nonempty_lines(col)
    n = F.array_size(lines).cast("double")
    hits = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[-*•]"))
    ).cast("double")
    return F.when(
        null_or_empty(col) | (n <= 0), F.lit(0.0)
    ).otherwise(F.round(hits / n, 6))


def ellipsis_line_fraction_expr(c: Column | str) -> Column:
    """Fraction of non-empty lines ending in an ellipsis ('...' or
    '…') — truncated-snippet boilerplate (search results, teaser
    feeds); Gopher drops docs above ~0.3."""
    col = F.col(c) if isinstance(c, str) else c
    lines = _nonempty_lines(col)
    n = F.array_size(lines).cast("double")
    hits = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
    ).cast("double")
    return F.when(
        null_or_empty(col) | (n <= 0), F.lit(0.0)
    ).otherwise(F.round(hits / n, 6))


def mean_word_length_expr(c: Column | str) -> Column:
    """Mean whitespace-token length in characters (Gopher keeps docs
    in the ~[3,10] band: lower is symbol soup / OCR noise, higher is
    concatenated junk or DNA-like strings). 0.0 for missing text."""
    col = F.col(c) if isinstance(c, str) else c
    t = norm_text(col)
    n = F.length(t).cast("double")
    words = F.array_size(F.split(t, " ")).cast("double")
    return F.when(
        null_or_empty(col) | (words <= 0), F.lit(0.0)
    ).otherwise(F.round((n - words + 1.0) / words, 6))


def alpha_word_fraction_expr(c: Column | str) -> Column:
    """Fraction of whitespace tokens containing at least one ASCII
    letter (Gopher requires ~0.8: pages of numbers, markup or
    separators carry no language). 0.0 for missing text."""
    col = F.col(c) if isinstance(c, str) else c
    toks = F.split(norm_text(col), " ")
    n = F.array_size(toks).cast("double")
    hits = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("double")
    return F.when(
        null_or_empty(col) | (n <= 0), F.lit(0.0)
    ).otherwise(F.round(hits / n, 6))


def top_ngram_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    out_col: str = "top_ngram_frac",
) -> DataFrame:
    """Token share of the most frequent word n-gram per document
    (Gopher-family repetition signal: a page whose top bigram covers
    20%+ of its tokens is templated/spammy) -> (id_col, out_col) with
    out_col = occurrences(top n-gram) * n / token_count, 0.0 when the
    doc has fewer than n tokens or missing text.

    NOT a pure projection: per-row mode-finding via nested
    higher-order-function lambdas runs interpreted (the measured 27x
    trap, DESIGN.md/CLAUDE.md), so this takes the explode+groupBy
    shape the minhash signatures use — n-gram rows shuffle on
    (id, gram) for the partial-agg count, then (id) for the max.
    Token-level row volume is the same scale the dedup shingle
    pipeline already carries at 100 TB. Deterministic: ties collapse
    under max(), no ordering dependence."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    c = F.col(text_col)
    toks = F.split(norm_text(F.lower(c)), " ")
    base = df.select(
        F.col(id_col),
        F.when(null_or_empty(c), F.array().cast("array<string>"))
        .otherwise(toks)
        .alias("__toks"),
    ).withColumn("__n_toks", F.array_size(F.col("__toks")))
    grams = base.select(
        id_col,
        "__n_toks",
        F.explode(
            F.when(
                F.col("__n_toks") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.col("__n_toks") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("__toks"), i, n)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("__gram"),
    )
    counts = grams.groupBy(id_col, "__n_toks", "__gram").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    top = counts.groupBy(id_col, "__n_toks").agg(
        F.max("__cnt").alias("__top")
    )
    scored = top.select(
        id_col,
        F.round(
            F.col("__top").cast("double") * n
            / F.col("__n_toks").cast("double"),
            6,
        ).alias(out_col),
    )
    # docs with < n tokens emit no gram rows: restore them at 0.0 via
    # a left join from the full id set (broadcast-unfriendly at scale,
    # but it's an id->id equi-join — the cheapest possible shape)
    return (
        base.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col, F.coalesce(F.col(out_col), F.lit(0.0)).alias(out_col))
    )


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
            "dup_line_frac": dup_line_fraction_expr(c),
            "bullet_line_frac": bullet_line_fraction_expr(c),
            "ellipsis_line_frac": ellipsis_line_fraction_expr(c),
            "mean_word_len": mean_word_length_expr(c),
            "alpha_word_frac": alpha_word_fraction_expr(c),
        }
    )
