"""KenLM-style char-trigram perplexity scorer as a vectorized pandas UDF.

Model: one hashed char-trigram language model over ALL supported languages
(add-k smoothed), built deterministically per process from the shared word
inventories. Score = mean negative log-probability (cross-entropy, nats) of
a transcript's trigrams — low for well-formed text in a supported language,
high for gibberish / corrupted transcripts. The keep/drop gate compares
against ``PPL_MAX`` in operators/validate.py.

Same vectorization + determinism contract as langid.py: one fancy index +
one reduceat per batch; per-row results independent of batch boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import FloatType

from .langid import _training_corpus  # same deterministic corpus
from .lexicon import LANGS
from .ngram import N_BUCKETS, encode_batch, trigram_hashes, row_sums

_SEED = 2024
_SMOOTH_K = 0.1

_MODEL: "PerplexityModel | None" = None

# score assigned to rows with no trigram signal (null/too-short): worst-case
_EMPTY_SCORE = np.float32(np.log(N_BUCKETS))  # ≈ 12.45 nats


class PerplexityModel:
    """neg log P(bucket) table, shape (N_BUCKETS,) float32."""

    def __init__(self) -> None:
        from .langid import _load_or_build

        cache = f"/tmp/spark_graft_models/ppl_v2_{_SEED}_{N_BUCKETS}.npy"
        self.neg_log_probs = _load_or_build(cache, self._build)

    @staticmethod
    def _build() -> np.ndarray:
        rng = np.random.RandomState(_SEED)
        counts = np.zeros(N_BUCKETS, dtype=np.int64)
        for lang in LANGS:
            sents = _training_corpus(lang, rng)
            big, lengths = encode_batch(sents)
            hashes, _ = trigram_hashes(big, lengths)
            counts += np.bincount(hashes, minlength=N_BUCKETS)
        probs = (counts + _SMOOTH_K) / (counts.sum() + _SMOOTH_K * N_BUCKETS)
        return (-np.log(probs)).astype(np.float32)

    def score(self, texts) -> np.ndarray:
        big, lengths = encode_batch(texts)
        hashes, row_ids = trigram_hashes(big, lengths)
        return self.score_from_hashes(hashes, row_ids, int(lengths.size))

    def score_from_hashes(self, hashes, row_ids, n_rows: int) -> np.ndarray:
        """Score from precomputed trigram hashes (see
        LangIdModel.score_from_hashes — the fused-UDF tokenization-sharing
        contract). Identical arithmetic to score()."""
        if hashes.size == 0:
            return np.full(n_rows, _EMPTY_SCORE, dtype=np.float32)
        vals = self.neg_log_probs[hashes]
        sums, counts = row_sums(vals, row_ids, n_rows)
        out = np.full(n_rows, float(_EMPTY_SCORE), dtype=np.float64)
        has = counts > 0
        out[has] = sums[has] / counts[has]
        return out.astype(np.float32)


def get_model() -> PerplexityModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = PerplexityModel()
    return _MODEL


def score_texts(texts) -> np.ndarray:
    """Shared entry used by BOTH the Spark UDF and the oracle."""
    return get_model().score(list(texts))


@pandas_udf(FloatType())
def perplexity_udf(transcript: pd.Series) -> pd.Series:
    return pd.Series(score_texts(transcript))


def with_perplexity(df, transcript: str = "transcript", out: str = "ppl"):
    return df.withColumn(out, perplexity_udf(F.col(transcript)))
