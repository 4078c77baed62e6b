"""fastText-style language identification as a vectorized Arrow pandas UDF.

Model: hashed char-trigram bag -> per-language log-probability table
(add-k smoothed multinomial over N_BUCKETS hashed trigrams), trained once
per process on a deterministic seeded corpus sampled from the shared
per-language word inventories (`lexicon.py`). Scoring a batch is one fancy
index + one ``np.add.reduceat`` + one softmax — no per-row Python.

Determinism: per-row scores depend only on that row's bytes (reduceat
segments), so results are identical across Arrow batch sizes, partitionings,
and executor counts. Weights are built lazily once per executor process
(module-level singleton), mirroring the broadcast-weights pattern for real
fastText checkpoints.

Reference parity: replaces the per-row Python predicate loops of
/root/reference/src/validator.py with a batched scorer; the reference has no
langid — this is the graft capability from BASELINE.json north_rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyspark.sql.types import (
    FloatType,
    StringType,
    StructField,
    StructType,
)

from .lexicon import LANGS, WORDS
from .ngram import N_BUCKETS, encode_batch, trigram_hashes

_SEED = 1337
_TRAIN_SENTENCES = 4000
_SENT_LEN = 12
_SMOOTH_K = 0.5

_MODEL: "LangIdModel | None" = None

# Weight cache: in production the trained table ships as a broadcast /
# --py-files resource; here each executor host builds it once and mmaps it
# afterwards (version-keyed; includes all build parameters).
_CACHE = (
    f"/tmp/spark_graft_models/langid_v2_{_SEED}_{_TRAIN_SENTENCES}_"
    f"{_SENT_LEN}_{N_BUCKETS}.npy"
)


def _load_or_build(cache: str, build) -> np.ndarray:
    import os

    if os.path.exists(cache):
        try:
            return np.load(cache, mmap_mode="r")
        except (OSError, ValueError):
            pass
    arr = build()
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = f"{cache}.{os.getpid()}.tmp.npy"  # np.save appends .npy otherwise
    np.save(tmp, arr)
    os.replace(tmp, cache)
    return arr


def _training_corpus(lang: str, rng: np.random.RandomState) -> list[str]:
    words = WORDS[lang]
    # Zipf-ish rank weights over the inventory — mirrors natural usage.
    ranks = np.arange(1, len(words) + 1, dtype=np.float64)
    p = (1.0 / ranks) / np.sum(1.0 / ranks)
    idx = rng.choice(len(words), size=(_TRAIN_SENTENCES, _SENT_LEN), p=p)
    arr = np.array(words, dtype=object)
    return [" ".join(arr[row]) for row in idx]


class LangIdModel:
    """log P(bucket | lang) table, shape (N_BUCKETS, n_langs) float32."""

    def __init__(self) -> None:
        self.log_probs = _load_or_build(_CACHE, self._build)

    @staticmethod
    def _build() -> np.ndarray:
        rng = np.random.RandomState(_SEED)
        table = np.zeros((N_BUCKETS, len(LANGS)), dtype=np.float64)
        for j, lang in enumerate(LANGS):
            sents = _training_corpus(lang, rng)
            big, lengths = encode_batch(sents)
            hashes, _ = trigram_hashes(big, lengths)
            counts = np.bincount(hashes, minlength=N_BUCKETS)
            probs = (counts + _SMOOTH_K) / (
                counts.sum() + _SMOOTH_K * N_BUCKETS
            )
            table[:, j] = np.log(probs)
        return table.astype(np.float32)

    def score(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Return (lang index int64, confidence float32) per row."""
        big, lengths = encode_batch(texts)
        hashes, row_ids = trigram_hashes(big, lengths)
        return self.score_from_hashes(
            texts, hashes, row_ids, int(lengths.size)
        )

    def score_from_hashes(
        self, texts, hashes, row_ids, n_rows: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Score from precomputed trigram hashes — the shared-tokenization
        entry the fused langid+perplexity UDF uses so one encode_batch +
        trigram_hashes pass feeds both models (udfs/textscore.py).
        Identical arithmetic to score(); score() is just encode + this."""
        scores = np.zeros((n_rows, len(LANGS)), dtype=np.float64)
        if hashes.size:
            vals = self.log_probs[hashes].astype(np.float64)  # (T, L)
            change = np.flatnonzero(np.diff(row_ids)) + 1
            starts = np.concatenate(([0], change))
            present = row_ids[starts]
            seg = np.add.reduceat(vals, starts, axis=0)
            seg_n = np.diff(np.concatenate((starts, [row_ids.size])))
            scores[present] = seg / seg_n[:, None]  # mean log-prob per lang
        # softmax over mean log-probs, temperature tuned for char trigrams
        z = scores - scores.max(axis=1, keepdims=True)
        e = np.exp(z * 8.0)
        probs = e / e.sum(axis=1, keepdims=True)
        lang_idx = probs.argmax(axis=1)
        conf = probs[np.arange(n_rows), lang_idx].astype(np.float32)
        # rows with no trigram signal -> unknown (idx -1, conf 0)
        empty = np.asarray(
            [t is None or len((t or "").strip()) < 3 for t in texts]
        )
        lang_idx = np.where(empty, -1, lang_idx)
        conf = np.where(empty, np.float32(0.0), conf)
        return lang_idx, conf


def get_model() -> LangIdModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = LangIdModel()
    return _MODEL


def classify(texts) -> pd.DataFrame:
    """Shared scoring entry used by BOTH the Spark UDF and the oracle."""
    model = get_model()
    idx, conf = model.score(list(texts))
    langs = np.array(LANGS + [None], dtype=object)
    return pd.DataFrame(
        {"lang": langs[idx], "lang_conf": conf.astype(np.float32)}
    )


LANGID_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("lang_conf", FloatType()),
    ]
)


@pandas_udf(LANGID_SCHEMA)
def langid_udf(transcript: pd.Series) -> pd.DataFrame:
    return classify(transcript)


def with_langid(df, transcript: str = "transcript"):
    """Attach lang/lang_conf columns.

    The struct-valued UDF is materialized ONCE into a temp column and then
    field-extracted, guaranteeing a single Arrow round-trip (no reliance on
    CSE of duplicated Python UDF expressions).
    """
    return (
        df.withColumn("_lid", langid_udf(F.col(transcript)))
        .withColumns(
            {
                "lang": F.col("_lid.lang"),
                "lang_conf": F.col("_lid.lang_conf"),
            }
        )
        .drop("_lid")
    )


def langid_cols(transcript: str = "transcript") -> Column:
    return langid_udf(F.col(transcript))
