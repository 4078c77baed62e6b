"""Fused langid + perplexity scorer: ONE pandas UDF, one Arrow round
trip, one tokenization.

langid and perplexity score the SAME char-trigram hashes of the SAME
transcript column; as separate UDFs each pays its own transcript
serialization across the JVM→Python boundary and its own encode_batch +
trigram_hashes pass (the dominant Python-side cost — the model lookups
are fancy-indexed table reads). Fusing them halves both (guide §4.1:
you control how many columns cross and how often; r06 measurement:
langid-only and ppl-only stages each added ~0.45 s per 60k-clip pass —
the fused stage pays that once).

Bit-identity contract: both models expose ``score_from_hashes`` and
their standalone ``score`` entries are encode + that same function, so
the fused output equals running the two original UDFs (pinned by
test_udfs parity tests). The standalone ``langid_udf`` /
``perplexity_udf`` remain for callers scoring only one signal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    FloatType,
    StringType,
    StructField,
    StructType,
)

from .langid import LANGS
from .langid import get_model as get_langid_model
from .ngram import encode_batch, trigram_hashes
from .perplexity import get_model as get_ppl_model

TEXTSCORE_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("lang_conf", FloatType()),
        StructField("ppl", FloatType()),
    ]
)


def classify_and_score(texts) -> pd.DataFrame:
    """Shared entry (Spark UDF + tests): one encode/hash pass feeding
    both models' score_from_hashes."""
    lid = get_langid_model()
    pplm = get_ppl_model()
    texts = list(texts)
    big, lengths = encode_batch(texts)
    n_rows = int(lengths.size)
    hashes, row_ids = trigram_hashes(big, lengths)
    idx, conf = lid.score_from_hashes(texts, hashes, row_ids, n_rows)
    ppl = pplm.score_from_hashes(hashes, row_ids, n_rows)
    langs = np.array(LANGS + [None], dtype=object)
    return pd.DataFrame(
        {
            "lang": langs[idx],
            "lang_conf": conf.astype(np.float32),
            "ppl": ppl,
        }
    )


@pandas_udf(TEXTSCORE_SCHEMA)
def langid_ppl_udf(transcript: pd.Series) -> pd.DataFrame:
    return classify_and_score(transcript)


def with_text_scores(df, transcript: str = "transcript"):
    """Attach lang / lang_conf / ppl in one Arrow round trip. The
    struct-valued UDF is materialized ONCE into a temp column and
    field-extracted (with_langid's single-evaluation discipline)."""
    return (
        df.withColumn("_lp", langid_ppl_udf(F.col(transcript)))
        .withColumns(
            {
                "lang": F.col("_lp.lang"),
                "lang_conf": F.col("_lp.lang_conf"),
                "ppl": F.col("_lp.ppl"),
            }
        )
        .drop("_lp")
    )
