"""Generate committed golden tables for the harness queries DuckDB cannot
express (xxhash64 signatures; UDF-scored clips corpus).

The goldens are computed by INDEPENDENT pure-Python implementations:

* doc_minhash_pairs / doc_simhash_pairs — pandas + oracle_hash.spark_xxhash64
  (the pure-Python XXH64 whose parity with F.xxhash64 is pytest-asserted),
  re-deriving the minhash/simhash semantics from scratch (no Spark).
* clips_keep_stats / clips_reason_histogram / clips_langid_distribution —
  oracle.run_oracle, the pure-pandas pipeline reimplementation.

As a guard the tool ALSO runs the Spark harness queries and refuses to
write a golden that disagrees — a mismatch means one side has a bug and
must be fixed, not frozen.

Usage: python tools/make_goldens.py [sf_dir ...]
       (default: /root/testdata/sf0.01 AND /root/testdata/sf0.1 ->
        tools/goldens_sf001.json / tools/goldens_sf01.json)

Each file is stamped with a sha256 fingerprint of the documents parquet
it derives from; consumers (tools/check_entry.py) refuse a golden whose
fingerprint no longer matches the corpus on disk.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from data_quality_check_pipeline_spark.oracle_hash import (  # noqa: E402
    Int32,
    spark_xxhash64,
)

DEFAULT_SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def golden_path(sf_dir: str) -> str:
    """tools/goldens_<tag>.json — sf0.01 -> sf001 (the historical name),
    sf0.1 -> sf01."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "")
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"goldens_{tag}.json"
    )


def corpus_fingerprint(sf_dir: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(f"{sf_dir}/documents.parquet", "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:16]

_WS = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII
_M64 = (1 << 64) - 1


def _norm_lower(t) -> str | None:
    if t is None or (isinstance(t, float) and pd.isna(t)):
        return None
    return _WS.sub(" ", str(t).lower().strip())


def minhash_pairs_py(
    docs: pd.DataFrame, n_hashes=32, bands=8, shingle_k=3, min_est=0.5
) -> list[tuple]:
    """Re-derivation of operators.dedup.minhash_lsh_pairs semantics."""
    rows_per_band = n_hashes // bands
    sigs: dict[int, list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        norm = _norm_lower(text)
        if norm is None:
            # Spark: the toks.isNotNull() guard makes the shingle array
            # NULL and explode() drops the doc — null text produces NO
            # signature and joins no candidate pair
            continue
        else:
            toks = norm.split(" ")
            if len(toks) >= shingle_k:
                sh = {
                    spark_xxhash64(toks[i:i + shingle_k])
                    for i in range(len(toks) - shingle_k + 1)
                }
            else:
                sh = {spark_xxhash64(toks)}
        sig = [
            min(spark_xxhash64(h, Int32(i)) for h in sh)
            for i in range(n_hashes)
        ]
        sigs[int(doc_id)] = sig
    # banded buckets
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            key = ",".join(
                str(sig[b * rows_per_band + r]) for r in range(rows_per_band)
            )
            bh = spark_xxhash64(key, Int32(b))
            buckets.setdefault((b, bh), []).append(doc_id)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(pairs):
        est = sum(
            1 for x, y in zip(sigs[a], sigs[b]) if x == y
        ) / float(n_hashes)
        if est >= min_est:
            out.append((a, b, est))
    return out


def simhash_pairs_py(
    docs: pd.DataFrame, max_hamming=3, chunks=4
) -> list[tuple]:
    """Re-derivation of operators.dedup.simhash_pairs semantics."""
    sigs: dict[int, int] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        norm = _norm_lower(text)
        toks = [] if norm is None else list(dict.fromkeys(norm.split(" ")))
        if not toks:
            continue  # explode of empty/null array emits no rows -> no group
        sums = [0] * 64
        for t in toks:
            h = spark_xxhash64(t)  # signed; >> is arithmetic in both langs
            for b in range(64):
                sums[b] += ((h >> b) & 1) * 2 - 1
        sig = 0
        for b in range(64):
            if sums[b] > 0:
                sig |= 1 << b
        if sig >= 1 << 63:
            sig -= 1 << 64  # Java long wrap (shiftleft into the sign bit)
        sigs[int(doc_id)] = sig
    width = 64 // chunks
    mask = (1 << width) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for i in range(chunks):
            buckets.setdefault(
                (i, (sig >> (i * width)) & mask), []
            ).append(doc_id)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(pairs):
        ham = bin((sigs[a] ^ sigs[b]) & _M64).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return out


def audio_fp_neardup_py(
    clips: pd.DataFrame, max_hamming=6, chunks=8
) -> list[tuple]:
    """Re-derivation of the clips_audio_neardup harness query: full-payload
    fingerprints (udfs.audio.fingerprint_batch — the oracle path, mirroring
    stats_batch), collapsed to distinct signatures with group sizes, then
    chunk-banded hamming pairs over the distinct signatures."""
    from data_quality_check_pipeline_spark.udfs.audio import (
        fingerprint_batch,
    )

    fps = fingerprint_batch(
        clips["bytes"].tolist(), clips["codec"].tolist()
    )
    counts: dict[int, int] = {}
    for fp in fps:
        if fp:
            counts[int(fp)] = counts.get(int(fp), 0) + 1
    width = 64 // chunks
    mask = (1 << width) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for sig in counts:
        u = sig & _M64
        for c in range(chunks):
            buckets.setdefault((c, (u >> (c * width)) & mask), []).append(
                sig
            )
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(ids)
        pairs.update(
            (ids[i], ids[j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        )
    out = []
    for a, b in sorted(pairs):
        ham = bin((a ^ b) & _M64).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham, counts[a], counts[b]))
    return out


def dsir_select_py(
    docs: pd.DataFrame, n_keep=150, ks=(1, 2), n_features=512,
    lam=1.0, seed=0,
) -> list[int]:
    """Re-derivation of the doc_dsir_select harness query
    (operators/selection.py importance_resample, mode=top_k): hashed
    n-gram bag models target-vs-corpus, per-doc log-likelihood-ratio
    weights, deterministic Gumbel top-k. Constants mirror the harness
    query exactly."""
    import math
    from collections import Counter

    buckets = 1 << 20  # sampling._BUCKETS

    def feats(text) -> list[int]:
        norm = _norm_lower(text)
        if norm is None:
            return []
        toks = norm.split(" ")
        out = []
        for k in ks:
            grams = (
                [toks[i:i + k] for i in range(len(toks) - k + 1)]
                if len(toks) >= k
                else [toks]
            )
            for g in grams:
                out.append(
                    spark_xxhash64(list(g), "dsir_feat") % n_features
                )
        return out

    doc_feats: dict[int, list[int]] = {}
    tc: Counter = Counter()
    cc: Counter = Counter()
    for doc_id, text, lang in zip(
        docs["doc_id"], docs["text"], docs["lang"]
    ):
        f = feats(text)
        doc_feats[int(doc_id)] = f
        cc.update(f)
        if lang == "en" and int(doc_id) < 100:
            tc.update(f)
    dt = sum(tc.values()) + lam * n_features
    dc = sum(cc.values()) + lam * n_features
    lr = {
        f: math.log((tc.get(f, 0) + lam) / dt)
        - math.log((cc.get(f, 0) + lam) / dc)
        for f in set(tc) | set(cc)
    }
    keyed = []
    for doc_id, f in doc_feats.items():
        if not f:
            continue  # null text: no features, excluded from selection
        logw = sum(lr[x] for x in f)
        h = spark_xxhash64(doc_id, "dsir_gumbel", seed)
        u = ((h % buckets) + 0.5) / buckets
        keyed.append((-(logw - math.log(-math.log(u))), doc_id))
    return sorted(d for _, d in sorted(keyed)[:n_keep])


def stratified_sample_py(docs: pd.DataFrame) -> list[tuple]:
    """Re-derivation of the doc_stratified_sample harness query:
    operators.sampling.stratified_sample + with_split with the
    __spark_entry__ constants — hash fraction = pmod(xxhash64(doc_id,
    seed), 2^20) / 2^20, per-lang rate threshold, cumulative split
    bands in insertion order."""
    import __spark_entry__ as entry

    B = 1 << 20
    names = list(entry.SPLIT_FRACTIONS)
    out = []
    for doc_id, lang in zip(docs["doc_id"], docs["lang"]):
        if lang is None or (isinstance(lang, float) and pd.isna(lang)):
            rate, lang_out = entry.SAMPLE_DEFAULT_RATE, None
        else:
            lang_out = str(lang)
            rate = entry.SAMPLE_RATES.get(
                lang_out, entry.SAMPLE_DEFAULT_RATE
            )
        frac = (spark_xxhash64(int(doc_id), entry.SAMPLE_SEED) % B) / B
        if not frac < rate:
            continue
        # with_split domain-separates its hash ('split' folds before
        # the seed) so equal sample/split seeds stay independent
        sfrac = (
            spark_xxhash64(int(doc_id), "split", entry.SPLIT_SEED) % B
        ) / B
        split = names[-1]
        hi = 0.0
        for name in names[:-1]:
            hi += entry.SPLIT_FRACTIONS[name]
            if sfrac < hi:
                split = name
                break
        out.append((int(doc_id), lang_out, split))
    return sorted(out)


def clips_goldens_py() -> dict:
    """clips_* goldens from the pure-pandas oracle over the same synthetic
    corpus the harness queries use."""
    import __spark_entry__ as entry
    from data_quality_check_pipeline_spark.oracle import run_oracle
    from data_quality_check_pipeline_spark.synth import write_corpus

    path = os.path.join(
        entry._CLIPS_CACHE_DIR, f"n{entry._CLIPS_N}", "clips.parquet"
    )
    if not os.path.exists(path):
        write_corpus(os.path.dirname(path), entry._CLIPS_N)
    pdf = pd.read_parquet(path)
    orc = run_oracle(pdf)
    # activity-signal aggregates (integer-exact: silence_frac is a
    # float32 multiple of 1/_N_WINDOWS; dyn_range_db is bit-identical to
    # the Spark path via the shared _reduce_windows — see the harness
    # query's comment)
    from data_quality_check_pipeline_spark.udfs.audio import stats_batch

    astats = stats_batch(list(pdf["bytes"]), list(pdf["codec"]))
    silent_windows = int(
        (astats["silence_frac"].to_numpy() * 4).round().sum()
    )
    dyn_floor_sum = int(
        np.floor(astats["dyn_range_db"].to_numpy()).sum()
    )
    keep_stats = [[
        int(len(orc)), int(orc["keep"].sum()), silent_windows,
        dyn_floor_sum,
    ]]
    reasons: dict[str, int] = {}
    for rs in orc["drop_reasons"]:
        for r in rs:
            reasons[r] = reasons.get(r, 0) + 1
    reason_rows = [[r, n] for r, n in sorted(reasons.items())]
    langs = orc["lang"].value_counts(dropna=False)
    lang_rows = [
        [None if pd.isna(k) else str(k), int(v)] for k, v in langs.items()
    ]
    return {
        "clips_keep_stats": {
            "columns": ["total", "kept", "silent_windows",
                        "dyn_floor_sum"],
            "rows": keep_stats,
        },
        "clips_reason_histogram": {"columns": ["reason", "n"],
                                   "rows": reason_rows},
        "clips_langid_distribution": {"columns": ["lang", "n"],
                                      "rows": lang_rows},
        "clips_audio_neardup": {
            "columns": ["fp_a", "fp_b", "hamming", "n_a", "n_b"],
            "rows": [list(r) for r in audio_fp_neardup_py(pdf)],
        },
    }


def main() -> int:
    import __spark_entry__ as entry
    from data_quality_check_pipeline_spark.session import get_spark

    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    clips = clips_goldens_py()  # SF-independent (fixed synthetic corpus)
    spark = get_spark(app_name="make-goldens", cores=8,
                      shuffle_partitions=8)
    qs = entry.queries()
    rc = 0
    for sf_dir in sf_dirs:
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
            ["doc_id", "text", "lang"]
        ]
        goldens = {
            "doc_minhash_pairs": {
                "columns": ["id_a", "id_b", "est_jaccard"],
                "rows": [list(r) for r in minhash_pairs_py(docs)],
            },
            "doc_simhash_pairs": {
                "columns": ["id_a", "id_b", "hamming"],
                "rows": [list(r) for r in simhash_pairs_py(docs)],
            },
            "doc_stratified_sample": {
                "columns": ["doc_id", "lang", "split"],
                "rows": [list(r) for r in stratified_sample_py(docs)],
            },
            "doc_dsir_select": {
                "columns": ["doc_id"],
                "rows": [[i] for i in dsir_select_py(docs)],
            },
            **clips,
        }

        # guard: the Spark harness queries must agree EXACTLY before we
        # commit a golden — a mismatch means one side has a bug and must
        # be fixed, not frozen
        ok = True
        for name, g in goldens.items():
            sdf = qs[name](spark, sf_dir)
            # sort by the SAME canonical form the comparison uses: a
            # str() sort key could order rows differing only in
            # low-order float bits differently on the two sides and
            # misalign the zip
            key = lambda t: tuple(  # noqa: E731 (None-safe)
                str(_canon(x)) for x in t
            )
            srows = sorted(
                (tuple(r) for r in sdf.select(*g["columns"]).collect()),
                key=key,
            )
            grows = sorted((tuple(r) for r in g["rows"]), key=key)
            if [tuple(map(_canon, r)) for r in srows] != [
                tuple(map(_canon, r)) for r in grows
            ]:
                ok = False
                print(
                    f"MISMATCH {name} at {sf_dir}: "
                    f"spark={len(srows)} golden={len(grows)}"
                )
                for s, gg in list(zip(srows, grows))[:5]:
                    if tuple(map(_canon, s)) != tuple(map(_canon, gg)):
                        print("  spark ", s)
                        print("  golden", gg)
            else:
                print(f"ok {name} at {sf_dir}: {len(grows)} rows")
        spark.catalog.clearCache()  # per-SF caches must not accumulate
        if not ok:
            print(f"NOT WRITING goldens for {sf_dir} — fix the divergence")
            rc = 1
            continue
        meta = {
            "sf_dir": sf_dir,
            "documents_sha256": corpus_fingerprint(sf_dir),
            "clips_n": entry._CLIPS_N,  # the corpus actually derived from
            "source": (
                "pure-Python re-derivation "
                "(oracle_hash + oracle.run_oracle)"
            ),
        }
        out = golden_path(sf_dir)
        with open(out, "w") as f:
            json.dump({"_meta": meta, **goldens}, f, indent=1)
        print(f"wrote {out}")
    spark.stop()
    return rc


def _canon(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    return v


if __name__ == "__main__":
    raise SystemExit(main())
