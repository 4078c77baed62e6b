#!/usr/bin/env python
"""Fabricate the ~sf1 scale-smoke corpus: a deterministic 10x replica
of /root/testdata/sf0.1 under /tmp/sfscale (DESIGN.md #19 recipe,
committed as a tool so the smoke is reproducible per round).

Usage: python tools/make_sfscale.py [SRC_SF_DIR] [DEST_DIR] [REPLICAS]
       (defaults: /root/testdata/sf0.1 /tmp/sfscale 10)

Construction rules (why, not just what):

* integer keys offset per replica (replica r adds r * KEY_STRIDE) so
  joins stay key-consistent WITHIN a replica and never collide across
  replicas — the fabricated corpus is 10 disjoint copies of the same
  star schema, which preserves every oracle query's semantics while
  10x-ing the row counts;
* a replica token (``repNN``) is inserted into ``documents.text``
  after every 2nd word, so NO word shingle (k>=3 — minhash/ngram/
  decontam/dup-span granularity) ever matches across replicas: text
  dedup yields scale 10x linearly instead of exploding quadratically
  into cross-replica matches that exist nowhere in real data;
* dimension tables (region/nation) replicate WITHOUT key offsets —
  they are genuinely low-cardinality dimensions; fact foreign keys
  into them (c_nationkey, n_regionkey) stay in the original domain.

Everything is pure-pandas/pyarrow (no Spark): the smoke's Spark-vs-
DuckDB comparison must not share a code path with the engine under
test.
"""
from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

KEY_STRIDE = 10_000_000  # far above any sf0.1 key range

# per-table key columns that get the replica offset (foreign keys move
# WITH their primary keys so every within-replica join stays intact)
OFFSET_COLS = {
    "documents": ["doc_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}


def _replica_text(text: object, r: int) -> object:
    if not isinstance(text, str):
        return text
    tok = f"rep{r:02d}"
    words = text.split()
    out: list[str] = []
    for i, w in enumerate(words, 1):
        out.append(w)
        if i % 2 == 0:
            out.append(tok)
    return " ".join(out)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name, key_cols in OFFSET_COLS.items():
        path = f"{src}/{name}.parquet"
        if not os.path.exists(path):
            print(f"skip {name}: no {path}")
            continue
        base = pq.read_table(path)
        schema = base.schema
        df0 = base.to_pandas()
        if not key_cols:  # pure dimension: one copy, unchanged
            pq.write_table(base, f"{dst}/{name}.parquet")
            print(f"{name}: dimension, 1x {len(df0)} rows")
            continue
        parts = []
        for r in range(replicas):
            df = df0.copy()
            for c in key_cols:
                df[c] = df[c] + r * KEY_STRIDE
            if name == "documents":
                df["text"] = [_replica_text(t, r) for t in df["text"]]
                df["n_chars"] = [
                    len(t) if isinstance(t, str) else n
                    for t, n in zip(df["text"], df["n_chars"])
                ]
            parts.append(df)
        big = pd.concat(parts, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(big, schema=schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )
        print(f"{name}: {replicas}x -> {len(big)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
