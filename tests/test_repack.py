"""Incremental re-pack (repack.py): NULL-pack_run backlog rows (what
corrections.py leaves behind) gain chunk identity in a fresh
deterministic pack_run; every existing chunk id stays byte-identical —
the packed dataset is append-only in chunk identity. Chunk assignment
is cross-checked against a pure-Python re-derivation (oracle_hash
xxh64 shards + running-token-sum chunking)."""

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.corrections import PACK_COLS
from data_quality_check_pipeline_spark.oracle_hash import spark_xxhash64
from data_quality_check_pipeline_spark.pipeline import (
    CLEAN_TABLE,
    RunConfig,
    run_pipeline,
)
from data_quality_check_pipeline_spark.repack import repack_unpacked
from data_quality_check_pipeline_spark.sources.tables import TableStore


@pytest.fixture(scope="module")
def rooted(spark, corpus, tmp_path_factory):
    """One split+packed pipeline run over a small corpus slice."""
    df, _, _ = corpus
    sub = df.iloc[::10].reset_index(drop=True)
    d = tmp_path_factory.mktemp("repack_corpus")
    path = str(d / "clips.parquet")
    pq.write_table(pa.Table.from_pandas(sub, preserve_index=False), path)
    root = str(tmp_path_factory.mktemp("repack_tables") / "t")
    cfg = RunConfig(
        out_root=root, run_id="rp1",
        split_fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        pack_budget=50,
    )
    run_pipeline(spark, path, cfg)
    return root


def _null_pack(spark, root, ids):
    """Reset pack_* to NULL for ``ids`` — exactly what a landing
    correction does to its rows."""
    store = TableStore(spark, root)
    clean = store.read(CLEAN_TABLE)
    types = dict(clean.dtypes)
    rows = clean.filter(F.col("clip_id").isin(ids))
    for c in PACK_COLS:
        rows = rows.withColumn(c, F.lit(None).cast(types[c]))
    up = store.upsert(CLEAN_TABLE, rows, "clip_id")
    assert up["n_updated"] == len(ids)
    return store


def _pack_map(store):
    return {
        r["clip_id"]: tuple(r[c] for c in PACK_COLS)
        for r in store.read(CLEAN_TABLE)
        .select("clip_id", *PACK_COLS)
        .collect()
    }


def _expected_chunks(rows, budget, n_shards):
    """Pure-Python re-derivation: xxh64 shard, clip_id order,
    running-token-sum chunking per (lang, split, shard) group."""
    groups = {}
    for r in rows:
        shard = spark_xxhash64("repack_shard", r["clip_id"]) % n_shards
        groups.setdefault((r["lang"], r["split"], shard), []).append(r)
    exp = {}
    for (_, _, shard), g in groups.items():
        g.sort(key=lambda r: r["clip_id"])
        off = 0
        for r in g:
            # Java regexp_count(\S+) is ASCII-classed
            ntok = len(re.findall(r"\S+", r["transcript_scrubbed"],
                                  re.ASCII))
            exp[r["clip_id"]] = (
                shard, off // budget, off, ntok
            )
            off += ntok
    return exp


class TestRepackUnpacked:
    def test_backlog_packed_existing_untouched(self, spark, rooted):
        store = TableStore(spark, rooted)
        clean = store.read(CLEAN_TABLE)
        ids = [
            r["clip_id"]
            for r in clean.orderBy("clip_id").limit(40).collect()
        ][::7]
        before = _pack_map(store)
        assert all(before[i][0] is not None for i in ids)
        _null_pack(spark, rooted, ids)

        rep = repack_unpacked(spark, rooted, budget=50, n_shards=4)
        assert rep["unpacked"] == len(ids)
        assert rep["landed"] == len(ids)
        assert rep["pack_run"].startswith("repack-")
        assert rep["n_chunks"] >= 1

        after = _pack_map(store)
        assert set(after) == set(before)  # replace, never insert/drop
        # every non-backlog chunk identity is byte-identical
        for cid, tup in before.items():
            if cid not in ids:
                assert after[cid] == tup, cid
        # backlog rows: fresh run, no NULLs anywhere
        clean = store.read(CLEAN_TABLE)
        assert clean.filter(F.col("pack_run").isNull()).count() == 0
        run_ids = {after[i][0] for i in ids}
        assert run_ids == {rep["pack_run"]}
        assert rep["pack_run"] not in {
            tup[0] for c, tup in before.items() if c not in ids
        }

        # chunk assignment == the pure-Python re-derivation
        rows = clean.filter(F.col("clip_id").isin(ids)).select(
            "clip_id", "lang", "split", "transcript_scrubbed"
        ).collect()
        exp = _expected_chunks(rows, budget=50, n_shards=4)
        got = {
            i: (after[i][1], after[i][2], after[i][3], after[i][4])
            for i in ids
        }
        assert got == exp

    def test_replay_noop_then_deterministic_rederive(
        self, spark, rooted
    ):
        # immediately after the previous test everything is packed
        rep = repack_unpacked(spark, rooted, budget=50, n_shards=4)
        assert rep == {
            "unpacked": 0, "budget": 50, "n_shards": 4,
            "landed": 0, "pack_run": None,
        }
        # the same backlog set re-nulled mints the SAME pack_run and
        # identical chunk ids (crash-replay re-derives identical state)
        store = TableStore(spark, rooted)
        clean = store.read(CLEAN_TABLE)
        prev = clean.filter(
            F.col("pack_run").startswith("repack-")
        ).select("clip_id", *PACK_COLS).collect()
        assert prev
        ids = [r["clip_id"] for r in prev]
        first = {r["clip_id"]: tuple(r[c] for c in PACK_COLS)
                 for r in prev}
        _null_pack(spark, rooted, ids)
        rep2 = repack_unpacked(spark, rooted, budget=50, n_shards=4)
        assert rep2["pack_run"] == first[ids[0]][0]
        second = {
            c: t for c, t in _pack_map(store).items() if c in first
        }
        assert second == first

    def test_errors(self, spark, rooted, corpus, tmp_path_factory):
        store = TableStore(spark, rooted)
        with pytest.raises(ValueError, match="budget"):
            repack_unpacked(spark, rooted, budget=0)
        with pytest.raises(ValueError, match="n_shards"):
            repack_unpacked(spark, rooted, budget=50, n_shards=0)
        with pytest.raises(FileNotFoundError):
            repack_unpacked(spark, "/tmp/no_such_repack_root", budget=50)
        # a table never packed refuses (no pack contract to extend)
        df, _, _ = corpus
        sub = df.iloc[:120].reset_index(drop=True)
        d = tmp_path_factory.mktemp("repack_unpacked_corpus")
        path = str(d / "clips.parquet")
        pq.write_table(
            pa.Table.from_pandas(sub, preserve_index=False), path
        )
        root2 = str(tmp_path_factory.mktemp("repack_nopack") / "t")
        run_pipeline(
            spark, path, RunConfig(out_root=root2, run_id="rp2")
        )
        with pytest.raises(ValueError, match="never packed"):
            repack_unpacked(spark, root2, budget=50)
