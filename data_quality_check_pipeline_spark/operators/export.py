"""Training-shard export: deterministic global shuffle + manifest.

The last hop of a training-data pipeline: the clean table leaves the
warehouse as N shuffled shards a trainer streams directly. Three
properties matter at 100 TB and are easy to get wrong:

* **Shuffled, not clustered.** The clean table is partitioned by
  (lang[, split]) for warehouse reads; feeding it to a trainer in that
  order would present hours of one language at a time. The export
  orders rows by a keyed hash — a deterministic global shuffle.
* **Deterministic.** Shard membership and within-shard order derive
  from ``xxhash64(key, domain, seed)`` — never ``rand()`` — so a
  re-export after a crash, on different cluster sizes or input
  partitionings, produces bit-identical shards (the repo invariant;
  shard assignment and shuffle order are separate decision KINDS and
  get separate domain literals, DESIGN #23).
* **Verifiable.** A manifest records per-shard row counts, token sums
  and an order-invariant XOR checksum over the key hashes; the trainer
  (or a later integrity pass) re-derives them from the files alone —
  a truncated copy or a lost file is caught before it silently skews
  training (``verify_export``).

Scale shape: one projection adds (shard, order); one
``repartition(n_shards, shard)`` shuffle co-locates each shard in
exactly one task (a shard value hashes to one partition);
``sortWithinPartitions`` orders it (sort is per-shard local, never a
global sort); the partitioned write emits one file per shard. The
manifest aggregate is a map-side-combinable groupBy over (shard) —
row-count-sized, not data-sized. n_shards is the trainer's read
parallelism: pick ~corpus_bytes / 256 MB.

The reference engine has no export analogue; this is part of the
round brief's training-data operations.
"""

from __future__ import annotations

import json
import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger("clip_quality.export")

# decision-kind domain literals (DESIGN #23: every hash-derived
# decision KIND over the same keys gets its own domain so equal seeds
# across kinds stay independent)
_SHARD_DOMAIN = "export_shard"
_ORDER_DOMAIN = "export_order"
_CKSUM_DOMAIN = "export_cksum"
_EPOCH_DOMAIN = "export_epoch"
_EPOCH_BUF_DOMAIN = "export_epoch_buffer"

MANIFEST_NAME = "manifest.json"


def _kh(key_col: str, domain: str, seed: int):
    return F.xxhash64(
        F.col(key_col), F.lit(domain), F.lit(int(seed)).cast("long")
    )


def with_export_shard(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0,
    shard_col: str = "shard", order_col: str = "_export_order",
) -> DataFrame:
    """Add deterministic (shard, order) columns: shard =
    pmod(xxhash64(key,'export_shard',seed), n), order = an independent
    hash for the within-shard shuffle. Pure projection — callers that
    only need membership (e.g. an oracle) pay no shuffle."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    return df.withColumn(
        shard_col,
        F.pmod(_kh(key_col, _SHARD_DOMAIN, seed), F.lit(n_shards))
        .cast("int"),
    ).withColumn(order_col, _kh(key_col, _ORDER_DOMAIN, seed))


def export_training_shards(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    n_shards: int,
    seed: int = 0,
    token_col: str | None = None,
    drop_cols: tuple = (),
    provenance: dict | None = None,
) -> dict:
    """Write ``df`` as ``out_dir/shard=K/*.parquet`` (one file per
    shard, globally shuffled) plus ``out_dir/manifest.json``; returns
    the manifest. ``key_col`` must be unique non-NULL (the clean
    table's clip_id). ``token_col`` (e.g. packing's n_tokens)
    adds per-shard token sums so a trainer can budget steps per shard
    without a read. ``drop_cols``: columns to leave behind (e.g. the
    audio ``bytes`` when exporting a text-only corpus).

    NULL keys are refused — a NULL cannot be assigned a meaningful
    stable shard. The check rides in the manifest aggregate over the
    WRITTEN files (no second scan of the expensive upstream); on
    refusal the manifest is never written, so the partial output is
    never consumable (consumers gate on the manifest).

    ``provenance``: optional JSON-able dict recorded verbatim in the
    manifest (the CLI stamps {table, snapshot} — which exact table
    version produced these shards; with time-travel reads that makes
    a release re-exportable bit-for-bit)."""
    staged = with_export_shard(
        df.drop(*drop_cols), key_col, n_shards, seed
    )
    (
        staged.repartition(n_shards, F.col("shard"))
        # shard leads the sort so the partitioned write's required
        # ordering is already satisfied — no second (unstable) sort
        # between here and the files
        .sortWithinPartitions("shard", "_export_order", key_col)
        .drop("_export_order")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    # the manifest derives from the WRITTEN files (not the input
    # frame): one upstream scan total, and the recorded counts describe
    # what is actually on disk — verify_export then catches anything
    # that changes the files afterwards
    manifest = _manifest_from(
        df.sparkSession.read.parquet(out_dir),
        key_col, n_shards, seed, token_col,
    )
    if provenance:
        manifest["provenance"] = dict(provenance)
    # the manifest commits LAST: its presence marks a complete export
    # (a crash mid-write leaves data files but no manifest — consumers
    # gate on the manifest, so partial exports are never consumed)
    tmp = os.path.join(out_dir, f"{MANIFEST_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    _log.info(
        "exported %d rows into %d shards under %s",
        manifest["total_rows"], n_shards, out_dir,
    )
    return manifest


def _manifest_from(
    staged: DataFrame, key_col: str, n_shards: int, seed: int,
    token_col: str | None,
) -> dict:
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.count_if(F.col(key_col).isNull()).alias("null_keys"),
        # order-invariant, overflow-free integrity checksum over an
        # INDEPENDENT hash domain (reusing the order hash would make
        # the checksum blind to order-hash bugs)
        F.expr(
            f"bit_xor(xxhash64({key_col}, '{_CKSUM_DOMAIN}', "
            f"{int(seed)}L))"
        ).alias("checksum"),
    ]
    if token_col is not None:
        aggs.append(
            F.sum(F.coalesce(F.col(token_col), F.lit(0)))
            .cast("long").alias("tokens")
        )
    rows = staged.groupBy("shard").agg(*aggs).collect()
    n_null = sum(r["null_keys"] for r in rows)
    if n_null:
        raise ValueError(
            f"export_training_shards: {n_null} NULL {key_col} rows "
            "cannot be sharded deterministically — filter or key them "
            "first (no manifest written; the partial output is not "
            "consumable)"
        )
    by_shard = {r["shard"]: r for r in rows}
    shards = []
    for k in range(n_shards):
        r = by_shard.get(k)
        entry = {
            "shard": k,
            "path": f"shard={k}",
            "rows": r["rows"] if r else 0,
            "checksum": int(r["checksum"]) if r else 0,
        }
        if token_col is not None:
            entry["tokens"] = int(r["tokens"]) if r else 0
        shards.append(entry)
    out = {
        "format": "clip-quality-export-v1",
        "key_col": key_col,
        "n_shards": n_shards,
        "seed": seed,
        "total_rows": sum(s["rows"] for s in shards),
        "shards": shards,
    }
    if token_col is not None:
        out["token_col"] = token_col
        out["total_tokens"] = sum(s["tokens"] for s in shards)
    return out


def verify_export(spark: SparkSession, out_dir: str) -> dict:
    """Trainer-side integrity check: re-derive every shard's row count
    (+ token sum + checksum) FROM THE FILES and compare to the
    manifest. Returns {ok, mismatches: [...]}: a lost/truncated/
    duplicated file shows up as a row or checksum mismatch on its
    shard. One scan of the export, aggregate-only."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    key_col, seed = manifest["key_col"], manifest["seed"]
    token_col = manifest.get("token_col")
    # shard=* glob: a bare read of out_dir would trip over
    # manifest.json itself (only underscore/dot files are ignored)
    df = spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "shard=*")
    )
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.expr(
            f"bit_xor(xxhash64({key_col}, '{_CKSUM_DOMAIN}', "
            f"{int(seed)}L))"
        ).alias("checksum"),
    ]
    if token_col is not None:
        aggs.append(
            F.sum(F.coalesce(F.col(token_col), F.lit(0)))
            .cast("long").alias("tokens")
        )
    got = {r["shard"]: r for r in df.groupBy("shard").agg(*aggs).collect()}
    mismatches = []
    for s in manifest["shards"]:
        g = got.pop(s["shard"], None)
        checks = {
            "rows": (s["rows"], g["rows"] if g else 0),
            "checksum": (s["checksum"], int(g["checksum"]) if g else 0),
        }
        if token_col is not None:
            checks["tokens"] = (s["tokens"], int(g["tokens"]) if g else 0)
        for what, (want, have) in checks.items():
            if want != have:
                mismatches.append(
                    {"shard": s["shard"], "field": what,
                     "manifest": want, "files": have}
                )
    for k in got:  # files for a shard the manifest doesn't know
        mismatches.append(
            {"shard": k, "field": "rows", "manifest": 0,
             "files": got[k]["rows"]}
        )
    return {"ok": not mismatches, "mismatches": mismatches}


# --- WebDataset-style tar export -------------------------------------

WDS_MANIFEST_NAME = "wds_manifest.json"


def export_webdataset_shards(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    n_shards: int,
    seed: int = 0,
    bytes_col: str | None = "bytes",
    payload_ext: str = "pcm",
    meta_cols: tuple | None = None,
    drop_cols: tuple = (),
    resume: bool = False,
    provenance: dict | None = None,
) -> dict:
    """Export as WebDataset-style tar shards — the format audio/vision
    trainers stream natively: ``out_dir/shard-K.tar`` where each sample
    is two adjacent members ``<key>.<payload_ext>`` (the raw bytes
    column; omitted when NULL) and ``<key>.json`` (the metadata
    columns). Same determinism contract as the parquet exporter: shard
    membership, within-shard order and the integrity checksum all
    derive from the SAME domain-separated hashes, so for one
    (key set, n_shards, seed) the parquet and tar exports agree on
    membership and order, and a re-export is BYTE-identical (tar
    metadata is pinned: mtime=0, uid/gid=0, no user names).

    Scale shape: identical to the parquet path — one projection, one
    ``repartition(n_shards, shard)`` shuffle, a per-shard local sort —
    then each task streams its shard(s) straight into tar files
    (sorted by shard within the task, so a shard boundary = close one
    tar, open the next; tars commit via atomic rename). The checksum
    is a vectorized column XORed task-side — no per-row Python
    hashing. The manifest aggregates what each task ACTUALLY wrote and
    commits last; ``verify_webdataset`` re-derives counts + checksums
    from the tar files alone with a pure-Python spark-compatible
    xxhash64 (oracle_hash.py) — no Spark needed trainer-side.

    ``out_dir`` must be a filesystem every executor can reach (local
    mode: the local disk; a cluster: NFS/fuse-mounted object store).

    ``resume=True`` makes a crashed export restartable at shard
    granularity: tars already on disk are verified DISTRIBUTED
    (rows + checksum re-derived from each tar, compared to a slim
    expected aggregate over the staged frame) and only missing or
    stale shards are re-serialized — at 1000 tars a crash at shard
    900 costs ~100 rewrites, not 1000. Sound because finals only
    appear via atomic rename and every byte is hash-deterministic;
    a tar from a different corpus/seed fails the expected comparison
    and is rewritten, and a ``wds_spec.json`` committed BEFORE any tar
    makes a structural change (meta_cols / payload_ext / schema /
    n_shards / seed) a loud refusal instead of silently-kept stale
    metadata. Costs one extra column-pruned pass over ``df`` for the
    expected aggregate; the kept shards' rows are filtered out BEFORE
    the export shuffle. The manifest still describes what is on disk
    (kept entries come from the verified tars). Without resume the
    call has overwrite semantics: pre-existing shard tars and orphaned
    attempt tmps are removed first (foreign files are left alone), the
    way the parquet path's ``mode='overwrite'`` behaves."""
    import glob as _glob
    import re as _re

    import pandas as pd  # noqa: F401 - mapInPandas contract

    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    src = df.drop(*drop_cols)
    ktype = src.schema[key_col].dataType.simpleString()
    if ktype != "string":
        # member names, the pure-Python verify checksum and resume all
        # hash the STRINGIFIED key — a typed key would checksum
        # differently engine-side vs tar-side. Be loud, not subtly wrong.
        raise TypeError(
            f"export_webdataset_shards: {key_col} must be a string "
            f"column (got {ktype}); cast it first"
        )
    staged = with_export_shard(
        src, key_col, n_shards, seed
    ).withColumn("_cksum", _kh(key_col, _CKSUM_DOMAIN, seed))
    if meta_cols is None:
        meta_cols = tuple(
            c for c in src.columns
            if c != bytes_col and c != key_col
        )
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name == key_col or f.name in meta_cols
        or (bytes_col is not None and f.name == bytes_col)
    )
    # metadata serializes JVM-side (to_json over the typed struct):
    # exact int64/timestamp/binary round-trips, no pandas nullable-int
    # -> float64 coercion, and read_webdataset parses it back with
    # from_json against the recorded schema
    mjson = (
        F.to_json(F.struct(*[F.col(c) for c in meta_cols]))
        if meta_cols else F.lit("{}")
    )
    # itertuples renames underscore-led columns positionally — carry
    # the order/checksum columns under plain names
    cols = [
        F.col(key_col), F.col("shard"),
        F.col("_export_order").alias("xorder"),
        F.col("_cksum").alias("xcksum"),
        mjson.alias("mjson"),
    ]
    if bytes_col is not None:
        cols.append(F.col(bytes_col))
    os.makedirs(out_dir, exist_ok=True)

    # structural spec, committed BEFORE any tar: resume can tell a
    # layout/schema change from a crash even when the manifest (which
    # commits LAST) never landed
    spec = {
        "key_col": key_col, "n_shards": n_shards, "seed": seed,
        "payload_ext": payload_ext, "meta_cols": list(meta_cols),
        "schema_ddl": schema_ddl,
    }
    spec_path = os.path.join(out_dir, "wds_spec.json")
    if resume and os.path.exists(spec_path):
        with open(spec_path) as f:
            old_spec = json.load(f)
        if old_spec != spec:
            raise ValueError(
                "export_webdataset_shards(resume=True): the on-disk "
                f"export was written with a different spec ({old_spec}"
                f" != {spec}); existing tars would carry stale "
                "metadata — re-run without resume to overwrite"
            )
    _tmp_spec = spec_path + ".tmp"
    with open(_tmp_spec, "w") as f:
        json.dump(spec, f, indent=2, sort_keys=True)
    os.replace(_tmp_spec, spec_path)

    # orphaned attempt tmps from crashed tasks are dead weight either
    # way; without resume, stale FINAL tars from a previous (possibly
    # wider) export must go too — a trainer globs shard-*.tar and the
    # manifest/verify would never mention them (parquet gets the same
    # semantics from write.mode('overwrite'))
    for p in _glob.glob(os.path.join(out_dir, "shard-*.tar.tmp.*")):
        os.remove(p)
    shard_re = _re.compile(r"shard-(\d+)\.tar$")
    for p in _glob.glob(os.path.join(out_dir, "shard-*.tar")):
        m = shard_re.search(p)
        if m is None:
            continue  # foreign file: never touch, never inspect
        if not resume or int(m.group(1)) >= n_shards:
            os.remove(p)

    kept: dict[int, dict] = {}
    if resume:
        existing = sorted(
            p for p in _glob.glob(os.path.join(out_dir, "shard-*.tar"))
            if shard_re.search(p)
        )
        if existing:
            # slim expected aggregate: (key, shard, cksum) columns only
            expected = {
                int(r["shard"]): (r["rows"], int(r["cksum"]))
                for r in staged.groupBy("shard").agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.expr("bit_xor(_cksum)").alias("cksum"),
                ).collect()
            }

            def _inspect(batches):
                import tarfile

                import pandas as _pd

                from data_quality_check_pipeline_spark.oracle_hash import (
                    spark_xxhash64,
                )

                out = []
                for b in batches:
                    for p in b["tar_path"]:
                        m0 = _re.search(r"shard-(\d+)\.tar$", p)
                        if m0 is None:  # foreign file: not ours
                            continue
                        shard = int(m0.group(1))
                        rows = cksum = 0
                        try:
                            with tarfile.open(p) as tar:
                                for m in tar:
                                    if not m.name.endswith(".json"):
                                        continue
                                    rows += 1
                                    cksum ^= spark_xxhash64(
                                        m.name[: -len(".json")],
                                        _CKSUM_DOMAIN, int(seed),
                                    )
                        except tarfile.TarError:
                            rows, cksum = -1, 0  # unreadable: rewrite
                        out.append((
                            shard, rows, cksum, os.path.getsize(p),
                            os.path.basename(p),
                        ))
                yield _pd.DataFrame(out, columns=[
                    "shard", "rows", "checksum", "n_bytes", "path",
                ])

            verified = (
                df.sparkSession.createDataFrame(
                    [(p,) for p in existing], "tar_path string"
                )
                .repartition(len(existing))
                .mapInPandas(
                    _inspect,
                    "shard int, rows long, checksum long, "
                    "n_bytes long, path string",
                )
                .collect()
            )
            for r in verified:
                if expected.get(int(r["shard"])) == (
                    r["rows"], int(r["checksum"])
                ):
                    kept[int(r["shard"])] = {
                        "shard": int(r["shard"]), "rows": r["rows"],
                        "checksum": int(r["checksum"]),
                        "n_bytes": int(r["n_bytes"]), "path": r["path"],
                    }
            if kept:
                _log.info(
                    "wds resume: %d/%d existing tars verified complete"
                    " — skipping their shards", len(kept), len(existing)
                )
                staged = staged.filter(
                    ~F.col("shard").isin(*kept.keys())
                )

    def _write(batches):
        import tarfile

        state = {"shard": None, "tar": None, "tmp": None, "path": None,
                 "rows": 0, "cksum": 0, "null_keys": 0}
        done = []

        def _close():
            if state["tar"] is None:
                return
            state["tar"].close()
            os.replace(state["tmp"], state["path"])
            done.append((
                state["shard"], state["rows"], state["cksum"],
                os.path.getsize(state["path"]),
                os.path.basename(state["path"]),
            ))
            state.update(tar=None, tmp=None, path=None, shard=None,
                         rows=0, cksum=0)

        def _member(name: str, payload: bytes) -> None:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0  # determinism: re-exports are byte-identical
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            import io

            state["tar"].addfile(info, io.BytesIO(payload))

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                key = getattr(row, key_col)
                if key is None:
                    raise ValueError(
                        "export_webdataset_shards: NULL "
                        f"{key_col} cannot be exported (no member "
                        "name, no stable shard)"
                    )
                key = str(key)
                if "/" in key or key.startswith("."):
                    raise ValueError(
                        f"key {key!r} is not a safe tar member prefix"
                    )
                shard = int(getattr(row, "shard"))
                if shard != state["shard"]:
                    _close()
                    state["shard"] = shard
                    state["path"] = os.path.join(
                        out_dir, f"shard-{shard:05d}.tar"
                    )
                    # attempt-unique tmp: a speculative/retried task
                    # must never interleave writes into the original
                    # attempt's tmp. Both attempts produce identical
                    # bytes (everything is hash-deterministic), so
                    # whichever os.replace lands last is correct.
                    import uuid as _uuid

                    state["tmp"] = (
                        state["path"] + f".tmp.{_uuid.uuid4().hex}"
                    )
                    state["tar"] = tarfile.open(state["tmp"], "w")
                payload = (
                    getattr(row, bytes_col)
                    if bytes_col is not None else None
                )
                if payload is not None:
                    _member(f"{key}.{payload_ext}", bytes(payload))
                # metadata json was rendered JVM-side (to_json over the
                # typed struct) — this task only moves bytes
                _member(
                    f"{key}.json",
                    getattr(row, "mjson").encode("utf-8"),
                )
                state["rows"] += 1
                state["cksum"] ^= int(getattr(row, "xcksum"))
            del pdf
        _close()
        import pandas as _pd

        yield _pd.DataFrame(
            done,
            columns=["shard", "rows", "checksum", "n_bytes", "path"],
        )

    written = (
        staged.select(*cols)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "xorder", key_col)
        .mapInPandas(
            _write,
            "shard int, rows long, checksum long, n_bytes long, "
            "path string",
        )
        .collect()
    )
    by_shard: dict = dict(kept)  # verified survivors (resume)
    by_shard.update({r["shard"]: r for r in written})
    shards = []
    for k in range(n_shards):
        r = by_shard.get(k)
        shards.append({
            "shard": k,
            "path": r["path"] if r else None,
            "rows": r["rows"] if r else 0,
            "checksum": int(r["checksum"]) if r else 0,
            "n_bytes": int(r["n_bytes"]) if r else 0,
        })
    manifest = {
        "format": "clip-quality-wds-export-v1",
        "key_col": key_col,
        "n_shards": n_shards,
        "seed": seed,
        "payload_ext": payload_ext,
        "meta_cols": list(meta_cols),
        # source-typed schema of (key, meta, payload) so read_webdataset
        # can rebuild the frame without guessing types from JSON
        "schema_ddl": schema_ddl,
        "total_rows": sum(s["rows"] for s in shards),
        "shards": shards,
    }
    if provenance:
        manifest["provenance"] = dict(provenance)
    tmp = os.path.join(out_dir, f"{WDS_MANIFEST_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, WDS_MANIFEST_NAME))
    _log.info(
        "exported %d rows into %d wds tar shards under %s",
        manifest["total_rows"], n_shards, out_dir,
    )
    return manifest


def verify_webdataset(out_dir: str) -> dict:
    """Trainer-side integrity check for a WebDataset export — pure
    Python, NO Spark: re-derive each tar's sample count and
    order-invariant key checksum (spark-compatible xxhash64 from
    oracle_hash.py over the same 'export_cksum' domain literal the
    exporter used) and compare to the manifest. A truncated, lost or
    tampered tar shows up on its shard."""
    import tarfile

    from ..oracle_hash import spark_xxhash64

    with open(os.path.join(out_dir, WDS_MANIFEST_NAME)) as f:
        manifest = json.load(f)
    seed = manifest["seed"]
    mismatches = []
    for s in manifest["shards"]:
        rows = 0
        cksum = 0
        if s["path"]:
            path = os.path.join(out_dir, s["path"])
            if not os.path.exists(path):
                mismatches.append(
                    {"shard": s["shard"], "field": "path",
                     "manifest": s["path"], "files": None}
                )
                continue
            try:
                with tarfile.open(path) as tar:
                    for m in tar:
                        if not m.name.endswith(".json"):
                            continue  # one .json/sample, payload opt.
                        rows += 1
                        key = m.name[: -len(".json")]
                        # a plain python int hashes as LONG — matches
                        # the exporter's F.lit(seed).cast("long")
                        cksum ^= spark_xxhash64(
                            key, _CKSUM_DOMAIN, int(seed)
                        )
            except tarfile.TarError as exc:
                # a truncated/garbled tar is a verification FINDING,
                # not a crash — report it on its shard and move on
                mismatches.append(
                    {"shard": s["shard"], "field": "readable",
                     "manifest": s["path"], "files": str(exc)}
                )
                continue
        for what, want, have in (
            ("rows", s["rows"], rows),
            ("checksum", s["checksum"], cksum),
        ):
            if want != have:
                mismatches.append(
                    {"shard": s["shard"], "field": what,
                     "manifest": want, "files": have}
                )
    # shard tars the manifest doesn't know (same stance as
    # verify_export's unknown-shard check): a trainer globbing
    # shard-*.tar would stream them, so their presence is a finding
    import glob as _glob
    import re as _re

    known = {s["path"] for s in manifest["shards"] if s["path"]}
    for p in _glob.glob(os.path.join(out_dir, "shard-*.tar")):
        name = os.path.basename(p)
        if _re.fullmatch(r"shard-\d+\.tar", name) and name not in known:
            mismatches.append(
                {"shard": int(name[6:-4]), "field": "unknown_tar",
                 "manifest": None, "files": name}
            )
    return {"ok": not mismatches, "mismatches": mismatches}


def read_webdataset(
    spark: SparkSession, out_dir: str, parallelism: int | None = None,
    epoch: int | None = None,
) -> DataFrame:
    """Source connector for a WebDataset export: tar shards back into a
    typed DataFrame (the round-trip of ``export_webdataset_shards``).
    Column types come from the manifest's ``schema_ddl`` (recorded at
    export time from the source frame), NOT guessed from JSON; a
    missing payload member (NULL audio at export) reads back as NULL.

    Scale shape: one task per tar by default (the export already sized
    tars for streaming); each task opens its tar BY PATH through
    tarfile's streaming reader — the archive is never materialized as
    a row (the ``binaryFile`` source would hold whole tars on the
    executor heap) — and yields only (key, raw json string, payload);
    the typed parse happens JVM-side via ``from_json`` against the
    recorded schema, so int64/timestamp/binary metadata round-trips
    exactly (pandas would coerce nullable ints to float64).
    ``out_dir`` must be readable from every executor, the same
    contract the exporter states.

    ``epoch``: order the tar partitions by ``epoch_shard_order`` —
    a sequential consumer (``toLocalIterator`` preserves partition
    order) sees each epoch's deterministic shard permutation instead
    of shard 0..N-1 every epoch. Row content is unaffected."""
    with open(os.path.join(out_dir, WDS_MANIFEST_NAME)) as f:
        manifest = json.load(f)
    key_col = manifest["key_col"]
    meta_cols = manifest["meta_cols"]
    ext = manifest["payload_ext"]
    schema = manifest["schema_ddl"]
    # split on the exporter's ', ' join separator — nested simpleStrings
    # (struct<a:int,b:int>, decimal(10,2)) never contain a comma+space
    fields = schema.split(", ")
    field_names = [f.split(" ", 1)[0] for f in fields]
    meta_ddl = ", ".join(
        f for f in fields if f.split(" ", 1)[0] in set(meta_cols)
    )
    payload_field = next(
        (n for n in field_names
         if n != key_col and n not in meta_cols), None
    )
    entries = manifest["shards"]
    if epoch is not None:
        entries = epoch_shard_order(manifest, epoch)
    paths = [
        os.path.join(out_dir, s["path"]) for s in entries if s["path"]
    ]
    if not paths:  # empty export: zero-row frame with the real schema
        return spark.createDataFrame([], schema)
    if epoch is not None:
        # one partition per tar IN EPOCH ORDER: plain repartition would
        # hash-scatter the visit order away
        pdf = spark.createDataFrame(
            [(i, p) for i, p in enumerate(paths)], "pos int, tar_path string"
        ).repartitionByRange(len(paths), "pos").drop("pos")
    else:
        pdf = spark.createDataFrame(
            [(p,) for p in paths], "tar_path string"
        ).repartition(parallelism or len(paths))

    def _read(batches):
        import tarfile

        import pandas as _pd

        for b in batches:
            for tar_path in b["tar_path"]:
                rows = []
                cur: list = [None, None, None]  # key, json, payload
                with tarfile.open(tar_path) as tar:
                    for m in tar:
                        mkey, mext = m.name.rsplit(".", 1)
                        if mkey != cur[0]:
                            if cur[0] is not None:
                                rows.append(tuple(cur))
                            cur = [mkey, None, None]
                        if mext == "json":
                            cur[1] = (
                                tar.extractfile(m).read().decode("utf-8")
                            )
                        elif mext == ext:
                            cur[2] = tar.extractfile(m).read()
                    if cur[0] is not None:
                        rows.append(tuple(cur))
                yield _pd.DataFrame(
                    rows, columns=["xkey", "xjson", "xpayload"]
                )

    raw = pdf.mapInPandas(
        _read, "xkey string, xjson string, xpayload binary"
    )
    out_cols = []
    for n in field_names:
        if n == key_col:
            out_cols.append(F.col("xkey").alias(n))
        elif n == payload_field:
            out_cols.append(F.col("xpayload").alias(n))
        else:
            out_cols.append(F.col(f"_m.{n}"))
    if meta_ddl:
        raw = raw.withColumn("_m", F.from_json("xjson", meta_ddl))
    return raw.select(*out_cols)


def epoch_shard_order(
    out_dir_or_manifest, epoch: int,
) -> list[dict]:
    """Deterministic per-epoch shard visit plan for a finished export
    (parquet or WebDataset — both manifests carry the same ``shards``
    list). Multi-epoch training must not replay the identical sample
    order every epoch (the optimizer sees correlated batches), and it
    must not ``rand()`` either (a resumed epoch would diverge from the
    crashed one). This derives the order the same way every other
    decision in the repo is derived: a domain-separated deterministic
    hash.

    Returns the manifest's shard entries, reordered for ``epoch``, each
    augmented with ``buffer_seed`` — a per-(epoch, shard) seed for the
    trainer's in-memory shuffle buffer (the standard WebDataset
    pattern: shard-level permutation + a bounded sample buffer
    approximates a global per-epoch shuffle without rewriting a single
    byte of the export). Properties, all tested:

    * same (export seed, epoch) -> same order and seeds (resume-safe);
    * different epochs -> different permutations and buffer seeds;
    * the permutation hash rides its own domain literal, so it is
      independent of shard MEMBERSHIP at equal seeds (DESIGN #23), and
      ``buffer_seed`` rides a second domain so "which shard next" and
      "how to shuffle inside it" never correlate;
    * every shard appears exactly once — coverage per epoch is exact,
      unlike sampling-with-replacement schemes.

    Driver/trainer-side pure Python (oracle_hash's bit-for-bit Spark
    xxhash64) — no Spark session needed where the trainer runs."""
    from ..oracle_hash import Int32, spark_xxhash64

    if isinstance(out_dir_or_manifest, dict):
        manifest = out_dir_or_manifest
    else:
        path = os.path.join(out_dir_or_manifest, WDS_MANIFEST_NAME)
        if not os.path.exists(path):
            path = os.path.join(out_dir_or_manifest, MANIFEST_NAME)
        with open(path) as f:
            manifest = json.load(f)
    seed = int(manifest.get("seed", 0))
    epoch = int(epoch)

    def _order_key(entry):
        return (
            spark_xxhash64(
                Int32(entry["shard"]), _EPOCH_DOMAIN, seed, epoch
            ),
            entry["shard"],  # tie-break: deterministic even on collision
        )

    out = []
    for entry in sorted(manifest["shards"], key=_order_key):
        e = dict(entry)
        e["buffer_seed"] = spark_xxhash64(
            Int32(entry["shard"]), _EPOCH_BUF_DOMAIN, seed, epoch
        )
        out.append(e)
    return out
