"""Versioned table store: Iceberg when a catalog is configured, otherwise a
parquet + snapshot-manifest fallback with the same semantics.

Capability parity with the reference's version/rollback machinery
(/root/reference/src/rollback_manager.py):

* create_version (rollback_manager.py:48-94)   -> every write = a snapshot
* rollback (rollback_manager.py:96-132)        -> rollback(name, snapshot_id)
* keep-newest-5 GC (rollback_manager.py:165-184)-> expire_snapshots(keep_last)
* checksum idempotency (rollback_manager.py:142-163)
                                               -> source fingerprint recorded
                                                  per snapshot; skip when equal

With a real Iceberg catalog (``spark.sql.catalog.<name>`` configured with the
iceberg runtime on the classpath) these map 1:1 onto Iceberg snapshots,
``CALL rollback_to_snapshot`` and ``expire_snapshots`` — see IcebergStore.
The parquet fallback reproduces snapshot lineage in a ``manifest.json``: each
snapshot owns its files; an *append* snapshot's read set = parent read set +
own files; *overwrite* starts a new chain. Readers never see partial writes
(manifest is updated only after the parquet write succeeds, and is written
atomically via rename).
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import logging
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import blooms as _blooms

_log = logging.getLogger("clip_quality.tables")


def _norm_stat_value(v):
    """Normalize a stats/predicate value to a JSON-storable, totally-
    ordered primitive, or None when the type is not safely comparable.
    datetimes/dates go to epoch seconds / ordinal numbers (NOT ISO
    strings: lexicographic ISO comparison breaks on trailing-zero
    fractions, and a misordered bound would prune a file that matched).
    bools and decimals are skipped outright — pruning must be
    conservative, never clever."""
    import datetime
    import decimal

    if isinstance(v, bool) or isinstance(v, decimal.Decimal):
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, datetime.datetime):
        base = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return (v - base).total_seconds()
    if isinstance(v, datetime.date):
        return float(v.toordinal())
    return None


def _partition_value(raw: str):
    """Decode a hive-style path segment value the way Spark's partition
    inference does (int, then float, then string)."""
    from urllib.parse import unquote

    raw = unquote(raw)
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            continue
    return raw


def _collect_file_stats(data_dir: str) -> list[dict]:
    """Per-file min/max column stats from parquet FOOTERS (metadata-only
    reads — the writer already paid for the stats; this is the local
    equivalent of Iceberg writers reporting stats into manifests).
    Hive-style partition path segments contribute exact min==max stats
    for the partition columns. A column missing stats in ANY row group
    of a file gets no entry for that file (conservative). Each entry
    also records the file's exact ``rows`` (footer num_rows) — the
    Iceberg-manifest row count that lets ``row_count`` answer COUNT(*)
    without touching data — and per-column null counts (``nulls``, for
    stats-bearing columns whose every row group reports null_count):
    parquet min/max ignore NULLs, so "max < cutoff" alone cannot prove
    a file wholly dead for a predicate delete — the Iceberg-manifest
    null_count is what makes whole-file drops sound
    (``delete_below``). Columns missing a null_count anywhere are
    simply absent from ``nulls`` (conservative, like stats)."""
    import pyarrow.parquet as pq

    out: list[dict] = []
    for root, _dirs, files in os.walk(data_dir):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, data_dir)
            stats: dict = {}
            nulls: dict = {}
            bad: set = set()
            nbad: set = set()
            rows = None
            try:
                md = pq.ParquetFile(path).metadata
                rows = md.num_rows
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        cname = col.path_in_schema
                        if "." in cname or cname in bad:
                            continue  # nested / already disqualified
                        st = col.statistics
                        if cname not in nbad:
                            nc = (
                                st.null_count
                                if st is not None and st.has_null_count
                                else None
                            )
                            if nc is None:
                                nbad.add(cname)
                                nulls.pop(cname, None)
                            else:
                                nulls[cname] = nulls.get(cname, 0) + nc
                        lo = hi = None
                        if st is not None and st.has_min_max:
                            lo = _norm_stat_value(st.min)
                            hi = _norm_stat_value(st.max)
                        if lo is None or hi is None:
                            bad.add(cname)
                            stats.pop(cname, None)
                            continue
                        if cname in stats:
                            stats[cname] = [
                                min(stats[cname][0], lo),
                                max(stats[cname][1], hi),
                            ]
                        else:
                            stats[cname] = [lo, hi]
            except Exception:  # noqa: BLE001 - stats are best-effort
                stats = {}
                nulls = {}
            # nulls only for columns that kept min/max stats (they are
            # consulted together; a stats-less column never prunes)
            nulls = {k: v for k, v in nulls.items() if k in stats}
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    k, _, raw = seg.partition("=")
                    if raw != "__HIVE_DEFAULT_PARTITION__":
                        v = _partition_value(raw)
                        stats[k] = [v, v]
                        nulls[k] = 0  # a hive path value is never NULL
            entry = {"path": rel, "stats": stats}
            if rows is not None:
                entry["rows"] = rows
            if nulls:
                entry["nulls"] = nulls
            out.append(entry)
    return out


def _file_may_match(stats: dict, prune: list) -> bool:
    """Conservative overlap test: False ONLY when the file's [min, max]
    provably cannot satisfy EVERY predicate. Missing stats, unknown
    columns, or type-incomparable values keep the file. NULL rows carry
    no stats and are excluded by every predicate anyway (SQL
    three-valued logic) — callers still apply the real filter; pruning
    only skips files."""
    for col, op, val in prune:
        s = stats.get(col)
        if op == "in":
            # disjunctive membership: keep the file if ANY value can land
            # in its [min, max] (the IVF multi-cell probe shape — an
            # AND-composed '=' cannot express it)
            if not s:
                continue
            lo, hi = s
            if isinstance(val, (str, bytes)):
                val = [val]  # a bare string is ONE value, not its chars
            else:
                try:
                    iter(val)
                except TypeError:
                    val = [val]  # bare scalar: behave like '='
            vals = [
                v for v in (_norm_stat_value(x) for x in val)
                if v is not None
            ]
            if not vals:
                continue
            try:
                if not any(lo <= v <= hi for v in vals):
                    return False
            except TypeError:
                pass
            continue
        nval = _norm_stat_value(val)
        if not s or nval is None:
            continue
        lo, hi = s
        try:
            if op == "=":
                drop = nval < lo or nval > hi
            elif op == ">=":
                drop = hi < nval
            elif op == ">":
                drop = hi <= nval
            elif op == "<=":
                drop = lo > nval
            elif op == "<":
                drop = lo >= nval
            else:
                raise ValueError(f"unsupported prune op {op!r}")
            if drop:
                return False
        except TypeError:
            continue  # e.g. int predicate on a string column: keep
    return True


def _link_or_copy(src: str, dst: str) -> None:
    """Hard-link ``src`` into ``dst`` (same-filesystem: zero data copy
    — the local analogue of an Iceberg manifest referencing an
    existing data file from a new snapshot); falls back to a real copy
    when the filesystem refuses links. A name collision gets a suffix
    (parquet file names carry no semantics)."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.exists(dst):
        base, ext = os.path.splitext(dst)
        dst = f"{base}-carry-{uuid.uuid4().hex[:8]}{ext}"
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


_ZORDER_BITS = 8  # quantile buckets per dimension = 2^bits


def _bsearch_bucket_expr(col: "Column", bounds: list[float]) -> "Column":
    """bucket(v) = #{i : bounds[i] <= v} as a BALANCED binary-search
    CASE tree — log2(len) comparisons per row, pure Column exprs inside
    whole-stage codegen (a linear HOF count over a bounds array would
    run interpreted: the measured 27x trap, DESIGN.md)."""
    def build(lo: int, hi: int) -> "Column":
        if lo >= hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return (
            F.when(col < F.lit(bounds[mid]), build(lo, mid))
            .otherwise(build(mid + 1, hi))
        )

    return build(0, len(bounds))


def _zorder_column(
    df: DataFrame,
    zorder_by: list[str],
    bits: int = _ZORDER_BITS,
    accuracy: int = 10_000,
) -> "Column":
    """Morton (Z-order) key over ``zorder_by``: per-column QUANTILE
    bucket ids (equi-mass, so skew cannot collapse the curve onto a few
    cells — Delta's OPTIMIZE ZORDER BY uses range ids the same way) with
    their bits interleaved into one long. Range-sorting files by this
    key gives every zorder column a tight per-file [min,max] at once:
    a linear sort on (a, b) makes ``read(prune=...)`` selective on
    ``a`` only, the z-curve makes it selective on EACH dimension —
    the multi-column data-skipping layout for 100-TB tables.

    Costs one distributed aggregate (percentile_approx per column) to
    learn the boundaries; bucket assignment + interleave are native
    codegen expressions. Numeric / date / timestamp columns only
    (strings have no quantile surface here — and point lookups on id
    strings are the bloom sidecars' job). NULLs bucket to 0 (nulls
    first); an all-NULL or constant column degenerates to one bucket
    and simply stops contributing bits."""
    from pyspark.sql.types import DateType, NumericType, TimestampType

    try:  # Spark >= 3.4
        from pyspark.sql.types import TimestampNTZType
        ts_types: tuple = (TimestampType, TimestampNTZType)
    except ImportError:  # pragma: no cover
        ts_types = (TimestampType,)

    if len(set(zorder_by)) != len(zorder_by):
        raise ValueError(f"zorder_by has duplicate columns: {zorder_by}")
    k = len(zorder_by)
    bits = max(1, min(bits, 63 // k))
    n_buckets = 1 << bits

    casted: dict[str, "Column"] = {}
    for c in zorder_by:
        dt = df.schema[c].dataType
        if not isinstance(dt, (NumericType, DateType) + ts_types):
            raise ValueError(
                f"zorder_by column {c!r} has type {dt.simpleString()}; "
                "z-ordering needs an orderable numeric/date/timestamp "
                "quantile surface (for point lookups on string keys "
                "use cluster_by or bloom_cols)"
            )
        e = F.col(c)
        if isinstance(dt, DateType):
            e = e.cast("timestamp")
        casted[c] = e.cast("double")

    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        *[
            F.percentile_approx(casted[c], probs, accuracy).alias(
                f"__zb_{i}"
            )
            for i, c in enumerate(zorder_by)
        ]
    ).collect()[0]

    z = F.lit(0).cast("long")
    for ci, c in enumerate(zorder_by):
        raw = row[f"__zb_{ci}"] or []
        bounds = sorted({float(v) for v in raw if v is not None})
        if not bounds:
            continue  # constant / all-NULL column: no bits to add
        bucket = _bsearch_bucket_expr(
            F.coalesce(casted[c], F.lit(float("-inf"))), bounds
        ).cast("long")
        if len(bounds) < n_buckets - 1:
            # low-cardinality column: its bucket ids occupy fewer than
            # ``bits`` bits, so its high interleave positions would sit
            # at 0 and the OTHER columns' MSBs would dominate the curve
            # (measured: a 64-distinct-value dim next to a full 256-
            # bucket dim degenerated to a linear sort on the latter).
            # Stretch the id range so every column's MSB is meaningful.
            bucket = (
                bucket * F.lit(n_buckets - 1) / F.lit(len(bounds))
            ).cast("long")
        for bit in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * k + ci,
                )
            )
    return z


def _cluster_frame(
    df: DataFrame,
    cluster_by: list[str] | None,
    partition_by: list[str] | None,
    target_files: int | None,
    zorder_by: list[str] | None = None,
) -> DataFrame:
    """Apply the sort-order layout before a snapshot write. With BOTH
    hive partitioning and clustering, the range key is (partition cols
    + cluster cols): ranging on the cluster key alone spreads every
    partition cell across every range task, and partitionBy then cuts
    each task per cell — ``tasks x cells`` small files per write
    (measured: a 32-range clustered compact of a lang/split-partitioned
    160k-clip table landed ~620 files, and every COW rewrite
    re-fragmented the same way). Leading with the partition cols keeps
    each range task inside ~one cell: ~target_files files total, each
    still a tight sorted cluster-key run (the sortWithinPartitions
    suffix orders cells first, then the key within them).

    ``zorder_by`` (mutually exclusive with ``cluster_by``) ranges and
    sorts on the interleaved Morton key instead — see
    ``_zorder_column``."""
    if cluster_by and zorder_by:
        raise ValueError(
            "cluster_by and zorder_by are mutually exclusive layouts"
        )
    if zorder_by:
        df = df.withColumn("__zorder", _zorder_column(df, zorder_by))
        sort_cols = [
            c for c in (partition_by or []) if c not in zorder_by
        ] + ["__zorder"]
        df = (
            df.repartitionByRange(*sort_cols)
            if target_files is None
            else df.repartitionByRange(target_files, *sort_cols)
        ).sortWithinPartitions(*sort_cols).drop("__zorder")
        return df
    if cluster_by:
        sort_cols = [
            c for c in (partition_by or []) if c not in cluster_by
        ] + list(cluster_by)
        df = (
            df.repartitionByRange(*sort_cols)
            if target_files is None
            else df.repartitionByRange(target_files, *sort_cols)
        ).sortWithinPartitions(*sort_cols)
    elif target_files:
        df = df.repartition(target_files)
    return df


def _schema_key(schema_json: str | None):
    """Ordered (name, type) fingerprint of a snapshot schema (nullability
    ignored), or None when unrecorded. File-level COW carry-forward is
    only safe when every file in the new snapshot dir shares one
    schema — Spark's parquet reader infers the dir schema from one
    file, so a hard-linked old-schema file next to freshly written
    widened files would silently drop the new columns."""
    if not schema_json:
        return None
    try:
        fields = json.loads(schema_json).get("fields", [])
        return tuple(
            (f["name"], json.dumps(f["type"], sort_keys=True))
            for f in fields
        )
    except (ValueError, KeyError, TypeError):
        return None


def _file_overlap_fn(key_col: str, nkeys, lohi, keys=None, bloom_get=None):
    """Per-FILE key-overlap predicate from footer stats: ``nkeys`` a
    sorted normalized key list (precise) or ``lohi`` a (min, max) range
    (degraded). Conservative: a file without usable stats overlaps.

    ``keys`` (the ORIGINAL key values) + ``bloom_get`` (a
    ``(dir, rel) -> bloom entry | None`` lookup) refine a range-overlap
    hit with the per-file membership bloom: on an unclustered layout
    every [min, max] spans the key domain and range pruning keeps
    everything, but the bloom still PROVES most files hold none of a
    small takedown/correction batch's keys (see sources/blooms.py).
    Bloom misses only ever ADD files (false positives), never drop
    one that matters."""
    from bisect import bisect_left

    tester = (
        _blooms.BloomTester(keys)
        if keys is not None and bloom_get is not None
        else None
    )

    def fn(d: str, finfo_entry) -> bool:
        s = (finfo_entry.get("stats") or {}).get(key_col)
        range_hit = True
        if s:
            flo, fhi = s
            try:
                if nkeys is not None:
                    i = bisect_left(nkeys, flo)
                    range_hit = i < len(nkeys) and nkeys[i] <= fhi
                elif lohi is not None:
                    range_hit = fhi >= lohi[0] and flo <= lohi[1]
            except TypeError:
                range_hit = True  # incomparable types: conservative
        if not range_hit:
            return False
        if tester is None:
            return True
        return tester.any_maybe_present(
            bloom_get(d, finfo_entry.get("path"))
        )

    return fn


class IncrementalReadError(RuntimeError):
    """read_incremental cannot represent the delta as new-dirs-only
    (non-append history, expired/foreign anchor): callers fall back to
    a full read and re-anchor."""


class TableStore:
    """Parquet-backed versioned tables under a root directory."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        default_branch: str | None = None,
    ) -> None:
        """``default_branch``: scope this handle to a WAP staging
        branch — reads resolve to the branch head (falling back to
        mainline current before the first branch commit: the fork
        view), writes move the branch ref and leave ``current``
        untouched, and mainline-mutating maintenance ops (upsert /
        delete / compact / rollback / tag / expire / adopt) REFUSE
        until the branch is published or dropped. The write-audit-
        publish handle: a pipeline run lands everything on the branch,
        the QA gate audits the branch view, and ``publish_branch``
        fast-forwards mainline atomically on green."""
        self.spark = spark
        self.root = root
        self.default_branch = default_branch
        os.makedirs(root, exist_ok=True)

    def _refuse_on_branch(self, op: str) -> None:
        if self.default_branch:
            raise RuntimeError(
                f"{op} is mainline-only; this handle is scoped to "
                f"branch {self.default_branch!r} — publish_branch or "
                "drop_branch first (WAP maintenance happens after the "
                "audit verdict, never on staged data)"
            )

    # -- manifest helpers ---------------------------------------------------

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "manifest.json")

    def _load_manifest(self, name: str) -> dict:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return {"current": None, "snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _save_manifest(self, name: str, m: dict) -> None:
        p = self._manifest_path(name)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, p)  # atomic on POSIX

    @contextlib.contextmanager
    def _table_lock(
        self, name: str, timeout_s: float = 120.0, stale_s: float = 300.0
    ):
        """Advisory per-table lock around every manifest
        read-modify-write. Concurrent committers to the SAME table — a
        streaming sink and a batch requeue sharing an out_root, or two
        admin operations — would otherwise interleave load/save and one
        commit would silently vanish (lost update).

        fcntl.flock on a PERSISTENT lock file (never unlinked): the
        kernel owns the lock state, so a crashed holder's lock releases
        automatically when its fd closes — there is no stale-lock
        heuristic to race. The previous O_CREAT|O_EXCL + mtime-stale
        break was double-racy (r03 ADVICE): two waiters could both pass
        the staleness check and the loser's pending unlink/rename could
        steal the winner's FRESH lock, briefly re-enabling the
        manifest lost-update the lock exists to prevent. ``stale_s`` is
        retained for signature compatibility but unused — a hung-alive
        holder now surfaces as a TimeoutError after ``timeout_s``
        instead of being silently broken. (A real Iceberg catalog
        replaces all of this with its own atomic commit protocol.)"""
        import fcntl

        os.makedirs(self._dir(name), exist_ok=True)
        path = os.path.join(self._dir(name), ".manifest.lock")
        fd = os.open(path, os.O_CREAT | os.O_RDWR)
        deadline = time.time() + timeout_s
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except (BlockingIOError, InterruptedError):
                    if time.time() > deadline:
                        raise TimeoutError(
                            f"manifest lock for table {name!r} held "
                            f"longer than {timeout_s}s ({path})"
                        ) from None
                    time.sleep(0.05)
            try:
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    def _snapshot(self, m: dict, snapshot_id: str | None) -> dict | None:
        snaps = m["snapshots"]
        if snapshot_id is None:
            sid = m["current"]
            if sid is None:
                return None
            snapshot_id = sid
        for s in snaps:
            if s["id"] == snapshot_id:
                return s
        raise KeyError(f"unknown snapshot {snapshot_id}")

    def _resolve(
        self,
        m: dict,
        snapshot_id: str | None,
        tag: str | None,
        as_of_ts: float | None,
        branch: str | None = None,
    ) -> dict | None:
        """Resolve a snapshot reference: explicit id > tag > newest
        snapshot committed at or before ``as_of_ts`` (Iceberg
        timestamp time travel) > branch head (explicit ``branch`` or
        the handle's ``default_branch``; a branch with no commits yet
        resolves to mainline current — the fork view) > current. An
        EXPLICIT unknown branch raises (typo protection); an unwritten
        ``default_branch`` silently falls through by design."""
        if snapshot_id is not None:
            return self._snapshot(m, snapshot_id)
        if tag is not None:
            sid = m.get("tags", {}).get(tag)
            if sid is None:
                raise KeyError(
                    f"unknown tag {tag!r} (have: "
                    f"{sorted(m.get('tags', {}))})"
                )
            return self._snapshot(m, sid)
        if as_of_ts is not None:
            # candidates come from the CURRENT snapshot's ancestry
            # only (Iceberg TIMESTAMP AS OF follows the live branch):
            # after a rollback, the discarded branch's snapshots are
            # still in the manifest with later timestamps, and a raw
            # max-by-ts would resurrect exactly the rows the rollback
            # threw away. An expired parent ends the walk — older
            # history is then honestly unreachable by timestamp.
            ancestry = []
            s = self._snapshot(m, None)
            while s is not None:
                ancestry.append(s)
                try:
                    s = (
                        self._snapshot(m, s["parent"])
                        if s.get("parent") else None
                    )
                except KeyError:
                    s = None
            past = [s for s in ancestry if s["ts"] <= as_of_ts]
            if not past:
                raise KeyError(
                    f"no snapshot in the current history committed at "
                    f"or before {as_of_ts}"
                )
            return max(past, key=lambda s: s["ts"])
        eff = branch or self.default_branch
        if eff is not None:
            sid = m.get("branches", {}).get(eff)
            if sid is None and branch is not None:
                raise KeyError(
                    f"unknown branch {branch!r} (have: "
                    f"{sorted(m.get('branches', {}))})"
                )
            if sid is not None:
                return self._snapshot(m, sid)
        return self._snapshot(m, None)

    # -- public API ----------------------------------------------------------

    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        properties: dict | None = None,
        cluster_by: list[str] | None = None,
        target_files: int | None = None,
        bloom_cols: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> str:
        """Write df as a new snapshot; returns the snapshot id.

        ``zorder_by``: multi-dimensional variant of ``cluster_by``
        (mutually exclusive) — lays files out along the Morton curve of
        the quantile-bucketed columns so ``read(prune=...)`` is
        selective on EVERY listed column, not just the leading sort
        key. See ``_zorder_column``. Sticky across compactions exactly
        like ``cluster_by``.

        ``bloom_cols``: record a per-file key-membership bloom sidecar
        for these columns (see sources/blooms.py) — the point-lookup
        complement to ``cluster_by``: clustering makes min/max stats
        selective for RANGE queries, blooms bound point-id maintenance
        (takedown/correction COW, ``read(prune=[('id','in',...)])``)
        on ANY layout, including the hash-sharded ingest layout where
        every file's range spans the id domain. Appends inherit the
        spec from the parent snapshot (so pipeline shard appends keep
        blooms without threading the flag); an overwrite resets it
        unless passed, mirroring cluster_by. Cost: one extra
        distributed scan of the key column over the new files.

        The (long) parquet write happens OUTSIDE the table lock into a
        uuid-unique dir — concurrent writers never collide on data
        files. Only the manifest read-modify-write is serialized, and
        an append's read_set is resolved from the manifest AS SEEN
        INSIDE the lock, so two concurrent appends chain instead of one
        silently dropping the other.

        ``cluster_by``: Iceberg sort-order analogue. Range-partition +
        sort the frame by these columns before writing, so each data
        file covers a DISJOINT key range and the per-file min/max stats
        become selective: without clustering, rows land in arrival
        order, every file's [min, max] spans the whole key domain, and
        ``read(prune=...)`` skips nothing — the 100-TB point/range
        query reads the table. With it, the query touches O(result)
        files. Recorded in the snapshot entry so ``compact`` keeps the
        layout by default. (``delete_where`` preserves clustering
        without knowing about it: its rewrite is a per-file narrow
        filter, which never re-interleaves key ranges.)

        ``target_files`` pins the range-partition count; without it AQE
        coalesces the range shuffle toward its advisory size — right
        for 100-TB file sizing, but a small clustered table may land as
        one file (no pruning granularity to gain there anyway)."""
        assert mode in ("overwrite", "append")
        df = _cluster_frame(
            df, cluster_by, partition_by, target_files, zorder_by
        )
        sid = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self._dir(name), f"snap_{sid}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        # an empty write leaves no data files; remember the schema so reads
        # of empty tables/snapshots still resolve
        schema_json = df.schema.json()
        files = _collect_file_stats(data_dir)
        has_data = bool(files)
        branch = self.default_branch
        if bloom_cols is None and mode == "append":
            # sticky spec: appends inherit blooms from the parent (read
            # pre-lock — the spec changes rarely and a miss only costs
            # selectivity, never correctness)
            m_pre = self._load_manifest(name)
            parent_pre = self._resolve(m_pre, None, None, None)
            if parent_pre is not None:
                bloom_cols = parent_pre.get("bloom_cols")
        self._write_bloom_sidecar(name, data_dir, files, bloom_cols)

        with self._table_lock(name):
            m = self._load_manifest(name)
            # branch-aware chain head: the branch tip once it has
            # commits, else mainline current (the WAP fork point) —
            # mainline writers keep chaining on current untouched
            head = (
                m.get("branches", {}).get(branch)
                if branch else m["current"]
            )
            if branch and head is None:
                head = m["current"]
            carried_deletes: list[dict] = []
            if mode == "append" and head is not None:
                parent = self._snapshot(m, head)
                read_set = parent["read_set"] + [f"snap_{sid}"]
                # pending MOR delete files ride along: their applies_to
                # scope still names the parent dirs only, so the new
                # rows are untouched (append-after-delete resurrects
                # nothing and hides nothing)
                carried_deletes = self._pending_deletes(parent)
            else:
                read_set = [f"snap_{sid}"]
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": mode,
                    "parent": head,
                    "branch": branch,
                    "read_set": read_set,
                    **(
                        {"delete_files": carried_deletes}
                        if carried_deletes else {}
                    ),
                    "partition_by": partition_by or [],
                    "cluster_by": cluster_by or [],
                    "zorder_by": zorder_by or [],
                    "bloom_cols": bloom_cols or [],
                    "properties": properties or {},
                    "schema": schema_json,
                    "has_data": has_data,
                    # per-file min/max column stats (footer metadata only
                    # — no data scan), the manifest-level data-skipping
                    # lever Iceberg gets from its manifests. Keyed by the
                    # file's snap-dir-relative path.
                    "files": files,
                }
            )
            if branch:
                m.setdefault("branches", {})[branch] = sid
            else:
                m["current"] = sid
            self._save_manifest(name, m)
        return sid

    def read(
        self,
        name: str,
        snapshot_id: str | None = None,
        prune: list | None = None,
        scan_stats: dict | None = None,
        as_of_ts: float | None = None,
        tag: str | None = None,
        branch: str | None = None,
    ) -> DataFrame:
        """Read the current (or a time-travel) snapshot. Time travel by
        explicit ``snapshot_id``, by release ``tag``, or by
        ``as_of_ts`` (newest snapshot committed at or before the epoch
        timestamp — Iceberg ``TIMESTAMP AS OF``).

        ``prune``: optional list of simple predicates
        ``(col, op, value)`` with op in {'=', '<', '<=', '>', '>=',
        'in'} ('in' takes an iterable of values — disjunctive
        membership, e.g. the IVF multi-cell probe) —
        FILES whose recorded min/max provably cannot match every
        predicate are skipped before Spark ever lists them (manifest-
        level data skipping, the lever that makes an Iceberg-style
        table usable at 100 TB: a time- or key-range query touches the
        overlapping files, not the table). Pruning is advisory and
        conservative — files lacking stats are kept, and callers must
        still apply the real filter to the returned frame. Partitioned
        snapshot dirs keep their partition columns via basePath.
        ``scan_stats`` (optional dict) receives files_kept/files_skipped
        counts plus files_unknown (legacy snapshot DIRS read whole
        because their manifest entry predates file stats) for
        observability and tests."""
        m = self._load_manifest(name)
        snap = self._resolve(m, snapshot_id, tag, as_of_ts, branch)
        if snap is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        return self._union_snapshot_dirs(
            name, m, snap["read_set"], snap.get("schema"), prune,
            scan_stats, deletes=self._pending_deletes(snap),
        )

    def _union_snapshot_dirs(
        self,
        name: str,
        m: dict,
        snap_dirs: list[str],
        schema_json: str | None,
        prune: list | None = None,
        scan_stats: dict | None = None,
        only_files: dict | None = None,
        deletes: list | None = None,
    ) -> DataFrame:
        """Union the given snapshot dirs (shared by read /
        read_incremental): filesystem-verified data presence, per-file
        min/max pruning, partition discovery per dir, allowMissingColumns
        union, empty-result schema fallback.

        ``only_files``: optional {dir_basename: [relative paths]}
        restricting the read to an explicit file subset per dir (the
        file-level COW and changelog paths); a dir absent from the map
        is read whole, a dir mapped to [] contributes nothing.

        ``deletes``: merge-on-read equality-delete entries
        (``delete_keys_mor``) to apply at scan time — each entry's
        broadcast key frame is anti-joined against the dirs named in
        its ``applies_to`` scope (rows appended AFTER the delete live
        in dirs outside the scope and are untouched, the Iceberg
        sequence-number rule expressed at dir granularity). NULL-key
        rows always survive (equality anti-join never matches NULL),
        and a dir written before the key column existed is skipped
        entirely (all its rows have NULL for the key). The anti-join
        is broadcast (keys are capped at 1M) — map-side, no shuffle."""
        # skip snapshot dirs that hold no data files (empty writes). The
        # check is against the FILESYSTEM, not surviving manifest entries:
        # expire_snapshots drops expired entries from the manifest while a
        # kept snapshot's read_set may still reference their dirs, so a
        # manifest-derived empties set would let a data-less dir through
        # and crash the parquet reader ("Unable to infer schema").
        def _dir_has_parquet(p: str) -> bool:
            for _r, _d, files in os.walk(p):
                if any(f.endswith(".parquet") for f in files):
                    return True
            return False

        dirs = [
            os.path.join(self._dir(name), d) for d in snap_dirs
        ]
        dirs = [p for p in dirs if os.path.isdir(p) and _dir_has_parquet(p)]
        if scan_stats is not None:
            scan_stats.update(
                {"files_kept": 0, "files_skipped": 0, "files_unknown": 0}
            )
        # per-file stats live in the manifest entry of the snapshot that
        # WROTE each dir (an append's read_set references parent dirs)
        stats_by_dir = {
            f"snap_{s['id']}": s.get("files") for s in m["snapshots"]
        }
        # equality/membership predicates additionally consult each
        # dir's bloom sidecar (point lookups on unclustered layouts —
        # see sources/blooms.py); range predicates stay min/max-only
        bloom_preds: list[tuple] = []
        for col, op, val in prune or []:
            if op == "=":
                bloom_preds.append((col, _blooms.BloomTester([val])))
            elif op == "in":
                if isinstance(val, (str, bytes)):
                    vals = [val]
                else:
                    try:
                        vals = list(val)
                    except TypeError:
                        vals = [val]
                bloom_preds.append((col, _blooms.BloomTester(vals)))

        def _bloom_filter(d: str, kept: list[str]) -> list[str]:
            if not bloom_preds or not kept:
                return kept
            sc = _blooms.load_sidecar(d)
            if not sc:
                return kept
            dbase = os.path.basename(d)
            return [
                p for p in kept
                if all(
                    t.any_maybe_present(
                        (sc.get(self._then_name(m, dbase, c)) or {})
                        .get(p)
                    )
                    for c, t in bloom_preds
                )
            ]

        _del_keys_cache: dict[str, DataFrame] = {}

        def _post(df: DataFrame, dbase: str) -> DataFrame:
            # schema-evolution ops recorded AFTER this dir was written:
            # files carry the old schema, the view the new one (renames
            # are no-ops when the dir predates the column; drops select
            # the stored-but-retired bytes out of the view)
            for r in self._dir_schema_ops(m, dbase):
                if r["op"] == "rename":
                    df = df.withColumnRenamed(r["old"], r["new"])
                else:
                    df = df.drop(r["col"])
            # merge-on-read deletes: applied AFTER the schema ops, so
            # the delete's key_col (the name at delete time == a
            # current name — rename_column refuses while deletes are
            # pending) matches what the view exposes
            for e in deletes or []:
                if dbase not in (e.get("applies_to") or ()):
                    continue
                kc = e["key_col"]
                if kc not in df.columns:
                    continue  # dir predates the column: all-NULL keys
                if e.get("path") is None:
                    # predicate entry (delete_below_mor): removed rows
                    # are `kc < cutoff AND kc IS NOT NULL` — survivors
                    # keep NULLs (a NULL never satisfies the
                    # predicate, delete_below's rule). The cutoff was
                    # commit-time-verified castable to the column
                    # type, so the literal below is never NULL.
                    cut = F.lit(e["cutoff"]).cast(
                        df.schema[kc].dataType
                    )
                    df = df.filter(
                        F.col(kc).isNull() | (F.col(kc) >= cut)
                    )
                    continue
                kdf = _del_keys_cache.get(e["path"])
                if kdf is None:
                    kdf = self._load_delete_keys(name, e)
                    _del_keys_cache[e["path"]] = kdf
                kdf = kdf.select(
                    F.col(kc).cast(df.schema[kc].dataType)
                )
                df = df.join(F.broadcast(kdf), on=kc, how="left_anti")
            return df

        parts: list[DataFrame] = []
        for d in dirs:
            dbase = os.path.basename(d)
            finfo = stats_by_dir.get(dbase)
            allow = (only_files or {}).get(dbase)
            # stats/blooms are keyed by the names the files were
            # WRITTEN with — translate current-name predicates per dir.
            # A None translation (column dropped after this dir, later
            # re-added) means the dir's old stats must not answer for
            # the new column: the predicate is omitted (file kept,
            # conservative).
            prune_d = None
            if prune:
                prune_d = []
                for c, op, v in prune:
                    then = self._then_name(m, dbase, c)
                    if then is not None:
                        prune_d.append((then, op, v))
            if allow is not None:
                kept = list(allow)
                if prune_d and finfo is not None:
                    fstats = {f["path"]: f["stats"] for f in finfo}
                    # files the manifest doesn't know stay (conservative)
                    kept = [
                        p for p in kept
                        if p not in fstats
                        or _file_may_match(fstats[p], prune_d)
                    ]
                kept = _bloom_filter(d, kept)
                if scan_stats is not None:
                    scan_stats["files_kept"] += len(kept)
                    scan_stats["files_skipped"] += len(allow) - len(kept)
                if not kept:
                    continue
                parts.append(_post(
                    self.spark.read.option("basePath", d).parquet(
                        *[os.path.join(d, p) for p in kept]
                    ), dbase,
                ))
            elif prune_d and finfo is not None:
                kept = _bloom_filter(d, [
                    f["path"] for f in finfo
                    if _file_may_match(f["stats"], prune_d)
                ])
                if scan_stats is not None:
                    scan_stats["files_kept"] += len(kept)
                    scan_stats["files_skipped"] += len(finfo) - len(kept)
                if not kept:
                    continue
                if len(kept) == len(finfo):
                    parts.append(_post(self.spark.read.parquet(d), dbase))
                else:
                    # basePath keeps hive-style partition columns intact
                    # when listing individual files under a partitioned
                    # snapshot dir
                    parts.append(_post(
                        self.spark.read.option("basePath", d).parquet(
                            *[os.path.join(d, p) for p in kept]
                        ), dbase,
                    ))
            else:
                if scan_stats is not None and prune:
                    scan_stats["files_unknown"] += 1  # legacy dir: kept
                parts.append(_post(self.spark.read.parquet(d), dbase))
        if not parts:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(
                json.loads(schema_json)
            ) if schema_json else StructType([])
            # retroactive schema-op semantics: an empty view still
            # answers with the CURRENT schema, same as a populated one
            for r in m.get("schema_ops") or []:
                if r["op"] == "rename":
                    for f in schema.fields:
                        if f.name == r["old"]:
                            f.name = r["new"]
                else:
                    schema = type(schema)(
                        [f for f in schema.fields if f.name != r["col"]]
                    )
            return self.spark.createDataFrame([], schema)
        # each snapshot dir is its own partition-discovery root (they may be
        # partitioned); union them by name. allowMissingColumns: an
        # append-chain written across a schema widening (e.g. lineage
        # gaining columns in a later release) unions old 11-col snapshots
        # with new 13-col appends — strict unionByName would raise
        # AnalysisException on the resume path; absent columns become null.
        from functools import reduce

        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True),
            parts[1:],
            parts[0],
        )

    def read_incremental(
        self,
        name: str,
        since_snapshot_id: str,
        prune: list | None = None,
        scan_stats: dict | None = None,
    ) -> DataFrame:
        """Rows APPENDED after ``since_snapshot_id`` — the Iceberg
        incremental-scan analogue, the consumer side of this repo's
        incremental producers: a downstream training job remembers the
        snapshot it last exported and reads only the new clips, never
        rescanning the corpus.

        Honest semantics (matching Iceberg's incremental read): valid
        ONLY over a pure append chain. If any snapshot since the anchor
        is an overwrite/compact/rollback product, or the anchor itself
        expired out of the manifest, the delta is not representable as
        "new dirs" and this RAISES ``IncrementalReadError`` — the
        caller falls back to a full read and re-anchors, instead of
        silently receiving re-delivered or missing rows. Reading since
        the current snapshot returns an empty frame with the table
        schema."""
        m = self._load_manifest(name)
        cur = self._snapshot(m, None)
        if cur is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        try:
            self._snapshot(m, since_snapshot_id)
        except KeyError:
            raise IncrementalReadError(
                f"{name}: anchor snapshot {since_snapshot_id} is not in "
                "the manifest (expired or foreign) — full read + "
                "re-anchor required"
            )
        chain: list[dict] = []
        s: dict | None = cur
        while s is not None and s["id"] != since_snapshot_id:
            chain.append(s)
            if s["parent"] is None:
                s = None
                break
            try:
                s = self._snapshot(m, s["parent"])
            except KeyError:
                s = None
                break
        if s is None:
            raise IncrementalReadError(
                f"{name}: {since_snapshot_id} is not an ancestor of the "
                "current snapshot (rollback/expire broke the chain) — "
                "full read + re-anchor required"
            )
        non_append = [c["id"] for c in chain if c["mode"] != "append"]
        if non_append:
            raise IncrementalReadError(
                f"{name}: non-append snapshots {non_append} since "
                f"{since_snapshot_id} (overwrite/compact rewrite "
                "history) — full read + re-anchor required"
            )
        # each append's OWN dir holds exactly its new rows
        new_dirs = [f"snap_{c['id']}" for c in chain]
        return self._union_snapshot_dirs(
            name, m, new_dirs, cur.get("schema"), prune, scan_stats
        )

    def _conform(self, df: DataFrame, schema) -> DataFrame:
        """Project ``df`` onto ``schema``'s columns (missing -> typed
        NULL) so two snapshot views are set-op comparable across a
        schema widening."""
        cols = []
        have = set(df.columns)
        for f in schema.fields:
            cols.append(
                F.col(f.name) if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
        return df.select(*cols)

    def read_changelog(
        self,
        name: str,
        since_snapshot_id: str,
        change_col: str = "_change_type",
        scan_stats: dict | None = None,
    ) -> DataFrame:
        """Row-level NET changes between ``since_snapshot_id`` and the
        current snapshot — the CDC complement of ``read_incremental``
        (Iceberg ``create_changelog_view`` analogue). Returns the
        table's rows plus ``change_col`` in {'insert', 'delete'}: a
        consumer applies deletes then inserts to its anchored copy and
        lands exactly on the current table, WITHOUT a full resync —
        the escape hatch read_incremental's honest
        ``IncrementalReadError`` points at when an upsert (correction),
        delete_where (takedown) or overwrite broke the append-only
        chain.

        Shape: the two views share every carried-forward dir, so the
        diff reads ONLY the dirs that differ — ``exceptAll`` both ways
        over (added dirs, removed dirs) — and within those dirs,
        FILES the two sides share by inode identity (the hard-linked
        carry-forwards of a file-level COW upsert/delete) cancel out
        of both sides before anything is read: identical files
        contribute identical row multisets, and (A+C)−(B+C) = A−B
        under multiset difference. A 2-row correction on a clustered
        100 TB table diffs the rewritten files, not the corpus.
        ``scan_stats`` (optional dict) receives files_diffed /
        files_cancelled counts. An intervening ``compact`` rewrites
        every dir (fresh inodes), making
        the diff a 2x full scan (still correct — net changes across a
        compact are zero — just no longer cheap): re-anchor after
        compaction. An unchanged row never surfaces (net-change
        semantics); a replaced row surfaces twice — its old image as
        'delete', its new image as 'insert'.

        Merge-on-read deletes (``delete_keys_mor``) surface correctly
        even though they move NO files: a delete file added since the
        anchor emits its matching rows (as the anchor saw them) as
        'delete' via a key-pruned scan of the dirs it applies to; a
        removed one (rollback) emits them as 'insert'. A consumer
        therefore replays takedowns without a resync — the CDC path
        the MOR commit itself cannot offer read_incremental.

        No ancestry requirement (a rollback target works; the result
        is the honest delta between the two views), but every
        differing dir must still exist on disk: if ``expire_snapshots``
        reclaimed one, this RAISES ``IncrementalReadError`` — full
        read + re-anchor, never a silently incomplete delta."""
        from pyspark.sql.types import StringType, StructField, StructType

        m = self._load_manifest(name)
        cur = self._snapshot(m, None)
        if cur is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        try:
            anchor = self._snapshot(m, since_snapshot_id)
        except KeyError:
            raise IncrementalReadError(
                f"{name}: anchor snapshot {since_snapshot_id} is not "
                "in the manifest (expired or foreign) — full read + "
                "re-anchor required"
            )
        cur_set = set(cur["read_set"])
        old_set = set(anchor["read_set"])
        added = sorted(cur_set - old_set)
        removed = sorted(old_set - cur_set)
        # merge-on-read delete files that differ between the two views:
        # the read_sets can be IDENTICAL across a delete_keys_mor (that
        # is its point — no data file moved), so the dir diff alone
        # would report "no changes" while rows logically vanished. An
        # added delete file emits its matching rows (as visible at the
        # anchor) as 'delete'; a removed one (rollback to pre-delete)
        # emits them as 'insert'. Key-scoped: the extra pass prunes the
        # scanned dirs by the delete keys before reading.
        cur_dels = {
            self._del_id(e): e for e in self._pending_deletes(cur)
        }
        old_dels = {
            self._del_id(e): e for e in self._pending_deletes(anchor)
        }
        added_dels = [
            e for p, e in sorted(cur_dels.items()) if p not in old_dels
        ]
        removed_dels = [
            e for p, e in sorted(old_dels.items()) if p not in cur_dels
        ]
        # key-FILE dirs the diff must read (predicate entries live
        # wholly in the manifest — nothing on disk to verify)
        used_del_paths = sorted(
            {
                e["path"]
                for e in added_dels + removed_dels
                if e.get("path")
            }
            | {
                e["path"]
                for e in cur_dels.values()
                if e.get("path")
                and set(e.get("applies_to") or ()) & set(added)
            }
            | {
                e["path"]
                for e in old_dels.values()
                if e.get("path")
                and set(e.get("applies_to") or ()) & set(removed)
            }
        )
        missing = [
            d for d in added + removed + used_del_paths
            if not os.path.isdir(os.path.join(self._dir(name), d))
        ]
        if missing:
            raise IncrementalReadError(
                f"{name}: snapshot dirs {missing} needed for the "
                f"changelog since {since_snapshot_id} were expired — "
                "full read + re-anchor required"
            )
        schema = (
            StructType.fromJson(json.loads(cur["schema"]))
            if cur.get("schema") else None
        )
        if schema is None:
            # legacy manifest without a schema stamp: derive from the
            # current view (non-empty by construction when dirs differ)
            schema = self.read(name).schema
        out_schema = StructType(
            schema.fields + [StructField(change_col, StringType(), False)]
        )
        if not added and not removed and not added_dels \
                and not removed_dels:
            if scan_stats is not None:
                scan_stats.update(
                    {"files_diffed": 0, "files_cancelled": 0}
                )
            return self.spark.createDataFrame([], out_schema)

        # inode-identity cancellation: a hard-linked carry-forward is
        # THE SAME file on both sides — drop one occurrence from each
        # (multiset matching; a copied fallback has a fresh inode and
        # simply stays in the diff: slower, never wrong)
        from collections import Counter

        def _files_with_ino(dirs):
            per_dir = {}
            for d in dirs:
                root = os.path.join(self._dir(name), d)
                lst = []
                for r, _dd, fs in os.walk(root):
                    for f in sorted(fs):
                        if f.endswith(".parquet"):
                            p = os.path.join(r, f)
                            st = os.stat(p)
                            lst.append((
                                os.path.relpath(p, root),
                                (st.st_dev, st.st_ino),
                            ))
                per_dir[d] = lst
            return per_dir

        add_files = _files_with_ino(added)
        rem_files = _files_with_ino(removed)
        shared = Counter(
            ino for lst in add_files.values() for _, ino in lst
        ) & Counter(
            ino for lst in rem_files.values() for _, ino in lst
        )

        def _survivors(per_dir):
            budget = dict(shared)
            only = {}
            for d, lst in per_dir.items():
                keep = []
                for rel, ino in lst:
                    if budget.get(ino, 0) > 0:
                        budget[ino] -= 1
                    else:
                        keep.append(rel)
                only[d] = keep
            return only

        only_add, only_rem = _survivors(add_files), _survivors(rem_files)
        if scan_stats is not None:
            scan_stats.update({
                "files_diffed": sum(
                    len(v) for m2 in (only_add, only_rem)
                    for v in m2.values()
                ),
                "files_cancelled": 2 * sum(shared.values()),
            })
        new_rows = self._conform(
            self._union_snapshot_dirs(
                name, m, added, cur.get("schema"), only_files=only_add,
                deletes=list(cur_dels.values()),
            ),
            schema,
        )
        old_rows = self._conform(
            self._union_snapshot_dirs(
                name, m, removed, cur.get("schema"),
                only_files=only_rem,
                deletes=list(old_dels.values()),
            ),
            schema,
        )
        out = (
            new_rows.exceptAll(old_rows)
            .withColumn(change_col, F.lit("insert"))
            .unionByName(
                old_rows.exceptAll(new_rows)
                .withColumn(change_col, F.lit("delete"))
            )
        )

        def _mor_rows(entry: dict, apply_dels: list, label: str):
            """Rows a delete-file diff adds to the changelog: rows of
            the SHARED dirs (in both views — differing dirs are already
            covered by the dir diff above) matching the entry's keys
            or predicate, as visible on the side that still showed
            them (the other side's deletes applied). Scoped: per-file
            min/max and bloom pruning on the keys/range run before any
            data is read."""
            dirs = [
                d for d in entry.get("applies_to") or []
                if d in cur_set and d in old_set
            ]
            if not dirs:
                return None
            kc = entry["key_col"]
            if entry.get("path") is None:
                # predicate entry: its removed rows are a range scan
                rows = self._union_snapshot_dirs(
                    name, m, dirs, cur.get("schema"),
                    prune=[(kc, "<", entry["cutoff"])],
                    deletes=apply_dels,
                )
                if kc not in rows.columns:
                    return None
                cut = F.lit(entry["cutoff"]).cast(
                    rows.schema[kc].dataType
                )
                rows = rows.filter(
                    F.col(kc).isNotNull() & (F.col(kc) < cut)
                )
                return self._conform(rows, schema).withColumn(
                    change_col, F.lit(label)
                )
            kdf = self._load_delete_keys(name, entry)
            import pyarrow.parquet as pq

            kvals: list = []
            dpath = os.path.join(self._dir(name), entry["path"])
            for root, _d, fs in os.walk(dpath):
                for fn in fs:
                    if fn.endswith(".parquet"):
                        kvals += pq.read_table(
                            os.path.join(root, fn), columns=[kc]
                        ).column(kc).to_pylist()
            rows = self._union_snapshot_dirs(
                name, m, dirs, cur.get("schema"),
                prune=[(kc, "in", kvals)], deletes=apply_dels,
            )
            if kc not in rows.columns:
                return None
            rows = rows.join(
                F.broadcast(
                    kdf.select(
                        F.col(kc).cast(rows.schema[kc].dataType)
                    )
                ),
                on=kc, how="left_semi",
            )
            return self._conform(rows, schema).withColumn(
                change_col, F.lit(label)
            )

        # each pass also applies the entries already processed: two
        # added deletes with overlapping keys must emit the shared row
        # ONCE (net-change semantics), not once per delete file
        acc = list(old_dels.values())
        for e in added_dels:
            part = _mor_rows(e, acc, "delete")
            acc = acc + [e]
            if part is not None:
                out = out.unionByName(part)
        acc = list(cur_dels.values())
        for e in removed_dels:
            part = _mor_rows(e, acc, "insert")
            acc = acc + [e]
            if part is not None:
                out = out.unionByName(part)
        return out

    def compact(
        self,
        name: str,
        target_files: int | None = None,
        partition_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> str | None:
        """Rewrite the CURRENT view as one fresh snapshot dir (the
        Iceberg ``rewrite_data_files`` analogue). An append-heavy table
        — per-run signature-history appends, streaming micro-batch
        commits — accretes one small snap dir per commit, and every
        read unions N dirs: at scale the listing, per-dir partition
        discovery, and footer fetches dominate the scan, and manifest
        file-stat pruning has N entries to walk. Compaction reads the
        current read_set once and commits it back as a single snapshot
        (mode='compact'); older snapshots stay time-travelable until
        expire_snapshots reclaims them. Returns the new snapshot id,
        None when the view is already one dir (no-op) or on a commit
        conflict.

        Concurrency: the rewrite happens OUTSIDE the table lock; at
        commit time, if 'current' moved since the source snapshot was
        read (a concurrent append), the compaction ABORTS — optimistic
        concurrency, Iceberg's commit-conflict model — leaving its
        orphan dir for expire_snapshots' grace sweep. Re-run it; never
        blind-commit, which would silently drop the concurrent append.

        The source snapshot's ``source_fingerprint`` property is
        carried over so is_unchanged-based ingest idempotency survives
        a compaction. ``partition_by`` and ``cluster_by`` default to
        the source snapshot's recorded layout (sticky across
        compactions); ``target_files`` repartitions (e.g. 8 for a
        small history table) — default leaves Spark's partitioning.

        Compaction is also where clustering PAYS OFF on append-heavy
        tables: each append lands in arrival order, so after N appends
        every file's [min, max] overlaps every key range and
        ``read(prune=...)`` degrades to a full scan. ``compact(...,
        cluster_by=["id"])`` re-sorts the whole view into disjoint-
        range files (Iceberg's sort-order rewrite), restoring O(result)
        file reads for point/range lookups — the takedown/changelog
        access pattern on a 100-TB history table."""
        self._refuse_on_branch("compact")
        m0 = self._load_manifest(name)
        base = self._snapshot(m0, None)
        if base is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        if (
            len(base["read_set"]) <= 1
            and cluster_by is None
            and zorder_by is None
            and bloom_cols is None
            and not self._renames_pending(m0, base["read_set"])
            and not self._pending_deletes(base)
        ):
            # single dir + no EXPLICIT re-layout request: nothing to do.
            # An explicit cluster_by/zorder_by (sort-order change),
            # bloom_cols (add/drop bloom sidecars), a pending column
            # rename (files still carry old names; this rewrite is what
            # re-enables file-level COW), or pending MOR delete files
            # (this rewrite is what MATERIALIZES them — read() below
            # applies the anti-joins, and the compacted entry carries
            # no delete_files) still rewrites.
            return None
        df = self.read(name, base["id"])
        if cluster_by is None and zorder_by is None:
            # sticky default: appends don't carry a cluster spec, so walk
            # the parent chain back to the last FULL rewrite (write
            # overwrite / compact) — that snapshot defines the layout.
            # An unclustered full rewrite deliberately resets it.
            s: dict | None = base
            while s is not None:
                if s.get("cluster_by"):
                    cluster_by = list(s["cluster_by"])
                    break
                if s.get("zorder_by"):
                    zorder_by = list(s["zorder_by"])
                    break
                if s.get("mode") in ("overwrite", "compact"):
                    break
                try:
                    s = (
                        self._snapshot(m0, s["parent"])
                        if s.get("parent")
                        else None
                    )
                except KeyError:  # parent expired from the manifest
                    s = None
        if partition_by is None:
            partition_by = base.get("partition_by") or None
        df = _cluster_frame(
            df, cluster_by, partition_by, target_files, zorder_by
        )
        sid = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self._dir(name), f"snap_{sid}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        files = _collect_file_stats(data_dir)
        if bloom_cols is None:
            # sticky like cluster_by: a compaction keeps the table's
            # bloom spec; pass bloom_cols=[...] to ADD blooms during the
            # maintenance-layout compact (and [] to drop them)
            bloom_cols = base.get("bloom_cols") or None
        bloom_cols = bloom_cols or None
        self._write_bloom_sidecar(name, data_dir, files, bloom_cols)
        # absorbed_read_set: the dirs this compaction rewrote. Lives in
        # PROPERTIES (not just the manifest entry) because expire keeps
        # property records after dropping entries — the crash/replay
        # guards (_find_committed_write) follow it transitively so a
        # shard append whose dir was rewritten away still counts as
        # part of the current view (its DATA is; forgetting it would
        # make a crash-rerun re-append and duplicate rows).
        props = {
            "compaction_of": base["id"],
            "absorbed_read_set": list(base["read_set"]),
        }
        if self._pending_deletes(base):
            # the read above went through read() => the MOR deletes are
            # applied in the rewrite; record that this compact is the
            # materialization point (their deletes_ dirs become
            # expirable once the pre-compact snapshots age out)
            props["materialized_delete_files"] = len(
                self._pending_deletes(base)
            )
        fp = base.get("properties", {}).get("source_fingerprint")
        if fp is not None:
            props["source_fingerprint"] = fp
        with self._table_lock(name):
            m = self._load_manifest(name)
            if m["current"] != base["id"]:
                _log.warning(
                    "compact(%s): current moved %s -> %s during the "
                    "rewrite (concurrent commit); aborting — orphan "
                    "dir snap_%s left for expire_snapshots' grace "
                    "sweep; re-run compact",
                    name, base["id"], m["current"], sid,
                )
                return None
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": "compact",
                    "parent": base["id"],
                    "read_set": [f"snap_{sid}"],
                    "partition_by": partition_by or [],
                    "cluster_by": cluster_by or [],
                    "zorder_by": zorder_by or [],
                    "bloom_cols": bloom_cols or [],
                    "properties": props,
                    "schema": df.schema.json(),
                    "has_data": bool(files),
                    "files": files,
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
        return sid

    def binpack(
        self,
        name: str,
        small_file_bytes: int = 64 * 1024 * 1024,
        target_files: int | None = None,
    ) -> dict:
        """Incremental small-file compaction (Iceberg's binpack
        rewrite): merge ONLY the data files smaller than
        ``small_file_bytes``; every file at or above the threshold is
        hard-linked forward untouched. ``compact`` rewrites the whole
        view — correct for a re-layout (cluster/zorder/rename
        normalization) but unaffordable as routine maintenance on a
        100-TB table where streaming micro-batches and shard appends
        keep dripping KB-scale files next to TB of already-right-sized
        data. binpack is the routine op: cost proportional to the
        SMALL-file bytes, not the table, while still collapsing the
        read_set to one dir (the per-dir listing/discovery overhead N
        appends accrete is the other half of the small-file tax).

        Deliberately does NOT re-sort: merged files lose per-file
        range disjointness (same as Iceberg binpack); the snapshot
        records an empty cluster spec but the sticky-spec walk
        (mode='binpack' is not a full rewrite) still finds the layout
        for the next real ``compact``. Incremental consumers honestly
        refuse across it (rows moved files). Same optimistic-commit
        protocol as compact; absorbed_read_set keeps the crash/replay
        closure. Row counts are preserved exactly (merged files are
        read and rewritten verbatim; fsck-clean, tested).

        Returns {snapshot, files_merged, files_carried, dirs_absorbed,
        bytes_merged, aborted}; snapshot None when fewer than two
        small files exist (nothing worth merging — dir consolidation
        alone is compact's job). Schema drift across dirs or a pending
        rename refuses with the compact-first hint (mixed-schema /
        mixed-name files in one dir would corrupt inference)."""
        self._refuse_on_branch("binpack")
        out = {
            "snapshot": None, "files_merged": 0, "files_carried": 0,
            "dirs_absorbed": 0, "bytes_merged": 0, "aborted": False,
        }
        m0 = self._load_manifest(name)
        base = self._snapshot(m0, None)
        if base is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        if self._renames_pending(m0, base["read_set"]):
            raise RuntimeError(
                f"binpack({name}): a schema-evolution op (rename/drop) "
                "is pending on dirs written before it; run compact() "
                "first to normalize file schemas, then retry"
            )
        if not self._carry_is_safe(m0, base, list(base["read_set"])):
            raise RuntimeError(
                f"binpack({name}): snapshots disagree on schema — "
                "carrying files forward would mix schemas in one dir; "
                "run compact() (full rewrite onto one schema) instead"
            )
        self._refuse_pending_deletes(f"binpack({name})", base)
        # disk-based classification: file size is not in the manifest
        # (and need not be — this is a driver-side listing, no data read)
        only_files: dict[str, list[str]] = {}
        carry: dict[str, list[str]] = {}
        bytes_small = 0
        for d in base["read_set"]:
            dpath = os.path.join(self._dir(name), d)
            smalls: list[str] = []
            bigs: list[str] = []
            for root, _dirs, fs in os.walk(dpath):
                for fn in fs:
                    if not fn.endswith(".parquet"):
                        continue
                    p = os.path.join(root, fn)
                    rel = os.path.relpath(p, dpath)
                    sz = os.path.getsize(p)
                    if sz < small_file_bytes:
                        smalls.append(rel)
                        bytes_small += sz
                    else:
                        bigs.append(rel)
            only_files[d] = smalls
            carry[d] = bigs
        n_small = sum(len(v) for v in only_files.values())
        if n_small < 2:
            return out  # nothing worth merging
        out["files_merged"] = n_small
        out["files_carried"] = sum(len(v) for v in carry.values())
        out["dirs_absorbed"] = len(base["read_set"])
        out["bytes_merged"] = bytes_small
        df = self._union_snapshot_dirs(
            name, m0, list(base["read_set"]), base.get("schema"),
            only_files=only_files,
        )
        # merge toward threshold-sized outputs; partition dirs split
        # the coalesced tasks further, which only makes files smaller
        # (never a giant file)
        n_out = target_files or max(
            1, -(-bytes_small // max(1, small_file_bytes))
        )
        df = df.repartition(n_out)
        partition_by = base.get("partition_by") or None
        sid = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self._dir(name), f"snap_{sid}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        self._carry_clean_files(name, carry, data_dir)
        files = _collect_file_stats(data_dir)
        bloom_cols = base.get("bloom_cols") or None
        self._write_bloom_sidecar(name, data_dir, files, bloom_cols, carry)
        props = {
            "binpack_of": base["id"],
            "small_file_bytes": int(small_file_bytes),
            "absorbed_read_set": list(base["read_set"]),
        }
        fp = base.get("properties", {}).get("source_fingerprint")
        if fp is not None:
            props["source_fingerprint"] = fp
        with self._table_lock(name):
            m = self._load_manifest(name)
            if m["current"] != base["id"]:
                _log.warning(
                    "binpack(%s): current moved %s -> %s during the "
                    "rewrite (concurrent commit); aborting — orphan "
                    "dir snap_%s left for expire_snapshots' grace "
                    "sweep; re-run",
                    name, base["id"], m["current"], sid,
                )
                out["aborted"] = True
                return out
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": "binpack",
                    "parent": base["id"],
                    "read_set": [f"snap_{sid}"],
                    "partition_by": partition_by or [],
                    "bloom_cols": bloom_cols or [],
                    "properties": props,
                    "schema": df.schema.json(),
                    "has_data": bool(files),
                    "files": files,
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
        out["snapshot"] = sid
        return out

    def _split_by_overlap(self, read_set, stats_by_dir, overlap_fn):
        """Classify a read_set at FILE granularity for a COW rewrite.
        Returns (affected_dirs, untouched_dirs, only_files, carry):
        ``affected_dirs`` have at least one possibly-overlapping file
        (or no recorded file stats — legacy dirs, rewritten whole and
        deliberately absent from ``only_files``/``carry``);
        ``only_files`` maps each stats-bearing affected dir to the
        files that must be read+rewritten; ``carry`` maps it to the
        provably-clean files to hard-link forward untouched."""
        affected: list[str] = []
        untouched: list[str] = []
        only_files: dict[str, list[str]] = {}
        carry: dict[str, list[str]] = {}
        for d in read_set:
            finfo = stats_by_dir.get(d)
            if finfo is None:
                affected.append(d)  # legacy: no stats, rewrite whole
                continue
            hot = [f["path"] for f in finfo if overlap_fn(d, f)]
            if not hot:
                untouched.append(d)
                continue
            affected.append(d)
            only_files[d] = hot
            hot_set = set(hot)
            carry[d] = [
                f["path"] for f in finfo if f["path"] not in hot_set
            ]
        return affected, untouched, only_files, carry

    def _carry_is_safe(
        self, m: dict, base: dict, affected: list[str],
        incoming_schema=None,
    ) -> bool:
        """Carry-forward is safe only when every affected dir's
        recorded schema equals the current table schema (see
        _schema_key) and, for upsert, the incoming frame does not
        widen it (its (name, type)s all exist in the base schema).
        Otherwise the new dir would mix file schemas; fall back to
        whole-dir rewrites (the pre-file-COW behavior)."""
        cur_key = _schema_key(base.get("schema"))
        if cur_key is None:
            return False
        schema_by_dir = {
            f"snap_{s['id']}": _schema_key(s.get("schema"))
            for s in m["snapshots"]
        }
        if any(schema_by_dir.get(d) != cur_key for d in affected):
            return False
        if incoming_schema is not None:
            cur_types = dict(cur_key)
            for f in incoming_schema.fields:
                t = json.dumps(f.dataType.jsonValue(), sort_keys=True)
                if cur_types.get(f.name) != t:
                    return False
        return True

    def _hint_unclustered(
        self, name: str, key_col: str, out: dict,
        carry_safe: bool = True, total_files: int | None = None,
    ) -> None:
        """One log line when a COW rewrite degenerated to the whole
        table: every dir was affected and nothing could carry. On the
        hash-sharded ingest layout that is EXPECTED until the table is
        cluster-compacted — tell the operator the lever exists instead
        of letting 'correction took an hour' get debugged from zero.

        Only emitted when clustering is actually the cause:
        ``carry_safe=False`` means carry-forward was disabled by the
        schema-drift fallback (cluster-compacting would not help —
        say so instead), and a ≤1-file table rewrites whole trivially
        (no hint)."""
        if not (
            out.get("dirs_untouched") == 0
            and out.get("files_carried") == 0
            and out.get("dirs_rewritten", 0) > 0
        ):
            return
        if total_files is not None and total_files <= 1:
            return  # single-file table: whole-table rewrite is expected
        if not carry_safe:
            _log.warning(
                "%s: copy-on-write rewrite touched every file because "
                "carry-forward was disabled by schema drift between "
                "snapshots (not a clustering problem); a full "
                "compact(%r) rewrites the table onto one schema and "
                "restores file-level COW",
                name, name,
            )
            return
        _log.warning(
            "%s: copy-on-write rewrite touched every file (no "
            "carry-forward possible) — the layout is not %s-"
            "clustered; compact(%r, cluster_by=[%r]) bounds future "
            "corrections/takedowns to the overlapping files",
            name, key_col, name, key_col,
        )

    def _carry_clean_files(
        self, name: str, carry: dict, data_dir: str
    ) -> None:
        """Hard-link every provably-clean file of the rewritten dirs
        into the new snapshot dir, preserving relative (hive
        partition) paths — zero data copy, and the shared inode lets
        read_changelog cancel carried files out of its diff."""
        for d, rels in carry.items():
            src = os.path.join(self._dir(name), d)
            for rel in rels:
                _link_or_copy(
                    os.path.join(src, rel), os.path.join(data_dir, rel)
                )

    # -- bloom sidecars (see sources/blooms.py) ------------------------------

    def _bloom_lookup(self, name: str, key_col: str):
        """Lazy per-operation ``(dir_basename, rel) -> bloom entry``
        lookup; each dir's sidecar is loaded at most once."""
        cache: dict[str, dict] = {}

        def get(d: str, rel: str | None):
            if rel is None:
                return None
            sc = cache.get(d)
            if sc is None:
                sc = _blooms.load_sidecar(
                    os.path.join(self._dir(name), d)
                ) or {}
                cache[d] = sc
            return (sc.get(key_col) or {}).get(rel)

        return get

    def _write_bloom_sidecar(
        self,
        name: str,
        data_dir: str,
        files: list[dict],
        bloom_cols: list[str] | None,
        carry: dict | None = None,
    ) -> None:
        """Record per-file key blooms for a freshly committed snapshot
        dir. Carried (hard-linked) files inherit their entries by INODE
        from the source dirs' sidecars — the bloom describes immutable
        file contents, so a link keeps it valid and costs no re-read;
        only genuinely fresh files get the one distributed build pass.
        Best-effort: any failure logs and leaves the dir sidecar-less
        (reads/maintenance degrade to min/max pruning)."""
        if not bloom_cols or not files:
            return
        try:
            inherited: dict[int, dict[str, dict]] = {}
            for d, rels in (carry or {}).items():
                src_dir = os.path.join(self._dir(name), d)
                sc = _blooms.load_sidecar(src_dir)
                if not sc:
                    continue
                for rel in rels:
                    try:
                        ino = os.stat(os.path.join(src_dir, rel)).st_ino
                    except OSError:
                        continue
                    ent = {
                        c: sc[c][rel]
                        for c in bloom_cols
                        if rel in sc.get(c, {})
                    }
                    if ent:
                        inherited[ino] = ent
            payload: dict[str, dict] = {c: {} for c in bloom_cols}
            fresh: list[str] = []
            rows_by_rel: dict[str, int] = {}
            for f in files:
                rel = f["path"]
                rows_by_rel[rel] = f.get("rows") or 0
                got = None
                if inherited:
                    try:
                        got = inherited.get(
                            os.stat(os.path.join(data_dir, rel)).st_ino
                        )
                    except OSError:
                        got = None
                if got and all(c in got for c in bloom_cols):
                    for c in bloom_cols:
                        # drop any '_bits' decode cache before persisting
                        payload[c][rel] = {
                            k: v for k, v in got[c].items()
                            if not k.startswith("_")
                        }
                else:
                    fresh.append(rel)
            for c in bloom_cols:
                if fresh:
                    payload[c].update(
                        _blooms.build_bloom_entries(
                            self.spark, data_dir, fresh, c,
                            rows_by_rel=rows_by_rel,
                        )
                    )
            payload = {c: m for c, m in payload.items() if m}
            if payload:
                _blooms.save_sidecar(data_dir, payload)
        except Exception:  # noqa: BLE001 - stats are best-effort
            _log.warning(
                "bloom sidecar build failed for %s (%s) — dir left "
                "without blooms; pruning degrades to min/max",
                data_dir, name, exc_info=True,
            )

    def rename_column(self, name: str, old: str, new: str) -> str:
        """Rename a column WITHOUT rewriting data (Iceberg schema
        evolution: renames are metadata; the files keep their written
        names and readers map at scan time). Commits a data-less
        ``mode='rename'`` snapshot whose read_set is the current view
        and whose schema/cluster/zorder/bloom specs carry the new name;
        the mapping itself is recorded in the manifest-level rename log
        (``renames``: old, new, and the dirs written BEFORE the rename)
        which survives snapshot GC — reads apply each dir's pending
        renames after scanning it, translate prune/bloom probes back to
        the names the files actually carry, and post-rename writes land
        new-name files natively.

        Semantics are RETROACTIVE like Iceberg's: time-traveling to a
        pre-rename snapshot shows the new name (the mapping follows the
        dir, not the snapshot) — values are untouched either way.

        Partition columns refuse (their names are directory path
        segments, i.e. data layout — rewrite via ``compact(
        partition_by=...)``). File-level COW maintenance
        (delete/upsert/backfill) refuses while any current dir predates
        a rename — carried old-name files next to rewritten new-name
        files would corrupt the dir schema; one ``compact()``
        normalizes the files and restores COW."""
        self._refuse_on_branch("rename_column")
        with self._table_lock(name):
            m = self._load_manifest(name)
            base = self._snapshot(m, None)
            if base is None:
                raise FileNotFoundError(f"table {name} has no snapshots")
            if not base.get("schema"):
                raise ValueError(
                    f"table {name}: snapshot predates schema records — "
                    "compact first"
                )
            schema = json.loads(base["schema"])
            names = [f["name"] for f in schema["fields"]]
            if old not in names:
                raise KeyError(
                    f"rename_column({name}): no column {old!r} "
                    f"(have: {names})"
                )
            if new in names:
                raise ValueError(
                    f"rename_column({name}): column {new!r} already "
                    "exists"
                )
            if old in (base.get("partition_by") or []):
                raise ValueError(
                    f"rename_column({name}): {old!r} is a partition "
                    "column — its name is encoded in directory paths "
                    "(data layout, not metadata); rewrite via "
                    "compact(partition_by=[...])"
                )
            if any(
                e["key_col"] == old
                for e in self._pending_deletes(base)
            ):
                raise RuntimeError(
                    f"rename_column({name}): {old!r} is the key column "
                    "of a pending merge-on-read delete file — renaming "
                    "it would break the delete's scan-time anti-join; "
                    "run compact() first (materializes the deletes), "
                    "then rename"
                )
            for f in schema["fields"]:
                if f["name"] == old:
                    f["name"] = new

            def _sub(lst):
                return [new if c == old else c for c in (lst or [])]

            sid = uuid.uuid4().hex[:16]
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": "rename",
                    "parent": m["current"],
                    "read_set": list(base["read_set"]),
                    "partition_by": base.get("partition_by") or [],
                    "cluster_by": _sub(base.get("cluster_by")),
                    "zorder_by": _sub(base.get("zorder_by")),
                    "bloom_cols": _sub(base.get("bloom_cols")),
                    "properties": {
                        "renamed_from": old, "renamed_to": new,
                    },
                    "schema": json.dumps(schema),
                    "has_data": False,
                    "files": [],
                    # pending MOR deletes (on OTHER columns — same-col
                    # renames refuse above) ride along unchanged
                    **(
                        {"delete_files": self._pending_deletes(base)}
                        if self._pending_deletes(base) else {}
                    ),
                }
            )
            # the mapping must outlive snapshot GC (an expired rename
            # ENTRY would silently un-rename every old dir): tiny
            # manifest-level ordered log, one record per schema op,
            # applied to exactly the dirs that existed before it
            m.setdefault("schema_ops", []).append(
                {
                    "op": "rename",
                    "old": old,
                    "new": new,
                    "dirs_before": sorted(
                        {
                            d
                            for s in m["snapshots"]
                            for d in s["read_set"]
                        }
                    ),
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
            return sid

    def drop_column(self, name: str, col: str) -> str:
        """Drop a column WITHOUT rewriting data (Iceberg schema
        evolution): metadata-only — old files keep the bytes, reads
        select the column out per pre-drop dir. NOT erasure: physical
        removal of the stored values needs one ``compact()`` (which
        reads the post-drop view and writes files without the column)
        followed by ``expire_snapshots`` — the same two-step contract
        as takedown-hard, stated not hidden. A later column with the
        same name is a NEW column: pre-drop dirs contribute NULL for
        it, never their old bytes.

        Partition columns refuse (path segments). Same COW-until-
        compact rule as rename (mixed-schema dirs)."""
        self._refuse_on_branch("drop_column")
        with self._table_lock(name):
            m = self._load_manifest(name)
            base = self._snapshot(m, None)
            if base is None:
                raise FileNotFoundError(f"table {name} has no snapshots")
            if not base.get("schema"):
                raise ValueError(
                    f"table {name}: snapshot predates schema records — "
                    "compact first"
                )
            schema = json.loads(base["schema"])
            names = [f["name"] for f in schema["fields"]]
            if col not in names:
                raise KeyError(
                    f"drop_column({name}): no column {col!r} "
                    f"(have: {names})"
                )
            if col in (base.get("partition_by") or []):
                raise ValueError(
                    f"drop_column({name}): {col!r} is a partition "
                    "column — rewrite via compact(partition_by=[...])"
                )
            if any(
                e["key_col"] == col
                for e in self._pending_deletes(base)
            ):
                raise RuntimeError(
                    f"drop_column({name}): {col!r} is the key column "
                    "of a pending merge-on-read delete file — dropping "
                    "it would break the delete's scan-time anti-join; "
                    "run compact() first (materializes the deletes), "
                    "then drop"
                )
            schema["fields"] = [
                f for f in schema["fields"] if f["name"] != col
            ]

            def _without(lst):
                return [c for c in (lst or []) if c != col]

            sid = uuid.uuid4().hex[:16]
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": "drop_column",
                    "parent": m["current"],
                    "read_set": list(base["read_set"]),
                    "partition_by": base.get("partition_by") or [],
                    "cluster_by": _without(base.get("cluster_by")),
                    "zorder_by": _without(base.get("zorder_by")),
                    "bloom_cols": _without(base.get("bloom_cols")),
                    "properties": {"dropped_column": col},
                    "schema": json.dumps(schema),
                    "has_data": False,
                    "files": [],
                    # pending MOR deletes on OTHER columns ride along
                    **(
                        {"delete_files": self._pending_deletes(base)}
                        if self._pending_deletes(base) else {}
                    ),
                }
            )
            m.setdefault("schema_ops", []).append(
                {
                    "op": "drop",
                    "col": col,
                    "dirs_before": sorted(
                        {
                            d
                            for s in m["snapshots"]
                            for d in s["read_set"]
                        }
                    ),
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
            return sid

    @staticmethod
    def _dir_schema_ops(m: dict, dir_basename: str) -> list[dict]:
        """Ordered schema ops (rename/drop) pending on a dir — the ops
        recorded AFTER the dir was written (its files carry the older
        schema)."""
        return [
            r
            for r in m.get("schema_ops") or []
            if dir_basename in r.get("dirs_before", ())
        ]

    @classmethod
    def _then_name(cls, m: dict, dir_basename: str, col: str) -> str | None:
        """Translate a CURRENT column name back to the name this dir's
        files were written with (walk the dir's pending schema ops
        backward) — stat/bloom keys live under the written name.
        Returns None when the column does not exist in this dir's era
        (it was dropped after the dir and later re-added under the same
        name: the dir contributes NULL, its old stats must not answer
        for the new column — keep the file, conservative)."""
        for r in reversed(cls._dir_schema_ops(m, dir_basename)):
            if r["op"] == "rename" and col == r["new"]:
                col = r["old"]
            elif r["op"] == "drop" and col == r["col"]:
                return None
        return col

    def _renames_pending(self, m: dict, read_set: list[str]) -> bool:
        return any(self._dir_schema_ops(m, d) for d in read_set)

    def adopt_files(
        self,
        name: str,
        src_dir: str,
        mode: str = "append",
        properties: dict | None = None,
        bloom_cols: list[str] | None = None,
    ) -> str:
        """Adopt an EXISTING parquet directory as a snapshot WITHOUT
        copying data (Iceberg's ``add_files`` / Delta's CONVERT: the
        realistic way 100 TB of already-landed parquet comes under
        snapshot governance — re-writing it through ``write`` would
        double the storage and take days). Every ``.parquet`` under
        ``src_dir`` is HARD-LINKED into a fresh snap dir preserving its
        relative path (hive ``key=value`` partition segments keep
        working), per-file min/max stats come from the footers
        (metadata-only reads), and a normal manifest entry commits —
        after which reads, pruning, time travel, COW maintenance, and
        expire_snapshots treat the adopted files exactly like written
        ones. Cross-device sources fall back to a copy per file.

        Idempotent per (src_dir, file-listing fingerprint): re-adopting
        the same unchanged source returns the existing snapshot id
        instead of appending duplicate rows — the crash-rerun contract
        every ingest surface here keeps.

        GDPR note: the snap dir SHARES inodes with the source. A
        takedown's COW rewrite replaces the table's own files, and
        ``expire_snapshots`` only drops this table's links — physical
        erasure of adopted rows additionally requires deleting the
        source copy (stated, not hidden: same contract as any
        replicated input).

        ``mode='append'`` chains onto the current view;
        ``mode='overwrite'`` starts a fresh read_set. ``bloom_cols``
        builds point-lookup sidecars for the adopted files (one
        distributed key scan); append inherits the table's spec."""
        assert mode in ("overwrite", "append")
        self._refuse_on_branch("adopt_files")
        src_dir = os.path.abspath(src_dir)
        rels = []
        for root, _dirs, fnames in os.walk(src_dir):
            for f in sorted(fnames):
                if f.endswith(".parquet"):
                    rels.append(
                        os.path.relpath(os.path.join(root, f), src_dir)
                    )
        if not rels:
            raise FileNotFoundError(
                f"adopt_files: no parquet files under {src_dir}"
            )
        fp_src = hashlib.sha256()
        for rel in sorted(rels):
            st = os.stat(os.path.join(src_dir, rel))
            fp_src.update(
                f"{rel}\x00{st.st_size}\x00{st.st_mtime_ns}\x00".encode()
            )
        fingerprint = f"adopt:{src_dir}:{fp_src.hexdigest()[:32]}"
        m0 = self._load_manifest(name)
        for s in m0["snapshots"]:
            if (
                s.get("properties", {}).get("adopt_fingerprint")
                == fingerprint
            ):
                _log.info(
                    "adopt_files(%s): source %s unchanged since "
                    "snap_%s — skipping (idempotent replay)",
                    name, src_dir, s["id"],
                )
                return s["id"]

        sid = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self._dir(name), f"snap_{sid}")
        for rel in rels:
            dst = os.path.join(data_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(os.path.join(src_dir, rel), dst)
            except OSError:  # cross-device / FS without hard links
                shutil.copy2(os.path.join(src_dir, rel), dst)
        files = _collect_file_stats(data_dir)
        schema_json = self.spark.read.option(
            "basePath", data_dir
        ).parquet(data_dir).schema.json()
        # hive partition columns are exactly the path-segment keys —
        # recorded only when EVERY file agrees (a mixed layout would
        # make the recorded spec a lie; reads still work either way)
        def _pkeys(rel: str) -> tuple:
            return tuple(
                seg.split("=", 1)[0]
                for seg in os.path.dirname(rel).split(os.sep)
                if "=" in seg
            )

        keysets = {_pkeys(r) for r in rels}
        partition_by = list(keysets.pop()) if len(keysets) == 1 else []
        if bloom_cols is None and mode == "append":
            cur = self._snapshot(m0, None) if m0["current"] else None
            bloom_cols = (cur or {}).get("bloom_cols") or None
        self._write_bloom_sidecar(name, data_dir, files, bloom_cols)
        props = {
            "adopted_from": src_dir,
            "adopt_fingerprint": fingerprint,
            **(properties or {}),
        }
        with self._table_lock(name):
            m = self._load_manifest(name)
            carried_deletes: list[dict] = []
            if mode == "append" and m["current"] is not None:
                parent = self._snapshot(m, None)
                read_set = parent["read_set"] + [f"snap_{sid}"]
                # same carry as write(): pending MOR deletes keep their
                # parent-dir scope; adopted rows are outside it
                carried_deletes = self._pending_deletes(parent)
            else:
                read_set = [f"snap_{sid}"]
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": mode,
                    "parent": m["current"],
                    "read_set": read_set,
                    **(
                        {"delete_files": carried_deletes}
                        if carried_deletes else {}
                    ),
                    "partition_by": partition_by,
                    "cluster_by": [],
                    "zorder_by": [],
                    "bloom_cols": bloom_cols or [],
                    "properties": props,
                    "schema": schema_json,
                    "has_data": True,
                    "files": files,
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
        return sid

    def read_meta(self, name: str, kind: str = "snapshots") -> DataFrame:
        """Iceberg metadata tables analogue (``tbl.snapshots`` /
        ``tbl.files`` / ``tbl.refs`` / ``tbl.history``): the table's own
        bookkeeping as a DataFrame, so operational questions — how many
        snapshots, which files a view reads, where the row counts sit,
        what refs pin what — answer with SQL instead of spelunking
        manifest JSON. Driver-side metadata only; never touches data.

        kinds:
        - ``snapshots``: one row per live manifest entry (id, ts, mode,
          parent, branch, n_dirs, n_files, n_rows, properties as JSON).
        - ``files``: one row per data file of the CURRENT view (or the
          handle's branch view): snapshot dir, relative path, rows, and
          the min/max stats as JSON — the data-skipping surface itself.
        - ``refs``: tags and branches (name, type, snapshot_id).
        - ``history``: the current view's ancestry walk (the Iceberg
          history table): snapshot_id, ts, and whether the entry is
          still live in the manifest.
        - ``deletes``: one row per pending merge-on-read delete file
          of the current view (path, key_col, n_keys, dirs_in_scope)
          — empty after the materializing compact."""
        m = self._load_manifest(name)
        if kind == "snapshots":
            rows = []
            for s in m["snapshots"]:
                files = s.get("files") or []
                rows.append(
                    (
                        s["id"],
                        float(s["ts"]),
                        s["mode"],
                        s.get("parent"),
                        s.get("branch"),
                        len(s["read_set"]),
                        len(files),
                        sum(
                            f.get("rows") or 0 for f in files
                        ),
                        json.dumps(
                            s.get("properties", {}), sort_keys=True
                        ),
                    )
                )
            return self.spark.createDataFrame(
                rows,
                "snapshot_id string, committed_ts double, mode string,"
                " parent string, branch string, n_dirs int,"
                " n_files int, n_rows long, properties string",
            )
        if kind == "files":
            snap = self._resolve(m, None, None, None)
            if snap is None:
                raise FileNotFoundError(f"table {name} has no snapshots")
            stats_by_dir = {
                f"snap_{s['id']}": s.get("files")
                for s in m["snapshots"]
            }
            rows = []
            for d in snap["read_set"]:
                for f in stats_by_dir.get(d) or []:
                    rows.append(
                        (
                            d,
                            f["path"],
                            f.get("rows"),
                            json.dumps(
                                f.get("stats", {}), sort_keys=True
                            ),
                        )
                    )
            return self.spark.createDataFrame(
                rows,
                "snapshot_dir string, path string, rows long,"
                " stats string",
            )
        if kind == "refs":
            rows = [
                (t, "tag", sid)
                for t, sid in (m.get("tags") or {}).items()
            ] + [
                (b, "branch", sid)
                for b, sid in (m.get("branches") or {}).items()
            ]
            return self.spark.createDataFrame(
                rows, "name string, type string, snapshot_id string"
            )
        if kind == "deletes":
            snap = self._resolve(m, None, None, None)
            if snap is None:
                raise FileNotFoundError(f"table {name} has no snapshots")
            rows = [
                (
                    e["path"] if e.get("path")
                    else f"<pred {e['key_col']} < {e['cutoff']}>",
                    e["key_col"],
                    int(e.get("n_keys") or 0),
                    len(e.get("applies_to") or []),
                )
                for e in self._pending_deletes(snap)
            ]
            return self.spark.createDataFrame(
                rows,
                "path string, key_col string, n_keys long,"
                " dirs_in_scope int",
            )
        if kind == "history":
            rows = []
            s = self._resolve(m, None, None, None)
            seen: set = set()
            while s is not None:
                rows.append((s["id"], float(s["ts"]), True))
                p = s.get("parent")
                if p is None or p in seen:
                    break
                seen.add(p)
                try:
                    s = self._snapshot(m, p)
                except KeyError:
                    rows.append((p, None, False))  # expired ancestor
                    break
            return self.spark.createDataFrame(
                rows,
                "snapshot_id string, committed_ts double, live boolean",
            )
        raise ValueError(
            f"read_meta: unknown kind {kind!r} "
            "(snapshots | files | refs | history | deletes)"
        )

    def fsck(self, name: str, deep: bool = False) -> dict:
        """Physical integrity audit of one table — manifest ↔
        filesystem ↔ (``deep``) parquet footers ↔ bloom sidecars ↔
        refs. The warehouse analogue of a filesystem fsck: at 100 TB
        the failure mode is not "Spark computes the wrong answer" but
        "an object-store lifecycle rule, a partial copy, or a manual
        rm quietly changed the files under a manifest that still
        claims them" — and because reads list DIRECTORIES (manifest
        stats only prune), a lost file silently loses rows and an
        alien parquet file silently adds them. Checks, per live
        snapshot entry:

        * every manifest-listed file exists and is non-empty
          (``missing_file`` / ``empty_file`` — silent row loss);
        * no unlisted ``*.parquet`` files sit in a stats-bearing dir
          (``unlisted_file`` — silently read as table data);
        * the snapshot's own dir exists when ``has_data``
          (``missing_dir``);
        * recorded ``bloom_cols`` have a readable sidecar covering
          each column, and sidecar entries reference listed files
          (``missing_sidecar`` warn / ``unreadable_sidecar`` /
          ``stale_sidecar_entry`` warn — blooms degrade to
          may-contain, so warnings, not errors);
        * tags / branches / current resolve to live snapshots
          (``dangling_tag`` / ``dangling_branch`` /
          ``dangling_current`` — a read(tag=...) would raise);
        * ``deep=True`` additionally re-opens every listed file's
          FOOTER (metadata-only, no data read) and compares
          num_rows to the manifest's recorded rows
          (``row_count_mismatch`` — a replaced/truncated file; an
          unreadable footer is ``corrupt_file``).

        * merge-on-read delete files each live snapshot carries exist
          and are non-empty (``missing_delete_file`` — a lost key file
          silently RESURRECTS the deleted rows, the worst direction to
          fail in); ``deep=True`` re-opens each key file's footer and
          compares num_rows to the manifest's ``n_keys``
          (``delete_key_count_mismatch`` / ``corrupt_delete_file``)
          and checks the key column is present
          (``delete_key_col_missing``).

        Returns ``{ok, table, findings: [{level, kind, snapshot, path,
        detail}], files_checked, dirs_checked}``; ``ok`` is False when
        any error-level finding exists (warnings — degraded blooms —
        keep ok=True). Read-only: never mutates the table; run it
        before --publish-branch / --export-dir the way release_check
        covers the logical layer."""
        findings: list[dict] = []

        def _f(level, kind, snapshot=None, path=None, detail=None):
            findings.append(
                {
                    "level": level, "kind": kind, "snapshot": snapshot,
                    "path": path, "detail": detail,
                }
            )

        m = self._load_manifest(name)
        snaps_by_id = {s["id"]: s for s in m["snapshots"]}
        if m.get("current") is not None and m["current"] not in snaps_by_id:
            _f("error", "dangling_current", snapshot=m["current"])
        for t, sid in (m.get("tags") or {}).items():
            if sid not in snaps_by_id:
                _f("error", "dangling_tag", snapshot=sid, detail=t)
        for b, sid in (m.get("branches") or {}).items():
            if sid not in snaps_by_id:
                _f("error", "dangling_branch", snapshot=sid, detail=b)
        files_checked = 0
        dirs_checked = 0
        for s in m["snapshots"]:
            dbase = f"snap_{s['id']}"
            dpath = os.path.join(self._dir(name), dbase)
            finfo = s.get("files")
            if s.get("has_data") and not os.path.isdir(dpath):
                _f("error", "missing_dir", snapshot=s["id"], path=dbase)
                continue
            if finfo is None:
                continue  # legacy entry without file stats: nothing to
                # cross-check (reads fall back to whole-dir listing)
            dirs_checked += 1
            listed = {f["path"] for f in finfo}
            for f in finfo:
                files_checked += 1
                p = os.path.join(dpath, f["path"])
                if not os.path.exists(p):
                    _f(
                        "error", "missing_file", snapshot=s["id"],
                        path=f["path"],
                    )
                    continue
                if os.path.getsize(p) == 0:
                    _f(
                        "error", "empty_file", snapshot=s["id"],
                        path=f["path"],
                    )
                    continue
                if deep:
                    import pyarrow.parquet as pq

                    try:
                        nrows = pq.ParquetFile(p).metadata.num_rows
                    except Exception as e:  # noqa: BLE001
                        _f(
                            "error", "corrupt_file", snapshot=s["id"],
                            path=f["path"], detail=str(e)[:200],
                        )
                        continue
                    want = f.get("rows")
                    if want is not None and nrows != want:
                        _f(
                            "error", "row_count_mismatch",
                            snapshot=s["id"], path=f["path"],
                            detail=f"manifest={want} footer={nrows}",
                        )
            on_disk = set()
            if os.path.isdir(dpath):
                for root, _d, fs in os.walk(dpath):
                    for fn in fs:
                        if fn.endswith(".parquet"):
                            on_disk.add(
                                os.path.relpath(
                                    os.path.join(root, fn), dpath
                                )
                            )
            for extra in sorted(on_disk - listed):
                _f(
                    "error", "unlisted_file", snapshot=s["id"],
                    path=extra,
                    detail="present on disk but not in the manifest — "
                    "reads list directories, so this file IS read",
                )
            bcols = s.get("bloom_cols") or []
            if bcols and os.path.isdir(dpath):
                sc = _blooms.load_sidecar(dpath)
                if sc is None:
                    kind = (
                        "unreadable_sidecar"
                        if os.path.exists(
                            os.path.join(dpath, _blooms.SIDECAR_NAME)
                        )
                        else "missing_sidecar"
                    )
                    _f("warn", kind, snapshot=s["id"], detail=str(bcols))
                else:
                    for c in bcols:
                        ent = sc.get(c)
                        if ent is None:
                            _f(
                                "warn", "missing_sidecar",
                                snapshot=s["id"], detail=c,
                            )
                            continue
                        for rel in ent:
                            if rel not in listed:
                                _f(
                                    "warn", "stale_sidecar_entry",
                                    snapshot=s["id"], path=rel,
                                    detail=c,
                                )
        # merge-on-read delete files: each distinct path checked once,
        # attributed to the newest snapshot carrying it
        seen_del: set[str] = set()
        for s in reversed(m["snapshots"]):
            snap_schema_cols: set[str] | None = None
            if s.get("schema"):
                try:
                    snap_schema_cols = {
                        f["name"]
                        for f in json.loads(s["schema"])["fields"]
                    }
                except (ValueError, KeyError, TypeError):
                    snap_schema_cols = None
            for e in self._pending_deletes(s):
                if e.get("path") is None:
                    # predicate entry: manifest-only, no file to
                    # verify — but a hand-edited/corrupted manifest
                    # whose pred column left the snapshot schema would
                    # silently delete NOTHING (the _post filter skips
                    # absent columns), resurrecting the expired rows
                    if (
                        e["pred_id"] not in seen_del
                        and snap_schema_cols is not None
                        and e["key_col"] not in snap_schema_cols
                    ):
                        _f(
                            "error", "delete_pred_col_missing",
                            snapshot=s["id"], path=e["pred_id"],
                            detail=f"{e['key_col']} not in snapshot "
                            "schema: the predicate delete matches "
                            "nothing and its rows resurrect",
                        )
                    seen_del.add(e["pred_id"])
                    continue
                if e["path"] in seen_del:
                    continue
                seen_del.add(e["path"])
                dpath = os.path.join(self._dir(name), e["path"])
                kfiles = []
                if os.path.isdir(dpath):
                    for root, _d, fs in os.walk(dpath):
                        kfiles += [
                            os.path.join(root, fn)
                            for fn in fs
                            if fn.endswith(".parquet")
                        ]
                if not kfiles or all(
                    os.path.getsize(p) == 0 for p in kfiles
                ):
                    _f(
                        "error", "missing_delete_file",
                        snapshot=s["id"], path=e["path"],
                        detail="lost key file silently resurrects "
                        f"{e['n_keys']} deleted row key(s)",
                    )
                    continue
                files_checked += len(kfiles)
                if deep:
                    import pyarrow.parquet as pq

                    nrows = 0
                    cols: set[str] = set()
                    bad = False
                    for p in kfiles:
                        try:
                            md = pq.ParquetFile(p)
                        except Exception as exc:  # noqa: BLE001
                            _f(
                                "error", "corrupt_delete_file",
                                snapshot=s["id"], path=e["path"],
                                detail=str(exc)[:200],
                            )
                            bad = True
                            break
                        nrows += md.metadata.num_rows
                        cols |= set(md.schema_arrow.names)
                    if bad:
                        continue
                    if nrows != e["n_keys"]:
                        _f(
                            "error", "delete_key_count_mismatch",
                            snapshot=s["id"], path=e["path"],
                            detail=f"manifest={e['n_keys']} "
                            f"footer={nrows}",
                        )
                    if e["key_col"] not in cols:
                        _f(
                            "error", "delete_key_col_missing",
                            snapshot=s["id"], path=e["path"],
                            detail=e["key_col"],
                        )
        return {
            "ok": not any(f["level"] == "error" for f in findings),
            "table": name,
            "findings": findings,
            "files_checked": files_checked,
            "dirs_checked": dirs_checked,
        }

    def backfill_blooms(self, name: str, cols: list[str]) -> dict:
        """Add bloom sidecars to an EXISTING table without rewriting a
        byte of data — the 100-TB shape (``compact(bloom_cols=...)``
        also works but re-writes the corpus to gain stats). A bloom is
        derived metadata of an immutable data file, so backfill writes
        the missing per-dir sidecars in place (one distributed scan of
        the key column per dir, atomic sidecar replace) and records the
        spec on the CURRENT manifest entry so future appends/COW
        snapshots inherit it. No new snapshot is committed: ``current``
        never moves, incremental-read anchors and changelog diffs are
        untouched, and reads/maintenance pick the new sidecars up
        immediately (they consult sidecars by dir, not by spec).

        Idempotent: dirs whose sidecar already covers every file for
        every requested column are skipped. Returns
        {dirs_built, dirs_skipped, files_built}."""
        m0 = self._load_manifest(name)
        base = self._snapshot(m0, None)
        if base is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        stats_by_dir = {
            f"snap_{s['id']}": s.get("files") for s in m0["snapshots"]
        }
        if self._renames_pending(m0, base["read_set"]):
            raise RuntimeError(
                f"backfill_blooms({name}): a schema-evolution op (rename/drop) is pending on dirs "
                "written before it — file-level COW would mix old-name "
                "and new-name files in one dir; run compact() first to "
                "normalize the files, then retry"
            )
        out = {"dirs_built": 0, "dirs_skipped": 0, "files_built": 0}
        for d in base["read_set"]:
            data_dir = os.path.join(self._dir(name), d)
            finfo = stats_by_dir.get(d)
            if finfo is None or not os.path.isdir(data_dir):
                out["dirs_skipped"] += 1  # legacy/empty dir: no stats
                continue
            rels = [f["path"] for f in finfo]
            rows_by_rel = {f["path"]: f.get("rows") or 0 for f in finfo}
            sc = _blooms.load_sidecar(data_dir) or {}
            built = 0
            for c in cols:
                have = sc.get(c) or {}
                missing = [p for p in rels if p not in have]
                if not missing:
                    continue
                fresh = _blooms.build_bloom_entries(
                    self.spark, data_dir, missing, c,
                    rows_by_rel=rows_by_rel,
                )
                if fresh:
                    sc.setdefault(c, {}).update(fresh)
                    built += len(fresh)
            if built:
                _blooms.save_sidecar(data_dir, sc)
                out["dirs_built"] += 1
                out["files_built"] += built
            else:
                out["dirs_skipped"] += 1
        # record the spec for future snapshot inheritance (additive
        # metadata on the current entry — NOT a new snapshot)
        with self._table_lock(name):
            m = self._load_manifest(name)
            if m["current"] != base["id"]:
                _log.warning(
                    "backfill_blooms(%s): current moved %s -> %s during "
                    "the build — sidecars are in place and effective, "
                    "but the inheritance spec was not recorded; re-run "
                    "to stamp it", name, base["id"], m["current"],
                )
                return out
            for s in m["snapshots"]:
                if s["id"] == base["id"]:
                    s["bloom_cols"] = sorted(
                        set(s.get("bloom_cols") or []) | set(cols)
                    )
                    break
            self._save_manifest(name, m)
        return out

    # -- merge-on-read deletes (Iceberg v2 equality-delete analogue) ------

    @staticmethod
    def _pending_deletes(snap: dict | None) -> list[dict]:
        """The merge-on-read delete entries a snapshot carries (empty
        for COW-only history)."""
        return list((snap or {}).get("delete_files") or [])

    @staticmethod
    def _del_id(entry: dict) -> str:
        """Stable identity of a MOR delete entry: equality entries are
        their key-file dir, predicate entries their manifest-minted
        pred_id (no file exists for them)."""
        return entry.get("path") or entry["pred_id"]

    def _refuse_pending_deletes(self, op: str, snap: dict) -> None:
        dels = self._pending_deletes(snap)
        if dels:
            raise RuntimeError(
                f"{op}: {len(dels)} merge-on-read delete file(s) are "
                "pending on the current snapshot — this op restructures "
                "data files, which would move rows outside the deletes' "
                "applies_to scope and resurrect deleted rows; run "
                "compact() first (it applies and clears the delete "
                "files), then retry"
            )

    def _load_delete_keys(self, name: str, entry: dict) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._dir(name), entry["path"])
        )

    def delete_keys_mor(
        self,
        name: str,
        key_col: str,
        keys,
        properties: dict | None = None,
        stats_out: dict | None = None,
    ) -> dict:
        """Merge-on-read row delete (the Iceberg v2 equality-delete
        file): commit a snapshot that removes every row whose
        ``key_col`` is in ``keys`` WITHOUT touching a single data file
        — the keys land in a tiny ``deletes_<sid>/`` parquet, the
        manifest records which data dirs it applies to (the dirs live
        at commit time: later appends are outside the scope, Iceberg's
        sequence-number rule at dir granularity), and every read
        anti-joins the broadcast key frame at scan time.

        This is the 100-TB takedown lever ``delete_where`` cannot be:
        COW rewrites the overlapping files — bounded on a clustered or
        bloom-sidecar'd layout, but still data I/O proportional to the
        touched files, and on a raw hash-sharded layout honestly the
        whole table (DESIGN #41). MOR commits in O(keys): a 5-row GDPR
        order against 100 TB writes a KB and moves no data. The costs,
        stated: every subsequent read pays a broadcast anti-join until
        a ``compact()`` materializes the deletes (reads through
        ``read()`` apply them automatically, so the compaction output
        is delete-free and the entry drops the delete files), and the
        deleted bytes stay on disk until that compact +
        ``expire_snapshots`` — logical-now, physical-later, exactly
        the two-phase contract ``takedown --hard`` already documents
        for COW. Data-restructuring maintenance (binpack / upsert /
        COW deletes / rename or drop of a pending key column) REFUSES
        while delete files are pending — their file moves would escape
        the applies_to scope; compact first.

        Commits mode='mor_delete' — NON-append, so read_incremental
        consumers honestly resync; read_changelog emits the net delete
        row images without one (key-scoped scan of the applies_to
        dirs). Never aborts on a concurrent commit: the entry is built
        from 'current' AS SEEN INSIDE the lock (no data depends on a
        pre-read base). Unknown keys are a no-op at read time — the
        matched count is intentionally not computed (MOR's whole point
        is no scan at delete time), so ``n_deleted`` is absent from
        the result; ``row_count`` on a deletes-pending snapshot falls
        back to a real count for the same reason.

        Returns {snapshot, n_keys, key_col, dirs_in_scope, aborted
        (always False — kept for delete_where-shaped callers)}."""
        from pyspark.sql.types import StructField, StructType

        self._refuse_on_branch("delete_keys_mor")
        keys = set(keys)
        if any(k is None for k in keys):
            raise ValueError("delete_keys_mor: keys must be non-NULL")
        keys = sorted(keys)
        if len(keys) > 1_000_000:
            raise ValueError(
                f"delete_keys_mor: {len(keys)} keys — batch below 1M "
                "(the key frame is broadcast at every read)"
            )
        out = {
            "snapshot": None, "n_keys": len(keys), "key_col": key_col,
            "dirs_in_scope": 0, "aborted": False,
        }
        if stats_out is not None:
            stats_out.update(out)
        if not keys:
            return out
        m0 = self._load_manifest(name)
        base0 = self._snapshot(m0, None)
        if base0 is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        schema = (
            StructType.fromJson(json.loads(base0["schema"]))
            if base0.get("schema")
            else self.read(name, base0["id"]).schema
        )
        if key_col not in schema.fieldNames():
            raise KeyError(
                f"delete_keys_mor({name}): no column {key_col!r} "
                f"(have: {schema.fieldNames()})"
            )
        ktype = schema[key_col].dataType
        sid = uuid.uuid4().hex[:16]
        del_dir = os.path.join(self._dir(name), f"deletes_{sid}")
        # one tiny file: the frame is broadcast whole at read time
        self.spark.createDataFrame(
            [(k,) for k in keys],
            StructType([StructField(key_col, ktype, False)]),
        ).coalesce(1).write.parquet(del_dir)
        entry = {
            "path": f"deletes_{sid}",
            "key_col": key_col,
            "n_keys": len(keys),
        }
        with self._table_lock(name):
            m = self._load_manifest(name)
            base = self._snapshot(m, None)
            if base is None:
                raise FileNotFoundError(
                    f"table {name} has no snapshots"
                )
            # the key file and type were built from the PRE-lock
            # snapshot; a rename/drop of key_col committed in the
            # window (renames only refuse once deletes are pending)
            # would mint an entry matching no column — a delete that
            # silently removes zero rows. Re-verify against the
            # in-lock base, matching the applies_to contract.
            if base.get("schema"):
                in_lock = StructType.fromJson(
                    json.loads(base["schema"])
                ).fieldNames()
                if key_col not in in_lock:
                    shutil.rmtree(del_dir, ignore_errors=True)
                    raise KeyError(
                        f"delete_keys_mor({name}): column {key_col!r}"
                        " vanished between validation and commit "
                        f"(current schema: {in_lock}) — re-run "
                        "against the current schema"
                    )
            entry["applies_to"] = list(base["read_set"])
            props = {
                "delete_key": key_col,
                "n_keys": len(keys),
                "mor": True,
                **(properties or {}),
            }
            fp = base.get("properties", {}).get("source_fingerprint")
            if fp is not None and "source_fingerprint" not in props:
                props["source_fingerprint"] = fp
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": "mor_delete",
                    "parent": base["id"],
                    "read_set": list(base["read_set"]),
                    "partition_by": base.get("partition_by") or [],
                    "cluster_by": base.get("cluster_by") or [],
                    "zorder_by": base.get("zorder_by") or [],
                    "bloom_cols": base.get("bloom_cols") or [],
                    "properties": props,
                    "schema": base.get("schema"),
                    "has_data": False,
                    "files": [],
                    "delete_files": self._pending_deletes(base)
                    + [entry],
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
        out["snapshot"] = sid
        out["dirs_in_scope"] = len(entry["applies_to"])
        if stats_out is not None:
            stats_out.update(out)
        return out

    def delete_below_mor(
        self,
        name: str,
        col: str,
        cutoff,
        properties: dict | None = None,
        stats_out: dict | None = None,
    ) -> dict:
        """Merge-on-read PREDICATE delete: commit a snapshot that
        removes every row with ``col < cutoff`` (NULLs survive, the
        delete_below rule) without touching a single file — not even
        a key file: the predicate lives wholly in the manifest and
        every read applies the filter at scan time, scoped to the
        dirs live at commit (later appends are untouched).

        This is retention TTL at O(1) commit cost: ``delete_below``
        (COW) drops wholly-dead files for free ONLY on a range-
        clustered layout and honestly rewrites the boundary/unsorted
        rest; at 100 TB on the raw ingest layout a monthly age-out
        becomes a full-table rewrite at order time. The MOR variant
        commits instantly on ANY layout; the rewrite happens once, in
        the next ``compact()`` (which also restores the clustered
        layout that makes the NEXT COW retention pass cheap). Same
        pending-deletes contract as delete_keys_mor: per-read filter
        tax until the materializing compact, restructuring maintenance
        refuses meanwhile, ``read_changelog`` emits the removed rows
        as net 'delete' images via a range-pruned scan, ``row_count``
        falls back to a real count.

        ``cutoff`` must be a number, string, or datetime/date
        (stored ISO for JSON; re-cast to the column type at scan) and
        is verified CASTABLE to the column's type at commit time — a
        silently-NULL cast literal would otherwise drop every non-NULL
        row at read time, the worst failure direction.

        Returns {snapshot, key_col, cutoff, dirs_in_scope, aborted
        (always False)}."""
        import datetime as _dt

        from pyspark.sql.types import StructType

        self._refuse_on_branch("delete_below_mor")
        if cutoff is None or isinstance(cutoff, bool):
            raise ValueError(
                f"delete_below_mor: unsupported cutoff {cutoff!r}"
            )
        if isinstance(cutoff, (_dt.datetime, _dt.date)):
            stored = cutoff.isoformat(sep=" ") if isinstance(
                cutoff, _dt.datetime
            ) else cutoff.isoformat()
        elif isinstance(cutoff, (int, float, str)):
            stored = cutoff
        else:
            raise TypeError(
                f"delete_below_mor: cutoff type {type(cutoff).__name__}"
                " is not JSON-storable (number, string, datetime, or "
                "date)"
            )
        m0 = self._load_manifest(name)
        base0 = self._snapshot(m0, None)
        if base0 is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        schema = (
            StructType.fromJson(json.loads(base0["schema"]))
            if base0.get("schema")
            else self.read(name, base0["id"]).schema
        )
        if col not in schema.fieldNames():
            raise KeyError(
                f"delete_below_mor({name}): no column {col!r} "
                f"(have: {schema.fieldNames()})"
            )
        dt = schema[col].dataType
        probe = (
            self.spark.range(1)
            .select(F.lit(stored).try_cast(dt).alias("c"))
            .first()["c"]
        )
        if probe is None:
            raise ValueError(
                f"delete_below_mor({name}): cutoff {cutoff!r} does "
                f"not cast to {col!r}'s type {dt.simpleString()} — "
                "the scan-time filter literal would be NULL and drop "
                "every non-NULL row"
            )
        sid = uuid.uuid4().hex[:16]
        entry = {
            "pred_id": f"pred_{sid}",
            "key_col": col,
            "op": "lt",
            "cutoff": stored,
        }
        out = {
            "snapshot": None, "key_col": col, "cutoff": stored,
            "dirs_in_scope": 0, "aborted": False,
        }
        with self._table_lock(name):
            m = self._load_manifest(name)
            base = self._snapshot(m, None)
            if base is None:
                raise FileNotFoundError(
                    f"table {name} has no snapshots"
                )
            entry["applies_to"] = list(base["read_set"])
            props = {
                "delete_pred": f"{col} < {stored}",
                "mor": True,
                **(properties or {}),
            }
            fp = base.get("properties", {}).get("source_fingerprint")
            if fp is not None and "source_fingerprint" not in props:
                props["source_fingerprint"] = fp
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": "mor_delete",
                    "parent": base["id"],
                    "read_set": list(base["read_set"]),
                    "partition_by": base.get("partition_by") or [],
                    "cluster_by": base.get("cluster_by") or [],
                    "zorder_by": base.get("zorder_by") or [],
                    "bloom_cols": base.get("bloom_cols") or [],
                    "properties": props,
                    "schema": base.get("schema"),
                    "has_data": False,
                    "files": [],
                    "delete_files": self._pending_deletes(base)
                    + [entry],
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
        out["snapshot"] = sid
        out["dirs_in_scope"] = len(entry["applies_to"])
        if stats_out is not None:
            stats_out.update(out)
        return out

    def delete_where(
        self,
        name: str,
        key_col: str,
        keys,
        properties: dict | None = None,
        stats_out: dict | None = None,
    ) -> dict:
        """Copy-on-write row delete: remove every row whose ``key_col``
        is in ``keys`` (the Iceberg delete-and-rewrite shape, the
        primitive under compliance takedowns). Surgical at FILE
        granularity: dirs whose per-file min/max stats provably cannot
        contain any key carry FORWARD into the new snapshot's read_set
        untouched, and within an overlapping dir only the overlapping
        FILES are read and rewritten — every provably-clean file is
        hard-linked into the new snapshot dir (zero data copy, the
        local analogue of an Iceberg manifest re-referencing an
        existing data file). On an id-clustered table a small takedown
        batch rewrites a handful of files, not the corpus — and
        crucially this holds even when every DIR spans the id domain
        (the hash-sharded ingest layout) as long as files inside are
        clustered. NULL-key rows always survive (a key set never
        names NULL).

        Commits a mode='delete' snapshot — NON-append, so
        read_incremental consumers honestly fail and full-resync
        instead of silently missing the retraction. The rewritten dirs
        land in the entry's ``absorbed_read_set`` (compact's
        convention), keeping _find_committed_write's crash/replay
        closure intact for shard appends whose dir was rewritten away.
        Old snapshots still reference the pre-delete dirs until
        expire_snapshots reclaims them — PHYSICAL deletion needs that
        expiry pass (takedown's ``hard`` mode).

        Concurrency mirrors compact: rewrite outside the lock,
        optimistic commit — if 'current' moved, abort (returns
        ``aborted=True``, orphan dir left for the grace sweep) and the
        caller re-runs. Returns {snapshot, n_deleted, dirs_rewritten,
        dirs_untouched, files_rewritten, files_carried, aborted}.

        ``keys`` is a bounded driver-side list (takedown batches are
        small relative to the corpus); capped at 1M — batch larger
        sets. Pruning normalizes keys via the stats rules; any
        non-normalizable key degrades to rewrite-everything
        (conservative, never wrong)."""
        keys = set(keys)
        self._refuse_on_branch("delete_where")
        if any(k is None for k in keys):
            raise ValueError("delete_where: keys must be non-NULL")
        keys = sorted(keys)
        if len(keys) > 1_000_000:
            raise ValueError(
                f"delete_where: {len(keys)} keys — batch below 1M "
                "(the key list is a driver-side plan literal)"
            )
        out = {
            "snapshot": None, "n_deleted": 0, "dirs_rewritten": 0,
            "dirs_untouched": 0, "files_rewritten": 0,
            "files_carried": 0, "aborted": False,
        }
        if stats_out is not None:
            stats_out.update(out)
        if not keys:
            return out
        m0 = self._load_manifest(name)
        base = self._snapshot(m0, None)
        if base is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        if self._renames_pending(m0, base["read_set"]):
            raise RuntimeError(
                f"delete_where({name}): a schema-evolution op (rename/drop) is pending on dirs "
                "written before it — file-level COW would mix old-name "
                "and new-name files in one dir; run compact() first to "
                "normalize the files, then retry"
            )
        self._refuse_pending_deletes(f"delete_where({name})", base)
        nkeys = [_norm_stat_value(k) for k in keys]
        prunable = all(v is not None for v in nkeys)
        nkeys = sorted(nkeys) if prunable else None

        stats_by_dir = {
            f"snap_{s['id']}": s.get("files") for s in m0["snapshots"]
        }
        affected, untouched, only_files, carry = self._split_by_overlap(
            base["read_set"], stats_by_dir,
            _file_overlap_fn(
                key_col, nkeys, None,
                keys=keys, bloom_get=self._bloom_lookup(name, key_col),
            ),
        )
        carry_safe = self._carry_is_safe(m0, base, affected)
        if not carry_safe:
            only_files, carry = {}, {}  # whole-dir rewrite fallback
        out["dirs_rewritten"] = len(affected)
        out["dirs_untouched"] = len(untouched)
        out["files_rewritten"] = sum(
            len(v) for v in only_files.values()
        )
        out["files_carried"] = sum(len(v) for v in carry.values())
        if not affected:
            if stats_out is not None:
                stats_out.update(out)
            return out  # keys provably absent: nothing to commit
        df = self._union_snapshot_dirs(
            name, m0, affected, base.get("schema"),
            only_files=only_files,
        )
        hit = F.col(key_col).isin(keys)
        n_deleted = df.filter(hit).count()
        out["n_deleted"] = n_deleted
        if n_deleted == 0:
            if stats_out is not None:
                stats_out.update(out)
            return out  # stats overlapped but no real rows: no-op
        survivors = df.filter(F.col(key_col).isNull() | ~hit)
        partition_by = base.get("partition_by") or None
        sid = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self._dir(name), f"snap_{sid}")
        w = survivors.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        self._carry_clean_files(name, carry, data_dir)
        files = _collect_file_stats(data_dir)
        bloom_cols = base.get("bloom_cols") or None
        self._write_bloom_sidecar(name, data_dir, files, bloom_cols, carry)
        props = {
            "delete_key": key_col,
            "n_deleted": n_deleted,
            "absorbed_read_set": list(affected),
            **(properties or {}),
        }
        fp = base.get("properties", {}).get("source_fingerprint")
        if fp is not None and "source_fingerprint" not in props:
            props["source_fingerprint"] = fp
        with self._table_lock(name):
            m = self._load_manifest(name)
            if m["current"] != base["id"]:
                _log.warning(
                    "delete_where(%s): current moved %s -> %s during "
                    "the rewrite (concurrent commit); aborting — "
                    "orphan dir snap_%s left for expire_snapshots' "
                    "grace sweep; re-run",
                    name, base["id"], m["current"], sid,
                )
                out["aborted"] = True
                out["n_deleted"] = 0
                if stats_out is not None:
                    stats_out.update(out)
                return out
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": "delete",
                    "parent": base["id"],
                    "read_set": untouched + [f"snap_{sid}"],
                    "partition_by": partition_by or [],
                    "bloom_cols": bloom_cols or [],
                    "properties": props,
                    "schema": survivors.schema.json(),
                    # own-dir convention (matches write/compact): does
                    # THIS snapshot's dir hold data, not the whole view
                    "has_data": bool(files),
                    "files": files,
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
        out["snapshot"] = sid
        self._hint_unclustered(
            name, key_col, out, carry_safe=carry_safe,
            total_files=sum(
                len(stats_by_dir.get(d) or []) for d in base["read_set"]
            ),
        )
        if stats_out is not None:
            stats_out.update(out)
        return out

    def delete_below(
        self,
        name: str,
        col: str,
        cutoff,
        properties: dict | None = None,
        stats_out: dict | None = None,
    ) -> dict:
        """Predicate copy-on-write delete: remove every row with
        ``col < cutoff`` (NULLs survive — a NULL never satisfies the
        predicate, matching delete_where's key semantics). This is the
        retention primitive: at 100 TB "expire everything ingested
        before T" is the dominant delete pattern, and on a time- (or
        any range-) clustered layout it is nearly free — per-file
        footer stats classify each file three ways:

        * ``max < cutoff`` AND the manifest's null_count for ``col``
          is 0 AND the footer row count is known → the file is WHOLLY
          dead: it is simply not referenced by the new snapshot —
          zero bytes read, zero rewritten (``files_dropped``; the
          Iceberg metadata-delete fast path). The null-count guard is
          load-bearing: parquet min/max ignore NULLs, so a max<cutoff
          file can still hold NULL rows that must survive.
        * ``min >= cutoff`` → provably clean: carried forward by hard
          link (or the whole dir stays untouched), zero bytes read.
        * anything else (boundary files, missing stats/null_count/row
          count, incomparable types) → read + rewritten with the
          filter (conservative, never wrong).

        Same commit protocol as delete_where: a NON-append
        mode='delete' snapshot (incremental consumers honestly
        refuse), absorbed_read_set for crash/replay closure, optimistic
        concurrency (abort when 'current' moved), physical bytes
        reclaimed only by expire_snapshots. Returns {snapshot,
        n_deleted, dirs_rewritten, dirs_untouched, files_rewritten,
        files_carried, files_dropped, aborted}."""
        self._refuse_on_branch("delete_below")
        ncut = _norm_stat_value(cutoff)
        out = {
            "snapshot": None, "n_deleted": 0, "dirs_rewritten": 0,
            "dirs_untouched": 0, "files_rewritten": 0,
            "files_carried": 0, "files_dropped": 0, "aborted": False,
        }
        m0 = self._load_manifest(name)
        base = self._snapshot(m0, None)
        if base is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        if self._renames_pending(m0, base["read_set"]):
            raise RuntimeError(
                f"delete_below({name}): a schema-evolution op "
                "(rename/drop) is pending on dirs written before it — "
                "file-level COW would mix old-name and new-name files "
                "in one dir; run compact() first, then retry"
            )
        self._refuse_pending_deletes(f"delete_below({name})", base)
        stats_by_dir = {
            f"snap_{s['id']}": s.get("files") for s in m0["snapshots"]
        }

        def _classify(finfo_entry) -> str:
            """'dead' | 'clean' | 'boundary' from footer stats."""
            if ncut is None:
                return "boundary"
            s = (finfo_entry.get("stats") or {}).get(col)
            if not s:
                return "boundary"
            flo, fhi = s
            try:
                if flo >= ncut:
                    return "clean"
                if (
                    fhi < ncut
                    and (finfo_entry.get("nulls") or {}).get(col) == 0
                    and finfo_entry.get("rows") is not None
                ):
                    return "dead"
            except TypeError:
                return "boundary"  # incomparable types: conservative
            return "boundary"

        affected: list[str] = []
        untouched: list[str] = []
        only_files: dict[str, list[str]] = {}
        carry: dict[str, list[str]] = {}
        dead_rows = 0
        dead_files = 0
        for d in base["read_set"]:
            finfo = stats_by_dir.get(d)
            if finfo is None:
                affected.append(d)  # legacy: no stats, rewrite whole
                continue
            kinds = {f["path"]: _classify(f) for f in finfo}
            if all(k == "clean" for k in kinds.values()):
                untouched.append(d)
                continue
            affected.append(d)
            only_files[d] = [p for p, k in kinds.items() if k == "boundary"]
            carry[d] = [p for p, k in kinds.items() if k == "clean"]
            for f in finfo:
                if kinds[f["path"]] == "dead":
                    dead_rows += f["rows"]
                    dead_files += 1
        carry_safe = self._carry_is_safe(m0, base, affected)
        if not carry_safe:
            # whole-dir rewrite fallback: dead files are read+filtered
            # like boundary ones (their rows are counted by the scan,
            # not the manifest — never double-counted)
            only_files, carry = {}, {}
            dead_rows = dead_files = 0
        out["dirs_rewritten"] = len(affected)
        out["dirs_untouched"] = len(untouched)
        out["files_rewritten"] = sum(len(v) for v in only_files.values())
        out["files_carried"] = sum(len(v) for v in carry.values())
        out["files_dropped"] = dead_files
        if not affected:
            if stats_out is not None:
                stats_out.update(out)
            return out  # nothing below cutoff anywhere: no commit
        df = self._union_snapshot_dirs(
            name, m0, affected, base.get("schema"),
            only_files=only_files,
        )
        hit = F.col(col) < F.lit(cutoff)
        n_boundary_deleted = df.filter(hit).count()
        n_deleted = n_boundary_deleted + dead_rows
        out["n_deleted"] = n_deleted
        if n_deleted == 0:
            if stats_out is not None:
                stats_out.update(out)
            return out  # stats overlapped but no real rows: no-op
        survivors = df.filter(F.col(col).isNull() | ~hit)
        partition_by = base.get("partition_by") or None
        sid = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self._dir(name), f"snap_{sid}")
        w = survivors.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        self._carry_clean_files(name, carry, data_dir)
        files = _collect_file_stats(data_dir)
        bloom_cols = base.get("bloom_cols") or None
        self._write_bloom_sidecar(name, data_dir, files, bloom_cols, carry)
        props = {
            "delete_predicate": f"{col} < {cutoff!r}",
            "n_deleted": n_deleted,
            "absorbed_read_set": list(affected),
            **(properties or {}),
        }
        fp = base.get("properties", {}).get("source_fingerprint")
        if fp is not None and "source_fingerprint" not in props:
            props["source_fingerprint"] = fp
        with self._table_lock(name):
            m = self._load_manifest(name)
            if m["current"] != base["id"]:
                _log.warning(
                    "delete_below(%s): current moved %s -> %s during "
                    "the rewrite (concurrent commit); aborting — "
                    "orphan dir snap_%s left for expire_snapshots' "
                    "grace sweep; re-run",
                    name, base["id"], m["current"], sid,
                )
                out["aborted"] = True
                out["n_deleted"] = 0
                if stats_out is not None:
                    stats_out.update(out)
                return out
            m["snapshots"].append(
                {
                    "id": sid,
                    "ts": time.time(),
                    "mode": "delete",
                    "parent": base["id"],
                    "read_set": untouched + [f"snap_{sid}"],
                    "partition_by": partition_by or [],
                    "bloom_cols": bloom_cols or [],
                    "properties": props,
                    "schema": survivors.schema.json(),
                    "has_data": bool(files),
                    "files": files,
                }
            )
            m["current"] = sid
            self._save_manifest(name, m)
        out["snapshot"] = sid
        if out["files_dropped"] == 0:
            # whole-file drops mean the range layout IS working; only
            # a drop-less everything-rewritten delete hints clustering
            self._hint_unclustered(
                name, col, out, carry_safe=carry_safe,
                total_files=sum(
                    len(stats_by_dir.get(d) or [])
                    for d in base["read_set"]
                ),
            )
        if stats_out is not None:
            stats_out.update(out)
        return out

    def upsert(
        self,
        name: str,
        df: DataFrame,
        key_col: str,
        properties: dict | None = None,
        stats_out: dict | None = None,
        key_collect_cap: int = 100_000,
    ) -> dict:
        """Merge-by-key (Iceberg ``MERGE INTO`` shape): rows of ``df``
        whose ``key_col`` already exists REPLACE the stored row; new
        keys insert. One atomic snapshot — a reader never sees the
        delete without the insert. The primitive under re-deliveries
        and transcript corrections: the corrected clip arrives with the
        same clip_id and must supersede, not duplicate (the dedup
        family would instead quarantine one copy, and which copy
        depends on arrival order).

        Copy-on-write like ``delete_where``, at FILE granularity:
        snapshot dirs whose per-file min/max stats provably cannot
        contain any incoming key carry forward untouched, and within
        an overlapping dir only the overlapping FILES are read,
        anti-joined and rewritten together with the incoming rows —
        provably-clean files hard-link into the new snapshot dir
        (zero data copy). On an id-clustered table a correction batch
        rewrites a handful of files even when every DIR spans the id
        domain (the hash-sharded ingest layout), as long as files
        inside are clustered. Incoming keys are collected for precise
        per-file pruning up to ``key_collect_cap``; a larger batch
        degrades to [min, max]-range pruning (still correct, less
        selective — at that size the batch plausibly touches most dirs
        anyway). The replace itself is a distributed left_anti join
        against the incoming keys, never a driver-side literal, so the
        batch size is unbounded.

        Degrades to a plain APPEND snapshot when no stored row actually
        collides (pure insert) — read_incremental consumers keep their
        append-only chain. A real replacement commits mode='upsert'
        (non-append): incremental consumers fail honestly and resync,
        exactly like delete_where, because rows were retracted.
        NULL-key incoming rows are rejected; NULL-key stored rows
        always survive (an equality anti-join never matches NULL).
        Incoming keys must be unique — multi-row-per-key merge is
        ill-defined. Base clustering (``cluster_by``) is re-applied to
        the rewritten dir so pruning selectivity survives the merge.

        Returns {snapshot, n_updated, n_inserted, dirs_rewritten,
        dirs_untouched, files_rewritten, files_carried, aborted}
        (aborted=True when a concurrent commit moved 'current'
        mid-rewrite — orphan dir left for the grace sweep; re-run)."""
        self._refuse_on_branch("upsert")
        from pyspark import StorageLevel

        out = {
            "snapshot": None, "n_updated": 0, "n_inserted": 0,
            "dirs_rewritten": 0, "dirs_untouched": 0,
            "files_rewritten": 0, "files_carried": 0, "aborted": False,
        }

        def _ret():
            if stats_out is not None:
                stats_out.update(out)
            return out

        props = {"upsert_key": key_col, **(properties or {})}
        if not self.exists(name):
            # merge into nothing = first insert
            n = df.count()
            if n == 0:
                return _ret()
            out["snapshot"] = self.write(
                name, df, mode="overwrite",
                properties={**props, "n_updated": 0, "n_inserted": n},
            )
            out["n_inserted"] = n
            return _ret()

        # payload rows (audio bytes) consumed by several actions below —
        # DISK_ONLY for the same heap reason as the streaming sink
        # (DESIGN.md #40)
        df = df.persist(StorageLevel.DISK_ONLY)
        try:
            n_total, n_nonnull, n_distinct = df.agg(
                F.count(F.lit(1)), F.count(key_col),
                F.count_distinct(key_col),
            ).first()
            if n_total == 0:
                return _ret()
            if n_nonnull < n_total:
                raise ValueError(
                    f"upsert: {n_total - n_nonnull} NULL {key_col} rows — "
                    "a NULL key cannot replace anything"
                )
            if n_distinct < n_nonnull:
                raise ValueError(
                    f"upsert: incoming {key_col} not unique "
                    f"({n_nonnull} rows, {n_distinct} keys) — "
                    "multi-row-per-key merge is ill-defined"
                )

            m0 = self._load_manifest(name)
            base = self._snapshot(m0, None)
            if self._renames_pending(m0, base["read_set"]):
                raise RuntimeError(
                    f"upsert({name}): a schema-evolution op "
                    "(rename/drop) is pending on dirs written before "
                    "it — file-level COW would mix old-schema and "
                    "new-schema files in one dir; run compact() first "
                    "to normalize the files, then retry"
                )
            self._refuse_pending_deletes(f"upsert({name})", base)
            # precise key pruning below the cap, range pruning above
            key_rows = (
                df.select(key_col).limit(key_collect_cap + 1).collect()
            )
            raw_keys = None
            if len(key_rows) <= key_collect_cap:
                raw_keys = [r[0] for r in key_rows]
                nkeys = sorted(
                    _norm_stat_value(r[0]) for r in key_rows
                ) if all(
                    _norm_stat_value(r[0]) is not None for r in key_rows
                ) else None
                lohi = None
            else:
                nkeys = None
                lo, hi = df.agg(
                    F.min(key_col), F.max(key_col)
                ).first()
                l_, h_ = _norm_stat_value(lo), _norm_stat_value(hi)
                lohi = (l_, h_) if l_ is not None and h_ is not None \
                    else None

            stats_by_dir = {
                f"snap_{s['id']}": s.get("files")
                for s in m0["snapshots"]
            }
            affected, untouched, only_files, carry = (
                self._split_by_overlap(
                    base["read_set"], stats_by_dir,
                    _file_overlap_fn(
                        key_col, nkeys, lohi,
                        keys=raw_keys,
                        bloom_get=self._bloom_lookup(name, key_col),
                    ),
                )
            )
            carry_safe = self._carry_is_safe(
                m0, base, affected, incoming_schema=df.schema
            )
            if not carry_safe:
                only_files, carry = {}, {}  # whole-dir fallback
            keys_df = df.select(F.col(key_col).alias("__upsert_key"))
            n_updated = 0
            if affected:
                stored = self._union_snapshot_dirs(
                    name, m0, affected, base.get("schema"),
                    only_files=only_files,
                )
                n_updated = stored.join(
                    keys_df,
                    stored[key_col] == keys_df["__upsert_key"],
                    "left_semi",
                ).count()
            out["n_updated"] = n_updated
            out["n_inserted"] = n_total - n_updated
            if n_updated == 0:
                # pure insert: stay an append snapshot (read_incremental
                # consumers keep their chain; nothing was retracted)
                out["snapshot"] = self.write(
                    name, df, mode="append",
                    properties={
                        **props, "n_updated": 0, "n_inserted": n_total,
                    },
                    partition_by=base.get("partition_by") or None,
                )
                return _ret()

            out["dirs_rewritten"] = len(affected)
            out["dirs_untouched"] = len(untouched)
            out["files_rewritten"] = sum(
                len(v) for v in only_files.values()
            )
            out["files_carried"] = sum(len(v) for v in carry.values())
            survivors = stored.join(
                keys_df,
                stored[key_col] == keys_df["__upsert_key"],
                "left_anti",
            )
            merged = survivors.unionByName(
                df, allowMissingColumns=True
            )
            cluster_by = base.get("cluster_by") or None
            zorder_by = base.get("zorder_by") or None
            partition_by = base.get("partition_by") or None
            if cluster_by or zorder_by:
                # keep the REWRITTEN portion's file granularity: an
                # unpinned range shuffle AQE-coalesces to one file
                # (DESIGN.md #34) and a one-file rewrite erodes pruning
                # selectivity; carried files keep their own granularity
                n_files = out["files_rewritten"] or sum(
                    len(stats_by_dir.get(d) or []) for d in affected
                )
                merged = _cluster_frame(
                    merged, cluster_by, partition_by,
                    n_files if n_files > 1 else None,
                    zorder_by,
                )
            sid = uuid.uuid4().hex[:16]
            data_dir = os.path.join(self._dir(name), f"snap_{sid}")
            w = merged.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(data_dir)
            self._carry_clean_files(name, carry, data_dir)
            files = _collect_file_stats(data_dir)
            bloom_cols = base.get("bloom_cols") or None
            self._write_bloom_sidecar(
                name, data_dir, files, bloom_cols, carry
            )
            props.update(
                {
                    "n_updated": n_updated,
                    "n_inserted": n_total - n_updated,
                    "absorbed_read_set": list(affected),
                }
            )
            fp = base.get("properties", {}).get("source_fingerprint")
            if fp is not None and "source_fingerprint" not in props:
                props["source_fingerprint"] = fp
            with self._table_lock(name):
                m = self._load_manifest(name)
                if m["current"] != base["id"]:
                    _log.warning(
                        "upsert(%s): current moved %s -> %s during the "
                        "rewrite (concurrent commit); aborting — orphan "
                        "dir snap_%s left for expire_snapshots' grace "
                        "sweep; re-run",
                        name, base["id"], m["current"], sid,
                    )
                    out["aborted"] = True
                    out["n_updated"] = 0
                    out["n_inserted"] = 0
                    out["dirs_rewritten"] = 0
                    out["files_rewritten"] = 0
                    out["files_carried"] = 0
                    return _ret()
                m["snapshots"].append(
                    {
                        "id": sid,
                        "ts": time.time(),
                        "mode": "upsert",
                        "parent": base["id"],
                        "read_set": untouched + [f"snap_{sid}"],
                        "partition_by": partition_by or [],
                        "cluster_by": cluster_by or [],
                        "zorder_by": zorder_by or [],
                        "bloom_cols": bloom_cols or [],
                        "properties": props,
                        "schema": merged.schema.json(),
                        "has_data": bool(files),
                        "files": files,
                    }
                )
                m["current"] = sid
                self._save_manifest(name, m)
            out["snapshot"] = sid
            self._hint_unclustered(
                name, key_col, out, carry_safe=carry_safe,
                total_files=sum(
                    len(stats_by_dir.get(d) or [])
                    for d in base["read_set"]
                ),
            )
            return _ret()
        finally:
            df.unpersist()

    def row_count(
        self,
        name: str,
        snapshot_id: str | None = None,
        tag: str | None = None,
        as_of_ts: float | None = None,
    ) -> int:
        """COUNT(*) of a snapshot view from manifest metadata — each
        file's footer num_rows was recorded at write time, so the
        common case touches no data at all (the Iceberg
        manifest-count). Dirs predating row stats (or with unreadable
        footers) fall back to a Spark count over JUST those dirs."""
        m = self._load_manifest(name)
        snap = self._resolve(m, snapshot_id, tag, as_of_ts)
        if snap is None:
            raise FileNotFoundError(f"table {name} has no snapshots")
        if self._pending_deletes(snap):
            # manifest counts cannot subtract a MOR delete (how many of
            # its keys actually match is unknown until scanned — the
            # same honesty gap Iceberg has with equality deletes):
            # fall back to a real count of the delete-applied view
            return self._union_snapshot_dirs(
                name, m, snap["read_set"], snap.get("schema"),
                deletes=self._pending_deletes(snap),
            ).count()
        stats_by_dir = {
            f"snap_{s['id']}": s.get("files") for s in m["snapshots"]
        }
        total = 0
        unknown: list[str] = []
        for d in snap["read_set"]:
            finfo = stats_by_dir.get(d)
            if finfo is None or any("rows" not in f for f in finfo):
                if os.path.isdir(os.path.join(self._dir(name), d)):
                    unknown.append(d)
                continue
            total += sum(f["rows"] for f in finfo)
        if unknown:
            total += self._union_snapshot_dirs(
                name, m, unknown, snap.get("schema")
            ).count()
        return total

    def tag(
        self, name: str, tag_name: str, snapshot_id: str | None = None
    ) -> str:
        """Pin a release tag to a snapshot (default: current) — the
        Iceberg tag/ref analogue. Tagged snapshots survive
        ``expire_snapshots`` (that is the point: a shipped release
        stays re-exportable bit-for-bit until its tag is dropped).
        Re-tagging the same snapshot is a no-op; moving an existing
        tag raises — drop it first (tags name immutable releases)."""
        self._refuse_on_branch("tag")
        with self._table_lock(name):
            m = self._load_manifest(name)
            snap = self._snapshot(m, snapshot_id)
            if snap is None:
                raise FileNotFoundError(
                    f"table {name} has no snapshots"
                )
            tags = m.setdefault("tags", {})
            have = tags.get(tag_name)
            if have is not None and have != snap["id"]:
                raise ValueError(
                    f"tag {tag_name!r} already names snapshot {have} "
                    f"(wanted {snap['id']}) — untag first; tags name "
                    "immutable releases"
                )
            tags[tag_name] = snap["id"]
            self._save_manifest(name, m)
            return snap["id"]

    def untag(self, name: str, tag_name: str) -> None:
        with self._table_lock(name):
            m = self._load_manifest(name)
            if tag_name not in m.get("tags", {}):
                raise KeyError(f"unknown tag {tag_name!r}")
            del m["tags"][tag_name]
            self._save_manifest(name, m)

    def tags(self, name: str) -> dict:
        return dict(self._load_manifest(name).get("tags", {}))

    def exists(self, name: str) -> bool:
        # branch-aware: under a default_branch handle this is the
        # branch view's non-emptiness (fork semantics before the first
        # branch commit — same as _resolve)
        m = self._load_manifest(name)
        return self._resolve(m, None, None, None) is not None

    def list_tables(self) -> list[str]:
        """Every table under this root (dirs holding a manifest.json)
        — the iteration surface for store-wide maintenance (scheduled
        snapshot expiry, audits)."""
        out = []
        for entry in sorted(os.listdir(self.root)):
            if os.path.exists(
                os.path.join(self.root, entry, "manifest.json")
            ):
                out.append(entry)
        return out

    def snapshots(self, name: str) -> list[dict]:
        return self._load_manifest(name)["snapshots"]

    def property_records(self, name: str) -> list[dict]:
        """{id, properties} for every snapshot ever committed — live
        manifest entries PLUS records retained by expire_snapshots. The
        crash/replay guards consult this so version GC cannot erase
        their idempotency memory."""
        m = self._load_manifest(name)
        return [
            {"id": s["id"], "properties": s.get("properties", {})}
            for s in m["snapshots"]
        ] + m.get("expired_props", [])

    def current_snapshot(self, name: str) -> dict | None:
        # branch-aware under a default_branch handle (the crash-replay
        # guards resolve reachability through this, which is exactly
        # what makes WAP re-runs correct: a shard committed to a LIVE
        # branch is reachable and skips; the same shard after
        # drop_branch is unreachable and honestly re-processes)
        m = self._load_manifest(name)
        return self._resolve(m, None, None, None)

    # -- WAP branches ---------------------------------------------------

    def branches(self, name: str) -> dict:
        return dict(self._load_manifest(name).get("branches", {}))

    def publish_branch(self, name: str, branch: str) -> str:
        """Fast-forward mainline ``current`` to the branch head and
        drop the branch ref — the PUBLISH step of write-audit-publish.
        Atomic under the table lock; refuses (RuntimeError) when
        mainline moved since the branch forked (the head no longer
        descends from current — publishing would silently discard the
        concurrent mainline commit; re-run the staged job on a fresh
        fork). Returns the published snapshot id."""
        with self._table_lock(name):
            m = self._load_manifest(name)
            head = m.get("branches", {}).get(branch)
            if head is None:
                raise KeyError(
                    f"unknown branch {branch!r} on table {name} "
                    f"(have: {sorted(m.get('branches', {}))})"
                )
            cur = m["current"]
            if cur is not None:
                s: dict | None = self._snapshot(m, head)
                seen: set = set()
                while s is not None and s["id"] != cur:
                    p = s.get("parent")
                    if p is None or p in seen:
                        s = None
                        break
                    seen.add(p)
                    try:
                        s = self._snapshot(m, p)
                    except KeyError:  # chain expired mid-branch
                        s = None
                if s is None:
                    raise RuntimeError(
                        f"publish_branch({name}, {branch!r}): mainline "
                        f"current ({cur}) is not an ancestor of the "
                        f"branch head ({head}) — a concurrent mainline "
                        "commit landed after the fork (or the fork "
                        "chain was expired). Re-run the staged job on "
                        "a fresh branch; never force-publish over it."
                    )
            m["current"] = head
            del m["branches"][branch]
            self._save_manifest(name, m)
            return head

    def drop_branch(self, name: str, branch: str) -> None:
        """Discard a staging branch (the audit-failed verdict): the
        ref disappears, mainline never sees the staged snapshots, and
        their dirs become expirable orphans. The crash-replay guards
        key on REACHABILITY, so a re-run of the same shards honestly
        re-processes instead of skipping on the dead branch's
        property records."""
        with self._table_lock(name):
            m = self._load_manifest(name)
            if branch not in m.get("branches", {}):
                raise KeyError(f"unknown branch {branch!r}")
            del m["branches"][branch]
            self._save_manifest(name, m)

    def rollback(self, name: str, snapshot_id: str) -> None:
        """Point 'current' back at an older snapshot (Iceberg:
        CALL rollback_to_snapshot)."""
        self._refuse_on_branch("rollback")
        with self._table_lock(name):
            m = self._load_manifest(name)
            self._snapshot(m, snapshot_id)  # validate
            m["current"] = snapshot_id
            self._save_manifest(name, m)

    def expire_snapshots(
        self,
        name: str,
        keep_last: int = 5,
        orphan_grace_s: float = 3600.0,
    ) -> list[str]:
        """Drop all but the newest ``keep_last`` snapshots and delete files
        no surviving snapshot references (reference keeps newest 5,
        rollback_manager.py:165-184).

        ``orphan_grace_s``: unreferenced snap dirs YOUNGER than this are
        left alone — a concurrent writer's parquet write lands in its
        uuid dir BEFORE its manifest commit (write() holds the lock only
        for the manifest), so a zero-grace sweep would reap an in-flight
        snapshot. Same retention-interval discipline as Iceberg's
        orphan-file cleanup. Pass 0 to force-collect everything
        unreferenced (safe only with no concurrent writers)."""
        import shutil

        self._refuse_on_branch("expire_snapshots")
        with self._table_lock(name):
            return self._expire_inner(
                name, keep_last, orphan_grace_s, shutil
            )

    def _expire_inner(self, name, keep_last, orphan_grace_s, shutil):
        m = self._load_manifest(name)
        snaps = m["snapshots"]
        if len(snaps) <= keep_last:
            return []
        # snaps[-0:] would be the WHOLE list (Python slice), turning
        # keep_last=0 ("keep only pinned refs") into a silent no-op
        keep = snaps[-keep_last:] if keep_last > 0 else []
        # pinned refs: 'current' after a rollback, every TAGGED
        # release — a shipped release must stay re-exportable until
        # its tag is deliberately dropped — and every live BRANCH head
        # (a staged WAP run must survive GC until its audit verdict;
        # the head's read_set covers the whole staged view)
        pinned = set(m.get("tags", {}).values())
        pinned |= set(m.get("branches", {}).values())
        if m["current"] is not None:
            pinned.add(m["current"])
        keep = sorted(
            [s for s in snaps if s["id"] in pinned and s not in keep]
            + keep,
            key=lambda s: s["ts"],
        )  # chronological: later expires trust append order
        live_dirs = {d for s in keep for d in s["read_set"]}
        # MOR delete-key dirs are live while ANY kept snapshot carries
        # them (reads of that snapshot anti-join against the key file);
        # once every carrier expires — e.g. after the materializing
        # compact ages out of the window — they are swept like data dirs
        live_dirs |= {
            e["path"] for s in keep for e in self._pending_deletes(s)
            if e.get("path")
        }
        expired = [s["id"] for s in snaps if s not in keep]
        # retain pruned snapshots' {id, properties}: the crash/replay
        # guards (pipeline._find_committed_write, stream.batch_committed)
        # key on snapshot properties, and an append-chain snapshot's DATA
        # stays in the current view long after its manifest entry is
        # GC'd — dropping the record would make a resume re-append data
        # the table still contains. Tiny dicts; bounded by total appends.
        m.setdefault("expired_props", []).extend(
            {"id": s["id"], "properties": s.get("properties", {})}
            for s in snaps
            if s not in keep
        )
        # sweep the WHOLE table dir, not just this round's expired set: a
        # dir whose manifest entry was dropped in an earlier round while a
        # then-keeper still referenced it would otherwise never be
        # revisited once that keeper expires — an unbounded orphan leak.
        # Two classes of unreferenced dir: (a) KNOWN to the manifest
        # (some entry's read_set names it) — committed and expired,
        # delete immediately; (b) UNKNOWN — possibly a concurrent
        # writer's in-flight parquet that has not reached its manifest
        # commit yet (write() locks only the manifest step), so it is
        # deleted only past ``orphan_grace_s``.
        known = {d for s in snaps for d in s["read_set"]}
        known |= {
            e["path"] for s in snaps for e in self._pending_deletes(s)
            if e.get("path")
        }
        now = time.time()
        for entry in os.listdir(self._dir(name)):
            if (
                not entry.startswith(("snap_", "deletes_"))
                or entry in live_dirs
            ):
                continue
            path = os.path.join(self._dir(name), entry)
            if entry not in known:
                try:
                    if now - os.path.getmtime(path) < orphan_grace_s:
                        continue  # maybe in-flight: grace period
                except OSError:
                    continue
            shutil.rmtree(path, ignore_errors=True)
        m["snapshots"] = keep
        self._save_manifest(name, m)
        return expired

    # -- idempotency (parity: rollback_manager.py:142-163) --------------------

    def last_source_fingerprint(self, name: str) -> str | None:
        snap = (
            self.current_snapshot(name) if self.exists(name) else None
        )
        return (snap or {}).get("properties", {}).get("source_fingerprint")

    def is_unchanged(self, name: str, fingerprint: str) -> bool:
        return self.last_source_fingerprint(name) == fingerprint


class IcebergStore:
    """Same interface over a real Iceberg catalog. Requires the
    iceberg-spark-runtime jar + a configured catalog; not available in this
    sandbox, so methods are thin wrappers kept for cluster deployments."""

    def __init__(self, spark: SparkSession, catalog: str, db: str) -> None:
        self.spark = spark
        self.prefix = f"{catalog}.{db}"

    def write(self, name, df, mode="overwrite", partition_by=None,
              properties=None, bloom_cols=None, branch=None):
        full = f"{self.prefix}.{name}"
        if branch:
            # Iceberg-native WAP: write to a ref, publish later via
            # fast_forward. The branch must exist before the first
            # branch write (CREATE BRANCH IF NOT EXISTS), then the
            # branch identifier routes the commit.
            self.spark.sql(
                f"ALTER TABLE {full} CREATE BRANCH IF NOT EXISTS "
                f"`{branch}`"
            )
            full = f"{full}.branch_{branch}"
        writer = df.writeTo(full)
        for c in bloom_cols or []:
            # Iceberg's native analogue of the TableStore bloom sidecar:
            # parquet writes its own per-column bloom filters and the
            # readers/planner consume them — no sidecar needed
            writer = writer.tableProperty(
                f"write.parquet.bloom-filter-enabled.column.{c}", "true"
            )
        if partition_by:
            # one call: successive partitionedBy calls REPLACE the spec,
            # silently keeping only the last column
            from pyspark.sql import functions as F

            cols = [F.col(c) for c in partition_by]
            writer = writer.partitionedBy(cols[0], *cols[1:])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {full}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(row[0][0])

    def read(self, name, snapshot_id=None):
        full = f"{self.prefix}.{name}"
        r = self.spark.read
        if snapshot_id is not None:
            r = r.option("snapshot-id", snapshot_id)
        return r.table(full)

    def rollback(self, name, snapshot_id):
        cat = self.prefix.split(".")[0]
        self.spark.sql(
            f"CALL {cat}.system.rollback_to_snapshot"
            f"('{self.prefix}.{name}', {snapshot_id})"
        )

    def expire_snapshots(self, name, keep_last=5):
        cat = self.prefix.split(".")[0]
        self.spark.sql(
            f"CALL {cat}.system.expire_snapshots"
            f"(table => '{self.prefix}.{name}', retain_last => {keep_last})"
        )

    # --- surface parity with TableStore's maintenance ops ------------
    # Thin SQL mappings onto Iceberg's native features (MERGE INTO,
    # DELETE, rewrite_data_files, refs, TIMESTAMP AS OF). Not
    # exercisable in this sandbox (no iceberg runtime jar); kept in
    # lockstep with TableStore so a cluster deployment swaps stores
    # without touching callers. Iceberg does file-level COW, manifest
    # row counts and tag-aware retention natively — the TableStore
    # implementations mirror ITS semantics, not the reverse.

    def upsert(self, name, df, key_col):
        full = f"{self.prefix}.{name}"
        # uuid-unique view: a fixed name would let a concurrent upsert
        # on the same SparkSession replace the source between view
        # registration and MERGE execution (silent cross-table merge),
        # and would leak into the session catalog afterwards.
        view = f"_upsert_src_{uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(view)
        try:
            self.spark.sql(
                f"MERGE INTO {full} t USING {view} s "
                f"ON t.{key_col} = s.{key_col} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            self.spark.catalog.dropTempView(view)

    def delete_where(self, name, key_col, keys):
        def q(k):
            if isinstance(k, str):
                return "'" + k.replace("'", "''") + "'"
            return str(k)

        # table properties are sticky: a prior delete_keys_mor left
        # write.delete.mode=merge-on-read, which would silently turn
        # this documented COW delete into a MOR one — pin COW first
        self.spark.sql(
            f"ALTER TABLE {self.prefix}.{name} SET TBLPROPERTIES ("
            "'write.delete.mode'='copy-on-write')"
        )
        self.spark.sql(
            f"DELETE FROM {self.prefix}.{name} "
            f"WHERE {key_col} IN ({', '.join(q(k) for k in keys)})"
        )

    def delete_keys_mor(self, name, key_col, keys):
        """Merge-on-read delete — Iceberg v2 native: flip the table's
        delete mode to merge-on-read and DELETE; the engine writes
        delete files instead of rewriting data files, and
        rewrite_data_files/rewrite_position_delete_files later
        materializes them (TableStore.compact's role)."""
        def q(k):
            if isinstance(k, str):
                return "'" + k.replace("'", "''") + "'"
            return str(k)

        full = f"{self.prefix}.{name}"
        self.spark.sql(
            f"ALTER TABLE {full} SET TBLPROPERTIES ("
            "'write.delete.mode'='merge-on-read', "
            "'format-version'='2')"
        )
        self.spark.sql(
            f"DELETE FROM {full} "
            f"WHERE {key_col} IN ({', '.join(q(k) for k in keys)})"
        )

    def delete_below(self, name, col, cutoff):
        """Predicate retention delete — Iceberg's own metadata-delete
        handles the whole-file drop when the predicate aligns with
        file bounds (same fast path TableStore.delete_below implements
        by hand); NULLs survive (SQL '<' is NULL-false)."""
        v = (
            "'" + cutoff.replace("'", "''") + "'"
            if isinstance(cutoff, str) else str(cutoff)
        )
        # pin COW: a prior *_mor call's sticky merge-on-read property
        # must not hijack this documented COW delete
        self.spark.sql(
            f"ALTER TABLE {self.prefix}.{name} SET TBLPROPERTIES ("
            "'write.delete.mode'='copy-on-write')"
        )
        self.spark.sql(
            f"DELETE FROM {self.prefix}.{name} WHERE {col} < {v}"
        )

    def delete_below_mor(self, name, col, cutoff):
        """Merge-on-read predicate delete — Iceberg v2 native: flip
        the delete mode to merge-on-read and DELETE; the engine writes
        delete files instead of rewriting data files
        (rewrite_data_files / rewrite_position_delete_files later
        materializes them — TableStore.compact's role)."""
        v = (
            "'" + cutoff.replace("'", "''") + "'"
            if isinstance(cutoff, str) else str(cutoff)
        )
        full = f"{self.prefix}.{name}"
        self.spark.sql(
            f"ALTER TABLE {full} SET TBLPROPERTIES ("
            "'write.delete.mode'='merge-on-read', "
            "'format-version'='2')"
        )
        self.spark.sql(f"DELETE FROM {full} WHERE {col} < {v}")

    def compact(self, name, target_files=None, cluster_by=None,
                bloom_cols=None, zorder_by=None):
        if cluster_by and zorder_by:
            raise ValueError(
                "cluster_by and zorder_by are mutually exclusive layouts"
            )
        cat = self.prefix.split(".")[0]
        for c in bloom_cols or []:
            self.spark.sql(
                f"ALTER TABLE {self.prefix}.{name} SET TBLPROPERTIES ("
                f"'write.parquet.bloom-filter-enabled.column.{c}'='true')"
            )
        opts = ""
        if cluster_by:
            # sort_order is ONE string argument holding a comma-separated
            # column list ("clip_id, ts") — quoting each column would
            # nest quotes inside the SQL string literal and break the
            # call's parse.
            cols = ", ".join(cluster_by)
            opts = f", strategy => 'sort', sort_order => '{cols}'"
        elif zorder_by:
            # Iceberg's native z-order rewrite — the engine-side twin of
            # TableStore._zorder_column's Morton layout
            cols = ", ".join(zorder_by)
            opts = f", strategy => 'sort', sort_order => 'zorder({cols})'"
        if target_files is not None:
            # TableStore sizes output by file COUNT; Iceberg's rewrite
            # sizes by bytes. Map count -> target-file-size-bytes from
            # the table's current total size so the surface-parity
            # contract (swap stores, same call) still does what the
            # caller asked for.
            total = self.spark.sql(
                f"SELECT COALESCE(SUM(file_size_in_bytes), 0) AS b "
                f"FROM {self.prefix}.{name}.files"
            ).collect()[0]["b"]
            per_file = max(int(total) // max(int(target_files), 1), 1)
            opts += (
                ", options => map('target-file-size-bytes', "
                f"'{per_file}')"
            )
        self.spark.sql(
            f"CALL {cat}.system.rewrite_data_files"
            f"(table => '{self.prefix}.{name}'{opts})"
        )

    def binpack(self, name, small_file_bytes=64 * 1024 * 1024,
                target_files=None):
        """Iceberg's native binpack rewrite scoped to small files —
        the same incremental-maintenance contract as
        TableStore.binpack: only files below the threshold rewrite
        (min-input-files=2 mirrors the <2-smalls no-op)."""
        cat = self.prefix.split(".")[0]
        self.spark.sql(
            f"CALL {cat}.system.rewrite_data_files"
            f"(table => '{self.prefix}.{name}', strategy => 'binpack', "
            f"options => map('max-file-size-bytes', "
            f"'{int(small_file_bytes)}', 'min-input-files', '2'))"
        )

    def rename_column(self, name, old, new):
        # Iceberg-native schema evolution (field-id mapping, no rewrite)
        self.spark.sql(
            f"ALTER TABLE {self.prefix}.{name} "
            f"RENAME COLUMN `{old}` TO `{new}`"
        )

    def drop_column(self, name, col):
        self.spark.sql(
            f"ALTER TABLE {self.prefix}.{name} DROP COLUMN `{col}`"
        )

    def publish_branch(self, name, branch):
        # Iceberg's WAP publish: fast-forward main onto the audited ref
        cat = self.prefix.split(".")[0]
        self.spark.sql(
            f"CALL {cat}.system.fast_forward("
            f"table => '{self.prefix}.{name}', "
            f"branch => 'main', to => '{branch}')"
        )
        self.drop_branch(name, branch)

    def drop_branch(self, name, branch):
        self.spark.sql(
            f"ALTER TABLE {self.prefix}.{name} DROP BRANCH `{branch}`"
        )

    def tag(self, name, tag_name, snapshot_id=None):
        full = f"{self.prefix}.{name}"
        at = (
            f" AS OF VERSION {snapshot_id}" if snapshot_id else ""
        )
        self.spark.sql(
            f"ALTER TABLE {full} CREATE TAG `{tag_name}`{at}"
        )

    def untag(self, name, tag_name):
        self.spark.sql(
            f"ALTER TABLE {self.prefix}.{name} DROP TAG `{tag_name}`"
        )

    def read_as_of(self, name, as_of_ts):
        return self.spark.read.option(
            "as-of-timestamp", str(int(as_of_ts * 1000))
        ).table(f"{self.prefix}.{name}")

    def row_count(self, name):
        return self.spark.sql(
            f"SELECT count(*) FROM {self.prefix}.{name}"
        ).collect()[0][0]  # Iceberg answers from manifests
