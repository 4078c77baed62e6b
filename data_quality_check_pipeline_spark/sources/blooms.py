"""Per-file key-membership bloom sidecars for TableStore snapshots.

Why this exists: manifest min/max stats bound RANGE queries, but the
point-id maintenance shapes — a GDPR takedown of a handful of
clip_ids, a correction re-delivery, a changelog audit — hit an
UNclustered layout where every file's [min, max] spans the whole id
domain, so the copy-on-write rewrite set degenerates to the entire
table (DESIGN.md #41-42; the documented answer was "cluster-compact
first"). Iceberg's answer at 100 TB is per-file value sketches in
Puffin sidecars; this is the local analogue: each data file records a
small bloom filter over the table's designated key column(s), stored
NEXT TO the data in ``snap_<sid>/_blooms.json.gz`` (underscore-
prefixed, so Spark's file listing ignores it) and keyed by the file's
snap-dir-relative path. A bloom describes the FILE's contents, which
copy-on-write never mutates — a hard-linked carry-forward file keeps
its bloom valid, inherited by inode.

Correctness contract: false POSITIVES only. A file the bloom prunes
provably contains none of the queried keys (same xxhash64 the engine
uses everywhere, k independent probe positions, bit set at write for
every present key); a false positive just costs an unnecessary file
read/rewrite. Anything uncertain — missing sidecar, unknown column,
value type not matching the recorded column type — degrades to "may
contain" (never wrong, merely less selective), mirroring
``_file_may_match``'s conservatism.

Build cost: ONE distributed Spark pass over the freshly written
files' key column (positions exploded, ``bit_or`` word aggregation —
all JVM-side; the driver only collects ≤ files x m/64 bitmap words).
Carried files are never re-read: their entries transfer by inode.
At a real deployment the collected words would land in a sidecar
TABLE instead of driver memory; the per-dir collect here is bounded
by ``MAX_COLLECT_WORDS`` and blooms are skipped (with a log) beyond
it — conservative, never wrong.

Membership tests run driver-side with the committed pure-Python
``oracle_hash.spark_xxhash64`` (bit-for-bit Spark parity, the same
helper the golden oracles trust), so pruning needs no Spark job.

Hash-domain note (DESIGN.md #23): positions hash
``(value, 'tbl_bloom', probe_index)`` — their own domain literal, so
bloom probes can never correlate with sampling/split/export
decisions over the same keys.
"""

from __future__ import annotations

import base64
import gzip
import json
import logging
import os
from urllib.parse import unquote, urlparse

from ..oracle_hash import Int32, spark_xxhash64

_log = logging.getLogger("dq_spark.blooms")

BLOOM_DOMAIN = "tbl_bloom"
SIDECAR_NAME = "_blooms.json.gz"
DEFAULT_K = 4
DEFAULT_BITS_PER_KEY = 10
MIN_BITS = 8192            # 1 KiB floor: tiny files still get low fpp
MAX_BITS = 1 << 23         # 1 MiB/file cap
MAX_COLLECT_WORDS = 50_000_000  # driver-collect guard (~400 MB of longs)
# membership tests are driver-side pure Python (k hashes per key per
# bitmap geometry + k bit probes per key per file): right for the
# point-id maintenance shape (takedown/correction batches, id
# lookups), quadratic noise for bulk batches — above this many keys
# blooms stand down and range pruning governs alone (at that batch
# size the table is plausibly all-affected anyway)
MAX_PROBE_KEYS = 5_000

# Spark column dtypes we can hash with exact python parity. Anything
# else (decimal, date, binary, ...) simply gets no bloom for that col.
_TYPE_TAGS = {"string": "str", "long": "long", "integer": "int"}


def _pow2_ceil(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def bloom_m(max_rows: int, bits_per_key: int = DEFAULT_BITS_PER_KEY) -> int:
    """Bitmap size (bits, power of two) for a file of ``max_rows`` keys:
    ~``bits_per_key`` bits/key gives ~1% fpp at k=4, clamped to
    [1 KiB, 1 MiB]."""
    return max(MIN_BITS, min(MAX_BITS, _pow2_ceil(max(1, max_rows) * bits_per_key)))


def _rel_from_uri(uri: str, data_dir: str) -> str:
    """Map Spark's ``input_file_name()`` URI back to a snap-dir-relative
    path (the manifest/sidecar key)."""
    p = urlparse(uri)
    path = unquote(p.path) if p.scheme else unquote(uri)
    return os.path.relpath(path, os.path.abspath(data_dir))


def _pack_words(words: dict[int, int], m: int) -> str:
    """Little-endian bytes of the m-bit bitmap, base64; '' for all-zero
    (an all-NULL-key file: contains nothing, prunes for every key)."""
    if not words:
        return ""
    buf = bytearray(m // 8)
    for w, bits in words.items():
        buf[w * 8:(w + 1) * 8] = (bits & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    return base64.b64encode(bytes(buf)).decode("ascii")


def build_bloom_entries(
    spark,
    data_dir: str,
    rel_paths: list[str],
    col: str,
    rows_by_rel: dict[str, int] | None = None,
    k: int = DEFAULT_K,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
) -> dict[str, dict]:
    """One distributed pass over ``rel_paths`` (files of one snapshot
    dir) building a bloom entry per file for ``col``. Returns
    {rel_path: {"m", "k", "t", "b64"}}; empty dict when the column is
    absent or its type has no exact-parity hash (callers treat a
    missing entry as "may contain")."""
    from pyspark.sql import functions as F

    if not rel_paths:
        return {}
    reader = spark.read.option("basePath", data_dir)
    df = reader.parquet(*[os.path.join(data_dir, p) for p in rel_paths])
    if col not in df.columns:
        return {}
    tname = df.schema[col].dataType.typeName()
    tag = _TYPE_TAGS.get(tname)
    if tag is None:
        _log.info(
            "blooms: column %r has type %s (no exact-parity hash) — "
            "skipping bloom stats for it", col, tname,
        )
        return {}
    max_rows = max(
        (rows_by_rel or {}).get(p, 0) for p in rel_paths
    ) if rows_by_rel else 0
    if not max_rows:
        # unknown row counts: size from the total (conservative = bigger)
        max_rows = df.count()
    m = bloom_m(max_rows, bits_per_key)
    if len(rel_paths) * (m // 64) > MAX_COLLECT_WORDS:
        _log.warning(
            "blooms: %d files x %d bits exceeds the driver-collect "
            "guard — skipping bloom stats for %r on this dir",
            len(rel_paths), m, col,
        )
        return {}
    pos = F.array(*[
        F.pmod(
            F.xxhash64(F.col(col), F.lit(BLOOM_DOMAIN), F.lit(i)),
            F.lit(m),
        )
        for i in range(k)
    ])
    words = (
        df.where(F.col(col).isNotNull())
        .select(F.input_file_name().alias("__bf"), F.explode(pos).alias("__bp"))
        .groupBy("__bf", F.expr("__bp div 64").alias("__bw"))
        .agg(F.bit_or(F.expr("shiftleft(1L, cast(__bp % 64 as int))")).alias("__bb"))
        .collect()
    )
    by_rel: dict[str, dict[int, int]] = {}
    for fname, widx, wbits in words:  # positional: Row blocks __-attrs
        by_rel.setdefault(_rel_from_uri(fname, data_dir), {})[widx] = wbits
    out = {}
    for p in rel_paths:
        out[p] = {
            "m": m, "k": k, "t": tag,
            "b64": _pack_words(by_rel.get(p, {}), m),
        }
    return out


# -- sidecar IO ---------------------------------------------------------------


def save_sidecar(data_dir: str, payload: dict) -> None:
    """Atomic write of {col: {rel: entry}} into the snapshot dir.
    Written BEFORE the manifest commit (like the data files): a crash
    in between leaves a dir whose sidecar is simply absent — reads
    degrade to min/max-only pruning, never to a wrong answer."""
    path = os.path.join(data_dir, SIDECAR_NAME)
    tmp = path + ".tmp"
    with gzip.open(tmp, "wt") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def load_sidecar(data_dir: str) -> dict | None:
    path = os.path.join(data_dir, SIDECAR_NAME)
    if not os.path.exists(path):
        return None
    try:
        with gzip.open(path, "rt") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None  # unreadable sidecar: conservative


# -- membership ---------------------------------------------------------------


def _coerce(value, tag: str):
    """Value as the hash input matching the recorded column type, or
    None when the python type cannot equal any column value (an int
    predicate on a string column matches nothing — but type-mismatch
    here stays CONSERVATIVE because a mismatched query was already
    nonsensical; we return None and the caller keeps the file)."""
    if isinstance(value, bool) or value is None:
        return None
    if tag == "str":
        return value if isinstance(value, str) else None
    if tag == "long":
        return value if isinstance(value, int) else None
    if tag == "int":
        return Int32(value) if isinstance(value, int) else None
    return None


class BloomTester:
    """Membership tester for a fixed key set, caching probe positions
    per (m, k, t) so a takedown batch hashes each key once per bitmap
    geometry, not once per file."""

    def __init__(self, keys) -> None:
        self.keys = list(keys)
        if len(self.keys) > MAX_PROBE_KEYS:
            self.keys = []
            self._too_many = True
        else:
            self._too_many = False
        self._pos: dict[tuple, list | None] = {}

    def _positions(self, m: int, k: int, tag: str):
        key = (m, k, tag)
        got = self._pos.get(key, False)
        if got is not False:
            return got
        out = []
        for v in self.keys:
            cv = _coerce(v, tag)
            if cv is None:
                out = None  # any un-hashable key: bloom can't decide
                break
            out.append([
                spark_xxhash64(cv, BLOOM_DOMAIN, Int32(i)) % m
                for i in range(k)
            ])
        self._pos[key] = out
        return out

    def any_maybe_present(self, entry: dict | None) -> bool:
        """True unless the bloom PROVES no key is in the file."""
        if self._too_many or not entry:
            return True
        try:
            m, k, tag, b64 = entry["m"], entry["k"], entry["t"], entry["b64"]
        except (KeyError, TypeError):
            return True
        per_key = self._positions(m, k, tag)
        if per_key is None:
            return True
        if not b64:
            return False  # all-zero bitmap: file holds no non-NULL keys
        bits = entry.get("_bits")
        if bits is None:
            bits = int.from_bytes(base64.b64decode(b64), "little")
            entry["_bits"] = bits  # decode once per operation
        for probes in per_key:
            if all((bits >> p) & 1 for p in probes):
                return True
        return False
