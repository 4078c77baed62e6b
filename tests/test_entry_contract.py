"""Harness-contract pins for __spark_entry__ (Spark-free, sub-second).

The driver records oracle evidence for at most 50 queries()
entries (observed cap, VERDICT r03): a 51st query silently falls off
per-round correctness evidence, and a renamed column in an oracle SQL
string only surfaces as a hash mismatch at round end. These tests make
both failure modes a local pytest failure instead:

* queries() holds EXACTLY 50 entries — adding one means consolidating
  or retiring another, a deliberate decision (see doc_dup_stats /
  orders_status_priority_profile / doc_decontam_hits docstrings for
  the precedent), never an accident.
* EVERY query has an oracle_sql() entry — inline DuckDB SQL, or (for
  the PINNED golden-backed list) a VALUES-literal rendered from the
  committed sf0.01 goldens (pure-Python re-derivations in
  tools/goldens_*.json) — an oracle entry dropped by a refactor fails
  here, not at round end.
* every oracle SQL statically binds in DuckDB against the REAL table
  schemas (LIMIT-0 views over the sf0.001 parquet files): column
  renames, typos and DuckDB-dialect errors fail in milliseconds
  without running Spark.
"""

import re

import duckdb
import pytest

import __spark_entry__ as entry

DRIVER_EVIDENCE_CAP = 50

# Queries whose oracle_sql() entry is a VALUES literal rendered from a
# committed golden (fingerprint-pinned pure-Python re-derivation,
# sf0.01) rather than inline DuckDB SQL over the tables. Additions here
# must come with a goldens entry (tools/make_goldens.py); keep this
# list deliberate and short.
GOLDEN_BACKED = {
    "clips_audio_neardup",
    "clips_keep_stats",
    "clips_langid_distribution",
    "clips_reason_histogram",
    "doc_dsir_select",
    "doc_minhash_pairs",
    # rendered from doc_minhash_pairs' golden restricted to pairs
    # touching a new-batch id (see its queries() docstring)
    "doc_minhash_incremental",
    "doc_simhash_pairs",
    "doc_stratified_sample",
}

# golden-file key each VALUES-backed oracle derives from
_GOLDEN_SOURCE = {"doc_minhash_incremental": "doc_minhash_pairs"}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = "/root/testdata/sf0.001"


class TestHarnessContract:
    def test_exactly_fifty_queries(self):
        qs = entry.queries()
        assert len(qs) == DRIVER_EVIDENCE_CAP, (
            f"queries() holds {len(qs)} entries; the driver records "
            f"oracle evidence for at most {DRIVER_EVIDENCE_CAP} — "
            "consolidate or retire a query instead of exceeding the cap"
        )
        assert all(callable(fn) for fn in qs.values())
        assert all(re.fullmatch(r"[a-z0-9_]+", k) for k in qs)

    def test_oracle_pairing_is_exhaustive_and_pinned(self):
        qs = set(entry.queries())
        sqls = entry.oracle_sql()
        assert set(sqls) == qs, (
            f"orphan oracles: {sorted(set(sqls) - qs)}; "
            f"queries without an oracle: {sorted(qs - set(sqls))}"
        )
        values_backed = {
            name for name, sql in sqls.items() if "FROM (VALUES" in sql
        }
        assert values_backed == GOLDEN_BACKED, (
            "VALUES-literal (golden-rendered) oracles must match the "
            f"pinned set; diff: +{sorted(values_backed - GOLDEN_BACKED)} "
            f"-{sorted(GOLDEN_BACKED - values_backed)}"
        )
        # inline oracles must actually read the pre-registered views
        for name in qs - GOLDEN_BACKED:
            assert any(t in sqls[name] for t in TABLES), (
                f"{name}: inline oracle references no known table"
            )

    def test_every_oracle_sql_binds_against_real_schemas(self):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet') LIMIT 0"
            )
        failures = []
        for name, sql in entry.oracle_sql().items():
            try:
                # EXPLAIN type-checks and binds every column/function
                # reference without executing the plan
                con.execute(f"EXPLAIN {sql}")
            except Exception as exc:  # noqa: BLE001 - collect all
                failures.append(f"{name}: {exc}")
        assert not failures, "\n".join(failures)

    def test_golden_backed_queries_have_goldens(self):
        import json

        with open("tools/goldens_sf001.json") as f:
            goldens = json.load(f)
        missing = {
            q
            for q in GOLDEN_BACKED
            if _GOLDEN_SOURCE.get(q, q) not in goldens
        }
        assert not missing, (
            f"golden-backed queries without a committed golden: "
            f"{sorted(missing)} — run tools/make_goldens.py"
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
