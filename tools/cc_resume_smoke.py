"""Driver-loss resume smoke for distributed connected-components AT SCALE
(r03 VERDICT #9: the driver_threshold=0 distributed path + resume was only
exercised at toy size).

Edge set: the (l_orderkey, l_partkey) bipartite graph of the 10x-sf0.1
lineitem table (~6M edges over ~1.7M nodes — far past the 100k driver
union-find shortcut, so this runs the distributed pointer-jumping path
with durable round checkpoints). Protocol:

1. run with max_iter=2 -> RuntimeError mid-iteration (the 'killed driver'
   leaves complete round_<i> files under the run_tag dir)
2. SAME run_tag, ample max_iter -> must RESUME from the last complete
   round and converge
3. fresh full run under a DIFFERENT tag -> ground truth
4. assert label frames are IDENTICAL (exceptAll both ways == 0)

Usage: python tools/cc_resume_smoke.py [sf_dir] [ckpt_dir]
       (defaults: /tmp/sfscale /tmp/cc_resume_smoke; fabricate sfscale
        per CLAUDE.md's scale-smoke recipe first)

Prints one JSON line with edge/node/component counts and timings; the
result is recorded in DESIGN.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale"
    ckpt = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cc_resume_smoke"
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        print(
            f"missing {sf_dir}/lineitem.parquet — fabricate the 10x-sf0.1 "
            "corpus first (CLAUDE.md scale-smoke recipe)"
        )
        return 2
    shutil.rmtree(ckpt, ignore_errors=True)

    from pyspark.sql import functions as F

    from data_quality_check_pipeline_spark.operators.graph import (
        connected_components,
    )
    from data_quality_check_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cc-resume-smoke", cores="32")
    edges = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.col("l_orderkey").alias("id_a"),
            # disjoint id space for the part side of the bipartite graph
            (F.col("l_partkey") + F.lit(1_000_000_000)).alias("id_b"),
        )
    )
    n_edges = edges.count()

    t0 = time.time()
    crashed = False
    try:
        connected_components(
            edges, max_iter=2, checkpoint_dir=ckpt, run_tag="smoke",
            driver_threshold=0,
        )
    except RuntimeError:
        crashed = True  # expected: 'driver loss' mid-iteration
    t_crash = time.time() - t0
    run_dir = os.path.join(ckpt, "cc_smoke")
    rounds_left = [
        d for d in os.listdir(run_dir) if d.startswith("round_")
    ] if os.path.isdir(run_dir) else []

    t0 = time.time()
    resumed = connected_components(
        edges, max_iter=40, checkpoint_dir=ckpt, run_tag="smoke",
        driver_threshold=0,
    ).cache()
    n_nodes = resumed.count()
    t_resume = time.time() - t0

    t0 = time.time()
    fresh = connected_components(
        edges, max_iter=40, checkpoint_dir=ckpt, run_tag="fresh",
        driver_threshold=0,
    ).cache()
    fresh.count()
    t_fresh = time.time() - t0

    diff = (
        resumed.exceptAll(fresh).count() + fresh.exceptAll(resumed).count()
    )
    n_comp = resumed.select("comp").distinct().count()
    print(json.dumps({
        "edges": n_edges,
        "nodes": n_nodes,
        "components": n_comp,
        "crashed_as_planned": crashed,
        "rounds_left_by_crash": len(rounds_left),
        "label_diff_resumed_vs_fresh": diff,
        "t_crash_sec": round(t_crash, 1),
        "t_resume_sec": round(t_resume, 1),
        "t_fresh_sec": round(t_fresh, 1),
        "ok": crashed and bool(rounds_left) and diff == 0,
    }))
    spark.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    return 0 if (crashed and rounds_left and diff == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
