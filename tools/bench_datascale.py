"""Data-linearity benchmark: the IDENTICAL keep/drop+scrub job at a FIXED
parallelism over 1x / 2x / 8x corpora (the cached deterministic synthetic
corpora). The north-rule scale claim needs wall time to grow linearly in
rows — constant clips/sec across sizes means no superlinear term (no
accumulating driver state, no per-row overhead that grows with corpus
size) between the measured sizes.

Usage: python tools/bench_datascale.py [--cores 8] [--sizes 20000,40000,160000]
Writes BENCH/datascale.json and appends nothing (BASELINE.md cites it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_scaling import run_once  # noqa: E402  (same child harness)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--sizes", type=str, default="20000,40000,160000")
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from data_quality_check_pipeline_spark.synth import write_corpus

    sizes = [int(s) for s in args.sizes.split(",")]
    paths = {}
    for n in sizes:
        d = os.path.join(entrymod._CLIPS_CACHE_DIR, f"n{n}")
        parquet = os.path.join(d, "clips.parquet")
        if not os.path.exists(parquet):
            print(f"generating {n} clips ...", file=sys.stderr)
            write_corpus(d, n)
        paths[n] = parquet

    best: dict[int, dict] = {}
    for _ in range(args.rounds):
        for n in sizes:
            cur = run_once(args.cores, paths[n], n)
            if n not in best or cur["wall_s"] < best[n]["wall_s"]:
                best[n] = cur
            print(f"round: n={n} wall={cur['wall_s']:.1f}s "
                  f"({cur['clips_per_sec']:.0f} clips/s)", file=sys.stderr)

    base = best[sizes[0]]
    result = {
        "cores": args.cores,
        "sizes": {
            str(n): {
                "wall_s": best[n]["wall_s"],
                "clips_per_sec": best[n]["clips_per_sec"],
                "wall_ratio": best[n]["wall_s"] / base["wall_s"],
                "data_ratio": n / sizes[0],
            }
            for n in sizes
        },
    }
    # linearity = throughput at the largest size vs the smallest: 1.0 means
    # perfectly linear wall growth; >1 means big corpora run FASTER per
    # clip (fixed overhead amortized); <1 would flag a superlinear term.
    result["throughput_ratio_largest_vs_smallest"] = round(
        best[sizes[-1]]["clips_per_sec"] / base["clips_per_sec"], 3
    )
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "datascale.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
