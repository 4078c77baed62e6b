"""Two-parallelism scaling benchmark (the north-rule cluster-size evidence).

Runs the IDENTICAL clip keep/drop+scrub job at local[N] and local[4N] (fresh
JVM each, same input parquet), reports throughput at both and the scaling
efficiency  eff = (T_N / T_4N) / 4, and rewrites the measurement section of
BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [--n-clips 40000] [--base-cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from data_quality_check_pipeline_spark.session import get_spark
from data_quality_check_pipeline_spark.pipeline import flag_clips, score_clips
from data_quality_check_pipeline_spark.operators.scrub import scrub_transcripts

cores = int(sys.argv[1]); path = sys.argv[2]; n = int(sys.argv[3])
spark = get_spark(app_name=f"scale{{cores}}", cores=cores,
                  shuffle_partitions=cores * 2)
# warm up JVM/python workers on a slice (excluded from measurement)
spark.read.parquet(path).limit(64).count()
repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
walls = []
kept_n = None
for _ in range(repeats):
    t0 = time.time()
    df = spark.read.parquet(path)
    flagged = flag_clips(score_clips(df))
    kept = scrub_transcripts(
        flagged.filter(F.col("keep")).drop("reasons", "severity", "keep"))
    row = kept.agg(F.count(F.lit(1)).alias("kept"),
                   F.sum("pii_hits").alias("hits")).collect()[0]
    walls.append(time.time() - t0)
    kept_n = row["kept"]
wall = min(walls)  # steady-state capacity (first run pays worker startup)
print(json.dumps({{"cores": cores, "wall_s": wall, "walls": walls,
                   "kept": kept_n, "clips_per_sec": n / wall}}))
spark.stop()
"""


def run_once(cores: int, path: str, n: int, repeats: int = 2) -> dict:
    script = _CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), path, str(n),
         str(repeats)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=160000)
    ap.add_argument("--base-cores", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from data_quality_check_pipeline_spark.synth import write_corpus

    path_dir = f"/tmp/spark_graft_clips_cache/n{args.n_clips}"
    parquet = os.path.join(path_dir, "clips.parquet")
    if not os.path.exists(parquet):
        print(f"generating {args.n_clips} clips ...", file=sys.stderr)
        write_corpus(path_dir, args.n_clips)

    # Interleave configs across rounds and keep per-config minima: the
    # sandbox host shows multi-second noise epochs, and alternation prevents
    # one bad epoch from poisoning a single config's measurement.
    core_list = [args.base_cores, args.base_cores * 4,
                 args.base_cores * 16]
    core_list = [c for c in core_list if c <= 32]
    best: dict[int, dict] = {}
    for _ in range(args.rounds):
        for c in core_list:
            cur = run_once(c, parquet, args.n_clips)
            if c not in best or cur["wall_s"] < best[c]["wall_s"]:
                best[c] = cur
            print(f"round: cores={c} wall={cur['wall_s']:.1f}s",
                  file=sys.stderr)
    lo = best[core_list[0]]
    hi = best[core_list[1]]
    eff = (lo["wall_s"] / hi["wall_s"]) / 4.0
    result = {
        "n_clips": args.n_clips,
        "configs": {str(c): best[c] for c in core_list},
        "low": lo,
        "high": hi,
        "speedup": lo["wall_s"] / hi["wall_s"],
        "scaling_efficiency": round(eff, 3),
    }
    if len(core_list) > 2:
        xhi = best[core_list[2]]
        result["speedup_4N_16N"] = hi["wall_s"] / xhi["wall_s"]
        result["scaling_efficiency_4N_16N"] = round(
            (hi["wall_s"] / xhi["wall_s"]) / 4.0, 3
        )
    print(json.dumps(result, indent=2))

    rows_md = "\n".join(
        f"| local[{c}] | {best[c]['wall_s']:.2f} | "
        f"{best[c]['clips_per_sec']:.0f} |"
        for c in core_list
    )
    md = f"""# BENCH — measured scaling evidence (north rule)

Same clip keep/drop+scrub job (clean -> langid/perplexity UDFs +
JVM-extracted Welch-window audio stats (bytes never cross to Python)
-> rule flags -> duplicate check -> scrub -> count+agg) on the IDENTICAL deterministic synthetic corpus
({args.n_clips} clips, seed=42), at multiple parallelism levels in fresh
JVMs, configs interleaved across {args.rounds} rounds, per-config minimum
(steady-state; the sandbox host has multi-second noise epochs and a hard
~500 MB/s byte-throughput wall measured independently of core count — see
DESIGN.md):

| parallelism | wall s | clips/sec |
|---|---|---|
{rows_md}

**N = local[{args.base_cores}] -> 4N = local[{args.base_cores * 4}]:
speedup {result['speedup']:.2f}x, scaling efficiency
{result['scaling_efficiency']:.2f}** (target >= 0.8 per BASELINE.json)

Reproduce: `python tools/bench_scaling.py --n-clips {args.n_clips} \\
--base-cores {args.base_cores}`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
