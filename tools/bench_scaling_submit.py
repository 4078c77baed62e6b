"""Two-CLUSTER-SIZE scaling benchmark in the north rule's literal
deployment form: ``spark-submit --py-files pkg.zip`` on a
``local-cluster[N,c,mem]`` master — N separate executor JVMs (own
processes, own python workers, driver talks to them over RPC), the
closest a single host gets to an N-node cluster.

This complements tools/bench_scaling.py (in-process local[N], the
thread-scaling evidence): here the unit that is scaled 4x is the
EXECUTOR COUNT at a fixed per-executor shape, exactly the
"N and 4N executors" wording of the rule. The job is the identical
clip keep/drop+scrub pass both benches share.

Measurement discipline (DESIGN.md #15/#24): fresh cluster per config,
warm-up pass excluded, configs interleaved across rounds, per-config
minima. Each run measures ONE N -> 4N pair and MERGES it (keyed by
pair, e.g. '1->4') into BENCH/submit_scaling.json, then re-renders the
executor-scaling section of BENCH/BASELINE.md from all recorded pairs
— re-measuring one pair never discards another's evidence.

Usage:
  python tools/bench_scaling_submit.py [--n-clips 160000]
      [--base-executors 2] [--cores-per-executor 2]
      [--executor-mem-mb 4096] [--rounds 3]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The submitted job. Imports resolve through the --py-files zip only
# (repo is NOT on PYTHONPATH and cwd is a scratch dir) — every run is
# also a deployment-form smoke. One JSON line on stdout.
_JOB = r"""
import json, sys, time

from pyspark.sql import functions as F


def _jiffies():
    # host-wide busy jiffies: executors are separate local processes, so
    # /proc/stat still captures the cores the whole cluster consumed
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[3] + v[4]


path, n, repeats, shuffle_parts = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
# the PRODUCT session factory (from the zip): under spark-submit it
# leaves master/driver-memory alone but still applies the workload
# configs — notably the 512-row columnar/Arrow batches that keep
# ~55 KB binary audio rows from OOMing a modest executor heap
from data_quality_check_pipeline_spark.session import get_spark

spark = get_spark(
    app_name="submit-scale", shuffle_partitions=int(shuffle_parts)
)
assert spark.sparkContext.master.startswith("local-cluster"), (
    "master fell back to " + spark.sparkContext.master)

from data_quality_check_pipeline_spark.operators.scrub import (
    scrub_transcripts)
from data_quality_check_pipeline_spark.pipeline import (
    flag_clips, score_clips)

# warm-up: spins up executor JVMs + python workers + zipimport, and
# touches every scorer UDF so no config pays first-call costs in the
# timed passes
warm = scrub_transcripts(
    flag_clips(score_clips(spark.read.parquet(path).limit(256)))
    .filter(F.col("keep")).drop("reasons", "severity", "keep"))
warm.agg(F.count(F.lit(1)), F.sum("pii_hits")).collect()

walls, busys, kept_n = [], [], None
for _ in range(repeats):
    t0 = time.time()
    b0, i0 = _jiffies()
    flagged = flag_clips(score_clips(spark.read.parquet(path)))
    kept = scrub_transcripts(
        flagged.filter(F.col("keep")).drop("reasons", "severity", "keep"))
    row = kept.agg(F.count(F.lit(1)).alias("kept"),
                   F.sum("pii_hits").alias("hits")).collect()[0]
    walls.append(time.time() - t0)
    b1, i1 = _jiffies()
    busys.append(((b1 - b0) - (i1 - i0)) / 100.0)
    kept_n = row["kept"]
best = min(range(repeats), key=lambda i: walls[i])
print(json.dumps({
    "master": spark.sparkContext.master,
    "wall_s": walls[best], "walls": walls,
    "busy_core_s": busys[best],
    "effective_cores": busys[best] / walls[best],
    "kept": kept_n, "clips_per_sec": n / walls[best],
}))
spark.stop()
"""


def _load_builder():
    spec = importlib.util.spec_from_file_location(
        "build_pyfiles", os.path.join(REPO, "tools", "build_pyfiles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _spark_submit() -> str:
    import pyspark

    bundled = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    if os.path.exists(bundled):
        return bundled
    found = shutil.which("spark-submit")
    if not found:
        raise SystemExit("no spark-submit found")
    return found


def run_once(
    n_exec: int,
    cores_each: int,
    mem_mb: int,
    pkg_zip: str,
    job_file: str,
    scratch: str,
    corpus: str,
    n_clips: int,
    repeats: int,
) -> dict:
    import pyspark

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from the zip
    env["SPARK_HOME"] = os.path.dirname(pyspark.__file__)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    total_cores = n_exec * cores_each
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", f"local-cluster[{n_exec},{cores_each},{mem_mb}]",
            "--driver-memory", "4g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--py-files", pkg_zip,
            job_file,
            corpus, str(n_clips), str(repeats), str(total_cores * 2),
        ],
        cwd=scratch,
        env=env,
        capture_output=True,
        text=True,
        check=True,
        timeout=900,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=160000)
    ap.add_argument("--base-executors", type=int, default=2)
    # 1 core/exec is the committed-evidence shape (DESIGN: 2 cores/exec
    # at 8 executors oversubscribes the 32-thread host once pandas-UDF
    # python workers overlap the JVM task threads) — keep the default
    # equal to what BENCH/submit_scaling.json records
    ap.add_argument("--cores-per-executor", type=int, default=1)
    ap.add_argument("--executor-mem-mb", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from data_quality_check_pipeline_spark.synth import write_corpus

    path_dir = f"/tmp/spark_graft_clips_cache/n{args.n_clips}"
    corpus = os.path.join(path_dir, "clips.parquet")
    if not os.path.exists(corpus):
        print(f"generating {args.n_clips} clips ...", file=sys.stderr)
        write_corpus(path_dir, args.n_clips)

    n_lo, n_hi = args.base_executors, args.base_executors * 4
    if n_hi * args.cores_per_executor > 32:
        ap.error(
            f"4N = {n_hi} executors x {args.cores_per_executor} cores "
            "exceeds the host's 32 hardware threads"
        )

    scratch = tempfile.mkdtemp(prefix="submit_scale_")
    b = _load_builder()
    pkg_zip = b.build(os.path.join(scratch, "pkg.zip"))
    job_file = os.path.join(scratch, "job.py")
    with open(job_file, "w") as f:
        f.write(_JOB)

    best: dict[int, dict] = {}
    for r in range(args.rounds):
        for n_exec in (n_lo, n_hi):  # interleaved (DESIGN #15)
            cur = run_once(
                n_exec, args.cores_per_executor, args.executor_mem_mb,
                pkg_zip, job_file, scratch, corpus, args.n_clips,
                args.repeats,
            )
            if (
                n_exec not in best
                or cur["wall_s"] < best[n_exec]["wall_s"]
            ):
                best[n_exec] = cur
            print(
                f"round {r}: executors={n_exec} wall={cur['wall_s']:.1f}s"
                f" ({cur['master']})",
                file=sys.stderr,
            )
    lo, hi = best[n_lo], best[n_hi]
    speedup = lo["wall_s"] / hi["wall_s"]
    nominal = speedup / (n_hi / n_lo)
    core_ratio = hi["effective_cores"] / lo["effective_cores"]
    normalized = speedup / core_ratio if core_ratio > 0 else None
    pair = {
        "n_clips": args.n_clips,
        "cores_per_executor": args.cores_per_executor,
        "executor_mem_mb": args.executor_mem_mb,
        "rounds": args.rounds,
        "configs": {str(k): v for k, v in best.items()},
        "speedup": round(speedup, 2),
        "nominal_efficiency": round(nominal, 2),
        "delivered_core_ratio": round(core_ratio, 2),
        "normalized_efficiency": (
            round(normalized, 2) if normalized else None
        ),
    }
    result = _merge_pair(f"{n_lo}->{n_hi}", pair)
    print(json.dumps({f"{n_lo}->{n_hi}": pair}))
    _rewrite_baseline_section(result)
    shutil.rmtree(scratch, ignore_errors=True)


def _min_merge_pair(old: dict, new: dict) -> dict:
    """Per-config-minimum merge of a re-measured pair with its recorded
    evidence (DESIGN #15: on this host's bimodal timing, a re-run is a
    new SAMPLE — it may only tighten the minima, never clobber them
    with noise). Only applies when the workload shape is identical;
    a shape change (different n_clips / cores / mem) replaces outright.
    All observed walls are kept as history on the surviving config."""
    shape = ("n_clips", "cores_per_executor", "executor_mem_mb")
    if any(old.get(k) != new.get(k) for k in shape):
        return new
    merged = dict(new)
    merged["rounds"] = old.get("rounds", 0) + new.get("rounds", 0)
    configs = {}
    for n_exec, cur in new["configs"].items():
        prev = old.get("configs", {}).get(n_exec)
        walls = sorted(
            (prev.get("walls", []) if prev else []) + cur.get("walls", [])
        )
        keep = dict(
            cur if prev is None or cur["wall_s"] <= prev["wall_s"] else prev
        )
        keep["walls"] = walls
        configs[n_exec] = keep
    merged["configs"] = configs
    execs = sorted(int(k) for k in configs)
    if len(execs) == 2:
        lo, hi = configs[str(execs[0])], configs[str(execs[1])]
        speedup = lo["wall_s"] / hi["wall_s"]
        merged["speedup"] = round(speedup, 2)
        merged["nominal_efficiency"] = round(
            speedup / (execs[1] / execs[0]), 2
        )
        ratio = hi["effective_cores"] / lo["effective_cores"]
        merged["delivered_core_ratio"] = round(ratio, 2)
        merged["normalized_efficiency"] = (
            round(speedup / ratio, 2) if ratio > 0 else None
        )
    return merged


def _load_doc(path: str) -> dict:
    """Read submit_scaling.json in its CURRENT keyed-by-pair shape,
    migrating the legacy single-pair flat shape on the fly — shared by
    _merge_pair and by bench_scaling.py's section re-render so neither
    caller KeyErrors on a legacy file."""
    doc = {
        "metric": "executor_scaling_efficiency_submit",
        "deploy": "spark-submit --py-files pkg.zip",
        "pairs": {},
    }
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        if "pairs" in old:
            doc = old
        elif "pair" in old:  # legacy flat shape: one pair at top level
            lo_s, hi_s = old["pair"].split("->")
            doc["pairs"][f"{lo_s.strip()}->{hi_s.split()[0].strip()}"] = {
                k: old[k]
                for k in (
                    "n_clips", "cores_per_executor", "executor_mem_mb",
                    "rounds", "configs", "speedup", "nominal_efficiency",
                    "delivered_core_ratio", "normalized_efficiency",
                )
                if k in old
            }
    return doc


def _merge_pair(key: str, pair: dict) -> dict:
    """Accumulate this run's N->4N pair into BENCH/submit_scaling.json
    (keyed by the executor-count pair, e.g. '1->4'): re-measuring one
    pair never discards the evidence for another, and a same-shape
    re-measurement min-merges per config instead of overwriting.
    Migrates the legacy single-pair flat file shape in place."""
    path = os.path.join(REPO, "BENCH", "submit_scaling.json")
    doc = _load_doc(path)
    if key in doc["pairs"]:
        pair = _min_merge_pair(doc["pairs"][key], pair)
    doc["pairs"][key] = pair
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    return doc


_SECTION = "## Executor scaling via spark-submit (multi-executor JVMs)"


def _rewrite_baseline_section(result) -> None:
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    lines = [
        _SECTION,
        "",
        "Same job, deployed the way the north rule words it: "
        "`spark-submit --py-files pkg.zip` on a `local-cluster[N,c,mem]` "
        "master — N separate executor JVMs, scaled N -> 4N in the "
        "EXECUTOR COUNT (fresh cluster per config, warm-up excluded, "
        "interleaved rounds, per-config minima). Every measured pair "
        "is kept:",
    ]
    pairs = sorted(
        result["pairs"].items(), key=lambda kv: int(kv[0].split("->")[0])
    )
    for key, p in pairs:
        n_lo, n_hi = (int(x) for x in key.split("->"))
        lines += [
            "",
            f"### {n_lo} -> {n_hi} executors "
            f"({p['cores_per_executor']} core(s) / "
            f"{p['executor_mem_mb']} MB each, {p['n_clips']} clips, "
            f"x{p['rounds']} rounds)",
            "",
            "| executors | total cores | wall s | clips/sec | "
            "effective cores |",
            "|---|---|---|---|---|",
        ]
        for n_exec in (n_lo, n_hi):
            row = p["configs"][str(n_exec)]
            lines.append(
                f"| {n_exec} | {n_exec * p['cores_per_executor']} | "
                f"{row['wall_s']:.2f} | {row['clips_per_sec']:.0f} | "
                f"{row['effective_cores']:.1f} |"
            )
        lines += [
            "",
            f"**speedup {p['speedup']}x, nominal efficiency "
            f"{p['nominal_efficiency']}, delivered-core ratio "
            f"{p['delivered_core_ratio']}x, normalized efficiency "
            f"{p['normalized_efficiency']}** (target >= 0.8 per "
            "BASELINE.json). Reproduce: `python "
            f"tools/bench_scaling_submit.py --base-executors {n_lo} "
            f"--cores-per-executor {p['cores_per_executor']}`",
        ]
    lines += [
        "",
        "Reading the two figures: each executor's pandas-UDF python "
        "worker overlaps its JVM task thread, so a cluster of N "
        "1-core executors consumes up to ~2N hardware threads. When "
        "4N stays comfortably inside the host's 32 threads (the "
        "1 -> 4 pair: at most ~8 threads), the host genuinely "
        "delivers the 4x and the NOMINAL efficiency is the honest "
        "cluster-scaling figure. When 4N pushes against the host "
        "(the 2 -> 8 pair: ~16 threads plus shuffle/GC), part of the "
        "nominal shortfall is hardware never delivered — "
        "/proc/stat-measured effective cores quantify it, and the "
        "delivered-core-NORMALIZED efficiency is the predictor for a "
        "real cluster where each added node ships its own cores "
        "(measured oversubscription extreme: `--cores-per-executor 2` "
        "at 2->8 executors wants the whole 32-thread host and gives "
        "speedup 1.85x at delivered-core ratio 2.85x). Busy-core-"
        "seconds stay flat per clip across executor counts, i.e. "
        "adding executors adds no per-core algorithmic cost: the plan "
        "is one embarrassingly parallel scan+score+scrub pass plus "
        "the bounded key-only dup-check shuffle.",
        "",
    ]
    with open(md) as f:
        text = f.read()
    if _SECTION in text:
        head, _, tail = text.partition(_SECTION)
        # the old section runs to the next H2 (or EOF)
        rest = tail.split("\n## ", 1)
        tail = ("\n## " + rest[1]) if len(rest) > 1 else ""
        text = head + "\n".join(lines) + tail
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines)
    with open(md, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
