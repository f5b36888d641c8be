"""Two-parallelism scaling measurement (BASELINE.md protocol).

Packages klog_spark, runs tools/scaling_job.py via spark-submit at
local[N] and local[4N] on the same input, computes throughput at both and
efficiency = (R_4N / R_N) / 4, and writes BENCH/BASELINE.md.

Usage: python tools/run_scaling.py [sf] [N]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build_zip() -> Path:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    zpath = dist / "klog_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "klog_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return zpath


def run_once(cores: int, sf: float, zpath: Path, mode: str = "full",
             cluster: bool = False) -> dict:
    env = dict(os.environ, SPARK_SCALING_CORES=str(cores))
    if cluster:
        # N separate single-core executor JVMs (Spark's local-cluster test
        # master): the faithful stand-in for the two-cluster-size criterion —
        # per-executor heap/GC is CONSTANT as N grows, exactly like adding
        # executors to a real cluster, where plain local[N] shares one heap
        # across all N threads (GC contention understates cluster scaling)
        master = [
            "--master", f"local-cluster[{cores},1,6144]",
            "--driver-memory", "8g",
            # each executor JVM must believe it owns exactly its 1 core —
            # otherwise GC/JIT/Netty pools size to the MACHINE's 32 cores and
            # the small-N level borrows far more CPU than its share (real
            # clusters cgroup-limit executors; this is that limit's stand-in)
            "--conf", "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=1",
        ]
    else:
        master = [
            "--master", f"local[{cores}]",
            "--driver-memory", "24g",
            "--conf", "spark.driver.extraJavaOptions=-XX:MaxDirectMemorySize=16g",
        ]
    cmd = [
        "spark-submit", *master,
        "--py-files", str(zpath),
        str(REPO / "tools" / "scaling_job.py"), str(sf), mode,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=1800)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from spark-submit (rc={out.returncode}):\n{out.stderr[-3000:]}")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mode = sys.argv[3] if len(sys.argv) > 3 else "full"
    cluster = len(sys.argv) > 4 and sys.argv[4] == "cluster"
    zpath = build_zip()
    results = {}
    # interleaved single-shot runs (fresh JVM each) — this VM's wall-clock
    # is noisy run-to-run, so take the best of 3 per level
    for _ in range(3):
        for cores in (n, 4 * n):
            r = run_once(cores, sf, zpath, mode, cluster=cluster)
            best = results.get(cores)
            if best is None or r["rows_per_sec"] > best["rows_per_sec"]:
                results[cores] = r
    level = (lambda c: f"local-cluster[{c},1,6144]") if cluster else (lambda c: f"local[{c}]")
    for cores in (n, 4 * n):
        best = results[cores]
        print(f"{level(cores)}: {best['rows_per_sec']:,} rows/s ({best['wall_s']}s, rows={best['rows']})")

    r_n, r_4n = results[n]["rows_per_sec"], results[4 * n]["rows_per_sec"]
    eff = (r_4n / r_n) / 4
    print(f"efficiency (N={n} -> 4N={4*n}): {eff:.3f} (target >= 0.8)")

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # raw result tables land here, one section PER MODE (a run replaces its
    # own mode's section and leaves the others — the file carries the klog
    # half AND the datapipe half side by side); the curated analysis
    # (variance, VM-limit falsification, write-path study) lives in
    # BENCH/BASELINE.md — update it by hand from these numbers, don't clobber
    if mode == "novelty":
        input_desc = (
            f"synthetic document corpus sf={sf} ({results[n]['rows']:,} docs; "
            "reference = every 10th doc, shingle Bloom bitmap (m=2^24) built "
            "outside the timed window)"
        )
        sanity_desc = "sum(n_novel) / zero-novelty docs"
    elif mode == "manifest":
        input_desc = (
            f"synthetic scored corpus sf={sf} ({results[n]['rows']:,} docs, "
            "5 sources, hash-derived integer margins; curriculum manifest "
            "(4 buckets x 64 shards) + sharded stride interleave)"
        )
        sanity_desc = "sum(pos) / sum(rank_in_source)"
    elif mode.startswith("dedup"):
        input_desc = (
            f"synthetic near-dup document corpus sf={sf} "
            f"({results[n]['rows']:,} docs, exact copy planted every 10th)"
        )
        sanity_desc = "near-dup pairs / flagged docs"
    else:
        input_desc = f"seeded klog fixture sf={sf} ({results[n]['rows']:,} tokenized lines)"
        sanity_desc = "num_committed / num_aborted"
    unit = ("docs/s" if mode.startswith("dedup") or mode in ("novelty", "manifest")
            else "sequences/s")
    proto = (
        f"{4*n} single-core 6-GiB executor JVMs vs {n} (local-cluster master: "
        "separate executor processes, per-executor heap/GC constant as N "
        "grows — the faithful add-executors model)"
        if cluster else
        f"local[{n}] vs local[{4*n}] threads in one JVM"
    )
    section = f"""## mode: {mode}{' (multi-JVM local-cluster)' if cluster else ''}

Same job, same input, two parallelism levels ({proto}) via `spark-submit
--py-files dist/klog_spark.zip tools/scaling_job.py` — the sandbox stand-in
for the N -> 4N executor criterion. Timed first action -> last action (session
startup excluded). Input: {input_desc}; best of 3 interleaved fresh-JVM
runs per level.

| parallelism | wall (s) | throughput ({unit}) |
|---|---|---|
| {level(n)}  | {results[n]['wall_s']} | {r_n:,.0f} |
| {level(4*n)} | {results[4*n]['wall_s']} | {r_4n:,.0f} |

**Scaling efficiency (R_{{4N}} / R_N) / 4 = {eff:.3f}** (target >= 0.8).

Aggregate sanity at both levels ({sanity_desc}): {results[n]['num_committed']} /
{results[n]['num_aborted']}, sessions={results[n]['n_sessions']}
(identical across parallelism levels: {results[n]['num_committed'] == results[4*n]['num_committed']
 and results[n]['num_aborted'] == results[4*n]['num_aborted']}).

Measured {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())} on local[{4*n}]-max hardware
({os.cpu_count()} cores). Spark confs: AQE on, shuffle.partitions=cores,
maxPartitionBytes=8MB (local split sizing), Arrow batches.
"""
    path = bench_dir / "SCALING_RUN.md"
    header = "# BENCH/SCALING_RUN — latest scaling measurements (protocol: BASELINE.md)\n"
    sections: dict[str, str] = {}
    if path.exists():
        body = path.read_text()
        for chunk in body.split("\n## mode: ")[1:]:
            name, _, rest = chunk.partition("\n")
            sections[name.strip()] = "## mode: " + name.strip() + "\n" + rest.rstrip() + "\n"
    sections[mode + (" (multi-JVM local-cluster)" if cluster else "")] = section
    path.write_text(header + "\n" + "\n".join(sections[k] for k in sorted(sections)))
    print(f"wrote {path} (modes: {', '.join(sorted(sections))})")
    if eff < 0.8:
        sys.exit(1)


if __name__ == "__main__":
    main()
