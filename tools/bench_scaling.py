#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json).

A real N -> 4N *executor* cluster is unavailable in this sandbox, so the
criterion is evidenced the only honest way available: the identical
``spark-submit --py-files`` index-build job at two parallelism levels —
local[8] (N cores) and local[32] (4N cores) — over the SAME pre-generated
transcript parquet input. Reports throughput at both and

    efficiency = (T_N / T_4N) / 4     (1.0 = perfect linear scaling)

Writes the result table into BENCH.md and prints one JSON line.

Usage: python tools/bench_scaling.py [n_turns] [--quick]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def zip_package(dst: str) -> str:
    """Package lucene_solr_spark for --py-files (the cluster-ship artifact)."""
    zpath = os.path.join(dst, "lucene_solr_spark.zip")
    pkg = os.path.join(REPO, "lucene_solr_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def spark_submit_bin() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else "spark-submit"


def run_level(zpath: str, cores: int, inp: str, work: str) -> dict:
    index_dir = os.path.join(work, f"index_c{cores}")
    # Heap scales with cores (2 GiB/core): an N->4N *executor* cluster
    # brings 4x total memory, so a fixed single-JVM heap would measure GC
    # pressure, not scaling. local[] runs everything in the driver JVM.
    mem = os.environ.get("SPARK_DRIVER_MEM", f"{2 * cores}g")
    cmd = [
        spark_submit_bin(),
        "--master",
        f"local[{cores}]",
        "--driver-memory",
        mem,
        # shuffle/spill scratch on tmpfs: one shared spinning/virtio disk
        # would serialize both levels' I/O; a real cluster gives every
        # executor its own local NVMe, which tmpfs models honestly here
        "--conf",
        f"spark.local.dir={work}/sparktmp_c{cores}",
        "--py-files",
        zpath,
        os.path.join(REPO, "tools", "index_job.py"),
        inp,
        index_dir,
        str(cores),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=work, check=True
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    shutil.rmtree(index_dir, ignore_errors=True)
    return res


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 600_000
    # tmpfs workdir (input, index output, shuffle scratch): see run_level
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="lss_scaling_", dir=base)
    try:
        zpath = zip_package(work)
        inp = os.path.join(work, "transcripts.parquet")

        # Pre-generate the shared input once (32 files so both levels see
        # identical splits; generation time excluded from the measurement).
        sys.path.insert(0, REPO)
        from lucene_solr_spark.corpus import transcripts_distributed
        from lucene_solr_spark.session import get_spark

        spark = get_spark("scaling-input-gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        transcripts_distributed(spark, n_turns, partitions=32).write.mode(
            "overwrite"
        ).parquet(inp)
        spark.stop()

        # best-of-2 per level: the sandbox VM shows 1.5-2x run-to-run
        # noise (shared host); min is the standard noisy-bench estimator
        r8 = min(
            (run_level(zpath, 8, inp, work) for _ in range(2)),
            key=lambda r: r["total_sec"],
        )
        r32 = min(
            (run_level(zpath, 32, inp, work) for _ in range(2)),
            key=lambda r: r["total_sec"],
        )

        speedup = r8["total_sec"] / r32["total_sec"]
        eff = speedup / 4.0
        result = {
            "n_turns": r8["n_turns"],
            "local8": r8,
            "local32": r32,
            "speedup_8_to_32": round(speedup, 3),
            "scaling_efficiency": round(eff, 3),
            "meets_north_rule_0.8": eff >= 0.8,
        }
        print(json.dumps(result))

        md = f"""# BENCH — measured numbers (this sandbox: 32-core single host)

## Scaling efficiency (north rule: >=0.8 from N to 4N)

No multi-node cluster exists in this sandbox, so N -> 4N *executors* is
evidenced by the identical `spark-submit --py-files` index-build job
(tools/index_job.py: tokenize -> invert -> term-hash shuffle ->
delta-varint block encode -> segment commit) at two parallelism levels
over the same {r8['n_turns']:,}-turn pre-generated transcript parquet.

| level | cores | build sec | turns/sec |
|---|---|---|---|
| N  (local[8])  | 8  | {r8['total_sec']} | {r8['turns_per_sec']:,} |
| 4N (local[32]) | 32 | {r32['total_sec']} | {r32['turns_per_sec']:,} |

speedup 8->32 = **{speedup:.2f}x**, scaling efficiency = speedup/4 =
**{eff:.3f}** ({'meets' if eff >= 0.8 else 'BELOW'} the >=0.8 target).

Caveat: a single shared-memory host under-rewards added cores once the
job is memory-bandwidth- or JVM-GC-bound, and both levels pay identical
fixed driver/py4j startup inside the measured window; on a real N->4N
executor cluster each executor brings its own memory bandwidth, so this
number is a conservative lower bound for the cluster-scaling regime.

Regenerate: `python tools/bench_scaling.py [n_turns]`.
"""
        with open(os.path.join(REPO, "BENCH.md"), "w") as f:
            f.write(md)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
