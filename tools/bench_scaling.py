"""Two-cluster-size scaling protocol (BASELINE.md).

The sandbox has no multi-node cluster, so the north rule's N -> 4N executor
criterion is evidenced by running the SAME job on the SAME deterministic
input at two parallelism levels via spark-submit --py-files:

    run A: spark-submit --master local[8]  (N = 8 cores)
    run B: spark-submit --master local[32] (4N = 32 cores)

scaling_efficiency = (throughput_B / throughput_A) / (32 / 8); target >= 0.8.
Writes the result table to BENCH/BASELINE.md.
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


def make_pyfiles_zip(dest: str) -> str:
    zpath = os.path.join(dest, "networkit_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "networkit_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run(cores: int, convs: int, iters: int, zpath: str, workdir: str) -> dict:
    out = os.path.join(workdir, f"bench_{cores}.json")
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "tools", "bench_run.py"),
        "--cores", str(cores),
        "--convs", str(convs),
        "--iters", str(iters),
        "--out", out,
    ]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=workdir)
    with open(out) as f:
        return json.load(f)


def main() -> None:
    convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "50000"))
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "8"))
    n_small, n_big = 8, 32

    workdir = tempfile.mkdtemp(prefix="bench-scaling-")
    zpath = make_pyfiles_zip(workdir)
    a = run(n_small, convs, iters, zpath, workdir)
    b = run(n_big, convs, iters, zpath, workdir)

    tp_a = a["edges_per_sec_per_superstep"]
    tp_b = b["edges_per_sec_per_superstep"]
    eff = (tp_b / tp_a) / (n_big / n_small)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling protocol results (written by tools/bench_scaling.py)

Same deterministic synthetic transcript graph (seed=42, n_convs={convs},
n_tools=64), same code path (`spark-submit --py-files networkit_spark.zip
tools/bench_run.py`), PageRank {iters} fixed supersteps, shuffle partitions
= 2x cores. Per-superstep wall = steady-state median (first superstep
excluded as warmup).

| metric | local[{n_small}] (N) | local[{n_big}] (4N) | efficiency |
|---|---|---|---|
| directed edge visits / superstep | {a['directed_edges']:,} | {b['directed_edges']:,} | — |
| median superstep sec | {a['median_superstep_sec']} | {b['median_superstep_sec']} | — |
| edges/sec per superstep | {tp_a:,.0f} | {tp_b:,.0f} | **{eff:.3f}** |
| total wall ({iters} supersteps) | {a['total_sec']} s | {b['total_sec']} s | — |

Target: efficiency >= 0.8 (north rule). Raw JSON:

```json
{json.dumps({'local8': a, 'local32': b, 'scaling_efficiency': round(eff, 4)}, indent=2)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
