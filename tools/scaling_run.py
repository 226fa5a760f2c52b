"""Scaling-efficiency experiment matrix: runs tools/pr_scale_job.py as
subprocesses over (cpus, csr, reps), reports medians → BENCH notes.

Usage: python tools/scaling_run.py [reps] [scale]
Writes results JSON lines to /tmp/lg_scaling_results.jsonl as it goes.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SCALE = sys.argv[2] if len(sys.argv) > 2 else "21"
OUT = "/tmp/lg_scaling_results.jsonl"


def run(cpus: int, csr: str) -> dict | None:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        RMAT_SCALE=SCALE,
        SPARK_DRIVER_MEM="64g",
        SPARK_SHUFFLE_PARTS="64",
        LG_CSR=csr,
    )
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "pr_scale_job.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    print(f"  run failed cpus={cpus} csr={csr}: {p.stderr[-500:]}")
    return None


def main() -> None:
    results: dict[tuple, list] = {}
    fps = set()
    with open(OUT, "w") as f:
        for rep in range(REPS):
            for cpus in (8, 32):
                for csr in ("0", "1"):
                    r = run(cpus, csr)
                    if r:
                        r["csr"] = csr
                        r["rep"] = rep
                        f.write(json.dumps(r) + "\n")
                        f.flush()
                        results.setdefault((cpus, csr), []).append(r)
                        fps.add(r["fingerprint"])
                        print(
                            f"rep{rep} cpus={cpus} csr={csr}: wall={r['wall_s']}s "
                            f"steady={r['steady_superstep_s']}s/superstep",
                            flush=True,
                        )
    print("\n=== medians ===")
    med = {}
    for key, rs in sorted(results.items()):
        wall = statistics.median(r["wall_s"] for r in rs)
        steady = statistics.median(r["steady_superstep_s"] for r in rs)
        tput = statistics.median(r["edges_per_sec_per_superstep"] for r in rs)
        med[key] = (wall, steady, tput)
        print(f"cpus={key[0]} csr={key[1]}: wall={wall}s steady={steady}s tput={tput:.0f} e/s/ss")
    for csr in ("0", "1"):
        if (8, csr) in med and (32, csr) in med:
            eff = (med[(32, csr)][2] / med[(8, csr)][2]) / 4.0
            print(f"csr={csr}: scaling efficiency 8→32 = {eff:.3f} (target ≥0.8)")
    print("fingerprints identical across all runs:", len(fps) == 1)


if __name__ == "__main__":
    main()
