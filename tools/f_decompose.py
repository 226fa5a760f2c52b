"""Decompose the non-scaling fixed cost f of the PageRank superstep loop
(VERDICT r4 #4): run the §8 scaling protocol at one core count with the
Spark UI REST API enabled, and attribute the measured wall time to
  - task CPU time        (the parallelizable work W)
  - JVM GC time          (single-JVM artifact: one heap serves all "executors")
  - shuffle fetch wait   (local disk/IPC, a real cluster overlaps across nodes)
  - run-minus-cpu stall  (memory-bandwidth + spill IO inside tasks)
  - scheduler idle       (core-seconds with no task running: stage barriers,
                          driver work, task-launch gaps)
Stage metrics are snapshotted after the warmup pass so only the measured
run's stages are summed. Invoke once per core count (SPARK_GRAFT_CPUS) on
an idle box; compare the components at p=8 vs p=32 to see which grow with
p (contention — a per-node-JVM cluster doesn't share them) and which are
constant (true serial fraction).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.algs.pagerank import pagerank  # noqa: E402
from linkgraph.generators import rmat  # noqa: E402
from linkgraph.graph import Graph  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
SCALE = int(os.environ.get("RMAT_SCALE", "22"))
PARTS = int(
    os.environ.get(
        "SPARK_SHUFFLE_PARTS", str(max(CPUS, (16 << SCALE) // 262144))
    )
)
UI_PORT = int(os.environ.get("LG_UI_PORT", "4047"))


def _stages(port: int) -> dict[int, dict]:
    """Completed-stage metrics keyed by (stageId, attempt)."""
    base = f"http://localhost:{port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    data = json.load(
        urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages?status=complete"
        )
    )
    return {(s["stageId"], s["attemptId"]): s for s in data}


_SUM_FIELDS = (
    # REST field -> unit divisor to seconds
    ("executorRunTime", 1e3),
    ("executorCpuTime", 1e9),
    ("jvmGcTime", 1e3),
    ("shuffleFetchWaitTime", 1e3),
    ("shuffleWriteTime", 1e9),
    ("executorDeserializeTime", 1e3),
    ("resultSerializationTime", 1e3),
)


def _sum_metrics(stages: dict[int, dict]) -> dict[str, float]:
    out: dict[str, float] = {f: 0.0 for f, _ in _SUM_FIELDS}
    out["numTasks"] = 0
    out["memoryBytesSpilled"] = 0
    out["diskBytesSpilled"] = 0
    for s in stages.values():
        for f, div in _SUM_FIELDS:
            out[f] += s.get(f, 0) / div
        out["numTasks"] += s.get("numTasks", 0)
        out["memoryBytesSpilled"] += s.get("memoryBytesSpilled", 0)
        out["diskBytesSpilled"] += s.get("diskBytesSpilled", 0)
    return out


def main() -> None:
    spark = get_spark(
        cores=CPUS,
        shuffle_partitions=PARTS,
        app_name=f"pr-fdecomp-{CPUS}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = rmat(spark, scale=SCALE, edge_factor=16).persist()
    m = edges.count()
    g = Graph.from_edges(edges, directed=True, weighted=False)
    csr = os.environ.get("LG_CSR", "1") == "1"
    pagerank(
        g,
        tol=1e-6,
        max_iter=4,
        work_dir=f"/tmp/lg_fdw_{CPUS}_{os.getpid()}",
        csr_partition=csr,
    )
    before = _stages(UI_PORT)

    wd = f"/tmp/lg_fd_{CPUS}_{os.getpid()}"
    t0 = time.time()
    pr = pagerank(
        g, tol=1e-6, max_iter=60, hub_top_k=0, work_dir=wd, csr_partition=csr
    ).persist()
    n = pr.count()
    wall = time.time() - t0

    after = _stages(UI_PORT)
    new = {k: v for k, v in after.items() if k not in before}
    met = _sum_metrics(new)

    walls = []
    with open(os.path.join(wd, "pagerank", "manifest.jsonl")) as f:
        for line in f:
            e = json.loads(line)
            if e.get("metric") is not None:
                walls.append(e["wall_s"])
    supersteps = len(walls) or 1

    run = met["executorRunTime"]
    cpu = met["executorCpuTime"]
    gc = met["jvmGcTime"]
    fetch = met["shuffleFetchWaitTime"]
    core_seconds = wall * CPUS
    sched_idle = core_seconds - run  # cores with no task assigned
    stall = run - cpu - fetch  # on-task, off-CPU: memory/spill/write waits
    print(
        json.dumps(
            {
                "cpus": CPUS,
                "scale": SCALE,
                "edges": m,
                "nodes": n,
                "supersteps": supersteps,
                "wall_s": round(wall, 3),
                "stage_count": len(new),
                "tasks": met["numTasks"],
                "core_seconds": round(core_seconds, 1),
                "task_run_s": round(run, 1),
                "task_cpu_s": round(cpu, 1),
                "jvm_gc_s": round(gc, 1),
                "shuffle_fetch_wait_s": round(fetch, 1),
                "shuffle_write_s": round(met["shuffleWriteTime"], 1),
                "deserialize_s": round(met["executorDeserializeTime"], 1),
                "sched_idle_core_s": round(sched_idle, 1),
                "on_task_stall_s": round(stall, 1),
                "mem_spill_gb": round(met["memoryBytesSpilled"] / 2**30, 2),
                "disk_spill_gb": round(met["diskBytesSpilled"] / 2**30, 2),
                "busy_frac": round(run / core_seconds, 3),
                "cpu_frac_of_busy": round(cpu / max(run, 1e-9), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
