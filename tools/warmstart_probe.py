"""Warm-start PageRank convergence measurement (VERDICT r3 #7): on a
snapshot-diff graph (~1% edge churn), how many supersteps does
``pagerank(init_ranks=prev)`` need to reach tol vs a cold start?

Deterministic protocol: R-MAT graph G0 (RMAT_SCALE, default 18); churn =
drop the ~1% of edges with pmod(xxhash64(src,dst,1),100)==0 and add the
same count of fresh R-MAT edges (seed-shifted) → G1. Measure supersteps
to tol=1e-6 for (a) cold on G0, (b) cold on G1, (c) warm on G1 from
G0's converged ranks. Prints one JSON line.

Superstep counts come from the Superstep manifest (one line per
materialized iteration), so the number is exact, not wall-sensitive —
safe to run on a busy box, unlike the throughput protocol."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.algs.pagerank import pagerank  # noqa: E402
from linkgraph.generators import rmat  # noqa: E402
from linkgraph.graph import Graph  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

SCALE = int(os.environ.get("RMAT_SCALE", "18"))
TOL = float(os.environ.get("PR_TOL", "1e-6"))


def _supersteps(work_dir: str) -> int:
    n = 0
    with open(os.path.join(work_dir, "pagerank", "manifest.jsonl")) as f:
        for line in f:
            if json.loads(line).get("metric") is not None:
                n += 1
    return n


def _run(g, tag, init_ranks=None):
    wd = tempfile.mkdtemp(prefix=f"lg_warm_{tag}_")
    pr = pagerank(
        g, tol=TOL, max_iter=200, work_dir=wd, init_ranks=init_ranks
    ).persist()
    pr.count()
    steps = _supersteps(wd)
    shutil.rmtree(wd, ignore_errors=True)
    return pr, steps


def main() -> None:
    spark = get_spark(
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
        shuffle_partitions=16,
        app_name="warmstart-probe",
    )
    spark.sparkContext.setLogLevel("ERROR")
    e0 = rmat(spark, scale=SCALE, edge_factor=16).persist()
    m0 = e0.count()
    g0 = Graph.from_edges(e0, directed=True, weighted=False)
    pr0, s_cold0 = _run(g0, "cold0")

    churn_out = e0.where(F.pmod(F.xxhash64("src", "dst", F.lit(1)), F.lit(100)) == 0)
    n_drop = churn_out.count()
    kept = e0.where(F.pmod(F.xxhash64("src", "dst", F.lit(1)), F.lit(100)) != 0)
    # order-independent pick (ADVICE r4): an unordered .limit(n) depends
    # on partitioning/scan order and breaks the deterministic-protocol
    # claim — rank candidates by a content hash and take the lowest n.
    fresh = (
        rmat(spark, scale=SCALE, edge_factor=16, seed=777)
        .join(e0.select("src", "dst"), ["src", "dst"], "left_anti")
        .orderBy(F.xxhash64("src", "dst"), "src", "dst")
        .limit(n_drop)
    )
    e1 = kept.unionByName(fresh.select(kept.columns)).persist()
    m1 = e1.count()
    g1 = Graph.from_edges(e1, directed=True, weighted=False)

    _, s_cold1 = _run(g1, "cold1")
    _, s_warm1 = _run(g1, "warm1", init_ranks=pr0)

    print(
        json.dumps(
            {
                "scale": SCALE,
                "tol": TOL,
                "edges_g0": m0,
                "edges_g1": m1,
                "churned_edges": n_drop,
                "supersteps_cold_g0": s_cold0,
                "supersteps_cold_g1": s_cold1,
                "supersteps_warm_g1": s_warm1,
                "warm_speedup": round(s_cold1 / max(s_warm1, 1), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
