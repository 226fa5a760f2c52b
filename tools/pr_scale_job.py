"""Single PageRank scaling-measurement run (invoked as a subprocess by
tools/scaling_run.py with SPARK_GRAFT_CPUS set). Generates the R-MAT graph
(excluded from timing), runs PageRank to 1e-6, prints one JSON line with
throughput and an order-insensitive result fingerprint for the
result-identity-across-parallelism check."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.algs.pagerank import pagerank  # noqa: E402
from linkgraph.generators import rmat  # noqa: E402
from linkgraph.graph import Graph  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
SCALE = int(os.environ.get("RMAT_SCALE", "19"))
# shuffle partitions sized to the DATA (≈256k edge-rows per partition),
# floored at the core count — scaling partitions with cores on fixed data
# inflates the mapper×reducer fan-out and anti-scales (measured here:
# local[32] with 64 partitions ran 2x slower than local[8] with 16)
PARTS = int(os.environ.get("SPARK_SHUFFLE_PARTS", str(max(CPUS, (16 << SCALE) // 262144))))


def main() -> None:
    spark = get_spark(
        cores=CPUS,
        shuffle_partitions=PARTS,
        app_name=f"pr-scale-{CPUS}",
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = rmat(spark, scale=SCALE, edge_factor=16).persist()
    m = edges.count()
    g = Graph.from_edges(edges, directed=True, weighted=False)
    csr = os.environ.get("LG_CSR", "1") == "1"
    hub_k = int(os.environ.get("LG_HUB_K", "64"))
    # warmup pass: JIT/codegen/shuffle-infra spin-up dominates the first
    # supersteps of a cold JVM and would swamp a 9-superstep measurement
    pagerank(g, tol=1e-6, max_iter=4, work_dir=f"/tmp/lg_warm_{CPUS}_{os.getpid()}",
             csr_partition=csr)
    wd = f"/tmp/lg_scale_{CPUS}_{os.getpid()}"
    t0 = time.time()
    pr = pagerank(g, tol=1e-6, max_iter=60, hub_top_k=hub_k, work_dir=wd,
                  csr_partition=csr).persist()
    n = pr.count()
    wall = time.time() - t0
    walls = []
    with open(os.path.join(wd, "pagerank", "manifest.jsonl")) as f:
        for line in f:
            e = json.loads(line)
            if e.get("metric") is not None:
                walls.append(e["wall_s"])
    supersteps = len(walls)
    steady = sorted(walls)[: max(1, len(walls) - 2)]  # drop 2 slowest (warmup/ckpt)
    steady_per_superstep = sum(steady) / len(steady)
    # XOR-fold: order-insensitive, overflow-free (ANSI mode rejects sum)
    fingerprint = (
        pr.select(F.bit_xor(F.xxhash64(F.col("id"), F.round(F.col("rank"), 9).cast("string"))).alias("h"))
        .collect()[0]["h"]
    )
    print(
        json.dumps(
            {
                "cpus": CPUS,
                "scale": SCALE,
                "edges": m,
                "nodes": n,
                "supersteps": supersteps,
                "wall_s": round(wall, 3),
                "edges_per_sec_per_superstep": round(m * supersteps / wall, 1),
                "steady_superstep_s": round(steady_per_superstep, 3),
                "steady_edges_per_sec_per_superstep": round(m / steady_per_superstep, 1),
                "fingerprint": fingerprint,
            }
        )
    )


if __name__ == "__main__":
    main()
