"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line per the driver contract.

Headline set:
- rmat_pagerank: THE driver metric (BASELINE.json:2) — PageRank to 1e-6 on
  an R-MAT graph (scale RMAT_SCALE, hub-skewed), reported as edges/sec per
  superstep alongside wall time.
- doc-graph ops at the sf dir: degrees, connected components, triangles,
  PLP (the north-rule P0 set over the documents-derived edge table).
- pipeline ops: href extraction throughput, MinHash near-dup, cosine top-k.

Timing protocol: every query gets BENCH_WARMUP warmup runs (default 1)
then BENCH_REPS measured runs (default 3); `queries` reports the MEDIAN
and `detail.spread` the raw runs + population stdev, so round-over-round
deltas are separable from the sandbox's measured run-to-run variance
(BENCH/BASELINE.md §6 — single-JVM n=1 timings vary 20-50%).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, RMAT_SCALE (default 17 →
~2.1 M directed edges; small enough for a per-round bench, skewed enough
to exercise the heavy-hitter split), BENCH_REPS, BENCH_WARMUP.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RMAT_SCALE = int(os.environ.get("RMAT_SCALE", "17"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "1"))


def main() -> None:
    from linkgraph.algs.components import connected_components
    from linkgraph.algs.pagerank import pagerank
    from linkgraph.algs.plp import label_propagation
    from linkgraph.algs.triangles import per_vertex_triangles
    from linkgraph.extract import pages_to_edges, synth_pages
    from linkgraph.generators import rmat
    from linkgraph.graph import Graph
    from linkgraph.text.dedup import minhash_dedup_pairs
    from linkgraph.text.similarity import cosine_topk

    import __spark_entry__ as entrymod

    spark = get_spark(cores=CPUS, shuffle_partitions=CPUS * 2, app_name="linkgraph-bench")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {}
    spread: dict = {}

    def timed(name, fn):
        for _ in range(WARMUP):
            fn()
        runs, out = [], None
        for _ in range(max(REPS, 1)):
            t0 = time.time()
            out = fn()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = {
            "runs": [round(r, 3) for r in runs],
            "stdev": round(statistics.pstdev(runs), 3),
        }
        return out

    # --- R-MAT PageRank: the driver metric --------------------------------
    redges = rmat(spark, scale=RMAT_SCALE, edge_factor=16).persist()
    m = redges.count()  # materialize generation outside the timed region
    rg = Graph.from_edges(redges, directed=True, weighted=False)

    # hub_top_k=0: measured at R-MAT scale 23, the heavy-hitter split costs
    # ~26% (extra joins/broadcast churn) while AQE alone absorbs this skew
    # level; the split stays available for genuinely extreme hubs (see
    # BENCH/BASELINE.md)
    pr_runs = iter(range(1000))

    pr_dir = None

    def run_pr():
        # fresh work_dir per rep — a reused dir would RESUME from the
        # previous rep's converged checkpoint and time a no-op
        nonlocal pr_dir
        pr_dir = f"/tmp/lg_bench_pr_{os.getpid()}_{next(pr_runs)}"
        out = pagerank(rg, tol=1e-6, max_iter=60, hub_top_k=0, work_dir=pr_dir)
        out.count()
        return out

    pr = timed("rmat_pagerank", run_pr)
    n_checked = pr.count()
    # edges/sec/superstep: every superstep processes all m edge messages once
    supersteps = 0
    manifest = os.path.join(pr_dir, "pagerank", "manifest.jsonl")
    if os.path.exists(manifest):
        with open(manifest) as f:
            supersteps = sum(
                1 for line in f
                if '"metric": ' in line and '"metric": null' not in line
            )
    supersteps = supersteps or 1
    extras["rmat_edges"] = m
    extras["rmat_pagerank_supersteps"] = supersteps
    extras["edges_per_sec_per_superstep"] = round(
        m * supersteps / timings["rmat_pagerank"], 1
    )
    extras["pagerank_nodes"] = n_checked

    # --- doc-graph P0 set at SF_DIR ---------------------------------------
    g = entrymod._doc_graph(spark, SF_DIR)
    timed("doc_degrees", lambda: g.degrees().count())
    timed("doc_components", lambda: connected_components(g).count())
    timed("doc_triangles", lambda: per_vertex_triangles(g).count())
    plp_runs = iter(range(1000))
    plp_dir = None

    def run_plp():
        nonlocal plp_dir
        plp_dir = f"/tmp/lg_bench_plp_{os.getpid()}_{next(plp_runs)}"
        return label_propagation(g, max_iter=20, work_dir=plp_dir).count()

    timed("doc_plp", run_plp)
    plp_manifest = os.path.join(plp_dir, "plp", "manifest.jsonl")
    if os.path.exists(plp_manifest):
        with open(plp_manifest) as f:
            extras["doc_plp_supersteps"] = sum(
                1 for line in f if '"metric": null' not in line
            )

    # --- extraction throughput --------------------------------------------
    # 10k pages + a warmup pass: at 2k pages the ~2-3 s fixed job overhead
    # swamps the (vectorized) per-page work and the metric measures Spark
    # scheduling, not the operator (r01 reported 797 p/s where the warm
    # operator does 4-5k p/s).
    n_pages = 10_000
    pages = synth_pages(spark, n_pages=n_pages, seed=42).persist()
    pages.count()

    def run_extract():
        edges, _ = pages_to_edges(pages)
        return edges.count()

    n_ext = timed("extraction", run_extract)  # timed() warms up (Arrow init)
    extras["extraction_pages_per_sec"] = round(n_pages / timings["extraction"], 1)
    extras["extracted_edges"] = n_ext

    # --- text/dedup + similarity ------------------------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("minhash_dedup", lambda: minhash_dedup_pairs(docs, threshold=0.7).count())
    from linkgraph.text.pipeline import build_corpus

    timed(
        "corpus_build",
        lambda: build_corpus(
            docs,
            {"en": 0.8, "de": 0.5, "es": 1.0, "fr": 0.25, "zh": 0.5},
            budget=2048,
            n_buckets=64,
        ).count(),
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    emb.count()
    qs = emb.where(F.col("vec_id") < 20)
    timed("cosine_topk", lambda: cosine_topk(emb, qs, k=10).count())

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (rmat PageRank->1e-6 + P0 graph ops + pipeline ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpus": CPUS,
                "reps": REPS,
                "warmup": WARMUP,
                "detail": {**extras, "spread": spread},
            }
        )
    )


if __name__ == "__main__":
    main()
