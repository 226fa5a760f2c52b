"""TrustRank and spam mass — link-spam demotion for web corpora.

TrustRank (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004) is personalized
PageRank whose teleport vector is uniform over a small hand-curated set
of trusted seed pages: trust flows out of the seeds along links, and
pages unreachable from any seed get (1−d)-free rank only through the
damped walk — spam farms that inflate plain PageRank through link
exchange receive almost none. Spam mass (Gyöngyi et al. 2006) then
scores each page by how much of its PageRank is NOT explained by trust:

    relative spam mass(p) = (PR(p) − TR(p)) / PR(p)

Both rides the engine's PageRank superstep unchanged (the teleport
vector is a static O(n) state column — see
:func:`linkgraph.algs.pagerank.pagerank`), so all of its scale
machinery applies: CSR-partitioned static edges, hub split, sink-mass
folding, durable resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.algs.pagerank import pagerank
from linkgraph.graph import Graph


def _seed_frame(graph: Graph, seeds) -> DataFrame:
    """Seeds intersected with the graph's vertex set — a seed absent from
    the graph would silently absorb teleport mass inside pagerank's
    normalization (trust would no longer sum to 1 and spam mass would be
    inflated everywhere). An empty intersection is an error."""
    spark = graph.edges.sparkSession
    if isinstance(seeds, DataFrame):
        raw = seeds.select("id").distinct()
    else:
        raw = spark.createDataFrame(
            [(int(s),) for s in seeds], "id bigint"
        ).distinct()
    present = raw.join(graph.nodes().select("id"), "id", "leftsemi")
    if present.limit(1).count() == 0:
        raise ValueError("no trust seed is a vertex of the graph")
    return present


def trustrank(
    graph: Graph,
    seeds,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    **pr_kwargs,
) -> DataFrame:
    """(id, trust) — personalized PageRank with uniform teleport over
    ``seeds`` (a DataFrame with an ``id`` column, or an iterable of ids).
    Trust sums to 1; pages unreachable from every seed score exactly 0."""
    seed_df = _seed_frame(graph, seeds)
    tp = seed_df.select("id", F.lit(1.0).alias("p"))
    out = pagerank(
        graph, damping=damping, tol=tol, max_iter=max_iter, teleport=tp, **pr_kwargs
    )
    return out.select("id", F.col("rank").alias("trust"))


def spam_mass(
    graph: Graph,
    seeds,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    **pr_kwargs,
) -> DataFrame:
    """(id, rank, trust, spam_mass) — relative spam mass per vertex:
    the fraction of a page's PageRank not accounted for by trust flow
    from the seed set, clamped to [0, 1] (a heavily-trusted page can
    have TR > PR; negative mass carries no spam signal). Runs the two
    walks over the SAME prepared edge table shape; zero-rank vertices
    (possible only without sink distribution) get mass 0.

    A caller-supplied ``work_dir`` is split into per-walk subdirectories
    ("/pr", "/tr") — sharing one Superstep dir between the two runs made
    the trust walk resume from the plain walk's manifest (trust ≡ rank,
    spam mass ≡ 0) or clobber state the lazy result still read."""
    kw_pr = dict(pr_kwargs)
    kw_tr = dict(pr_kwargs)
    wd = pr_kwargs.get("work_dir")
    if wd is not None:
        import os

        kw_pr["work_dir"] = os.path.join(wd, "pr")
        kw_tr["work_dir"] = os.path.join(wd, "tr")
    pr = pagerank(
        graph, damping=damping, tol=tol, max_iter=max_iter, **kw_pr
    ).select("id", "rank")
    tr = trustrank(
        graph, seeds, damping=damping, tol=tol, max_iter=max_iter, **kw_tr
    )
    return (
        pr.join(tr, "id")
        .select(
            "id",
            "rank",
            "trust",
            F.when(F.col("rank") <= 0.0, F.lit(0.0))
            .otherwise(
                F.greatest(
                    F.lit(0.0),
                    F.least(
                        F.lit(1.0),
                        (F.col("rank") - F.col("trust")) / F.col("rank"),
                    ),
                )
            )
            .alias("spam_mass"),
        )
    )
