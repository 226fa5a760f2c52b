"""Driver contract for the spark-graft builder (PySpark target).

Design (SURVEY §5.2.2, FIXTURES.md §5): graph queries run over an edge
table derived DETERMINISTICALLY from the driver's ``documents`` table with
pure integer arithmetic — identical semantics in Spark SQL and DuckDB —
so ``queries()`` (engine DataFrame programs) and ``oracle_sql()`` (ANSI
SQL) see the same input. Iterative ops get exact oracles too: connected
components via a recursive min-label CTE, PageRank via a PROGRAMMATICALLY
UNROLLED fixed-iteration SQL plan (15 supersteps, rounded to 6 dp on both
sides). Non-SQL-expressible ops (PLP, k-core, MinHash/SimHash, LSH ANN)
are registered without oracles → rows-only checks, validated instead by
the pytest oracle suite (numpy/union-find/brute force).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _dec(col, scale: int = 6, prec: int = 28):
    """Round through DECIMAL, land as DOUBLE, on BOTH gate sides.

    ``F.round`` on a DoubleType returns a double that can differ from
    DuckDB's ``ROUND`` by 1 ulp (Spark rounds through BigDecimal HALF_UP,
    DuckDB through float multiply/divide) — value-identical at 9 dp but
    hash-distinct on raw bits (the round-3 ``doc_rich_club`` driver red).
    Casting BOTH sides through the same DECIMAL(prec, scale) collapses the
    ulp to one canonical scaled integer; the final ``CAST(… AS DOUBLE)``
    is the uniquely-defined nearest double of that scaled integer, so the
    emitted float64 bits are identical in the JVM and DuckDB. Landing as
    DOUBLE (not DECIMAL) matters because the driver's hasher is
    representation-sensitive: Spark ``toPandas`` renders DecimalType as
    object-dtype ``decimal.Decimal`` while DuckDB ``.df()`` renders
    DECIMAL as float64 — value-equal, hash-distinct (the round-4 12-red
    regression). oracle_sql() applies the matching
    ``CAST(CAST(col AS DECIMAL) AS DOUBLE)`` via the ``_dec_columns()``
    AST scan — one source of truth, the two sides cannot disagree.
    """
    return (
        F.round(col, scale).cast(f"decimal({prec},{scale})").cast("double")
    )


def _dec_columns() -> dict[str, dict[str, int]]:
    """Map each queries() key -> {emitted column: decimal scale}.

    Scans this module's own AST for ``_dec(<expr>[, scale]).alias("col")``
    emissions inside the nested query functions, plus the name->function
    registry dict literal returned by queries(). Used by oracle_sql() to
    wrap each oracle in the matching DECIMAL cast, and by
    tests/test_entry_invariants.py to assert no gate query emits a raw
    rounded double.
    """
    import ast

    with open(__file__) as fh:
        tree = ast.parse(fh.read())
    qdef = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    func_cols: dict[str, dict[str, int]] = {}
    for node in ast.walk(qdef):
        if not (isinstance(node, ast.FunctionDef) and node is not qdef):
            continue
        cols: dict[str, int] = {}
        for sub in ast.walk(node):
            if (
                isinstance(sub, ast.Call)
                and isinstance(sub.func, ast.Attribute)
                and sub.func.attr == "alias"
                and isinstance(sub.func.value, ast.Call)
                and isinstance(sub.func.value.func, ast.Name)
                and sub.func.value.func.id == "_dec"
            ):
                if not (
                    sub.args
                    and isinstance(sub.args[0], ast.Constant)
                    and isinstance(sub.args[0].value, str)
                ):
                    raise ValueError(
                        f"_dec alias in {node.name} must be a string "
                        "literal so the oracle cast can mirror it"
                    )
                alias = sub.args[0].value
                dcall = sub.func.value
                scale = 6
                if len(dcall.args) > 1:
                    scale = dcall.args[1].value
                for kw in dcall.keywords:
                    # keyword args must be literal so the oracle cast can
                    # mirror the exact scale (ADVICE r4: a scale= keyword
                    # was silently scanned as the default).
                    if kw.arg == "scale":
                        if not isinstance(kw.value, ast.Constant):
                            raise ValueError(
                                f"_dec scale= in {node.name} must be a "
                                "literal for the oracle cast to mirror it"
                            )
                        scale = kw.value.value
                    elif kw.arg == "prec":
                        pass
                    else:
                        raise ValueError(
                            f"unsupported _dec keyword {kw.arg!r} in "
                            f"{node.name}"
                        )
                cols[alias] = scale
        if cols:
            func_cols[node.name] = cols
    key_to_func: dict[str, str] = {}
    for stmt in qdef.body:
        if isinstance(stmt, ast.Return) and isinstance(stmt.value, ast.Dict):
            for k, v in zip(stmt.value.keys, stmt.value.values):
                if isinstance(k, ast.Constant) and isinstance(v, ast.Name):
                    key_to_func[k.value] = v.id
    return {k: func_cols[f] for k, f in key_to_func.items() if f in func_cols}

# ---------------------------------------------------------------------------
# Shared edge derivation (portable SQL: runs verbatim in Spark SQL + DuckDB)
# ---------------------------------------------------------------------------

EDGES_CTE = """
e0 AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 3 + d.n_chars) % (SELECT count(*) FROM documents) AS dst
  FROM documents d
  UNION
  SELECT d.doc_id,
         (d.doc_id * 5 + d.n_chars + 7) % (SELECT count(*) FROM documents)
  FROM documents d
  UNION
  SELECT d.doc_id,
         (d.doc_id * 7 + d.n_chars + 13) % (SELECT count(*) FROM documents)
  FROM documents d
),
edges AS (
  SELECT src, dst, CAST(1 + (src + dst) % 5 AS DOUBLE) AS weight
  FROM e0 WHERE src <> dst
),
sym AS (
  SELECT src, dst, MAX(weight) AS weight FROM (
    SELECT src, dst, weight FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst, weight FROM edges
  ) b GROUP BY src, dst
),
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
  ) u
)
"""


# Sparsified mod-24 contraction of the doc graph + a pendant chain at
# vertex 3 — a small portable graph with guaranteed cut structure
# (bridges + articulation points) at any sf; used by the biconnectivity
# and bridge gate entries and their exclusion-closure oracles.
SPARSE_CHAIN_CTE = """
c24 AS (SELECT src % 24 AS src, dst % 24 AS dst FROM sym
        WHERE src % 24 <> dst % 24 GROUP BY src % 24, dst % 24),
sp24 AS (SELECT src, dst FROM c24 WHERE (src * 7 + dst * 11) % 8 = 0
         UNION SELECT dst, src FROM c24 WHERE (src * 7 + dst * 11) % 8 = 0),
chain AS (SELECT * FROM (VALUES (3, 1000), (1000, 1001), (1001, 1002),
          (1002, 1003), (1003, 1004)) AS t(src, dst)),
spg AS (SELECT src, dst FROM sp24
        UNION SELECT src, dst FROM chain
        UNION SELECT dst, src FROM chain)
"""


def _register(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _doc_graph(spark: SparkSession, sf_dir: str, directed: bool = True):
    from linkgraph.graph import Graph

    _register(spark, sf_dir)
    edges = spark.sql(f"WITH {EDGES_CTE} SELECT src, dst, weight FROM edges")
    return Graph.from_edges(edges, directed=directed, weighted=True)


# ---------------------------------------------------------------------------
# Flagship entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the sf0.001 document link graph, top-20
    vertices with scores and degrees (scan → join/agg supersteps → top-k)."""
    from linkgraph.algs.pagerank import pagerank

    g = _doc_graph(spark, "/root/testdata/sf0.001")
    pr = pagerank(g, damping=0.85, tol=1e-8, max_iter=50, hub_top_k=8)
    deg = g.out_degrees().select("id", F.col("degree").alias("out_degree"))
    return (
        pr.join(deg, "id")
        .select("id", F.round("rank", 6).alias("rank"), "out_degree")
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# queries(): engine DataFrame programs
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from linkgraph.algs.centrality import core_decomposition
    from linkgraph.algs.components import component_sizes, connected_components
    from linkgraph.algs.linkpred import adamic_adar, common_neighbors, jaccard_index
    from linkgraph.algs.pagerank import pagerank
    from linkgraph.algs.plp import label_propagation
    from linkgraph.algs.triangles import (
        local_clustering_coefficient,
        per_vertex_triangles,
    )
    from linkgraph.text.dedup import (
        exact_duplicate_groups,
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
        simhash_near_duplicates,
    )
    from linkgraph.text.quality import language_id, quality_scores, token_count
    from linkgraph.text.similarity import cosine_topk, lsh_cosine_topk

    def doc_degrees(spark, sf):
        g = _doc_graph(spark, sf)
        return g.degrees().select(
            "id", "degree", _dec("weighted_degree", 6).alias("weighted_degree")
        )

    def doc_out_degrees(spark, sf):
        g = _doc_graph(spark, sf)
        return g.out_degrees().select("id", "degree")

    def degree_top10(spark, sf):
        g = _doc_graph(spark, sf)
        return (
            g.degrees()
            .orderBy(F.desc("degree"), F.asc("id"))
            .limit(10)
            .select("id", "degree")
        )

    def doc_components(spark, sf):
        g = _doc_graph(spark, sf)
        return connected_components(g)

    def doc_component_sizes(spark, sf):
        g = _doc_graph(spark, sf)
        return component_sizes(connected_components(g))

    def doc_components_star(spark, sf):
        # alternating large-star/small-star (Kiveris SoCC'14) — identical
        # labels to hash-to-min, O(log² n) rounds; same min-label oracle
        g = _doc_graph(spark, sf)
        return connected_components(g, method="star")

    def doc_triangles(spark, sf):
        g = _doc_graph(spark, sf)
        return per_vertex_triangles(g)

    def doc_lcc(spark, sf):
        g = _doc_graph(spark, sf)
        return local_clustering_coefficient(g).select(
            "id", _dec("lcc", 6).alias("lcc")
        )

    def doc_pagerank(spark, sf):
        g = _doc_graph(spark, sf)
        uw = g.to_unweighted()
        pr = pagerank(uw, damping=0.85, tol=0.0, max_iter=15, distribute_sinks=True)
        return pr.select("id", _dec("rank", 6).alias("rank"))

    def doc_hits(spark, sf):
        # Kleinberg HITS, exact 8 power iterations for the SQL unroll
        from linkgraph.algs.hits import hits

        g = _doc_graph(spark, sf)
        out = hits(g.to_unweighted(), max_iter=8, tol=0.0)
        return out.select(
            "id",
            _dec("hub", 6).alias("hub"),
            _dec("authority", 6).alias("authority"),
        )

    def doc_cocitation(spark, sf):
        """Co-citation pairs (u < v, shared citing page count)."""
        from linkgraph.algs.cocitation import co_citation

        return co_citation(_doc_graph(spark, sf))

    def doc_coupling(spark, sf):
        """Bibliographic-coupling pairs (u < v, shared cited page count)."""
        from linkgraph.algs.cocitation import bibliographic_coupling

        return bibliographic_coupling(_doc_graph(spark, sf))

    def doc_salsa(spark, sf):
        # SALSA (Lempel & Moran), exact 6 degree-normalized walk rounds
        from linkgraph.algs.hits import salsa

        g = _doc_graph(spark, sf)
        out = salsa(g, max_iter=6, tol=0.0)
        return out.select(
            "id",
            _dec("hub", 6).alias("hub"),
            _dec("authority", 6).alias("authority"),
        )

    def doc_opic(spark, sf):
        # OPIC crawl importance, 12 synchronous steps for the SQL unroll
        from linkgraph.algs.opic import opic

        out = opic(_doc_graph(spark, sf), iters=12)
        return out.select("id", _dec("importance", 6).alias("importance"))

    def doc_bowtie(spark, sf):
        """Broder bow-tie decomposition (core/in/out/tube/tendrils) of the
        doc graph; oracle replays the taxonomy with a DuckDB recursive
        transitive closure + pairwise mutual-reach SCC."""
        from linkgraph.algs.bowtie import bowtie_decomposition

        return bowtie_decomposition(_doc_graph(spark, sf))

    def doc_trustrank(spark, sf):
        # TrustRank: personalized PageRank from the deterministic trusted
        # seed set id % 17 == 0, fixed 15 iterations for the SQL unroll
        from linkgraph.algs.trustrank import trustrank

        g = _doc_graph(spark, sf)
        uw = g.to_unweighted()
        seeds = uw.nodes().where(F.col("id") % 17 == 0)
        tr = trustrank(uw, seeds, damping=0.85, tol=0.0, max_iter=15)
        return tr.select("id", _dec("trust", 6).alias("trust"))

    def doc_common_neighbors(spark, sf):
        g = _doc_graph(spark, sf)
        return common_neighbors(g).select("u", "v", "score")

    def doc_adamic_adar(spark, sf):
        g = _doc_graph(spark, sf)
        return adamic_adar(g).select("u", "v", _dec("score", 6).alias("score"))

    def doc_jaccard_lp(spark, sf):
        g = _doc_graph(spark, sf)
        return jaccard_index(g).select("u", "v", _dec("score", 6).alias("score"))

    def doc_adjusted_rand(spark, sf):
        """AdjustedRandIndex link-pred scores (ARI of neighborhood
        indicator partitions) over the common-neighbor candidate set.
        Oracle: closed form re-derived in SQL from the wedge agg +
        degrees + n."""
        from linkgraph.algs.linkpred import adjusted_rand_index

        g = _doc_graph(spark, sf)
        return adjusted_rand_index(g).select(
            "u", "v", _dec("score", 6).alias("score")
        )

    def doc_neighbors_measure(spark, sf):
        """NeighborsMeasureIndex (Friends measure): common neighbors +
        connected-neighbor ordered pairs (3-path count). Oracle: wedge
        agg + triple self-join in SQL."""
        from linkgraph.algs.linkpred import neighbors_measure

        g = _doc_graph(spark, sf)
        return neighbors_measure(g).select("u", "v", "score")

    def doc_assortativity(spark, sf):
        from linkgraph.algs.centrality import assortativity

        g = _doc_graph(spark, sf)
        r = assortativity(g)
        return spark.createDataFrame(
            [(float(r),)], "assortativity double"
        ).select(_dec("assortativity", 6).alias("assortativity"))

    def doc_modularity_fixed(spark, sf):
        """Modularity of the FIXED labeling label=id%7 — makes the
        modularity aggregation itself oracle-checkable (PLP/Louvain
        labelings are engine-specific, a fixed one is portable SQL)."""
        from linkgraph.algs.community import modularity

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 7).alias("label"))
        q = modularity(g, labels)
        return spark.createDataFrame(
            [(float(q),)], "modularity double"
        ).select(_dec("modularity", 6).alias("modularity"))

    def doc_map_equation_fixed(spark, sf):
        """Two-level map-equation code length of the FIXED labeling
        label=id%7 (community/LouvainMapEquation.cpp objective) — exact
        integer vol/cut sums, transcendental terms only at the end, so
        the scalar is portable SQL at 6 dp."""
        from linkgraph.algs.infomap import map_equation

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 7).alias("label"))
        val = map_equation(g, labels)
        return spark.createDataFrame(
            [(float(val),)], "map_equation double"
        ).select(_dec("map_equation", 6).alias("map_equation"))

    def events_sessions(spark, sf):
        """Gap-based sessionization (30-min inactivity): sessions per
        user — lag + conditional cumulative sum windows."""
        from pyspark.sql import Window

        _register(spark, sf)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev = (
            spark.table("events")
            .withColumn("prev_ts", F.lag("ts").over(w))
            .withColumn(
                "new_sess",
                (
                    F.col("prev_ts").isNull()
                    # NTZ won't cast to long directly; via LTZ timestamp the
                    # zone shift cancels in the difference
                    | (
                        F.col("ts").cast("timestamp").cast("long")
                        - F.col("prev_ts").cast("timestamp").cast("long")
                        > 1800
                    )
                ).cast("int"),
            )
        )
        return ev.groupBy("user_id").agg(
            F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events")
        )

    def events_retention(spark, sf):
        """Weekly retention cohorts: users grouped by first-active week,
        counted per week offset — two user_id-keyed aggs (cohort assign,
        then distinct-user count per cell), no windows. Offsets use
        floor((active−cohort)/7) on both engines (DuckDB casts ROUND, so
        the oracle uses // integer division instead of CAST)."""
        _register(spark, sf)
        ev = spark.table("events").select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
        )
        first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
        return (
            ev.join(first, "user_id")
            .groupBy(
                F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
                F.floor(F.datediff(F.col("wk"), F.col("cohort")) / 7)
                .cast("int")
                .alias("week_offset"),
            )
            .agg(F.countDistinct("user_id").alias("n_users"))
        )

    def events_funnel(spark, sf):
        """Ordered-funnel analysis (view → click → purchase): per step,
        how many users completed the prefix with STRICTLY increasing
        timestamps. Cascaded min-ts aggregations joined back per stage —
        every shuffle is on user_id (co-partitioned, partial agg), no
        windows, no per-user arrays; heavy users cost one agg row."""
        _register(spark, sf)
        ev = spark.table("events").select(
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").cast("long").alias("tsl"),
        )
        steps = ["view", "click", "purchase"]
        prev = None
        counts = []
        for s in steps:
            cur = ev.where(F.col("event_type") == s)
            if prev is not None:
                cur = cur.join(prev, "user_id").where(F.col("tsl") > F.col("t"))
            prev = cur.groupBy("user_id").agg(F.min("tsl").alias("t"))
            counts.append(
                prev.agg(
                    F.lit(s).alias("step"), F.count(F.lit(1)).alias("users")
                )
            )
        out = counts[0]
        for c in counts[1:]:
            out = out.unionByName(c)
        return out

    # --- iterative ops with UNROLLED / portable-hash SQL oracles ----------
    def doc_plp(spark, sf):
        # portable tie hash → the 30 synchronous rounds unroll to an exact
        # DuckDB oracle (gate_sql.plp_sql); vote sums are integer-valued
        # doubles, so every comparison is exact on both engines
        g = _doc_graph(spark, sf)
        return label_propagation(g, max_iter=30, tie_hash="portable")

    def doc_kcore(spark, sf):
        g = _doc_graph(spark, sf)
        return core_decomposition(g).select("id", F.col("core").cast("bigint").alias("core"))

    def doc_seeded_lp(spark, sf):
        """Seeded (semi-supervised) label propagation from the id%50
        seed set labeled id%3, first-arrival semantics, portable ties."""
        from linkgraph.algs.seededlp import seeded_label_propagation

        g = _doc_graph(spark, sf)
        seeds = g.nodes().where(F.col("id") % 50 == 0).select(
            "id", (F.col("id") % 3).alias("label")
        )
        return seeded_label_propagation(g, seeds, portable=True)

    def doc_luby_mis(spark, sf):
        from linkgraph.algs.independentset import luby_rounds_fixed

        g = _doc_graph(spark, sf)
        return luby_rounds_fixed(g, rounds=8, seed=42, portable=True).select(
            "id",
            F.col("in_mis").cast("int").alias("in_mis"),
            F.col("undecided").cast("int").alias("undecided"),
        )

    def doc_eigenvector(spark, sf):
        from linkgraph.algs.centrality import eigenvector_centrality

        g = _doc_graph(spark, sf)
        ev = eigenvector_centrality(g, tol=0.0, max_iter=12)
        return ev.select("id", _dec("score", 6).alias("score"))

    def doc_katz(spark, sf):
        from linkgraph.algs.centrality import katz_centrality

        g = _doc_graph(spark, sf)
        kz = katz_centrality(g, alpha=0.01, beta=1.0, tol=0.0, max_iter=12)
        return kz.select("id", _dec("score", 6).alias("score"))

    def doc_bfs(spark, sf):
        from linkgraph.algs.bfs import bfs

        g = _doc_graph(spark, sf, directed=False)
        return bfs(g, 0).select("id", F.col("dist").cast("bigint").alias("dist"))

    def doc_sssp(spark, sf):
        from linkgraph.algs.bfs import sssp

        g = _doc_graph(spark, sf, directed=False)
        return sssp(g, 0).select("id", _dec("dist", 6).alias("dist"))

    def algebraic_sssp(spark, sf):
        # GraphBLAS-style min-plus mat-vec iteration; same fixed point as
        # doc_sssp, so it shares that oracle verbatim
        from linkgraph.algs.algebraic import algebraic_bellman_ford

        g = _doc_graph(spark, sf, directed=False)
        return algebraic_bellman_ford(g, 0).select(
            "id", _dec("dist", 6).alias("dist")
        )

    def algebraic_pagerank_q(spark, sf):
        # semiring plus-times recurrence, fixed 15 iterations — replays
        # the same unrolled-SQL oracle as doc_pagerank
        from linkgraph.algs.algebraic import algebraic_pagerank

        g = _doc_graph(spark, sf)
        uw = g.to_unweighted()
        pr = algebraic_pagerank(uw, damping=0.85, max_iter=15, tol=0.0)
        return pr.select("id", _dec("rank", 6).alias("rank"))

    def algebraic_tri_total(spark, sf):
        # masked U·U over the degree-oriented matrix; one row: the global
        # triangle count
        from linkgraph.algs.algebraic import algebraic_triangle_count

        g = _doc_graph(spark, sf)
        t = algebraic_triangle_count(g)
        return spark.createDataFrame([(t,)], "triangles bigint")

    def doc_bfs_path(spark, sf):
        # Engine pred column (bfs return_pred) + bulk path reconstruction
        # via level-order prepend joins; the oracle rebuilds pred
        # independently as min{u : dist(u)=dist(v)-1, (u,v) in sym} and
        # replays the identical unroll (distance/BFS.cpp::getPath).
        from linkgraph.algs.bfs import bfs

        g = _doc_graph(spark, sf, directed=False)
        dp = (
            bfs(g, 0, return_pred=True)
            .select("id", F.col("dist").cast("bigint").alias("dist"), "pred")
            .persist()
        )
        lvl = dp.where(F.col("pred").isNull()).select(
            "id", F.col("id").cast("string").alias("path")
        )
        acc = [lvl]
        for _ in range(12):
            lvl = (
                dp.alias("c")
                .join(lvl.select(F.col("id").alias("pred"), "path"), "pred")
                .select(
                    F.col("c.id").alias("id"),
                    F.concat(
                        F.col("path"), F.lit("->"), F.col("c.id").cast("string")
                    ).alias("path"),
                )
                .localCheckpoint(eager=True)
            )
            if lvl.isEmpty():
                break
            acc.append(lvl)
        paths = acc[0]
        for extra in acc[1:]:
            paths = paths.unionByName(extra)
        return dp.join(paths, "id").select("id", "dist", "pred", "path")

    def doc_closeness(spark, sf):
        from linkgraph.algs.bfs import closeness

        g = _doc_graph(spark, sf, directed=False)
        return closeness(g).select("id", _dec("score", 6).alias("score"))

    def doc_harmonic(spark, sf):
        from linkgraph.algs.bfs import closeness

        g = _doc_graph(spark, sf, directed=False)
        return closeness(g, harmonic=True).select(
            "id", _dec("score", 6).alias("score")
        )

    def doc_eccentricity(spark, sf):
        from linkgraph.algs.bfs import eccentricities

        g = _doc_graph(spark, sf, directed=False)
        return eccentricities(g)

    def doc_diameter(spark, sf):
        """EXACT hop diameter via iFub (distance/Diameter.cpp exact mode).
        Oracle: max pairwise hop distance from the all-pairs CTE (the doc
        graph is connected at the gate SFs; eccentricity's hop-12 horizon
        covers it)."""
        from linkgraph.algs.bfs import diameter_exact

        g = _doc_graph(spark, sf, directed=False)
        return spark.createDataFrame(
            [(int(diameter_exact(g)),)], "diameter bigint"
        )

    def doc_scc(spark, sf):
        from linkgraph.algs.components import strongly_connected_components

        g = _doc_graph(spark, sf)
        return strongly_connected_components(g)

    def doc_betweenness(spark, sf):
        """Sampled Brandes betweenness (EstimateBetweenness contract),
        portable md5 source sample. Oracle: the pair-sum identity SQL
        restricted to the identical source set and scaled n/|S|
        (gate_sql.betweenness_sql(n_samples=...)) — independent of the
        engine's dependency back-propagation."""
        from linkgraph.algs.betweenness import betweenness

        g = _doc_graph(spark, sf, directed=False)
        return betweenness(g, n_samples=24, portable=True).select(
            "id", _dec("score", 4).alias("score")
        )

    def doc_spanning_stats(spark, sf):
        from linkgraph.algs.spanning import spanning_forest

        g = _doc_graph(spark, sf)
        forest = spanning_forest(g)
        return forest.agg(
            F.count("*").alias("n_edges"),
            _dec(F.sum("weight"), 6).alias("total_weight"),
        )

    def doc_louvain(spark, sf):
        """Two-level Louvain, portable md5 parity gate. Oracle: the whole
        pipeline — gated move rounds, coarsening, level-1 moves, prolong,
        canonical relabel — replayed as unrolled SQL
        (gate_sql.louvain_sql)."""
        from linkgraph.algs.plm import louvain

        g = _doc_graph(spark, sf)
        # kept intentionally small: each move round is several joins and
        # the driver gate runs every query serially
        return louvain(g, max_rounds=6, max_levels=2, portable=True)

    def doc_neighborhood_2hop(spark, sf):
        from linkgraph.algs.anf import per_vertex_neighborhood_size

        g = _doc_graph(spark, sf)
        # portable sketch hash → the FM bit_or pipeline replays exactly in
        # DuckDB (gate_sql.anf_sql): integer bit ops end to end
        return per_vertex_neighborhood_size(g, 2, portable=True).select(
            "id", _dec("est", 3).alias("est")
        )

    # --- documents table: text pipeline ----------------------------------
    def dup_groups(spark, sf):
        _register(spark, sf)
        return exact_duplicate_groups(spark.table("documents"))

    def token_counts(spark, sf):
        _register(spark, sf)
        return token_count(spark.table("documents"))

    def doc_unigram_pieces(spark, sf):
        """Unigram-LM Viterbi segmentation of the distinct-word table with
        an SQL-derivable vocabulary: all chars + top-60 substrings (len
        2-4) of the doc_id%10 subset's words, costs = round(-ln p, 6) so
        the DuckDB lattice-DP replay (gate_sql.unigram_sql) is exact."""
        from linkgraph.text.unigram import substring_counts, unigram_segment_words

        _register(spark, sf)
        words = spark.sql(
            """
            SELECT DISTINCT w AS word
            FROM (SELECT explode(split(lower(text), ' ')) AS w
                  FROM documents WHERE doc_id % 10 = 0)
            WHERE length(w) BETWEEN 3 AND 12
            """
        )
        cnts = substring_counts(
            words.withColumn("freq", F.lit(1)), max_piece_len=4
        ).persist()
        vocab = cnts.where(F.length("piece") == 1).unionByName(
            cnts.where(F.length("piece") >= 2)
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(60)
        )
        total = float(vocab.agg(F.sum("cnt")).collect()[0][0])
        model = vocab.select(
            "piece",
            # intermediate (feeds the Viterbi cost dict, never emitted):
            # round at 6 dp as a double, exactly the pre-decimal behavior
            _dec(-F.log(F.col("cnt") / F.lit(total)), 6)
            .cast("double")
            .alias("nll"),
        )
        nll = {r["piece"]: r["nll"] for r in model.collect()}
        cnts.unpersist()
        seg = unigram_segment_words(words, nll, max_piece_len=4)
        return seg.select(
            "word",
            F.size("pieces").cast("bigint").alias("n_pieces"),
            F.concat_ws("|", "pieces").alias("seg"),
        )

    def lang_dist(spark, sf):
        _register(spark, sf)
        return spark.table("documents").groupBy("lang").agg(F.count("*").alias("n"))

    def term_doc_freqs(spark, sf):
        """Inverted-index vocabulary statistics: (term, df, total_tf)."""
        from linkgraph.text.index import doc_freqs, postings

        _register(spark, sf)
        return doc_freqs(postings(spark.table("documents")))

    def doc_bm25(spark, sf):
        """Okapi BM25 scores for the fixed query (hash, join, spark) over
        every matching document — the web-search scoring primitive."""
        from linkgraph.text.index import bm25

        _register(spark, sf)
        out = bm25(spark.table("documents"), ["hash", "join", "spark"])
        return out.select("doc_id", _dec("score", 6).alias("score"))

    def doc_gopher_rep(spark, sf):
        """Gopher repetition rules (Rae et al. 2021): duplicate line/
        paragraph (char) fractions + top-{2,3,4}-gram char fractions +
        the combined keep decision."""
        from linkgraph.text.pipeline import gopher_repetition_flags

        _register(spark, sf)
        return gopher_repetition_flags(spark.table("documents"))

    def bloom_ngram_dups(spark, sf):
        """Dolma-style Bloom dedup screen (Soldaini et al. 2024): build a
        2^20-bit filter from even docs' word 3-grams, probe odd docs;
        per-doc duplicate-unit fraction. Oracle replays the filter words
        and every probe bit from the same md5 phash family."""
        from linkgraph.text.bloom import bloom_build, bloom_probe

        _register(spark, sf)
        docs = spark.table("documents")
        kw = dict(unit="ngram", ngram_n=3, m_bits=1 << 20, k=3, portable=True)
        flt = bloom_build(docs.where(F.col("doc_id") % 2 == 0), **kw)
        out = bloom_probe(docs.where(F.col("doc_id") % 2 == 1), flt, **kw)
        return out.select(
            "doc_id",
            "n_units",
            "n_dup_units",
            _dec("dup_frac", 6).alias("dup_frac"),
        )

    def doc_gopher_dup_ngrams(spark, sf):
        """Gopher duplicated-5..10-gram char fractions (interval-union
        marking) + the combined keep decision; oracle replays offsets,
        duplicate grams and the union with DuckDB windows."""
        from linkgraph.text.pipeline import gopher_dup_ngram_fractions

        _register(spark, sf)
        out = gopher_dup_ngram_fractions(spark.table("documents"))
        return out.select(
            "doc_id",
            _dec("dup5_char_frac", 6).alias("dup5_char_frac"),
            _dec("dup6_char_frac", 6).alias("dup6_char_frac"),
            _dec("dup7_char_frac", 6).alias("dup7_char_frac"),
            _dec("dup8_char_frac", 6).alias("dup8_char_frac"),
            _dec("dup9_char_frac", 6).alias("dup9_char_frac"),
            _dec("dup10_char_frac", 6).alias("dup10_char_frac"),
            "passes",
        )

    def doc_quality(spark, sf):
        _register(spark, sf)
        q = quality_scores(spark.table("documents"))
        return q.select(
            "doc_id",
            "n_chars",
            "n_tokens",
            _dec("avg_token_len", 6).alias("avg_token_len"),
            _dec("stopword_ratio", 6).alias("stopword_ratio"),
        )

    def ngram_dups(spark, sf):
        _register(spark, sf)
        return ngram_jaccard_pairs(spark.table("documents"), k=3, threshold=0.8).select(
            "a", "b", _dec("jaccard", 6).alias("jaccard")
        )

    def doc_lang_id(spark, sf):
        _register(spark, sf)
        return language_id(spark.table("documents")).select("doc_id", "lang_pred")

    def doc_lang_nb(spark, sf):
        # trained char-trigram NB language ID: fit on doc_id%5!=0, classify
        # the held-out fifth, return the confusion rollup (integer counts —
        # raw log-posteriors stay engine-internal floats)
        from linkgraph.text.langid import classify_language, train_langid

        _register(spark, sf)
        docs = spark.table("documents")
        model = train_langid(docs.where("doc_id % 5 != 0"), vocab_size=500, n=3)
        pred = classify_language(docs.where("doc_id % 5 = 0"), model)
        return (
            pred.join(docs.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
            .groupBy("true_lang", "lang_pred")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def minhash_dups(spark, sf):
        _register(spark, sf)
        return minhash_dedup_pairs(
            spark.table("documents"), threshold=0.7, portable=True
        )

    def minhash_dup_groups(spark, sf):
        from linkgraph.text.dedup import near_duplicate_groups

        _register(spark, sf)
        docs = spark.table("documents")
        pairs = minhash_dedup_pairs(docs, threshold=0.7, portable=True)
        return near_duplicate_groups(docs, pairs)

    def simhash_dups(spark, sf):
        _register(spark, sf)
        return simhash_near_duplicates(
            spark.table("documents"), max_hamming=3, portable=True
        ).select("a", "b", F.col("hamming").cast("bigint").alias("hamming"))

    # --- training-data pipeline ops (text/pipeline.py) --------------------
    def doc_normalize(spark, sf):
        from linkgraph.text.pipeline import normalize_text

        _register(spark, sf)
        # the synthetic corpus is already lowercase/single-spaced, so make
        # the op observable: uppercase + inject a whitespace-run suffix
        docs = spark.table("documents").select(
            "doc_id",
            F.concat(F.lit("  "), F.upper("text"), F.lit(" \t x  Y ")).alias("text"),
        )
        return normalize_text(docs)

    def doc_redact_pii(spark, sf):
        from linkgraph.text.pipeline import redact_pii

        _register(spark, sf)
        # corpus has no PII by construction — append deterministic
        # doc_id-derived PII so redaction counts are non-trivial
        docs = spark.table("documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com ip 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".17 tel 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-1234"),
            ).alias("text"),
        )
        return redact_pii(docs)

    def eval_contamination(spark, sf):
        from linkgraph.text.pipeline import ngram_contamination

        _register(spark, sf)
        docs = spark.table("documents")
        train = docs.where(F.col("doc_id") % 10 != 7)
        ev = docs.where(F.col("doc_id") % 10 == 7)
        return ngram_contamination(train, ev, k=3).select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            _dec("contamination", 6).alias("contamination"),
        )

    def doc_pack_sequences(spark, sf):
        from linkgraph.text.pipeline import pack_sequences

        _register(spark, sf)
        return pack_sequences(
            spark.table("documents"), budget=50, n_buckets=8, portable=True
        )

    def corpus_build(spark, sf):
        from linkgraph.text.pipeline import build_corpus

        _register(spark, sf)
        return build_corpus(
            spark.table("documents"),
            {"en": 0.8, "de": 0.5, "es": 1.0, "fr": 0.25, "zh": 0.5},
            budget=50,
            n_buckets=8,
            portable=True,
        )

    def corpus_card_rollup(spark, sf):
        from linkgraph.text.pipeline import corpus_card

        _register(spark, sf)
        return corpus_card(spark.table("documents")).select(
            "lang", "source", "n_docs", "n_tokens",
            _dec("avg_chars", 6).alias("avg_chars"),
        )

    def source_graph(spark, sf):
        from linkgraph.algs.community import coarsen

        g = _doc_graph(spark, sf)
        labels = spark.table("documents").select(
            F.col("doc_id").alias("id"), F.col("source").alias("label")
        )
        return coarsen(g, labels).edges.select(
            F.col("src").alias("src_source"),
            F.col("dst").alias("dst_source"),
            _dec("weight", 6).alias("weight"),
        )

    def doc_gopher_flags(spark, sf):
        from linkgraph.text.pipeline import gopher_quality_flags

        _register(spark, sf)
        return gopher_quality_flags(spark.table("documents")).select(
            "doc_id",
            "n_words",
            _dec("mean_word_len", 6).alias("mean_word_len"),
            _dec("symbol_ratio", 6).alias("symbol_ratio"),
            _dec("alpha_word_frac", 6).alias("alpha_word_frac"),
            "n_stop_distinct",
            F.col("passes").cast("bigint").alias("passes"),
        )

    def doc_repetition(spark, sf):
        from linkgraph.text.pipeline import repetition_ratios

        _register(spark, sf)
        return repetition_ratios(spark.table("documents")).select(
            "doc_id",
            _dec("dup_line_frac", 6).alias("dup_line_frac"),
            _dec("dup_2gram_frac", 6).alias("dup_2gram_frac"),
            _dec("dup_3gram_frac", 6).alias("dup_3gram_frac"),
        )

    def doc_dup_spans(spark, sf):
        from linkgraph.text.dedup import duplicate_spans

        _register(spark, sf)
        return duplicate_spans(
            spark.table("documents"), k=8, min_docs=2, portable=True
        ).select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            _dec("dup_frac", 6).alias("dup_frac"),
        )

    def doc_despan(spark, sf):
        from linkgraph.text.dedup import remove_duplicate_spans

        _register(spark, sf)
        return remove_duplicate_spans(
            spark.table("documents"), k=8, min_docs=2, portable=True
        )

    def doc_dedup_lines(spark, sf):
        # corpus-level line dedup (C4 span removal at line granularity):
        # the single-line test docs are first re-lined into deterministic
        # 5-token lines so the op genuinely exercises multi-line removal
        from linkgraph.text.dedup import dedup_lines

        _register(spark, sf)
        docs = spark.table("documents")
        toks = F.split(F.col("text"), " ")
        lined = F.array_join(
            F.transform(
                F.sequence(
                    F.lit(1), F.ceil(F.size(toks) / F.lit(5.0)).cast("int")
                ),
                lambda i: F.array_join(
                    F.slice(toks, (i - F.lit(1)) * F.lit(5) + F.lit(1), 5), " "
                ),
            ),
            "\n",
        )
        return dedup_lines(
            docs.select("doc_id", lined.alias("text")), min_docs=2, portable=True
        )

    def doc_quality_classifier(spark, sf):
        # fastText/CCNet-shape linear quality classifier: hashed-token
        # logistic regression trained 2 GD iterations on lang='en' labels
        # (portable md5 feature hashing so DuckDB replays training)
        from linkgraph.text.classifier import quality_classifier

        _register(spark, sf)
        docs = spark.table("documents")
        labels = docs.select(
            "doc_id",
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        )
        out = quality_classifier(
            docs, labels, n_features=4096, iters=2, lr=10.0, portable=True
        )
        return out.select("doc_id", _dec("prob", 6).alias("prob"))

    def doc_dsir_weights(spark, sf):
        # DSIR importance log-weights of every doc toward the lang='en'
        # slice's hashed-unigram distribution (Xie et al. 2023)
        from linkgraph.text.dsir import dsir_logweights

        _register(spark, sf)
        docs = spark.table("documents")
        w = dsir_logweights(
            docs, docs.where(F.col("lang") == "en"), n_buckets=4096, portable=True
        )
        return w.select("doc_id", _dec("logw", 6).alias("logw"))

    def doc_dsir_sample(spark, sf):
        # Gumbel-top-20 resample under the same weights (portable noise)
        from linkgraph.text.dsir import dsir_logweights, dsir_sample

        _register(spark, sf)
        docs = spark.table("documents")
        w = dsir_logweights(
            docs, docs.where(F.col("lang") == "en"), n_buckets=4096, portable=True
        )
        return dsir_sample(w, 20, seed=7, portable=True).select(
            "doc_id", _dec("logw", 6).alias("logw")
        )

    def bpe_pair_counts(spark, sf):
        from linkgraph.text.bpe import bpe_pair_counts as bpc, word_freqs

        _register(spark, sf)
        return bpc(word_freqs(spark.table("documents")))

    def doc_unigram_logloss(spark, sf):
        from linkgraph.text.quality import unigram_logloss

        _register(spark, sf)
        return unigram_logloss(spark.table("documents")).select(
            "doc_id", "n_tokens", _dec("logloss", 6).alias("logloss")
        )

    def doc_perplexity_buckets(spark, sf):
        """CCNet head/middle/tail split on the corpus-LM logloss with
        pinned thresholds (3.40/3.41 straddle the sf0.01 distribution);
        bucketing runs on the 6dp-rounded score in BOTH engines so a
        sub-ulp float disagreement can never flip a bucket."""
        from linkgraph.text.quality import perplexity_buckets

        _register(spark, sf)
        return perplexity_buckets(
            spark.table("documents"), (3.40, 3.41), round_logloss=6
        ).select(
            "doc_id", "n_tokens",
            _dec("logloss", 6).alias("logloss"),
            "bucket",
        )

    def doc_stratified_sample(spark, sf):
        from linkgraph.text.pipeline import stratified_sample

        _register(spark, sf)
        return stratified_sample(
            spark.table("documents"),
            "lang",
            {"en": 0.5, "de": 1.0, "zh": 0.25},
            seed=42,
            portable=True,
        ).select("doc_id", "lang")

    def dup_groups_best(spark, sf):
        """Quality-aware dedup: exact groups re-elect their kept copy as
        the max-score member (arbitrary deterministic per-doc score so
        identical-text members actually differ). The synthetic corpus has
        no byte-identical pairs, so every doc_id%25==0 doc gets a planted
        clone at doc_id+1_000_000 (same convention as the embedding
        gate's _embed_with_clones)."""
        from linkgraph.portable import phash
        from linkgraph.text.dedup import keep_representative

        _register(spark, sf)
        base = spark.table("documents")
        d = base.select("doc_id", "text").unionByName(
            base.where(F.col("doc_id") % 25 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            )
        )
        groups = exact_duplicate_groups(d)
        prefer = d.select(
            "doc_id",
            F.pmod(phash(F.col("doc_id"), F.lit(7)), F.lit(1000))
            .cast("double")
            .alias("score"),
        )
        return keep_representative(groups, prefer)

    def doc_wordpiece_pieces(spark, sf):
        """WordPiece greedy longest-match over the same SQL-derivable
        substring vocabulary as doc_unigram_pieces, every piece usable
        initially and as a ##-continuation; DuckDB replays the pointer
        walk exactly (gate_sql.wordpiece_sql)."""
        from linkgraph.text.unigram import substring_counts
        from linkgraph.text.wordpiece import wordpiece_segment_words

        _register(spark, sf)
        words = spark.sql(
            """
            SELECT DISTINCT w AS word
            FROM (SELECT explode(split(lower(text), ' ')) AS w
                  FROM documents WHERE doc_id % 10 = 0)
            WHERE length(w) BETWEEN 3 AND 12
            """
        )
        cnts = substring_counts(
            words.withColumn("freq", F.lit(1)), max_piece_len=4
        ).persist()
        vocab_rows = (
            cnts.where(F.length("piece") == 1)
            .select("piece")
            .unionByName(
                cnts.where(F.length("piece") >= 2)
                .orderBy(F.desc("cnt"), F.asc("piece"))
                .limit(60)
                .select("piece")
            )
            .collect()
        )
        cnts.unpersist()
        pieces = {r["piece"] for r in vocab_rows}
        vset = pieces | {"##" + p for p in pieces}
        seg = wordpiece_segment_words(words, vset, max_piece_len=4)
        return seg.select(
            "word",
            F.size("pieces").cast("bigint").alias("n_pieces"),
            F.concat_ws("|", "pieces").alias("seg"),
        )

    def doc_neighbor_sample(spark, sf):
        """GraphSAGE-style layered neighbor sample (fanouts 3,2) from the
        id%50 seed set, portable-hash ranked so DuckDB replays the exact
        per-vertex top-k at each hop."""
        from linkgraph.algs.sampling import layered_neighbor_sample

        g = _doc_graph(spark, sf)
        seeds = g.nodes().where(F.col("id") % 50 == 0)
        return layered_neighbor_sample(
            g, seeds, fanouts=(3, 2), seed=42, portable=True
        )

    def doc_surt_keys(spark, sf):
        """SURT index keys over URLs synthesized from the documents table
        (scheme/www/port/path shapes exercised); replayed with DuckDB
        string/list functions."""
        from linkgraph.warc import surt_key

        _register(spark, sf)
        url = F.concat(
            F.lit("http://www."),
            F.col("source"),
            F.lit(".Example.com:80/Doc/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
        )
        return spark.table("documents").select(
            "doc_id", surt_key(url).alias("surt")
        )

    def doc_adjacency(spark, sf):
        """Chunked adjacency export (max_chunk=8 so hub rows split):
        sorted neighbor strings replayed with ordered string_agg."""
        from linkgraph.tables import adjacency_table

        g = _doc_graph(spark, sf)
        return adjacency_table(g, max_chunk=8)

    def doc_nfc(spark, sf):
        """NFC normalization replayed by DuckDB's nfc_normalize; the
        fixture text is mostly ASCII, so a decomposed suffix is appended
        on both sides to make the composition observable."""
        from linkgraph.text.pipeline import normalize_unicode

        _register(spark, sf)
        d = spark.table("documents").select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" cafe\u0301")).alias("text"),
        )
        return normalize_unicode(d, "NFC").select("doc_id", "text_norm")

    def doc_sentences(spark, sf):
        """Regex sentence segmentation; the oracle reproduces the
        lookbehind split via sentinel replacement (RE2 has no
        lookbehind)."""
        from linkgraph.text.pipeline import split_sentences

        _register(spark, sf)
        return split_sentences(spark.table("documents"))

    def doc_scripts(spark, sf):
        """Unicode script profile per document (expression-only
        regexp_count scan; dominant = struct-max, pinned tie rule)."""
        from linkgraph.text.quality import script_profile

        _register(spark, sf)
        return script_profile(spark.table("documents")).select(
            "doc_id", "dominant",
            _dec("arabic_frac", 6).alias("arabic_frac"),
            _dec("cjk_frac", 6).alias("cjk_frac"),
            _dec("cyrillic_frac", 6).alias("cyrillic_frac"),
            _dec("devanagari_frac", 6).alias("devanagari_frac"),
            _dec("greek_frac", 6).alias("greek_frac"),
            _dec("hangul_frac", 6).alias("hangul_frac"),
            _dec("hebrew_frac", 6).alias("hebrew_frac"),
            _dec("kana_frac", 6).alias("kana_frac"),
            _dec("latin_frac", 6).alias("latin_frac"),
        )

    def doc_mojibake(spark, sf):
        from linkgraph.text.quality import mojibake_stats

        _register(spark, sf)
        return mojibake_stats(spark.table("documents")).select(
            "doc_id", "n_replacement",
            _dec("control_frac", 6).alias("control_frac"),
            "clean",
        )

    def doc_quantiles(spark, sf):
        """Exact n_chars quantiles (type-1/lower definition) via the
        range-partition linearization — no global sort, no
        SinglePartition exchange."""
        from linkgraph.stats import exact_quantiles

        _register(spark, sf)
        return exact_quantiles(
            spark.table("documents"), "n_chars", [0.0, 0.25, 0.5, 0.75, 1.0]
        )

    def doc_lang_quantiles(spark, sf):
        from linkgraph.stats import grouped_exact_quantiles

        _register(spark, sf)
        return grouped_exact_quantiles(
            spark.table("documents"), "n_chars", [0.25, 0.5, 0.75], "lang"
        )

    def doc_shard_plan(spark, sf):
        """Community-aware shard placement over the fixed id%24 labeling:
        top-8 communities dealt sorted-round-robin across 4 shards, tail
        hashed — the physical-design step replayed exactly."""
        from linkgraph.tables import community_shard_plan

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 24).alias("label"))
        return community_shard_plan(
            labels, n_shards=4, max_explicit=8, seed=42, portable=True
        )

    def doc_fm_distinct(spark, sf):
        """Per-language FM distinct-doc estimates; the sketch itself is
        bit-exact under the portable hash, so the oracle replays registers
        AND estimator."""
        from linkgraph.sketches import fm_distinct, fm_sketch

        _register(spark, sf)
        sk = fm_sketch(
            spark.table("documents"), "doc_id", ["lang"], registers=8,
            portable=True,
        )
        return fm_distinct(sk).select("lang", _dec("est", 6).alias("est"))

    def doc_cms_counts(spark, sf):
        """Count-min point queries for every language over a 4x64 portable
        sketch — min over depth rows of the hashed cell, replayed exactly."""
        from linkgraph.sketches import cms_query, count_min_sketch

        _register(spark, sf)
        d = spark.table("documents")
        sk = count_min_sketch(d, "lang", depth=4, width=64, portable=True)
        return cms_query(sk, d.select("lang"), "lang", width=64, portable=True)

    def doc_source_quota(spark, sf):
        from linkgraph.text.pipeline import source_quota_sample

        _register(spark, sf)
        return source_quota_sample(
            spark.table("documents"), 20, group_col="source", seed=42,
            portable=True,
        ).select("doc_id", "source")

    def doc_snapshot_diff(spark, sf):
        from linkgraph.crawl import snapshot_diff

        _register(spark, sf)
        d = spark.table("documents")
        old = d.where(F.col("doc_id") % 3 != 0).select(
            F.col("doc_id").alias("url"), "text"
        )
        new = d.where(F.col("doc_id") % 2 == 0).select(
            F.col("doc_id").alias("url"),
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return snapshot_diff(old, new, key_col="url")

    # --- partition quality metrics over the fixed labeling id % 7 --------
    def doc_hub_dominance(spark, sf):
        from linkgraph.algs.community import hub_dominance

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 7).alias("label"))
        return hub_dominance(g, labels).select(
            "label", _dec("hub_dominance", 6).alias("hub_dominance")
        )

    def doc_conductance(spark, sf):
        from linkgraph.algs.community import isolated_interpartition_conductance

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 7).alias("label"))
        return isolated_interpartition_conductance(g, labels).select(
            "label", _dec("conductance", 6).alias("conductance")
        )

    def doc_stable_nodes(spark, sf):
        from linkgraph.algs.community import stable_partition_nodes

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 7).alias("label"))
        return stable_partition_nodes(g, labels)

    def doc_fragmentation(spark, sf):
        from linkgraph.algs.community import partition_fragmentation

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 7).alias("label"))
        return partition_fragmentation(g, labels).select(
            "label", _dec("fragmentation", 6).alias("fragmentation")
        )

    # --- link-prediction additions + edge scores ---------------------------
    def doc_total_neighbors(spark, sf):
        from linkgraph.algs.linkpred import total_neighbors

        g = _doc_graph(spark, sf)
        return total_neighbors(g).select("u", "v", "score")

    def doc_neighborhood_distance(spark, sf):
        from linkgraph.algs.linkpred import neighborhood_distance

        g = _doc_graph(spark, sf)
        return neighborhood_distance(g).select(
            "u", "v", _dec("score", 6).alias("score")
        )

    def doc_katz_index(spark, sf):
        from linkgraph.algs.linkpred import katz_index

        g = _doc_graph(spark, sf)
        return katz_index(g, beta=0.005, max_length=3).select(
            "u", "v", _dec("score", 9).alias("score")
        )

    def doc_prefix_jaccard(spark, sf):
        from linkgraph.algs.edgescores import prefix_jaccard_score

        g = _doc_graph(spark, sf)
        return prefix_jaccard_score(g, k=5).select(
            "src", "dst", _dec("score", 6).alias("score")
        )

    def doc_simmelian(spark, sf):
        from linkgraph.algs.edgescores import simmelian_overlap_score

        g = _doc_graph(spark, sf)
        return simmelian_overlap_score(g, max_rank=10)

    # --- rows-only entries (hash-seeded internals; pytest-validated) ------
    def doc_leiden(spark, sf):
        """Leiden (move → singleton refinement → coarsen-by-refined →
        seeded final move), portable md5 parity gates. Oracle: the whole
        pipeline replayed as unrolled SQL (gate_sql.leiden_sql)."""
        from linkgraph.algs.leiden import leiden

        # light budget: the driver gate runs every query serially, and each
        # refine round costs several actions; quality is pytest's job
        g = _doc_graph(spark, sf)
        return leiden(g, max_rounds=4, max_levels=1, refine_rounds=4, portable=True)

    def doc_suitor_matching(spark, sf):
        """Suitor ½-approx max-weight matching (deterministic message
        passing, no hash draws). Oracle: the same proposal/mutual-lock
        rounds unrolled to SQL (gate_sql.suitor_sql)."""
        from linkgraph.algs.matching import suitor_matching

        g = _doc_graph(spark, sf)
        return suitor_matching(g)

    def doc_pathgrow_matching(spark, sf):
        """Drake-Hougardy path-growing ½-approx matching (deterministic
        locally-dominant rounds, no hash draws). Oracle: the same
        propose/select/advance rounds unrolled to SQL
        (gate_sql.pathgrow_sql)."""
        from linkgraph.algs.matching import path_growing_matching

        g = _doc_graph(spark, sf, directed=False)
        return path_growing_matching(g)

    def doc_gedwalk(spark, sf):
        """GedWalk greedy group (k=3, fixed alpha, portable 6-dp gain
        rounding before the argmax). Oracle: the full greedy replay —
        residual walk-count chains, exact-term-order gains, rounded
        argmax, truncated group score (gate_sql.gedwalk_sql)."""
        from linkgraph.algs.gedwalk import ged_walk

        g = _doc_graph(spark, sf, directed=False)
        out = ged_walk(g, k=3, alpha=0.1, max_len=4, round_to=6)
        return out.select(
            "ord", "id",
            _dec("gain", 6).alias("gain"),
            _dec("ged_score", 6).alias("ged_score"),
        )

    def doc_maxent_layout(spark, sf):
        """MaxentStress coordinates after 5 fixed iterations (portable md5
        init + per-iteration anchor draws; squares as IEEE products so
        both engines run the identical float chain). Oracle: the full
        local iteration unrolled (gate_sql.maxent_sql)."""
        from linkgraph.algs.maxent import maxent_stress

        g = _doc_graph(spark, sf, directed=False)
        pos = maxent_stress(g, dims=2, iters=5, alpha=0.02, n_anchors=8, seed=7)
        return pos.select(
            "id", _dec("x0", 6).alias("x0"), _dec("x1", 6).alias("x1")
        )

    def doc_pll_dist(spark, sf):
        """Pruned landmark labeling (full hub set, multi-batch so the
        prune path is exercised) queried on a fixed pair grid. Oracle:
        plain multi-source BFS — full-PLL answers are exact distances, so
        the oracle is independent of the pruning machinery."""
        from linkgraph.algs.labeling import pll_query, pruned_landmark_labeling

        g = _doc_graph(spark, sf, directed=False)
        fwd, bwd = pruned_landmark_labeling(g, batch_size=100)
        nodes = g.nodes()
        pairs = (
            nodes.where(F.col("id") < 10)
            .select(F.col("id").alias("u"))
            .crossJoin(nodes.where(F.col("id") % 50 == 0).select(F.col("id").alias("v")))
            .where(F.col("u") != F.col("v"))
        )
        return pll_query(fwd, bwd, pairs).select(
            "u", "v", F.col("dist").cast("bigint").alias("dist")
        )

    def doc_ego_cover(spark, sf):
        """EgoSplitting overlapping cover, portable persona hash + PLP
        tie-break. Oracle: ego components via reachability closure,
        persona graph + PLP replayed in SQL (gate_sql.ego_cover_sql)."""
        from linkgraph.algs.egosplit import ego_splitting

        g = _doc_graph(spark, sf, directed=False)
        return ego_splitting(g, max_ego_degree=100, plp_max_iter=10, portable=True)

    def embed_lsh_banded_top5(spark, sf):
        from linkgraph.text.similarity import lsh_cosine_topk_banded

        _register(spark, sf)
        emb = spark.table("embeddings")
        qs = emb.where(F.col("vec_id") < 10)
        return lsh_cosine_topk_banded(
            emb, qs, k=5, n_planes=16, bands=8, portable=True
        ).select(
            "query_id", "neighbor_id", _dec("cos", 4).alias("cos")
        )

    # --- extraction: engine pipeline vs independent DuckDB regexp oracle --
    def extraction_edges(spark, sf):
        """pages → hrefs (pandas UDF) → normalize → dense dictionary →
        (src, dst, weight), over the COMMITTED deterministic pages fixture
        (tests/fixtures/gate_pages, synth_pages seed=42) so query and
        oracle read identical bytes. The oracle re-implements extraction
        independently in DuckDB regexp SQL — full end-to-end parity."""
        from linkgraph.extract import pages_to_edges

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        edges, _ = pages_to_edges(pages, dense_ids=True)
        return edges.select("src", "dst", "weight")

    def page_content(spark, sf):
        """Main-content extraction (jusText-lite boilerplate removal):
        block segmentation at block-level tags + min-words / link-density
        rules, expression-only. Oracle replays the identical block
        stats with DuckDB list lambdas over the committed fixture."""
        from linkgraph.text.boilerplate import boilerplate_strip

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        out = boilerplate_strip(pages)
        return out.select(
            "url", "content", "n_blocks", "n_kept", "total_words",
            "kept_words", _dec("boilerplate_frac", 6).alias("boilerplate_frac"),
        )

    def anchor_text(spark, sf):
        """Anchor-text table over the committed pages fixture: per link
        target, each distinct anchor string with reference counts —
        oracle re-extracts independently via DuckDB regexp SQL."""
        from linkgraph.extract import anchor_text_table

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        return anchor_text_table(pages)

    def doc_host_edges(spark, sf):
        """Host-graph contraction over the committed pages fixture:
        (src_host, dst_host, weight), intra-host links dropped, dangling
        targets kept. Oracle re-derives hosts in DuckDB regexp SQL on the
        same independent extraction replay."""
        from linkgraph.webgraph import host_edges

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        return host_edges(pages)

    def doc_host_stats(spark, sf):
        """Per-host crawl stats (n_pages, out_links, intra_links,
        n_dst_hosts) — the site-level quality/spam signal block."""
        from linkgraph.webgraph import host_stats

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        return host_stats(pages)

    def doc_host_rank(spark, sf):
        """Host-level PageRank (site authority / crawl priority), exact
        15 fixed iterations for the string-keyed unrolled-SQL oracle."""
        from linkgraph.webgraph import host_rank

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        out = host_rank(pages, damping=0.85, tol=0.0, max_iter=15)
        return out.select("host", _dec("rank", 6).alias("rank"))

    def url_canonical(spark, sf):
        """URL canonicalization + canonical-dedup marking (RFC 3986 §6
        case/port/path normalization, fragment + tracking-param stripping,
        query sort) over the committed gate_pages URLs plus a literal
        adversarial set; oracle replays the full rule chain in DuckDB."""
        import gate_sql as G
        from linkgraph.crawl import canonical_duplicates

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        urls = pages.select("url").unionAll(
            spark.createDataFrame([(u,) for u in G.CRAWL_CANON_URLS], ["url"])
        )
        return canonical_duplicates(urls)

    def robots_admission(spark, sf):
        """RFC 9309 robots.txt parse + longest-match admission for the
        'linkbot' agent over the gate_pages URL population plus literal
        wildcard/$-anchor probes; the literal robots corpus covers group
        selection, allow-wins-ties, anchors, and LIKE-metachar escaping.
        Oracle replays parse + precedence in DuckDB windows/LIKE."""
        import gate_sql as G
        from linkgraph.crawl import parse_robots, robots_allowed

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        urls = pages.select("url").unionAll(
            spark.createDataFrame(
                [(u,) for u in G.CRAWL_ROBOTS_EXTRA_URLS], ["url"]
            )
        )
        robots = spark.createDataFrame(G.CRAWL_ROBOTS, ["host", "robots_txt"])
        return robots_allowed(urls, parse_robots(robots), G.CRAWL_UA)

    def warc_pages(spark, sf):
        """WARC (ISO 28500) fast-path reader over the committed fixture
        (gate_pages re-encoded as spec-shaped response records): the
        multi-char-lineSep splittable scan + expression parse; oracle
        replays via DuckDB read_text + the same regexp contract. Hashes
        the decoded HTML body (md5) for value identity."""
        from linkgraph.warc import read_warc

        w = read_warc(spark, "/root/repo/tests/fixtures/gate_warc/pages.warc")
        return w.select(
            "url",
            "warc_type",
            "warc_date",
            "http_status",
            F.length("html").alias("html_len"),
            F.md5(F.encode("html", "utf-8")).alias("html_md5"),
        )

    def sitemap_locs(spark, sf):
        """sitemaps.org 0.9 extraction (urlset/index kinds, lastmod
        pairing, entity decode, whitespace trim) over the literal corpus;
        oracle replays with DuckDB regexp_extract_all."""
        import gate_sql as G
        from linkgraph.crawl import sitemap_entries

        sm = spark.createDataFrame(G.CRAWL_SITEMAPS, ["url", "xml"])
        return sitemap_entries(sm)

    def pipeline_edges(spark, sf):
        """END-TO-END STREAM gate: the gate_pages fixture is split into
        two parquet files and driven through stream_pages_pipeline (a
        REAL availableNow Structured Streaming query: extraction →
        dictionary → pending-link retro-resolution → pruned block merge →
        incremental CC), then the final edge table is mapped back to
        urls. Oracle: the independent DuckDB regexp extraction replay
        keyed by url — the stream must converge to the batch result."""
        import os as _os
        import tempfile as _tf

        from pyspark.sql import functions as _F

        from linkgraph.streaming.pipeline import stream_pages_pipeline

        pages = spark.read.parquet("/root/repo/tests/fixtures/gate_pages")
        base = _tf.mkdtemp(prefix="lg_gate_pipe_")
        pdir = _os.path.join(base, "pages")
        _os.makedirs(pdir)
        half = _F.pmod(_F.xxhash64("url"), _F.lit(2))
        pages.where(half == 0).coalesce(1).write.parquet(pdir + "/f1")
        pages.where(half == 1).coalesce(1).write.parquet(pdir + "/f2")
        q = stream_pages_pipeline(
            spark, pdir + "/*", _os.path.join(base, "state"),
            n_blocks=8, pagerank_every=0,
        )
        q.awaitTermination(600)
        edges = spark.read.parquet(_os.path.join(base, "state", "edges"))
        d = spark.read.parquet(_os.path.join(base, "state", "dictionary"))
        return (
            edges.join(
                d.withColumnRenamed("url", "src_url").withColumnRenamed("id", "src"),
                "src",
            )
            .join(
                d.withColumnRenamed("url", "dst_url").withColumnRenamed("id", "dst"),
                "dst",
            )
            .select("src_url", "dst_url", "weight")
        )

    # --- events table: window/agg relational surface ---------------------
    def events_top_value_per_user(spark, sf):
        from pyspark.sql import Window

        _register(spark, sf)
        w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
        return (
            spark.table("events")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id", "value")
        )

    def events_hourly(spark, sf):
        _register(spark, sf)
        return (
            spark.table("events")
            .groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"))
            .agg(F.count("*").alias("n"))
        )

    def events_type_stats(spark, sf):
        _register(spark, sf)
        return (
            spark.table("events")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                _dec(F.sum("value"), 3).alias("sum_value"),
                _dec(F.avg("value"), 6).alias("avg_value"),
            )
        )

    def events_rollup(spark, sf):
        """ROLLUP (event_type, day) — the grouping-sets surface (SURVEY
        §2B) exercised for real: per-(type, day), per-type subtotals, and
        the grand total in one pass."""
        _register(spark, sf)
        return (
            spark.table("events")
            .rollup("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").alias("n"), _dec(F.sum("value"), 3).alias("sum_value"))
        )

    def node2vec_walks(spark, sf):
        """Deterministic Node2Vec walk corpus (p=q=1, portable md5 race).
        Oracle: the identical walks replayed step by step in unrolled SQL
        (gate_sql.node2vec_walks_sql) — with unit bias the exponential
        race is an integer hash race, so parity is exact."""
        from linkgraph.algs.embedding import node2vec_walks as walks

        g = _doc_graph(spark, sf)
        return walks(
            g, walk_length=5, walks_per_node=1, p=1.0, q=1.0, seed=7,
            portable=True,
        )

    def events_stream_replay(spark, sf):
        """Deterministic graph-event replay THROUGH Structured Streaming:
        events → typed edge deltas (op/src/dst/weight/ts, pure arithmetic)
        → one availableNow micro-batch → partition-pruned merge into a
        blocked parquet edge table → final table. The oracle replays the
        same last-writer-wins merge in SQL, so the streaming surface is
        hash-checked, not just smoke-tested."""
        import tempfile

        from linkgraph.streaming.deltas import (
            read_blocked_edges,
            stream_apply_deltas_pruned,
        )

        _register(spark, sf)
        base = tempfile.mkdtemp(prefix="lg_gate_stream_")
        ddir, table, ckpt = f"{base}/deltas", f"{base}/table", f"{base}/ckpt"
        deltas = spark.table("events").select(
            F.when(F.col("event_type") == "error", "remove_edge")
            .when(F.col("event_type") == "purchase", "update_weight")
            .otherwise("add_edge")
            .alias("op"),
            F.col("user_id").alias("src"),
            F.pmod(F.col("event_id") * 7 + 3, F.lit(200)).alias("dst"),
            F.col("value").alias("weight"),
            F.col("ts"),
        )
        deltas.coalesce(1).write.mode("overwrite").json(ddir)
        q = stream_apply_deltas_pruned(spark, ddir, table, ckpt, n_blocks=16)
        q.awaitTermination(300)
        return read_blocked_edges(spark, table).select(
            "src", "dst", _dec("weight", 6).alias("weight")
        )

    # --- embeddings: similarity search ------------------------------------
    def embed_cosine_top5(spark, sf):
        _register(spark, sf)
        emb = spark.table("embeddings")
        qs = emb.where(F.col("vec_id") < 10)
        return cosine_topk(emb, qs, k=5).select(
            "query_id", "neighbor_id", _dec("cos", 4).alias("cos")
        )

    def embed_lsh_top5(spark, sf):
        _register(spark, sf)
        emb = spark.table("embeddings")
        qs = emb.where(F.col("vec_id") < 10)
        return lsh_cosine_topk(emb, qs, k=5, n_planes=8, portable=True).select(
            "query_id", "neighbor_id", _dec("cos", 4).alias("cos")
        )

    def _embed_with_clones(spark, sf, n_clones=40, id_offset=100_000, delta=0.15):
        """embeddings ∪ planted near-dup clones (first coordinate shifted
        by delta, id offset) — the raw table has no natural pairs above
        cosine ~0.51, so the dedup gates plant deterministic ground truth
        both engines construct identically (gate_sql._embed_union_cte);
        delta=0.15 on unit vectors ⇒ every clone at cosine ≥ 0.988."""
        _register(spark, sf)
        emb = spark.table("embeddings")
        base = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        clones = emb.where(F.col("vec_id") < n_clones).select(
            (F.col("vec_id") + id_offset).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x.cast("double") + delta).otherwise(
                    x.cast("double")
                ),
            ).alias("embedding"),
        )
        return base.unionByName(clones)

    def embed_near_dups(spark, sf):
        """Embedding-cosine near-dup pairs: banded hyperplane LSH
        candidates, exact cosine verify ≥ 0.9. Oracle: full replay
        (portable planes → signatures → band join → verify)."""
        from linkgraph.text.similarity import embedding_near_duplicate_pairs

        docs = _embed_with_clones(spark, sf)
        return embedding_near_duplicate_pairs(
            docs, threshold=0.9, n_planes=16, bands=8, portable=True
        ).select("a", "b", _dec("cos", 4).alias("cos"))

    def embed_near_dup_groups(spark, sf):
        """Near-dup pairs closed into dedup groups (group_id = min
        reachable id, keep = canonical representative) — the
        embedding-space twin of minhash_dup_groups."""
        from linkgraph.text.similarity import (
            embedding_near_duplicate_groups,
            embedding_near_duplicate_pairs,
        )

        docs = _embed_with_clones(spark, sf)
        pairs = embedding_near_duplicate_pairs(
            docs, threshold=0.9, n_planes=16, bands=8, portable=True
        )
        return embedding_near_duplicate_groups(docs, pairs).select(
            "vec_id", "group_id", "keep"
        )

    def embed_ivf_top5(spark, sf):
        """IVF ANN top-5: hash-seeded coarse quantizer (n_list=8), one
        Lloyd refinement round, probe the 3 best cells per query, exact
        scoring. Oracle: full SQL replay incl. the Lloyd mean recentre."""
        from linkgraph.text.similarity import ivf_cosine_topk

        _register(spark, sf)
        emb = spark.table("embeddings")
        qs = emb.where(F.col("vec_id") < 10)
        return ivf_cosine_topk(
            emb, qs, k=5, n_list=8, n_probe=3, refine_rounds=1, portable=True
        ).select("query_id", "neighbor_id", _dec("cos", 4).alias("cos"))

    def embed_pq_top5(spark, sf):
        """Product-quantization ANN top-5 (m=4 subspaces, 8 codes, one
        Lloyd round): ADC shortlist over the compressed codes + exact
        cosine rerank. Oracle: full SQL replay — seed slicing, Lloyd,
        encoding, LUT, rounded-ADC ranking, rerank."""
        from linkgraph.text.pq import pq_topk

        _register(spark, sf)
        emb = spark.table("embeddings")
        qs = emb.where(F.col("vec_id") < 10)
        return pq_topk(
            emb, qs, k=5, m=4, n_codes=8, refine_rounds=1,
            shortlist_factor=4, portable=True,
        ).select("query_id", "neighbor_id", _dec("cos", 4).alias("cos"))

    def embed_semantic_dedup(spark, sf):
        """SemDeDup (Abbas et al. 2023) over the planted-clone corpus:
        k-means cells via the IVF quantizer, exact within-cell cosine
        ≥ 0.95 duplicate pairs, closure into groups, keep = the member
        with the LOWEST centroid cosine. Oracle: full SQL replay incl.
        the Lloyd recentre and the recursive label-min closure."""
        from linkgraph.text.similarity import semantic_dedup

        docs = _embed_with_clones(spark, sf)
        return semantic_dedup(
            docs, eps=0.05, n_list=8, refine_rounds=1, portable=True,
            max_cell_size=None,
        ).select(
            "vec_id",
            "cell",
            _dec("centroid_cos", 4).alias("centroid_cos"),
            "group_id",
            "keep",
        )

    def url_filter_entry(spark, sf):
        """URL admission filter over the committed pages fixture plus
        literal edge-case urls (one per rule). Oracle: expression-for-
        expression replay (same pinned rule order + regex literals)."""
        from linkgraph.text.pipeline import url_filter

        pages = spark.read.parquet(
            "/root/repo/tests/fixtures/gate_pages"
        ).select("url")
        extra = spark.createDataFrame(
            [
                ("ftp://files.example.org/x",),
                ("https://" + "a" * 2050 + ".org/x",),
                ("https:///nopath",),
                ("https://192.168.0.1/admin",),
                ("https://SPAM.example.net/page",),
                ("https://ok.example.org/logo.PNG",),
                (
                    "https://ok.example.org/q?"
                    + "&".join(f"p{i}=1" for i in range(10)),
                ),
            ],
            "url string",
        )
        return url_filter(
            pages.unionAll(extra), blocked_hosts=["spam.example.net"]
        ).select("url", "host", "reason", "keep")

    def doc_group_split(spark, sf):
        """Duplicate-aware train/eval split: split decided by the dedup
        GROUP hash, so exact-duplicate docs never straddle the split.
        Oracle: text-grouping + portable-hash threshold replay."""
        from linkgraph.text.dedup import exact_duplicate_groups
        from linkgraph.text.pipeline import split_by_group

        _register(spark, sf)
        docs = spark.table("documents")
        groups = exact_duplicate_groups(docs)
        return split_by_group(docs, groups, eval_frac=0.1, portable=True).select(
            "doc_id", "group_id", "split"
        )

    def doc_weighted_sample(spark, sf):
        """Deterministic quality-weighted sampling: keep probability =
        min(n_chars/1000, 1). Oracle: the same hash-threshold predicate."""
        from linkgraph.text.pipeline import weighted_sample

        _register(spark, sf)
        docs = spark.table("documents").withColumn(
            "p", F.col("n_chars") / F.lit(1000.0)
        )
        return weighted_sample(docs, "p", portable=True).select("doc_id")

    def doc_c4_flags(spark, sf):
        """C4 cleaning rules over documents augmented with deterministic
        crafted lines (the synthetic corpus has no newlines/punctuation,
        so rule-firing lines are appended identically on both engines).
        Oracle: expression-for-expression replay."""
        from linkgraph.text.pipeline import c4_filters

        _register(spark, sf)
        t = F.col("text")
        for mod, extra in (
            (5, "\nGood one here. Good two here. Good three here."),
            (7, "\nlorem ipsum dolor sit."),
            (11, "\nvar x = { y }."),
            (13, "\nPlease enable javascript now."),
        ):
            t = F.concat(
                t,
                F.when(F.col("doc_id") % mod == 0, F.lit(extra)).otherwise(
                    F.lit("")
                ),
            )
        docs = spark.table("documents").withColumn("text", t)
        return c4_filters(docs).select(
            "doc_id", "c4_text", "n_lines_kept", "n_sentences",
            "has_lorem", "has_brace", "c4_passes",
        )

    def vocab_top(spark, sf):
        """Frequency vocabulary (top 100, min_count 2) over the pinned
        whitespace tokenization. Oracle: plain SQL count + rank."""
        from linkgraph.text.pipeline import build_vocab

        _register(spark, sf)
        return build_vocab(spark.table("documents"), max_size=100, min_count=2)

    # --- round-2b/2c operators ------------------------------------------
    def doc_sfigality(spark, sf):
        from linkgraph.algs.centrality import sfigality

        g = _doc_graph(spark, sf)
        return sfigality(g).select("id", _dec("score", 6).alias("score"))

    def doc_local_similarity(spark, sf):
        from linkgraph.algs.sparsification import local_similarity_score

        g = _doc_graph(spark, sf)
        return local_similarity_score(g).select(
            "src", "dst", _dec("score", 6).alias("score")
        )

    def doc_scan_similarity(spark, sf):
        from linkgraph.algs.sparsification import scan_structural_similarity

        g = _doc_graph(spark, sf)
        return scan_structural_similarity(g).select(
            "src", "dst", _dec("score", 6).alias("score")
        )

    def doc_multiscale(spark, sf):
        from linkgraph.algs.sparsification import multiscale_score

        g = _doc_graph(spark, sf)
        return multiscale_score(g).select(
            "src", "dst", _dec("score", 6).alias("score")
        )

    def doc_local_coverage(spark, sf):
        from linkgraph.algs.community import local_partition_coverage

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 7).alias("label"))
        return local_partition_coverage(g, labels).select(
            "id", _dec("coverage", 6).alias("coverage")
        )

    def doc_permanence(spark, sf):
        from linkgraph.algs.community import permanence

        g = _doc_graph(spark, sf)
        labels = g.nodes().select("id", (F.col("id") % 7).alias("label"))
        return permanence(g, labels).select(
            "id", _dec("permanence", 6).alias("permanence")
        )

    def doc_attr_assort(spark, sf):
        from linkgraph.algs.centrality import attribute_assortativity

        g = _doc_graph(spark, sf)
        attrs = spark.table("documents").select(
            F.col("doc_id").alias("id"), F.col("n_chars").alias("value")
        )
        r = attribute_assortativity(g, attrs)
        return spark.createDataFrame(
            [(float(r),)], "assortativity double"
        ).select(_dec("assortativity", 6).alias("assortativity"))

    def partition_measures(spark, sf):
        from linkgraph.algs.community import (
            graph_structural_rand,
            jaccard_measure,
            node_structural_rand,
        )

        g = _doc_graph(spark, sf)
        a = g.nodes().select("id", (F.col("id") % 3).alias("label"))
        b = g.nodes().select("id", (F.col("id") % 5).alias("label"))
        return spark.createDataFrame(
            [(
                jaccard_measure(a, b),
                node_structural_rand(a, b),
                graph_structural_rand(g, a, b),
            )],
            "jaccard double, node_rand double, graph_rand double",
        ).select(
            _dec("jaccard", 6).alias("jaccard"),
            _dec("node_rand", 6).alias("node_rand"),
            _dec("graph_rand", 6).alias("graph_rand"),
        )

    def doc_top_closeness(spark, sf):
        from linkgraph.algs.bfs import closeness

        g = _doc_graph(spark, sf, directed=False)
        return (
            closeness(g)
            .select("id", _dec("score", 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(10)
        )

    def doc_ppr(spark, sf):
        """Personalized PageRank from seed 0 (the PPR machinery inside
        PageRankNibble), fixed 25 iterations. Oracle: the same sparse
        power iteration unrolled (gate_sql.ppr_sql)."""
        from linkgraph.algs.scd import personalized_pagerank

        g = _doc_graph(spark, sf, directed=False)
        pr = personalized_pagerank(g, [0], alpha=0.15, tol=0.0, max_iter=25)
        return pr.select("id", _dec("rank", 6).alias("rank")).orderBy("id")

    def doc_nibble(spark, sf):
        """PageRankNibble community around seed 0, portable mode: PPR at
        fixed 25 iterations (tol=0) with ranks rounded to 6 dp before the
        sweep key — downstream vol/cut/conductance arithmetic is exact on
        this integer-weight graph, so DuckDB replays the whole sweep and
        the argmin prefix (gate_sql.nibble_sql)."""
        from linkgraph.algs.scd import pagerank_nibble

        g = _doc_graph(spark, sf, directed=False)
        return pagerank_nibble(
            g, [0], tol=0.0, max_iter=25, round_rank=6
        ).orderBy("id")

    def doc_seir_census(spark, sf):
        """SEIR per-tick compartment census with portable md5 contact
        coins. Oracle: the identical epidemic replayed tick by tick as
        unrolled SQL (gate_sql.seir_sql), including the early stop."""
        from linkgraph.algs.simulation import seir

        g = _doc_graph(spark, sf, directed=False)
        _, census = seir(
            g, zero=[0], p_transmit=0.05, ticks=8, seed=42, portable=True
        )
        return spark.createDataFrame(
            census, "tick int, s bigint, e bigint, i bigint, r bigint"
        )

    def gen_ba_structure(spark, sf):
        """Distributed Barabási–Albert degree histogram (n=500, k=3),
        portable md5 slot references. Oracle: DuckDB re-derives every
        attachment edge by resolving the identical pointer chains with a
        recursive CTE (gate_sql.ba_structure_sql) — a full end-to-end
        check of the Sanders-Schulz slot resolution."""
        from linkgraph.generators import barabasi_albert
        from linkgraph.graph import Graph as _G

        g = _G.from_edges(barabasi_albert(spark, 500, k=3, seed=42, portable=True))
        return (
            g.degrees()
            .groupBy("degree")
            .agg(F.count("*").alias("n"))
            .orderBy("degree")
        )

    def doc_curveball_degrees(spark, sf):
        """Degrees AFTER 5 global curveball trade rounds. Oracle: the
        original graph's degrees — the exact degree-preservation contract
        (gate_sql.degree_invariant_sql), same discipline as
        doc_switch_degrees."""
        from linkgraph.algs.sparsification import global_curveball

        g = _doc_graph(spark, sf, directed=False)
        shuffled = global_curveball(g, rounds=5, seed=42)
        return shuffled.degrees().select("id", "degree")

    def gen_clustered_structure(spark, sf):
        """ClusteredRandomGraph (n=300, k=4, p_in=0.15, p_out=0.01) FULL
        edge-set + planted-label parity: the DuckDB oracle regenerates
        the identical graph from the portable md5 hash (same cluster
        assignment, same per-pair coin) and emits every (src, dst,
        label_src, label_dst) row."""
        from linkgraph.generators import clustered_random_graph

        edges, labels = clustered_random_graph(
            spark, 300, 4, 0.15, 0.01, seed=5, portable=True
        )
        ls = labels.withColumnRenamed("id", "src").withColumnRenamed(
            "label", "label_src"
        )
        ld = labels.withColumnRenamed("id", "dst").withColumnRenamed(
            "label", "label_dst"
        )
        return edges.join(ls, "src").join(ld, "dst").select(
            "src", "dst", "label_src", "label_dst"
        )

    def gen_mocnik_structure(spark, sf):
        """Mocnik spatial graph (n=250, dim=2, k=1.5) out-degree
        histogram, portable md5 coordinates. Oracle: DuckDB regenerates
        the identical point set and re-derives every edge by brute-force
        pairwise distance — a full end-to-end check of the grid-cell
        candidate join."""
        from linkgraph.generators import mocnik

        e = mocnik(spark, 250, dim=2, k=1.5, seed=7, portable=True)
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("degree")
        )
        return (
            deg.groupBy("degree").agg(F.count("*").alias("n")).orderBy("degree")
        )

    def doc_betweenness_exact(spark, sf):
        """EXACT Brandes (all sources) — oracle-checked against the
        independent pair-sum-identity SQL (no Brandes back-prop in the
        oracle)."""
        from linkgraph.algs.betweenness import betweenness

        g = _doc_graph(spark, sf, directed=False)
        return betweenness(g).select(
            "id", _dec("score", 4).alias("score")
        )

    def doc_laplacian(spark, sf):
        from linkgraph.algs.centrality import laplacian_centrality

        g = _doc_graph(spark, sf)
        return laplacian_centrality(g).select(
            "id", _dec("score", 6).alias("score")
        )

    def doc_bridges(spark, sf):
        """Bridge edges via distributed XOR-covering (whp-exact,
        deterministic output) over the sparse chain-augmented contracted
        graph (the full doc graph has no bridges — 0 rows proves
        nothing). Oracle: per-edge exclusion closure — (a, b) is a bridge
        iff b is unreachable from a in G minus that edge (recursive CTE,
        independent of the XOR certificate)."""
        from linkgraph.algs.bridges import bridges
        from linkgraph.graph import Graph as _G

        _register(spark, sf)
        sub = spark.sql(
            f"""WITH {EDGES_CTE}, {SPARSE_CHAIN_CTE}
            SELECT src, dst, CAST(1 AS DOUBLE) AS weight FROM spg"""
        )
        g = _G.from_edges(sub, directed=False, weighted=True)
        return bridges(g).orderBy("src", "dst")

    def doc_topo_levels(spark, sf):
        """Kahn layer decomposition of the low->high oriented doc DAG
        (GraphTools::topologicalSort, distributed form). Oracle: recursive
        longest-path CTE (gate_sql.topo_levels_sql)."""
        from linkgraph.algs.dag import topological_levels
        from linkgraph.graph import Graph

        g = _doc_graph(spark, sf)
        dag = Graph.from_edges(
            g.edges.where(F.col("src") < F.col("dst")), directed=True, weighted=True
        )
        return topological_levels(dag)

    def doc_reachable_counts(spark, sf):
        """Exact per-vertex reachable-set sizes on the sparsified mod-60
        DAG contraction of the doc graph (reachability/ReachableNodes.cpp
        exact mode; undirected graphs reduce to component sizes, so the
        gate exercises the directed closure). Oracle: recursive
        transitive-closure CTE (gate_sql.reachable_counts_sql)."""
        from linkgraph.algs.reachability import reachable_nodes
        from linkgraph.graph import Graph

        _register(spark, sf)
        c = spark.sql(
            f"WITH {EDGES_CTE} "
            "SELECT src % 60 AS src, dst % 60 AS dst FROM edges "
            "WHERE src % 60 < dst % 60 "
            "AND ((src % 60) * 7 + (dst % 60) * 11) % 3 = 0 "
            "GROUP BY 1, 2"
        )
        g = Graph.from_edges(c, directed=True)
        return reachable_nodes(g)

    def doc_simple_paths(spark, sf):
        """All simple 1→17 paths (cutoff 5 edges) on the sparsified mod-24
        contraction — cycles kept, so the simple-path revisit filter is
        exercised (reachability/AllSimplePaths.cpp; the (7s+11d)%8 filter
        confines reachability to the d≡3s-mod-8 class orbit, and 17 is in
        vertex 1's orbit at every sf). Oracle: recursive list-growth CTE
        (gate_sql.simple_paths_sql)."""
        from linkgraph.algs.reachability import all_simple_paths
        from linkgraph.graph import Graph

        _register(spark, sf)
        c = spark.sql(
            f"WITH {EDGES_CTE} "
            "SELECT src % 24 AS src, dst % 24 AS dst FROM edges "
            "WHERE src % 24 <> dst % 24 "
            "AND ((src % 24) * 7 + (dst % 24) * 11) % 8 = 0 "
            "GROUP BY 1, 2"
        )
        g = Graph.from_edges(c, directed=True)
        return all_simple_paths(g, 1, 17, cutoff=5).select(
            F.concat_ws("->", F.col("path").cast("array<string>")).alias("path"),
            "hops",
        )

    def doc_scd_truth(spark, sf):
        """SCDGroundTruthComparison (scd/SCDGroundTruthComparison.cpp):
        detected = 2-hop out-balls of seeds {1,2,5} on the sparsified
        mod-24 contraction; truth cover = id%6 labels. Oracle: full
        metric re-derivation in SQL (gate_sql.scd_truth_sql)."""
        from linkgraph.algs.bfs import multi_source_bfs
        from linkgraph.algs.scd import ground_truth_comparison
        from linkgraph.graph import Graph

        _register(spark, sf)
        c = spark.sql(
            f"WITH {EDGES_CTE} "
            "SELECT src % 24 AS src, dst % 24 AS dst FROM edges "
            "WHERE src % 24 <> dst % 24 "
            "AND ((src % 24) * 7 + (dst % 24) * 11) % 8 = 0 "
            "GROUP BY 1, 2"
        )
        g = Graph.from_edges(c, directed=True)
        det = multi_source_bfs(g, [1, 2, 5], max_iter=2).select(
            F.col("source").alias("seed"), "id"
        )
        cov = g.nodes().select("id", (F.col("id") % 6).alias("label"))
        return ground_truth_comparison(det, cov).select(
            "seed", "tp", "det_size", "truth_size",
            _dec("precision", 6).alias("precision"),
            _dec("recall", 6).alias("recall"),
            _dec("f1", 6).alias("f1"),
            _dec("jaccard", 6).alias("jaccard"),
        )

    def doc_clique_hist(spark, sf):
        """Maximal-clique size histogram (MaximalCliques, distributed
        ego-net Bron-Kerbosch). Oracle: recursive clique-growth CTE
        (gate_sql.clique_hist_sql)."""
        from linkgraph.algs.cliques import clique_size_histogram

        g = _doc_graph(spark, sf, directed=False)
        return clique_size_histogram(g)

    def doc_group_degree(spark, sf):
        """Greedy group-degree (k=3). Oracle: the same greedy unrolled to
        chained SQL rounds (gate_sql.group_degree_sql)."""
        from linkgraph.algs.bfs import group_degree

        g = _doc_graph(spark, sf, directed=False)
        return group_degree(g, k=3)

    def doc_switch_degrees(spark, sf):
        """Degrees AFTER 5 rounds of parallel edge switching. Oracle: the
        original graph's degrees — the operator's degree-preservation
        contract, checked exactly (gate_sql.degree_invariant_sql)."""
        from linkgraph.algs.sparsification import edge_switching

        g = _doc_graph(spark, sf, directed=False)
        switched = edge_switching(g, rounds=5, seed=42)
        return (
            switched.degrees().select("id", "degree")
        )

    def gen_hyperbolic_structure(spark, sf):
        """Random hyperbolic graph degree histogram (threshold model,
        n=400, avg_k=6, gamma=2.5). portable=True draws coordinates from
        the md5 portable hash with exp/ln-spelled trig, so the oracle
        regenerates the IDENTICAL point set in DuckDB and re-derives
        every edge by brute-force pairwise hyperbolic distance — a full
        end-to-end check of the generator's bucketed candidate join."""
        from linkgraph.generators import hyperbolic
        from linkgraph.graph import Graph as _G

        g = _G.from_edges(
            hyperbolic(spark, 400, avg_degree=6.0, gamma=2.5, seed=2, portable=True)
        )
        return (
            g.degrees()
            .groupBy("degree")
            .agg(F.count("*").alias("n"))
            .orderBy("degree")
        )

    def doc_group_closeness(spark, sf):
        """Greedy group-closeness (k=3). Oracle: the same greedy unrolled
        over the all-pairs hop-distance CTE (gate_sql.group_closeness_sql)."""
        from linkgraph.algs.bfs import group_closeness

        g = _doc_graph(spark, sf, directed=False)
        return group_closeness(g, k=3)

    def doc_group_harmonic(spark, sf):
        """Greedy group-harmonic-closeness (k=3). Oracle: the same greedy
        unrolled over the all-pairs CTE (gate_sql.group_harmonic_sql)."""
        from linkgraph.algs.bfs import group_harmonic_closeness

        g = _doc_graph(spark, sf, directed=False)
        return group_harmonic_closeness(g, k=3)

    def doc_square_clustering(spark, sf):
        """Lind–González–Herrmann square (4-cycle) clustering per vertex;
        oracle replays the identical 2-path/CN/adjacency join plan."""
        from linkgraph.algs.triangles import local_square_clustering

        g = _doc_graph(spark, sf, directed=False)
        return local_square_clustering(g).select(
            "id", _dec("c4", 6).alias("c4")
        )

    def doc_ktruss(spark, sf):
        """3-truss of the doc graph (every edge in ≥1 triangle within the
        subgraph, peeled to fixpoint); oracle unrolls the peel rounds —
        the fixpoint is round-count-independent once reached, and the
        unroll depth exceeds the observed peel depth at gate SFs."""
        from linkgraph.algs.truss import k_truss

        g = _doc_graph(spark, sf, directed=False)
        return k_truss(g, 3)

    def doc_simrank(spark, sf):
        """SimRank (Jeh & Widom, KDD'02): 3 fixed kernel-join iterations
        on the directed doc graph; the oracle unrolls the identical
        diagonal∪sym(s_k) joins in DuckDB, rounded to 6 dp."""
        from linkgraph.algs.simrank import simrank

        g = _doc_graph(spark, sf)
        sr = simrank(g, c=0.8, max_iter=3)
        return sr.select("u", "v", _dec("sim", 6).alias("sim"))

    def doc_rich_club(spark, sf):
        """Rich-club spectrum φ(k) on the symmetrized doc graph; the
        suffix counts come from reverse-cumulative sums over the degree
        histogram (window over the degree domain, not data rows)."""
        from linkgraph.algs.richclub import rich_club

        g = _doc_graph(spark, sf)
        rc = rich_club(g)
        return rc.select("k", "n_nodes", "n_edges", _dec("phi", 6).alias("phi"))

    def doc_knn(spark, sf):
        """Average-neighbor-degree profile knn(k) on the symmetrized doc
        graph (Pastor-Satorras degree-correlation spectrum)."""
        from linkgraph.algs.richclub import avg_neighbor_degree

        g = _doc_graph(spark, sf)
        return avg_neighbor_degree(g).select("k", _dec("knn", 6).alias("knn"))

    def doc_cover_f1(spark, sf):
        """CoverF1Similarity over two FIXED labelings of the doc set
        (id%7 vs id%5 — deterministic cross-engine covers); per-cluster
        best F1 against the reference cover."""
        from linkgraph.algs.community import cover_f1

        _register(spark, sf)
        d = spark.table("documents").select(F.col("doc_id").alias("id"))
        a = d.select("id", (F.col("id") % 7).alias("label"))
        b = d.select("id", (F.col("id") % 5).alias("label"))
        return cover_f1(a, b).select(
            "label", _dec("best_f1", 6).alias("best_f1")
        )

    def doc_nf_heuristic(spark, sf):
        """NeighborhoodFunctionHeuristic at FULL sample (= the exact
        neighborhood function — deterministic, no hash sample to
        replay); oracle recomputes the per-hop pair histogram over the
        all-pairs CTE."""
        from linkgraph.algs.anf import neighborhood_function_heuristic

        g = _doc_graph(spark, sf, directed=False)
        est = neighborhood_function_heuristic(g, n_samples=1 << 30, max_h=12)
        return spark.createDataFrame(
            [(int(h), float(v)) for h, v in est], "h int, nf double"
        )

    def _contracted_graph(spark, sf, k, directed=True):
        """Mod-k contraction of the doc link graph — a dense small
        weighted graph with identical semantics in Spark SQL and DuckDB
        (pure integer arithmetic, summed parallel-edge weights)."""
        from linkgraph.graph import Graph as _G

        _register(spark, sf)
        sub = spark.sql(
            f"""WITH {EDGES_CTE}
            SELECT src % {k} AS src, dst % {k} AS dst, SUM(weight) AS weight
            FROM sym WHERE src % {k} <> dst % {k}
            GROUP BY src % {k}, dst % {k}"""
        )
        return _G.from_edges(sub, directed=directed, weighted=True)

    def doc_min_cut(spark, sf):
        """Max s-t flow value (push-relabel, flow/EdmondsKarp.cpp parity)
        on the mod-12 contracted doc graph. Oracle: verified-contract —
        on this dense contracted instance the min 1-2 cut IS the smaller
        weighted-degree cut (Menger equality checked numerically at the
        gate's SFs), so the flow value must equal
        least(wdeg(1), wdeg(2))."""
        from linkgraph.algs.flow import max_flow

        g = _contracted_graph(spark, sf, 12, directed=True)
        val, _ = max_flow(g, 1, 2)
        return spark.createDataFrame(
            [(1, 2, float(val))], "source bigint, sink bigint, mincut double"
        )

    def doc_cut_singletons(spark, sf):
        """Flake-Tarjan cut clustering with alpha > max weighted degree
        on the mod-6 contracted doc graph. Oracle: theorem contract — for
        alpha above every weighted degree the singleton cut {v}
        (wdeg(v) + alpha) beats any larger source side (cost grows by
        alpha per extra vertex), so every community is a singleton:
        label(v) = v. The n max-flows still run for real."""
        from linkgraph.algs.flow import cut_clustering

        g = _contracted_graph(spark, sf, 6, directed=False)
        max_wd = (
            g.symmetric_edges()
            .groupBy("src")
            .agg(F.sum("weight").alias("wd"))
            .agg(F.max("wd"))
            .collect()[0][0]
        )
        return cut_clustering(g, alpha=2.0 * float(max_wd))

    def doc_articulation(spark, sf):
        """Articulation points (components/BiconnectedComponents.cpp) via
        distributed Tarjan-Vishkin — BFS forest, subtree preorder/low/high
        folds, auxiliary-graph CC; cut vertices = vertices in >1 block.
        Input: sparsified mod-24 contracted doc graph + a pendant chain at
        vertex 3 (guarantees non-trivial cuts at any sf). Oracle: per-
        vertex exclusion closure (recursive CTE: v is a cut iff two of its
        neighbors are disconnected in G - v) — independent of the TV
        construction."""
        from linkgraph.algs.biconnected import articulation_points
        from linkgraph.graph import Graph as _G

        _register(spark, sf)
        sub = spark.sql(
            f"""WITH {EDGES_CTE}, {SPARSE_CHAIN_CTE}
            SELECT src, dst, CAST(1 AS DOUBLE) AS weight FROM spg"""
        )
        g = _G.from_edges(sub, directed=False, weighted=True)
        return articulation_points(g).orderBy("id")

    def doc_effective_resistance(spark, sf):
        """Effective resistance r_eff(1, 2) on the mod-15 contracted doc
        graph via one distributed-CG Laplacian solve
        (centrality/SpanningEdgeCentrality.cpp solver parity). Oracle:
        the identical linear system solved by unrolled grounded-Jacobi
        SQL (gate_sql.effective_resistance_sql) — both converge to the
        same fixed point, so the 6dp-rounded value matches independent
        of solver trajectory."""
        from linkgraph.algs.electrical import effective_resistance

        g = _contracted_graph(spark, sf, 15, directed=False)
        r = effective_resistance(g, 1, 2, tol=1e-9)
        return spark.createDataFrame(
            [(1, 2, float(r))], "u bigint, v bigint, r_eff double"
        ).select("u", "v", _dec("r_eff", 6).alias("r_eff"))

    return {
        "doc_articulation": doc_articulation,
        "doc_min_cut": doc_min_cut,
        "doc_cut_singletons": doc_cut_singletons,
        "doc_effective_resistance": doc_effective_resistance,
        "doc_topo_levels": doc_topo_levels,
        "doc_clique_hist": doc_clique_hist,
        "doc_group_degree": doc_group_degree,
        "doc_switch_degrees": doc_switch_degrees,
        "doc_curveball_degrees": doc_curveball_degrees,
        "doc_group_closeness": doc_group_closeness,
        "doc_group_harmonic": doc_group_harmonic,
        "doc_square_clustering": doc_square_clustering,
        "doc_cover_f1": doc_cover_f1,
        "doc_ktruss": doc_ktruss,
        "doc_simrank": doc_simrank,
        "doc_rich_club": doc_rich_club,
        "doc_knn": doc_knn,
        "doc_nf_heuristic": doc_nf_heuristic,
        "gen_hyperbolic_structure": gen_hyperbolic_structure,
        "doc_degrees": doc_degrees,
        "doc_out_degrees": doc_out_degrees,
        "degree_top10": degree_top10,
        "doc_components": doc_components,
        "doc_components_star": doc_components_star,
        "doc_component_sizes": doc_component_sizes,
        "doc_triangles": doc_triangles,
        "doc_lcc": doc_lcc,
        "doc_pagerank": doc_pagerank,
        "doc_common_neighbors": doc_common_neighbors,
        "doc_adamic_adar": doc_adamic_adar,
        "doc_adjusted_rand": doc_adjusted_rand,
        "doc_neighbors_measure": doc_neighbors_measure,
        "doc_jaccard_lp": doc_jaccard_lp,
        "doc_assortativity": doc_assortativity,
        "doc_modularity_fixed": doc_modularity_fixed,
        "doc_map_equation_fixed": doc_map_equation_fixed,
        "events_sessions": events_sessions,
        "events_funnel": events_funnel,
        "events_retention": events_retention,
        "doc_plp": doc_plp,
        "doc_kcore": doc_kcore,
        "doc_luby_mis": doc_luby_mis,
        "doc_seeded_lp": doc_seeded_lp,
        "doc_unigram_pieces": doc_unigram_pieces,
        "doc_wordpiece_pieces": doc_wordpiece_pieces,
        "doc_eigenvector": doc_eigenvector,
        "doc_katz": doc_katz,
        "doc_bfs": doc_bfs,
        "doc_bfs_path": doc_bfs_path,
        "doc_reachable_counts": doc_reachable_counts,
        "doc_simple_paths": doc_simple_paths,
        "doc_scd_truth": doc_scd_truth,
        "doc_sssp": doc_sssp,
        "algebraic_sssp": algebraic_sssp,
        "algebraic_pagerank": algebraic_pagerank_q,
        "algebraic_tri_total": algebraic_tri_total,
        "doc_closeness": doc_closeness,
        "doc_harmonic": doc_harmonic,
        "doc_eccentricity": doc_eccentricity,
        "doc_diameter": doc_diameter,
        "doc_scc": doc_scc,
        "doc_betweenness": doc_betweenness,
        "doc_spanning_stats": doc_spanning_stats,
        "doc_louvain": doc_louvain,
        "doc_leiden": doc_leiden,
        "doc_hub_dominance": doc_hub_dominance,
        "doc_conductance": doc_conductance,
        "doc_stable_nodes": doc_stable_nodes,
        "doc_fragmentation": doc_fragmentation,
        "doc_total_neighbors": doc_total_neighbors,
        "doc_neighborhood_distance": doc_neighborhood_distance,
        "doc_katz_index": doc_katz_index,
        "doc_prefix_jaccard": doc_prefix_jaccard,
        "doc_simmelian": doc_simmelian,
        "doc_suitor_matching": doc_suitor_matching,
        "doc_pathgrow_matching": doc_pathgrow_matching,
        "doc_pll_dist": doc_pll_dist,
        "doc_gedwalk": doc_gedwalk,
        "doc_maxent_layout": doc_maxent_layout,
        "doc_ego_cover": doc_ego_cover,
        "embed_lsh_banded_top5": embed_lsh_banded_top5,
        "doc_neighborhood_2hop": doc_neighborhood_2hop,
        "dup_groups": dup_groups,
        "token_counts": token_counts,
        "term_doc_freqs": term_doc_freqs,
        "doc_bm25": doc_bm25,
        "lang_dist": lang_dist,
        "doc_quality": doc_quality,
        "doc_gopher_rep": doc_gopher_rep,
        "bloom_ngram_dups": bloom_ngram_dups,
        "doc_gopher_dup_ngrams": doc_gopher_dup_ngrams,
        "ngram_dups": ngram_dups,
        "doc_lang_id": doc_lang_id,
        "doc_lang_nb": doc_lang_nb,
        "doc_normalize": doc_normalize,
        "doc_redact_pii": doc_redact_pii,
        "eval_contamination": eval_contamination,
        "doc_pack_sequences": doc_pack_sequences,
        "corpus_build": corpus_build,
        "corpus_card_rollup": corpus_card_rollup,
        "source_graph": source_graph,
        "doc_gopher_flags": doc_gopher_flags,
        "doc_repetition": doc_repetition,
        "doc_dup_spans": doc_dup_spans,
        "doc_despan": doc_despan,
        "doc_dedup_lines": doc_dedup_lines,
        "doc_quality_classifier": doc_quality_classifier,
        "doc_dsir_weights": doc_dsir_weights,
        "doc_dsir_sample": doc_dsir_sample,
        "doc_trustrank": doc_trustrank,
        "doc_hits": doc_hits,
        "doc_salsa": doc_salsa,
        "doc_cocitation": doc_cocitation,
        "doc_coupling": doc_coupling,
        "doc_bowtie": doc_bowtie,
        "doc_opic": doc_opic,
        "bpe_pair_counts": bpe_pair_counts,
        "doc_unigram_logloss": doc_unigram_logloss,
        "doc_perplexity_buckets": doc_perplexity_buckets,
        "doc_stratified_sample": doc_stratified_sample,
        "doc_source_quota": doc_source_quota,
        "dup_groups_best": dup_groups_best,
        "doc_neighbor_sample": doc_neighbor_sample,
        "doc_fm_distinct": doc_fm_distinct,
        "doc_surt_keys": doc_surt_keys,
        "doc_shard_plan": doc_shard_plan,
        "doc_quantiles": doc_quantiles,
        "doc_adjacency": doc_adjacency,
        "doc_scripts": doc_scripts,
        "doc_mojibake": doc_mojibake,
        "doc_nfc": doc_nfc,
        "doc_sentences": doc_sentences,
        "doc_lang_quantiles": doc_lang_quantiles,
        "doc_cms_counts": doc_cms_counts,
        "doc_snapshot_diff": doc_snapshot_diff,
        "minhash_dups": minhash_dups,
        "minhash_dup_groups": minhash_dup_groups,
        "simhash_dups": simhash_dups,
        "extraction_edges": extraction_edges,
        "page_content": page_content,
        "doc_host_edges": doc_host_edges,
        "doc_host_stats": doc_host_stats,
        "doc_host_rank": doc_host_rank,
        "anchor_text": anchor_text,
        "url_canonical": url_canonical,
        "robots_admission": robots_admission,
        "sitemap_locs": sitemap_locs,
        "warc_pages": warc_pages,
        "pipeline_edges": pipeline_edges,
        "events_rollup": events_rollup,
        "events_stream_replay": events_stream_replay,
        "node2vec_walks": node2vec_walks,
        "events_top_value_per_user": events_top_value_per_user,
        "events_hourly": events_hourly,
        "events_type_stats": events_type_stats,
        "embed_cosine_top5": embed_cosine_top5,
        "embed_lsh_top5": embed_lsh_top5,
        "embed_near_dups": embed_near_dups,
        "embed_near_dup_groups": embed_near_dup_groups,
        "embed_ivf_top5": embed_ivf_top5,
        "embed_pq_top5": embed_pq_top5,
        "embed_semantic_dedup": embed_semantic_dedup,
        "url_filter": url_filter_entry,
        "doc_group_split": doc_group_split,
        "doc_weighted_sample": doc_weighted_sample,
        "vocab_top": vocab_top,
        "doc_c4_flags": doc_c4_flags,
        "doc_sfigality": doc_sfigality,
        "doc_local_similarity": doc_local_similarity,
        "doc_scan_similarity": doc_scan_similarity,
        "doc_multiscale": doc_multiscale,
        "doc_local_coverage": doc_local_coverage,
        "doc_permanence": doc_permanence,
        "doc_attr_assort": doc_attr_assort,
        "partition_measures": partition_measures,
        "doc_top_closeness": doc_top_closeness,
        "doc_nibble": doc_nibble,
        "doc_ppr": doc_ppr,
        "doc_seir_census": doc_seir_census,
        "gen_ba_structure": gen_ba_structure,
        "gen_clustered_structure": gen_clustered_structure,
        "gen_mocnik_structure": gen_mocnik_structure,
        "doc_betweenness_exact": doc_betweenness_exact,
        "doc_laplacian": doc_laplacian,
        "doc_bridges": doc_bridges,
    }


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB equivalents
# ---------------------------------------------------------------------------

# DuckDB-only variant: MATERIALIZED stops CTE inlining (the plain version
# re-opens the parquet file per reference and trips the fd limit when the
# unrolled PageRank references edges 15+ times). Spark keeps EDGES_CTE.
EDGES_CTE_MAT = (
    EDGES_CTE.replace("e0 AS (", "e0 AS MATERIALIZED (")
    .replace("edges AS (", "edges AS MATERIALIZED (")
    .replace("sym AS (", "sym AS MATERIALIZED (")
    .replace("nodes AS (", "nodes AS MATERIALIZED (")
)


def _pagerank_unrolled_sql(
    iters: int = 15,
    damping: float = 0.85,
    cte: str | None = None,
    id_name: str = "id",
) -> str:
    """Generate the fixed-iteration PageRank as chained CTEs: r0 = 1/n;
    per iteration — message sum over out-edges (unweighted), dangling
    (sink) mass redistributed uniformly; matches linkgraph.algs.pagerank
    with tol=0, max_iter=iters, distribute_sinks=True on the unweighted
    directed graph. ``cte`` overrides the edges/nodes prefix (defaults to
    the doc graph); ids may be strings (host rank)."""
    parts = [
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "outd AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank / o.od) AS msg "
            f"FROM r{p} r JOIN edges e ON e.src = r.id JOIN outd o ON o.src = r.id "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS s FROM r{p} r "
            f"LEFT JOIN outd o ON o.src = r.id WHERE o.src IS NULL)"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT nd.id, {1.0 - damping}/(SELECT n FROM nn) + "
            f"{damping} * (COALESCE(m.msg, 0.0) + (SELECT s FROM s{i})/(SELECT n FROM nn)) AS rank "
            f"FROM nodes nd LEFT JOIN m{i} m ON m.id = nd.id)"
        )
    return (
        f"WITH {cte if cte is not None else EDGES_CTE_MAT}, " + ",\n".join(parts) +
        f"\nSELECT id AS {id_name}, ROUND(rank, 6) AS rank FROM r{iters}"
    )


def _opic_unrolled_sql(iters: int = 12) -> str:
    """OPIC synchronous-batch unroll with the virtual root: per step,
    page inflow = Σ cash/（outdeg+1) over in-edges + root_cash/n; the
    root banks one share per page and redistributes its whole balance;
    history accumulates pre-distribution cash. Matches
    linkgraph.algs.opic.opic."""
    parts = [
        "de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "odp AS MATERIALIZED (SELECT n.id, CAST(COALESCE(o.c, 0) + 1 AS DOUBLE)"
        " AS odp FROM nodes n LEFT JOIN (SELECT src, count(*) AS c FROM de"
        " GROUP BY src) o ON o.src = n.id)",
        "c0 AS MATERIALIZED (SELECT id, 1.0 / ((SELECT n FROM nn) + 1) AS cash,"
        " 0.0 AS hist FROM nodes)",
        "r0 AS (SELECT 1.0 / ((SELECT n FROM nn) + 1) AS rc, 0.0 AS rh)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"s{i} AS (SELECT SUM(c.cash / o.odp) AS to_root "
            f"FROM c{p} c JOIN odp o ON o.id = c.id)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT de.dst AS id, SUM(c.cash / o.odp) AS inf "
            f"FROM c{p} c JOIN de ON de.src = c.id JOIN odp o ON o.id = c.id "
            f"GROUP BY de.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT (SELECT to_root FROM s{i}) AS rc, rh + rc AS rh "
            f"FROM r{p})"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT c.id, "
            f"COALESCE(m.inf, 0.0) + (SELECT rc FROM r{p}) / (SELECT n FROM nn)"
            f" AS cash, c.hist + c.cash AS hist "
            f"FROM c{p} c LEFT JOIN m{i} m ON m.id = c.id)"
        )
    return (
        f"WITH {EDGES_CTE_MAT}, " + ",\n".join(parts) +
        f",\ntot AS (SELECT SUM(hist + cash) AS t FROM c{iters})"
        f"\nSELECT id, ROUND((hist + cash) / (SELECT t FROM tot), 6)"
        f" AS importance FROM c{iters}"
    )


def _gopher_rep_sql() -> str:
    """Gopher repetition-rule replay: per-segment beyond-first-occurrence
    counts (lines chr(10), paragraphs chr(10)||chr(10)) and per-n top
    repeated word-gram char coverage (max count, ties -> longest gram),
    matching linkgraph.text.pipeline.gopher_repetition_flags. Every
    fraction is one integer-sum division — bit-identical to Spark."""
    seg = lambda name, delim: f"""
{name}segs AS (
  SELECT doc_id, nc, seg
  FROM base, unnest(string_split(t, {delim})) AS u(seg)
  WHERE seg <> ''
),
{name}per AS (
  SELECT doc_id, any_value(nc) AS nc, seg, count(*) AS c
  FROM {name}segs GROUP BY doc_id, seg
),
{name}m AS (
  SELECT doc_id,
         SUM(c - 1) / SUM(c) AS dup_frac,
         CASE WHEN any_value(nc) > 0
              THEN SUM((c - 1) * length(seg)) / CAST(any_value(nc) AS DOUBLE)
              ELSE 0.0 END AS dup_char_frac
  FROM {name}per GROUP BY doc_id
)"""  # noqa: E731

    def gram(n: int) -> str:
        joins = " JOIN ".join(
            f"w w{i} ON w{i}.doc_id = w0.doc_id AND w{i}.p = w0.p + {i}"
            if i else "w w0"
            for i in range(n)
        )
        concat = " || ' ' || ".join(f"w{i}.word" for i in range(n))
        return f"""
g{n} AS (
  SELECT w0.doc_id, w0.nc, {concat} AS gram FROM {joins}
),
g{n}c AS (
  SELECT doc_id, any_value(nc) AS nc, gram, count(*) AS c
  FROM g{n} GROUP BY doc_id, gram HAVING count(*) > 1
),
m{n} AS (SELECT doc_id, MAX(c) AS c1 FROM g{n}c GROUP BY doc_id),
t{n} AS (
  SELECT g.doc_id, any_value(g.nc) AS nc, m.c1, MAX(length(g.gram)) AS gl
  FROM g{n}c g JOIN m{n} m ON m.doc_id = g.doc_id AND g.c = m.c1
  GROUP BY g.doc_id, m.c1
),
f{n} AS (
  SELECT doc_id,
         CASE WHEN nc > 0 THEN c1 * gl / CAST(nc AS DOUBLE) ELSE 0.0 END
           AS top{n}_char_frac
  FROM t{n}
)"""

    return f"""
WITH base AS (SELECT doc_id, text AS t, length(text) AS nc FROM documents),
{seg("l", "chr(10)")},
{seg("p", "chr(10) || chr(10)")},
w AS (
  SELECT doc_id, nc, word,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
  FROM (
    SELECT doc_id, nc,
           unnest(string_split(t, ' ')) AS word,
           generate_subscripts(string_split(t, ' '), 1) AS pos
    FROM base
  ) WHERE word <> ''
),
{gram(2)},
{gram(3)},
{gram(4)}
SELECT b.doc_id,
  COALESCE(lm.dup_frac, 0.0) AS dup_line_frac,
  COALESCE(lm.dup_char_frac, 0.0) AS dup_line_char_frac,
  COALESCE(pm.dup_frac, 0.0) AS dup_para_frac,
  COALESCE(pm.dup_char_frac, 0.0) AS dup_para_char_frac,
  COALESCE(f2.top2_char_frac, 0.0) AS top2_char_frac,
  COALESCE(f3.top3_char_frac, 0.0) AS top3_char_frac,
  COALESCE(f4.top4_char_frac, 0.0) AS top4_char_frac,
  (COALESCE(lm.dup_frac, 0.0) <= 0.30
   AND COALESCE(pm.dup_frac, 0.0) <= 0.30
   AND COALESCE(lm.dup_char_frac, 0.0) <= 0.20
   AND COALESCE(pm.dup_char_frac, 0.0) <= 0.20
   AND COALESCE(f2.top2_char_frac, 0.0) <= 0.20
   AND COALESCE(f3.top3_char_frac, 0.0) <= 0.18
   AND COALESCE(f4.top4_char_frac, 0.0) <= 0.16) AS passes
FROM base b
LEFT JOIN lm ON lm.doc_id = b.doc_id
LEFT JOIN pm ON pm.doc_id = b.doc_id
LEFT JOIN f2 ON f2.doc_id = b.doc_id
LEFT JOIN f3 ON f3.doc_id = b.doc_id
LEFT JOIN f4 ON f4.doc_id = b.doc_id
"""


def _hits_unrolled_sql(iters: int = 8) -> str:
    """HITS power iteration unroll: h0 = 1; per iteration the authority
    half-step (in-edge hub sum, L2-normalized over ALL vertices) then the
    hub half-step over the fresh authorities — matches
    linkgraph.algs.hits.hits with tol=0."""
    parts = [
        "h0 AS MATERIALIZED (SELECT id, 1.0 AS h FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"au{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(h.h) AS v "
            f"FROM h{p} h JOIN edges e ON e.src = h.id GROUP BY e.dst)"
        )
        parts.append(
            f"an{i} AS MATERIALIZED (SELECT COALESCE(sqrt(SUM(v*v)), 1.0) AS nm FROM au{i})"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT nd.id, COALESCE(u.v, 0.0) / "
            f"(CASE WHEN (SELECT nm FROM an{i}) = 0 THEN 1.0 ELSE (SELECT nm FROM an{i}) END) AS a "
            f"FROM nodes nd LEFT JOIN au{i} u ON u.id = nd.id)"
        )
        parts.append(
            f"hu{i} AS MATERIALIZED (SELECT e.src AS id, SUM(a.a) AS v "
            f"FROM a{i} a JOIN edges e ON e.dst = a.id GROUP BY e.src)"
        )
        parts.append(
            f"hn{i} AS MATERIALIZED (SELECT COALESCE(sqrt(SUM(v*v)), 1.0) AS nm FROM hu{i})"
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT nd.id, COALESCE(u.v, 0.0) / "
            f"(CASE WHEN (SELECT nm FROM hn{i}) = 0 THEN 1.0 ELSE (SELECT nm FROM hn{i}) END) AS h "
            f"FROM nodes nd LEFT JOIN hu{i} u ON u.id = nd.id)"
        )
    return (
        f"WITH {EDGES_CTE_MAT}, " + ",\n".join(parts) +
        f"\nSELECT h.id, ROUND(h.h, 6) AS hub, ROUND(a.a, 6) AS authority "
        f"FROM h{iters} h JOIN a{iters} a ON a.id = h.id"
    )


def _salsa_unrolled_sql(iters: int = 6) -> str:
    """SALSA unroll: HITS half-steps with the pushed mass divided by the
    pushing endpoint's degree (out-degree on the authority step, in-degree
    on the hub step), L1-normalized per half-step from the uniform 1/n
    start — matches linkgraph.algs.hits.salsa with tol=0."""
    parts = [
        "od AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od "
        "FROM edges GROUP BY src)",
        "idg AS MATERIALIZED (SELECT dst, CAST(COUNT(*) AS DOUBLE) AS idg "
        "FROM edges GROUP BY dst)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "h0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS h FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"au{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(h.h / o.od) AS v "
            f"FROM h{p} h JOIN edges e ON e.src = h.id "
            f"JOIN od o ON o.src = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"an{i} AS MATERIALIZED (SELECT COALESCE(SUM(ABS(v)), 1.0) AS nm FROM au{i})"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT nd.id, COALESCE(u.v, 0.0) / "
            f"(CASE WHEN (SELECT nm FROM an{i}) = 0 THEN 1.0 ELSE (SELECT nm FROM an{i}) END) AS a "
            f"FROM nodes nd LEFT JOIN au{i} u ON u.id = nd.id)"
        )
        parts.append(
            f"hu{i} AS MATERIALIZED (SELECT e.src AS id, SUM(a.a / g.idg) AS v "
            f"FROM a{i} a JOIN edges e ON e.dst = a.id "
            f"JOIN idg g ON g.dst = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"hn{i} AS MATERIALIZED (SELECT COALESCE(SUM(ABS(v)), 1.0) AS nm FROM hu{i})"
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT nd.id, COALESCE(u.v, 0.0) / "
            f"(CASE WHEN (SELECT nm FROM hn{i}) = 0 THEN 1.0 ELSE (SELECT nm FROM hn{i}) END) AS h "
            f"FROM nodes nd LEFT JOIN hu{i} u ON u.id = nd.id)"
        )
    return (
        f"WITH {EDGES_CTE_MAT}, " + ",\n".join(parts) +
        f"\nSELECT h.id, ROUND(h.h, 6) AS hub, ROUND(a.a, 6) AS authority "
        f"FROM h{iters} h JOIN a{iters} a ON a.id = h.id"
    )


def _trustrank_unrolled_sql(iters: int = 15, damping: float = 0.85) -> str:
    """Personalized-PageRank unroll (TrustRank): teleport vector uniform
    over the trusted seed set id % 17 == 0; r0 = p; per iteration the
    teleport term is (1−d)·p_i and dangling mass redistributes ∝ p —
    matches linkgraph.algs.trustrank.trustrank with tol=0."""
    parts = [
        "sd AS MATERIALIZED (SELECT id FROM nodes WHERE id % 17 = 0)",
        "nsd AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM sd)",
        "tp AS MATERIALIZED (SELECT nd.id, "
        "CASE WHEN sd.id IS NOT NULL THEN 1.0/(SELECT n FROM nsd) ELSE 0.0 END AS p "
        "FROM nodes nd LEFT JOIN sd ON sd.id = nd.id)",
        "outd AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, p AS rank FROM tp)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank / o.od) AS msg "
            f"FROM r{p} r JOIN edges e ON e.src = r.id JOIN outd o ON o.src = r.id "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS s FROM r{p} r "
            f"LEFT JOIN outd o ON o.src = r.id WHERE o.src IS NULL)"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT t.id, {1.0 - damping} * t.p + "
            f"{damping} * (COALESCE(m.msg, 0.0) + (SELECT s FROM s{i}) * t.p) AS rank "
            f"FROM tp t LEFT JOIN m{i} m ON m.id = t.id)"
        )
    return (
        f"WITH {EDGES_CTE_MAT}, " + ",\n".join(parts) +
        f"\nSELECT id, ROUND(rank, 6) AS trust FROM r{iters}"
    )


def oracle_sql() -> dict[str, str]:
    sql = {}

    sql["doc_degrees"] = f"""
WITH {EDGES_CTE}
SELECT src AS id, count(*) AS degree, ROUND(SUM(weight), 6) AS weighted_degree
FROM sym GROUP BY src
"""

    sql["doc_out_degrees"] = f"""
WITH {EDGES_CTE}
SELECT n.id, COALESCE(o.degree, 0) AS degree FROM nodes n
LEFT JOIN (SELECT src AS id, count(*) AS degree FROM edges GROUP BY src) o
  ON o.id = n.id
"""

    sql["degree_top10"] = f"""
WITH {EDGES_CTE}
SELECT src AS id, count(*) AS degree FROM sym GROUP BY src
ORDER BY degree DESC, id ASC LIMIT 10
"""

    sql["doc_components"] = f"""
WITH RECURSIVE {EDGES_CTE},
reach(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
  WHERE r.label < s.dst
)
SELECT id, MIN(label) AS component FROM reach GROUP BY id
"""

    sql["doc_components_star"] = sql["doc_components"]

    sql["doc_component_sizes"] = f"""
WITH RECURSIVE {EDGES_CTE},
reach(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.id
  WHERE r.label < s.dst
),
comp AS (SELECT id, MIN(label) AS component FROM reach GROUP BY id)
SELECT component, count(*) AS size FROM comp GROUP BY component
"""

    tri_cte = """
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
tcount AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id)
"""

    sql["doc_triangles"] = f"""
WITH {EDGES_CTE},
{tri_cte}
SELECT n.id, COALESCE(t.triangles, 0) AS triangles
FROM nodes n LEFT JOIN tcount t ON t.id = n.id
"""

    sql["doc_lcc"] = f"""
WITH {EDGES_CTE},
{tri_cte},
deg AS (SELECT src AS id, count(*) AS d FROM sym WHERE src <> dst GROUP BY src)
SELECT n.id,
  ROUND(CASE WHEN COALESCE(d.d,0) >= 2
        THEN 2.0 * COALESCE(t.triangles,0) / (d.d * (d.d - 1)) ELSE 0.0 END, 6) AS lcc
FROM nodes n LEFT JOIN tcount t ON t.id = n.id LEFT JOIN deg d ON d.id = n.id
"""

    sql["doc_pagerank"] = _pagerank_unrolled_sql(15, 0.85)
    sql["doc_trustrank"] = _trustrank_unrolled_sql(15, 0.85)
    sql["doc_hits"] = _hits_unrolled_sql(8)
    sql["doc_opic"] = _opic_unrolled_sql(12)
    sql["doc_salsa"] = _salsa_unrolled_sql(6)
    sql["doc_cocitation"] = f"""
WITH {EDGES_CTE_MAT},
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)
SELECT a.dst AS u, b.dst AS v, count(*) AS n_common
FROM de a JOIN de b ON a.src = b.src
WHERE a.dst < b.dst GROUP BY a.dst, b.dst
"""
    sql["doc_coupling"] = f"""
WITH {EDGES_CTE_MAT},
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges)
SELECT a.src AS u, b.src AS v, count(*) AS n_common
FROM de a JOIN de b ON a.dst = b.dst
WHERE a.src < b.src GROUP BY a.src, b.src
"""
    # Broder taxonomy replay: recursive transitive closure → SCC as the
    # mutual-reach pairwise min → core = largest SCC (ties min label, the
    # engine's pivot convention) → region CASE over the reach sets.
    sql["doc_bowtie"] = f"""
WITH RECURSIVE {EDGES_CTE_MAT},
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
tc AS (
  SELECT src AS u, dst AS v FROM de
  UNION
  SELECT tc.u, de.dst FROM tc JOIN de ON de.src = tc.v
),
reach AS MATERIALIZED (SELECT u, v FROM tc UNION SELECT id, id FROM nodes),
scc AS MATERIALIZED (
  SELECT a.u AS id, MIN(a.v) AS component
  FROM reach a JOIN reach b ON b.u = a.v AND b.v = a.u
  GROUP BY a.u
),
topc AS (
  SELECT component FROM (
    SELECT component, COUNT(*) AS n FROM scc GROUP BY component
  ) ORDER BY n DESC, component LIMIT 1
),
core AS MATERIALIZED (
  SELECT id FROM scc WHERE component = (SELECT component FROM topc)
),
fwd AS MATERIALIZED (SELECT DISTINCT r.v AS id FROM reach r JOIN core c ON c.id = r.u),
bwd AS MATERIALIZED (SELECT DISTINCT r.u AS id FROM reach r JOIN core c ON c.id = r.v),
outr AS MATERIALIZED (
  SELECT * FROM (SELECT id FROM fwd EXCEPT SELECT id FROM core)
),
inr AS MATERIALIZED (
  SELECT * FROM (SELECT id FROM bwd EXCEPT SELECT id FROM core)
),
mainr AS MATERIALIZED (SELECT id FROM fwd UNION SELECT id FROM bwd),
fin AS MATERIALIZED (
  SELECT * FROM (
    SELECT r.v AS id FROM reach r JOIN inr i ON i.id = r.u
    EXCEPT SELECT id FROM mainr
  )
),
bout AS MATERIALIZED (
  SELECT * FROM (
    SELECT r.u AS id FROM reach r JOIN outr o ON o.id = r.v
    EXCEPT SELECT id FROM mainr
  )
)
SELECT n.id,
  CASE WHEN c.id IS NOT NULL THEN 'core'
       WHEN i.id IS NOT NULL THEN 'in'
       WHEN o.id IS NOT NULL THEN 'out'
       WHEN f.id IS NOT NULL AND b.id IS NOT NULL THEN 'tube'
       WHEN f.id IS NOT NULL THEN 'tendril_in'
       WHEN b.id IS NOT NULL THEN 'tendril_out'
       ELSE 'disconnected' END AS region
FROM nodes n
LEFT JOIN core c ON c.id = n.id
LEFT JOIN inr i ON i.id = n.id
LEFT JOIN outr o ON o.id = n.id
LEFT JOIN fin f ON f.id = n.id
LEFT JOIN bout b ON b.id = n.id
"""
    # the algebraic formulations converge to the identical fixed points /
    # run the identical fixed-iteration recurrences, so they share oracles
    sql["algebraic_pagerank"] = _pagerank_unrolled_sql(15, 0.85)
    sql["algebraic_tri_total"] = f"""
WITH {EDGES_CTE},
{tri_cte}
SELECT count(*) AS triangles FROM tri
"""

    lp_cte = """
symn AS (SELECT src, dst FROM sym WHERE src <> dst),
wedge AS (
  SELECT e1.src AS u, e2.src AS v, e1.dst AS w
  FROM symn e1 JOIN symn e2 ON e1.dst = e2.dst AND e1.src < e2.src
),
deg AS (SELECT src AS id, count(*) AS d FROM symn GROUP BY src)
"""

    sql["doc_common_neighbors"] = f"""
WITH {EDGES_CTE},
{lp_cte}
SELECT u, v, CAST(count(*) AS DOUBLE) AS score FROM wedge GROUP BY u, v
"""

    sql["doc_adamic_adar"] = f"""
WITH {EDGES_CTE},
{lp_cte}
SELECT w.u, w.v, ROUND(SUM(1.0 / LN(CAST(d.d AS DOUBLE))), 6) AS score
FROM wedge w JOIN deg d ON d.id = w.w GROUP BY w.u, w.v
"""

    sql["doc_adjusted_rand"] = f"""
WITH {EDGES_CTE},
{lp_cte},
cn AS (SELECT u, v, count(*) AS c FROM wedge GROUP BY u, v),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
parts AS (
  SELECT cn.u, cn.v,
         CAST(cn.c AS DOUBLE) AS i,
         CAST(du.d - cn.c AS DOUBLE) AS a,
         CAST(dv.d - cn.c AS DOUBLE) AS b,
         (SELECT n FROM nn) - CAST(du.d + dv.d - cn.c AS DOUBLE) AS dd
  FROM cn JOIN deg du ON du.id = cn.u JOIN deg dv ON dv.id = cn.v
)
SELECT u, v,
       ROUND(CASE WHEN (i + a) * (a + dd) + (i + b) * (b + dd) <> 0
                  THEN 2.0 * (i * dd - a * b)
                       / ((i + a) * (a + dd) + (i + b) * (b + dd))
                  ELSE 0.0 END, 6) AS score
FROM parts
"""

    sql["doc_neighbors_measure"] = f"""
WITH {EDGES_CTE},
{lp_cte},
cn AS (SELECT u, v, CAST(count(*) AS DOUBLE) AS c FROM wedge GROUP BY u, v),
p3 AS (
  SELECT e1.src AS u, e3.src AS v, CAST(count(*) AS DOUBLE) AS c
  FROM symn e1
  JOIN symn e2 ON e2.src = e1.dst
  JOIN symn e3 ON e3.dst = e2.dst
  WHERE e1.src < e3.src
  GROUP BY e1.src, e3.src
)
SELECT COALESCE(cn.u, p3.u) AS u, COALESCE(cn.v, p3.v) AS v,
       COALESCE(cn.c, 0) + COALESCE(p3.c, 0) AS score
FROM cn FULL OUTER JOIN p3 ON cn.u = p3.u AND cn.v = p3.v
"""

    sql["doc_jaccard_lp"] = f"""
WITH {EDGES_CTE},
{lp_cte},
cn AS (SELECT u, v, count(*) AS c FROM wedge GROUP BY u, v)
SELECT cn.u, cn.v,
       ROUND(CAST(cn.c AS DOUBLE) / (du.d + dv.d - cn.c), 6) AS score
FROM cn JOIN deg du ON du.id = cn.u JOIN deg dv ON dv.id = cn.v
"""

    sql["doc_assortativity"] = f"""
WITH {EDGES_CTE},
deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src)
SELECT ROUND(CORR(CAST(ds.d AS DOUBLE), CAST(dd.d AS DOUBLE)), 6) AS assortativity
FROM sym s JOIN deg ds ON ds.id = s.src JOIN deg dd ON dd.id = s.dst
"""

    sql["doc_map_equation_fixed"] = f"""
WITH {EDGES_CTE},
lab AS (SELECT id, id % 7 AS label FROM nodes),
tw AS (SELECT SUM(weight) AS w FROM sym),
deg AS (
  SELECT src AS id, SUM(CASE WHEN src = dst THEN 2.0 * weight
                             ELSE weight END) AS k
  FROM sym GROUP BY src),
vol AS (
  SELECT l.label, SUM(d.k) AS vol FROM lab l JOIN deg d ON d.id = l.id
  GROUP BY l.label),
w2 AS (
  SELECT ls.label, SUM(s.weight) AS w2 FROM sym s
  JOIN lab ls ON ls.id = s.src JOIN lab ld ON ld.id = s.dst
  WHERE s.src <> s.dst AND ls.label = ld.label GROUP BY ls.label),
sw AS (
  SELECT ls.label, 2.0 * SUM(s.weight) AS sw FROM sym s
  JOIN lab ls ON ls.id = s.src WHERE s.src = s.dst GROUP BY ls.label),
comm AS (
  SELECT v.label, v.vol / (SELECT w FROM tw) AS p,
         (v.vol - COALESCE(w2.w2, 0.0) - COALESCE(sw.sw, 0.0))
           / (SELECT w FROM tw) AS q
  FROM vol v LEFT JOIN w2 ON w2.label = v.label
  LEFT JOIN sw ON sw.label = v.label),
agg AS (
  SELECT SUM(q) AS qt,
         SUM(CASE WHEN q > 0 THEN q * log2(q) ELSE 0.0 END) AS sq,
         SUM(CASE WHEN q + p > 0 THEN (q + p) * log2(q + p)
                  ELSE 0.0 END) AS sqp
  FROM comm),
spi AS (
  SELECT SUM(CASE WHEN d.k > 0
             THEN (d.k / (SELECT w FROM tw)) * log2(d.k / (SELECT w FROM tw))
             ELSE 0.0 END) AS v
  FROM deg d)
SELECT ROUND((CASE WHEN a.qt > 0 THEN a.qt * log2(a.qt) ELSE 0.0 END)
             - 2.0 * a.sq + a.sqp - (SELECT v FROM spi), 6) AS map_equation
FROM agg a
"""

    sql["doc_modularity_fixed"] = f"""
WITH {EDGES_CTE},
lab AS (SELECT id, id % 7 AS label FROM nodes),
le AS (
  SELECT s.weight, ls.label AS sl, ld.label AS dl
  FROM sym s JOIN lab ls ON ls.id = s.src JOIN lab ld ON ld.id = s.dst
),
tot AS (
  SELECT SUM(weight) AS two_w,
         SUM(CASE WHEN sl = dl THEN weight ELSE 0.0 END) AS intra
  FROM le
),
vol AS (SELECT sl, SUM(weight) AS v FROM le GROUP BY sl),
v2 AS (SELECT SUM(v * v) AS vv FROM vol)
SELECT ROUND(tot.intra / tot.two_w - v2.vv / (tot.two_w * tot.two_w), 6) AS modularity
FROM tot, v2
"""

    sql["events_retention"] = """
WITH ew AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
fw AS (SELECT user_id, MIN(wk) AS cohort FROM ew GROUP BY user_id)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort, wk) // 7 AS INT) AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM ew e JOIN fw USING (user_id)
GROUP BY 1, 2
"""

    sql["events_sessions"] = """
WITH ev AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL
                     OR date_diff('second', prev_ts, ts) > 1800
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM ev GROUP BY user_id
"""

    sql["events_funnel"] = """
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS tsl FROM events),
s1 AS (SELECT user_id, min(tsl) AS t FROM ev WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.tsl) AS t FROM ev e JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.tsl > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.tsl) AS t FROM ev e JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.tsl > s2.t GROUP BY 1)
SELECT 'view' AS step, count(*) AS users FROM s1
UNION ALL SELECT 'click' AS step, count(*) AS users FROM s2
UNION ALL SELECT 'purchase' AS step, count(*) AS users FROM s3
"""

    sql["dup_groups"] = """
WITH keyed AS (SELECT doc_id, text FROM documents),
grp AS (SELECT text, MIN(doc_id) AS group_id, count(*) AS n
        FROM keyed GROUP BY text HAVING count(*) > 1)
SELECT g.group_id, k.doc_id FROM keyed k JOIN grp g ON g.text = k.text
"""

    sql["token_counts"] = """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
"""

    sql["term_doc_freqs"] = """
WITH tok AS (
  SELECT doc_id, lower(t) AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u
  WHERE t <> ''
),
post AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id)
SELECT term, count(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
FROM post GROUP BY term
"""

    sql["doc_bm25"] = """
WITH tok AS (
  SELECT doc_id, lower(t) AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) u
  WHERE t <> ''
),
post AS (
  SELECT term, doc_id, CAST(count(*) AS DOUBLE) AS tf FROM tok
  WHERE term IN ('hash', 'join', 'spark') GROUP BY term, doc_id
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY term),
lens AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE)
           AS dl
  FROM documents
),
ad AS (SELECT AVG(dl) AS avgdl FROM lens)
SELECT p.doc_id,
  ROUND(SUM(
    ln(1.0 + ((SELECT n FROM nn) - d.df + 0.5) / (d.df + 0.5))
    * (p.tf * (1.2 + 1.0))
    / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / (SELECT avgdl FROM ad)))
  ), 6) AS score
FROM post p JOIN dfreq d ON d.term = p.term JOIN lens l ON l.doc_id = p.doc_id
GROUP BY p.doc_id
"""

    sql["lang_dist"] = "SELECT lang, count(*) AS n FROM documents GROUP BY lang"

    sql["doc_gopher_rep"] = _gopher_rep_sql()

    # Gopher duplicated-5..10-gram char fractions: token char offsets via
    # a running-sum window, duplicate grams via HAVING count>=2, interval
    # union via the gaps-and-islands running MAX(e) — same semantics as
    # the engine's sort+fold (the oracle may use windows; the engine is
    # window-free by plan discipline).
    _gcaps = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
    _gwide = ",\n            ".join(
        f"MAX(CASE WHEN n = {n} THEN frac END) AS f{n}" for n in _gcaps
    )
    _gout = ",\n       ".join(
        f"ROUND(COALESCE(f{n}, 0.0), 6) AS dup{n}_char_frac" for n in _gcaps
    )
    _gpass = " AND ".join(f"COALESCE(f{n}, 0.0) <= {c}" for n, c in _gcaps.items())
    sql["doc_gopher_dup_ngrams"] = f"""
WITH tk AS (SELECT doc_id, length(text) AS n_chars,
                   string_split(text, ' ') AS toks FROM documents),
occ0 AS (SELECT tk.doc_id, tk.n_chars, nn.n,
               CASE WHEN u.i = 1 THEN 0
                    ELSE length(array_to_string(toks[1:u.i-1], ' ')) + 1
               END AS s,
               array_to_string(toks[u.i:u.i+nn.n-1], ' ') AS gram
        FROM tk,
             UNNEST([{",".join(str(n) for n in _gcaps)}]) AS nn(n),
             UNNEST(generate_series(1, greatest(len(toks) - nn.n + 1, 0))) AS u(i)),
occ AS (SELECT doc_id, n_chars, n, s, s + length(gram) AS e, gram FROM occ0),
dup AS (SELECT doc_id, n, gram FROM occ
        GROUP BY doc_id, n, gram HAVING count(*) >= 2),
ivs AS (SELECT o.doc_id, o.n_chars, o.n, o.s, o.e
        FROM occ o JOIN dup d USING (doc_id, n, gram)),
seg AS (SELECT doc_id, n_chars, n, s, e,
               COALESCE(MAX(e) OVER (PARTITION BY doc_id, n ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS pm
        FROM ivs),
per AS (SELECT doc_id, n,
               CASE WHEN MAX(n_chars) > 0
                    THEN CAST(SUM(GREATEST(e - GREATEST(s, pm), 0)) AS DOUBLE)
                         / MAX(n_chars)
                    ELSE 0.0 END AS frac
        FROM seg GROUP BY doc_id, n),
wide AS (SELECT doc_id,
            {_gwide}
         FROM per GROUP BY doc_id)
SELECT d.doc_id,
       {_gout},
       ({_gpass}) AS passes
FROM documents d LEFT JOIN wide USING (doc_id)
"""

    # Bloom dedup screen: bit-level replay — same phash family, same
    # 62-bit words, same bool_and-over-k probe as linkgraph.text.bloom.
    from linkgraph.portable import phash_sql as _pph

    _bm, _bk, _bspan = 1 << 20, 3, 2
    _bidx = ",".join(str(i) for i in range(_bk))
    sql["bloom_ngram_dups"] = f"""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bu AS (
  SELECT array_to_string(toks[i:i+{_bspan}], ' ') AS u
  FROM tk, UNNEST(generate_series(1, greatest(len(toks) - {_bspan}, 0))) AS g(i)
  WHERE doc_id % 2 = 0
),
bpos AS (SELECT {_pph("u", "s.i")} % {_bm} AS pos
         FROM bu, UNNEST([{_bidx}]) AS s(i)),
bloom AS (SELECT pos // 62 AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INT)) AS bits
          FROM bpos GROUP BY 1),
pu AS (
  SELECT doc_id, g.i AS uidx, array_to_string(toks[g.i:g.i+{_bspan}], ' ') AS u
  FROM tk, UNNEST(generate_series(1, greatest(len(toks) - {_bspan}, 0))) AS g(i)
  WHERE doc_id % 2 = 1
),
ppos AS (SELECT doc_id, uidx, {_pph("u", "s.i")} % {_bm} AS pos
         FROM pu, UNNEST([{_bidx}]) AS s(i)),
ph AS (SELECT doc_id, uidx,
              bool_and((COALESCE(b.bits, 0)
                        & (CAST(1 AS BIGINT) << CAST(pos % 62 AS INT))) <> 0)
              AS present
       FROM ppos LEFT JOIN bloom b ON b.word_idx = pos // 62
       GROUP BY doc_id, uidx),
pd AS (SELECT doc_id, count(*) AS n_units,
              SUM(CAST(present AS BIGINT)) AS n_dup_units
       FROM ph GROUP BY doc_id)
SELECT d.doc_id, COALESCE(n_units, 0) AS n_units,
       CAST(COALESCE(n_dup_units, 0) AS BIGINT) AS n_dup_units,
       ROUND(CASE WHEN COALESCE(n_units, 0) > 0
             THEN CAST(n_dup_units AS DOUBLE) / n_units ELSE 0.0 END, 6)
       AS dup_frac
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN pd USING (doc_id)
"""

    sql["doc_quality"] = """
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
         string_split(text, ' ') AS toks
  FROM documents
)
SELECT doc_id, n_chars, len(toks) AS n_tokens,
  ROUND(CASE WHEN len(toks) > 0
        THEN CAST(n_chars - (len(toks) - 1) AS DOUBLE) / len(toks) ELSE 0.0 END, 6)
    AS avg_token_len,
  ROUND(CASE WHEN len(toks) > 0
        THEN CAST(len(list_filter(toks, x -> x IN
          ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE) / len(toks)
        ELSE 0.0 END, 6) AS stopword_ratio
FROM t
"""

    sql["ngram_dups"] = """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS sh
  FROM tk, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
),
-- mirrors the engine's max_shingle_freq=10000 heavy-hitter guard
keep AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 10000),
sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN keep k USING (sh)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b, ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
"""

    # --- training-data pipeline ops: same augmentation, same regex subset
    from linkgraph.portable import phash_sql as _pph
    from linkgraph.text.pipeline import EMAIL_RE, IPV4_RE, PHONE_RE

    sql["doc_normalize"] = (
        "SELECT doc_id, trim(regexp_replace(lower('  ' || upper(text) || ' \t x  Y '), "
        "'\\s+', ' ', 'g')) AS text_norm FROM documents"
    )

    sql["doc_redact_pii"] = f"""
WITH aug AS (
  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         || '.17 tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
         || '-1234' AS text
  FROM documents
),
s1 AS (SELECT doc_id, len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_email,
              regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t FROM aug),
s2 AS (SELECT doc_id, n_email, len(regexp_extract_all(t, '{IPV4_RE}')) AS n_ipv4,
              regexp_replace(t, '{IPV4_RE}', '<IP>', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, n_email, n_ipv4,
              len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phone,
              regexp_replace(t, '{PHONE_RE}', '<PHONE>', 'g') AS t FROM s2)
SELECT doc_id, t AS text_redacted, n_email, n_ipv4, n_phone FROM s3
"""

    sql["eval_contamination"] = """
WITH tr AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id % 10 <> 7),
ev AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id % 10 = 7),
tsh AS (SELECT DISTINCT array_to_string(toks[i:i+2], ' ') AS sh
        FROM tr, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)),
esh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS sh
        FROM ev, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)),
agg AS (SELECT e.doc_id, count(*) AS n_sh, count(t.sh) AS n_c
        FROM esh e LEFT JOIN tsh t USING (sh) GROUP BY e.doc_id)
SELECT d.doc_id, COALESCE(n_sh, 0) AS n_shingles, COALESCE(n_c, 0) AS n_contaminated,
       ROUND(CASE WHEN COALESCE(n_sh, 0) > 0
             THEN CAST(n_c AS DOUBLE) / n_sh ELSE 0.0 END, 6) AS contamination
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
LEFT JOIN agg ON agg.doc_id = d.doc_id
"""

    sql["doc_pack_sequences"] = f"""
WITH sized AS (
  SELECT doc_id, {_pph("doc_id", "42")} % 8 AS bucket,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
off AS (
  SELECT doc_id, bucket, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM sized
)
SELECT doc_id, bucket, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(FLOOR(start_offset / 50) AS BIGINT) AS start_seq,
       CAST(FLOOR((start_offset + greatest(n_tokens, 1) - 1) / 50) AS BIGINT) AS end_seq
FROM off
"""

    sql["corpus_build"] = f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t0
  FROM documents
),
r1 AS (SELECT doc_id, regexp_replace(t0, '{EMAIL_RE}', '<EMAIL>', 'g') AS t FROM norm),
r2 AS (SELECT doc_id, regexp_replace(t, '{IPV4_RE}', '<IP>', 'g') AS t FROM r1),
red AS (SELECT doc_id, regexp_replace(t, '{PHONE_RE}', '<PHONE>', 'g') AS t FROM r2),
m AS (SELECT doc_id, t, string_split(t, ' ') AS toks, length(t) AS n_chars FROM red),
fl AS (
  SELECT doc_id, t FROM m
  WHERE len(toks) BETWEEN 50 AND 100000
    AND CAST(n_chars - (len(toks) - 1) AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0
    AND CAST(len(regexp_extract_all(t, '#'))
             + len(regexp_extract_all(t, '\\.\\.\\.')) AS DOUBLE) / len(toks) <= 0.1
    AND CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        / len(toks) >= 0.8
    AND len(list_intersect(list_distinct(toks),
        ['the','a','an','and','or','of','to','in','is','it'])) >= 2
),
reps AS (SELECT MIN(doc_id) AS doc_id, t FROM fl GROUP BY t),
strat AS (SELECT r.doc_id, r.t, d.lang FROM reps r JOIN documents d ON d.doc_id = r.doc_id),
samp AS (
  SELECT doc_id, t FROM strat
  WHERE {_pph("doc_id", "42")} % 1000000 <
    (CASE lang WHEN 'en' THEN 0.8 WHEN 'de' THEN 0.5 WHEN 'es' THEN 1.0
          WHEN 'fr' THEN 0.25 WHEN 'zh' THEN 0.5 ELSE 0.0 END) * 1000000
),
sized AS (
  SELECT doc_id, {_pph("doc_id", "42")} % 8 AS bucket,
         len(string_split(t, ' ')) AS n_tokens
  FROM samp
),
off AS (
  SELECT doc_id, bucket, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM sized
)
SELECT doc_id, bucket, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(FLOOR(start_offset / 50) AS BIGINT) AS start_seq,
       CAST(FLOOR((start_offset + greatest(n_tokens, 1) - 1) / 50) AS BIGINT) AS end_seq
FROM off
"""

    sql["corpus_card_rollup"] = """
SELECT COALESCE(lang, '<all>') AS lang, COALESCE(source, '<all>') AS source,
       count(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       ROUND(AVG(length(text)), 6) AS avg_chars
FROM documents GROUP BY CUBE (lang, source)
"""

    sql["source_graph"] = f"""
WITH {EDGES_CTE},
lab AS (SELECT doc_id AS id, source AS label FROM documents)
SELECT ls.label AS src_source, ld.label AS dst_source,
       ROUND(SUM(e.weight), 6) AS weight
FROM edges e JOIN lab ls ON ls.id = e.src JOIN lab ld ON ld.id = e.dst
GROUP BY ls.label, ld.label
"""

    sql["doc_gopher_flags"] = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks, length(text) AS n_chars
  FROM documents
),
m AS (
  SELECT doc_id, len(toks) AS n_words,
    CASE WHEN len(toks) > 0
         THEN CAST(n_chars - (len(toks) - 1) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS mean_word_len,
    CASE WHEN len(toks) > 0
         THEN CAST(len(regexp_extract_all(text, '#'))
                   + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS symbol_ratio,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
              / len(toks)
         ELSE 0.0 END AS alpha_word_frac,
    len(list_intersect(list_distinct(toks),
        ['the','a','an','and','or','of','to','in','is','it'])) AS n_stop_distinct
  FROM t
)
SELECT doc_id, n_words, ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(symbol_ratio, 6) AS symbol_ratio,
       ROUND(alpha_word_frac, 6) AS alpha_word_frac, n_stop_distinct,
       CAST(n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
            AND n_stop_distinct >= 2 AS BIGINT) AS passes
FROM m
"""

    sql["doc_repetition"] = """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks,
                   string_split(text, chr(10)) AS lines FROM documents),
g2 AS (SELECT doc_id, count(*) AS n,
              count(DISTINCT array_to_string(toks[i:i+1], ' ')) AS d
       FROM tk, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS u(i)
       GROUP BY doc_id),
g3 AS (SELECT doc_id, count(*) AS n,
              count(DISTINCT array_to_string(toks[i:i+2], ' ')) AS d
       FROM tk, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
       GROUP BY doc_id),
ln AS (SELECT doc_id, CASE WHEN len(lines) > 0
              THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
              ELSE 0.0 END AS dup_line_frac FROM tk)
SELECT d.doc_id, ROUND(ln.dup_line_frac, 6) AS dup_line_frac,
       ROUND(COALESCE(1.0 - CAST(g2.d AS DOUBLE) / g2.n, 0.0), 6) AS dup_2gram_frac,
       ROUND(COALESCE(1.0 - CAST(g3.d AS DOUBLE) / g3.n, 0.0), 6) AS dup_3gram_frac
FROM documents d JOIN ln ON ln.doc_id = d.doc_id
LEFT JOIN g2 ON g2.doc_id = d.doc_id LEFT JOIN g3 ON g3.doc_id = d.doc_id
"""

    # duplicate-span dedup (Lee et al. 2021 shape): k=8-token windows,
    # duplicated = identical window in >= 2 distinct docs. DuckDB slices
    # are 1-based inclusive: toks[i:i+7] is the 8-token window at i.
    sql["doc_dup_spans"] = """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+7], ' ') AS gram
      FROM tk, UNNEST(generate_series(1, greatest(len(toks) - 7, 0))) AS u(i)),
d AS (SELECT gram FROM w GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
per AS (SELECT w.doc_id, count(*) AS n_dup_windows
        FROM w JOIN d USING (gram) GROUP BY w.doc_id),
nw AS (SELECT doc_id, greatest(len(toks) - 7, 0) AS n_windows FROM tk)
SELECT nw.doc_id, CAST(nw.n_windows AS BIGINT) AS n_windows,
       CAST(COALESCE(per.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       ROUND(CASE WHEN nw.n_windows > 0
             THEN CAST(COALESCE(per.n_dup_windows, 0) AS DOUBLE) / nw.n_windows
             ELSE 0.0 END, 6) AS dup_frac
FROM nw LEFT JOIN per ON per.doc_id = nw.doc_id
"""

    sql["doc_despan"] = """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+7], ' ') AS gram
      FROM tk, UNNEST(generate_series(1, greatest(len(toks) - 7, 0))) AS u(i)),
d AS (SELECT gram FROM w GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
covered AS (SELECT DISTINCT w.doc_id, u2.ti
            FROM w JOIN d USING (gram),
                 UNNEST(generate_series(w.pos, w.pos + 7)) AS u2(ti)),
tok AS (SELECT doc_id, i AS ti, toks[i] AS tok
        FROM tk, UNNEST(generate_series(1, len(toks))) AS u(i)),
kept AS (SELECT t.doc_id, t.ti, t.tok FROM tok t
         LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.ti = t.ti
         WHERE c.ti IS NULL)
SELECT doc.doc_id,
       COALESCE(string_agg(k.tok, ' ' ORDER BY k.ti), '') AS text_clean
FROM documents doc LEFT JOIN kept k ON k.doc_id = doc.doc_id
GROUP BY doc.doc_id
"""

    # corpus-level line dedup: docs re-lined into 5-token lines, then every
    # line appearing in >= 2 distinct docs removed; reassembly keeps order
    sql["doc_dedup_lines"] = """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ln AS (SELECT doc_id, i AS pos,
              trim(array_to_string(toks[(i-1)*5+1:(i-1)*5+5], ' ')) AS line
       FROM tk, UNNEST(generate_series(
              1, CAST(ceil(len(toks) / 5.0) AS BIGINT))) AS u(i)),
d AS (SELECT line FROM ln WHERE length(line) >= 1
      GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
flags AS (SELECT ln.doc_id, ln.pos, ln.line,
                 CASE WHEN d.line IS NOT NULL AND length(ln.line) >= 1
                      THEN 1 ELSE 0 END AS dup
          FROM ln LEFT JOIN d ON d.line = ln.line),
agg AS (SELECT doc_id,
               COALESCE(string_agg(CASE WHEN dup = 0 THEN line END,
                                   chr(10) ORDER BY pos), '') AS text_clean,
               count(*) AS n_lines, SUM(dup) AS n_dup_lines
        FROM flags GROUP BY doc_id)
SELECT doc.doc_id, COALESCE(a.text_clean, '') AS text_clean,
       CAST(COALESCE(a.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(a.n_dup_lines, 0) AS BIGINT) AS n_dup_lines
FROM documents doc LEFT JOIN agg a ON a.doc_id = doc.doc_id
"""

    # full training replay of the hashed-feature logistic quality
    # classifier: 2 batch-GD iterations from w=0,b=0 (so iteration 1's
    # prediction is exactly 0.5 everywhere), lr=10, portable md5 feature
    # hashing, labels y = (lang='en'); final score under (w2, b2)
    from linkgraph.portable import phash_sql as _pqc

    _qc_feat = _pqc("token")
    sql["doc_quality_classifier"] = f"""
WITH tk AS (SELECT doc_id, t.tok AS token
            FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(tok)
            WHERE t.tok <> ''),
fr AS (SELECT doc_id, {_qc_feat} % 4096 AS feature, count(*) AS tf
       FROM tk GROUP BY doc_id, feature),
dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
fx AS (SELECT fr.doc_id, fr.feature, fr.tf * 1.0 / dl.dl AS x
       FROM fr JOIN dl USING (doc_id)),
lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM documents),
nn AS (SELECT count(*) * 1.0 AS n FROM lab),
r1 AS (SELECT doc_id, 0.5 - y AS r FROM lab),
w1 AS (SELECT feature, -10.0 * SUM(fx.x * r1.r) / (SELECT n FROM nn) AS w
       FROM fx JOIN r1 USING (doc_id) GROUP BY feature),
b1 AS (SELECT -10.0 * AVG(r) AS b FROM r1),
m2 AS (SELECT fx.doc_id, SUM(fx.x * w1.w) AS mw
       FROM fx JOIN w1 USING (feature) GROUP BY fx.doc_id),
r2 AS (SELECT lab.doc_id,
              1.0 / (1.0 + exp(-(COALESCE(m2.mw, 0.0) + (SELECT b FROM b1))))
                - lab.y AS r
       FROM lab LEFT JOIN m2 USING (doc_id)),
w2 AS (SELECT w1.feature,
              w1.w - 10.0 * COALESCE(g2.g, 0.0) AS w
       FROM w1 LEFT JOIN (
            SELECT feature, SUM(fx.x * r2.r) / (SELECT n FROM nn) AS g
            FROM fx JOIN r2 USING (doc_id) GROUP BY feature) g2
            USING (feature)),
b2 AS (SELECT (SELECT b FROM b1) - 10.0 * AVG(r) AS b FROM r2),
mf AS (SELECT fx.doc_id, SUM(fx.x * w2.w) AS mw
       FROM fx JOIN w2 USING (feature) GROUP BY fx.doc_id)
SELECT d.doc_id,
       round(1.0 / (1.0 + exp(-(COALESCE(mf.mw, 0.0) + (SELECT b FROM b2)))),
             6) AS prob
FROM documents d LEFT JOIN mf USING (doc_id)
"""

    # DSIR replay: hashed-unigram multinomial LMs (add-1 smoothing over
    # 4096 buckets) for the lang='en' target slice vs the whole corpus,
    # per-doc log likelihood-ratio sum; the sample entry adds portable
    # hash-derived Gumbel noise and takes the top 20 keys
    _dsir_b = _pqc("token")
    _dsir_body = f"""
WITH tk AS (SELECT doc_id, t.tok AS token
            FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(tok)
            WHERE t.tok <> ''),
db AS (SELECT doc_id, {_dsir_b} % 4096 AS bucket, count(*) AS cnt
       FROM tk GROUP BY doc_id, bucket),
slm AS (SELECT bucket, SUM(cnt) AS sc FROM db GROUP BY bucket),
tlm AS (SELECT db.bucket, SUM(db.cnt) AS tc
        FROM db JOIN documents d ON d.doc_id = db.doc_id AND d.lang = 'en'
        GROUP BY db.bucket),
ns AS (SELECT SUM(cnt) * 1.0 AS n FROM db),
nt AS (SELECT SUM(db.cnt) * 1.0 AS n
       FROM db JOIN documents d ON d.doc_id = db.doc_id AND d.lang = 'en'),
lm AS (SELECT slm.bucket,
              ln((COALESCE(tlm.tc, 0) + 1.0) / ((SELECT n FROM nt) + 4096))
            - ln((slm.sc + 1.0) / ((SELECT n FROM ns) + 4096)) AS llr
       FROM slm LEFT JOIN tlm USING (bucket)),
pd AS (SELECT db.doc_id, SUM(db.cnt * lm.llr) AS logw
       FROM db JOIN lm USING (bucket) GROUP BY db.doc_id),
lw AS (SELECT d.doc_id, COALESCE(pd.logw, 0.0) AS logw
       FROM documents d LEFT JOIN pd USING (doc_id))
"""
    sql["doc_dsir_weights"] = _dsir_body + "SELECT doc_id, round(logw, 6) AS logw FROM lw"
    _gu = _pqc("7", "doc_id")
    sql["doc_dsir_sample"] = _dsir_body + f"""
SELECT doc_id, round(logw, 6) AS logw FROM (
  SELECT doc_id, logw,
         logw - ln(-ln((({_gu}) % 1048576 + 0.5) / 1048576.0)) AS gk
  FROM lw ORDER BY gk DESC, doc_id LIMIT 20)
"""

    # BPE round-1 pair counts: freq-weighted adjacent character pairs of
    # the distinct-word table (substr is character-based in DuckDB, like
    # Spark's split-on-empty for BMP text)
    sql["bpe_pair_counts"] = """
WITH w AS (SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word),
p AS (SELECT word, freq, i
      FROM w, UNNEST(generate_series(1, greatest(length(word) - 1, 0))) AS u(i))
SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b,
       CAST(SUM(freq) AS BIGINT) AS cnt
FROM p GROUP BY 1, 2
"""

    # CCNet-shaped quality score: mean unigram cross-entropy under the
    # corpus's own unigram LM (two aggregations + one join, replayed here)
    sql["doc_unigram_logloss"] = """
WITH tok AS (SELECT doc_id, t.word AS token FROM documents,
             UNNEST(string_split(lower(text), ' ')) AS t(word)
             WHERE t.word <> ''),
lm AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok),
per AS (SELECT tok.doc_id, count(*) AS n_tokens,
               avg(-ln(CAST(lm.cnt AS DOUBLE) / n.total)) AS logloss
        FROM tok JOIN lm USING (token), n GROUP BY tok.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       ROUND(COALESCE(per.logloss, 0.0), 6) AS logloss
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""

    sql["doc_perplexity_buckets"] = """
WITH tok AS (SELECT doc_id, t.word AS token FROM documents,
             UNNEST(string_split(lower(text), ' ')) AS t(word)
             WHERE t.word <> ''),
lm AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok),
per AS (SELECT tok.doc_id, count(*) AS n_tokens,
               avg(-ln(CAST(lm.cnt AS DOUBLE) / n.total)) AS logloss
        FROM tok JOIN lm USING (token), n GROUP BY tok.doc_id),
sc AS (SELECT d.doc_id,
              CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
              ROUND(COALESCE(per.logloss, 0.0), 6) AS logloss
       FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id)
SELECT doc_id, n_tokens, logloss,
       CASE WHEN n_tokens = 0 THEN 'tail'
            WHEN logloss < 3.40 THEN 'head'
            WHEN logloss < 3.41 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sc
"""

    sql["doc_stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE {_pph("doc_id", "42")} % 1000000 <
      (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0
            WHEN 'zh' THEN 0.25 ELSE 0.0 END) * 1000000
"""

    sql["dup_groups_best"] = f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0),
grp AS (SELECT text, MIN(doc_id) AS group_id FROM aug
        GROUP BY text HAVING count(*) > 1),
mem AS (SELECT g.group_id, k.doc_id,
               {_pph("k.doc_id", "7")} % 1000 AS p
        FROM aug k JOIN grp g ON g.text = k.text),
rk AS (SELECT group_id, doc_id,
              ROW_NUMBER() OVER (PARTITION BY group_id
                                 ORDER BY p DESC, doc_id ASC) AS rn
       FROM mem)
SELECT doc_id, group_id, CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS keep
FROM rk
"""

    sql["doc_source_quota"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {_pph("doc_id", "42")} ASC, doc_id ASC) AS rn
  FROM documents) t
WHERE rn <= 20
"""

    sql["doc_snapshot_diff"] = """
WITH o AS (
  SELECT doc_id AS key, MIN(sha256(COALESCE(text, ''))) AS old_digest
  FROM documents WHERE doc_id % 3 <> 0 GROUP BY doc_id),
n AS (
  SELECT doc_id AS key,
         MIN(sha256(COALESCE(
           CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END, '')))
           AS new_digest
  FROM documents WHERE doc_id % 2 = 0 GROUP BY doc_id)
SELECT COALESCE(o.key, n.key) AS key,
       CASE WHEN o.key IS NULL THEN 'added'
            WHEN n.key IS NULL THEN 'removed'
            WHEN old_digest = new_digest THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_digest, new_digest
FROM o FULL OUTER JOIN n ON n.key = o.key
"""

    # argmax parity with array_max(struct(score, lang)): max score, then
    # lexicographically LARGEST language name on ties
    lang_rows = []
    from linkgraph.text.quality import LANG_MARKERS

    for lang, markers in sorted(LANG_MARKERS.items()):
        inlist = ",".join(f"'{m}'" for m in markers)
        lang_rows.append(
            f"SELECT doc_id, '{lang}' AS lang_pred, "
            f"len(list_filter(toks, x -> x IN ({inlist}))) AS s FROM t"
        )
    sql["doc_lang_id"] = (
        "WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),\n"
        "s AS (" + " UNION ALL ".join(lang_rows) + ")\n"
        "SELECT doc_id, lang_pred FROM (\n"
        "  SELECT doc_id, lang_pred,\n"
        "         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, lang_pred DESC) AS rn\n"
        "  FROM s) WHERE rn = 1"
    )

    sql["events_top_value_per_user"] = """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""

    sql["events_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, count(*) AS n
FROM events GROUP BY 1
"""

    sql["events_type_stats"] = """
SELECT event_type, count(*) AS n, ROUND(SUM(value), 3) AS sum_value,
       ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY event_type
"""

    sql["embed_cosine_top5"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, ROUND(cos, 4) AS cos FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
"""

    # --- round-2 additions: unrolled / portable-hash / independent oracles
    import gate_sql as G

    sql["doc_lang_nb"] = G.langid_nb_sql(n=3, vocab_size=500, alpha=1.0, holdout_mod=5)
    sql["doc_plp"] = G.plp_sql(EDGES_CTE_MAT, iters=30)
    sql["doc_kcore"] = G.kcore_sql(EDGES_CTE_MAT, iters=10)
    sql["doc_luby_mis"] = G.luby_sql(EDGES_CTE_MAT, rounds=8, seed=42)
    sql["doc_seeded_lp"] = G.seeded_lp_sql(EDGES_CTE_MAT, rounds=12, mod=50, nlab=3)
    sql["doc_unigram_pieces"] = G.unigram_sql(mod=10, top_multi=60, max_wlen=12)
    sql["doc_wordpiece_pieces"] = G.wordpiece_sql(mod=10, top_multi=60, max_wlen=12)
    sql["doc_adjacency"] = f"""
WITH {EDGES_CTE_MAT},
e2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
r AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rr
  FROM e2)
SELECT src, CAST(rr // 8 AS INT) AS chunk,
       CAST(COUNT(*) AS BIGINT) AS n,
       string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS neighbors
FROM r GROUP BY src, CAST(rr // 8 AS INT)
"""

    sql["doc_nfc"] = """
SELECT doc_id, nfc_normalize(text || ' cafe' || chr(769)) AS text_norm
FROM documents
"""

    sql["doc_sentences"] = """
WITH marked AS (
  SELECT doc_id,
         string_split(
           regexp_replace(text, '([.!?…])\\s+', '\\1' || chr(30), 'g'),
           chr(30)) AS sents
  FROM documents)
SELECT doc_id, CAST(g.i - 1 AS INT) AS sent_id, sents[g.i] AS sentence
FROM marked, unnest(generate_series(1, len(sents))) AS g(i)
WHERE length(trim(sents[g.i])) >= 1
"""

    from linkgraph.text.quality import SCRIPT_RANGES as _SR

    _sr_counts = ",\n  ".join(
        f"len(regexp_extract_all(text, '[{rng}]')) AS c_{name}"
        for name, rng in sorted(_SR.items())
    )
    _sr_structs = ", ".join(
        f"{{'c': c_{name}, 's': '{name}'}}" for name in sorted(_SR)
    )
    _sr_fracs = ",\n  ".join(
        f"ROUND(c_{name} / GREATEST(n, 1), 6) AS {name}_frac"
        for name in sorted(_SR)
    )
    sql["doc_scripts"] = f"""
WITH c AS (
  SELECT doc_id, length(text) AS n,
  {_sr_counts}
  FROM documents),
b AS (SELECT *, list_aggregate([{_sr_structs}], 'max') AS best FROM c)
SELECT doc_id,
  CASE WHEN best.c > 0 THEN best.s ELSE 'none' END AS dominant,
  {_sr_fracs}
FROM b
"""

    sql["doc_mojibake"] = (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, '�')) AS INT) AS n_replacement,\n"
        "  ROUND(len(regexp_extract_all(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]'))"
        " / GREATEST(length(text), 1), 6) AS control_frac,\n"
        "  CAST(CASE WHEN len(regexp_extract_all(text, '�')) = 0 AND\n"
        "    len(regexp_extract_all(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]'))"
        " / GREATEST(length(text), 1) < 0.001 THEN 1 ELSE 0 END AS INT) AS clean\n"
        "FROM documents"
    )

    sql["doc_quantiles"] = """
WITH s AS (SELECT n_chars AS v,
                  ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS pos
           FROM documents WHERE n_chars IS NOT NULL),
nn AS (SELECT COUNT(*) AS n FROM s),
t(q) AS (VALUES (0.0), (0.25), (0.5), (0.75), (1.0))
SELECT t.q, s.v AS value
FROM t CROSS JOIN nn JOIN s ON s.pos = CAST(FLOOR(t.q * (nn.n - 1)) AS BIGINT)
"""

    sql["doc_lang_quantiles"] = """
WITH b AS (SELECT lang AS g, n_chars AS v FROM documents
           WHERE n_chars IS NOT NULL),
r AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) - 1 AS rr
      FROM b),
c AS (SELECT g, COUNT(*) AS n FROM b GROUP BY g),
t(q) AS (VALUES (0.25), (0.5), (0.75))
SELECT r.g AS lang, t.q, r.v AS value
FROM r JOIN c USING (g) CROSS JOIN t
WHERE r.rr = CAST(FLOOR(t.q * (c.n - 1)) AS BIGINT)
"""

    sql["doc_shard_plan"] = f"""
WITH {EDGES_CTE_MAT},
lab AS MATERIALIZED (SELECT id, id % 24 AS label FROM nodes),
sizes AS MATERIALIZED (SELECT label, count(*) AS n FROM lab GROUP BY label),
ranked AS MATERIALIZED (
  SELECT label, ROW_NUMBER() OVER (ORDER BY n DESC, label ASC) AS rk
  FROM sizes),
heads AS MATERIALIZED (
  SELECT label, CAST((rk - 1) % 4 AS INT) AS shard FROM ranked WHERE rk <= 8)
SELECT label, shard FROM heads
UNION ALL
SELECT s.label, CAST({_pph("s.label", "42")} % 4 AS INT) AS shard
FROM sizes s WHERE s.label NOT IN (SELECT label FROM heads)
"""

    sql["doc_surt_keys"] = """
WITH u AS (
  SELECT doc_id,
         lower('http://www.' || source || '.Example.com:80/Doc/' ||
               CAST(doc_id AS VARCHAR) || '?lang=' || lang) AS lu
  FROM documents),
p AS (
  SELECT doc_id,
         regexp_replace(lu, '^https?://', '') AS rest
  FROM u),
hp AS (
  SELECT doc_id, rest,
         regexp_extract(rest, '^([^/]*)', 1) AS hostport
  FROM p),
h AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''), '^www\\.', '')
           AS host,
         substr(rest, length(hostport) + 1) AS path
  FROM hp)
SELECT doc_id,
       array_to_string(list_reverse(string_split(host, '.')), ',') || ')' ||
       CASE WHEN path = '' THEN '/' ELSE path END AS surt
FROM h
"""

    sql["doc_fm_distinct"] = f"""
WITH regs AS (SELECT unnest(generate_series(0, 7)) AS r),
hv AS (SELECT d.lang, rg.r, {_pph("d.doc_id", "rg.r")} AS h
       FROM documents d, regs rg),
bits AS (SELECT lang, r,
                (CAST(1 AS BIGINT) << LEAST(bit_count((h & -h) - 1), 62)) AS b
         FROM hv),
sk AS (SELECT lang, r, bit_or(b) AS bits FROM bits GROUP BY lang, r)
SELECT lang,
       ROUND(POWER(2.0, AVG(CAST(bit_count(((bits + 1) & ~bits) - 1) AS DOUBLE)))
             / 0.77351, 6) AS est
FROM sk GROUP BY lang
"""

    sql["doc_cms_counts"] = f"""
WITH dd AS (SELECT unnest(generate_series(0, 3)) AS d),
cnts AS (SELECT dd.d, {_pph("doc.lang", "dd.d")} % 64 AS cell, count(*) AS c
         FROM documents doc, dd GROUP BY dd.d, cell),
q AS (SELECT DISTINCT lang FROM documents),
probes AS (SELECT q.lang, dd.d, {_pph("q.lang", "dd.d")} % 64 AS cell FROM q, dd)
SELECT p.lang, MIN(COALESCE(c.c, 0)) AS est
FROM probes p LEFT JOIN cnts c ON c.d = p.d AND c.cell = p.cell
GROUP BY p.lang
"""

    sql["doc_neighbor_sample"] = f"""
WITH {EDGES_CTE_MAT},
symn AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym WHERE src <> dst),
nf0 AS MATERIALIZED (SELECT id AS src FROM nodes WHERE id % 50 = 0),
nl1 AS MATERIALIZED (SELECT 1 AS hop, src, dst FROM (
  SELECT e.src, e.dst,
         ROW_NUMBER() OVER (PARTITION BY e.src
           ORDER BY {_pph("e.src", "e.dst", "42", "1")} ASC, e.dst ASC) AS rn
  FROM symn e JOIN nf0 f ON f.src = e.src) t WHERE rn <= 3),
nf1 AS MATERIALIZED (SELECT DISTINCT dst AS src FROM nl1),
nl2 AS MATERIALIZED (SELECT 2 AS hop, src, dst FROM (
  SELECT e.src, e.dst,
         ROW_NUMBER() OVER (PARTITION BY e.src
           ORDER BY {_pph("e.src", "e.dst", "42", "2")} ASC, e.dst ASC) AS rn
  FROM symn e JOIN nf1 f ON f.src = e.src) t WHERE rn <= 2)
SELECT hop, src, dst FROM nl1 UNION ALL SELECT hop, src, dst FROM nl2
"""
    sql["doc_eigenvector"] = G.eigenvector_sql(EDGES_CTE_MAT, iters=12)
    sql["doc_katz"] = G.katz_sql(EDGES_CTE_MAT, alpha=0.01, beta=1.0, iters=12)
    sql["doc_bfs"] = G.bfs_sql(EDGES_CTE_MAT, source=0, hops=12)
    sql["doc_bfs_path"] = G.bfs_path_sql(EDGES_CTE_MAT, source=0, hops=12)
    sql["doc_reachable_counts"] = G.reachable_counts_sql(EDGES_CTE_MAT, mod=60, keep=3)
    sql["doc_simple_paths"] = G.simple_paths_sql(
        EDGES_CTE_MAT, mod=24, keep=8, source=1, target=17, cutoff=5
    )
    sql["doc_scd_truth"] = G.scd_truth_sql(EDGES_CTE_MAT, mod=24, keep=8, seeds=(1, 2, 5))
    sql["doc_sssp"] = G.sssp_sql(EDGES_CTE_MAT, source=0, rounds=16)
    sql["algebraic_sssp"] = G.sssp_sql(EDGES_CTE_MAT, source=0, rounds=16)
    sql["doc_sfigality"] = G.sfigality_sql(EDGES_CTE_MAT)
    sql["doc_laplacian"] = G.laplacian_sql(EDGES_CTE_MAT)
    sql["doc_betweenness_exact"] = G.betweenness_sql(EDGES_CTE_MAT, hops=12)
    sql["doc_betweenness"] = G.betweenness_sql(
        EDGES_CTE_MAT, hops=12, n_samples=24, seed=42
    )
    sql["doc_local_similarity"] = G.local_similarity_sql(EDGES_CTE_MAT)
    sql["doc_scan_similarity"] = G.scan_similarity_sql(EDGES_CTE_MAT)
    sql["doc_multiscale"] = G.multiscale_sql(EDGES_CTE_MAT)
    sql["doc_local_coverage"] = G.local_coverage_sql(EDGES_CTE_MAT)
    sql["doc_permanence"] = G.permanence_sql(EDGES_CTE_MAT)
    sql["doc_attr_assort"] = G.attr_assort_sql(EDGES_CTE_MAT)
    sql["partition_measures"] = G.partition_measures_sql(EDGES_CTE_MAT)
    sql["doc_top_closeness"] = (
        "SELECT * FROM ("
        + G.closeness_sql(EDGES_CTE_MAT, harmonic=False, hops=12)
        + ") z ORDER BY score DESC, id ASC LIMIT 10"
    )
    sql["doc_closeness"] = G.closeness_sql(EDGES_CTE_MAT, harmonic=False, hops=12)
    sql["doc_harmonic"] = G.closeness_sql(EDGES_CTE_MAT, harmonic=True, hops=12)
    sql["doc_eccentricity"] = G.eccentricity_sql(EDGES_CTE_MAT, hops=12)
    sql["doc_diameter"] = G.diameter_sql(EDGES_CTE_MAT, hops=12)
    sql["doc_scc"] = G.scc_sql(EDGES_CTE_MAT)
    sql["doc_spanning_stats"] = G.spanning_stats_sql(EDGES_CTE_MAT)
    sql["doc_neighborhood_2hop"] = G.anf_sql(EDGES_CTE_MAT, hops=2, registers=8)
    sql["minhash_dups"] = G.minhash_pairs_sql(64, 16, 0.7)
    sql["minhash_dup_groups"] = G.minhash_groups_sql(64, 16, 0.7)
    sql["simhash_dups"] = G.simhash_sql(max_hamming=3)
    sql["extraction_edges"] = G.extraction_edges_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet"
    )
    sql["page_content"] = G.page_content_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet"
    )
    sql["doc_host_edges"] = G.host_edges_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet"
    )
    sql["doc_host_stats"] = G.host_stats_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet"
    )
    sql["doc_host_rank"] = _pagerank_unrolled_sql(
        15, 0.85,
        cte=G.host_graph_cte("/root/repo/tests/fixtures/gate_pages/*.parquet"),
        id_name="host",
    )
    sql["anchor_text"] = G.anchor_text_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet"
    )
    sql["url_canonical"] = G.url_canonical_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet"
    )
    sql["robots_admission"] = G.robots_admission_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet"
    )
    sql["sitemap_locs"] = G.sitemap_locs_sql()
    sql["warc_pages"] = G.warc_pages_sql(
        "/root/repo/tests/fixtures/gate_warc/pages.warc"
    )
    sql["pipeline_edges"] = G.extraction_edges_url_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet"
    )
    sql["events_rollup"] = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n, ROUND(SUM(value), 3) AS sum_value
FROM events GROUP BY ROLLUP(event_type, day)
"""

    sql["events_stream_replay"] = """
WITH d AS (
  SELECT CASE WHEN event_type = 'error' THEN 'remove_edge'
              WHEN event_type = 'purchase' THEN 'update_weight'
              ELSE 'add_edge' END AS op,
         user_id AS src,
         (event_id * 7 + 3) % 200 AS dst,
         value AS weight, ts
  FROM events
),
last AS (
  SELECT * FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY src, dst ORDER BY ts DESC, op DESC) AS rn
    FROM d
  ) z WHERE rn = 1
)
SELECT src, dst, ROUND(weight, 6) AS weight FROM last WHERE op <> 'remove_edge'
"""

    sql["doc_hub_dominance"] = G.hub_dominance_sql(EDGES_CTE_MAT)
    sql["doc_conductance"] = G.conductance_sql(EDGES_CTE_MAT)
    sql["doc_stable_nodes"] = G.stable_nodes_sql(EDGES_CTE_MAT)
    sql["doc_fragmentation"] = G.fragmentation_sql(EDGES_CTE_MAT)
    sql["doc_total_neighbors"] = G.total_neighbors_sql(EDGES_CTE_MAT)
    sql["doc_neighborhood_distance"] = G.neighborhood_distance_sql(EDGES_CTE_MAT)
    sql["doc_katz_index"] = G.katz_index_sql(EDGES_CTE_MAT, beta=0.005, max_length=3)
    sql["doc_prefix_jaccard"] = G.prefix_jaccard_sql(EDGES_CTE_MAT, k=5)
    sql["doc_simmelian"] = G.simmelian_sql(EDGES_CTE_MAT, max_rank=10)
    sql["doc_topo_levels"] = G.topo_levels_sql(EDGES_CTE_MAT)
    sql["doc_clique_hist"] = G.clique_hist_sql(EDGES_CTE_MAT)
    sql["doc_group_degree"] = G.group_degree_sql(EDGES_CTE_MAT, k=3)
    sql["doc_group_closeness"] = G.group_closeness_sql(EDGES_CTE_MAT, k=3, hops=12)
    sql["doc_group_harmonic"] = G.group_harmonic_sql(EDGES_CTE_MAT, k=3, hops=12)
    # 3-truss peel unroll: support = common-neighbor count over the
    # surviving half-edge set; an edge with no support row simply drops
    # (inner join), matching coalesce(sup,0) < 1 in the engine
    _tparts = [
        "t0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS w FROM sym WHERE src <> dst)"
    ]
    for _i in range(1, 9):
        _p = _i - 1
        _tparts.append(
            f"a{_i} AS MATERIALIZED (SELECT u, w FROM t{_p} "
            f"UNION ALL SELECT w AS u, u AS w FROM t{_p})"
        )
        _tparts.append(
            f"s{_i} AS MATERIALIZED (SELECT t.u, t.w, count(*) AS sup "
            f"FROM t{_p} t JOIN a{_i} x ON x.u = t.u AND x.w <> t.w "
            f"JOIN a{_i} y ON y.u = t.w AND y.w = x.w GROUP BY t.u, t.w)"
        )
        _tparts.append(
            f"t{_i} AS MATERIALIZED (SELECT t.u, t.w FROM t{_p} t "
            f"JOIN s{_i} s ON s.u = t.u AND s.w = t.w WHERE s.sup >= 1)"
        )
    sql["doc_ktruss"] = (
        f"WITH {EDGES_CTE_MAT},\n"
        + ",\n".join(_tparts)
        + "\nSELECT u AS src, w AS dst FROM t8"
    )
    sql["doc_simrank"] = G.simrank_sql(EDGES_CTE_MAT, c=0.8, iters=3)
    sql["doc_rich_club"] = f"""
WITH {EDGES_CTE_MAT},
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src),
canon AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges),
em AS MATERIALIZED (
  SELECT LEAST(da.degree, db.degree) AS m
  FROM canon JOIN deg da ON da.id = canon.u JOIN deg db ON db.id = canon.v),
dh AS (SELECT degree AS k, COUNT(*) AS nd FROM deg GROUP BY degree),
eh AS (SELECT m AS k, COUNT(*) AS ne FROM em GROUP BY m),
hist AS (
  SELECT COALESCE(dh.k, eh.k) AS k, COALESCE(nd, 0) AS nd, COALESCE(ne, 0) AS ne
  FROM dh FULL JOIN eh ON dh.k = eh.k),
cum AS (
  SELECT k,
    COALESCE(SUM(nd) OVER (ORDER BY k ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS n_nodes,
    COALESCE(SUM(ne) OVER (ORDER BY k ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS n_edges
  FROM hist)
SELECT k, CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
       ROUND(2.0 * n_edges / (n_nodes * (n_nodes - 1)), 6) AS phi
FROM cum WHERE n_nodes >= 2
"""
    sql["doc_knn"] = f"""
WITH {EDGES_CTE_MAT},
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS degree FROM sym GROUP BY src),
nb AS (
  SELECT s.src, AVG(dd.degree) AS knn_node
  FROM sym s JOIN deg dd ON dd.id = s.dst GROUP BY s.src)
SELECT dg.degree AS k, ROUND(AVG(nb.knn_node), 6) AS knn
FROM nb JOIN deg dg ON dg.id = nb.src GROUP BY dg.degree
"""
    sql["doc_square_clustering"] = G.square_clustering_sql(EDGES_CTE_MAT)
    sql["doc_nf_heuristic"] = G.nf_heuristic_sql(EDGES_CTE_MAT, hops=12)
    sql["doc_cover_f1"] = """
WITH d AS (SELECT doc_id AS id FROM documents),
a AS (SELECT id, id % 7 AS la FROM d),
b AS (SELECT id, id % 5 AS lb FROM d),
sa AS (SELECT la, count(*) AS na FROM a GROUP BY la),
sb AS (SELECT lb, count(*) AS nb FROM b GROUP BY lb),
ov AS (SELECT a.la, b.lb, count(*) AS o FROM a JOIN b USING (id)
       GROUP BY a.la, b.lb),
f1 AS (SELECT ov.la, 2.0 * ov.o / (sa.na + sb.nb) AS f1
       FROM ov JOIN sa USING (la) JOIN sb USING (lb))
SELECT sa.la AS label,
       ROUND(COALESCE(MAX(f1.f1), 0.0), 6) AS best_f1
FROM sa LEFT JOIN f1 ON f1.la = sa.la
GROUP BY sa.la
"""
    sql["doc_switch_degrees"] = G.degree_invariant_sql(EDGES_CTE_MAT)
    sql["doc_curveball_degrees"] = G.degree_invariant_sql(EDGES_CTE_MAT)
    sql["gen_ba_structure"] = G.ba_structure_sql(n=500, k=3, seed=42)
    sql["node2vec_walks"] = G.node2vec_walks_sql(
        EDGES_CTE_MAT, walk_length=5, seed=7
    )
    sql["doc_suitor_matching"] = G.suitor_sql(EDGES_CTE_MAT, rounds=24)
    sql["doc_pathgrow_matching"] = G.pathgrow_sql(EDGES_CTE_MAT, rounds=10)
    sql["doc_pll_dist"] = G.pll_dist_sql(EDGES_CTE_MAT, u_below=10, v_mod=50, hops=12)
    sql["doc_gedwalk"] = G.gedwalk_sql(EDGES_CTE_MAT, k=3, alpha=0.1, max_len=4, round_to=6)
    sql["doc_maxent_layout"] = G.maxent_sql(
        EDGES_CTE_MAT, iters=5, alpha=0.02, n_anchors=8, seed=7, round_to=6
    )
    sql["doc_ppr"] = G.ppr_sql(EDGES_CTE_MAT, seed_vertex=0, alpha=0.15, iters=25)
    sql["doc_louvain"] = G.louvain_sql(EDGES_CTE_MAT, gamma=1.0, rounds=6)
    sql["doc_leiden"] = G.leiden_sql(
        EDGES_CTE_MAT, gamma=1.0, rounds=4, refine_rounds=4
    )
    sql["doc_ego_cover"] = G.ego_cover_sql(
        EDGES_CTE_MAT, max_ego_degree=100, plp_iters=10
    )
    sql["doc_effective_resistance"] = G.effective_resistance_sql(
        EDGES_CTE_MAT, k=15, u=1, v=2, iters=400
    )
    sql["doc_nibble"] = G.nibble_sql(
        EDGES_CTE_MAT, seed_vertex=0, alpha=0.15, iters=25, round_rank=6
    )
    sql["embed_lsh_top5"] = G.lsh_topk_sql(n_planes=8, k=5, seed=42, dim=64)
    sql["embed_lsh_banded_top5"] = G.lsh_banded_topk_sql(
        n_planes=16, bands=8, k=5, seed=42, dim=64
    )
    sql["embed_near_dups"] = G.embed_near_dup_sql(
        threshold=0.9, n_planes=16, bands=8, seed=42, dim=64, n_clones=40
    )
    sql["embed_near_dup_groups"] = G.embed_near_dup_groups_sql(
        threshold=0.9, n_planes=16, bands=8, seed=42, dim=64, n_clones=40
    )
    sql["embed_ivf_top5"] = G.embed_ivf_sql(
        n_list=8, n_probe=3, k=5, seed=42, dim=64, q_max=10
    )
    sql["embed_pq_top5"] = G.embed_pq_sql(
        m=4, n_codes=8, k=5, shortlist_factor=4, seed=42, dim=64, q_max=10
    )
    sql["embed_semantic_dedup"] = G.semantic_dedup_sql(
        eps=0.05, n_list=8, seed=42, dim=64, n_clones=40
    )
    sql["url_filter"] = G.url_filter_sql(
        "/root/repo/tests/fixtures/gate_pages/*.parquet",
        blocked_hosts=("spam.example.net",),
    )

    from linkgraph.portable import phash_sql as _phs

    sql["doc_group_split"] = f"""
WITH grp AS (SELECT text, MIN(doc_id) AS group_id, count(*) AS n
             FROM documents GROUP BY text HAVING count(*) > 1),
j AS (SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN grp g ON g.text = d.text)
SELECT doc_id, group_id,
       CASE WHEN {_phs("group_id", "42")} % 1000000 < 100000
            THEN 'eval' ELSE 'train' END AS split
FROM j
"""

    sql["doc_weighted_sample"] = f"""
SELECT doc_id FROM documents
WHERE {_phs("doc_id", "42")} % 1000000 <
      LEAST(GREATEST(n_chars / 1000.0, 0.0), 1.0) * 1000000
"""

    sql["doc_c4_flags"] = r"""
WITH d AS (
  SELECT doc_id, text ||
    CASE WHEN doc_id % 5 = 0
         THEN chr(10) || 'Good one here. Good two here. Good three here.'
         ELSE '' END ||
    CASE WHEN doc_id % 7 = 0
         THEN chr(10) || 'lorem ipsum dolor sit.' ELSE '' END ||
    CASE WHEN doc_id % 11 = 0
         THEN chr(10) || 'var x = { y }.' ELSE '' END ||
    CASE WHEN doc_id % 13 = 0
         THEN chr(10) || 'Please enable javascript now.' ELSE '' END AS text
  FROM documents),
k AS (
  SELECT doc_id, text,
    list_filter(string_split(text, chr(10)),
      ln -> regexp_matches(ln, '[.!?"]\s*$')
            AND len(string_split_regex(trim(ln), '\s+')) >= 5
            AND NOT contains(lower(ln), 'javascript')) AS kept
  FROM d),
c AS (
  SELECT doc_id, text,
    COALESCE(array_to_string(kept, chr(10)), '') AS c4_text,
    len(kept) AS n_lines_kept
  FROM k),
s AS (
  SELECT doc_id, text, c4_text, n_lines_kept,
    len(list_filter(string_split_regex(c4_text, '[.!?]'), x -> trim(x) <> ''))
      AS n_sentences,
    CAST(contains(lower(text), 'lorem ipsum') AS INTEGER) AS has_lorem,
    CAST(contains(text, '{') AS INTEGER) AS has_brace
  FROM c)
SELECT doc_id, c4_text, n_lines_kept, n_sentences, has_lorem, has_brace,
  CAST((n_sentences >= 3 AND has_lorem = 0 AND has_brace = 0) AS INTEGER)
    AS c4_passes
FROM s
"""

    sql["vocab_top"] = """
WITH tk AS (SELECT LOWER(t.token) AS token
            FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
            WHERE t.token <> ''),
c AS (SELECT token, COUNT(*) AS "count" FROM tk GROUP BY token
      HAVING COUNT(*) >= 2)
SELECT token, "count", rank FROM (
  SELECT token, "count", ROW_NUMBER() OVER (
    ORDER BY "count" DESC, token ASC) AS rank FROM c) q
WHERE rank <= 100
"""
    sql["doc_seir_census"] = G.seir_sql(
        EDGES_CTE_MAT, zero=0, p_transmit=0.05, ticks=8, seed=42
    )

    sql["doc_min_cut"] = f"""
WITH {EDGES_CTE},
c AS (
  SELECT src % 12 AS s, dst % 12 AS d, SUM(weight) AS w
  FROM sym WHERE src % 12 <> dst % 12 GROUP BY src % 12, dst % 12
),
wd AS (SELECT s AS id, SUM(w) AS wd FROM c GROUP BY s)
SELECT 1 AS source, 2 AS sink,
       LEAST((SELECT wd FROM wd WHERE id = 1),
             (SELECT wd FROM wd WHERE id = 2)) AS mincut
"""

    sql["doc_articulation"] = f"""
WITH RECURSIVE {EDGES_CTE}, {SPARSE_CHAIN_CTE},
vs AS (SELECT DISTINCT src AS id FROM spg),
r(ex, id, label) AS (
  SELECT v.id, n.id, n.id FROM vs v JOIN vs n ON n.id <> v.id
  UNION
  SELECT r.ex, e.dst, r.label FROM r JOIN spg e ON e.src = r.id
  WHERE e.src <> r.ex AND e.dst <> r.ex AND r.label < e.dst
),
m AS (SELECT ex, id, MIN(label) AS lab FROM r GROUP BY ex, id)
SELECT spg.src AS id FROM spg JOIN m ON m.ex = spg.src AND m.id = spg.dst
GROUP BY spg.src HAVING COUNT(DISTINCT m.lab) > 1 ORDER BY id
"""

    import math as _math

    from linkgraph.portable import phash_sql as _ph

    _hn, _hk, _hg, _hs = 400, 6.0, 2.5, 2
    _ha = (_hg - 1.0) / 2.0
    _hR = 2.0 * _math.log(
        (2.0 * _ha * _ha * _hn) / (_math.pi * _hk * (_ha - 0.5) ** 2)
    )
    sql["gen_hyperbolic_structure"] = f"""
WITH pts AS (
  SELECT p.i AS id,
         ({_ph("p.i", str(_hs), "0")} / 1152921504606846976.0)
           * {repr(2.0 * _math.pi)} AS theta,
         (LN(x.x + SQRT(x.x * x.x - 1.0)) / {repr(_ha)}) AS r
  FROM range({_hn}) p(i),
       LATERAL (SELECT 1.0 + ({_ph("p.i", str(_hs), "1")}
                / 1152921504606846976.0)
                * {repr(_math.cosh(_ha * _hR) - 1.0)} AS x) x
),
pairs AS (
  SELECT u.id AS src, v.id AS dst
  FROM pts u JOIN pts v ON u.id < v.id
  WHERE ((EXP(u.r)+EXP(-u.r))/2.0) * ((EXP(v.r)+EXP(-v.r))/2.0)
      - ((EXP(u.r)-EXP(-u.r))/2.0) * ((EXP(v.r)-EXP(-v.r))/2.0)
        * COS(LEAST(ABS(u.theta - v.theta),
                    {repr(2.0 * _math.pi)} - ABS(u.theta - v.theta)))
      <= {repr(_math.cosh(_hR) + 1e-12)}
),
deg AS (
  SELECT id, COUNT(*) AS degree FROM (
    SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs
  ) e GROUP BY id
)
SELECT degree, COUNT(*) AS n FROM deg GROUP BY degree ORDER BY degree
"""

    # ClusteredRandomGraph: regenerate assignment + coins from the same
    # portable hash and emit the full edge set with planted labels
    _cn, _ck, _cpi, _cpo, _cs = 300, 4, 0.15, 0.01, 5
    sql["gen_clustered_structure"] = f"""
WITH lab AS (
  SELECT i AS id, {_ph("i", str(_cs), "'c'")} % {_ck} AS label
  FROM range({_cn}) t(i)
),
pairs AS (
  SELECT u.id AS src, v.id AS dst, u.label AS label_src, v.label AS label_dst
  FROM lab u JOIN lab v ON u.id < v.id
)
SELECT src, dst, label_src, label_dst FROM pairs
WHERE ({_ph("src", "dst", str(_cs), "'e'")} / 1152921504606846976.0)
    < (CASE WHEN label_src = label_dst THEN {_cpi!r} ELSE {_cpo!r} END)
"""

    # Mocnik: regenerate the portable point set, brute-force all pairs
    _mn, _mk, _ms = 250, 1.5, 7
    _mr = _mk * _mn ** (-1.0 / 2)
    sql["gen_mocnik_structure"] = f"""
WITH pts AS (
  SELECT i AS id,
         {_ph("i", str(_ms), "0")} / 1152921504606846976.0 AS x0,
         {_ph("i", str(_ms), "1")} / 1152921504606846976.0 AS x1
  FROM range({_mn}) t(i)
),
ed AS (
  SELECT u.id AS src FROM pts u JOIN pts v
  ON u.id <> v.id
  AND (u.x0 - v.x0) * (u.x0 - v.x0) + (u.x1 - v.x1) * (u.x1 - v.x1)
      < {_mr * _mr!r}
),
deg AS (SELECT src, COUNT(*) AS degree FROM ed GROUP BY src)
SELECT degree, COUNT(*) AS n FROM deg GROUP BY degree ORDER BY degree
"""

    sql["doc_bridges"] = f"""
WITH RECURSIVE {EDGES_CTE}, {SPARSE_CHAIN_CTE},
ed AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM spg GROUP BY LEAST(src, dst), GREATEST(src, dst)),
r(ea, eb, id) AS (
  SELECT a, b, a FROM ed
  UNION
  SELECT r.ea, r.eb, e.dst FROM r JOIN spg e ON e.src = r.id
  WHERE NOT (LEAST(e.src, e.dst) = r.ea AND GREATEST(e.src, e.dst) = r.eb)
)
SELECT a AS src, b AS dst FROM ed
WHERE NOT EXISTS (
  SELECT 1 FROM r WHERE r.ea = ed.a AND r.eb = ed.b AND r.id = ed.b
)
ORDER BY src, dst
"""

    sql["doc_cut_singletons"] = f"""
WITH {EDGES_CTE}
SELECT id, id AS label FROM (
  SELECT DISTINCT src % 6 AS id FROM sym WHERE src % 6 <> dst % 6
) n
"""

    # Final pass: wrap every oracle whose Spark query rounds through _dec
    # in the matching DECIMAL round-trip LANDING AS DOUBLE, so both sides
    # hash identical float64 bits — see _dec's docstring for the rationale.
    for k, cols in _dec_columns().items():
        if k in sql:
            reps = ", ".join(
                f'CAST(CAST("{c}" AS DECIMAL(28,{s})) AS DOUBLE) AS "{c}"'
                for c, s in cols.items()
            )
            sql[k] = f"SELECT * REPLACE ({reps}) FROM (\n{sql[k]}\n) _decfin"
    return sql
