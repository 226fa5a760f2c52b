"""NetworKit-compatible Python API facade over the distributed engine.

A user of the reference (REF⚠ networkit/graph.py::Graph,
networkit/centrality.py::PageRank, networkit/community.py::PLM, …; the
reference checkout is empty this round, so anchors are public-API symbol
anchors) can point existing NetworKit-shaped scripts at this module and
run them unchanged: same class names, same run()/scores()/ranking()
accessor protocol, same Partition surface. Every algorithm delegates to
the engine's DataFrame implementation — the facade adds NO computation
of its own.

Scale contract (deliberate, documented): this facade mirrors NetworKit's
single-machine ergonomics — `scores()` / `ranking()` / `getPath()`
return driver-side Python lists, exactly like the reference. That is
the right shape for the interactive/fixture-scale workflows the
reference serves; a 100-TB pipeline should call the underlying
`linkgraph.algs.*` functions directly and keep results as DataFrames.
Graph mutation buffers edges driver-side until the first algorithm run
materializes a DataFrame (cached; invalidated on further mutation).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from linkgraph.graph import Graph as _EngineGraph

__all__ = [
    "Graph",
    "Partition",
    "PageRank",
    "DegreeCentrality",
    "Betweenness",
    "EstimateBetweenness",
    "Closeness",
    "HarmonicCloseness",
    "KatzCentrality",
    "EigenvectorCentrality",
    "CoreDecomposition",
    "LocalClusteringCoefficient",
    "PLP",
    "PLM",
    "ParallelLeiden",
    "Modularity",
    "detectCommunities",
    "ConnectedComponents",
    "StronglyConnectedComponents",
    "BFS",
    "Dijkstra",
    "Diameter",
    "ErdosRenyiGenerator",
    "BarabasiAlbertGenerator",
    "RmatGenerator",
    "Format",
    "readGraph",
    "writeGraph",
    "ApproxBetweenness",
    "TopCloseness",
    "attachNodeAttribute",
    "overview",
    # round-3 breadth expansion ------------------------------------------------
    "setSeed",
    "Cover",
    "KadabraBetweenness",
    "ApproxCloseness",
    "LaplacianCentrality",
    "Sfigality",
    "PermanenceCentrality",
    "SpanningEdgeCentrality",
    "GroupDegree",
    "GroupCloseness",
    "ApproxGroupBetweenness",
    "GedWalk",
    "TopHarmonicCloseness",
    "WeaklyConnectedComponents",
    "BiconnectedComponents",
    "LouvainMapEquation",
    "CutClustering",
    "EgoSplitting",
    "EdgeCut",
    "Coverage",
    "NMIDistance",
    "AdjustedRandMeasure",
    "JaccardMeasure",
    "NodeStructuralRandMeasure",
    "GraphStructuralRandMeasure",
    "ClusteringGenerator",
    "APSP",
    "SPSP",
    "Eccentricity",
    "EffectiveDiameterApproximation",
    "NeighborhoodFunctionApproximation",
    "HopPlotApproximation",
    "AlgebraicDistance",
    "CommuteTimeDistance",
    "CommonNeighborsIndex",
    "JaccardIndex",
    "AdamicAdarIndex",
    "ResourceAllocationIndex",
    "PreferentialAttachmentIndex",
    "TotalNeighborsIndex",
    "NeighborhoodDistanceIndex",
    "KatzIndex",
    "UDegreeIndex",
    "VDegreeIndex",
    "LocalDegreeSparsifier",
    "LocalSimilaritySparsifier",
    "SCANSparsifier",
    "MultiscaleSparsifier",
    "ForestFireSparsifier",
    "SimmelianSparsifierNonParametric",
    "RandomEdgeSparsifier",
    "GlobalThresholdFilter",
    "EdmondsKarp",
    "Matching",
    "SuitorMatcher",
    "BSuitorMatcher",
    "PathGrowingMatcher",
    "SpanningForest",
    "RandomMaximumSpanningForest",
    "MaximalCliques",
    "PageRankNibble",
    "GCE",
    "LFMLocal",
    "TCE",
    "LocalTightnessExpansion",
    "CombinedSCD",
    "RandomBFS",
    "Node2Vec",
    "EpidemicSimulationSEIR",
    "HyperbolicGenerator",
    "WattsStrogatzGenerator",
    "ChungLuGenerator",
    "ClusteredRandomGraphGenerator",
    "MocnikGenerator",
    "DorogovtsevMendesGenerator",
    "HavelHakimiGenerator",
    "EdgeSwitchingMarkovChainGenerator",
    "LFRGenerator",
    "PubWebGenerator",
    "graphtools",
    # round-3 parity stragglers -------------------------------------------------
    "LocalSquareClusteringCoefficient",
    "ForestCentrality",
    "GroupHarmonicCloseness",
    "NeighborhoodFunctionHeuristic",
    "CoverF1Similarity",
    # reachability / dynamics / multi-target tail --------------------------------
    "ReachableNodes",
    "AllSimplePaths",
    "MultiTargetBFS",
    "MultiTargetDijkstra",
    "GraphDifference",
    "SCDGroundTruthComparison",
    "Luby",
    "GephiStreamingClient",
    "GraphEvent",
    "GraphUpdater",
    "setNumberOfThreads",
    "getCurrentNumberOfThreads",
    "getMaxNumberOfThreads",
    "enableNestedParallelism",
    "AdjustedRandIndex",
    "NeighborsMeasureIndex",
    "AlgebraicDistanceIndex",
    "ReverseBFS",
    "BidirectionalDijkstra",
]

# module default seed (networkit.setSeed analogue): generators constructed
# without an explicit seed draw this value
_SEED = 42


def setSeed(seed: int, useThreadId: bool = False) -> None:
    """networkit.setSeed analogue — sets the default seed facade
    generators use when constructed without an explicit ``seed``.
    ``useThreadId`` is accepted for signature parity and ignored (the
    engine is deterministic by counter hashes, never thread-dependent)."""
    global _SEED
    _SEED = int(seed)


def _spark() -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "no active SparkSession — create one before using linkgraph.nkcompat"
        )
    return s


class Graph:
    """networkit.Graph facade: driver-side edge buffer + lazy engine
    Graph. Node ids are 0..n-1 like the reference (addNodes extends the
    range; isolated nodes are materialized through the nodes side)."""

    def __init__(self, n: int = 0, weighted: bool = False, directed: bool = False):
        self._n = int(n)
        self._weighted = bool(weighted)
        self._directed = bool(directed)
        self._edges: dict[tuple[int, int], float] = {}
        self._removed: set[int] = set()
        self._eg: _EngineGraph | None = None

    # -- mutation ---------------------------------------------------------
    def addNode(self) -> int:
        self._eg = None
        self._n += 1
        return self._n - 1

    def addNodes(self, k: int) -> int:
        self._eg = None
        self._n += int(k)
        return self._n - 1

    def _key(self, u: int, v: int) -> tuple[int, int]:
        return (u, v) if self._directed or u <= v else (v, u)

    def addEdge(self, u: int, v: int, w: float = 1.0) -> None:
        if u >= self._n or v >= self._n:
            raise ValueError(f"node out of range: ({u}, {v}) with n={self._n}")
        if u in self._removed or v in self._removed:
            raise ValueError(f"edge touches a removed node: ({u}, {v})")
        self._eg = None
        self._edges[self._key(u, v)] = float(w) if self._weighted else 1.0

    def removeEdge(self, u: int, v: int) -> None:
        self._eg = None
        del self._edges[self._key(u, v)]

    def removeNode(self, u: int) -> None:
        """Reference semantics (graph/Graph.hpp::removeNode): drop the
        node and its incident edges; the id is RETIRED, not renumbered —
        numberOfNodes() shrinks, upperNodeIdBound() does not."""
        if u >= self._n or u in self._removed:
            raise ValueError(f"no such node: {u}")
        self._eg = None
        self._edges = {k: w for k, w in self._edges.items() if u not in k}
        self._removed.add(u)

    def hasNode(self, u: int) -> bool:
        return 0 <= u < self._n and u not in self._removed

    def setWeight(self, u: int, v: int, w: float) -> None:
        self.addEdge(u, v, w)

    # -- accessors (reference surface) -------------------------------------
    def numberOfNodes(self) -> int:
        return self._n - len(self._removed)

    def upperNodeIdBound(self) -> int:
        return self._n

    def numberOfEdges(self) -> int:
        return len(self._edges)

    def isDirected(self) -> bool:
        return self._directed

    def isWeighted(self) -> bool:
        return self._weighted

    def hasEdge(self, u: int, v: int) -> bool:
        return self._key(u, v) in self._edges

    def weight(self, u: int, v: int) -> float:
        return self._edges.get(self._key(u, v), 0.0)

    def iterNodes(self):
        return (u for u in range(self._n) if u not in self._removed)

    def iterEdges(self):
        return iter(sorted(self._edges))

    def iterEdgesWeights(self):
        return ((u, v, w) for (u, v), w in sorted(self._edges.items()))

    def degree(self, u: int) -> int:
        if self._directed:
            return self.degreeOut(u)
        return sum(1 for (a, b) in self._edges if a == u or b == u)

    def degreeOut(self, u: int) -> int:
        # reference semantics: degreeOut == degree on undirected graphs
        # (edges are stored under a canonical key, so the stored
        # orientation must not leak)
        if not self._directed:
            return self.degree(u)
        return sum(1 for (a, _b) in self._edges if a == u)

    def degreeIn(self, u: int) -> int:
        if not self._directed:
            return self.degree(u)
        return sum(1 for (_a, b) in self._edges if b == u)

    def totalEdgeWeight(self) -> float:
        return sum(self._edges.values())

    # -- engine bridge ------------------------------------------------------
    def _engine(self) -> _EngineGraph:
        """Materialize the edge buffer as the engine's Graph (cached until
        the next mutation). Isolated nodes never in an edge don't reach
        the engine (its node set derives from edges) — facade accessors
        fill their scores with the algorithm's default, like the
        reference does for untouched vertices."""
        if self._eg is None:
            spark = _spark()
            rows = [(u, v, w) for (u, v), w in sorted(self._edges.items())]
            edges = spark.createDataFrame(
                rows or [(0, 0, 0.0)], "src bigint, dst bigint, weight double"
            )
            if not rows:
                edges = edges.limit(0)
            self._eg = _EngineGraph.from_edges(
                edges, directed=self._directed, weighted=self._weighted
            )
        return self._eg

    @staticmethod
    def fromEdgesDF(
        edges, directed: bool = False, weighted: bool = False,
        n: int | None = None,
    ) -> "Graph":
        """Build a facade Graph from an engine edge DataFrame (driver-side
        collect — fixture/interactive scale by design). Pass ``n`` when
        the true node count is known (generators): trailing isolated
        vertices carry no edges, so id inference alone would undercount
        them."""
        from pyspark.sql import functions as _F

        if "weight" not in edges.columns:
            edges = edges.withColumn("weight", _F.lit(1.0))
        rows = edges.select("src", "dst", "weight").collect()
        inferred = max((max(r.src, r.dst) for r in rows), default=-1) + 1
        g = Graph(int(max(inferred, n or 0)), weighted=weighted, directed=directed)
        for r in rows:
            g.addEdge(int(r.src), int(r.dst), float(r.weight))
        return g


def _fill(scores: dict[int, float], n: int, default: float = 0.0) -> list[float]:
    return [float(scores.get(i, default)) for i in range(n)]


class _ScoreAlgo:
    """Shared run()/scores()/ranking()/score() protocol of the
    reference's centrality classes."""

    _default = 0.0

    def __init__(self, G: Graph):
        self._G = G
        self._scores: list[float] | None = None

    def _compute(self) -> dict[int, float]:  # pragma: no cover - abstract
        raise NotImplementedError

    def run(self):
        # upperNodeIdBound, not numberOfNodes: removed ids stay indexable
        # (reference scores() convention), filled with the default
        self._scores = _fill(
            self._compute(), self._G.upperNodeIdBound(), self._default
        )
        return self

    def hasFinished(self) -> bool:
        return self._scores is not None

    def scores(self) -> list[float]:
        assert self._scores is not None, "call run() first"
        return list(self._scores)

    def score(self, v: int) -> float:
        assert self._scores is not None, "call run() first"
        return self._scores[v]

    def ranking(self) -> list[tuple[int, float]]:
        assert self._scores is not None, "call run() first"
        return sorted(
            enumerate(self._scores), key=lambda t: (-t[1], t[0])
        )


class PageRank(_ScoreAlgo):
    """KNOWN DIVERGENCE for graphs with isolated nodes: the engine's node
    set derives from edges, so fully isolated vertices score 0.0 here
    (and the vector sums to 1 over the edge-touched nodes), while the
    reference gives each isolated node its teleport share. Edge-covered
    graphs (every fixture in the test suite) agree to 1e-6."""

    def __init__(self, G: Graph, damp: float = 0.85, tol: float = 1e-8):
        super().__init__(G)
        self._damp, self._tol = damp, tol

    def _compute(self):
        from linkgraph.algs.pagerank import pagerank

        df = pagerank(self._G._engine(), damping=self._damp, tol=self._tol)
        return {int(r.id): float(r.rank) for r in df.collect()}


class DegreeCentrality(_ScoreAlgo):
    def __init__(self, G: Graph, normalized: bool = False):
        super().__init__(G)
        self._normalized = normalized

    def _compute(self):
        from linkgraph.algs.centrality import degree_centrality

        # normalize facade-side over the FACADE node count: the engine's
        # node set derives from edges, so isolated nodes would otherwise
        # shrink its n-1 divisor
        df = degree_centrality(self._G._engine(), normalized=False)
        got = {int(r[0]): float(r[1]) for r in df.collect()}
        if self._normalized:
            n1 = max(self._G.numberOfNodes() - 1, 1)
            got = {k: v / n1 for k, v in got.items()}
        return got


class Betweenness(_ScoreAlgo):
    def __init__(self, G: Graph, normalized: bool = False):
        super().__init__(G)
        self._normalized = normalized

    def _compute(self):
        from linkgraph.algs.betweenness import betweenness

        df = betweenness(self._G._engine(), normalized=self._normalized)
        return {int(r.id): float(r.score) for r in df.collect()}


class EstimateBetweenness(_ScoreAlgo):
    def __init__(self, G: Graph, nSamples: int, normalized: bool = False,
                 parallel: bool = True, seed: int = 42):
        super().__init__(G)
        self._k, self._normalized, self._seed = nSamples, normalized, seed

    def _compute(self):
        from linkgraph.algs.betweenness import betweenness

        df = betweenness(
            self._G._engine(), n_samples=self._k,
            normalized=self._normalized, seed=self._seed,
        )
        return {int(r.id): float(r.score) for r in df.collect()}


class Closeness(_ScoreAlgo):
    """Engine closeness is the Wasserman–Faust (normalized) score; on a
    connected graph that equals the reference's normalized standard
    variant, and ``normalized=False`` divides by (n−1) to recover the
    unnormalized 1/Σd form."""

    def __init__(self, G: Graph, normalized: bool = True, variant=None):
        super().__init__(G)
        self._normalized = normalized

    def _compute(self):
        from linkgraph.algs.bfs import closeness

        df = closeness(self._G._engine(), harmonic=False)
        got = {int(r.id): float(r.score) for r in df.collect()}
        if not self._normalized:
            n1 = max(self._G.numberOfNodes() - 1, 1)
            got = {k: v / n1 for k, v in got.items()}
        return got


class HarmonicCloseness(_ScoreAlgo):
    def __init__(self, G: Graph, normalized: bool = True):
        super().__init__(G)

    def _compute(self):
        from linkgraph.algs.bfs import closeness

        df = closeness(self._G._engine(), harmonic=True)
        return {int(r.id): float(r.score) for r in df.collect()}


class KatzCentrality(_ScoreAlgo):
    def __init__(self, G: Graph, alpha: float = 5e-4, beta: float = 0.1,
                 tol: float = 1e-8):
        super().__init__(G)
        self._alpha, self._beta, self._tol = alpha, beta, tol

    def _compute(self):
        from linkgraph.algs.centrality import katz_centrality

        df = katz_centrality(
            self._G._engine(), alpha=self._alpha, beta=self._beta, tol=self._tol
        )
        return {int(r[0]): float(r[1]) for r in df.collect()}


class EigenvectorCentrality(_ScoreAlgo):
    def __init__(self, G: Graph, tol: float = 1e-9):
        super().__init__(G)
        self._tol = tol

    def _compute(self):
        from linkgraph.algs.centrality import eigenvector_centrality

        df = eigenvector_centrality(self._G._engine(), tol=self._tol)
        return {int(r[0]): float(r[1]) for r in df.collect()}


class CoreDecomposition(_ScoreAlgo):
    def _compute(self):
        from linkgraph.algs.centrality import core_decomposition

        df = core_decomposition(self._G._engine())
        return {int(r[0]): float(r[1]) for r in df.collect()}

    def maxCoreNumber(self) -> int:
        return int(max(self.scores() or [0.0]))


class LocalClusteringCoefficient(_ScoreAlgo):
    def _compute(self):
        from linkgraph.algs.triangles import local_clustering_coefficient

        df = local_clustering_coefficient(self._G._engine())
        return {int(r[0]): float(r[1]) for r in df.collect()}


class LocalSquareClusteringCoefficient(_ScoreAlgo):
    """Square (4-cycle) clustering per vertex
    (REF⚠ centrality/LocalSquareClusteringCoefficient.cpp)."""

    def _compute(self):
        from linkgraph.algs.triangles import local_square_clustering

        df = local_square_clustering(self._G._engine())
        return {int(r.id): float(r.c4) for r in df.collect()}


class ForestCentrality(_ScoreAlgo):
    """Forest closeness (REF⚠ centrality/ForestCentrality.cpp) — finite
    across components; epsilon maps to the JL sketch width, replacing
    the reference's sequential UST sampling."""

    def __init__(self, G: Graph, root: int = 0, epsilon: float = 0.1,
                 kmax: int = 64, seed: int | None = None):
        super().__init__(G)
        self._k = min(max(4, int(round(1.0 / (epsilon * epsilon)))), kmax)
        self._seed = _SEED if seed is None else seed

    def _compute(self):
        from linkgraph.algs.electrical import forest_centrality

        df = forest_centrality(self._G._engine(), k=self._k, seed=self._seed)
        return {int(r.id): float(r.score) for r in df.collect()}


# -- community ---------------------------------------------------------------


class Partition:
    """networkit.Partition facade over an (id, label) result."""

    def __init__(self, labels: dict[int, int], n: int):
        self._v = [int(labels.get(i, i)) for i in range(n)]

    def __getitem__(self, v: int) -> int:
        return self._v[v]

    def subsetOf(self, v: int) -> int:
        return self._v[v]

    def getVector(self) -> list[int]:
        return list(self._v)

    def numberOfSubsets(self) -> int:
        return len(set(self._v))

    def subsetSizes(self) -> list[int]:
        from collections import Counter

        return sorted(Counter(self._v).values(), reverse=True)

    def getMembers(self, s: int) -> set[int]:
        return {i for i, l in enumerate(self._v) if l == s}

    def numberOfElements(self) -> int:
        return len(self._v)


class _CommunityAlgo:
    def __init__(self, G: Graph):
        self._G = G
        self._zeta: Partition | None = None

    def _labels(self) -> dict[int, int]:  # pragma: no cover - abstract
        raise NotImplementedError

    def run(self):
        self._zeta = Partition(self._labels(), self._G.numberOfNodes())
        return self

    def getPartition(self) -> Partition:
        assert self._zeta is not None, "call run() first"
        return self._zeta


class PLP(_CommunityAlgo):
    def __init__(self, G: Graph, updateThreshold: int | None = None,
                 maxIterations: int = 100):
        super().__init__(G)
        self._theta, self._max_iter = updateThreshold, maxIterations

    def _labels(self):
        from linkgraph.algs.plp import label_propagation

        df = label_propagation(
            self._G._engine(), max_iter=self._max_iter,
            update_threshold=self._theta,
        )
        return {int(r.id): int(r.label) for r in df.collect()}


class PLM(_CommunityAlgo):
    def __init__(self, G: Graph, refine: bool = False, gamma: float = 1.0):
        super().__init__(G)
        self._gamma = gamma

    def _labels(self):
        from linkgraph.algs.plm import louvain

        df = louvain(self._G._engine(), gamma=self._gamma)
        return {int(r.id): int(r.label) for r in df.collect()}


class ParallelLeiden(_CommunityAlgo):
    def __init__(self, G: Graph, gamma: float = 1.0):
        super().__init__(G)
        self._gamma = gamma

    def _labels(self):
        from linkgraph.algs.leiden import leiden

        df = leiden(self._G._engine(), gamma=self._gamma)
        return {int(r.id): int(r.label) for r in df.collect()}


class Modularity:
    def getQuality(self, zeta: Partition, G: Graph) -> float:
        from linkgraph.algs.community import modularity

        spark = _spark()
        labels = spark.createDataFrame(
            [(i, zeta[i]) for i in range(G.numberOfNodes())],
            "id bigint, label bigint",
        )
        return float(modularity(G._engine(), labels))


def detectCommunities(G: Graph, algo: _CommunityAlgo | None = None) -> Partition:
    a = algo or PLM(G)
    return a.run().getPartition()


# -- components ---------------------------------------------------------------


class ConnectedComponents(_CommunityAlgo):
    def _labels(self):
        from linkgraph.algs.components import connected_components

        df = connected_components(self._G._engine())
        return {int(r.id): int(r.component) for r in df.collect()}

    def numberOfComponents(self) -> int:
        return self.getPartition().numberOfSubsets()

    def componentOfNode(self, v: int) -> int:
        return self.getPartition()[v]

    def getComponentSizes(self) -> dict[int, int]:
        from collections import Counter

        return dict(Counter(self.getPartition().getVector()))


class StronglyConnectedComponents(ConnectedComponents):
    def _labels(self):
        from linkgraph.algs.components import strongly_connected_components

        df = strongly_connected_components(self._G._engine())
        return {int(r.id): int(r.component) for r in df.collect()}


# -- distance ------------------------------------------------------------------


class _SSSPAlgo:
    _weighted = False

    def __init__(self, G: Graph, source: int, storePaths: bool = True):
        self._G, self._src, self._store = G, source, storePaths
        self._dist: dict[int, float] | None = None
        self._pred: dict[int, int] | None = None

    def run(self):
        from linkgraph.algs.bfs import bfs, sssp

        fn = sssp if self._weighted else bfs
        df = fn(self._G._engine(), self._src, return_pred=self._store)
        rows = df.collect()
        self._dist = {int(r.id): float(r.dist) for r in rows}
        if self._store:
            self._pred = {
                int(r.id): int(r.pred) for r in rows if r.pred is not None
            }
        return self

    def distance(self, t: int) -> float:
        assert self._dist is not None, "call run() first"
        return self._dist.get(t, math.inf)

    def distances(self) -> list[float]:
        assert self._dist is not None, "call run() first"
        return [
            self._dist.get(i, math.inf) for i in range(self._G.numberOfNodes())
        ]

    def getPath(self, t: int) -> list[int]:
        assert self._store and self._pred is not None, "storePaths required"
        if t != self._src and t not in self._dist:
            return []
        path, cur = [t], t
        while cur != self._src:
            cur = self._pred[cur]
            path.append(cur)
        return path[::-1]

    def getPredecessors(self, t: int) -> list[int]:
        assert self._pred is not None, "storePaths required"
        return [self._pred[t]] if t in self._pred else []


class BFS(_SSSPAlgo):
    _weighted = False


class Dijkstra(_SSSPAlgo):
    _weighted = True


class Diameter:
    """algo: 'exact' (iFub) or 'estimatedRange' (error-bounded sweep)."""

    def __init__(self, G: Graph, algo: str = "exact", error: float = 0.1):
        self._G, self._algo, self._error = G, algo, error
        self._range: tuple[float, float] | None = None

    def run(self):
        from linkgraph.algs.bfs import diameter_exact, diameter_range

        eg = self._G._engine()
        if self._algo == "exact":
            d = float(diameter_exact(eg))
            self._range = (d, d)
        else:
            self._range = tuple(map(float, diameter_range(eg, self._error)))
        return self

    def getDiameter(self) -> tuple[float, float]:
        assert self._range is not None, "call run() first"
        return self._range


# -- generators ----------------------------------------------------------------


class _Generator:
    _directed = False
    _n_known: int | None = None

    def _edges_df(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def generate(self) -> Graph:
        return Graph.fromEdgesDF(
            self._edges_df(), directed=self._directed, n=self._n_known
        )


class ErdosRenyiGenerator(_Generator):
    def __init__(self, nNodes: int, prob: float, directed: bool = False,
                 seed: int = 42):
        self._n, self._p, self._seed = nNodes, prob, seed
        self._directed = directed
        self._n_known = nNodes

    def _edges_df(self):
        from linkgraph.generators import erdos_renyi

        return erdos_renyi(
            _spark(), self._n, self._p, directed=self._directed, seed=self._seed
        )


class BarabasiAlbertGenerator(_Generator):
    def __init__(self, k: int, nMax: int, seed: int = 42):
        self._k, self._n, self._seed = k, nMax, seed
        self._n_known = nMax

    def _edges_df(self):
        from linkgraph.generators import barabasi_albert

        return barabasi_albert(_spark(), self._n, self._k, seed=self._seed)


class RmatGenerator(_Generator):
    def __init__(self, scale: int, edgeFactor: int, a: float = 0.57,
                 b: float = 0.19, c: float = 0.19, d: float = 0.05,
                 seed: int = 42):
        self._args = (scale, edgeFactor, a, b, c, d, seed)
        self._n_known = 2 ** scale

    def _edges_df(self):
        from linkgraph.generators import rmat

        scale, ef, a, b, c, d, seed = self._args
        return rmat(_spark(), scale, ef, a=a, b=b, c=c, d=d, seed=seed)


# -- graphio -------------------------------------------------------------------


class Format:
    """networkit.graphio.Format analogue (string constants)."""

    EdgeList = "edgelist"
    METIS = "metis"
    SNAP = "snap"
    KONECT = "konect"
    GML = "gml"
    GraphML = "graphml"
    GraphToolBinary = "graphtool"
    ThrillBinary = "thrill"
    NetworkitBinary = "networkit"
    DOT = "dot"
    GEXF = "gexf"


_READERS = {
    Format.METIS: "read_metis",
    Format.SNAP: "read_snap",
    Format.KONECT: "read_konect",
    Format.GML: "read_gml",
    Format.GraphML: "read_graphml",
    Format.GraphToolBinary: "read_graphtool",
    Format.ThrillBinary: "read_thrill",
    Format.NetworkitBinary: "read_networkit_binary",
    Format.GEXF: "read_gexf",
}

_WRITERS = {
    Format.METIS: "write_metis",
    Format.GML: "write_gml",
    Format.GraphML: "write_graphml",
    Format.GraphToolBinary: "write_graphtool",
    Format.ThrillBinary: "write_thrill",
    Format.NetworkitBinary: "write_networkit_binary",
    Format.DOT: "write_dot",
    Format.GEXF: "write_gexf",
}


def readGraph(path: str, fileformat: str = Format.EdgeList, **kw) -> Graph:
    """networkit.readGraph analogue: parse with the engine reader for
    ``fileformat``, return a facade Graph."""
    from linkgraph import io as _io

    spark = _spark()
    if fileformat == Format.EdgeList:
        eg = _io.read_edge_list(spark, path, **kw)
    else:
        eg = getattr(_io, _READERS[fileformat])(spark, path, **kw)
    # several engine readers parse weights but return weighted=False
    # handles; sniff one non-unit weight so round-tripped weighted
    # graphs keep their weights (one take(1) action, facade scale)
    from pyspark.sql import functions as _F

    weighted = eg.weighted or bool(
        eg.edges.where(_F.col("weight") != 1.0).take(1)
    )
    return Graph.fromEdgesDF(eg.edges, directed=eg.directed, weighted=weighted)


def writeGraph(G: Graph, path: str, fileformat: str = Format.EdgeList, **kw) -> None:
    """networkit.writeGraph analogue."""
    from linkgraph import io as _io

    eg = G._engine()
    if fileformat == Format.EdgeList:
        _io.write_edge_list(eg, path, **kw)
    else:
        getattr(_io, _WRITERS[fileformat])(eg, path, **kw)


# -- additional centrality facades ----------------------------------------------


class ApproxBetweenness(_ScoreAlgo):
    """ε–δ RK sampling (centrality/ApproxBetweenness.cpp surface)."""

    def __init__(self, G: Graph, epsilon: float = 0.01, delta: float = 0.1,
                 seed: int = 42):
        super().__init__(G)
        self._eps, self._delta, self._seed = epsilon, delta, seed

    def _compute(self):
        from linkgraph.algs.betweenness import approx_betweenness

        df = approx_betweenness(
            self._G._engine(), epsilon=self._eps, delta=self._delta,
            seed=self._seed,
        )
        return {int(r[0]): float(r[1]) for r in df.collect()}


class TopCloseness:
    """centrality/TopCloseness.cpp surface: topkNodesList/topkScoresList."""

    def __init__(self, G: Graph, k: int = 10, harmonic: bool = False):
        self._G, self._k, self._harmonic = G, k, harmonic
        self._rows: list | None = None

    def run(self):
        from linkgraph.algs.bfs import top_closeness

        df = top_closeness(self._G._engine(), k=self._k, harmonic=self._harmonic)
        self._rows = [(int(r[0]), float(r[1])) for r in df.collect()]
        return self

    def topkNodesList(self) -> list[int]:
        assert self._rows is not None, "call run() first"
        return [v for v, _ in self._rows]

    def topkScoresList(self) -> list[float]:
        assert self._rows is not None, "call run() first"
        return [s for _, s in self._rows]


# -- attributes + overview -------------------------------------------------------


class _NodeAttribute:
    """networkit Graph.attachNodeAttribute return-object analogue:
    att[v] = value / att[v] — driver-side store, bridged to the engine's
    columnar attach_attribute on demand (toDF)."""

    def __init__(self, G: Graph, name: str, ofType: type):
        self._G, self._name, self._type = G, name, ofType
        self._vals: dict[int, object] = {}

    def __setitem__(self, v: int, value):
        if v >= self._G.numberOfNodes():
            raise ValueError(f"node {v} out of range")
        self._vals[v] = self._type(value)

    def __getitem__(self, v: int):
        return self._vals[v]

    def get(self, v: int, default=None):
        return self._vals.get(v, default)

    def toDF(self):
        """(id, <name>) DataFrame — the engine-side columnar view
        (linkgraph.graph.attach_attribute input shape)."""
        t = {int: "bigint", float: "double", str: "string"}[self._type]
        return _spark().createDataFrame(
            sorted(self._vals.items()), f"id bigint, {self._name} {t}"
        )


def attachNodeAttribute(G: Graph, name: str, ofType: type = float) -> _NodeAttribute:
    return _NodeAttribute(G, name, ofType)


def overview(G: Graph) -> str:
    """networkit.overview(G) analogue: one-call profile (node/edge counts,
    density, degree stats, components, clustering, PLP communities),
    rendered via the engine's profiling battery."""
    from linkgraph.profiling import profile, profile_markdown

    return profile_markdown(profile(G._engine()))


# =============================================================================
# Round-3 breadth expansion: the rest of the reference's user-facing classes.
# Same contract as above — every class delegates to the engine's DataFrame
# implementation and only reshapes results into the reference's accessor
# protocol (driver-side lists/dicts, fixture/interactive scale by design).
# =============================================================================


def _labels_df(zeta: "Partition"):
    """Partition → the engine's (id, label) DataFrame shape."""
    return _spark().createDataFrame(
        [(i, int(zeta[i])) for i in range(zeta.numberOfElements())],
        "id bigint, label bigint",
    )


class Cover:
    """networkit.Cover facade — overlapping subset membership
    (REF⚠ structures/Cover.hpp; vertices may belong to several subsets)."""

    def __init__(self, memberships: dict[int, set], n: int):
        self._n = n
        self._m = {v: set(int(s) for s in ss) for v, ss in memberships.items()}

    def subsetsOf(self, v: int) -> set:
        return set(self._m.get(v, set()))

    def numberOfSubsets(self) -> int:
        return len({s for ss in self._m.values() for s in ss})

    def numberOfElements(self) -> int:
        return self._n

    def subsetSizes(self) -> list:
        from collections import Counter

        c = Counter(s for ss in self._m.values() for s in ss)
        return sorted(c.values(), reverse=True)

    def getMembers(self, s: int) -> set:
        return {v for v, ss in self._m.items() if s in ss}


# -- centrality additions ------------------------------------------------------


class KadabraBetweenness(_ScoreAlgo):
    """Adaptive sampled betweenness within ±err with prob ≥ 1−delta
    (REF⚠ centrality/KadabraBetweenness.cpp)."""

    def __init__(self, G: Graph, err: float = 0.05, delta: float = 0.1,
                 seed: int | None = None):
        super().__init__(G)
        self._err, self._delta = err, delta
        self._seed = _SEED if seed is None else seed

    def _compute(self):
        from linkgraph.algs.kadabra import kadabra_betweenness

        df = kadabra_betweenness(
            self._G._engine(), epsilon=self._err, delta=self._delta,
            seed=self._seed,
        )
        return {int(r.id): float(r.score) for r in df.collect()}


class ApproxCloseness(_ScoreAlgo):
    """Pivot-sampled closeness (REF⚠ centrality/ApproxCloseness.cpp)."""

    def __init__(self, G: Graph, nSamples: int = 16, epsilon: float = 0.1,
                 normalized: bool = True, seed: int | None = None):
        super().__init__(G)
        self._k = nSamples
        self._seed = _SEED if seed is None else seed

    def _compute(self):
        from linkgraph.algs.bfs import closeness_sampled

        df = closeness_sampled(self._G._engine(), n_samples=self._k,
                               seed=self._seed)
        return {int(r.id): float(r.score) for r in df.collect()}


class LaplacianCentrality(_ScoreAlgo):
    def _compute(self):
        from linkgraph.algs.centrality import laplacian_centrality

        df = laplacian_centrality(self._G._engine())
        return {int(r.id): float(r.score) for r in df.collect()}


class Sfigality(_ScoreAlgo):
    def _compute(self):
        from linkgraph.algs.centrality import sfigality

        df = sfigality(self._G._engine())
        return {int(r.id): float(r.score) for r in df.collect()}


class PermanenceCentrality:
    """Per-vertex permanence w.r.t. a partition
    (REF⚠ centrality/PermanenceCentrality.cpp): run() then
    getPermanence(v)."""

    def __init__(self, G: Graph, P: "Partition"):
        self._G, self._P = G, P
        self._perm: dict[int, float] | None = None

    def run(self):
        from linkgraph.algs.community import permanence

        df = permanence(self._G._engine(), _labels_df(self._P))
        self._perm = {int(r[0]): float(r[1]) for r in df.collect()}
        return self

    def getPermanence(self, v: int) -> float:
        assert self._perm is not None, "call run() first"
        return self._perm.get(v, 0.0)


class SpanningEdgeCentrality:
    """Per-EDGE centrality = effective resistance × weight
    (REF⚠ centrality/SpanningEdgeCentrality.cpp, JL-sketch approximation).
    scores() aligns to the facade Graph's iterEdges() order."""

    def __init__(self, G: Graph, tol: float = 0.1, seed: int | None = None):
        self._G = G
        # JL sketch width from tol: error O(1/sqrt(k))
        self._k = max(4, int(round(1.0 / (tol * tol))))
        self._seed = _SEED if seed is None else seed
        self._sec: dict[tuple, float] | None = None

    def run(self):
        from linkgraph.algs.electrical import spanning_edge_centrality

        df = spanning_edge_centrality(
            self._G._engine(), k=self._k, seed=self._seed
        )
        self._sec = {
            (min(int(r.src), int(r.dst)), max(int(r.src), int(r.dst))): float(r.sec)
            for r in df.collect()
        }
        return self

    def score(self, u: int, v: int) -> float:
        assert self._sec is not None, "call run() first"
        return self._sec.get((min(u, v), max(u, v)), 0.0)

    def scores(self) -> list:
        assert self._sec is not None, "call run() first"
        return [
            self._sec.get((min(u, v), max(u, v)), 0.0)
            for u, v in self._G.iterEdges()
        ]


class _GroupAlgo:
    """Shared protocol of the group-centrality greedies: run() then
    groupMaxDegree()/groupMaxCloseness()/… (all alias getGroup())."""

    def __init__(self, G: Graph, k: int = 5):
        self._G, self._k = G, k
        self._group: list | None = None

    def _compute(self) -> list:  # pragma: no cover - abstract
        raise NotImplementedError

    def run(self):
        self._group = [int(v) for v in self._compute()]
        return self

    def getGroup(self) -> list:
        assert self._group is not None, "call run() first"
        return list(self._group)


class GroupDegree(_GroupAlgo):
    def _compute(self):
        from linkgraph.algs.bfs import group_degree

        return [r.id for r in group_degree(self._G._engine(), k=self._k).collect()]

    def groupMaxDegree(self) -> list:
        return self.getGroup()


class GroupCloseness(_GroupAlgo):
    def _compute(self):
        from linkgraph.algs.bfs import group_closeness

        return [r.id for r in group_closeness(self._G._engine(), k=self._k).collect()]

    def groupMaxCloseness(self) -> list:
        return self.getGroup()


class GroupHarmonicCloseness(_GroupAlgo):
    """Greedy group-harmonic-closeness
    (REF⚠ centrality/GroupHarmonicCloseness.cpp)."""

    def _compute(self):
        from linkgraph.algs.bfs import group_harmonic_closeness

        return [
            r.id
            for r in group_harmonic_closeness(self._G._engine(), k=self._k).collect()
        ]

    def groupMaxHarmonicCloseness(self) -> list:
        return self.getGroup()


class ApproxGroupBetweenness(_GroupAlgo):
    def __init__(self, G: Graph, groupSize: int = 3, epsilon: float = 0.1,
                 seed: int | None = None):
        super().__init__(G, k=groupSize)
        # sample size from epsilon: n_pairs ~ 1/eps^2 (coverage-style bound)
        self._n_pairs = max(64, int(round(1.0 / (epsilon * epsilon))))
        self._seed = _SEED if seed is None else seed

    def _compute(self):
        from linkgraph.algs.kadabra import approx_group_betweenness

        return approx_group_betweenness(
            self._G._engine(), k=self._k, n_pairs=self._n_pairs, seed=self._seed
        )

    def groupMaxBetweenness(self) -> list:
        return self.getGroup()


class GedWalk(_GroupAlgo):
    def __init__(self, G: Graph, k: int = 3, alpha: float | None = None,
                 maxLen: int = 8):
        super().__init__(G, k=k)
        self._alpha, self._max_len = alpha, maxLen
        self._score = 0.0

    def _compute(self):
        from linkgraph.algs.gedwalk import ged_walk

        rows = (
            ged_walk(self._G._engine(), k=self._k, alpha=self._alpha,
                     max_len=self._max_len)
            .orderBy("ord")
            .collect()
        )
        self._score = float(rows[-1].ged_score) if rows else 0.0
        return [r.id for r in rows]

    def getApproximateScore(self) -> float:
        assert self._group is not None, "call run() first"
        return self._score


class TopHarmonicCloseness:
    """Top-k vertices by harmonic closeness
    (REF⚠ centrality/TopHarmonicCloseness.cpp)."""

    def __init__(self, G: Graph, k: int = 10):
        self._G, self._k = G, k
        self._rows: list | None = None

    def run(self):
        from linkgraph.algs.bfs import top_closeness

        df = top_closeness(self._G._engine(), k=self._k, harmonic=True)
        self._rows = [(int(r.id), float(r.score)) for r in df.collect()]
        return self

    def topkNodesList(self) -> list:
        assert self._rows is not None, "call run() first"
        return [v for v, _ in self._rows]

    def topkScoresList(self) -> list:
        assert self._rows is not None, "call run() first"
        return [s for _, s in self._rows]


# -- components additions --------------------------------------------------


class WeaklyConnectedComponents(ConnectedComponents):
    def _labels(self):
        from linkgraph.algs.components import weakly_connected_components

        df = weakly_connected_components(self._G._engine())
        return {int(r.id): int(r.component) for r in df.collect()}


class BiconnectedComponents:
    """Biconnected components as node sets
    (REF⚠ components/BiconnectedComponents.cpp): run() then
    getComponents() / componentsOfNode(v) / numberOfComponents()."""

    def __init__(self, G: Graph):
        self._G = G
        self._comps: list[set] | None = None

    def run(self):
        from linkgraph.algs.biconnected import biconnected_components

        rows = biconnected_components(self._G._engine()).collect()
        by_block: dict[int, set] = {}
        for r in rows:
            by_block.setdefault(int(r.block), set()).update(
                (int(r.src), int(r.dst))
            )
        # deterministic order: by min member then size
        self._comps = sorted(by_block.values(), key=lambda s: (min(s), len(s)))
        return self

    def numberOfComponents(self) -> int:
        assert self._comps is not None, "call run() first"
        return len(self._comps)

    def getComponents(self) -> list[set]:
        assert self._comps is not None, "call run() first"
        return [set(c) for c in self._comps]

    def componentsOfNode(self, v: int) -> set:
        assert self._comps is not None, "call run() first"
        return {i for i, c in enumerate(self._comps) if v in c}


# -- community additions ---------------------------------------------------


class LouvainMapEquation(_CommunityAlgo):
    """Map-equation objective in the Louvain loop
    (REF⚠ community/LouvainMapEquation.cpp)."""

    def __init__(self, G: Graph, maxIterations: int = 32):
        super().__init__(G)
        self._max_rounds = maxIterations

    def _labels(self):
        from linkgraph.algs.infomap import louvain_map_equation

        df = louvain_map_equation(self._G._engine(), max_rounds=self._max_rounds)
        return {int(r.id): int(r.label) for r in df.collect()}


class CutClustering(_CommunityAlgo):
    """Flake–Tarjan alpha-sink cut clustering
    (REF⚠ community/CutClustering.cpp)."""

    def __init__(self, G: Graph, alpha: float):
        super().__init__(G)
        self._alpha = alpha

    def _labels(self):
        from linkgraph.algs.flow import cut_clustering

        df = cut_clustering(self._G._engine(), alpha=self._alpha)
        return {int(r.id): int(r.label) for r in df.collect()}


class EgoSplitting:
    """Overlapping communities via persona splitting
    (REF⚠ community/EgoSplitting.cpp): run() then getCover()."""

    def __init__(self, G: Graph, maxEgoDegree: int | None = 200):
        self._G, self._max_ego = G, maxEgoDegree
        self._cover: Cover | None = None

    def run(self):
        from linkgraph.algs.egosplit import ego_splitting

        rows = ego_splitting(self._G._engine(), max_ego_degree=self._max_ego).collect()
        m: dict[int, set] = {}
        for r in rows:
            m.setdefault(int(r.id), set()).add(int(r.label))
        self._cover = Cover(m, self._G.numberOfNodes())
        return self

    def getCover(self) -> Cover:
        assert self._cover is not None, "call run() first"
        return self._cover


class EdgeCut:
    def getQuality(self, zeta: "Partition", G: Graph) -> float:
        from linkgraph.algs.community import edge_cut

        return float(edge_cut(G._engine(), _labels_df(zeta)))


class Coverage:
    def getQuality(self, zeta: "Partition", G: Graph) -> float:
        from linkgraph.algs.community import coverage

        return float(coverage(G._engine(), _labels_df(zeta)))


class _DissimilarityMeasure:
    """Shared getDissimilarity(G, zeta1, zeta2) protocol of the
    reference's partition-comparison measures."""

    def _value(self, G: Graph, a, b) -> float:  # pragma: no cover - abstract
        raise NotImplementedError

    def getDissimilarity(self, G: Graph, zeta1: "Partition",
                         zeta2: "Partition") -> float:
        return float(self._value(G, _labels_df(zeta1), _labels_df(zeta2)))


class NMIDistance(_DissimilarityMeasure):
    """1 − NMI (REF⚠ community/NMIDistance.cpp reports the distance)."""

    def _value(self, G, a, b):
        from linkgraph.algs.community import nmi

        return 1.0 - nmi(a, b)


def _cover_df(c):
    """Cover or Partition → the engine's exploded (id, label) shape."""
    if isinstance(c, Cover):
        rows = [(v, int(s)) for v in range(c.numberOfElements())
                for s in c.subsetsOf(v)]
    else:
        rows = [(i, int(c[i])) for i in range(c.numberOfElements())]
    return _spark().createDataFrame(rows, "id bigint, label bigint")


class CoverF1Similarity:
    """Per-cluster best F1 of a cover against a reference cover
    (REF⚠ community/CoverF1Similarity.cpp)."""

    def __init__(self, G: Graph, C, reference):
        self._G, self._C, self._ref = G, C, reference
        self._values: dict[int, float] | None = None
        self._sizes: dict[int, int] | None = None

    def run(self):
        from linkgraph.algs.community import cover_f1

        a, b = _cover_df(self._C), _cover_df(self._ref)
        self._values = {
            int(r.label): float(r.best_f1) for r in cover_f1(a, b).collect()
        }
        self._sizes = {
            int(r[0]): int(r[1])
            for r in a.groupBy("label").count().collect()
        }
        return self

    def getValues(self) -> list:
        assert self._values is not None, "call run() first"
        return [self._values[k] for k in sorted(self._values)]

    def getValue(self, s: int) -> float:
        assert self._values is not None, "call run() first"
        return self._values[int(s)]

    def getUnweightedAverage(self) -> float:
        vals = self.getValues()
        return sum(vals) / len(vals) if vals else 0.0

    def getWeightedAverage(self) -> float:
        assert self._values is not None and self._sizes is not None
        tot = sum(self._sizes.values())
        if not tot:
            return 0.0
        return (
            sum(self._values[k] * self._sizes.get(k, 0) for k in self._values)
            / tot
        )


class AdjustedRandMeasure(_DissimilarityMeasure):
    """1 − ARI (REF⚠ community/AdjustedRandMeasure.cpp)."""

    def _value(self, G, a, b):
        from linkgraph.algs.community import adjusted_rand

        return 1.0 - adjusted_rand(a, b)


class JaccardMeasure(_DissimilarityMeasure):
    """1 − node-pair Jaccard (REF⚠ community/JaccardMeasure.cpp)."""

    def _value(self, G, a, b):
        from linkgraph.algs.community import jaccard_measure

        return 1.0 - jaccard_measure(a, b)


class NodeStructuralRandMeasure(_DissimilarityMeasure):
    """All-pairs Rand distance
    (REF⚠ community/NodeStructuralRandMeasure.cpp)."""

    def _value(self, G, a, b):
        from linkgraph.algs.community import node_structural_rand

        return node_structural_rand(a, b)


class GraphStructuralRandMeasure(_DissimilarityMeasure):
    """Rand distance restricted to connected pairs
    (REF⚠ community/GraphStructuralRandMeasure.cpp)."""

    def _value(self, G, a, b):
        from linkgraph.algs.community import graph_structural_rand

        return graph_structural_rand(G._engine(), a, b)


class ClusteringGenerator:
    """REF⚠ community/ClusteringGenerator.cpp: canonical test partitions."""

    def makeSingletonClustering(self, G: Graph) -> "Partition":
        n = G.numberOfNodes()
        return Partition({i: i for i in range(n)}, n)

    def makeOneClustering(self, G: Graph) -> "Partition":
        n = G.numberOfNodes()
        return Partition({i: 0 for i in range(n)}, n)

    def makeRandomClustering(self, G: Graph, k: int,
                             seed: int | None = None) -> "Partition":
        n = G.numberOfNodes()
        s = _SEED if seed is None else seed
        # splitmix-style counter hash — deterministic, engine-convention
        def h(i: int) -> int:
            x = (i + s * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            return (x ^ (x >> 31)) % k

        return Partition({i: h(i) for i in range(n)}, n)


# -- distance additions ------------------------------------------------------


class APSP:
    """All-pairs shortest paths (REF⚠ distance/APSP.cpp): one multi-source
    frontier job over every vertex (weighted graphs relax by weight).
    Fixture/interactive scale by design — the result is n² driver-side."""

    def __init__(self, G: Graph):
        self._G = G
        self._d: dict[tuple, float] | None = None

    def run(self):
        from linkgraph.algs.bfs import multi_source_bfs, multi_source_sssp

        eg = self._G._engine()
        sources = list(range(self._G.numberOfNodes()))
        fn = multi_source_sssp if self._G.isWeighted() else multi_source_bfs
        rows = fn(eg, sources).collect()
        self._d = {(int(r.source), int(r.id)): float(r.dist) for r in rows}
        return self

    def getDistance(self, u: int, v: int) -> float:
        assert self._d is not None, "call run() first"
        if u == v:
            return 0.0
        return self._d.get((u, v), math.inf)

    def getDistances(self) -> list[list[float]]:
        assert self._d is not None, "call run() first"
        n = self._G.numberOfNodes()
        return [[self.getDistance(u, v) for v in range(n)] for u in range(n)]


class SPSP:
    """Some-pairs shortest paths (REF⚠ distance/SPSP.cpp): distances from
    a source subset to all vertices — ONE multi-source job, not |S| BFS."""

    def __init__(self, G: Graph, sources: list):
        self._G, self._sources = G, [int(s) for s in sources]
        self._d: dict[tuple, float] | None = None

    def run(self):
        from linkgraph.algs.bfs import multi_source_bfs, multi_source_sssp

        fn = multi_source_sssp if self._G.isWeighted() else multi_source_bfs
        rows = fn(self._G._engine(), self._sources).collect()
        self._d = {(int(r.source), int(r.id)): float(r.dist) for r in rows}
        return self

    def getDistance(self, u: int, v: int) -> float:
        assert self._d is not None, "call run() first"
        if u == v and u in self._sources:
            return 0.0
        return self._d.get((u, v), math.inf)

    def getDistances(self) -> list[list[float]]:
        assert self._d is not None, "call run() first"
        n = self._G.numberOfNodes()
        return [
            [self.getDistance(s, v) for v in range(n)] for s in self._sources
        ]


class Eccentricity:
    """REF⚠ distance/Eccentricity.cpp — static getValue(G, v) returning
    (farthest_node, eccentricity)."""

    @staticmethod
    def getValue(G: Graph, v: int) -> tuple[int, int]:
        from linkgraph.algs.bfs import bfs

        rows = bfs(G._engine(), v).collect()
        if not rows:
            return (v, 0)
        ecc = max(int(r.dist) for r in rows)
        far = min(int(r.id) for r in rows if int(r.dist) == ecc)
        return (far, ecc)


class EffectiveDiameterApproximation:
    """REF⚠ distance/EffectiveDiameterApproximation.cpp (ANF sketches)."""

    def __init__(self, G: Graph, ratio: float = 0.9):
        self._G, self._ratio = G, ratio
        self._val: float | None = None

    def run(self):
        from linkgraph.algs.anf import effective_diameter

        self._val = float(effective_diameter(self._G._engine(), ratio=self._ratio))
        return self

    def getEffectiveDiameter(self) -> float:
        assert self._val is not None, "call run() first"
        return self._val


class NeighborhoodFunctionApproximation:
    """REF⚠ distance/NeighborhoodFunctionApproximation.cpp."""

    def __init__(self, G: Graph, k: int = 8):
        self._G, self._registers = G, k
        self._nf: list | None = None

    def run(self):
        from linkgraph.algs.anf import neighborhood_function

        nf = neighborhood_function(self._G._engine(), registers=self._registers)
        # reference reports N(h) for h >= 1
        self._nf = [v for h, v in nf if h >= 1]
        return self

    def getNeighborhoodFunction(self) -> list:
        assert self._nf is not None, "call run() first"
        return list(self._nf)


class NeighborhoodFunctionHeuristic:
    """REF⚠ distance/NeighborhoodFunctionHeuristic.cpp — sampled exact
    BFS instead of sketches; nSamples=0 → the reference's default
    sqrt-sized sample."""

    def __init__(self, G: Graph, nSamples: int = 0, seed: int | None = None):
        self._G = G
        self._s = nSamples if nSamples > 0 else max(
            1, int(round(G.numberOfNodes() ** 0.5))
        )
        self._seed = _SEED if seed is None else seed
        self._nf: list | None = None

    def run(self):
        from linkgraph.algs.anf import neighborhood_function_heuristic

        nf = neighborhood_function_heuristic(
            self._G._engine(), n_samples=self._s, seed=self._seed
        )
        self._nf = [v for h, v in nf if h >= 1]
        return self

    def getNeighborhoodFunction(self) -> list:
        assert self._nf is not None, "call run() first"
        return list(self._nf)


class HopPlotApproximation:
    """REF⚠ distance/HopPlotApproximation.cpp — getHopPlot() maps
    h → fraction of reachable pairs within distance h."""

    def __init__(self, G: Graph, maxDistance: int = 32, k: int = 8):
        self._G, self._max_h, self._registers = G, maxDistance, k
        self._hp: dict[int, float] | None = None

    def run(self):
        from linkgraph.algs.anf import hop_plot

        hp = hop_plot(self._G._engine(), max_h=self._max_h,
                      registers=self._registers)
        self._hp = {int(h): float(v) for h, v in hp}
        return self

    def getHopPlot(self) -> dict[int, float]:
        assert self._hp is not None, "call run() first"
        return dict(self._hp)


class AlgebraicDistance:
    """REF⚠ distance/AlgebraicDistance.cpp: preprocess() smooths the test
    vectors; distance(u, v) is defined per STORED edge (the engine
    materializes edge affinities — the sparsification/coarsening use)."""

    def __init__(self, G: Graph, numberSystems: int = 8,
                 numberIterations: int = 20, omega: float = 0.5,
                 seed: int | None = None):
        self._G = G
        self._args = (numberSystems, numberIterations, omega,
                      _SEED if seed is None else seed)
        self._d: dict[tuple, float] | None = None

    def preprocess(self):
        from linkgraph.algs.bfs import algebraic_distance

        ns, ni, om, seed = self._args
        rows = algebraic_distance(
            self._G._engine(), n_systems=ns, n_iters=ni, omega=om, seed=seed
        ).collect()
        self._d = {
            (min(int(r.src), int(r.dst)), max(int(r.src), int(r.dst))): float(r.dist)
            for r in rows
        }
        return self

    def distance(self, u: int, v: int) -> float:
        assert self._d is not None, "call preprocess() first"
        key = (min(u, v), max(u, v))
        if key not in self._d:
            raise KeyError(
                f"({u}, {v}) is not a stored edge — the engine materializes "
                "algebraic distances per edge (see class docstring)"
            )
        return self._d[key]


class CommuteTimeDistance:
    """REF⚠ distance/CommuteTimeDistance.cpp: distance(u, v) = 2W·r_eff.
    Each query is one distributed Laplacian solve (CG)."""

    def __init__(self, G: Graph, tol: float = 1e-8):
        self._G, self._tol = G, tol

    def run(self):
        return self

    def distance(self, u: int, v: int) -> float:
        from linkgraph.algs.electrical import commute_time_distance

        return float(commute_time_distance(self._G._engine(), u, v, tol=self._tol))


# -- link prediction ---------------------------------------------------------


class _LinkPredictor:
    """REF⚠ linkprediction/LinkPredictor.cpp protocol: run(u, v) scores a
    pair; runOn(pairs) scores a batch. The engine scores the standard
    common-neighbor candidate set in ONE distributed pass; the facade
    caches that table and answers lookups from it (pairs outside the
    candidate set score 0, the index value for disconnected
    neighborhoods)."""

    def __init__(self, G: Graph):
        self._G = G
        self._table: dict[tuple, float] | None = None

    def _score_df(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _lookup(self, u: int, v: int) -> float:
        if self._table is None:
            self._table = {
                (min(int(r.u), int(r.v)), max(int(r.u), int(r.v))): float(r.score)
                for r in self._score_df().collect()
            }
        return self._table.get((min(u, v), max(u, v)), 0.0)

    def run(self, u: int, v: int) -> float:
        return self._lookup(u, v)

    def runOn(self, pairs: list) -> list:
        return [(u, v, self._lookup(u, v)) for u, v in pairs]


class CommonNeighborsIndex(_LinkPredictor):
    def _score_df(self):
        from linkgraph.algs.linkpred import common_neighbors

        return common_neighbors(self._G._engine())


class JaccardIndex(_LinkPredictor):
    def _score_df(self):
        from linkgraph.algs.linkpred import jaccard_index

        return jaccard_index(self._G._engine())


class AdamicAdarIndex(_LinkPredictor):
    def _score_df(self):
        from linkgraph.algs.linkpred import adamic_adar

        return adamic_adar(self._G._engine())


class ResourceAllocationIndex(_LinkPredictor):
    def _score_df(self):
        from linkgraph.algs.linkpred import resource_allocation

        return resource_allocation(self._G._engine())


class PreferentialAttachmentIndex(_LinkPredictor):
    """deg(u)·deg(v) — defined for EVERY pair, so misses on the candidate
    table fall back to the degree product (same value the engine would
    compute; degrees come from the engine's degree view)."""

    def _score_df(self):
        from linkgraph.algs.linkpred import preferential_attachment

        return preferential_attachment(self._G._engine())

    def _lookup(self, u: int, v: int) -> float:
        got = super()._lookup(u, v)
        if got == 0.0:
            return float(self._G.degree(u) * self._G.degree(v))
        return got


class TotalNeighborsIndex(_LinkPredictor):
    def _score_df(self):
        from linkgraph.algs.linkpred import total_neighbors

        return total_neighbors(self._G._engine())


class NeighborhoodDistanceIndex(_LinkPredictor):
    def _score_df(self):
        from linkgraph.algs.linkpred import neighborhood_distance

        return neighborhood_distance(self._G._engine())


class KatzIndex(_LinkPredictor):
    def __init__(self, G: Graph, maxPathLength: int = 3, dampingValue: float = 0.005):
        super().__init__(G)
        self._L, self._beta = maxPathLength, dampingValue

    def _score_df(self):
        from linkgraph.algs.linkpred import katz_index

        return katz_index(self._G._engine(), beta=self._beta, max_length=self._L)


class UDegreeIndex(_LinkPredictor):
    def _score_df(self):
        from linkgraph.algs.linkpred import u_degree_index

        return u_degree_index(self._G._engine())

    def run(self, u: int, v: int) -> float:
        # not symmetric: the index IS deg(u)
        if self._table is None:
            self._table = {
                (int(r.u), int(r.v)): float(r.score)
                for r in self._score_df().collect()
            }
        return self._table.get((u, v), float(self._G.degree(u)))

    def runOn(self, pairs: list) -> list:
        return [(u, v, self.run(u, v)) for u, v in pairs]


class VDegreeIndex(UDegreeIndex):
    def _score_df(self):
        from linkgraph.algs.linkpred import v_degree_index

        return v_degree_index(self._G._engine())

    def run(self, u: int, v: int) -> float:
        if self._table is None:
            self._table = {
                (int(r.u), int(r.v)): float(r.score)
                for r in self._score_df().collect()
            }
        return self._table.get((u, v), float(self._G.degree(v)))


# -- sparsification -----------------------------------------------------------


def _facade_from_engine(eg: _EngineGraph, directed: bool, weighted: bool,
                        n: int) -> Graph:
    return Graph.fromEdgesDF(eg.edges, directed=directed, weighted=weighted, n=n)


class _Sparsifier:
    """REF⚠ sparsification/Sparsifiers.cpp protocol: scores(G) exposes the
    per-edge attribute; getSparsifiedGraph(G, parameter) keeps edges whose
    canonical (max-over-direction) score passes the sparsifier's keep
    rule. One engine scoring pass + one threshold filter."""

    _keep_above = True  # keep score >= parameter (RandomEdge inverts)

    def _score_df(self, eg: _EngineGraph):  # pragma: no cover - abstract
        raise NotImplementedError

    def scores(self, G: Graph) -> dict[tuple, float]:
        rows = self._score_df(G._engine()).collect()
        out: dict[tuple, float] = {}
        for r in rows:
            key = (min(int(r.src), int(r.dst)), max(int(r.src), int(r.dst)))
            s = float(r.score)
            out[key] = max(out.get(key, -math.inf), s)
        return out

    def getSparsifiedGraph(self, G: Graph, parameter: float) -> Graph:
        sc = self.scores(G)
        H = Graph(G.numberOfNodes(), weighted=G.isWeighted(),
                  directed=False)
        for (u, v), s in sorted(sc.items()):
            keep = s >= parameter if self._keep_above else s <= parameter
            if keep and G.hasEdge(u, v):
                H.addEdge(u, v, G.weight(u, v))
        return H


class LocalDegreeSparsifier(_Sparsifier):
    """Keep each vertex's top-α fraction of highest-degree neighbors —
    pass α as ``1 − parameter`` per the engine's score convention
    (score ≥ 1−α keeps)."""

    def _score_df(self, eg):
        from linkgraph.algs.sparsification import local_degree_score

        return local_degree_score(eg)


class LocalSimilaritySparsifier(_Sparsifier):
    def _score_df(self, eg):
        from linkgraph.algs.sparsification import local_similarity_score

        return local_similarity_score(eg)


class SCANSparsifier(_Sparsifier):
    def _score_df(self, eg):
        from linkgraph.algs.sparsification import scan_structural_similarity

        return scan_structural_similarity(eg)


class MultiscaleSparsifier(_Sparsifier):
    def _score_df(self, eg):
        from linkgraph.algs.sparsification import multiscale_score

        return multiscale_score(eg)


class ForestFireSparsifier(_Sparsifier):
    def __init__(self, burnProbability: float = 0.3,
                 targetBurntRatio: float = 2.0, seed: int | None = None):
        self._p, self._ratio = burnProbability, targetBurntRatio
        self._seed = _SEED if seed is None else seed

    def _score_df(self, eg):
        from linkgraph.algs.sparsification import forest_fire_score

        return forest_fire_score(eg, p_burn=self._p, seed=self._seed)


class SimmelianSparsifierNonParametric(_Sparsifier):
    def __init__(self, maxRank: int = 10):
        self._max_rank = maxRank

    def _score_df(self, eg):
        from linkgraph.algs.edgescores import simmelian_overlap_score

        df = simmelian_overlap_score(eg, max_rank=self._max_rank)
        # engine emits the overlap as its own column name; normalize
        cols = df.columns
        score_col = [c for c in cols if c not in ("src", "dst")][0]
        return df.withColumnRenamed(score_col, "score")


class RandomEdgeSparsifier(_Sparsifier):
    """Keep a uniform ``parameter`` fraction of edges (score ≤ ratio)."""

    _keep_above = False

    def __init__(self, seed: int | None = None):
        self._seed = _SEED if seed is None else seed

    def _score_df(self, eg):
        from linkgraph.algs.sparsification import random_edge_score

        return random_edge_score(eg, seed=self._seed)


class GlobalThresholdFilter:
    """REF⚠ sparsification/GlobalThresholdFilter.cpp: calculate(G, scores)
    keeps edges whose score passes the threshold."""

    def __init__(self, G: Graph, scores: dict[tuple, float], threshold: float,
                 above: bool = True):
        self._G, self._scores = G, scores
        self._t, self._above = threshold, above

    def calculate(self) -> Graph:
        H = Graph(self._G.numberOfNodes(), weighted=self._G.isWeighted(),
                  directed=False)
        for (u, v), s in sorted(self._scores.items()):
            keep = s >= self._t if self._above else s <= self._t
            if keep and self._G.hasEdge(u, v):
                H.addEdge(u, v, self._G.weight(u, v))
        return H


# -- flow / matching / spanning ------------------------------------------------


class EdmondsKarp:
    """Max s-t flow (REF⚠ flow/EdmondsKarp.cpp; the engine's distributed
    push-relabel computes the same maximum): run() then getMaxFlow() /
    getFlow(u, v) / getSourceSet()."""

    def __init__(self, G: Graph, source: int, sink: int):
        self._G, self._s, self._t = G, int(source), int(sink)
        self._value: float | None = None
        self._flows: dict[tuple, float] = {}
        self._caps: dict[tuple, float] = {}

    def run(self):
        from linkgraph.algs.flow import max_flow

        value, flows = max_flow(self._G._engine(), self._s, self._t)
        self._value = float(value)
        rows = flows.collect()
        self._flows = {(int(r.src), int(r.dst)): float(r.flow) for r in rows}
        self._caps = {(int(r.src), int(r.dst)): float(r.cap) for r in rows}
        return self

    def getMaxFlow(self) -> float:
        assert self._value is not None, "call run() first"
        return self._value

    def getFlow(self, u: int, v: int) -> float:
        assert self._value is not None, "call run() first"
        return self._flows.get((u, v), 0.0)

    def getSourceSet(self) -> set:
        """Vertices on the source side of the min cut: residual-reachable
        from s (cap − flow > 0, plus reverse residual arcs)."""
        assert self._value is not None, "call run() first"
        residual: dict[int, set] = {}
        for (a, b), c in self._caps.items():
            fw = self._flows.get((a, b), 0.0)
            if c - fw > 1e-12:
                residual.setdefault(a, set()).add(b)
            if fw > 1e-12:
                residual.setdefault(b, set()).add(a)
        seen, stack = {self._s}, [self._s]
        while stack:
            x = stack.pop()
            for y in residual.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return seen


class Matching:
    """REF⚠ matching/Matching.hpp: mate(u) / isMatched(u) / areMatched /
    size() / weight()."""

    def __init__(self, pairs: list[tuple[int, int, float]]):
        self._mate: dict[int, int] = {}
        self._w = 0.0
        for u, v, w in pairs:
            self._mate[int(u)] = int(v)
            self._mate[int(v)] = int(u)
            self._w += float(w)

    def mate(self, u: int) -> int | None:
        return self._mate.get(u)

    def isMatched(self, u: int) -> bool:
        return u in self._mate

    def areMatched(self, u: int, v: int) -> bool:
        return self._mate.get(u) == v

    def size(self, G: Graph | None = None) -> int:
        return len(self._mate) // 2

    def weight(self, G: Graph | None = None) -> float:
        return self._w


class _MatcherAlgo:
    def __init__(self, G: Graph):
        self._G = G
        self._matching: Matching | None = None

    def _pairs_df(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def run(self):
        rows = self._pairs_df().collect()
        self._matching = Matching(
            [(int(r.u), int(r.v), float(r.weight)) for r in rows]
        )
        return self

    def getMatching(self) -> Matching:
        assert self._matching is not None, "call run() first"
        return self._matching


class SuitorMatcher(_MatcherAlgo):
    def _pairs_df(self):
        from linkgraph.algs.matching import suitor_matching

        return suitor_matching(self._G._engine())


class BSuitorMatcher(_MatcherAlgo):
    """b-matching: mate() returns ONE partner; use getMatching()._mate
    multiplicity via matesOf()."""

    def __init__(self, G: Graph, b: int = 2):
        super().__init__(G)
        self._b = b
        self._mates: dict[int, list] = {}

    def _pairs_df(self):
        from linkgraph.algs.matching import b_suitor_matching

        return b_suitor_matching(self._G._engine(), b=self._b)

    def run(self):
        rows = self._pairs_df().collect()
        pairs = [(int(r.u), int(r.v), float(r.weight)) for r in rows]
        self._mates = {}
        for u, v, _ in pairs:
            self._mates.setdefault(u, []).append(v)
            self._mates.setdefault(v, []).append(u)
        # Matching stores one mate per vertex; keep the full map separately
        self._matching = Matching(pairs[:0])
        self._matching._mate = {u: vs[0] for u, vs in self._mates.items()}
        self._matching._w = sum(w for _, _, w in pairs)
        return self

    def matesOf(self, u: int) -> list:
        return list(self._mates.get(u, []))


class PathGrowingMatcher(_MatcherAlgo):
    def _pairs_df(self):
        from linkgraph.algs.matching import path_growing_matching

        return path_growing_matching(self._G._engine())


class SpanningForest:
    """REF⚠ graph/SpanningForest.cpp: run() then getForest()."""

    _maximum = False

    def __init__(self, G: Graph):
        self._G = G
        self._forest: Graph | None = None

    def run(self):
        from linkgraph.algs.spanning import spanning_forest

        df = spanning_forest(self._G._engine(), maximum=self._maximum)
        self._forest = Graph.fromEdgesDF(
            df, directed=False, weighted=self._G.isWeighted(),
            n=self._G.numberOfNodes(),
        )
        return self

    def getForest(self) -> Graph:
        assert self._forest is not None, "call run() first"
        return self._forest


class RandomMaximumSpanningForest(SpanningForest):
    _maximum = True

    def getMSF(self) -> Graph:
        return self.getForest()


# -- cliques -------------------------------------------------------------------


class MaximalCliques:
    """REF⚠ clique/MaximalCliques.cpp: run() then getCliques()."""

    def __init__(self, G: Graph, maximumOnly: bool = False):
        self._G, self._maximum_only = G, maximumOnly
        self._cliques: list[list[int]] | None = None

    def run(self):
        from linkgraph.algs.cliques import maximal_cliques

        rows = maximal_cliques(self._G._engine()).collect()
        cliques = sorted(
            [sorted(int(v) for v in r.members) for r in rows],
            key=lambda c: (-len(c), c),
        )
        if self._maximum_only and cliques:
            cliques = [cliques[0]]
        self._cliques = cliques
        return self

    def getCliques(self) -> list[list[int]]:
        assert self._cliques is not None, "call run() first"
        return [list(c) for c in self._cliques]


# -- selective community detection (scd) ----------------------------------------


class _SCDAlgo:
    """REF⚠ scd/SelectiveCommunityDetector.hpp protocol: run(seeds)
    returns {seed: community set}; expandOneCommunity(seed) one set."""

    def __init__(self, G: Graph):
        self._G = G

    def _community(self, seed: int) -> set:  # pragma: no cover - abstract
        raise NotImplementedError

    def expandOneCommunity(self, seed: int) -> list:
        return sorted(self._community(seed))

    def run(self, seeds: list) -> dict[int, set]:
        return {int(s): self._community(int(s)) for s in seeds}


class PageRankNibble(_SCDAlgo):
    def __init__(self, G: Graph, alpha: float = 0.15, epsilon: float = 1e-8):
        super().__init__(G)
        self._alpha, self._eps = alpha, epsilon

    def _community(self, seed):
        from linkgraph.algs.scd import pagerank_nibble

        df = pagerank_nibble(self._G._engine(), [seed], alpha=self._alpha,
                             tol=self._eps)
        return {int(r.id) for r in df.collect()}


class GCE(_SCDAlgo):
    def __init__(self, G: Graph, maxSize: int = 100):
        super().__init__(G)
        self._max_size = maxSize

    def _community(self, seed):
        from linkgraph.algs.scd import gce

        return {int(r.id) for r in
                gce(self._G._engine(), [seed], max_size=self._max_size).collect()}


class LFMLocal(_SCDAlgo):
    def __init__(self, G: Graph, alpha: float = 1.0, maxSize: int = 100):
        super().__init__(G)
        self._alpha, self._max_size = alpha, maxSize

    def _community(self, seed):
        from linkgraph.algs.scd import lfm_local

        return {int(r.id) for r in
                lfm_local(self._G._engine(), [seed], alpha=self._alpha,
                          max_size=self._max_size).collect()}


class TCE(_SCDAlgo):
    def __init__(self, G: Graph, maxSize: int = 100):
        super().__init__(G)
        self._max_size = maxSize

    def _community(self, seed):
        from linkgraph.algs.scd import tce

        return {int(r.id) for r in
                tce(self._G._engine(), [seed], max_size=self._max_size).collect()}


class LocalTightnessExpansion(_SCDAlgo):
    def __init__(self, G: Graph, maxSize: int = 100):
        super().__init__(G)
        self._max_size = maxSize

    def _community(self, seed):
        from linkgraph.algs.scd import local_tightness_expansion

        return {int(r.id) for r in
                local_tightness_expansion(self._G._engine(), [seed],
                                          max_size=self._max_size).collect()}


class CombinedSCD(_SCDAlgo):
    def __init__(self, G: Graph, maxSize: int = 100):
        super().__init__(G)
        self._max_size = maxSize

    def _community(self, seed):
        from linkgraph.algs.scd import combined_scd

        return {int(r.id) for r in
                combined_scd(self._G._engine(), [seed],
                             max_size=self._max_size).collect()}


class RandomBFS(_SCDAlgo):
    def __init__(self, G: Graph, size: int = 50):
        super().__init__(G)
        self._size = size

    def _community(self, seed):
        from linkgraph.algs.scd import random_bfs_community

        return {int(r.id) for r in
                random_bfs_community(self._G._engine(), seed,
                                     size=self._size).collect()}


# -- embedding / simulation ------------------------------------------------------


class Node2Vec:
    """REF⚠ embedding/Node2Vec.cpp: run() then getFeatures() (list of
    D-dim vectors indexed by node; nodes unseen by any walk get zeros)."""

    def __init__(self, G: Graph, P: float = 1.0, Q: float = 1.0, L: int = 10,
                 N: int = 8, D: int = 32, seed: int | None = None):
        self._G = G
        self._p, self._q, self._l, self._n, self._d = P, Q, L, N, D
        self._seed = _SEED if seed is None else seed
        self._feat: list | None = None

    def run(self):
        from linkgraph.algs.embedding import node2vec_embeddings

        rows = node2vec_embeddings(
            self._G._engine(), dim=self._d, walks_per_node=self._n,
            walk_length=self._l, p=self._p, q=self._q, seed=self._seed,
        ).collect()
        by_id = {int(r.id): [float(x) for x in r.embedding] for r in rows}
        self._feat = [
            by_id.get(v, [0.0] * self._d)
            for v in range(self._G.numberOfNodes())
        ]
        return self

    def getFeatures(self) -> list:
        assert self._feat is not None, "call run() first"
        return [list(f) for f in self._feat]


class EpidemicSimulationSEIR:
    """REF⚠ simulation/EpidemicSimulationSEIR.cpp: run() then getData()
    — [(tick, nS, nE, nI, nR)] census rows."""

    def __init__(self, G: Graph, tMax: int = 32, transP: float = 0.5,
                 eTime: int = 2, iTime: int = 4, zero: int = 0,
                 seed: int | None = None):
        self._G = G
        self._args = (tMax, transP, eTime, iTime, zero,
                      _SEED if seed is None else seed)
        self._census: list | None = None

    def run(self):
        from linkgraph.algs.simulation import seir

        t_max, p, e_t, i_t, zero, seed = self._args
        _, census = seir(
            self._G._engine(), [zero], p_transmit=p, t_latent=e_t,
            t_infectious=i_t, ticks=t_max, seed=seed,
        )
        self._census = [tuple(int(x) for x in row) for row in census]
        return self

    def getData(self) -> list:
        assert self._census is not None, "call run() first"
        return list(self._census)


# -- generators (round-3 breadth) -------------------------------------------------


class HyperbolicGenerator(_Generator):
    """Threshold (T=0) random hyperbolic graph
    (REF⚠ generators/HyperbolicGenerator.cpp)."""

    def __init__(self, n: int, k: float = 6.0, gamma: float = 3.0,
                 T: float = 0.0, seed: int | None = None):
        if T != 0.0:
            raise ValueError("only the threshold model (T=0) is implemented")
        self._n, self._k, self._gamma = n, k, gamma
        self._seed = _SEED if seed is None else seed
        self._n_known = n

    def _edges_df(self):
        from linkgraph.generators import hyperbolic

        return hyperbolic(_spark(), self._n, avg_degree=self._k,
                          gamma=self._gamma, seed=self._seed)


class WattsStrogatzGenerator(_Generator):
    def __init__(self, nNodes: int, nNeighbors: int, p: float,
                 seed: int | None = None):
        self._n, self._k, self._p = nNodes, nNeighbors, p
        self._seed = _SEED if seed is None else seed
        self._n_known = nNodes

    def _edges_df(self):
        from linkgraph.generators import watts_strogatz

        return watts_strogatz(_spark(), self._n, k=2 * self._k, p=self._p,
                              seed=self._seed)


class ChungLuGenerator(_Generator):
    def __init__(self, degreeSequence: list, seed: int | None = None):
        self._deg = [int(d) for d in degreeSequence]
        self._seed = _SEED if seed is None else seed
        self._n_known = len(self._deg)

    def _edges_df(self):
        from linkgraph.generators import chung_lu

        return chung_lu(_spark(), self._deg, seed=self._seed)


class ClusteredRandomGraphGenerator(_Generator):
    """REF⚠ generators/ClusteredRandomGraphGenerator.cpp — generate() then
    getCommunities() for the planted partition."""

    def __init__(self, n: int, k: int, pIntra: float, pInter: float,
                 seed: int | None = None):
        self._args = (n, k, pIntra, pInter)
        self._seed = _SEED if seed is None else seed
        self._n_known = n
        self._labels: dict[int, int] | None = None

    def _edges_df(self):
        from linkgraph.generators import clustered_random_graph

        n, k, p_in, p_out = self._args
        edges, labels = clustered_random_graph(
            _spark(), n, k, p_in=p_in, p_out=p_out, seed=self._seed
        )
        self._labels = {int(r.id): int(r.label) for r in labels.collect()}
        return edges

    def getCommunities(self) -> "Partition":
        assert self._labels is not None, "call generate() first"
        return Partition(self._labels, self._args[0])


class MocnikGenerator(_Generator):
    def __init__(self, dim: int = 2, n: int = 100, k: float = 2.5,
                 seed: int | None = None):
        self._dim, self._n, self._k = dim, n, k
        self._seed = _SEED if seed is None else seed
        self._n_known = n
        self._directed = True  # the reference emits both directions

    def _edges_df(self):
        from linkgraph.generators import mocnik

        return mocnik(_spark(), self._n, dim=self._dim, k=self._k,
                      seed=self._seed)


class DorogovtsevMendesGenerator(_Generator):
    def __init__(self, nNodes: int, seed: int | None = None):
        self._n = nNodes
        self._seed = _SEED if seed is None else seed
        self._n_known = nNodes

    def _edges_df(self):
        from linkgraph.generators import dorogovtsev_mendes

        return dorogovtsev_mendes(_spark(), self._n, seed=self._seed)


class HavelHakimiGenerator(_Generator):
    def __init__(self, sequence: list, ignoreIfRealizable: bool = False):
        self._seq = [int(d) for d in sequence]
        self._ignore = ignoreIfRealizable
        self._n_known = len(self._seq)

    def _edges_df(self):
        from linkgraph.generators import havel_hakimi

        try:
            return havel_hakimi(_spark(), self._seq)
        except ValueError:
            if not self._ignore:
                raise
            # reference semantics: realize as much of the sequence as
            # possible — fall back to Chung-Lu expected degrees
            from linkgraph.generators import chung_lu

            return chung_lu(_spark(), self._seq, seed=_SEED)


class EdgeSwitchingMarkovChainGenerator(_Generator):
    """Havel–Hakimi realization + degree-preserving edge switching
    (REF⚠ generators/EdgeSwitchingMarkovChainGenerator.cpp)."""

    def __init__(self, sequence: list, numSwitchesPerEdge: int = 10,
                 seed: int | None = None):
        self._seq = [int(d) for d in sequence]
        self._rounds = numSwitchesPerEdge
        self._seed = _SEED if seed is None else seed
        self._n_known = len(self._seq)

    def _edges_df(self):
        from linkgraph.algs.sparsification import edge_switching
        from linkgraph.generators import havel_hakimi
        from linkgraph.graph import Graph as EG

        base = havel_hakimi(_spark(), self._seq)
        g = EG.from_edges(base, directed=False, weighted=False)
        return edge_switching(g, rounds=self._rounds, seed=self._seed).edges


class LFRGenerator(_Generator):
    """REF⚠ generators/LFRGenerator.cpp — kwargs instead of the
    reference's setter chain; generate() then getPartition()."""

    def __init__(self, n: int, mu: float = 0.1, avgDegree: float = 10.0,
                 tauDegree: float = 2.5, tauCommunity: float = 1.5,
                 minCommunity: int = 20, seed: int | None = None):
        self._kw = dict(
            n=n, mu=mu, avg_degree=avgDegree, tau_degree=tauDegree,
            tau_community=tauCommunity, min_community=minCommunity,
            seed=_SEED if seed is None else seed,
        )
        self._n_known = n
        self._labels: dict[int, int] | None = None

    def _edges_df(self):
        from linkgraph.generators import lfr

        edges, labels = lfr(_spark(), **self._kw)
        self._labels = {int(r.id): int(r.label) for r in labels.collect()}
        return edges

    def getPartition(self) -> "Partition":
        assert self._labels is not None, "call generate() first"
        return Partition(self._labels, self._kw["n"])


class PubWebGenerator(_Generator):
    def __init__(self, numNodes: int, numberOfDenseAreas: int = 0,
                 neighbourhoodRadius: float = 0.125,
                 maxNumberOfNeighbors: int = 0, seed: int | None = None):
        self._n, self._r = numNodes, neighbourhoodRadius
        self._seed = _SEED if seed is None else seed
        self._n_known = numNodes

    def _edges_df(self):
        from linkgraph.generators import pubweb

        return pubweb(_spark(), self._n, neighborhood_radius=self._r,
                      seed=self._seed)


# -- graphtools ------------------------------------------------------------------


class _GraphTools:
    """networkit.graphtools module analogue — every function takes and
    returns facade Graphs, delegating the graph transformation to the
    engine (REF⚠ graph/GraphTools.hpp)."""

    @staticmethod
    def toUndirected(G: Graph) -> Graph:
        eg = G._engine().to_undirected()
        return Graph.fromEdgesDF(eg.edges, directed=False,
                                 weighted=G.isWeighted(),
                                 n=G.numberOfNodes())

    @staticmethod
    def toUnweighted(G: Graph) -> Graph:
        eg = G._engine().to_unweighted()
        return Graph.fromEdgesDF(eg.edges, directed=G.isDirected(),
                                 weighted=False, n=G.numberOfNodes())

    @staticmethod
    def transpose(G: Graph) -> Graph:
        if not G.isDirected():
            raise ValueError("transpose is defined for directed graphs")
        eg = G._engine().transpose()
        return Graph.fromEdgesDF(eg.edges, directed=True,
                                 weighted=G.isWeighted(),
                                 n=G.numberOfNodes())

    @staticmethod
    def subgraphFromNodes(G: Graph, nodes) -> Graph:
        ids = sorted(int(v) for v in nodes)
        df = _spark().createDataFrame([(v,) for v in ids], "id bigint")
        eg = G._engine().subgraph(df)
        # reference keeps original ids; facade Graph needs the id range
        return Graph.fromEdgesDF(eg.edges, directed=G.isDirected(),
                                 weighted=G.isWeighted(),
                                 n=G.numberOfNodes())

    @staticmethod
    def density(G: Graph) -> float:
        return float(G._engine().density())

    @staticmethod
    def volume(G: Graph) -> float:
        return float(G._engine().volume())

    @staticmethod
    def maxDegree(G: Graph) -> int:
        return int(G._engine().max_degree())

    @staticmethod
    def size(G: Graph) -> tuple[int, int]:
        return (G.numberOfNodes(), G.numberOfEdges())

    @staticmethod
    def append(G: Graph, H: Graph) -> Graph:
        """Disjoint union: H's ids shifted past G's (engine id-shift)."""
        eg = G._engine().append(H._engine())
        return Graph.fromEdgesDF(
            eg.edges, directed=G.isDirected(), weighted=G.isWeighted(),
            n=G.numberOfNodes() + H.numberOfNodes(),
        )

    @staticmethod
    def merge(G: Graph, H: Graph) -> Graph:
        """Shared-id union (max-weight dedup, engine merge)."""
        eg = G._engine().merge(H._engine())
        return Graph.fromEdgesDF(
            eg.edges, directed=G.isDirected(), weighted=G.isWeighted(),
            n=max(G.numberOfNodes(), H.numberOfNodes()),
        )

    @staticmethod
    def topologicalSort(G: Graph) -> list:
        from linkgraph.algs.dag import topological_order

        rows = topological_order(G._engine()).orderBy("pos").collect()
        return [int(r.id) for r in rows]

    @staticmethod
    def randomNode(G: Graph, seed: int | None = None) -> int:
        n = G.numberOfNodes()
        if n == 0:
            raise ValueError("empty graph")
        s = _SEED if seed is None else seed
        x = (s * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return int((x ^ (x >> 31)) % n)

    @staticmethod
    def randomNodes(G: Graph, k: int, seed: int | None = None) -> list:
        n = G.numberOfNodes()
        s = _SEED if seed is None else seed
        picked: list = []
        i = 0
        while len(picked) < min(k, n):
            v = _GraphTools.randomNode(G, seed=s + i)
            if v not in picked:
                picked.append(v)
            i += 1
        return picked


class ReachableNodes:
    """REF⚠ reachability/ReachableNodes.cpp — per-vertex reachable-set
    sizes. ``exact=True`` runs the exact closure (component sizes on
    undirected graphs); ``exact=False`` the FM-sketch estimator, whose
    values feed both bounds (the reference keeps sampled LB/UB; the
    sketch analogue is a point estimate, so LB = UB = round(est))."""

    def __init__(self, G: Graph, exact: bool = True):
        self._G, self._exact = G, exact
        self._r: dict[int, float] | None = None

    def run(self):
        from linkgraph.algs.reachability import (
            reachable_nodes,
            reachable_nodes_estimate,
        )

        if self._exact:
            rows = reachable_nodes(self._G._engine()).collect()
            self._r = {int(r.id): float(r.reachable) for r in rows}
        else:
            rows = reachable_nodes_estimate(self._G._engine()).collect()
            self._r = {int(r.id): float(r.est) for r in rows}
        return self

    def numberOfReachableNodes(self, u: int) -> int:
        assert self._r is not None, "call run() first"
        if self._exact and u not in self._r:
            return 1  # isolated facade vertex reaches only itself
        return int(round(self._r.get(u, 1.0)))

    def numberOfReachableNodesLB(self, u: int) -> int:
        return self.numberOfReachableNodes(u)

    def numberOfReachableNodesUB(self, u: int) -> int:
        return self.numberOfReachableNodes(u)

    def exact(self) -> bool:
        return self._exact


class AllSimplePaths:
    """REF⚠ reachability/AllSimplePaths.cpp — every simple source→target
    path under ``cutoff`` edges."""

    def __init__(self, G: Graph, source: int, target: int, cutoff: int = 8):
        self._G = G
        self._s, self._t, self._cutoff = int(source), int(target), int(cutoff)
        self._paths: list[list[int]] | None = None

    def run(self):
        from linkgraph.algs.reachability import all_simple_paths

        rows = all_simple_paths(
            self._G._engine(), self._s, self._t, cutoff=self._cutoff
        ).collect()
        self._paths = sorted([int(v) for v in r.path] for r in rows)
        return self

    def numberOfSimplePaths(self) -> int:
        assert self._paths is not None, "call run() first"
        return len(self._paths)

    def getAllSimplePaths(self) -> list:
        assert self._paths is not None, "call run() first"
        return self._paths

    def forAllSimplePaths(self, callback) -> None:
        for p in self.getAllSimplePaths():
            callback(p)


class MultiTargetBFS:
    """REF⚠ distance/MultiTargetBFS.cpp — hop distances source→targets,
    stopping once every target settles (STSP protocol: getDistances()
    aligned with getTargetIndexMap())."""

    _weighted = False

    def __init__(self, G: Graph, source: int, targets: list):
        self._G, self._source = G, int(source)
        self._targets = [int(t) for t in targets]
        self._d: dict[int, float] | None = None

    def run(self):
        from linkgraph.algs.bfs import multi_target_bfs, multi_target_sssp

        fn = multi_target_sssp if self._weighted else multi_target_bfs
        rows = fn(self._G._engine(), self._source, self._targets).collect()
        self._d = {int(r.id): float(r.dist) for r in rows}
        return self

    def getTargetIndexMap(self) -> dict:
        return {t: i for i, t in enumerate(self._targets)}

    def distance(self, t: int) -> float:
        assert self._d is not None, "call run() first"
        return self._d.get(int(t), math.inf)

    def getDistances(self) -> list:
        return [self.distance(t) for t in self._targets]


class MultiTargetDijkstra(MultiTargetBFS):
    """REF⚠ distance/MultiTargetDijkstra.cpp — weighted multi-target
    distances (distributed relaxation rounds with the settled-targets
    early exit)."""

    _weighted = True


class GraphDifference:
    """REF⚠ dynamics/GraphDifference.cpp — the edit script transforming
    G1 into G2, as (op, src, dst, weight) tuples compatible with the
    streaming delta schema (op ∈ add_edge / remove_edge / update_weight)."""

    def __init__(self, G1: Graph, G2: Graph):
        self._G1, self._G2 = G1, G2
        self._edits: list[tuple] | None = None

    def run(self):
        from linkgraph.streaming.deltas import graph_difference

        rows = graph_difference(
            self._G1._engine().edges, self._G2._engine().edges
        ).collect()
        self._edits = sorted(
            (r.op, int(r.src), int(r.dst), float(r.weight)) for r in rows
        )
        return self

    def getEdits(self) -> list:
        assert self._edits is not None, "call run() first"
        return self._edits

    def getNumberOfEdits(self) -> int:
        return len(self.getEdits())

    def getNumberOfEdgeAdditions(self) -> int:
        return sum(1 for e in self.getEdits() if e[0] == "add_edge")

    def getNumberOfEdgeRemovals(self) -> int:
        return sum(1 for e in self.getEdits() if e[0] == "remove_edge")

    def getNumberOfEdgeWeightUpdates(self) -> int:
        return sum(1 for e in self.getEdits() if e[0] == "update_weight")


class AdjustedRandIndex(_LinkPredictor):
    """REF⚠ linkprediction/AdjustedRandIndex.cpp — ARI of the two
    neighborhood indicator partitions."""

    def _score_df(self):
        from linkgraph.algs.linkpred import adjusted_rand_index

        return adjusted_rand_index(self._G._engine())


class NeighborsMeasureIndex(_LinkPredictor):
    """REF⚠ linkprediction/NeighborsMeasureIndex.cpp — Friends measure
    (common neighbors + connected neighbor pairs)."""

    def _score_df(self):
        from linkgraph.algs.linkpred import neighbors_measure

        return neighbors_measure(self._G._engine())


class AlgebraicDistanceIndex(_LinkPredictor):
    """REF⚠ linkprediction/AlgebraicDistanceIndex.cpp — ℓ2 algebraic
    distance between JOR-smoothed coordinates (smaller = more similar;
    pairs outside the candidate set score 0.0 per the facade contract,
    so compare within the candidate set)."""

    def __init__(self, G: Graph, n_systems: int = 8, n_iters: int = 20,
                 omega: float = 0.5, seed: int | None = None):
        super().__init__(G)
        self._kw = dict(
            n_systems=n_systems, n_iters=n_iters, omega=omega,
            seed=_SEED if seed is None else seed,
        )

    def preprocess(self):
        """Reference protocol: explicit preprocessing hook (coordinates
        are computed lazily on first lookup either way)."""
        return self

    def _score_df(self):
        from linkgraph.algs.linkpred import algebraic_distance_index

        return algebraic_distance_index(self._G._engine(), **self._kw)


class ReverseBFS:
    """REF⚠ distance/ReverseBFS.cpp — BFS along REVERSED edge direction
    (distances TO the source); same protocol as BFS."""

    def __init__(self, G: Graph, source: int):
        self._G, self._source = G, int(source)
        self._d: dict[int, float] | None = None

    def run(self):
        from linkgraph.algs.bfs import bfs

        eng = self._G._engine().transpose() if self._G.isDirected() else self._G._engine()
        self._d = {
            int(r.id): float(r.dist) for r in bfs(eng, self._source).collect()
        }
        return self

    def distance(self, v: int) -> float:
        assert self._d is not None, "call run() first"
        return self._d.get(int(v), math.inf)

    def getDistances(self) -> list:
        n = self._G.numberOfNodes()
        return [self.distance(v) for v in range(n)]


class BidirectionalDijkstra:
    """REF⚠ distance/BidirectionalDijkstra.cpp — weighted point-to-point
    distance via meeting frontiers."""

    def __init__(self, G: Graph, source: int, target: int):
        self._G, self._s, self._t = G, int(source), int(target)
        self._dist: float | None = None

    def run(self):
        from linkgraph.algs.bfs import bidirectional_dijkstra

        self._dist = bidirectional_dijkstra(self._G._engine(), self._s, self._t)
        return self

    def getDistance(self) -> float:
        return math.inf if self._dist is None else float(self._dist)


class SCDGroundTruthComparison:
    """REF⚠ scd/SCDGroundTruthComparison.cpp — score seed-set detection
    results against a ground-truth cover. Inputs are the engine's
    DataFrame shapes: ``detected`` (seed, id), ``truth_cover``
    (id, label)."""

    def __init__(self, detected, truth_cover, ignore_seeds: bool = False):
        self._det, self._cov, self._ign = detected, truth_cover, ignore_seeds
        self._rows: list | None = None

    def run(self):
        from linkgraph.algs.scd import ground_truth_comparison

        self._rows = ground_truth_comparison(
            self._det, self._cov, ignore_seeds=self._ign
        ).collect()
        return self

    def _col(self, name) -> dict:
        assert self._rows is not None, "call run() first"
        return {int(r.seed): float(r[name]) for r in self._rows}

    def getIndividualPrecision(self) -> dict:
        return self._col("precision")

    def getIndividualRecall(self) -> dict:
        return self._col("recall")

    def getIndividualF1(self) -> dict:
        return self._col("f1")

    def getIndividualJaccard(self) -> dict:
        return self._col("jaccard")

    def _avg(self, name) -> float:
        vals = self._col(name).values()
        return sum(vals) / len(vals) if vals else 0.0

    def getAveragePrecision(self) -> float:
        return self._avg("precision")

    def getAverageRecall(self) -> float:
        return self._avg("recall")

    def getAverageF1(self) -> float:
        return self._avg("f1")

    def getAverageJaccard(self) -> float:
        return self._avg("jaccard")


graphtools = _GraphTools()


class Luby:
    """Luby maximal independent set (REF⚠ independentset/Luby.cpp): the
    reference's ``run(G)`` returns a boolean membership vector and
    ``isIndependentSet`` re-checks a candidate set."""

    def run(self, G: Graph) -> list[bool]:
        from linkgraph.algs.independentset import luby_independent_set

        df = luby_independent_set(G._engine())
        got = {int(r.id): bool(r.in_mis) for r in df.collect()}
        # vertices absent from the edge table are isolated → always in MIS
        return [got.get(v, True) for v in range(G.numberOfNodes())]

    def isIndependentSet(self, candidate, G: Graph) -> bool:
        from pyspark.sql import functions as F

        s = (
            {v for v, b in enumerate(candidate) if b}
            if isinstance(candidate, (list, tuple))
            else set(candidate)
        )
        rows = (
            G._engine()
            .symmetric_edges()
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .collect()
        )
        return not any(r.src in s and r.dst in s for r in rows)


class GephiStreamingClient:
    """REF⚠ gephi/streaming.py::GephiStreamingClient — push a graph and
    per-node attribute values to a Gephi master through the Graph
    Streaming JSON protocol. Pass ``out_dir=`` to write each export as an
    ordered JSON-lines file instead of POSTing (the sandbox has no Gephi
    server; the bytes are identical — replay later with curl)."""

    def __init__(
        self,
        url: str = "http://localhost:8080/workspace0?operation=updateGraph",
        out_dir: str | None = None,
    ):
        self._url = url
        self._dir = out_dir
        self._n = 0

    def _sink(self, events) -> None:
        from linkgraph.gephi import post_events, write_event_stream

        if self._dir is not None:
            self._n += 1
            write_event_stream(events, f"{self._dir}/export_{self._n}")
        else:  # pragma: no cover - needs a live Gephi master
            post_events(events, self._url)

    def exportGraph(self, G: Graph) -> None:
        from linkgraph.gephi import graph_events

        self._sink(graph_events(G._engine()))

    def exportNodeValues(self, G: Graph, values, name: str) -> None:
        from linkgraph.gephi import attribute_events

        df = _spark().createDataFrame(
            [(int(v), float(x)) for v, x in enumerate(values)],
            f"id bigint, {name} double",
        )
        self._sink(attribute_events(df))

    def clearGraph(self) -> None:
        from pyspark.sql import functions as F

        ev = _spark().range(1).select(
            F.lit(0).cast("bigint").alias("seq"),
            F.lit('{"dn":{"filter":"ALL"}}').alias("event"),
        )
        self._sink(ev)


class GraphEvent:
    """REF⚠ dynamics/GraphEvent.hpp — one timestamped mutation record.
    Types mirror the reference enum; TIME_STEP is a barrier marker."""

    NODE_ADDITION = "NODE_ADDITION"
    NODE_REMOVAL = "NODE_REMOVAL"
    EDGE_ADDITION = "EDGE_ADDITION"
    EDGE_REMOVAL = "EDGE_REMOVAL"
    EDGE_WEIGHT_UPDATE = "EDGE_WEIGHT_UPDATE"
    TIME_STEP = "TIME_STEP"

    def __init__(self, type: str, u: int = 0, v: int = 0, w: float = 1.0):
        self.type = type
        self.u = int(u)
        self.v = int(v)
        self.w = float(w)

    def __repr__(self):  # pragma: no cover - debugging nicety
        return f"GraphEvent({self.type}, {self.u}, {self.v}, {self.w})"


class GraphUpdater:
    """REF⚠ dynamics/GraphUpdater.cpp — replay a GraphEvent stream onto a
    graph. Driver-side by design (it mutates the facade's edge buffer;
    the DataFrame materializes on the next algorithm run). For
    corpus-scale delta streams use linkgraph.streaming.deltas
    (apply_deltas / stream_apply_deltas) instead."""

    def __init__(self, G: Graph):
        self._G = G
        self._n_events = 0

    def update(self, events) -> None:
        for e in events:
            self._n_events += 1
            if e.type == GraphEvent.NODE_ADDITION:
                self._G.addNodes(1)
            elif e.type == GraphEvent.EDGE_ADDITION:
                self._G.addEdge(e.u, e.v, e.w)
            elif e.type == GraphEvent.NODE_REMOVAL:
                self._G.removeNode(e.u)
            elif e.type == GraphEvent.EDGE_REMOVAL:
                self._G.removeEdge(e.u, e.v)
            elif e.type == GraphEvent.EDGE_WEIGHT_UPDATE:
                self._G.setWeight(e.u, e.v, e.w)
            elif e.type == GraphEvent.TIME_STEP:
                pass
            else:
                raise ValueError(f"unsupported event type: {e.type}")

    def getNumberOfGraphEvents(self) -> int:
        return self._n_events


# -- engineering module analogues (networkit/engineering.pyx) ---------------
# The reference controls OpenMP threads; here "threads" means the local
# Spark master's cores (informational on a real cluster, where
# parallelism is executors × cores and set at session build).


def setNumberOfThreads(n: int) -> None:  # noqa: N802 - reference casing
    """No-op on a running session (Spark fixes master parallelism at
    session start, unlike OpenMP) — records the request so scripts
    porting `nk.setNumberOfThreads(8)` run unchanged; honored only if a
    new session is built afterwards via linkgraph.session.get_spark."""
    global _requested_threads
    _requested_threads = int(n)


_requested_threads: int | None = None


def getCurrentNumberOfThreads() -> int:  # noqa: N802
    sc = _spark().sparkContext
    return int(sc.defaultParallelism)


def getMaxNumberOfThreads() -> int:  # noqa: N802
    import os

    return _requested_threads or os.cpu_count() or 1


def enableNestedParallelism() -> None:  # noqa: N802
    """Reference toggle for nested OpenMP — meaningless under Spark's
    task model; kept for script compatibility."""
