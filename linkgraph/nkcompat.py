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
]


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
        self._eg = None
        self._edges[self._key(u, v)] = float(w) if self._weighted else 1.0

    def removeEdge(self, u: int, v: int) -> None:
        self._eg = None
        del self._edges[self._key(u, v)]

    def setWeight(self, u: int, v: int, w: float) -> None:
        self.addEdge(u, v, w)

    # -- accessors (reference surface) -------------------------------------
    def numberOfNodes(self) -> int:
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
        return iter(range(self._n))

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
        self._scores = _fill(
            self._compute(), self._G.numberOfNodes(), self._default
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


_READERS = {
    Format.METIS: "read_metis",
    Format.SNAP: "read_snap",
    Format.KONECT: "read_konect",
    Format.GML: "read_gml",
    Format.GraphML: "read_graphml",
    Format.GraphToolBinary: "read_graphtool",
    Format.ThrillBinary: "read_thrill",
    Format.NetworkitBinary: "read_networkit_binary",
}

_WRITERS = {
    Format.METIS: "write_metis",
    Format.GML: "write_gml",
    Format.GraphML: "write_graphml",
    Format.GraphToolBinary: "write_graphtool",
    Format.ThrillBinary: "write_thrill",
    Format.NetworkitBinary: "write_networkit_binary",
    Format.DOT: "write_dot",
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
