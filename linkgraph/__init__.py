"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Covers the core capabilities of NetworKit (reference: rolandglantz/networkit,
a single-machine C++/OpenMP graph library) re-expressed as idiomatic Spark
DataFrame programs: PageRank (power iteration with teleport + sink handling),
connected components (label-min / hash-to-min propagation), label-propagation
community detection, per-vertex triangle counting, plus the P1 extensions
(Katz/eigenvector centrality, k-core, SCC/WCC, link-prediction indices,
partition quality/comparison measures) and the web-text pipeline operators
(href extraction, dedup, similarity search, text quality).

Architecture (SURVEY.md §7): no RDDs, no custom Catalyst rules — the engine
is driver-orchestrated iterative DataFrame programs (superstep loop with
checkpoint/manifest resumability) over a deliberately physical table layout
(salted, range-bucketed CSR-block edge tables).
"""

__version__ = "0.1.0"

from linkgraph.graph import Graph  # noqa: F401
