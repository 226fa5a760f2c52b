"""Algorithm library: driver-orchestrated iterative DataFrame programs.

Reference parity map (NetworKit module → here):
- centrality/PageRank.cpp        → pagerank.pagerank
- components/ConnectedComponents → components.connected_components
- community/PLP.cpp              → plp.label_propagation
- edgescores/TriangleEdgeScore   → triangles.per_vertex_triangles
- centrality/{Degree,Katz,Eigenvector,CoreDecomposition} → centrality.py
- community/{Modularity,NMI,...} → community.py
- linkprediction/*Index          → linkpred.py
- distance/BFS                   → bfs.py
"""
