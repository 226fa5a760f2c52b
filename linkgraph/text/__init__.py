"""Web-text pipeline operators: dedup, similarity search, quality/lang-id.

These extend the link-graph engine with the operations a 100 TB training-
data pipeline needs (exact + near dedup, ANN search, text analysis). All
hot paths are JVM-side expressions (xxhash64, aggregate, transform) —
pandas UDFs appear only where vectorized numpy genuinely wins (dense
embedding math).
"""
