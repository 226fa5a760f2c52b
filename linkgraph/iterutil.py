"""Durable lineage truncation for driver-side iterative loops.

Measured on Spark 4.1 (local mode): ``localCheckpoint(eager=True)`` does
NOT reliably bound recomputation when the per-round plan carries a window
function — per-round wall time grows ~5× per round (leiden refinement went
1 s → 260 s by round 5 on a 34-node graph), with or without AQE, even when
every checkpointed frame stays referenced. A parquet round-trip always
truncates: the re-read DataFrame is a plain scan with no upstream plan.

``Pin`` is the loop-state materializer for iterative algorithms that do
not run under :class:`linkgraph.superstep.Superstep` (which already
writes durable parquet): one instance per loop, call it on each new
state. Keeps the last two slots per key (a pinned frame is read lazily,
so the previous round's file must survive one extra round), deletes
older ones.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class Pin:
    def __init__(self, spark: SparkSession, name: str = "loop"):
        self.spark = spark
        self.dir = tempfile.mkdtemp(prefix=f"lg_pin_{name}_")
        self._counters: dict[str, int] = {}

    def __call__(self, df: DataFrame, key: str = "state") -> DataFrame:
        k = self._counters.get(key, 0) + 1
        self._counters[key] = k
        path = os.path.join(self.dir, f"{key}_{k}")
        df.write.mode("overwrite").parquet(path)
        stale = os.path.join(self.dir, f"{key}_{k - 2}")
        if os.path.exists(stale):
            shutil.rmtree(stale, ignore_errors=True)
        return self.spark.read.parquet(path)

    def close(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
