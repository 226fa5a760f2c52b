"""Generic iterate–checkpoint–converge driver for superstep algorithms.

Catalyst cannot iterate, so the driver owns the loop (SURVEY.md §4.2). Each
superstep writes its state DataFrame to parquet and appends a JSON manifest
line ``{iteration, metric, rows, partitions, wall_s}`` — reading the parquet
back both truncates lineage (plans would otherwise grow linearly with
iterations) and makes every run resumable from any iteration, in-process or
across process restarts (the BASELINE.json:14 resumability contract).

Per-partition lineage: each manifest line carries per-partition row counts
(``partitions``), computed map-side via ``spark_partition_id`` — a cheap
audit trail that a resumed run re-verifies before trusting a checkpoint.

Checkpoint cadence: durable parquet every ``checkpoint_every`` supersteps;
in between, ``localCheckpoint(eager=True)`` truncates lineage without disk
I/O. A killed run resumes from the last durable iteration and replays at
most ``checkpoint_every-1`` supersteps — the standard recovery/overhead
trade. Scale notes: state is O(n) rows (id, value), a tiny fraction of the
edge table, and the parquet write is partition-parallel.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list  # one manifest dict per executed superstep


def _partition_counts(df: DataFrame) -> dict:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )
    return {str(r["pid"]): r["count"] for r in rows}


class Superstep:
    """Driver for ``state_{k+1} = step(state_k)`` loops with convergence.

    ``step(state, k) -> (new_state, metric)``; iteration stops when
    ``metric <= tol`` or ``k == max_iter``. ``metric`` is algorithm-defined:
    L1/L2 residual for PageRank, #changed labels for CC/PLP.
    """

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        name: str,
        keep_iterations: int = 2,
        track_partitions: bool = False,
        checkpoint_every: int = 5,
    ):
        self.spark = spark
        self.dir = os.path.join(work_dir, name)
        self.manifest_path = os.path.join(self.dir, "manifest.jsonl")
        self.keep_iterations = keep_iterations
        self.track_partitions = track_partitions
        self.checkpoint_every = max(1, checkpoint_every)
        os.makedirs(self.dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> list:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _append_manifest(self, entry: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(entry) + "\n")

    def _state_path(self, k: int) -> str:
        return os.path.join(self.dir, f"iter_{k:05d}")

    def _write_state(self, state: DataFrame, k: int) -> DataFrame:
        path = self._state_path(k)
        state.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # prune old checkpoints beyond the retention window
        for j in range(k - self.keep_iterations):
            p = self._state_path(j)
            if os.path.exists(p):
                shutil.rmtree(p, ignore_errors=True)
        return out

    # -- main loop ---------------------------------------------------------
    def run(
        self,
        init: Callable[[], DataFrame],
        step: Callable[[DataFrame, int], DataFrame],
        metric: Callable[[DataFrame], float] | None = None,
        tol: float = 0.0,
        max_iter: int = 100,
        resume: bool = True,
        metric_exprs: list | None = None,
        metric_of: Callable[[dict], float] | None = None,
    ) -> SuperstepResult:
        """``step(state, k) -> new_state`` builds the superstep plan (it may
        carry helper columns, e.g. a per-row delta); the state is
        MATERIALIZED first (checkpoint), then the convergence metric is
        computed. Computing the metric before materialization would execute
        the whole join/agg plan twice per superstep — the classic
        iterative-Spark trap.

        Two metric modes:

        - ``metric(state) -> float`` — a separate (cheap, cached-input)
          aggregation ACTION after materialization. Two driver actions per
          superstep.
        - ``metric_exprs`` (list of aggregate Columns over the new state's
          columns) + optional ``metric_of(observed_row_dict) -> float`` —
          the metric rides the materialization job itself via
          ``DataFrame.observe`` (CollectMetrics accumulators), so each
          superstep is ONE driver action. ``metric_of`` defaults to the
          first observed value; use it to unpack/stash extra observed
          aggregates (e.g. PageRank folds sink mass into the same pass).
          At 1000-executor scale this halves the per-superstep job count —
          the fixed scheduling+barrier cost that dominates small-state
          supersteps."""
        manifest = self._read_manifest() if resume else []
        if not resume and os.path.exists(self.dir):
            shutil.rmtree(self.dir, ignore_errors=True)
            os.makedirs(self.dir, exist_ok=True)

        durable = [m for m in manifest if m.get("durable")]
        if durable:
            last = durable[-1]
            k = last["iteration"]
            state = self.spark.read.parquet(self._state_path(k))
            if manifest[-1].get("converged") and manifest[-1]["iteration"] == k:
                return SuperstepResult(state, k, True, manifest)
            manifest = [m for m in manifest if m["iteration"] <= k]
        else:
            k = 0
            state = self._write_state(init(), 0)
            entry = {"iteration": 0, "metric": None, "rows": state.count(),
                     "converged": False, "durable": True}
            if self.track_partitions:
                entry["partitions"] = _partition_counts(state)
            self._append_manifest(entry)
            manifest = [entry]

        if metric is None and metric_exprs is None:
            raise ValueError("provide metric or metric_exprs")

        converged = False
        while k < max_iter:
            t0 = time.time()
            new_state = step(state, k)
            k += 1
            obs = None
            if metric_exprs is not None and not os.environ.get("LINKGRAPH_NO_OBSERVE"):
                # fresh Observation per superstep (single-use by contract);
                # the CollectMetrics node is dropped from downstream lineage
                # by the checkpoint/write truncation right below
                obs = Observation(f"ss_{k}")
                new_state = new_state.observe(obs, *metric_exprs)
            make_durable = k % self.checkpoint_every == 0
            if make_durable:
                state = self._write_state(new_state, k)
            else:
                # eager local checkpoint: truncates lineage, no disk round-trip
                state = new_state.localCheckpoint(eager=True)
            if obs is not None or metric_exprs is not None:
                if obs is not None:
                    row = obs.get  # populated by the materialization action
                else:
                    # LINKGRAPH_NO_OBSERVE escape hatch / A-B harness: the
                    # same aggregates as a separate post-checkpoint action
                    row = state.agg(*metric_exprs).collect()[0].asDict()
                if metric_of is not None:
                    m = float(metric_of(row))
                else:
                    first = next(iter(row.values()))
                    m = float(first if first is not None else 0.0)
            else:
                m = float(metric(state))
            converged = m <= tol
            if converged and not make_durable:
                # converged on a non-durable iteration: persist it after all
                self._write_state(state, k)
                make_durable = True
            entry = {
                "iteration": k,
                "metric": m,
                "wall_s": round(time.time() - t0, 3),
                "converged": converged,
                "durable": make_durable,
            }
            if make_durable:
                entry["rows"] = state.count()
                if self.track_partitions:
                    entry["partitions"] = _partition_counts(state)
            self._append_manifest(entry)
            manifest.append(entry)
            if converged:
                break
        return SuperstepResult(state, k, converged, manifest)
