"""Superstep driver loop — the Spark-native ``Repeat`` step.

Reference analog: L-space's ``Repeat`` interpreter loop
(``core/shared/src/main/scala/lspace/librarian/task/SyncGuide.scala:516-654``)
— BFS-style re-application of a sub-traversal with an ``until`` condition and
max-depth guard. Here each "application" is a full DataFrame job over the
vertex-state table, and the loop must additionally solve two problems the
single-JVM reference never faces:

1. **Lineage blowup** — an iterative DataFrame accumulates a linearly growing
   logical plan; after ~30 supersteps analysis time dominates runtime. Every
   round the new state is either ``localCheckpoint``-ed (fast, in-memory, for
   benches) or written to a parquet checkpoint and read back (durable,
   resumable) — either way the plan is cut to a leaf.

2. **Resumability** (north rule) — with ``checkpoint_dir`` set, each superstep
   writes ``state_{i:05d}/`` parquet plus ``_meta.json`` carrying iteration,
   convergence delta, per-partition row counts (lineage), wall time, and a
   config hash. ``run(resume=True)`` scans for the newest *complete* superstep
   whose config hash matches and continues from it — kill/restart yields a
   byte-identical final state (tests/test_resume.py). The meta file is written
   last, so a kill mid-checkpoint leaves an ignorable incomplete directory.

Protocol: ``step_fn(state, i) → new_state`` (may run auxiliary jobs, e.g. the
dangling-mass aggregate, but must NOT persist anything it keeps);
``metric_fn(old_state, new_state) → float`` is evaluated after the runner has
materialized ``new_state`` and drives convergence (``delta <= tol``). With
``metric_fn=None`` the loop always runs exactly ``max_iters`` supersteps —
the deterministic fixed-iteration mode the SQL oracles compare against.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ckpt import reset_stats_checkpoint

META_NAME = "_meta.json"


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    deltas: list[float] = field(default_factory=list)
    superstep_seconds: list[float] = field(default_factory=list)
    resumed_from: int | None = None
    timed_out: bool = False

    @property
    def wall_seconds(self) -> float:
        return sum(self.superstep_seconds)


def _partition_counts(df: DataFrame) -> list[int]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [int(r["count"]) for r in rows]


class SuperstepRunner:
    def __init__(
        self,
        spark: SparkSession,
        max_iters: int = 100,
        tol: float = 1e-6,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        config: dict | None = None,
        collect_partition_counts: bool = True,
        materialize_every: int = 1,
        time_limit_s: float | None = None,
    ) -> None:
        """``materialize_every``: in fixed-iteration mode (no ``metric_fn``,
        no durable checkpoint), localCheckpoint only every k-th superstep and
        let the rounds in between stay LAZY — k supersteps fuse into one
        Catalyst plan and the per-superstep driver-roundtrip/job overhead is
        paid once per k. Requires the step function to be fully lazy (no
        ``collect``/``first`` inside — e.g. scalar aggregates expressed as
        broadcast one-row joins). Ignored when a metric or durable
        checkpoint forces per-round evaluation.

        ``time_limit_s``: wall-clock budget — the reference's ``TimeLimit``
        step (``step/TimeLimit.scala:45``, exec ``LocalGuide.scala:99-111``
        via ``takeByTimeSpan``): completed supersteps within the budget are
        kept; the loop stops (``timed_out=True``, not converged) before
        starting a superstep once the budget is spent. Excluded from the
        config hash — per-iteration states are identical under any budget,
        so a timed-out run resumes seamlessly with a bigger one."""
        self.spark = spark
        self.max_iters = max_iters
        self.tol = tol
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = max(1, checkpoint_every)
        self.config = dict(config or {})
        self.collect_partition_counts = collect_partition_counts
        self.materialize_every = max(1, materialize_every)
        self.time_limit_s = time_limit_s
        self.config_hash = self._hash_config()

    def _hash_config(self) -> str:
        import hashlib

        blob = json.dumps(
            {"tol": self.tol, "max_iters": self.max_iters, **self.config},
            sort_keys=True,
        ).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    # ---- checkpoint bookkeeping ------------------------------------------------

    def _step_dir(self, i: int) -> str:
        assert self.checkpoint_dir is not None
        return os.path.join(self.checkpoint_dir, f"state_{i:05d}")

    def latest_checkpoint(self) -> tuple[int, dict] | None:
        """Newest complete superstep with a matching config hash, or None."""
        if not self.checkpoint_dir or not os.path.isdir(self.checkpoint_dir):
            return None
        best: tuple[int, dict] | None = None
        for name in os.listdir(self.checkpoint_dir):
            if not name.startswith("state_"):
                continue
            meta_path = os.path.join(self.checkpoint_dir, name, META_NAME)
            if not os.path.exists(meta_path):
                continue  # incomplete write (killed mid-checkpoint) → ignore
            try:
                meta = json.load(open(meta_path))
            except (json.JSONDecodeError, OSError):
                continue
            if meta.get("config_hash") != self.config_hash:
                continue
            i = int(meta["iteration"])
            if best is None or i > best[0]:
                best = (i, meta)
        return best

    # ---- main loop ---------------------------------------------------------------

    def run(
        self,
        init_state: DataFrame | Callable[[], DataFrame],
        step_fn: Callable[[DataFrame, int], DataFrame],
        metric_fn: Callable[[DataFrame, DataFrame], float] | None = None,
        resume: bool = True,
    ) -> SuperstepResult:
        resumed_from: int | None = None
        start_iter = 0

        ckpt = self.latest_checkpoint() if resume else None
        if ckpt is not None:
            i0, meta = ckpt
            state = self.spark.read.parquet(self._step_dir(i0))
            start_iter = i0 + 1
            resumed_from = i0
            if (
                metric_fn is not None
                and meta.get("delta") is not None
                and meta["delta"] <= self.tol
            ):
                return SuperstepResult(
                    state, i0 + 1, True, [meta["delta"]], [0.0], resumed_from
                )
        else:
            state = init_state() if callable(init_state) else init_state

        state = state.persist()
        state.count()  # materialize before the loop clock starts

        deltas: list[float] = []
        secs: list[float] = []
        converged = False
        timed_out = False
        iterations = start_iter
        loop_start = time.time()
        for i in range(start_iter, self.max_iters):
            if (
                self.time_limit_s is not None
                and time.time() - loop_start >= self.time_limit_s
            ):
                timed_out = True
                break
            t0 = time.time()
            new_state = step_fn(state, i)

            durable = self.checkpoint_dir and (i % self.checkpoint_every == 0)
            rows = None
            if durable:
                path = self._step_dir(i)
                new_state.write.mode("overwrite").parquet(path)
                new_state = self.spark.read.parquet(path).persist()
                rows = new_state.count()
            else:
                lazy_ok = metric_fn is None and self.materialize_every > 1
                boundary = ((i + 1 - start_iter) % self.materialize_every == 0
                            or i == self.max_iters - 1)
                if not lazy_ok or boundary:
                    # stats-reset checkpoint: materializes AND caches,
                    # cuts lineage AND the inherited Catalyst size-
                    # estimate chain (plans/ckpt.py) — step functions
                    # that self-join the state would otherwise square
                    # the BigInt estimate every superstep
                    new_state = reset_stats_checkpoint(new_state)
                # else: stay lazy; this round fuses into the next plan

            delta = metric_fn(state, new_state) if metric_fn else None
            if durable:
                meta = {
                    "iteration": i,
                    "delta": delta,
                    "rows": rows,
                    "seconds": time.time() - t0,
                    "config_hash": self.config_hash,
                }
                if self.collect_partition_counts:
                    meta["partition_counts"] = _partition_counts(new_state)
                with open(os.path.join(path, META_NAME), "w") as f:
                    json.dump(meta, f)

            state.unpersist()
            state = new_state
            secs.append(time.time() - t0)
            iterations = i + 1
            if delta is not None:
                deltas.append(float(delta))
                if delta <= self.tol:
                    converged = True
                    break

        return SuperstepResult(
            state, iterations, converged, deltas, secs, resumed_from, timed_out
        )
