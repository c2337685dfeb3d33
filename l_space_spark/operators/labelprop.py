"""Label propagation (community detection) — synchronous, deterministic.

Each superstep every vertex adopts the most frequent label among its
neighbors (undirected); ties broken by the MINIMUM label (determinism rule,
FIXTURES.md F4); vertices with no neighbors keep their label. Synchronous
updates + min-label tie-break make the result an exact, order-independent
function of the graph — required for the exact-match oracle.

The per-vertex argmax is computed JVM-side without a window sort:
``max(struct(cnt, -label))`` — struct ordering gives max count then min
label. Convergence: number of vertices whose label changed == 0, or
``max_iters`` (LP may oscillate on bipartite structures; a fixed-round mode
``tol<0`` is the oracle-comparable form).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner, SuperstepResult
from .components import undirect

_EMPTY_COUNTS = pa.table(
    {"vid": pa.array([], pa.int64()), "label": pa.array([], pa.int64()),
     "cnt": pa.array([], pa.int64())}
)


def _csr_count_kernel(stbl: pa.Table, btbl: pa.Table) -> pa.Table:
    """Per-block partial neighbor-label counts ``(vid, label, cnt)`` —
    the PageRank gather kernel with a run-length count over the lexsorted
    (dst, label) pairs instead of ``add.reduceat``. The final per-vertex
    count sum + argmax stays JVM-side, so the map-side pre-aggregation
    bounds hot vertices exactly like the dataframe path's partial agg.
    Arrow in/out — zero-copy views, no pandas (see pagerank._csr_kernel)."""
    from .pagerank import align_to_srcs, pa_buf, pa_col

    if btbl.num_rows == 0 or stbl.num_rows == 0:
        return _EMPTY_COUNTS
    srcs = pa_buf(btbl, "srcs", np.int64)
    if len(srcs) == 0:
        return _EMPTY_COUNTS
    eidx = pa_buf(btbl, "eidx", np.int64)
    dstu = pa_buf(btbl, "dstu", np.int64)
    segs = pa_buf(btbl, "segs", np.int64)
    lab = align_to_srcs(
        srcs,
        pa_col(stbl, "id"),
        pa_col(stbl, "label"),
        np.int64(0),  # unreachable: state covers every vertex incl. all srcs
    )
    vals = lab[eidx]  # neighbor label per edge, dst-segment order
    counts_per_dst = np.diff(np.append(segs, len(vals)))
    dpos = np.repeat(np.arange(len(dstu), dtype=np.int64), counts_per_dst)
    order = np.lexsort((vals, dpos))
    dp, lv = dpos[order], vals[order]
    change = np.empty(len(dp), dtype=bool)
    change[0] = True
    change[1:] = (dp[1:] != dp[:-1]) | (lv[1:] != lv[:-1])
    starts = np.flatnonzero(change)
    cnt = np.diff(np.append(starts, len(dp)))
    return pa.table(
        {"vid": pa.array(dstu[dp[starts]]), "label": pa.array(lv[starts]),
         "cnt": pa.array(cnt)}
    )


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 20,
    fixed_iters: bool = False,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    impl: str = "dataframe",
    sym_edges: DataFrame | None = None,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Returns SuperstepResult with state ``(id long, label long)``.

    ``impl="csr"``: neighbor-label counts come from the persisted packed
    CSR blocks (_csr_count_kernel) instead of the join+groupBy; the
    argmax (max count, min label) is identical, so the result is exactly
    equal — integer counts, no fp involved.

    ``sym_edges``: pre-materialized distinct symmetric closure (see
    components.connected_components) — skips the query-time ``undirect``
    re-shuffle; the per-round neighbor join reads the edge side with no
    exchange."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    und = (
        sym_edges.select("src", "dst")
        if sym_edges is not None
        else undirect(edges).repartition(num_partitions, "src")
    ).persist()
    if vertices is None:
        vertices = und.select(F.col("src").alias("id")).distinct()
    else:
        vertices = vertices.select("id").distinct()
    vertices = vertices.persist()

    init = vertices.select("id", F.col("id").alias("label"))

    csr_blocks: DataFrame | None = None
    if impl == "csr":
        from .pagerank import pack_csr_blocks

        csr_blocks = pack_csr_blocks(
            und.withColumn("w", F.lit(1.0)), num_partitions
        ).persist()
        csr_blocks.count()

    def step(state: DataFrame, i: int) -> DataFrame:
        if impl == "csr":
            p = F.lit(num_partitions)
            s = state.withColumn(
                "block", F.pmod(F.xxhash64("id"), p).cast("int")
            )
            counts = s.groupBy("block").cogroup(
                csr_blocks.groupBy("block")
            ).applyInArrow(
                _csr_count_kernel, schema="vid long, label long, cnt long"
            ).groupBy("vid", "label").agg(F.sum("cnt").alias("cnt"))
        else:
            # shuffle_hash: move only the |V|-row state; reuse und's
            # persisted src partitioning (see components.py step)
            nbr_labels = state.hint("shuffle_hash").join(
                und, state["id"] == und["src"]
            ).select(
                F.col("dst").alias("vid"), "label"
            )
            counts = nbr_labels.groupBy("vid", "label").agg(
                F.count(F.lit(1)).alias("cnt")
            )
        best = counts.groupBy("vid").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m")
        ).select("vid", (-F.col("m.neg")).alias("new_label"))
        return state.join(best.hint("shuffle_hash"),
                          state["id"] == best["vid"], "left").select(
            state["id"],
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
        )

    def changed_count(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n")
            .join(old.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )

    runner = SuperstepRunner(
        spark,
        max_iters=max_iters,
        tol=-1.0 if fixed_iters else 0.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "label_propagation", "fixed": fixed_iters,
                "impl": impl, **(config_extra or {})},
    )
    try:
        result = runner.run(
            init, step, metric_fn=None if fixed_iters else changed_count,
            resume=resume,
        )
    finally:
        und.unpersist()
        vertices.unpersist()
        if csr_blocks is not None:
            csr_blocks.unpersist()
    return result


def label_spreading(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    config_extra: dict | None = None,
) -> SuperstepResult:
    """Seeded (semi-supervised) label spreading: ``seeds(id, label)``
    are CLAMPED; every other vertex synchronously adopts the majority
    label among its currently-labeled neighbors (ties → smaller label,
    the ``label_propagation`` convention; no labeled neighbor → keep),
    for exactly ``rounds`` synchronous rounds — the fixed budget makes
    the result well-defined even on the bipartite structures where free
    majority dynamics oscillate, and is what lets an unrolled SQL twin
    match exactly. This is the weak-supervision primitive: propagate a
    small trusted label set (spam/quality/topic marks) over a similarity
    or link graph to label the long tail.

    State ``(id long, label long|null, seed boolean)`` over all vertices
    (graph ∪ seeds). Per round: one |labeled|⋈|E| message join against
    the src-partitioned symmetric closure, a combiner-backed
    (vertex, label) count, an argmax, and a |V|-row merge — the
    label_propagation plan shape plus the clamp."""
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    und = undirect(edges).repartition(num_partitions, "src").persist()
    sd = seeds.select(
        F.col("id").cast("long").alias("id"),
        F.col("label").cast("long").alias("label"),
    ).dropDuplicates(["id"]).persist()
    # the clamped seed set DEFINES the run: pin its fingerprint into the
    # checkpoint config so resume against different seeds is refused
    fp = sd.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(id, label))"),
                   F.lit(0)).alias("h"),
    ).collect()[0]
    verts = (
        und.select(F.col("src").alias("id"))
        .unionByName(sd.select("id")).distinct()
    )
    init = verts.join(sd.withColumnRenamed("label", "slabel"), "id", "left").select(
        "id",
        F.col("slabel").alias("label"),
        F.col("slabel").isNotNull().alias("seed"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        labeled = state.where(F.col("label").isNotNull())
        votes = (
            labeled.hint("shuffle_hash")
            .join(und, labeled["id"] == und["src"])
            .groupBy(F.col("dst").alias("vid"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pick = (
            votes.groupBy("vid")
            .agg(F.max(F.struct("cnt", (-F.col("label")).alias("neg")))
                 .alias("m"))
            .select("vid", (-F.col("m.neg")).alias("new_label"))
        )
        return state.join(
            pick.hint("shuffle_hash"), state["id"] == pick["vid"], "left"
        ).select(
            state["id"],
            F.when(F.col("seed"), F.col("label"))
            .otherwise(F.coalesce("new_label", "label")).alias("label"),
            "seed",
        )

    runner = SuperstepRunner(
        spark,
        max_iters=rounds,
        tol=-1.0,
        checkpoint_dir=checkpoint_dir,
        config={"algo": "label_spreading", "rounds": rounds,
                "seeds_n": int(fp["n"]), "seeds_fp": int(fp["h"]),
                **(config_extra or {})},
    )
    try:
        return runner.run(init, step, metric_fn=None, resume=resume)
    finally:
        und.unpersist()
        sd.unpersist()
