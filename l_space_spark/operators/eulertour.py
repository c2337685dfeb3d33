"""Euler tour + pointer-doubled list ranking over a spanning forest —
the O(log V)-round replacement for BFS tree orientation.

Rooting a spanning tree by frontier BFS costs one Spark round per tree
LEVEL: fine on shallow trees, but a hash-weight spanning tree of a
random graph has depth O(sqrt V)-ish and an adversarial path graph
depth V — thousands of rounds at 10^6 vertices, where the previous
implementation simply refused past ``max_rounds``. The classic PRAM
answer (Tarjan–Vishkin) is the Euler tour: replace each tree edge by
two directed arcs, stitch them into one closed walk per component via
purely LOCAL successor rules, cut the walk at the root, and list-rank
it by pointer doubling. Rounds become O(log |arcs|) regardless of tree
shape, and every round is a self-equi-join of a 2(|V|-1)-row table —
state-sized shuffles, no frontier, no depth dependence.

What the tour buys downstream (all used by ``bridges``/``biconnect``):

* ``parent`` — arc (u,v) is the parent→child arc iff it appears before
  its reversal (v,u) in tour order.
* preorder INTERVALS ``[first(v), last(v)]`` — subtree membership and
  ancestor tests become two scalar comparisons after an equi-join on
  the vertex id, replacing the O(|V|·depth)-row ancestor closure.
* subtree folds — place per-vertex values at ``first(v)``; a subtree
  aggregate is a RANGE query over one contiguous arc-position span:
  - invertible monoids (xor, sum): two lookups into a sharded prefix
    scan (``tour_prefix_xor`` — the same two-level decomposition as
    ``packing.exclusive_prefix_sum``, no global single-task window);
  - min/max: two lookups into a doubling sparse table
    (``tour_range_minmax`` — O(|arcs|·log) rows built in O(log)
    rounds, the standard static-RMQ layout).

Reference analog: none (L-space ships no algorithms; its ``Repeat``
traversal could walk a tree but not rank it).

Scale shape: neighbor succession is one window partitioned by vertex
(work bounded by TREE degree — no message amplification); ranking is
``ceil(log2(2|V|))`` self-joins; the segment-offset table is one row
per component and goes through the sharded prefix sum, never a global
window. Nothing in the module depends on tree depth or graph diameter.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.ckpt import reset_stats_checkpoint
from .packing import exclusive_prefix_sum

#: neutral elements for the sparse-table min/max lanes; g-values are
#: tour positions (≥ -1 — a root's virtual ``first`` can be -1), so
#: ±2^62 can never collide with a real value.
NEUTRAL_LO = 1 << 62
NEUTRAL_HI = -(1 << 62)


@dataclass(frozen=True)
class EulerTour:
    """``intervals``: one row per vertex ``(id, parent, first, last)``
    — ``parent`` NULL for roots (NOT a sentinel id: any long, including
    negatives, is a legal vertex); a root's interval is its component's
    whole segment widened by one virtual slot on the left
    (``[segstart-1, segend]``) so containment tests stay strict.
    ``arcs``: one row per tree arc ``(s, d, gpos)`` with the global
    tour position. ``total``: number of arcs across all components."""

    intervals: DataFrame
    arcs: DataFrame
    total: int


def _floor_log2(col: F.Column) -> F.Column:
    """Integer floor(log2(n)) for a positive bigint column, no
    floating point: the bit length of ``n`` minus one."""
    return (F.length(F.bin(col)) - F.lit(1)).cast("int")


def _arcless_sentinel(id_col: F.Column) -> F.Column:
    """Unique degenerate interval position for an arc-less root:
    ``-2 - zigzag(id)`` ≤ -2 — strictly below every real tour position
    (≥ 0) AND below every non-degenerate root's virtual ``first``
    (= segoff - 1 ≥ -1), injective for ids with |id| < 2^61 (zigzag
    folds negatives into odd nonnegatives; beyond ±2^61 the doubling
    would wrap — far outside the engine's 60-bit hash id space, and no
    injective long→(-∞,-2] map exists by pigeonhole), so two singleton
    roots can never satisfy each other's containment test."""
    zz = F.when(id_col >= 0, 2 * id_col).otherwise(-2 * id_col - 1)
    return (F.lit(-2) - zz).cast("long")


def euler_tour(
    spark: SparkSession,
    tree_uv: DataFrame,
    cc: DataFrame,
    num_partitions: int,
    max_rounds: int = 64,
) -> EulerTour:
    """Rank the Euler tour of the forest ``tree_uv(u, v)`` rooted at
    each component's minimum vertex.

    ``cc`` is the ``(id, component)`` labeling of every forest vertex
    with ``component`` = the min vertex id (the contract of
    ``components.connected_components_star``) — the root of each tree
    is its component label. Malformed inputs fail loud, never
    mis-rank: a cc labeling that MISSES a tree vertex raises before the
    ranking loop (labeled-arc check on the same count action), and a
    successor structure that does not terminate (wrong labels, cycles)
    trips either ``max_rounds`` (``ceil(log2(2|V|))`` needed — 64
    covers any conceivable input) or the post-loop ns-null check."""
    arcs0 = (
        tree_uv.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(tree_uv.select(F.col("v").alias("s"),
                                    F.col("u").alias("d")))
        .repartition(num_partitions, "s")
    )

    # successor rule (local): after arriving at vertex ``d`` via
    # neighbor ``s``, leave toward the next neighbor of ``d`` after
    # ``s`` in sorted order, wrapping to the first. Window work is
    # bounded by tree degree (each vertex's arc list), not by inbox
    # size — no amplification.
    w = Window.partitionBy("s").orderBy("d")
    w_all = w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)
    nxt = arcs0.select(
        "s", "d",
        F.coalesce(F.lead("d").over(w), F.first("d").over(w_all))
        .alias("dn"),
        F.max("d").over(w_all).alias("mx"),
    )

    # arc (s,d) -> next arc (d, dn') where dn' comes from the reversed
    # row (d, s); the tour of each component is now one closed cycle.
    succ = (
        nxt.alias("a")
        .join(nxt.alias("r"),
              (F.col("a.d") == F.col("r.s")) & (F.col("a.s") == F.col("r.d")))
        .select(
            F.col("a.s").alias("s"), F.col("a.d").alias("d"),
            F.col("a.d").alias("ns"), F.col("r.dn").alias("nd"),
            F.col("r.mx").alias("mxd"),
        )
    )

    # cut each cycle at its root: the tour STARTS with (root -> min
    # neighbor), so the arc whose successor that is — (max neighbor ->
    # root) — terminates the list.
    croot = cc.select(F.col("id").alias("d"),
                      F.col("component").alias("comp_d"))
    # LEFT join + explicit coverage flag: an inner join here would
    # silently DROP the arcs of any vertex the cc labeling missed, and
    # the ranking loop's left joins would then turn their dangling
    # successors into spurious list terminators — wrong gpos values
    # that still pass the post-loop ns-null check. A missing label must
    # fail loud instead; the check rides the count() action below.
    state = (
        succ.join(croot, "d", "left")
        .select(
            "s", "d",
            F.when((F.col("d") == F.col("comp_d"))
                   & (F.col("s") == F.col("mxd")), F.lit(None))
            .otherwise(F.col("ns")).alias("ns"),
            F.when((F.col("d") == F.col("comp_d"))
                   & (F.col("s") == F.col("mxd")), F.lit(None))
            .otherwise(F.col("nd")).alias("nd"),
            F.lit(1).cast("long").alias("dist"),
            F.col("comp_d").isNull().cast("long").alias("_unlabeled"),
        )
    )
    # reset_stats_checkpoint, not plain localCheckpoint: the ranking
    # loop SELF-joins this state, which would square the inherited
    # Catalyst size estimate every round (see plans/ckpt.py)
    state = reset_stats_checkpoint(state)

    head = state.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("_unlabeled").alias("m")).collect()[0]
    total = head["n"]
    if (head["m"] or 0) > 0:
        raise RuntimeError(
            f"euler_tour: {head['m']} arcs reach vertices with no cc "
            "label — tree_uv/cc disagree (incomplete labeling)"
        )
    state = state.drop("_unlabeled")
    if total == 0:
        sent = _arcless_sentinel(F.col("id"))
        empty_iv = cc.where(F.col("id") == F.col("component")).select(
            "id", F.lit(None).cast("long").alias("parent"),
            sent.alias("first"),
            sent.alias("last"),
        )
        return EulerTour(empty_iv, state.select("s", "d",
                                                F.col("dist").alias("gpos")),
                         0)

    rounds = max(1, (total - 1).bit_length())  # ceil(log2(total))
    if rounds > max_rounds:
        raise RuntimeError(
            f"euler_tour: {total} arcs need {rounds} doubling rounds "
            f"> max_rounds={max_rounds}"
        )
    for _ in range(rounds):
        nxt_state = state.select(
            F.col("s").alias("ys"), F.col("d").alias("yd"),
            F.col("ns").alias("yns"), F.col("nd").alias("ynd"),
            F.col("dist").alias("ydist"),
        )
        state = (
            state.join(
                nxt_state.hint("shuffle_hash"),
                (F.col("ns") == F.col("ys")) & (F.col("nd") == F.col("yd")),
                "left",
            )
            .select(
                "s", "d",
                F.col("yns").alias("ns"), F.col("ynd").alias("nd"),
                (F.col("dist") + F.coalesce(F.col("ydist"), F.lit(0)))
                .alias("dist"),
            )
        )
        state = reset_stats_checkpoint(state)
    if not state.where(F.col("ns").isNotNull()).isEmpty():
        raise RuntimeError(
            "euler_tour: successor list did not terminate — tree_uv/cc "
            "disagree (cycle or missing component label)"
        )

    # dist = arcs from here to the component's tour end (inclusive), so
    # position-from-start = complen - dist; global position adds the
    # component segment offset (sharded prefix sum — one row/component).
    ccomp = cc.select(F.col("id").alias("s"),
                      F.col("component").alias("comp"))
    ranked = state.join(ccomp, "s")
    comps = ranked.groupBy("comp").agg(F.count("*").alias("complen"))
    comps = exclusive_prefix_sum(comps, "comp", "complen",
                                 out_col="segoff")
    arcs = (
        ranked.join(comps, "comp")
        .select(
            "s", "d",
            (F.col("complen") - F.col("dist") + F.col("segoff"))
            .alias("gpos"),
        )
    )
    arcs = reset_stats_checkpoint(arcs)

    # arc (s,d) is the parent->child arc iff it precedes its reversal
    rev = arcs.select(F.col("d").alias("s"), F.col("s").alias("d"),
                      F.col("gpos").alias("rpos"))
    fwd = (
        arcs.join(rev, ["s", "d"])
        .where(F.col("gpos") < F.col("rpos"))
        .select(
            F.col("d").alias("id"), F.col("s").alias("parent"),
            F.col("gpos").alias("first"), F.col("rpos").alias("last"),
        )
    )
    # arc-less roots (singleton components) get DISTINCT degenerate
    # intervals first = last = sentinel(id) < -1: a shared [-1, -1]
    # would make any two such roots mutually pass the
    # ancestor-containment test (fu <= fv AND lv <= lu), while a unique
    # point interval contains exactly itself — the correct
    # ancestor-OR-SELF semantics for a singleton.
    sent = _arcless_sentinel(F.col("id"))
    roots = (
        cc.where(F.col("id") == F.col("component"))
        .join(comps.select(F.col("comp").alias("id"), "complen", "segoff"),
              "id", "left")
        .select(
            "id", F.lit(None).cast("long").alias("parent"),
            F.when(F.col("complen").isNull(), sent)
            .otherwise(F.col("segoff") - F.lit(1)).alias("first"),
            F.when(F.col("complen").isNull(), sent)
            .otherwise(F.col("segoff") + F.col("complen") - F.lit(1))
            .alias("last"),
        )
    )
    intervals = reset_stats_checkpoint(fwd.unionByName(roots))
    return EulerTour(intervals, arcs, total)


def tour_prefix_xor(
    placed: DataFrame,
    shard_block: int = 1 << 20,
) -> DataFrame:
    """Inclusive and exclusive running ``bit_xor`` over tour order.

    ``placed(gpos, val)`` must cover EVERY tour position (neutral 0
    where nothing is placed) so both prefixes are defined at arbitrary
    query positions. Returns ``(gpos, pxi, pxe)`` with
    ``pxi = xor of val at positions <= gpos`` and ``pxe`` the strict
    prefix. Same two-level shape as ``packing.exclusive_prefix_sum``:
    shard-local window + one tiny per-shard offset table — xor is
    invertible-free here (offsets just xor in), no global window."""
    local = (
        placed.withColumn("_shard", F.expr(f"gpos div {shard_block}"))
        .withColumn(
            "_local",
            F.coalesce(
                F.expr(
                    "bit_xor(val) over (partition by _shard order by gpos "
                    "rows between unbounded preceding and 1 preceding)"
                ),
                F.lit(0),
            ),
        )
    )
    offsets = (
        local.groupBy("_shard")
        .agg(F.expr("bit_xor(val)").alias("_tot"))
        .withColumn(
            "_off",
            F.coalesce(
                F.expr(
                    "bit_xor(_tot) over (order by _shard "
                    "rows between unbounded preceding and 1 preceding)"
                ),
                F.lit(0),
            ),
        )
        .select("_shard", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_shard")
        .select(
            "gpos",
            F.expr("_local ^ _off ^ val").alias("pxi"),
            F.expr("_local ^ _off").alias("pxe"),
        )
    )


def _sparse_table(
    placed: DataFrame,
    total: int,
    lanes: list,
) -> tuple[DataFrame, int]:
    """Shared doubling sparse-table builder: ``lanes`` is a list of
    ``(col, combine, neutral)`` where combine is ``F.least`` or
    ``F.greatest`` and neutral a Column literal that combine ignores.
    ``placed(gpos, <lane cols>)`` must cover every position
    0..total-1. Returns ``(tall, levels)``: ``tall(k, pos, <lanes>)``
    aggregates the window ``[pos, pos + 2^k)`` for k = 0..levels —
    O(total·levels) rows built in ``levels`` equi-join rounds, no
    sorts, no windows."""
    levels = max(0, (max(total, 1)).bit_length() - 1)  # floor(log2)
    cur = reset_stats_checkpoint(
        placed.select(F.col("gpos").alias("pos"),
                      *[c for c, _, _ in lanes]))
    tall = cur.withColumn("k", F.lit(0).cast("int"))
    for k in range(1, levels + 1):
        half = 1 << (k - 1)
        shifted = cur.select(
            (F.col("pos") - F.lit(half)).alias("pos"),
            *[F.col(c).alias(c + "2") for c, _, _ in lanes],
        )
        cur = cur.join(shifted, "pos", "left").select(
            "pos",
            *[fn(F.col(c), F.coalesce(F.col(c + "2"), neutral)).alias(c)
              for c, fn, neutral in lanes],
        )
        cur = reset_stats_checkpoint(cur)
        tall = tall.unionByName(cur.withColumn("k", F.lit(k).cast("int")))
    return tall, levels


def _sparse_query(
    queries: DataFrame,
    tall: DataFrame,
    lanes: list,
    first_col: str,
    last_col: str,
) -> DataFrame:
    """Shared two-window range query against a ``_sparse_table``:
    ``lanes`` is ``(col, combine, out_col)``; annotates ``queries``
    (which carry inclusive bigint positions in ``first_col`` /
    ``last_col``, len >= 1) with each lane's range aggregate — the
    standard two overlapping 2^k windows, k = floor(log2(len)), two
    equi-joins on (k, pos)."""
    length = F.col(last_col) - F.col(first_col) + F.lit(1)
    q = queries.withColumn("_qk", _floor_log2(length)).withColumn(
        "_p2", F.expr("shiftleft(1L, _qk)")
    )
    t1 = tall.select(F.col("k").alias("_k1"), F.col("pos").alias("_pos1"),
                     *[F.col(c).alias("_" + c + "1") for c, _, _ in lanes])
    t2 = tall.select(F.col("k").alias("_k2"), F.col("pos").alias("_pos2"),
                     *[F.col(c).alias("_" + c + "2") for c, _, _ in lanes])
    out = (
        q.join(t1, (F.col("_qk") == F.col("_k1"))
               & (F.col(first_col) == F.col("_pos1")))
        .join(t2, (F.col("_qk") == F.col("_k2"))
              & (F.col(last_col) - F.col("_p2") + F.lit(1)
                 == F.col("_pos2")))
    )
    for c, fn, out_col in lanes:
        out = out.withColumn(out_col, fn("_" + c + "1", "_" + c + "2"))
    return out.drop("_qk", "_p2", "_k1", "_k2", "_pos1", "_pos2",
                    *["_" + c + i for c, _, _ in lanes for i in "12"])


def tour_range_minmax(
    placed: DataFrame,
    total: int,
) -> tuple[DataFrame, int]:
    """Range-min/max sparse table over tour order:
    ``placed(gpos, lo, hi)`` with ``NEUTRAL_LO``/``NEUTRAL_HI`` at
    empty positions → ``tall(k, pos, lo, hi)`` (see _sparse_table)."""
    return _sparse_table(placed, total, [
        ("lo", F.least, F.lit(NEUTRAL_LO)),
        ("hi", F.greatest, F.lit(NEUTRAL_HI)),
    ])


def range_minmax_query(
    queries: DataFrame,
    tall: DataFrame,
    first_col: str = "qfirst",
    last_col: str = "qlast",
) -> DataFrame:
    """Annotate ``queries`` with ``range_lo`` / ``range_hi`` over the
    inclusive span (see _sparse_query)."""
    return _sparse_query(queries, tall, [
        ("lo", F.least, "range_lo"),
        ("hi", F.greatest, "range_hi"),
    ], first_col, last_col)


def tree_depths(et: EulerTour) -> DataFrame:
    """``(id, parent, depth, subtree_size)`` for every forest vertex —
    depth 0 at roots — WITHOUT a per-level pass: weight each tour arc
    +1 (entering/forward) or -1 (returning), then ``depth(v)`` is the
    inclusive prefix sum at ``first(v)``. Every component's arc weights
    sum to zero (each tree edge contributes one +1 and one -1), so the
    GLOBAL prefix restricted to a segment equals the per-component
    prefix — one sharded prefix sum over the concatenated tour, no
    per-component windows, no O(depth) rounds. ``subtree_size`` is
    free from the interval: a child's subtree spans exactly
    2·size arc slots; a root's segment has 2·(size−1) plus its one
    virtual slot."""
    iv = et.intervals.withColumn(
        "subtree_size",
        F.expr("(last - first + 1 + if(parent IS NULL, 1, 0)) div 2"),
    )
    roots = iv.where(F.col("parent").isNull()).select(
        "id", "parent", F.lit(0).cast("long").alias("depth"),
        "subtree_size",
    )
    if et.total == 0:
        return roots
    children = iv.where(F.col("parent").isNotNull())
    marks = children.select(F.col("first").alias("gpos"),
                            F.lit(1).alias("fw"))
    arcs_w = (
        et.arcs.select("gpos")
        .join(marks, "gpos", "left")
        .select("gpos",
                F.coalesce("fw", F.lit(-1)).cast("long").alias("w"))
    )
    pref = exclusive_prefix_sum(arcs_w, "gpos", "w", out_col="pre")
    inc = pref.select("gpos", (F.col("pre") + F.col("w")).alias("depth"))
    out = children.join(inc, children["first"] == inc["gpos"]).select(
        "id", "parent", "depth", "subtree_size"
    )
    return out.unionByName(roots)


def tour_sparse_min(
    placed: DataFrame,
    total: int,
    neutral: F.Column,
) -> tuple[DataFrame, int]:
    """Range-min sparse table generic in the value type:
    ``placed(gpos, val)`` with ``val`` any Spark-orderable type (longs,
    or structs compared lexicographically — e.g. ``struct(depth, id)``
    for argmin-by-depth); ``neutral`` must compare greater than every
    real value (see _sparse_table)."""
    return _sparse_table(placed, total, [("val", F.least, neutral)])


def sparse_min_query(
    queries: DataFrame,
    tall: DataFrame,
    first_col: str = "qfirst",
    last_col: str = "qlast",
    out_col: str = "range_val",
) -> DataFrame:
    """Annotate ``queries`` with the range-min ``out_col`` over the
    inclusive span (see _sparse_query)."""
    return _sparse_query(queries, tall, [("val", F.least, out_col)],
                         first_col, last_col)


def lca_pairs(
    et: EulerTour,
    pairs: DataFrame,
) -> DataFrame:
    """Lowest common ancestor and hop distance through the forest
    ``(u, v, lca, tree_dist)`` for each SAME-COMPONENT
    pair in ``pairs(u, v)`` — the classic Euler-tour reduction (LCA =
    min-depth vertex visited between the two first-entries) in O(log V)
    build rounds + two lookups per pair.

    Cases: if one endpoint is an ancestor-or-self of the other
    (interval containment — covers roots, whose virtual ``first`` lies
    outside the arc array), it IS the lca; otherwise both first-entries
    are real arc positions in the same segment and the range-min of
    ``struct(depth(head), head)`` over ``[min(first), max(first)]`` is
    the lca (head of arc p = the vertex the tour stands on after arc
    p). Cross-component pairs are the CALLER's precondition — they
    would read a range spanning unrelated segments; filter them with
    component labels first (the catalog entry does)."""
    # checkpoint: du/dv/dl below reference this three more times — a
    # lazy plan would re-run the prefix-sum pipeline per reference
    depths = reset_stats_checkpoint(tree_depths(et))
    heads = (
        et.arcs.join(
            depths.select(F.col("id").alias("d"),
                          F.col("depth").alias("hd")), "d")
        .select("gpos",
                F.struct(F.col("hd").alias("depth"),
                         F.col("d").alias("id")).alias("val"))
    )
    neutral = F.struct(F.lit(NEUTRAL_LO).alias("depth"),
                       F.lit(NEUTRAL_LO).alias("id"))
    tall, _ = tour_sparse_min(heads, et.total, neutral)

    ivu = et.intervals.select(F.col("id").alias("u"),
                              F.col("first").alias("fu"),
                              F.col("last").alias("lu"))
    ivv = et.intervals.select(F.col("id").alias("v"),
                              F.col("first").alias("fv"),
                              F.col("last").alias("lv"))
    p = pairs.join(ivu, "u").join(ivv, "v")
    u_anc = (F.col("fu") <= F.col("fv")) & (F.col("lv") <= F.col("lu"))
    v_anc = (F.col("fv") <= F.col("fu")) & (F.col("lu") <= F.col("lv"))
    direct = p.where(u_anc | v_anc).select(
        "u", "v",
        F.when(u_anc, F.col("u")).otherwise(F.col("v")).alias("lca"),
    )
    rest = (
        p.where(~u_anc & ~v_anc)
        .withColumn("qfirst", F.least("fu", "fv"))
        .withColumn("qlast", F.greatest("fu", "fv"))
    )
    ranged = sparse_min_query(rest, tall).select(
        "u", "v", F.col("range_val.id").alias("lca")
    )
    out = direct.unionByName(ranged)

    # tree distance rides along for free: hops(u,v) through the forest
    # = depth(u) + depth(v) - 2*depth(lca)
    du = depths.select(F.col("id").alias("u"), F.col("depth").alias("du"))
    dv = depths.select(F.col("id").alias("v"), F.col("depth").alias("dv"))
    dl = depths.select(F.col("id").alias("lca"),
                       F.col("depth").alias("dl"))
    return (
        out.join(du, "u").join(dv, "v").join(dl, "lca")
        .select("u", "v", "lca",
                (F.col("du") + F.col("dv") - 2 * F.col("dl"))
                .alias("tree_dist"))
    )


def path_max_pairs(
    et: EulerTour,
    wtree: DataFrame,
    pairs: DataFrame,
) -> DataFrame:
    """Maximum edge weight on the unique forest path —
    ``(u, v, path_max)`` per SAME-COMPONENT pair in ``pairs(u, v)``.

    On the minimum spanning forest this IS the minimax/bottleneck
    distance of the underlying graph (cycle property: any non-tree
    edge's fundamental cycle has the tree path as its lighter part), so
    with hash weights it answers "what is the weakest link on the most
    reliable route". ``wtree(u, v, w)`` are the forest edges with
    weights.

    Plan: binary lifting with a max carry — ``lift_k(v) = (2^k-th
    ancestor, max edge weight on that segment)``, built by K =
    ceil(log2(max depth)) self-joins (the pointer-doubling budget, NOT
    O(depth) rounds); every pair then resolves through 2(K+1)
    conditional equi-joins of the pairs table against the lift tables:
    equalize depths, then descend the highest differing jumps, then one
    final parent step on each side. Cross-component pairs are the
    caller's precondition (same contract as ``lca_pairs``)."""
    depths = reset_stats_checkpoint(tree_depths(et))

    # parent-edge weight per non-root vertex (canonical key lookup)
    wcanon = wtree.select(
        F.least("u", "v").alias("_a"), F.greatest("u", "v").alias("_b"),
        "w",
    )
    lift0 = (
        depths.where(F.col("parent").isNotNull())
        .select(
            F.col("id").alias("v"), F.col("parent").alias("anc"),
            F.least("id", "parent").alias("_a"),
            F.greatest("id", "parent").alias("_b"),
        )
        .join(wcanon, ["_a", "_b"])
        .select("v", "anc", F.col("w").alias("mx"))
    )
    lift0 = reset_stats_checkpoint(lift0)

    max_depth = depths.agg(F.max("depth")).collect()[0][0] or 0
    K = max(0, int(max_depth).bit_length() - 1)  # floor(log2(max_depth))
    lifts = [lift0]
    for _ in range(K):
        prev = lifts[-1]
        up = prev.select(F.col("v").alias("anc"),
                         F.col("anc").alias("anc2"),
                         F.col("mx").alias("mx2"))
        nxt = (
            prev.join(up, "anc")
            .select("v", F.col("anc2").alias("anc"),
                    F.greatest("mx", "mx2").alias("mx"))
        )
        lifts.append(reset_stats_checkpoint(nxt))

    du = depths.select(F.col("id").alias("u"), F.col("depth").alias("du"))
    dv = depths.select(F.col("id").alias("v"), F.col("depth").alias("dv"))
    st = (
        pairs.join(du, "u").join(dv, "v")
        .select("u", "v", F.col("u").alias("cu"), F.col("v").alias("cv"),
                "du", "dv", F.lit(None).cast("long").alias("mx"))
    )

    def _joined(state, k, side):
        lk = lifts[k].select(F.col("v").alias(f"c{side}"),
                             F.col("anc").alias(f"_a{side}"),
                             F.col("mx").alias(f"_m{side}"))
        return state.join(lk, f"c{side}", "left")

    # phase 1: lift the deeper endpoint until depths match
    for k in range(K, -1, -1):
        step = F.lit(1 << k)
        st = _joined(_joined(st, k, "u"), k, "v").select(
            "u", "v",
            F.when(F.col("du") - F.col("dv") >= step, F.col("_au"))
            .otherwise(F.col("cu")).alias("cu"),
            F.when(F.col("dv") - F.col("du") >= step, F.col("_av"))
            .otherwise(F.col("cv")).alias("cv"),
            F.when(F.col("du") - F.col("dv") >= step,
                   F.col("du") - step).otherwise(F.col("du")).alias("du"),
            F.when(F.col("dv") - F.col("du") >= step,
                   F.col("dv") - step).otherwise(F.col("dv")).alias("dv"),
            F.when(F.col("du") - F.col("dv") >= step,
                   F.greatest(F.coalesce("mx", F.lit(NEUTRAL_HI)),
                              F.col("_mu")))
            .when(F.col("dv") - F.col("du") >= step,
                  F.greatest(F.coalesce("mx", F.lit(NEUTRAL_HI)),
                             F.col("_mv")))
            .otherwise(F.col("mx")).alias("mx"),
        )
        st = reset_stats_checkpoint(st)

    # phase 2: equal depths — descend the highest jumps that keep the
    # endpoints apart, landing one step below the LCA
    done = st.where(F.col("cu") == F.col("cv"))
    live = st.where(F.col("cu") != F.col("cv"))
    for k in range(K, -1, -1):
        live = _joined(_joined(live, k, "u"), k, "v")
        jump = (F.col("_au").isNotNull() & F.col("_av").isNotNull()
                & (F.col("_au") != F.col("_av")))
        live = live.select(
            "u", "v",
            F.when(jump, F.col("_au")).otherwise(F.col("cu")).alias("cu"),
            F.when(jump, F.col("_av")).otherwise(F.col("cv")).alias("cv"),
            "du", "dv",
            F.when(jump,
                   F.greatest(F.coalesce("mx", F.lit(NEUTRAL_HI)),
                              F.greatest("_mu", "_mv")))
            .otherwise(F.col("mx")).alias("mx"),
        )
        live = reset_stats_checkpoint(live)
    # final parent step on both sides closes the path at the LCA
    live = _joined(_joined(live, 0, "u"), 0, "v").select(
        "u", "v",
        F.greatest(F.coalesce("mx", F.lit(NEUTRAL_HI)),
                   F.greatest("_mu", "_mv")).alias("path_max"),
    )
    return live.unionByName(
        done.select("u", "v", F.col("mx").alias("path_max"))
    )
