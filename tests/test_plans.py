"""Physical-plan assertions — the scale properties the engine depends on,
pinned as regression tests (SURVEY §4: these are exactly the optimizations
the reference lacks and Spark supplies, so losing one silently would be a
scale regression long before any correctness test notices).

Each test asserts on ``explain``/``executedPlan`` strings, not timings —
stable under the sandbox VM's noisy-neighbor load.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_projection_reach_parquet_scan(spark):
    """Predicate pushdown + column pruning: the scan must carry
    PushedFilters and read ONLY the projected columns."""
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    df = c.where(F.col("c_acctbal") > 1000).select("c_custkey")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "GreaterThan(c_acctbal" in plan
    # ReadSchema must not include unprojected columns like c_name/c_mktsegment
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "c_custkey" in read_schema and "c_acctbal" in read_schema
    assert "c_name" not in read_schema and "c_mktsegment" not in read_schema


def test_small_dim_join_broadcasts(spark):
    """customer ⋈ nation: the 25-row dim side must broadcast, not shuffle."""
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    df = c.join(n, c["c_nationkey"] == n["n_nationkey"]).select("c_custkey", "n_name")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregation_stays_in_codegen(spark):
    """The Q1-style scan→filter→agg pipeline must be whole-stage codegen
    (no Python/interpreted stage in the hot path). AQE only shows the
    final plan after execution, so run the query first."""
    from l_space_spark.queries import q_group_agg_q1

    df = q_group_agg_q1(spark, SF_DIR)
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # codegen spans print as "*(n) Operator" in the simple plan string
    import re

    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_order_limit_collapses_to_topk(spark):
    """order().limit(k) must plan as TakeOrderedAndProject — a streaming
    top-k per partition + driver merge, never a global sort."""
    from l_space_spark.queries import q_order_topk

    plan = _plan(q_order_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_csr_blocks_do_not_reshuffle_per_superstep(spark):
    """The packed CSR blocks are persisted hash-partitioned on ``block``;
    a superstep's cogroup must read them from the cache WITHOUT a new
    exchange — only the rank side may shuffle (SURVEY §4.2.2)."""
    from l_space_spark.operators.pagerank import (
        _csr_contribs, pack_csr_blocks, prepare_links,
    )

    edges = spark.range(0, 2000).select(
        F.pmod(F.xxhash64("id"), F.lit(300)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300)).alias("dst"),
    )
    links, verts, _ = prepare_links(edges, 4)
    blocks = pack_csr_blocks(links, 4).persist()
    try:
        blocks.count()
        ranks = verts.select("id", F.lit(0.5).alias("rank"))
        plan = _plan(_csr_contribs(ranks, blocks, 4, F.sum))
        # between the cogroup operator and the blocks cache scan only the
        # RANK side may exchange: exactly one block-key exchange there, and
        # none directly above the cache scan (the cachedPlan subtree printed
        # under InMemoryRelation contains the one-time pack exchanges — cut
        # the string at the scan so they don't count)
        cogroup_subtree = plan.split("FlatMapCoGroupsInArrow", 1)[1]
        above_cache = cogroup_subtree.split("InMemoryTableScan", 1)[0]
        assert above_cache.count("Exchange hashpartitioning(block") == 1, plan
    finally:
        blocks.unpersist()


def test_pagerank_links_shuffle_once(spark):
    """The dataframe impl's per-superstep contribution join must reuse the
    persisted src-partitioned links: no exchange between the links cache
    and the join."""
    from l_space_spark.operators.pagerank import prepare_links

    edges = spark.range(0, 2000).select(
        F.pmod(F.xxhash64("id"), F.lit(300)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300)).alias("dst"),
    )
    links, verts, _ = prepare_links(edges, 4)
    links = links.persist()
    try:
        links.count()
        ranks = verts.select("id", F.lit(0.5).alias("rank"))
        contribs = (
            ranks.hint("shuffle_hash")
            .join(links, ranks["id"] == links["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        import re

        plan = _plan(contribs)
        assert "InMemoryTableScan" in plan
        # no exchange may sit DIRECTLY above the links cache scan — the
        # persisted src partitioning must be reused by the join (exchanges
        # inside the printed cachedPlan subtree are the one-time build)
        assert not re.search(
            r"Exchange[^\n]*\n[\s:+|-]*InMemoryTableScan", plan
        ), plan
    finally:
        links.unpersist()


def test_simhash_close_pairs_has_no_nested_loop_join(spark):
    """The SimHash near-dup join must be the pigeonhole banded EQUI-join
    (shuffle on (band, band_bits)), never the O(N²) all-pairs theta join —
    BroadcastNestedLoopJoin in this plan is the round-1 scale-killer
    regressing."""
    from l_space_spark.queries import q_simhash_close_pairs

    plan = _plan(q_simhash_close_pairs(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_embedding_near_dup_has_no_nested_loop_join(spark):
    """The embedding near-dup tier must generate candidates via the LSH
    bucket EQUI-join — no all-pairs BroadcastNestedLoopJoin/
    CartesianProduct. The ONE allowed BNLJ is the one-ROW sign-matrix
    broadcast that `with_hyperplane_sketch` attaches (O(N) work, same
    scalar-broadcast idiom as PageRank's dangling-mass join) — identified
    by its `__signs` build side."""
    from l_space_spark.queries import q_dedup_embedding_cosine

    plan = _plan(q_dedup_embedding_cosine(spark, SF_DIR))
    bnlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert all("__signs" in l for l in bnlj), plan
    assert "CartesianProduct" not in plan, plan


def test_temporal_joins_have_no_nested_loop_join(spark):
    """As-of = union + one window (no join operator at all in the plan);
    banded range join = equi-join on (key, bucket) — neither may plan a
    BroadcastNestedLoopJoin/CartesianProduct from its inequality
    semantics."""
    from l_space_spark.queries import q_asof_join_events, q_range_join_counts

    asof_plan = _plan(q_asof_join_events(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in asof_plan, asof_plan
    assert "Join" not in asof_plan, asof_plan  # pure union + window
    assert "RunningWindowFunction" in asof_plan or "Window" in asof_plan

    range_plan = _plan(q_range_join_counts(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in range_plan, range_plan
    assert "CartesianProduct" not in range_plan, range_plan


def test_no_rowwise_python_udfs_anywhere():
    """Per-row Python is banned by input_hint: every F.udf( use is a bug.
    pandas_udf / mapInPandas / applyInPandas(WithState) / mapInArrow are
    the allowed vectorized surfaces."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "l_space_spark"
    offenders = []
    for path in root.rglob("*.py"):
        text = path.read_text()
        if "F.udf(" in text or "functions.udf(" in text:
            offenders.append(str(path))
    assert not offenders, offenders


def test_bucketed_edge_table_aggregates_without_shuffle(spark, tmp_path):
    """A src-bucketed edge table must feed groupBy(src) and src-keyed
    self-joins with NO exchange — the co-located-join layout for the
    superstep inner loop."""
    from l_space_spark.sources import write_bucketed_edges

    edges = spark.range(0, 1000).select(
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)).alias("dst"),
    )
    write_bucketed_edges(edges, "bucketed_edges_t", buckets=4,
                         path=str(tmp_path / "be"))
    try:
        t = spark.table("bucketed_edges_t")
        agg_plan = _plan(t.groupBy("src").count())
        assert "Exchange" not in agg_plan, agg_plan
        assert "Bucketed: true" in agg_plan

        # merge hint: at real scale this join is sort-merge (the tiny test
        # table would broadcast) — bucketed+sorted layout must give SMJ
        # with neither a shuffle nor a per-side sort
        a, b = t.alias("a").hint("merge"), t.alias("b")
        join_plan = _plan(
            a.join(b, F.col("a.src") == F.col("b.src")).select("a.dst")
        )
        assert "SortMergeJoin" in join_plan, join_plan
        assert "Exchange hashpartitioning" not in join_plan, join_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_edges_t")


def test_reverse_move_over_dst_bucketed_table_no_edge_exchange(spark, tmp_path):
    """VERDICT r2 #2: the edgesByTo companion index. A reverse traversal
    move (`in_`) over a Graph wired with the dst-bucketed edge copy must
    read the edge side straight from the bucketed scan — the ONLY exchange
    in the join is the (light) traverser side; the |E| table never
    re-shuffles at query time (mirror of the src-bucketed agg test;
    reference analog store/cassandra/.../CassandraGraphTables.scala:7-21)."""
    from l_space_spark.sources import write_bucketed_edges
    from l_space_spark.traversal import Graph

    edges = spark.range(0, 1000).select(
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)).alias("dst"),
    )
    write_bucketed_edges(edges, "rev_edges_t", buckets=4,
                         path=str(tmp_path / "re"), reverse=True)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the tiny test table exercises the at-scale
        # join strategy (the bucketed layout is irrelevant under broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        g = Graph.from_edgelist(
            spark.table("rev_edges_t"),
            edges_by_dst=spark.table("rev_edges_t__by_dst"),
        )
        t = g.N().in_()
        plan = _plan(t.df)
        assert "Bucketed: true" in plan, plan
        # exactly one exchange — the traverser side; none above the
        # bucketed by_dst scan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # and the one exchange is NOT on the edge-table columns
        exch_line = [l for l in plan.splitlines()
                     if "Exchange hashpartitioning" in l][0]
        assert "dst_id" not in exch_line, plan

        # correctness: identical multiset of arrival nodes vs the struct
        # join path (no companion table)
        g0 = Graph.from_edgelist(spark.table("rev_edges_t"))
        got = sorted(r["_id"] for r in t.df.select("_id").collect())
        want = sorted(r["_id"] for r in g0.N().in_().df.select("_id").collect())
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS rev_edges_t")
        spark.sql("DROP TABLE IF EXISTS rev_edges_t__by_dst")


def test_cc_sym_edges_table_no_edge_exchange(spark, tmp_path):
    """VERDICT r2 #2 (second half): CC/LP's per-round neighbor join over a
    pre-materialized src-bucketed symmetric closure must not exchange the
    edge side — only the |V|-row state shuffles."""
    from l_space_spark.operators.components import (
        connected_components, neighbor_mins, undirect,
    )
    from l_space_spark.sources import write_symmetric_edges

    edges = spark.range(0, 500).select(
        F.pmod(F.xxhash64("id"), F.lit(80)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(80)).alias("dst"),
    )
    write_symmetric_edges(edges, "sym_edges_t", buckets=4,
                          path=str(tmp_path / "se"))
    try:
        sym = spark.table("sym_edges_t")
        state = spark.range(0, 80).select(
            F.col("id"), F.col("id").alias("component")
        )
        plan = _plan(neighbor_mins(state, sym))
        assert "Bucketed: true" in plan, plan
        # between the join and the bucketed edge scan only the STATE side
        # may exchange (the tree prints the build/state side first); the
        # plan's one other exchange is the post-aggregation dst shuffle of
        # pre-aggregated |V|-bounded messages — inherent and edge-free
        join_to_scan = plan.split("ShuffledHashJoin", 1)[1].split(
            "Scan parquet", 1
        )[0]
        assert join_to_scan.count("Exchange") == 1, plan
        assert plan.count("Exchange hashpartitioning") == 2, plan

        # correctness: sym_edges path == recompute-undirect path
        a = connected_components(spark, edges, resume=False,
                                 num_partitions=4)
        b = connected_components(spark, edges, sym_edges=sym, resume=False,
                                 num_partitions=4)
        assert sorted(map(tuple, a.state.collect())) == sorted(
            map(tuple, b.state.collect())
        )
        # the table really is the closure the operator would compute
        assert sorted(map(tuple, sym.select("src", "dst").collect())) == sorted(
            map(tuple, undirect(edges).collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS sym_edges_t")


def test_lp_sym_edges_matches_recompute(spark, tmp_path):
    from l_space_spark.operators.labelprop import label_propagation
    from l_space_spark.sources import write_symmetric_edges

    edges = spark.range(0, 500).select(
        F.pmod(F.xxhash64("id"), F.lit(80)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(80)).alias("dst"),
    )
    write_symmetric_edges(edges, "sym_edges_lp_t", buckets=4,
                          path=str(tmp_path / "selp"))
    try:
        a = label_propagation(spark, edges, max_iters=4, fixed_iters=True,
                              resume=False, num_partitions=4)
        b = label_propagation(spark, edges, max_iters=4, fixed_iters=True,
                              sym_edges=spark.table("sym_edges_lp_t"),
                              resume=False, num_partitions=4)
        assert sorted(map(tuple, a.state.collect())) == sorted(
            map(tuple, b.state.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS sym_edges_lp_t")


def test_partition_pruning_on_partitioned_parquet(spark, tmp_path):
    """A table partitioned by a column must prune partitions at the scan
    when filtered on it — the Iceberg-partition-transform analog for the
    parquet fallback (SURVEY §4.1 'index space' replacement)."""
    path = str(tmp_path / "events_part")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.pmod(F.col("id"), F.lit(7))).alias("day"),
    )
    df.write.partitionBy("day").parquet(path)
    t = spark.read.parquet(path)
    q = t.where(F.col("day") == 3).select("id")
    plan = _plan(q)
    assert "PartitionFilters: [" in plan
    assert "(day" in plan.split("PartitionFilters:", 1)[1].splitlines()[0]
    # only 1 of 7 partition directories is read
    assert q.count() == df.where(F.col("day") == 3).count()


def test_small_frontier_move_broadcasts_and_skips_edge_shuffle(spark):
    """VERDICT r2 #3: hot frontier keys. A move from a hint_small (or
    adaptively-detected-small) frontier must BROADCAST the traverser side
    — the edge scan feeds the join with NO exchange, so a celebrity
    vertex's edge block stays spread across balanced scan splits instead
    of collapsing into one shuffle task. Results identical either way."""
    from l_space_spark.traversal import Graph

    # celebrity: vertex 0 owns 25% of all edges
    n = 4000
    edges = spark.range(0, n).select(
        F.when(F.col("id") % 4 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(200))).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(200)).alias("dst"),
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # kill AUTO broadcast so the test exercises the explicit strategy
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        g = Graph.from_edgelist(edges)
        plain = g.N().out()
        hinted = g.N().hint_small().out()
        p_plain, p_hint = _plan(plain.df), _plan(hinted.df)
        assert "BroadcastHashJoin" not in p_plain, p_plain
        assert "BroadcastHashJoin" in p_hint, p_hint
        # broadcast side is the traverser, not the |E| table: no exchange
        # may touch the edge columns
        exch = [l for l in p_hint.splitlines() if "Exchange" in l]
        assert not any("__e_src" in l for l in exch), p_hint

        a = sorted(r["_id"] for r in plain.df.select("_id").collect())
        b = sorted(r["_id"] for r in hinted.df.select("_id").collect())
        assert a == b and len(a) == n

        # adaptive: repeat() flips the hint on once the frontier count is
        # below threshold — 2-hop BFS from one node stays broadcast
        t = g.N().has_id(0).repeat(lambda s: s.out(), max_loops=1,
                                   broadcast_frontier_rows=100_000)
        assert t.df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_anf_edge_cache_reused_without_exchange(spark):
    """ANF's per-superstep inbox join is on dst; the edge cache is
    dst-partitioned, so no exchange may sit directly above its scan
    (the src-partitioned form re-shuffled |E| every superstep)."""
    import re

    from l_space_spark.functions.text import hash60
    from l_space_spark.operators.sketch import bottom_k_hashes

    e = (
        spark.range(0, 2000).select(
            F.pmod(F.xxhash64("id"), F.lit(300)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300)).alias("dst"),
        ).distinct().repartition(4, "dst").persist()
    )
    try:
        e.count()
        state = (
            e.select(F.col("src").alias("id")).distinct()
            .select("id",
                    F.array(hash60(F.col("id").cast("string"))).alias("sk"))
            .localCheckpoint(eager=True)
        )
        ej = e.select(F.col("src").alias("e_src"),
                      F.col("dst").alias("e_dst"))
        inbox = (
            state.hint("shuffle_hash")
            .join(ej, state["id"] == ej["e_dst"])
            .select(F.col("e_src").alias("g"), F.explode("sk").alias("h"))
            .groupBy("g", "h").agg(F.lit(1).alias("__one"))
        )
        plan = _plan(bottom_k_hashes(inbox, 8, 4))
        assert "InMemoryTableScan" in plan
        assert not re.search(
            r"Exchange[^\n]*\n[\s:+|-]*InMemoryTableScan", plan
        ), plan
    finally:
        e.unpersist()


def test_walks_edge_cache_reused_without_exchange(spark):
    """random_walks' per-step frontier join is on src over the
    src-partitioned cache: only the frontier side may exchange."""
    import re

    from l_space_spark.functions.text import hash60

    e = (
        spark.range(0, 2000).select(
            F.pmod(F.xxhash64("id"), F.lit(300)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300)).alias("dst"),
        ).distinct().repartition(4, "src").persist()
    )
    try:
        e.count()
        frontier = (
            e.select(F.col("src").alias("walk_id"),
                     F.col("src").alias("cur"))
            .distinct().localCheckpoint(eager=True)
        )
        cand = frontier.hint("shuffle_hash").join(
            e, frontier["cur"] == e["src"]
        ).select(
            "walk_id", "dst",
            hash60(F.concat_ws(":", F.lit("walk"),
                               F.col("walk_id").cast("string"), F.lit("1"),
                               F.col("dst").cast("string"))).alias("h"),
        )
        step = (
            cand.groupBy("walk_id")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .select("walk_id", F.col("m.dst").alias("cur"))
        )
        plan = _plan(step)
        assert "InMemoryTableScan" in plan
        assert not re.search(
            r"Exchange[^\n]*\n[\s:+|-]*InMemoryTableScan", plan
        ), plan
    finally:
        e.unpersist()


def test_wedge_join_linkpred_family_plans(spark):
    """The wedge-join candidate generators (Adamic-Adar, rectangle
    census) must stay bucketed EQUI-joins on the wedge center with a
    map-side-combined (partial + final) aggregate on the pair/co-degree
    groupBy — an all-pairs BroadcastNestedLoopJoin/CartesianProduct here
    is the O(N²) scale-killer, and losing the partial aggregate would
    ship every wedge row through the shuffle un-combined."""
    from l_space_spark.queries import q_adamic_adar_pairs, q_rectangle_count

    for df in (q_adamic_adar_pairs(spark, SF_DIR),
               q_rectangle_count(spark, SF_DIR)):
        plan = _plan(df)
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "partial_count" in plan, plan


def test_dag_levels_link_cache_no_per_round_exchange(spark):
    """dag_levels' per-superstep join must reuse the src-hashed link
    cache without re-exchanging it (the pagerank/components discipline:
    only the |V|-row level table shuffles per round). Pinned on the
    REAL step builder (``_level_step``) applied to an un-checkpointed
    state — the post-run ``res.state`` is a localCheckpoint leaf whose
    plan shows nothing."""
    import re

    from l_space_spark.operators.toposort import _level_step

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(0, 20), (10, 30)],
        "src long, dst long",
    )
    links = edges.repartition(4, "src").persist()
    verts = (edges.select(F.col("src").alias("id"))
             .unionByName(edges.select(F.col("dst").alias("id")))
             .distinct().repartition(4, "id").persist())
    try:
        links.count(), verts.count()
        state = verts.select(
            "id", F.lit(0).cast("long").alias("level")
        ).localCheckpoint(eager=True)
        plan = _plan(_level_step(links, verts)(state, 0))
        assert "InMemoryTableScan" in plan, plan
        # neither cached side may sit directly under an Exchange
        assert not re.search(
            r"Exchange[^\n]*\n[\s:+|-]*InMemoryTableScan", plan
        ), plan
    finally:
        links.unpersist()
        verts.unpersist()


def test_wl_recolor_no_per_round_edge_exchange(spark):
    """WL's per-round recolor must reuse the src-hashed closure cache
    without re-exchanging it, and the multiset aggregate must be
    map-side combined (partial_sum/partial_count before the shuffle) —
    losing either re-ships |E| rows per round."""
    import re

    from l_space_spark.operators.wl import _recolor_step
    from l_space_spark.operators.components import undirect

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(120)], "src long, dst long"
    )
    links = undirect(edges).repartition(4, "src").persist()
    try:
        links.count()
        state = (links.groupBy("src").agg(F.count(F.lit(1)).alias("color"))
                 .select(F.col("src").alias("id"),
                         F.col("color").cast("long"))
                 .localCheckpoint(eager=True))
        plan = _plan(_recolor_step(links)(state, 0))
        assert "InMemoryTableScan" in plan, plan
        assert "partial_sum" in plan and "partial_count" in plan, plan
        assert not re.search(
            r"Exchange[^\n]*\n[\s:+|-]*InMemoryTableScan", plan
        ), plan
    finally:
        links.unpersist()


def test_louvain_step_no_per_round_edge_exchange(spark):
    """Louvain's per-round move must reuse the dst-hashed closure cache
    without re-exchanging it, with every aggregate map-side combined
    (partial_count for neighbor-community tallies, partial_sum for
    volumes, partial_max for the argmax) — losing the cache reuse
    re-ships |E| rows per round."""
    import re

    from l_space_spark.operators.louvain import _move_step
    from l_space_spark.operators.components import undirect

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(120)], "src long, dst long"
    )
    links = undirect(edges).repartition(4, "dst").persist()
    degs = (links.groupBy("src")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
            .select(F.col("src").alias("id"), "d")
            .repartition(4, "id").persist())
    try:
        m2 = links.count()
        degs.count()
        state = degs.select(
            "id", F.col("id").cast("long").alias("com")
        ).localCheckpoint(eager=True)
        plan = _plan(_move_step(links, degs, m2)(state, 0))
        assert "InMemoryTableScan" in plan, plan
        for frag in ("partial_count", "partial_sum", "partial_max"):
            assert frag in plan, (frag, plan)
        assert not re.search(
            r"Exchange[^\n]*\n[\s:+|-]*InMemoryTableScan", plan
        ), plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        links.unpersist()
        degs.unpersist()


def test_louvain_weighted_step_no_per_round_edge_exchange(spark):
    """The WEIGHTED move step (the louvain_multilevel phase-2 path) must
    keep the same pins as the unweighted one: dst-hashed weighted
    closure cache reused without re-exchange, kvc tally map-side
    combined (partial_sum over w), volumes partial_sum, argmax
    partial_max."""
    import re

    from l_space_spark.operators.louvain import _move_step

    rows = [(i, (i * 7 + 1) % 50, (i % 3) + 1) for i in range(120)]
    e = spark.createDataFrame(rows, "src long, dst long, w long")
    links = (e.where(F.col("src") != F.col("dst"))
             .unionByName(e.where(F.col("src") != F.col("dst"))
                          .select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst"), "w"))
             .repartition(4, "dst").persist())
    degs = (links.groupBy("src").agg(F.sum("w").cast("long").alias("d"))
            .select(F.col("src").alias("id"), "d")
            .repartition(4, "id").persist())
    try:
        m2 = int(links.agg(F.sum("w")).first()[0])
        degs.count()
        links.count()
        state = degs.select(
            "id", F.col("id").cast("long").alias("com")
        ).localCheckpoint(eager=True)
        plan = _plan(_move_step(links, degs, m2, weighted=True)(state, 0))
        assert "InMemoryTableScan" in plan, plan
        for frag in ("partial_sum", "partial_max"):
            assert frag in plan, (frag, plan)
        assert not re.search(
            r"Exchange[^\n]*\n[\s:+|-]*InMemoryTableScan", plan
        ), plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        links.unpersist()
        degs.unpersist()
