"""Connected components vs union-find oracle — exact match required."""

from l_space_spark.operators import connected_components

from conftest import edges_df
from oracles import KNOWS_EDGES, components_oracle, cycle, two_cliques, zipf_edges


def _run(spark, pairs, **kw):
    res = connected_components(spark, edges_df(spark, pairs), **kw)
    return {r["id"]: r["component"] for r in res.state.collect()}, res


def test_cycle_single_component(spark):
    got, res = _run(spark, cycle(10))
    assert res.converged
    assert set(got.values()) == {0}


def test_two_cliques(spark):
    k = 5
    got, _ = _run(spark, two_cliques(k))
    assert got == components_oracle(two_cliques(k))
    assert set(got.values()) == {0, k}


def test_knows_micrograph_one_weak_component(spark):
    got, _ = _run(spark, KNOWS_EDGES)
    assert got == components_oracle(KNOWS_EDGES)
    assert set(got.values()) == {123}


def test_zipf_graph_exact(spark):
    pairs = zipf_edges(n_repos=200)
    got, res = _run(spark, pairs)
    assert got == components_oracle(pairs)
    assert res.converged


def test_disjoint_chains(spark):
    # long chain exercises multi-superstep propagation
    pairs = [(i, i + 1) for i in range(0, 19)] + [(100 + i, 101 + i) for i in range(9)]
    got, _ = _run(spark, pairs)
    want = components_oracle(pairs)
    assert got == want
    assert set(got.values()) == {0, 100}


def test_star_contraction_matches_hashmin(spark):
    from l_space_spark.operators.components import (
        connected_components, connected_components_star,
    )
    from pyspark.sql import functions as F

    edges = spark.range(0, 400).select(
        F.pmod(F.xxhash64("id"), F.lit(300)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300)).alias("dst"),
    )
    a = connected_components(spark, edges, resume=False).state
    b = connected_components_star(spark, edges, resume=False).state
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_star_contraction_logarithmic_on_path_graph(spark):
    """A path graph is hash-min's worst case (O(n) rounds to propagate the
    minimum); star contraction must converge in O(log n) supersteps."""
    from l_space_spark.operators.components import connected_components_star
    from pyspark.sql import functions as F

    n = 4096
    edges = spark.range(0, n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    res = connected_components_star(spark, edges, max_iters=30, resume=False)
    assert res.converged and res.iterations <= 15, res.iterations
    rows = res.state.agg(
        F.countDistinct("component").alias("c"),
        F.count(F.lit(1)).alias("n"),
        F.max("component").alias("m"),
    ).first()
    assert rows["c"] == 1 and rows["n"] == n and rows["m"] == 0


def test_kcore_two_cliques_plus_tail(spark):
    """Two 5-cliques joined by a path: the 4-core is exactly the cliques;
    the path peels away. Oracle: python peeling."""
    from l_space_spark.operators.kcore import kcore
    from oracles import two_cliques

    k = 5
    pairs = two_cliques(k)  # vertices 0..4 and 5..9, each a 5-clique
    pairs += [(4, 100), (100, 101), (101, 5)]  # low-degree bridge
    res = kcore(spark, edges_df(spark, pairs), k=4, resume=False)
    got = {r["id"]: r["core_deg"] for r in res.state.collect()}
    assert set(got) == set(range(10))
    assert all(d == 4 for d in got.values())


def test_kcore_empty_when_k_exceeds_max_degree(spark):
    from l_space_spark.operators.kcore import kcore
    from oracles import cycle

    res = kcore(spark, edges_df(spark, cycle(8)), k=3, resume=False)
    assert res.state.count() == 0
