"""Triangle counting — exact vs brute-force oracle."""

from l_space_spark.operators import triangle_count, triangles_per_vertex

from conftest import edges_df
from oracles import KNOWS_EDGES, cycle, triangles_oracle, two_cliques, zipf_edges


def test_cycle_zero(spark):
    assert triangle_count(spark, edges_df(spark, cycle(10))) == 0


def test_two_cliques_closed_form(spark):
    k = 6
    want = 2 * (k * (k - 1) * (k - 2) // 6)  # 2 * C(k,3)
    assert triangle_count(spark, edges_df(spark, two_cliques(k))) == want


def test_knows_one_undirected_triangle(spark):
    # Garrison(56789)–Kevin(34567)–Stan(567) close a triangle undirected
    assert triangle_count(spark, edges_df(spark, KNOWS_EDGES)) == 1


def test_zipf_exact_and_per_vertex(spark):
    pairs = zipf_edges(n_repos=120)
    total, per = triangles_oracle(pairs)
    e = edges_df(spark, pairs)
    assert triangle_count(spark, e) == total
    got = {r["id"]: r["triangles"] for r in triangles_per_vertex(spark, e).collect()}
    assert got == per


def test_direction_and_duplicates_ignored(spark):
    # parallel + reversed + self-loop edges must not change the count
    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    assert triangle_count(spark, edges_df(spark, pairs)) == 1


def test_clustering_coefficient_known_graphs(spark):
    from l_space_spark.operators.triangles import clustering_coefficient
    from conftest import edges_df

    # K4: every vertex lcc = 1; path: all 0; pendant on a triangle
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {r["id"]: (r["degree"], r["triangles"], r["lcc_e6"])
           for r in clustering_coefficient(spark, edges_df(spark, k4)).collect()}
    assert got == {i: (3, 3, 1_000_000) for i in range(4)}

    path = [(0, 1), (1, 2), (2, 3)]
    got = {r["id"]: r["lcc_e6"]
           for r in clustering_coefficient(spark, edges_df(spark, path)).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}

    tri_pendant = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = {r["id"]: (r["degree"], r["triangles"], r["lcc_e6"])
           for r in clustering_coefficient(
               spark, edges_df(spark, tri_pendant)).collect()}
    assert got[0] == (2, 1, 1_000_000)
    assert got[2] == (3, 1, 333_333)  # 2*1/(3*2) = 1/3
    assert got[3] == (1, 0, 0)
