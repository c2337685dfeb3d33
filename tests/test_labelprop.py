"""Label propagation vs synchronous oracle — exact (deterministic tie-breaks)."""

from l_space_spark.operators import label_propagation

from conftest import edges_df
from oracles import KNOWS_EDGES, labelprop_oracle, two_cliques, zipf_edges


def _run(spark, pairs, **kw):
    res = label_propagation(spark, edges_df(spark, pairs), **kw)
    return {r["id"]: r["label"] for r in res.state.collect()}, res


def test_two_cliques_two_communities(spark):
    k = 6
    got, _ = _run(spark, two_cliques(k), fixed_iters=True, max_iters=4)
    want = labelprop_oracle(two_cliques(k), iters=4)
    assert got == want
    assert len(set(got.values())) == 2


def test_knows_fixed_rounds_exact(spark):
    for k in (1, 2, 3):
        got, _ = _run(spark, KNOWS_EDGES, fixed_iters=True, max_iters=k)
        assert got == labelprop_oracle(KNOWS_EDGES, iters=k), f"round {k}"


def test_zipf_fixed_rounds_exact(spark):
    pairs = zipf_edges(n_repos=150)
    got, _ = _run(spark, pairs, fixed_iters=True, max_iters=4)
    assert got == labelprop_oracle(pairs, iters=4)


def test_convergence_mode_stable(spark):
    k = 5
    got, res = _run(spark, two_cliques(k), max_iters=20)
    # converged LP on two disjoint cliques = one label per clique
    assert res.converged
    assert len(set(got.values())) == 2
