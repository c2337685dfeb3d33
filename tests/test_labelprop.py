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


# ---- seeded label spreading -------------------------------------------------


def spreading_twin(pairs, seeds, rounds):
    """Python twin: clamped seeds, synchronous majority over labeled
    neighbors, ties to the smaller label, keep when no labeled neighbor."""
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    lab = dict(seeds)
    for _ in range(rounds):
        votes = defaultdict(lambda: defaultdict(int))
        for u, l in lab.items():
            for v in adj[u]:
                votes[v][l] += 1
        new = dict(lab)
        for v in adj:
            if v in seeds:
                continue
            if votes[v]:
                new[v] = min(votes[v], key=lambda l: (-votes[v][l], l))
        lab = new
    return lab


def _spread(spark, pairs, seeds, rounds, **kw):
    from l_space_spark.operators.labelprop import label_spreading

    sd = spark.createDataFrame(list(seeds.items()), "id long, label long")
    res = label_spreading(spark, edges_df(spark, pairs), sd, rounds=rounds,
                          num_partitions=4, **kw)
    return {r["id"]: r["label"] for r in res.state.collect()
            if r["label"] is not None}, res


def test_spreading_two_cliques_from_one_seed_each(spark):
    pairs = two_cliques(5)
    cliques = sorted({v for p in pairs for v in p})
    seeds = {cliques[0]: 100, cliques[-1]: 200}
    got, res = _spread(spark, pairs, seeds, rounds=4)
    want = spreading_twin(pairs, seeds, 4)
    assert got == want
    assert len([v for v in got.values() if v == 100]) == 5
    assert len([v for v in got.values() if v == 200]) == 5


def test_spreading_seeds_are_clamped(spark):
    # seed 0 is outnumbered by neighbors labeled 9 but must keep label 1
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 1)]
    seeds = {0: 1, 1: 9, 2: 9, 3: 9}
    got, _ = _spread(spark, pairs, seeds, rounds=3)
    assert got[0] == 1 and got[1] == got[2] == got[3] == 9


def test_spreading_unreached_stay_unlabeled(spark):
    pairs = [(1, 2), (3, 4)]
    got, _ = _spread(spark, pairs, {1: 7}, rounds=2)
    assert got == {1: 7, 2: 7}


def test_spreading_random_matches_twin(spark):
    import random

    rng = random.Random(17)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
    seeds = {0: 10, 1: 20, 2: 30}
    for rounds in (1, 3):
        got, _ = _spread(spark, pairs, seeds, rounds=rounds)
        assert got == spreading_twin(pairs, seeds, rounds), f"rounds={rounds}"


def test_spreading_jobspec(spark, tmp_path):
    from l_space_spark.jobspec import run_job

    p = str(tmp_path / "sedges")
    edges_df(spark, [(1, 2), (2, 3)]).write.parquet(p)
    spec = {"kind": "algorithm", "algorithm": "label_spreading",
            "resume": False, "input": {"edges_parquet": p},
            "params": {"seeds": [[1, 5]], "rounds": 2}}
    got = {r["id"]: r["label"] for r in run_job(spark, spec).collect()
           if r["label"] is not None}
    assert got == {1: 5, 2: 5, 3: 5}
    import pytest

    with pytest.raises(ValueError):
        run_job(spark, {"kind": "algorithm", "algorithm": "label_spreading",
                        "input": {"edges_parquet": p}, "params": {}})
