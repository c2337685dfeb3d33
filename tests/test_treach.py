"""Earliest-arrival temporal reachability: hand contact graphs (the
time-respecting constraint), a python fixpoint twin on random temporal
graphs, kill-and-resume, and the jobspec wire path."""

import json
import os
import random
import shutil

from l_space_spark.operators.treach import arrivals, earliest_arrival


def tdf(spark, triples):
    return spark.createDataFrame(
        [(int(s), int(d), int(t)) for s, d, t in triples],
        "src long, dst long, t long",
    )


def sdf(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def twin(triples, seeds, start_t=0):
    """Iterate the monotone relaxation to its (unique) fixpoint."""
    arr = {s: start_t for s in seeds}
    changed = True
    while changed:
        changed = False
        for s, d, t in triples:
            if s != d and s in arr and t >= arr[s] and t < arr.get(d, t + 1):
                arr[d] = t
                changed = True
    return arr


def _run(spark, triples, seeds, **kw):
    res = earliest_arrival(spark, tdf(spark, triples), sdf(spark, seeds),
                           num_partitions=4, **kw)
    return {r["id"]: r["arrival"] for r in arrivals(res).collect()}, res


def test_time_respecting_chain(spark):
    # a->b at 5 then b->c at 7 works; b->x at 3 is in the past once b is
    # reached at 5, so x stays unreachable
    got, res = _run(spark, [(1, 2, 5), (2, 3, 7), (2, 4, 3)], [1])
    assert got == {1: 0, 2: 5, 3: 7}
    assert res.converged


def test_min_over_paths_and_revisit(spark):
    # two routes to 4: via 2 arrives at 6, via 3 arrives at 9 → 6; the
    # later-arriving route must not overwrite the earlier one
    triples = [(1, 2, 1), (2, 4, 6), (1, 3, 2), (3, 4, 9)]
    got, _ = _run(spark, triples, [1])
    assert got[4] == 6


def test_improvement_reopens_downstream(spark):
    # first sweep reaches 3 at 9 via (2,3,9); the cheaper arrival at 2
    # unlocks (2,3,4) later — the frontier must re-expand on improvement
    triples = [(1, 2, 8), (2, 3, 9), (1, 5, 1), (5, 2, 2), (2, 3, 4)]
    got, _ = _run(spark, triples, [1])
    assert got == twin(triples, [1]) and got[3] == 4


def test_multi_seed_and_self_loop(spark):
    triples = [(1, 1, 5), (1, 2, 5), (3, 4, 1)]
    got, _ = _run(spark, triples, [1, 3])
    assert got == {1: 0, 2: 5, 3: 0, 4: 1}


def test_seed_only_no_edges(spark):
    got, res = _run(spark, [(7, 7, 1)], [9])
    assert got == {9: 0}
    assert res.converged


def test_random_matches_twin(spark):
    rng = random.Random(13)
    triples = [(rng.randrange(40), rng.randrange(40), rng.randrange(100))
               for _ in range(250)]
    got, _ = _run(spark, triples, [0, 1])
    assert got == twin(triples, [0, 1])


def test_start_t_filters_old_contacts(spark):
    triples = [(1, 2, 5), (1, 3, 50)]
    got, _ = _run(spark, triples, [1], start_t=10)
    assert got == {1: 10, 3: 50}


def test_kill_and_resume(spark, tmp_path):
    rng = random.Random(29)
    triples = [(rng.randrange(60), rng.randrange(60), rng.randrange(200))
               for _ in range(400)]
    want = twin(triples, [0])
    ck = str(tmp_path / "ck")
    full = earliest_arrival(spark, tdf(spark, triples), sdf(spark, [0]),
                            num_partitions=4, checkpoint_dir=ck,
                            resume=False)
    assert full.converged and full.iterations >= 2
    for i in range(1, full.iterations):
        d = os.path.join(ck, f"state_{i:05d}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    res = earliest_arrival(spark, tdf(spark, triples), sdf(spark, [0]),
                           num_partitions=4, checkpoint_dir=ck, resume=True)
    assert res.resumed_from == 0
    got = {r["id"]: r["arrival"] for r in arrivals(res).collect()}
    assert got == want
    meta = json.load(open(os.path.join(ck, "state_00000", "_meta.json")))
    assert "partition_counts" in meta


def test_jobspec_wire(spark, tmp_path):
    from l_space_spark.jobspec import run_job

    triples = [(1, 2, 5), (2, 3, 7), (2, 4, 3)]
    p = str(tmp_path / "tedges")
    tdf(spark, triples).withColumnRenamed("t", "contact_us").write.parquet(p)
    spec = {"kind": "algorithm", "algorithm": "earliest_arrival",
            "resume": False,
            "input": {"edges_parquet": p},
            "params": {"seeds": [1], "time_col": "contact_us"}}
    got = {r["id"]: r["arrival"] for r in run_job(spark, spec).collect()}
    assert got == {1: 0, 2: 5, 3: 7}
    # missing seeds is an explicit error
    import pytest

    with pytest.raises(ValueError):
        run_job(spark, {"kind": "algorithm", "algorithm": "earliest_arrival",
                        "input": {"edges_parquet": p}, "params": {}})
