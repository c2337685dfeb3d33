"""Resumability (north rule): kill after superstep k, resume, identical result."""

import json
import os

from l_space_spark.operators import pagerank

from conftest import edges_df
from oracles import zipf_edges


def _ranks(res):
    return {r["id"]: r["rank"] for r in res.state.collect()}


def test_resume_matches_uninterrupted_run(spark, tmp_path):
    pairs = zipf_edges(n_repos=120)
    e = edges_df(spark, pairs)

    # deterministic mode pins fp summation order → byte-identical guarantees
    full = pagerank(spark, e, tol=0.0, max_iters=6, deterministic=True, resume=False)
    want = _ranks(full)

    ck = str(tmp_path / "ck")
    # "killed" run: only 3 supersteps complete, then a crash mid-superstep-3
    # leaves an incomplete state dir without _meta.json — must be ignored
    part = pagerank(spark, e, tol=0.0, max_iters=3, deterministic=True,
                    checkpoint_dir=ck, resume=False)
    assert part.iterations == 3
    incomplete = os.path.join(ck, "state_00003")
    os.makedirs(incomplete, exist_ok=True)

    ck2 = str(tmp_path / "ck2")
    part2 = pagerank(spark, e, tol=0.0, max_iters=6, deterministic=True,
                     checkpoint_dir=ck2, resume=False)
    want_ck = _ranks(part2)
    for k, v in want.items():
        assert want_ck[k] == v, k  # checkpointing must not change results

    # real resume: same config, interrupt by deleting the last 3 checkpoints
    for i in (3, 4, 5):
        d = os.path.join(ck2, f"state_{i:05d}")
        if os.path.isdir(d):
            import shutil

            shutil.rmtree(d)
    resumed = pagerank(spark, e, tol=0.0, max_iters=6, deterministic=True,
                       checkpoint_dir=ck2, resume=True)
    assert resumed.resumed_from == 2
    got = _ranks(resumed)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k  # byte-identical doubles


def test_checkpoint_meta_lineage(spark, tmp_path):
    pairs = zipf_edges(n_repos=80)
    ck = str(tmp_path / "ck")
    pagerank(spark, edges_df(spark, pairs), tol=0.0, max_iters=3,
             checkpoint_dir=ck, resume=False)
    steps = sorted(d for d in os.listdir(ck) if d.startswith("state_"))
    assert steps == ["state_00000", "state_00001", "state_00002"]
    for i, d in enumerate(steps):
        meta = json.load(open(os.path.join(ck, d, "_meta.json")))
        assert meta["iteration"] == i
        assert meta["rows"] > 0
        assert "partition_counts" in meta and sum(meta["partition_counts"]) == meta["rows"]
        assert meta["config_hash"] == json.load(
            open(os.path.join(ck, steps[0], "_meta.json"))
        )["config_hash"]


def test_converged_checkpoint_short_circuits(spark, tmp_path):
    # star graph converges in a handful of supersteps (spokes are rank-stable
    # after one round) — fast enough to run twice with durable checkpoints
    from oracles import star

    pairs = star(10)
    ck = str(tmp_path / "ck")
    first = pagerank(spark, edges_df(spark, pairs), tol=1e-6, max_iters=60,
                     checkpoint_dir=ck, resume=False)
    assert first.converged
    again = pagerank(spark, edges_df(spark, pairs), tol=1e-6, max_iters=60,
                     checkpoint_dir=ck, resume=True)
    assert again.iterations == first.iterations  # no extra supersteps ran
    assert again.converged
    assert again.resumed_from is not None
    a = {r["id"]: r["rank"] for r in first.state.collect()}
    b = {r["id"]: r["rank"] for r in again.state.collect()}
    assert a == b


def test_time_limit_budget(spark):
    """TimeLimit analog (``step/TimeLimit.scala:45``): completed supersteps
    within the wall-clock budget are kept; the loop stops before starting
    one past it, flagged ``timed_out`` (not converged)."""
    import time

    from pyspark.sql import functions as F

    from l_space_spark.plans.superstep import SuperstepRunner

    init = spark.range(3).select("id", F.lit(0).alias("x"))
    bump = lambda s, i: s.withColumn("x", F.col("x") + 1)  # noqa: E731

    # zero budget: no superstep starts
    res = SuperstepRunner(spark, max_iters=5, tol=-1.0, time_limit_s=0.0).run(
        init, bump, metric_fn=None
    )
    assert res.timed_out and res.iterations == 0 and not res.converged

    # generous budget: unaffected
    res = SuperstepRunner(spark, max_iters=3, tol=-1.0, time_limit_s=3600).run(
        init, bump, metric_fn=None
    )
    assert not res.timed_out and res.iterations == 3
    assert res.state.agg(F.max("x")).first()[0] == 3

    # budget spent mid-run: the finished superstep is kept, the next never starts
    def slow_bump(s, i):
        time.sleep(0.4)
        return s.withColumn("x", F.col("x") + 1)

    res = SuperstepRunner(spark, max_iters=5, tol=-1.0, time_limit_s=0.2).run(
        init, slow_bump, metric_fn=None
    )
    assert res.timed_out and res.iterations == 1
    assert res.state.agg(F.max("x")).first()[0] == 1


def test_dag_levels_and_wl_resume(spark, tmp_path):
    """The two round-4 superstep operators inherit kill-and-resume from
    SuperstepRunner: interrupt by deleting trailing checkpoints, resume,
    identical final state."""
    import shutil

    from l_space_spark.operators.toposort import dag_levels
    from l_space_spark.operators.wl import wl_refinement

    # a 7-deep chain plus shortcuts: several rounds of real work
    pairs = [(i, i + 1) for i in range(7)] + [(0, 3), (2, 6), (1, 5)]
    e = edges_df(spark, pairs)

    for name, run in (
        ("dag", lambda **kw: dag_levels(spark, e, max_iters=6,
                                        fixed_iters=True,
                                        num_partitions=4, **kw)),
        ("wl", lambda **kw: wl_refinement(spark, e, max_iters=4,
                                          fixed_iters=True,
                                          num_partitions=4, **kw)),
    ):
        want = {tuple(r) for r in run(resume=False).state.collect()}
        ck = str(tmp_path / f"ck_{name}")
        run(checkpoint_dir=ck, resume=False)
        for i in (3, 4, 5):
            d = os.path.join(ck, f"state_{i:05d}")
            if os.path.isdir(d):
                shutil.rmtree(d)
        resumed = run(checkpoint_dir=ck, resume=True)
        assert resumed.resumed_from == 2, name
        assert {tuple(r) for r in resumed.state.collect()} == want, name
