"""PageRank vs numpy oracle: closed forms, golden graph, zipf graph, CSR parity."""

import numpy as np
import pytest

from l_space_spark.operators import pagerank

from conftest import edges_df
from oracles import KNOWS_EDGES, cycle, pagerank_oracle, star, zipf_edges


def _run(spark, pairs, **kw):
    res = pagerank(spark, edges_df(spark, pairs), **kw)
    ranks = {r["id"]: r["rank"] for r in res.state.collect()}
    return ranks, res


def _assert_close(got: dict, want: dict, atol=1e-6):
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= atol, (k, got[k], want[k])


def test_cycle_uniform(spark):
    n = 12
    got, res = _run(spark, cycle(n))
    assert res.converged
    for v, r in got.items():
        assert abs(r - 1.0 / n) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_star_closed_form(spark):
    k = 8
    got, _ = _run(spark, star(k))
    want, _ = pagerank_oracle(star(k))
    _assert_close(got, want)
    assert got[0] > got[1]  # hub dominates
    spokes = [got[i] for i in range(1, k + 1)]
    assert max(spokes) - min(spokes) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_knows_micrograph(spark):
    got, res = _run(spark, KNOWS_EDGES)
    want, _ = pagerank_oracle(KNOWS_EDGES)
    _assert_close(got, want)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_zipf_graph_oracle(spark):
    pairs = zipf_edges(n_repos=200)
    got, res = _run(spark, pairs)
    want, _ = pagerank_oracle(pairs)
    _assert_close(got, want)
    assert res.converged


def test_fixed_iters_mode_matches_oracle_exactly(spark):
    pairs = zipf_edges(n_repos=150)
    got, res = _run(spark, pairs, tol=0.0, max_iters=7)
    want, it = pagerank_oracle(pairs, tol=0.0, max_iters=7)
    assert it == 7 and res.iterations == 7
    _assert_close(got, want, atol=1e-12)


@pytest.mark.parametrize("impl", ["csr"])
def test_csr_impl_parity(spark, impl):
    pairs = zipf_edges(n_repos=150)
    got, _ = _run(spark, pairs, impl=impl, tol=0.0, max_iters=5, num_partitions=4)
    want, _ = pagerank_oracle(pairs, tol=0.0, max_iters=5)
    _assert_close(got, want, atol=1e-9)


def test_salted_impl_parity(spark):
    pairs = zipf_edges(n_repos=150)
    got, _ = _run(spark, pairs, salt=4, tol=0.0, max_iters=5)
    want, _ = pagerank_oracle(pairs, tol=0.0, max_iters=5)
    _assert_close(got, want, atol=1e-9)


def test_rank_mass_conserved_each_superstep(spark):
    pairs = zipf_edges(n_repos=100)
    got, _ = _run(spark, pairs, tol=0.0, max_iters=3)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_personalized_pagerank_semantics(spark):
    pairs = zipf_edges(n_repos=120)
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    from l_space_spark.operators.pagerank import pagerank as pr

    res = pr(spark, edges_df(spark, pairs), tol=0.0, max_iters=8,
             seeds=seeds, resume=False)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    # rank mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # restart probability concentrates rank on/near the seeds: each seed
    # must out-rank the global median vertex
    ranks = sorted(got.values())
    median = ranks[len(ranks) // 2]
    assert got[0] > median and got[1] > median


def test_personalized_with_all_vertices_equals_uniform(spark):
    from l_space_spark.operators.pagerank import pagerank as pr
    from pyspark.sql import functions as F

    pairs = zipf_edges(n_repos=80)
    e = edges_df(spark, pairs)
    base = pr(spark, e, tol=0.0, max_iters=6, resume=False)
    all_ids = base.state.select("id")
    ppr = pr(spark, e, tol=0.0, max_iters=6, seeds=all_ids, resume=False)
    j = base.state.alias("a").join(ppr.state.alias("b"), "id")
    mx = j.agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank")))).first()[0]
    assert mx < 1e-12, mx


def test_personalized_rejects_foreign_seeds(spark):
    from l_space_spark.operators.pagerank import pagerank as pr

    seeds = spark.createDataFrame([(999999,)], "id long")
    with pytest.raises(ValueError):
        pr(spark, edges_df(spark, cycle(6)), tol=0.0, max_iters=2,
           seeds=seeds, resume=False)


def test_hits_closed_form_star(spark):
    """k spokes → hub 0: the hub is the unique authority (auth=1), spokes
    are the only hubs (hub = 1/k each); hub's own hub score is 0."""
    from l_space_spark.operators.hits import hits

    k = 6
    res = hits(spark, edges_df(spark, star(k)), tol=-1.0, max_iters=5,
               resume=False)
    got = {r["id"]: (r["hub"], r["auth"]) for r in res.state.collect()}
    assert abs(got[0][1] - 1.0) < 1e-12 and abs(got[0][0]) < 1e-12
    for i in range(1, k + 1):
        assert abs(got[i][0] - 1.0 / k) < 1e-12 and abs(got[i][1]) < 1e-12


def test_hits_converges_and_normalizes(spark):
    from l_space_spark.operators.hits import hits

    pairs = zipf_edges(n_repos=100)
    res = hits(spark, edges_df(spark, pairs), tol=1e-9, max_iters=50,
               resume=False)
    assert res.converged
    from pyspark.sql import functions as F

    sums = res.state.agg(F.sum("hub").alias("hub"),
                         F.sum("auth").alias("auth")).first()
    assert abs(sums["hub"] - 1.0) < 1e-9 and abs(sums["auth"] - 1.0) < 1e-9


def test_weighted_pagerank_csr_parity_and_uniform_reduction(spark):
    from pyspark.sql import functions as F
    from l_space_spark.operators.pagerank import pagerank as pr

    pairs = zipf_edges(n_repos=100)
    e = edges_df(spark, pairs)
    # unit weights reduce to the uniform random surfer
    ew = e.withColumn("wt", F.lit(1.0))
    base = pr(spark, e, tol=0.0, max_iters=5, resume=False)
    w1 = pr(spark, ew, tol=0.0, max_iters=5, resume=False, weight_col="wt")
    j = base.state.alias("a").join(w1.state.alias("b"), "id")
    mx = j.agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank")))).first()[0]
    assert mx < 1e-12, mx
    # non-uniform weights: csr and dataframe impls agree
    ew2 = e.withColumn("wt", (F.pmod(F.col("src") + F.col("dst"), F.lit(3)) + 1)
                      .cast("double"))
    wd = pr(spark, ew2, tol=0.0, max_iters=5, resume=False, weight_col="wt")
    wc = pr(spark, ew2, tol=0.0, max_iters=5, resume=False, weight_col="wt",
            impl="csr", num_partitions=4)
    j2 = wd.state.alias("a").join(wc.state.alias("b"), "id")
    mx2 = j2.agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank")))).first()[0]
    assert mx2 < 1e-9, mx2
    # mass conserved
    s = wd.state.agg(F.sum("rank")).first()[0]
    assert abs(s - 1.0) < 1e-9


def test_weighted_personalized_compose(spark):
    """weight_col and seeds compose: weighted surfer with restart to seeds."""
    from pyspark.sql import functions as F
    from l_space_spark.operators.pagerank import pagerank as pr

    pairs = zipf_edges(n_repos=80)
    e = edges_df(spark, pairs).withColumn(
        "wt", (F.pmod(F.col("src"), F.lit(2)) + 1).cast("double"))
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    res = pr(spark, e, tol=0.0, max_iters=6, weight_col="wt", seeds=seeds,
             resume=False)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    ranks = sorted(got.values())
    median = ranks[len(ranks) // 2]
    assert got[0] > median and got[1] > median


def test_incremental_warm_start(spark, tmp_path):
    """VERDICT r2 #7: fingerprint-gated incremental PageRank.

    Convergence is geometric (delta_t ≈ delta_0·λ^t), so a warm start
    saves ln(Δ0_cold/Δ0_warm)/ln(1/λ) supersteps — a CONSTANT OFFSET set
    by how close the prior is, not a constant factor. Three rungs, each
    with the assertion the math supports (numpy-simulated first, then
    pinned here against the real engine):

    1. unchanged fingerprint → ZERO supersteps (stored ranks returned);
    2. changed fingerprint, semantically unchanged graph (duplicate-edge
       append — re-ingestion/compaction, the common production delta):
       Δ0_warm ≈ 0 → converges in ≤2 supersteps, ≤⅓ of cold;
    3. real 1-edge rewire (Δ0_warm ~ 1/n rank mass): measurably fewer
       supersteps (numpy: 18 vs 31 at n=1000/tol=1e-6; assert ≤0.75×)
       and the SAME fixed point as a cold run on the new graph (1e-6 —
       numpy maxdiff 2.1e-8)."""
    from l_space_spark.operators.pagerank import pagerank_incremental

    pairs = zipf_edges(n_repos=1000)
    state_dir = str(tmp_path / "pr_state")
    kw = dict(tol=1e-6, max_iters=300, resume=False, num_partitions=4)

    r0 = pagerank_incremental(
        spark, edges_df(spark, pairs), state_dir, fingerprint="v1", **kw)
    assert r0.converged and r0.iterations > 6
    cold_iters = r0.iterations

    # rung 1: same fingerprint → answer straight from durable state
    r1 = pagerank_incremental(
        spark, edges_df(spark, pairs), state_dir, fingerprint="v1", **kw)
    assert r1.converged and r1.iterations == 0

    # rung 2: duplicate-append delta (distinct() dedups it away)
    r2 = pagerank_incremental(
        spark, edges_df(spark, pairs + pairs[:20]), state_dir,
        fingerprint="v2", **kw)
    assert r2.converged and r2.iterations <= 2
    assert r2.iterations * 3 <= cold_iters, (r2.iterations, cold_iters)

    # rung 3: one rewired edge — real but small semantic delta
    pairs3 = pairs[:-1] + [(pairs[-1][0], (pairs[-1][1] + 1) % 1000)]
    r3 = pagerank_incremental(
        spark, edges_df(spark, pairs3), state_dir, fingerprint="v3", **kw)
    assert r3.converged
    assert r3.iterations <= 0.75 * cold_iters, (r3.iterations, cold_iters)

    cold3 = pagerank(spark, edges_df(spark, pairs3), **kw)
    got = {r["id"]: r["rank"] for r in r3.state.collect()}
    want = {r["id"]: r["rank"] for r in cold3.state.collect()}
    _assert_close(got, want, atol=1e-6)
    # and the state dir now answers v3 without iterating
    r4 = pagerank_incremental(
        spark, edges_df(spark, pairs3), state_dir, fingerprint="v3", **kw)
    assert r4.iterations == 0


def test_warm_start_never_cross_resumes_cold_checkpoints(spark, tmp_path):
    """The resume hash distinguishes warm-start lineage: a warm-started run
    pointed at a COLD run's checkpoint dir must start from iteration 0
    (different config hash), and two warm starts from different priors
    must not share checkpoints either."""
    from l_space_spark.plans.superstep import SuperstepRunner
    from l_space_spark.operators.pagerank import pagerank as pr

    pairs = zipf_edges(n_repos=60)
    ckpt = str(tmp_path / "ckpt")
    kw = dict(tol=0.0, max_iters=3, resume=False, num_partitions=4)
    cold = pr(spark, edges_df(spark, pairs), checkpoint_dir=ckpt, **kw)
    assert cold.iterations == 3

    prior = cold.state
    warm = pr(spark, edges_df(spark, pairs), checkpoint_dir=ckpt,
              init_ranks=prior, tol=0.0, max_iters=3, resume=True,
              num_partitions=4)
    assert warm.resumed_from is None  # cold checkpoints invisible to warm

    base = {"algo": "pagerank", "warm_start": True}
    hashes = {
        SuperstepRunner(spark, config=base).config_hash,
        SuperstepRunner(spark, config={**base, "warm_src": "files:a"}).config_hash,
        SuperstepRunner(spark, config={**base, "warm_src": "files:b"}).config_hash,
    }
    assert len(hashes) == 3
