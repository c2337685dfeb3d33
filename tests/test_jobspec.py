"""Serialized job-spec entry (SURVEY §3.2): traversals/algorithms arriving
as JSON documents — the analog of the reference's wire traversals
(``LibrarianApi.scala:102-121``; rebuild from data ``Traversal.scala:30-43``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from l_space_spark.jobspec import run_job

from conftest import edges_df
from oracles import zipf_edges


def _edges_parquet(spark, tmp_path):
    path = str(tmp_path / "edges")
    edges_df(spark, zipf_edges(n_repos=80)).write.parquet(path)
    return path


def test_algorithm_spec_matches_direct_call(spark, tmp_path):
    from l_space_spark.operators.pagerank import pagerank

    path = _edges_parquet(spark, tmp_path)
    spec = {
        "kind": "algorithm",
        "algorithm": "pagerank",
        "input": {"edges_parquet": path},
        "params": {"tol": 0.0, "max_iters": 5},
        "top_k": 10,
    }
    got = {(r["id"], round(r["rank"], 12)) for r in run_job(spark, spec).collect()}
    direct = pagerank(
        spark, spark.read.parquet(path), tol=0.0, max_iters=5, resume=False
    ).state.orderBy(F.desc("rank"), "id").limit(10)
    want = {(r["id"], round(r["rank"], 12)) for r in direct.collect()}
    assert got == want


def test_algorithm_spec_resumes_from_checkpoint(spark, tmp_path):
    path = _edges_parquet(spark, tmp_path)
    ck = str(tmp_path / "ck")
    spec = {
        "kind": "algorithm",
        "algorithm": "connected_components",
        "input": {"edges_parquet": path},
        "checkpoint_dir": ck,
        "resume": True,
    }
    first = {tuple(r) for r in run_job(spark, spec).collect()}
    assert os.path.isdir(ck) and any(
        n.startswith("state_") for n in os.listdir(ck)
    )
    # second run resumes from the converged checkpoint — identical result
    second = {tuple(r) for r in run_job(spark, spec).collect()}
    assert first == second


def test_output_sink_writes_parquet(spark, tmp_path):
    path = _edges_parquet(spark, tmp_path)
    out = str(tmp_path / "out")
    spec = {
        "kind": "algorithm",
        "algorithm": "triangle_count",
        "input": {"edges_parquet": path},
        "output": {"path": out, "format": "parquet"},
    }
    res = run_job(spark, spec)
    back = spark.read.parquet(out)
    assert back.collect() == res.collect()


def test_traversal_spec_steps_and_predicates(spark, tmp_path):
    from l_space_spark.traversal import Graph, P

    path = _edges_parquet(spark, tmp_path)
    edges = spark.read.parquet(path)
    g = Graph.from_edgelist(edges)

    spec = {
        "kind": "traversal",
        "input": {"edges_parquet": path},
        "steps": [
            {"step": "N"},
            {"step": "id"},
            {"step": "is", "args": [{"p": "gt", "args": [5]}]},
            {"step": "count"},
        ],
    }
    got = run_job(spark, spec).collect()[0]["_lng"]  # traverser focus: count → _lng
    want = g.N().id_().is_(P.gt(5)).count_value()
    assert got == want

    # sub-traversal argument: vertices with at least one out-neighbor
    spec2 = {
        "kind": "traversal",
        "input": {"edges_parquet": path},
        "steps": [
            {"step": "N"},
            {"step": "where", "args": [{"steps": [{"step": "out"}]}]},
            {"step": "dedup"},
            {"step": "count"},
        ],
    }
    got2 = run_job(spark, spec2).collect()[0]["_lng"]
    want2 = g.N().where(lambda t: t.out()).dedup().count_value()
    assert got2 == want2


def test_traversal_spec_vertices_listed_before_edges(spark, tmp_path):
    """Regression (ADVICE r2): _load_input used to take the first
    '*_parquet' key in JSON insertion order, so a traversal spec listing
    vertices_parquet before edges_parquet loaded the vertices table as the
    edge input. edges_parquet must win regardless of key order."""
    path = _edges_parquet(spark, tmp_path)
    vpath = str(tmp_path / "verts")
    edges = spark.read.parquet(path)
    (
        edges.select(F.col("src").alias("id")).union(
            edges.select(F.col("dst"))
        ).distinct().write.parquet(vpath)
    )
    spec = {
        "kind": "traversal",
        # vertices FIRST — the old loader picked this as the edge table
        "input": {"vertices_parquet": vpath, "edges_parquet": path},
        "steps": [{"step": "N"}, {"step": "out"}, {"step": "count"}],
    }
    from l_space_spark.traversal import Graph

    got = run_job(spark, spec).collect()[0]["_lng"]
    want = Graph.from_edgelist(edges).N().out().count_value()
    assert got == want
    # sanity: the spec would NOT produce this over the vertices table
    assert want > 0


def test_catalog_spec_and_json_file(spark, tmp_path):
    from l_space_spark.queries import QUERIES

    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as f:
        json.dump(
            {"kind": "catalog", "query": "group_agg_q1",
             "sf_dir": "/root/testdata/sf0.001"},
            f,
        )
    got = run_job(spark, spec_path).collect()
    want = QUERIES["group_agg_q1"](spark, "/root/testdata/sf0.001").collect()
    assert got == want


def test_unknown_kind_and_step_rejected(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="unknown job kind"):
        run_job(spark, {"kind": "nope"})
    path = _edges_parquet(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown step"):
        run_job(spark, {
            "kind": "traversal",
            "input": {"edges_parquet": path},
            "steps": [{"step": "N"}, {"step": "drop_table"}],
        })


def test_personalized_and_weighted_pagerank_specs(spark, tmp_path):
    from l_space_spark.operators.pagerank import pagerank

    path = str(tmp_path / "we")
    edges_df(spark, zipf_edges(n_repos=60)).withColumn(
        "w", (F.pmod(F.xxhash64("src", "dst"), F.lit(5)) + 1).cast("double")
    ).write.parquet(path)
    e = spark.read.parquet(path)

    # personalized: seeds arrive as a JSON id list
    seeds = [int(r["src"]) for r in e.select("src").distinct().limit(3).collect()]
    spec = {
        "kind": "algorithm", "algorithm": "pagerank",
        "input": {"edges_parquet": path},
        "params": {"tol": 0.0, "max_iters": 4, "seeds": seeds},
        "top_k": 5,
    }
    got = {(r["id"], round(r["rank"], 12)) for r in run_job(spark, spec).collect()}
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    want_res = pagerank(spark, e, tol=0.0, max_iters=4, seeds=sdf, resume=False)
    want = {(r["id"], round(r["rank"], 12)) for r in
            want_res.state.orderBy(F.desc("rank"), "id").limit(5).collect()}
    assert got == want

    # weighted: weight column kept through input + named in params
    spec_w = {
        "kind": "algorithm", "algorithm": "pagerank",
        "input": {"edges_parquet": path, "weight": "w"},
        "params": {"tol": 0.0, "max_iters": 4, "weight_col": "w"},
        "top_k": 5,
    }
    got_w = {(r["id"], round(r["rank"], 12))
             for r in run_job(spark, spec_w).collect()}
    want_w_res = pagerank(spark, e, tol=0.0, max_iters=4, weight_col="w",
                          resume=False)
    want_w = {(r["id"], round(r["rank"], 12)) for r in
              want_w_res.state.orderBy(F.desc("rank"), "id").limit(5).collect()}
    assert got_w == want_w


def test_weighted_spec_with_params_only_weight_col(spark, tmp_path):
    """The documented contract: naming the weight ONLY in params.weight_col
    must keep the column through the input loader (it used to be dropped,
    crashing the algorithm); a weight name missing from the table errors
    clearly."""
    import pytest

    path = str(tmp_path / "we2")
    edges_df(spark, zipf_edges(n_repos=40)).withColumn(
        "w", (F.pmod(F.xxhash64("src", "dst"), F.lit(4)) + 1).cast("double")
    ).write.parquet(path)
    spec = {
        "kind": "algorithm", "algorithm": "sssp",
        "input": {"edges_parquet": path},
        "params": {"source": 3, "weight_col": "w", "max_iters": 5},
    }
    rows = run_job(spark, spec).collect()
    assert any(r["dist"] is not None for r in rows)

    bad = {
        "kind": "algorithm", "algorithm": "sssp",
        "input": {"edges_parquet": path},
        "params": {"source": 3, "weight_col": "nope"},
    }
    with pytest.raises(ValueError, match="weight column 'nope'"):
        run_job(spark, bad)

    with pytest.raises(ValueError, match="top_k is not meaningful"):
        run_job(spark, {
            "kind": "algorithm", "algorithm": "connected_components",
            "input": {"edges_parquet": path}, "top_k": 5,
        })


def test_sql_spec(spark, tmp_path):
    """{"kind": "sql"}: plain Spark SQL over named inputs — the declarative
    front end over the wire (the reference's GraphQL role, SURVEY §3.3)."""
    path = _edges_parquet(spark, tmp_path)
    spec = {
        "kind": "sql",
        "tables": {"edges": {"edges_parquet": path}},
        "sql": "SELECT src, count(*) AS n FROM edges GROUP BY src "
               "ORDER BY n DESC, src LIMIT 5",
    }
    rows = run_job(spark, spec).collect()
    want = (
        spark.read.parquet(path).groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "src").limit(5).collect()
    )
    assert rows == want


def test_traversal_spec_map_terminal(spark, tmp_path):
    """Steps whose method returns a DataFrame directly (out_map family)
    flow through the traversal-spec runner unchanged."""
    from l_space_spark.traversal import Graph

    path = _edges_parquet(spark, tmp_path)
    spec = {
        "kind": "traversal",
        "input": {"edges_parquet": path},
        "steps": [{"step": "N"}, {"step": "outMap"}],
    }
    got = {r["id"]: dict(r["m"]) for r in run_job(spark, spec).collect()}
    g = Graph.from_edgelist(spark.read.parquet(path))
    want = {r["id"]: dict(r["m"]) for r in g.N().out_map().collect()}
    assert got == want and len(got) > 0


def test_pagerank_incremental_spec(spark, tmp_path):
    """kind=algorithm / pagerank_incremental: first run computes and
    persists state; an unchanged input (same parquet fingerprint)
    answers from the stored ranks with no supersteps; ranks match a
    plain pagerank run; top_k ranks like pagerank."""
    from l_space_spark.operators.pagerank import pagerank

    path = _edges_parquet(spark, tmp_path)
    state = str(tmp_path / "pr_state")
    spec = {
        "kind": "algorithm", "algorithm": "pagerank_incremental",
        "input": {"edges_parquet": path},
        "state_dir": state, "resume": False,
        "params": {"tol": 1e-6, "num_partitions": 4},
    }
    got = {(r["id"], round(r["rank"], 9)) for r in run_job(spark, spec).collect()}
    ref = pagerank(spark, spark.read.parquet(path), tol=1e-6, resume=False,
                   num_partitions=4)
    want = {(r["id"], round(r["rank"], 9)) for r in ref.state.collect()}
    assert got == want

    # unchanged input: second run is answered from the durable state —
    # and the state meta records zero iterations for it
    import json as _json

    got2 = {(r["id"], round(r["rank"], 9))
            for r in run_job(spark, spec).collect()}
    assert got2 == got
    meta = _json.load(open(os.path.join(state, "_state_meta.json")))
    assert meta["fingerprint"].startswith("files:")

    top = run_job(spark, {**spec, "top_k": 5}).collect()
    assert len(top) == 5
    assert round(top[0]["rank"], 9) == max(r[1] for r in got)


def test_new_algorithm_specs_round3(spark, tmp_path):
    """The round-3 algorithms are reachable over the wire: scc / mis /
    coloring / ktruss (superstep-shaped) and betweenness / walks /
    neighbor_jaccard / clustering_coefficient / anf (frame-shaped)."""
    path = str(tmp_path / "edges")
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 6)]
    edges_df(spark, pairs).write.parquet(path)
    inp = {"edges_parquet": path}

    scc = {r["id"]: r["scc"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "scc",
                "input": inp}).collect()}
    assert scc[0] == scc[1] == scc[2] == scc[3] == scc[4] == 0
    assert scc[5] == 5 and scc[6] == 6

    mis = {r["id"]: r["st"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "mis",
                "input": inp}).collect()}
    assert set(mis.values()) <= {1, 2} and len(mis) == 7

    col = {r["id"]: r["color"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "coloring",
                "input": inp}).collect()}
    for s, d in pairs:
        assert col[s] != col[d]

    truss = {(r["a"], r["b"]) for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "ktruss",
                "params": {"k": 3}, "input": inp}).collect()}
    assert truss == {(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)}

    bc = run_job(spark, {"kind": "algorithm", "algorithm": "betweenness",
                         "params": {"n_sources": 7, "max_depth": 3},
                         "input": inp, "top_k": 3}).collect()
    assert len(bc) == 3 and bc[0]["bc_e9"] >= bc[-1]["bc_e9"]

    walks = run_job(spark, {"kind": "algorithm", "algorithm": "random_walks",
                            "params": {"walk_length": 3}, "input": inp})
    assert walks.where(F.col("step") == 0).count() == 7

    nj = run_job(spark, {"kind": "algorithm", "algorithm": "neighbor_jaccard",
                         "input": inp, "top_k": 2}).collect()
    assert len(nj) == 2

    ra = run_job(spark, {"kind": "algorithm",
                         "algorithm": "resource_allocation",
                         "input": inp, "top_k": 2}).collect()
    assert len(ra) == 2 and ra[0]["ra_e6"] >= ra[1]["ra_e6"]

    bt = {r["id"]: r["cls"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "bowtie",
                "input": inp}).collect()}
    assert set(bt.values()) <= {"core", "in", "out", "tube", "tendril",
                                "disconnected"} and "core" in bt.values()

    lcc = run_job(spark, {"kind": "algorithm",
                          "algorithm": "clustering_coefficient",
                          "input": inp}).collect()
    assert {r["id"] for r in lcc} == {0, 1, 2, 3, 4, 5, 6}

    anf = {r["t"]: r["total_e3"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "anf",
                "params": {"max_t": 2, "k": 8}, "input": inp}).collect()}
    assert anf[0] == 7000 and anf[2] >= anf[1] >= anf[0]


def test_coreness_spec(spark, tmp_path):
    path = str(tmp_path / "edges_cn")
    edges_df(spark, [(0, 1), (1, 2), (2, 0), (2, 3)]).write.parquet(path)
    got = {r["id"]: r["c"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "coreness",
                "input": {"edges_parquet": path}}).collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1}


def test_trussness_spec(spark, tmp_path):
    from itertools import combinations

    path = str(tmp_path / "edges_tn")
    k4 = list(combinations(range(4), 2))
    edges_df(spark, k4 + [(3, 9)]).write.parquet(path)
    got = {(r["a"], r["b"]): r["t"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "trussness",
                "input": {"edges_parquet": path}}).collect()}
    assert got == {**{tuple(e): 2 for e in k4}, (3, 9): 0}


def test_simrank_spec(spark, tmp_path):
    path = str(tmp_path / "edges_sr")
    # I(1)={9}=I(2): the coupled reverse walks meet at step 1 every
    # replicate, so sim = C exactly; top_k ranks by sim_e6
    edges_df(spark, [(9, 1), (9, 2), (1, 3), (7, 3)]).write.parquet(path)
    got = run_job(
        spark, {"kind": "algorithm", "algorithm": "simrank",
                "params": {"walk_length": 3, "n_walks": 4},
                "input": {"edges_parquet": path}, "top_k": 1}).collect()
    assert [(r["a"], r["b"], r["sim_e6"]) for r in got] == [(1, 2, 600000)]


def test_landmark_and_fastrp_specs(spark, tmp_path):
    """landmark_distances / fastrp over the wire match the direct calls."""
    from l_space_spark.operators.fastrp import fastrp_embeddings
    from l_space_spark.operators.landmarks import landmark_distances

    path = str(tmp_path / "edges_lmk")
    pairs = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 0)]
    edges_df(spark, pairs).write.parquet(path)
    edges = spark.read.parquet(path)

    got = run_job(
        spark, {"kind": "algorithm", "algorithm": "landmark_distances",
                "params": {"n_landmarks": 2, "max_iters": 4},
                "input": {"edges_parquet": path}}).collect()
    want = landmark_distances(spark, edges, n_landmarks=2,
                              max_iters=4).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in want}
    assert len(got) > 0

    got = run_job(
        spark, {"kind": "algorithm", "algorithm": "fastrp",
                "params": {"dims": 4, "iters": 2},
                "input": {"edges_parquet": path}}).collect()
    want = fastrp_embeddings(edges, dims=4, iters=2).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in want}
    assert len(got) > 0

    from l_space_spark.operators.louvain import (
        louvain_communities, refine_communities,
    )

    got = run_job(
        spark, {"kind": "algorithm", "algorithm": "louvain_refined",
                "params": {"parent_iters": 2, "refine_iters": 2},
                "input": {"edges_parquet": path}}).collect()
    parent = louvain_communities(spark, edges, max_iters=2,
                                 fixed_iters=True, resume=False).state
    want = refine_communities(spark, edges, parent, max_iters=2,
                              fixed_iters=True, resume=False).state.collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in want}
    assert len(got) > 0


def test_round4_algorithm_specs(spark, tmp_path):
    # adamic_adar / rectangle_count / dag_levels over the wire match the
    # direct operator calls
    from l_space_spark.operators.graphstats import rectangle_count
    from l_space_spark.operators.linkpred import adamic_adar
    from l_space_spark.operators.toposort import dag_levels

    path = _edges_parquet(spark, tmp_path)
    edges = spark.read.parquet(path)

    spec = {"kind": "algorithm", "algorithm": "adamic_adar",
            "input": {"edges_parquet": path}, "top_k": 5}
    got = [tuple(r) for r in run_job(spark, spec).collect()]
    want = [tuple(r) for r in adamic_adar(edges)
            .orderBy(F.desc("aa_e6"), "u", "w").limit(5).collect()]
    assert got == want

    from l_space_spark.operators.wl import wl_refinement

    spec = {"kind": "algorithm", "algorithm": "wl",
            "input": {"edges_parquet": path}, "resume": False,
            "params": {"max_iters": 2, "fixed_iters": True}}
    got = {(r["id"], r["color"]) for r in run_job(spark, spec).collect()}
    want = {(r["id"], r["color"])
            for r in wl_refinement(spark, edges, max_iters=2,
                                   fixed_iters=True,
                                   resume=False).state.collect()}
    assert got == want

    from l_space_spark.operators.linkpred import preferential_attachment

    spec = {"kind": "algorithm", "algorithm": "preferential_attachment",
            "input": {"edges_parquet": path}, "top_k": 5}
    got = [tuple(r) for r in run_job(spark, spec).collect()]
    want = [tuple(r) for r in preferential_attachment(edges)
            .orderBy(F.desc("pa"), "u", "w").limit(5).collect()]
    assert got == want

    spec = {"kind": "algorithm", "algorithm": "rectangle_count",
            "input": {"edges_parquet": path}}
    assert (run_job(spark, spec).collect()[0]["rectangles"]
            == rectangle_count(edges).collect()[0]["rectangles"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rectangle_count"):
        run_job(spark, {"kind": "algorithm", "algorithm": "rectangle_count",
                        "input": {"edges_parquet": path}, "top_k": 3})

    # dag_levels needs a DAG: orient the fixture low→high
    dag_path = str(tmp_path / "dag_edges")
    edges.selectExpr("least(src, dst) AS src", "greatest(src, dst) AS dst")\
        .where("src <> dst").write.parquet(dag_path)
    spec = {"kind": "algorithm", "algorithm": "dag_levels",
            "input": {"edges_parquet": dag_path},
            "params": {"max_iters": 30}, "top_k": 3}
    got = [tuple(r) for r in run_job(spark, spec).collect()]
    want = [tuple(r) for r in
            dag_levels(spark, spark.read.parquet(dag_path), max_iters=30,
                       resume=False)
            .state.orderBy(F.desc("level"), "id").limit(3).collect()]
    assert got == want


def test_louvain_spec(spark, tmp_path):
    from l_space_spark.operators.louvain import louvain_communities

    path = _edges_parquet(spark, tmp_path)
    edges = spark.read.parquet(path)
    spec = {"kind": "algorithm", "algorithm": "louvain",
            "input": {"edges_parquet": path}, "resume": False,
            "params": {"max_iters": 3, "fixed_iters": True}}
    got = {(r["id"], r["com"]) for r in run_job(spark, spec).collect()}
    want = {(r["id"], r["com"])
            for r in louvain_communities(spark, edges, max_iters=3,
                                         fixed_iters=True,
                                         resume=False).state.collect()}
    assert got == want


def test_louvain_weighted_spec(spark, tmp_path):
    from l_space_spark.operators.louvain import louvain_weighted

    rows = [(0, 1, 3), (1, 2, 2), (2, 0, 3), (2, 3, 1),
            (3, 4, 3), (4, 5, 2), (5, 3, 3), (1, 1, 2)]
    df = spark.createDataFrame(rows, "src long, dst long, w long")
    path = str(tmp_path / "wedges")
    df.write.parquet(path)
    spec = {"kind": "algorithm", "algorithm": "louvain_weighted",
            "input": {"edges_parquet": path, "weight": "w"},
            "resume": False,
            "params": {"max_iters": 4, "fixed_iters": True}}
    got = {(r["id"], r["com"]) for r in run_job(spark, spec).collect()}
    # a weight column NOT named "w" routes through params.weight_col
    df2 = df.withColumnRenamed("w", "wt")
    path2 = str(tmp_path / "wedges2")
    df2.write.parquet(path2)
    spec2 = {"kind": "algorithm", "algorithm": "louvain_weighted",
             "input": {"edges_parquet": path2}, "resume": False,
             "params": {"max_iters": 4, "fixed_iters": True,
                        "weight_col": "wt"}}
    got2 = {(r["id"], r["com"]) for r in run_job(spark, spec2).collect()}
    assert got2 == got
    want = {(r["id"], r["com"])
            for r in louvain_weighted(spark, df, max_iters=4,
                                      fixed_iters=True,
                                      resume=False).state.collect()}
    assert got == want


def test_msf_spec(spark, tmp_path):
    rows = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 4, 5), (4, 5, 4),
            (2, 4, 7)]
    df = spark.createDataFrame(rows, "src long, dst long, w long")
    path = str(tmp_path / "msf_edges")
    df.write.parquet(path)
    spec = {"kind": "algorithm", "algorithm": "msf", "resume": False,
            "input": {"edges_parquet": path, "weight": "w"}, "params": {}}
    out = run_job(spark, spec)
    forest = sorted((r["u"], r["v"], r["w"])
                    for r in out.where("done").collect())
    assert forest == [(1, 3, 1), (2, 3, 2), (3, 4, 5), (4, 5, 4)]
    # weight column not named "w" routes through params.weight_col
    df2 = df.withColumnRenamed("w", "wt")
    path2 = str(tmp_path / "msf_edges2")
    df2.write.parquet(path2)
    spec2 = {"kind": "algorithm", "algorithm": "msf", "resume": False,
             "input": {"edges_parquet": path2},
             "params": {"weight_col": "wt"}}
    forest2 = sorted((r["u"], r["v"], r["w"])
                     for r in run_job(spark, spec2).where("done").collect())
    assert forest2 == forest


def test_densest_and_directed_wedge_specs(spark, tmp_path):
    """kind=algorithm: densest_subgraph returns the peel winner's
    vertex set; cocitation / bibliographic_coupling the directed wedge
    counts — all three reachable over the wire."""
    from l_space_spark.operators.densest import densest_subgraph
    from l_space_spark.operators.linkpred import cocitation

    path = str(tmp_path / "edges")
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(4, 5), (5, 6), (6, 7)]
    edges_df(spark, pairs).write.parquet(path)
    inp = {"edges_parquet": path}

    got = [r["v"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "densest_subgraph",
                "input": inp}).collect()]
    direct = densest_subgraph(spark, spark.read.parquet(path))
    assert got == sorted(x["v"] for x in direct.members.collect())

    tight = [r["v"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "densest_subgraph",
                "input": inp,
                "params": {"eps_num": 5, "eps_den": 4}}).collect()]
    tight_direct = densest_subgraph(
        spark, spark.read.parquet(path), eps_num=5, eps_den=4)
    assert tight == sorted(x["v"] for x in tight_direct.members.collect())

    cc = {(r["u"], r["w"]): r["cocite"] for r in run_job(
        spark, {"kind": "algorithm", "algorithm": "cocitation",
                "input": inp}).collect()}
    want = {(r["u"], r["w"]): r["cocite"]
            for r in cocitation(spark.read.parquet(path)).collect()}
    assert cc == want and cc[(1, 2)] >= 1

    bc = run_job(
        spark, {"kind": "algorithm", "algorithm": "bibliographic_coupling",
                "input": inp, "params": {"max_fanin": 3}})
    assert bc.columns == ["u", "w", "coupling"]


def test_sampling_specs(spark, tmp_path):
    path = str(tmp_path / "edges_smp")
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 0), (4, 4)]
    edges_df(spark, pairs).write.parquet(path)
    inp = {"edges_parquet": path}

    kh = run_job(spark, {
        "kind": "algorithm", "algorithm": "khop_sample",
        "params": {"seeds": [0, 1], "fanouts": [2, 1]}, "input": inp,
    }).collect()
    assert {r["seed"] for r in kh} == {0, 1}
    assert all(r["hop"] in (1, 2) for r in kh)
    # fanout cap: at most 2 hop-1 edges per seed
    from collections import Counter
    c = Counter((r["seed"], r["hop"], r["src"]) for r in kh)
    assert max(c.values()) <= 2

    ns = run_job(spark, {
        "kind": "algorithm", "algorithm": "negative_samples",
        "params": {"k": 2}, "input": inp,
    }).collect()
    # 6 distinct non-loop edges x 2 draws, negatives from the vertex set
    assert len(ns) == 12
    assert {r["neg"] for r in ns} <= {0, 1, 2, 3}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="seeds"):
        run_job(spark, {"kind": "algorithm", "algorithm": "khop_sample",
                        "input": inp})
    with _pytest.raises(ValueError, match="top_k"):
        run_job(spark, {"kind": "algorithm", "algorithm": "khop_sample",
                        "params": {"seeds": [0]}, "input": inp,
                        "top_k": 3})


def test_params_level_checkpoint_rejected(spark, tmp_path):
    """checkpoint_dir/resume inside params is a clean ValueError, not a
    duplicate-kwarg TypeError deep in an operator call."""
    import pytest as _pytest

    path = _edges_parquet(spark, tmp_path)
    inp = {"edges_parquet": path}
    with _pytest.raises(ValueError, match="top level"):
        run_job(spark, {"kind": "algorithm", "algorithm": "landmark_distances",
                        "params": {"checkpoint_dir": str(tmp_path / "c")},
                        "input": inp})
    with _pytest.raises(ValueError, match="top level"):
        run_job(spark, {"kind": "algorithm", "algorithm": "pagerank",
                        "params": {"resume": False}, "input": inp})


def _config_hashes(ckdir):
    import json as _json
    import os as _os

    return {
        _json.load(open(_os.path.join(ckdir, d, "_meta.json")))["config_hash"]
        for d in sorted(_os.listdir(ckdir)) if d.startswith("state_")
    }


def test_landmark_and_louvain_refined_checkpoint_pinning(spark, tmp_path):
    """The new ckpt wiring pins the input snapshot (landmark) and the
    parent config (louvain_refined refine phase) into the state dirs'
    config hashes: a changed input / changed parent_iters yields a
    DIFFERENT hash, so resume refuses stale states instead of mixing."""
    import os as _os

    path = _edges_parquet(spark, tmp_path)
    inp = {"edges_parquet": path}
    ck = str(tmp_path / "lmk")
    spec = {"kind": "algorithm", "algorithm": "landmark_distances",
            "params": {"n_landmarks": 2, "max_iters": 3},
            "checkpoint_dir": ck, "resume": True, "input": inp}
    first = {tuple(r) for r in run_job(spark, spec).collect()}
    h1 = _config_hashes(ck)
    assert len(h1) == 1
    # identical rerun resumes to the identical result
    assert {tuple(r) for r in run_job(spark, spec).collect()} == first

    # changed input (same seed ids still present) → different config hash
    rows = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0), (0, 3)]
    p2 = str(tmp_path / "edges2.parquet")
    spark.createDataFrame(rows, "src long, dst long").write.parquet(p2)
    spec_b = dict(spec, input={"edges_parquet": p2},
                  checkpoint_dir=str(tmp_path / "lmk2"))
    run_job(spark, spec_b).collect()
    assert _config_hashes(str(tmp_path / "lmk2")) != h1

    ck2 = str(tmp_path / "lv")
    spec2 = {"kind": "algorithm", "algorithm": "louvain_refined",
             "params": {"parent_iters": 2, "refine_iters": 2},
             "checkpoint_dir": ck2, "resume": True, "input": inp}
    first2 = {tuple(r) for r in run_job(spark, spec2).collect()}
    assert sorted(_os.listdir(ck2)) == ["parent", "refine"]
    rh1 = _config_hashes(_os.path.join(ck2, "refine"))
    assert {tuple(r) for r in run_job(spark, spec2).collect()} == first2

    # same refine_iters, different parent_iters → refine hash differs
    # (the parent_iters pin), even if the parent partition coincides
    spec3 = dict(spec2, checkpoint_dir=str(tmp_path / "lv3"),
                 params={"parent_iters": 3, "refine_iters": 2})
    run_job(spark, spec3).collect()
    rh3 = _config_hashes(_os.path.join(str(tmp_path / "lv3"), "refine"))
    assert rh3 != rh1
