"""Serialized job-spec execution — traversals and algorithms over the wire.

The reference executes queries that ARRIVE AS DATA: JSON-LD-serialized
traversals over REST (``services/core/.../endpoints/LibrarianApi.scala:102-121``,
rebuilt by ``Traversal.toTraversal``, ``Traversal.scala:30-43``) and GraphQL
compiled to traversals (``core/shared/src/main/scala/lspace/graphql/
Query.scala:16-36``). The Spark analog (SURVEY §3.2) is a JSON job spec
submitted with the package::

    spark-submit --py-files pkg.zip __spark_entry__.py --job spec.json

Four spec kinds:

``{"kind": "algorithm"}`` — an iterative graph job::

    {"kind": "algorithm", "algorithm": "pagerank",
     "input": {"edges_parquet": "/data/edges", "src": "src", "dst": "dst"},
     "params": {"damping": 0.85, "tol": 1e-6},
     "checkpoint_dir": "/ckpt/pr", "resume": true,
     "output": {"path": "/out/ranks", "format": "parquet"}}

    algorithms: pagerank · connected_components · connected_components_star ·
    scc · label_propagation · triangle_count · triangles_per_vertex ·
    clustering_coefficient · hits · kcore · ktruss (params: k) ·
    coreness · trussness · mis · matching · msf (params: weight_col) ·
    earliest_arrival (params: seeds, start_t, time_col) ·
    label_spreading (params: seeds = [id, label] pairs, rounds) ·
    bridges · two_edge_components · articulation_points ·
    biconnected_components · salsa (params: tol, max_iters) ·
    densest_subgraph (params: eps_num, eps_den) · triad_census ·
    cocitation (params: max_fanout) ·
    bibliographic_coupling (params: max_fanin) ·
    coloring · sssp (params: source, weight_col) · harmonic_centrality
    (params: n_sources, max_iters) · betweenness (params: n_sources,
    max_depth) · anf (params: max_t, k) · random_walks (params:
    walk_length, n_walks) · biased_walks (node2vec second-order;
    params: walk_length, n_walks, w_ret, w_near, w_far) · neighbor_jaccard (params: max_hub_degree) ·
    resource_allocation (params: max_hub_degree) · adamic_adar
    (params: max_hub_degree) · preferential_attachment (params:
    max_hub_degree) · rectangle_count (params: max_hub_degree) ·
    bowtie · dag_levels (params: fixed_iters) · wl (params:
    fixed_iters) ·
    simrank (params: walk_length, n_walks, max_bucket) ·
    landmark_distances (params: n_landmarks, max_iters) ·
    fastrp (params: dims, iters, scale) ·
    louvain_refined (params: parent_iters, refine_iters) ·
    khop_sample (GraphSAGE minibatch; params: seeds = JSON id list
    REQUIRED, fanouts, tag, shards) · negative_samples (degree-weighted
    word2vec/LINE draws for every distinct non-loop edge; params: k,
    tag, blocks).
    ``checkpoint_dir``+``resume`` make the run restartable (north rule); the
    result DataFrame is written to ``output`` (or shown when absent).

``{"kind": "catalog"}`` — a registered catalog query::

    {"kind": "catalog", "query": "pagerank_top20", "sf_dir": "/data/sf0.1"}

``{"kind": "sql"}`` — plain Spark SQL over named inputs (the declarative
front end over the wire — SURVEY §3.3: Spark SQL plays the reference's
GraphQL role)::

    {"kind": "sql",
     "tables": {"orders": {"orders_parquet": "/data/orders"},
                "nation": {"table": "lakehouse.db.nation"}},
     "sql": "SELECT n_name, count(*) FROM orders JOIN nation ON ..."}

``{"kind": "traversal"}`` — a serialized step list, the literal wire-traversal
analog. Steps are ``{"step": <method>, "args": [...]}``; a predicate argument
is ``{"p": <name>, "args": [...]}`` (the 22-predicate registry,
``P.scala:49-72``); a sub-traversal argument (where/not/and/or/union/local/
repeat bodies) is ``{"steps": [...]}``::

    {"kind": "traversal",
     "input": {"edges_parquet": "/data/edges"},
     "steps": [{"step": "N"},
               {"step": "where", "args": [{"steps": [{"step": "out"}]}]},
               {"step": "count"}]}

A traversal spec may instead carry the reference's JSON-LD wire syntax
under ``"jsonld"`` (a document typed ``https://ns.l-space.eu/librarian/
Traversal``; see ``jsonld.py``) — it is decoded to the same step list.

Every spec runs through ``run_job(spark, spec)`` → result DataFrame; the CLI
wrapper lives in ``__spark_entry__.py`` (``--job``). Input tables may be
``*_parquet`` paths or a catalog ``table`` name (``spark.table``) — the
Iceberg-ready path."""

from __future__ import annotations

import json
import os
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.predicates import P, Pred


def _load_input(spark: SparkSession, inp: dict) -> DataFrame:
    """One table from {"<name>_parquet": path} or {"table": catalog_name}."""
    if "table" in inp:
        return spark.table(inp["table"])
    # edges_parquet wins outright, and vertices_parquet is never the primary
    # table (it is consumed separately by the traversal loader) — otherwise a
    # spec listing vertices before edges would load the wrong table purely on
    # JSON key order.
    if "edges_parquet" in inp:
        return spark.read.parquet(inp["edges_parquet"])
    for k, v in inp.items():
        if k.endswith("_parquet") and k != "vertices_parquet":
            return spark.read.parquet(v)
    raise ValueError(f"no loadable input in {sorted(inp)}")


def _edges_from_input(spark: SparkSession, inp: dict,
                      weight_col: str | None = None) -> DataFrame:
    """Edge table (src, dst[, weight]) from an edge parquet/table, or
    EXTRACTED from a repos table of the input_hint shape
    (repo,path,commit,lang,content)."""
    if "repos_parquet" in inp or inp.get("extract"):
        from .extract import build_graph

        repos = (
            spark.read.parquet(inp["repos_parquet"])
            if "repos_parquet" in inp
            else spark.table(inp["table"])
        )
        _, edges = build_graph(repos)
        return edges
    e = _load_input(spark, inp)
    src, dst = inp.get("src", "src"), inp.get("dst", "dst")
    keep = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    # keep every weight column the spec references — either named on the
    # input or demanded by params.weight_col (the algorithm would crash on
    # an unresolved column otherwise); a name missing from the table is an
    # immediate, clear error instead of a silent drop
    for w in {inp.get("weight"), weight_col} - {None}:
        if w not in e.columns:
            raise ValueError(
                f"weight column {w!r} not in input columns {e.columns}"
            )
        if w not in (src, dst):
            keep.append(F.col(w).alias(w))
    return e.select(*keep)


# ---- algorithm registry ------------------------------------------------------

def _run_algorithm(spark: SparkSession, spec: dict) -> DataFrame:
    from .operators.coloring import greedy_coloring
    from .operators.coreness import coreness
    from .operators.trussness import trussness
    from .operators.components import (
        connected_components, connected_components_star,
    )
    from .operators.hits import hits
    from .operators.salsa import salsa
    from .operators.kcore import kcore
    from .operators.ktruss import ktruss
    from .operators.labelprop import label_propagation, label_spreading
    from .operators.matching import maximal_matching
    from .operators.mis import maximal_independent_set
    from .operators.msf import minimum_spanning_forest
    from .operators.pagerank import pagerank
    from .operators.treach import earliest_arrival
    from .operators.scc import strongly_connected_components
    from .operators.sssp import sssp
    from .operators.toposort import dag_levels
    from .operators.wl import wl_refinement
    from .operators.louvain import louvain_communities, louvain_weighted
    from .operators.triangles import (
        clustering_coefficient, triangle_list, triangles_per_vertex,
    )

    inp = spec.get("input", {})
    params = dict(spec.get("params", {}))
    edges = _edges_from_input(
        spark, inp,
        weight_col=params.get("weight_col") or params.get("time_col"),
    )
    for k in ("checkpoint_dir", "resume"):
        if k in params:
            raise ValueError(
                f"pass {k!r} at the job-spec top level (next to "
                "'algorithm'), not inside params"
            )
    ckpt = spec.get("checkpoint_dir")
    resume = bool(spec.get("resume", True))
    algo = spec["algorithm"]

    supersteps = {
        "pagerank": pagerank,
        "connected_components": connected_components,
        "connected_components_star": connected_components_star,
        "label_propagation": label_propagation,
        "label_spreading": label_spreading,  # seeds = JSON [id, label]
        # pairs (required), params.rounds optional

        "hits": hits,
        "salsa": salsa,
        "kcore": kcore,
        "ktruss": ktruss,
        "coreness": coreness,
        "trussness": trussness,
        "sssp": sssp,
        "scc": strongly_connected_components,
        "mis": maximal_independent_set,
        "matching": maximal_matching,
        "msf": minimum_spanning_forest,  # weight via params.weight_col /
        # input.weight, same contract as louvain_weighted
        "earliest_arrival": earliest_arrival,  # contact time via
        # params.time_col (default "t") / input.weight; seeds = JSON id
        # list (required), start_t optional

        "coloring": greedy_coloring,
        "dag_levels": dag_levels,
        "wl": wl_refinement,
        "louvain": louvain_communities,
        "louvain_weighted": louvain_weighted,  # weight column named by
        # params.weight_col (default "w"); keep it on the input via
        # {"input": {..., "weight": <name>}} or params.weight_col
    }
    if ckpt and (algo in supersteps
                 or algo in ("harmonic_centrality", "pagerank_incremental",
                             "anf", "densest_subgraph",
                             "landmark_distances", "louvain_refined")):
        # pin the input snapshot into the checkpoint config hash: a
        # resume against a silently changed input (new snapshot /
        # replaced files) is refused instead of mixing states
        # (SURVEY §4.1 — the Transaction/`mit` moment-in-time analog)
        from .sources import table_fingerprint

        ref = inp.get("table") or next(
            (v for k, v in inp.items() if k.endswith("_parquet")), None
        )
        if ref is not None:
            params["config_extra"] = {
                **params.get("config_extra", {}),
                "input_snapshot": table_fingerprint(spark, ref),
            }

    if algo in supersteps:
        if (algo in ("pagerank", "earliest_arrival")
                and isinstance(params.get("seeds"), list)):
            # seeds arrive as a JSON id list and become the seed DataFrame
            # (personalized-PageRank teleport set / temporal source set)
            params["seeds"] = spark.createDataFrame(
                [(int(s),) for s in params["seeds"]], "id long"
            )
        if algo == "earliest_arrival" and "seeds" not in params:
            raise ValueError("earliest_arrival needs params['seeds'] "
                             "(a JSON list of source vertex ids)")
        if algo == "label_spreading":
            if not isinstance(params.get("seeds"), list):
                raise ValueError("label_spreading needs params['seeds'] "
                                 "(a JSON list of [id, label] pairs)")
            params["seeds"] = spark.createDataFrame(
                [(int(a), int(b)) for a, b in params["seeds"]],
                "id long, label long",
            )
        res = supersteps[algo](
            spark, edges, checkpoint_dir=ckpt, resume=resume, **params
        )
        out = res.state
        if spec.get("top_k"):
            # explicit per-algorithm ranking; a top_k the algorithm cannot
            # rank is an ERROR, never a silently ignored field
            ranked = {
                "pagerank": F.desc("rank"),
                "hits": F.desc("auth"),
                "salsa": F.desc("auth"),
                "sssp": F.asc_nulls_last("dist"),
                "kcore": F.desc("core_deg"),
                "dag_levels": F.desc("level"),
            }
            if algo not in ranked:
                raise ValueError(
                    f"top_k is not meaningful for {algo!r} (supported: "
                    f"{sorted(ranked)})"
                )
            out = out.orderBy(ranked[algo], "id").limit(int(spec["top_k"]))
        return out
    if algo == "pagerank_incremental":
        # the snapshot-aware path: spec pins a durable state_dir; the
        # input fingerprint (explicit, or derived from the input ref)
        # gates recompute-vs-reuse and warm-starts the power iteration
        from .operators.pagerank import pagerank_incremental

        state_dir = spec.get("state_dir")
        if not state_dir:
            raise ValueError("pagerank_incremental needs spec['state_dir']")
        fp = params.pop("fingerprint", None)
        if fp is None:
            from .sources import table_fingerprint

            ref = inp.get("table") or next(
                (v for k, v in inp.items() if k.endswith("_parquet")), None
            )
            if ref is not None:
                fp = table_fingerprint(spark, ref)
        res = pagerank_incremental(
            spark, edges, state_dir, fingerprint=fp,
            checkpoint_dir=ckpt, resume=resume, **params
        )
        out = res.state
        if spec.get("top_k"):
            out = out.orderBy(F.desc("rank"), "id").limit(int(spec["top_k"]))
        return out
    if algo == "triad_census":
        from .operators.triads import triad_census

        return triad_census(spark, edges)
    if algo == "densest_subgraph":
        from .operators.densest import densest_subgraph

        res = densest_subgraph(spark, edges, checkpoint_dir=ckpt,
                               resume=resume, **params)
        return res.members.orderBy("v")
    if algo == "cocitation":
        from .operators.linkpred import cocitation

        return cocitation(edges, **params).orderBy("u", "w")
    if algo == "bibliographic_coupling":
        from .operators.linkpred import bibliographic_coupling

        return bibliographic_coupling(edges, **params).orderBy("u", "w")
    if algo == "bridges":
        from .operators.bridges import bridges

        return bridges(spark, edges, **params).orderBy("a", "b")
    if algo == "two_edge_components":
        from .operators.bridges import two_edge_components

        return two_edge_components(spark, edges, **params)
    if algo == "articulation_points":
        from .operators.biconnect import articulation_points

        return articulation_points(spark, edges, **params).orderBy("id")
    if algo == "biconnected_components":
        from .operators.biconnect import biconnected_components

        return biconnected_components(spark, edges, **params).orderBy(
            "a", "b"
        )
    if algo == "triangle_count":
        return triangle_list(edges).agg(
            F.count(F.lit(1)).cast("long").alias("triangles")
        )
    if algo == "triangles_per_vertex":
        return triangles_per_vertex(spark, edges)
    if algo == "clustering_coefficient":
        out = clustering_coefficient(spark, edges)
        if spec.get("top_k"):
            out = out.orderBy(F.desc("lcc_e6"), "id").limit(
                int(spec["top_k"])
            )
        return out
    if algo == "biased_walks":
        from .operators.walks import biased_walks

        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'biased_walks' (walks are "
                "not ranked); use starts/n_walks to bound the output"
            )
        return biased_walks(spark, edges, **params)
    if algo == "random_walks":
        from .operators.walks import random_walks

        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'random_walks' (walks are "
                "not ranked); use starts/n_walks to bound the output"
            )
        return random_walks(spark, edges, **params)
    if algo == "khop_sample":
        from .operators.sage import khop_fanout_sample

        if not isinstance(params.get("seeds"), list):
            raise ValueError("khop_sample needs params['seeds'] "
                             "(a JSON list of seed vertex ids)")
        seeds = spark.createDataFrame(
            [(int(s),) for s in params.pop("seeds")], "seed long"
        )
        if "fanouts" in params:
            params["fanouts"] = [int(f) for f in params["fanouts"]]
        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'khop_sample' (samples are "
                "not ranked); use fanouts to bound the output"
            )
        return khop_fanout_sample(spark, edges, seeds, **params).orderBy(
            "seed", "hop", "src", "dst"
        )
    if algo == "negative_samples":
        from .operators.sampling import negative_samples

        e = (
            edges.where(F.col("src") != F.col("dst"))
            .select("src", "dst").distinct().persist()
        )
        degs = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("w"))
        )
        return negative_samples(
            spark,
            e.select(F.col("src").alias("center"),
                     F.col("dst").alias("context")),
            degs, **params,
        ).orderBy("center", "context", "k")
    if algo == "neighbor_jaccard":
        from .operators.linkpred import neighbor_jaccard

        out = neighbor_jaccard(edges, **params)
        if spec.get("top_k"):
            out = out.orderBy(F.desc("jaccard_e6"), "u", "w").limit(
                int(spec["top_k"])
            )
        return out
    if algo == "bowtie":
        from .operators.bowtie import bowtie_classes

        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'bowtie' (classes are "
                "categorical, not ranked)"
            )
        return bowtie_classes(spark, edges, **params)
    if algo == "resource_allocation":
        from .operators.linkpred import resource_allocation

        out = resource_allocation(edges, **params)
        if spec.get("top_k"):
            out = out.orderBy(F.desc("ra_e6"), "u", "w").limit(
                int(spec["top_k"])
            )
        return out
    if algo == "adamic_adar":
        from .operators.linkpred import adamic_adar

        out = adamic_adar(edges, **params)
        if spec.get("top_k"):
            out = out.orderBy(F.desc("aa_e6"), "u", "w").limit(
                int(spec["top_k"])
            )
        return out
    if algo == "preferential_attachment":
        from .operators.linkpred import preferential_attachment

        out = preferential_attachment(edges, **params)
        if spec.get("top_k"):
            out = out.orderBy(F.desc("pa"), "u", "w").limit(
                int(spec["top_k"])
            )
        return out
    if algo == "rectangle_count":
        from .operators.graphstats import rectangle_count

        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'rectangle_count' (the "
                "result is one scalar row)"
            )
        return rectangle_count(edges, **params)
    if algo == "simrank":
        from .operators.simrank import simrank_sampled

        out = simrank_sampled(spark, edges, **params)
        if spec.get("top_k"):
            out = out.orderBy(F.desc("sim_e6"), "a", "b").limit(
                int(spec["top_k"])
            )
        return out
    if algo == "landmark_distances":
        from .operators.landmarks import landmark_distances

        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'landmark_distances' (one "
                "row per reached (landmark, vertex) pair, not ranked); "
                "use n_landmarks/max_iters to bound the output"
            )
        return landmark_distances(
            spark, edges, checkpoint_dir=ckpt, resume=resume, **params
        ).orderBy("bsrc", "id")
    if algo == "louvain_refined":
        from .operators.louvain import (
            louvain_communities, refine_communities,
        )

        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'louvain_refined' (one row "
                "per vertex, communities are not ranked)"
            )
        p_iters = int(params.pop("parent_iters", 6))
        r_iters = int(params.pop("refine_iters", 6))
        # two superstep jobs → two checkpoint namespaces; the parent
        # phase is deterministic at fixed_iters, so a resumed refine
        # phase sees the identical parent partition — PROVIDED the
        # parent's own config is pinned into the refine hash (the
        # refine phase alone hashes only the intra-edge count, which
        # can collide across different parent partitions)
        p_ckpt = os.path.join(ckpt, "parent") if ckpt else None
        r_ckpt = os.path.join(ckpt, "refine") if ckpt else None
        extra = dict(params.pop("config_extra", None) or {})
        parent = louvain_communities(
            spark, edges, max_iters=p_iters, fixed_iters=True,
            checkpoint_dir=p_ckpt, resume=resume and ckpt is not None,
            config_extra={**extra, "phase": "parent"}, **params,
        ).state
        return refine_communities(
            spark, edges, parent, max_iters=r_iters, fixed_iters=True,
            checkpoint_dir=r_ckpt, resume=resume and ckpt is not None,
            config_extra={**extra, "phase": "refine",
                          "parent_iters": p_iters}, **params,
        ).state.orderBy("id")
    if algo == "fastrp":
        from .operators.fastrp import fastrp_embeddings

        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'fastrp' (one row per "
                "(vertex, dim), not ranked)"
            )
        if ckpt:
            raise ValueError(
                "'fastrp' runs a fixed small number of dense rounds and "
                "does not checkpoint; drop checkpoint_dir"
            )
        return fastrp_embeddings(edges, **params).orderBy("id", "dim")
    if algo == "betweenness":
        from .operators.betweenness import betweenness_sampled

        out = betweenness_sampled(spark, edges, **params)
        if spec.get("top_k"):
            out = out.orderBy(F.desc("bc_e9"), "id").limit(
                int(spec["top_k"])
            )
        return out
    if algo == "anf":
        from .operators.anf import neighborhood_function

        if spec.get("top_k"):
            raise ValueError(
                "top_k is not meaningful for 'anf' (the result is the "
                "whole N(t) curve)"
            )
        totals, result = neighborhood_function(
            spark, edges, checkpoint_dir=ckpt, resume=resume, **params
        )
        if result.resumed_from is not None:
            # totals are captured per executed round and cannot be
            # reconstructed from a checkpointed sketch state: a resumed
            # run would emit a PARTIAL curve and run_job's overwrite
            # sink would destroy the prior full one — fail loud instead
            raise ValueError(
                "anf resumed from a checkpoint, so the totals curve "
                "would be partial (rounds <= "
                f"{result.resumed_from + 1} missing); rerun with "
                '"resume": false for a full curve'
            )
        return totals
    if algo == "harmonic_centrality":
        from .operators.centrality import harmonic_centrality_sampled

        out = harmonic_centrality_sampled(
            spark, edges, checkpoint_dir=ckpt, resume=resume, **params
        )
        if spec.get("top_k"):
            out = out.orderBy(F.desc("harmonic"), "id").limit(
                int(spec["top_k"])
            )
        return out
    raise ValueError(f"unknown algorithm {algo!r}")


# ---- catalog -----------------------------------------------------------------

def _run_catalog(spark: SparkSession, spec: dict) -> DataFrame:
    from . import queries as _q

    name = spec["query"]
    if name not in _q.QUERIES:
        raise ValueError(f"unknown catalog query {name!r}")
    return _q.QUERIES[name](spark, spec["sf_dir"])


def _run_sql(spark: SparkSession, spec: dict) -> DataFrame:
    """Registers the spec's tables as temp views, plans the SQL, then drops
    the views — a spec referencing an unregistered name fails at analysis
    instead of silently reading a previous job's leftover view (the
    returned DataFrame's resolved plan survives the view drop)."""
    names = list(spec.get("tables", {}))
    for name in names:
        _load_input(spark, spec["tables"][name]).createOrReplaceTempView(name)
    try:
        df = spark.sql(spec["sql"])
        df.schema  # force analysis while the views exist
        return df
    finally:
        for name in names:
            spark.catalog.dropTempView(name)


# ---- traversal decoding ------------------------------------------------------

# JSON step name → Traversal method (reserved-word escapes)
_ALIASES = {
    "in": "in_", "not": "not_", "and": "and_", "or": "or_", "is": "is_",
    "from": "from_", "to": "to_", "id": "id_", "as": "as_", "sum": "sum_",
    "max": "max_", "min": "min_", "range": "range_", "coalesce": "coalesce_",
    "outE": "out_e", "inE": "in_e", "outMap": "out_map", "inMap": "in_map",
    "outEMap": "out_e_map", "inEMap": "in_e_map", "hasNot": "has_not",
    "hasId": "has_id", "hasIri": "has_iri", "hasLabel": "has_label",
}


def _decode_arg(v: Any) -> Any:
    if isinstance(v, dict) and "p" in v:
        return _decode_pred(v)
    if isinstance(v, dict) and "steps" in v:
        steps = v["steps"]
        return lambda t: _apply_steps(t, steps)
    if isinstance(v, list):
        return [_decode_arg(x) for x in v]
    return v


def _decode_pred(d: dict) -> Pred:
    name = d["p"]
    fn = getattr(P, _ALIASES.get(name, name), None)
    if fn is None or name.startswith("_"):
        raise ValueError(f"unknown predicate {name!r}")
    args = [_decode_arg(a) for a in d.get("args", [])]
    pred = fn(*args)
    for other in d.get("and", []):
        pred = pred & _decode_pred(other)
    for other in d.get("or", []):
        pred = pred | _decode_pred(other)
    return pred


def _apply_steps(t, steps: list[dict]):
    for s in steps:
        name = _ALIASES.get(s["step"], s["step"])
        if name.startswith("_"):
            raise ValueError(f"illegal step {name!r}")
        method = getattr(t, name, None)
        if method is None or not callable(method):
            raise ValueError(f"unknown step {name!r}")
        args = [_decode_arg(a) for a in s.get("args", [])]
        kwargs = {k: _decode_arg(v) for k, v in s.get("kwargs", {}).items()}
        t = method(*args, **kwargs)
    return t


def _graph_from_input(spark: SparkSession, inp: dict):
    from .traversal import Graph

    if "repos_parquet" in inp:
        from .extract import build_graph

        vertices, edges = build_graph(spark.read.parquet(inp["repos_parquet"]))
        return Graph.from_edgelist(edges, vertices=vertices,
                                   label=inp.get("label", "imports"))
    edges = _load_input(spark, inp)
    verts = None
    if "vertices_parquet" in inp:
        verts = spark.read.parquet(inp["vertices_parquet"])
    if set(edges.columns) >= {"src", "dst"}:
        return Graph.from_edgelist(edges, vertices=verts,
                                   label=inp.get("label", "linked"))
    if verts is None:
        raise ValueError("long-form edge input needs vertices_parquet")
    return Graph(verts, edges)


def _run_traversal(spark: SparkSession, spec: dict) -> DataFrame:
    g = _graph_from_input(spark, spec.get("input", {}))
    if "jsonld" in spec:
        # the reference's JSON-LD wire syntax (Traversal.toNode /
        # DecodeJsonLD.scala:134-146) — decoded to the same step list
        from .jsonld import jsonld_to_steps

        steps = jsonld_to_steps(spec["jsonld"])
    else:
        steps = list(spec["steps"])
    if not steps or steps[0]["step"] not in ("N", "E", "V"):
        raise ValueError("traversal must start with a scan step: N | E | V")
    scan = steps[0]
    t = getattr(g, scan["step"])(*[_decode_arg(a) for a in scan.get("args", [])])
    t = _apply_steps(t, steps[1:])
    return t if isinstance(t, DataFrame) else t.to_df()


def _run_graphql(spark: SparkSession, spec: dict) -> DataFrame:
    """``kind="graphql"``: the declarative text front end — compiles the
    reference's GraphQL subset (graphql.py) onto the traversal DSL over
    the same inputs as ``kind="traversal"``. ``spec["query"]`` is the
    GraphQL text; optional ``spec["context"]`` maps field names to
    ``{"property": ..., "reverse": bool}`` (the ActiveContext analog)."""
    from .graphql import graphql_to_dataframe

    g = _graph_from_input(spark, spec.get("input", {}))
    return graphql_to_dataframe(g, spec["query"], spec.get("context"))


# ---- entry -------------------------------------------------------------------

KINDS: dict[str, Callable[[SparkSession, dict], DataFrame]] = {
    "algorithm": _run_algorithm,
    "catalog": _run_catalog,
    "traversal": _run_traversal,
    "graphql": _run_graphql,
    "sql": _run_sql,
}


def run_job(spark: SparkSession, spec: dict | str) -> DataFrame:
    """Execute a job spec (dict, JSON string, or path to a JSON file)."""
    if isinstance(spec, str):
        if spec.lstrip().startswith("{"):
            spec = json.loads(spec)
        else:
            with open(spec) as f:
                spec = json.load(f)
    kind = spec.get("kind")
    if kind not in KINDS:
        raise ValueError(f"unknown job kind {kind!r}; one of {sorted(KINDS)}")
    result = KINDS[kind](spark, spec)
    out = spec.get("output")
    if out:
        (
            result.write.mode(out.get("mode", "overwrite"))
            .format(out.get("format", "parquet"))
            .save(out["path"])
        )
    return result
