"""GraphQL front end (l_space_spark/graphql.py) — parser + execution
semantics mirroring the reference's DecoderSpec
(``parse/core/.../codec/graphql/DecoderSpec.scala``) and GraphqlApiSpec
(filtered projection with limit) on a SampleGraph-style person graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l_space_spark.graphql import parse_graphql, graphql_to_dataframe
from l_space_spark.jobspec import run_job
from l_space_spark.traversal import Graph


def _person_graph(spark):
    persons = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "carol"), (4, "dave")],
        "id long, name string",
    )
    props = Graph.melt_properties(persons, "id", str_cols=["name"])
    knows = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst_id long"
    ).select(
        "src", F.lit("knows").alias("label"), F.lit("node").alias("dst_kind"),
        "dst_id", F.lit(None).cast("string").alias("dst_str"),
        F.lit(None).cast("double").alias("dst_dbl"),
        F.lit(None).cast("long").alias("dst_lng"),
        F.lit(None).cast("date").alias("dst_dt"),
    )
    return Graph(persons.select("id"), props.unionByName(knows)), persons


# ------------------------------------------------------------------ parser
def test_parse_simple_and_multi():
    q = parse_graphql(" { name }")
    assert [p.field for p in q.projections] == ["name"]
    q = parse_graphql(" { name  description }")
    assert [p.field for p in q.projections] == ["name", "description"]
    # commas are ignorable, as in the reference tokenizer
    q = parse_graphql("{name,description}")
    assert [p.field for p in q.projections] == ["name", "description"]


def test_parse_nested_alias_args():
    q = parse_graphql(' { who: name(name2: "abc") { description2 name2 } description }')
    p = q.projections[0]
    assert (p.field, p.alias) == ("name", "who")
    assert p.parameters == [("name2", "abc")]
    assert [c.field for c in p.projections] == ["description2", "name2"]
    assert q.projections[1].field == "description"


def test_parse_query_level_args():
    q = parse_graphql(' { _( limit: 4 offset: 3) { name } }')
    assert (q.limit, q.offset) == (4, 3)
    q = parse_graphql(' { _( name2: "abc") { name } }')
    assert q.parameters == [("name2", "abc")] and q.limit is None
    # bare values convert: int / float / bool
    q = parse_graphql(' { _( age: 7, score: 1.5, ok: true) { name } }')
    assert q.parameters == [("age", 7), ("score", 1.5), ("ok", True)]


def test_parse_rejects_garbage():
    for bad in ("name }", "{ }", "{ _(limit 3) { name } }", "{ name"):
        with pytest.raises(ValueError):
            parse_graphql(bad)


# --------------------------------------------------------------- execution
def test_projection_and_nested(spark):
    g, _ = _person_graph(spark)
    out = graphql_to_dataframe(g, "{ name knows { name } }")
    rows = {tuple(r["name"]): tuple(r["knows_name"]) for r in out.collect()}
    # alice knows bob, bob knows carol, carol knows alice, dave knows no one
    assert rows == {
        ("alice",): ("bob",),
        ("bob",): ("carol",),
        ("carol",): ("alice",),
        ("dave",): (),
    }


def test_parameter_filter_and_limit(spark):
    g, _ = _person_graph(spark)
    # query-level property filter (GraphqlApiSpec: filtered projection)
    out = graphql_to_dataframe(g, '{ _(name: "alice") { name knows { name } } }')
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == ["alice"] and rows[0]["knows_name"] == ["bob"]
    # query-level clipping — deterministic via the DSL's _ord
    out2 = graphql_to_dataframe(g, "{ _(limit: 2) { name } }")
    assert out2.count() == 2
    out3 = graphql_to_dataframe(g, "{ _(limit: 2, offset: 1) { name } }")
    assert out3.count() == 2
    all_names = sorted(
        r["name"][0]
        for r in graphql_to_dataframe(g, "{ name }").collect()
    )
    assert all_names == ["alice", "bob", "carol", "dave"]


def test_projection_arg_filters_before_move(spark):
    """Projection-level parameter = has() BEFORE the move
    (Projection.scala:34-36): only start nodes passing the filter
    contribute values; other rows keep empty arrays."""
    g, _ = _person_graph(spark)
    out = graphql_to_dataframe(g, '{ knows(name: "bob") { name } }')
    rows = {r["knows_name"][0] if r["knows_name"] else None
            for r in out.collect()}
    # only bob's knows-edge survives the filter → carol; others empty
    assert rows == {"carol", None}


def test_reverse_context(spark):
    g, _ = _person_graph(spark)
    ctx = {"known_by": {"property": "knows", "reverse": True}}
    out = graphql_to_dataframe(g, "{ name known_by { name } }", context=ctx)
    rows = {r["name"][0]: tuple(r["known_by_name"]) for r in out.collect()}
    assert rows == {
        "alice": ("carol",), "bob": ("alice",), "carol": ("bob",), "dave": (),
    }


def _fan_graph(spark):
    """alice(1) knows bob(2), carol(3), dave(4); bob knows carol."""
    persons = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "carol"), (4, "dave")],
        "id long, name string",
    )
    props = Graph.melt_properties(persons, "id", str_cols=["name"])
    knows = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "src long, dst_id long"
    ).select(
        "src", F.lit("knows").alias("label"), F.lit("node").alias("dst_kind"),
        "dst_id", F.lit(None).cast("string").alias("dst_str"),
        F.lit(None).cast("double").alias("dst_dbl"),
        F.lit(None).cast("long").alias("dst_lng"),
        F.lit(None).cast("date").alias("dst_dt"),
    )
    return Graph(persons.select("id"), props.unionByName(knows))


def test_projection_level_clip(spark):
    """Projection-level limit/offset (Projection.scala:19-46) clips the
    hop's reached resources PER TRAVERSER, ordered by resource identity
    (node id), before deeper hops."""
    g = _fan_graph(spark)
    rows = {r["name"][0]: tuple(r["knows_name"]) for r in
            graphql_to_dataframe(g, "{ name knows(limit: 2) { name } }")
            .collect()}
    # alice's three neighbors clipped to the two smallest ids (bob, carol);
    # bob's single neighbor untouched
    assert rows == {"alice": ("bob", "carol"), "bob": ("carol",),
                    "carol": (), "dave": ()}
    rows = {r["name"][0]: tuple(r["knows_name"]) for r in
            graphql_to_dataframe(
                g, "{ name knows(limit: 1, offset: 1) { name } }").collect()}
    assert rows == {"alice": ("carol",), "bob": (), "carol": (), "dave": ()}
    # offset alone drops the first reached resource per traverser
    rows = {r["name"][0]: tuple(r["knows_name"]) for r in
            graphql_to_dataframe(g, "{ name knows(offset: 1) { name } }")
            .collect()}
    assert rows == {"alice": ("carol", "dave"), "bob": (), "carol": (),
                    "dave": ()}


def test_jobspec_graphql_kind(spark, tmp_path):
    g, persons = _person_graph(spark)
    vp, ep = str(tmp_path / "v"), str(tmp_path / "e")
    persons.select("id").write.parquet(vp)
    g.edges.drop("edge_id").write.parquet(ep)
    spec = {
        "kind": "graphql",
        "input": {"vertices_parquet": vp, "edges_parquet": ep},
        "query": '{ _(name: "alice") { name knows { name } } }',
    }
    rows = run_job(spark, spec).collect()
    assert len(rows) == 1
    assert rows[0]["name"] == ["alice"] and rows[0]["knows_name"] == ["bob"]
