"""JSON-LD traversal wire codec (l_space_spark/jsonld.py) — decode the
reference's own serialized-traversal documents (the exact strings from
``parse/core/.../codec/json/jsonld/JsonLDDecoderSpec.scala:73-115``),
roundtrip the job-spec program, and execute a decoded wire traversal
end-to-end through run_job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l_space_spark.jsonld import (
    jsonld_to_steps, steps_to_jsonld, LIB,
)
from l_space_spark.jobspec import run_job, _apply_steps
from l_space_spark.traversal import Graph

# the two wire documents from the reference's JsonLDDecoderSpec, verbatim
REF_COUNT_DOC = (
    '{"@context":{"0":"https://ns.l-space.eu/librarian/"},'
    '"@type":"0:Traversal","0:Traversal/steps":{"@value":['
    '{"@type":"0:step/N"},'
    '{"@type":"0:step/HasLabel","0:step/HasLabel/Label":'
    '{"@id":"mylabel", "@type":"@class"}},'
    '{"@type":"0:step/Count"}],'
    '"@type":"@vector(https://ns.l-space.eu/librarian/Step)"}}'
)

REF_PROJECT_DOC = (
    '{"@context":{"0":"https://ns.l-space.eu/librarian/"},"@type":"0:Traversal",'
    '"0:Traversal/steps":{"@value":[{"@type":"0:step/N"},'
    '{"@type":"0:step/HasLabel","0:step/HasLabel/Label":'
    '{"@id":"https://ns.hoorn.nl/Project"}},'
    '{"@type":"0:step/Range","0:step/Range/low":{"@value":0,"@type":"@int"},'
    '"0:step/Range/high":{"@value":10,"@type":"@int"}},'
    '{"@type":"0:step/Project","0:step/Project/by":{"@value":['
    '{"0:Traversal/steps":{"@value":[{"@type":"0:step/Out","0:MoveStep/label":'
    '{"@id":"http://schema.org/description"}},{"@type":"0:step/HasLabel",'
    '"0:step/HasLabel/Label":{"@id":"@string"}}],'
    '"@type":"@vector(https://ns.l-space.eu/librarian/Step)"}},'
    '{"0:Traversal/steps":{"@value":[{"@type":"0:step/Out","0:MoveStep/label":'
    '{"@id":"http://schema.org/geo"}},{"@type":"0:step/HasLabel",'
    '"0:step/HasLabel/Label":{"@id":"@geo"}}],'
    '"@type":"@vector(https://ns.l-space.eu/librarian/Step)"}},'
    '{"0:Traversal/steps":{"@value":[{"@type":"0:step/Out","0:MoveStep/label":'
    '{"@id":"@id"}},{"@type":"0:step/HasLabel","0:step/HasLabel/Label":'
    '{"@id":"@string"}}],'
    '"@type":"@vector(https://ns.l-space.eu/librarian/Step)"}}],'
    '"@type":"@list(https://ns.l-space.eu/librarian/Traversal)"}}],'
    '"@type":"@vector(https://ns.l-space.eu/librarian/Step)"}}'
)


def test_decode_reference_count_doc():
    steps = jsonld_to_steps(REF_COUNT_DOC)
    assert steps == [
        {"step": "N"},
        {"step": "hasLabel", "args": ["mylabel"]},
        {"step": "count"},
    ]


def test_decode_reference_project_doc():
    steps = jsonld_to_steps(REF_PROJECT_DOC)
    assert [s["step"] for s in steps] == ["N", "hasLabel", "range", "project"]
    assert steps[1]["args"] == ["https://ns.hoorn.nl/Project"]
    # reference Range(low, high) = slice(low-1, high) = the DSL's
    # range_(low, high) — values pass through unchanged
    assert steps[2]["args"] == [0, 10]
    # Project/by is stored reversed on the wire; decode restores the
    # construction order .project(_.iri).by(geo).by(description) →
    # sub-traversals [iri, geo, description]
    bys = steps[3]["args"]
    assert len(bys) == 3
    assert bys[0]["steps"][0] == {"step": "out", "args": ["@id"]}
    assert bys[1]["steps"][0] == {"step": "out",
                                  "args": ["http://schema.org/geo"]}
    assert bys[2]["steps"][0] == {"step": "out",
                                  "args": ["http://schema.org/description"]}


def test_roundtrip_program():
    """encode∘decode is the identity on the executable subset."""
    programs = [
        [{"step": "N"}, {"step": "hasLabel", "args": ["person"]},
         {"step": "count"}],
        [{"step": "N"},
         {"step": "has", "args": ["age", {"p": "gt", "args": [5]}]},
         {"step": "out", "args": ["knows"]},
         {"step": "dedup"}, {"step": "limit", "args": [3]}],
        [{"step": "N"},
         {"step": "where", "args": [{"steps": [{"step": "out"}]}]},
         {"step": "union", "args": [
             {"steps": [{"step": "out", "args": ["a"]}]},
             {"steps": [{"step": "out", "args": ["b"]}]}]},
         {"step": "tail", "args": [2]}],
        [{"step": "N"},
         {"step": "repeat", "args": [{"steps": [{"step": "out"}]}],
          "kwargs": {"max_loops": 3, "collect": True}},
         {"step": "count"}],
        [{"step": "N"},
         {"step": "is", "args": [{"p": "between", "args": [1, 9]}]},
         {"step": "range", "args": [2, 5]}],
        [{"step": "N"},
         {"step": "project", "args": [
             {"steps": [{"step": "out", "args": ["name"]}]},
             {"steps": [{"step": "out", "args": ["age"]}]}]}],
    ]
    for steps in programs:
        assert jsonld_to_steps(steps_to_jsonld(steps)) == steps


def test_roundtrip_predicates():
    for pred in (
        {"p": "eqv", "args": ["x"]},
        {"p": "neqv", "args": [4]},
        {"p": "between", "args": [1, 5]},
        {"p": "within", "args": ["a", "b", "c"]},
        {"p": "intersect", "args": [["a", "b"]]},
        {"p": "contains_prefix", "args": ["ab"]},
        {"p": "contains", "args": ["spam"]},
        # group combinators round-trip exactly, any nesting
        {"p": "or", "args": [{"p": "eqv", "args": [1]},
                             {"p": "eqv", "args": [2]}]},
        {"p": "and", "args": [
            {"p": "or", "args": [{"p": "eqv", "args": [1]},
                                 {"p": "eqv", "args": [2]}]},
            {"p": "gt", "args": [5]}]},
    ):
        steps = [{"step": "N"}, {"step": "is", "args": [pred]}]
        assert jsonld_to_steps(steps_to_jsonld(steps)) == steps


def test_flat_combinator_keys_canonicalize_to_groups():
    """The legacy flat base+and+or dict shape encodes with jobspec's
    evaluation association — (base AND ands) OR ors — and decodes to the
    equivalent nested group form (the flat shape cannot express nesting)."""
    flat = {"p": "eqv", "args": [1],
            "or": [{"p": "eqv", "args": [2]}],
            "and": [{"p": "gt", "args": [5]}]}
    steps = [{"step": "N"}, {"step": "is", "args": [flat]}]
    out = jsonld_to_steps(steps_to_jsonld(steps))
    assert out == [{"step": "N"}, {"step": "is", "args": [
        {"p": "or", "args": [
            {"p": "and", "args": [{"p": "eqv", "args": [1]},
                                  {"p": "gt", "args": [5]}]},
            {"p": "eqv", "args": [2]},
        ]}]}]


def test_wire_and_of_or_decodes_without_misassociation():
    """Wire And(Or(eqv 1, eqv 2), Gt 5) must NOT flatten into the first
    child's dict — jobspec would evaluate that as (1 AND >5) OR 2."""
    doc = steps_to_jsonld([{"step": "N"}, {"step": "is", "args": [
        {"p": "and", "args": [
            {"p": "or", "args": [{"p": "eqv", "args": [1]},
                                 {"p": "eqv", "args": [2]}]},
            {"p": "gt", "args": [5]}]}]}])
    steps = jsonld_to_steps(doc)
    pred = steps[1]["args"][0]
    assert pred["p"] == "and" and pred["args"][0]["p"] == "or"


def test_has_multiple_predicate_nodes_conjoin():
    """A wire Has carrying a LIST of predicate nodes is a conjunction —
    none of the nodes may be silently dropped."""
    doc = steps_to_jsonld([{"step": "N"},
                           {"step": "has", "args": ["age",
                                                    {"p": "gt", "args": [1]}]}])
    node = doc["0:Traversal/steps"]["@value"][1]
    node["0:step/Has/Predicate"] = [
        node["0:step/Has/Predicate"],
        {"@type": "0:p/Lt", "0:p/value": {"@value": 9, "@type": "@int"}},
    ]
    steps = jsonld_to_steps(doc)
    assert steps[1]["args"][1] == {"p": "and", "args": [
        {"p": "gt", "args": [1]}, {"p": "lt", "args": [9]}]}


def test_group_predicate_evaluates_correctly(spark):
    """jobspec executes the nested group with the right association:
    (x==1 OR x==2) AND x>1 keeps only 2 — the old flattened decode
    evaluated (x==1 AND x>1) OR x==2 ∪ wrong rows under other operands."""
    from l_space_spark.jobspec import _decode_pred
    pred = _decode_pred({"p": "and", "args": [
        {"p": "or", "args": [{"p": "eqv", "args": [1]},
                             {"p": "eqv", "args": [2]}]},
        {"p": "gt", "args": [1]}]})
    df = spark.range(0, 10)
    got = sorted(r.id for r in df.filter(pred(F.col("id"))).collect())
    assert got == [2]


def test_unsupported_step_raises():
    doc = steps_to_jsonld([{"step": "N"}])
    doc["0:Traversal/steps"]["@value"].append({"@type": "0:step/TimeLimit"})
    with pytest.raises(ValueError, match="TimeLimit"):
        jsonld_to_steps(doc)


def _labeled_graph(spark):
    verts = spark.createDataFrame(
        [(1, None, ["mylabel"]), (2, None, ["mylabel"]), (3, None, ["other"])],
        "id long, iri string, labels array<string>",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst_id long"
    ).select(
        "src", F.lit("knows").alias("label"), F.lit("node").alias("dst_kind"),
        "dst_id", F.lit(None).cast("string").alias("dst_str"),
        F.lit(None).cast("double").alias("dst_dbl"),
        F.lit(None).cast("long").alias("dst_lng"),
        F.lit(None).cast("date").alias("dst_dt"),
    )
    return Graph(verts, edges)


def test_execute_reference_count_doc(spark):
    """The reference's own wire document, decoded and executed."""
    g = _labeled_graph(spark)
    steps = jsonld_to_steps(REF_COUNT_DOC)
    t = g.N()
    t = _apply_steps(t, steps[1:])
    rows = t.df.collect()
    assert len(rows) == 1 and rows[0]["_lng"] == 2  # two mylabel nodes


def test_run_job_jsonld_kind(spark, tmp_path):
    g = _labeled_graph(spark)
    vp, ep = str(tmp_path / "v"), str(tmp_path / "e")
    g.vertices.write.parquet(vp)
    g.edges.drop("edge_id").write.parquet(ep)
    doc = steps_to_jsonld([
        {"step": "N"},
        {"step": "hasLabel", "args": ["mylabel"]},
        {"step": "out", "args": ["knows"]},
        {"step": "id"},
    ])
    spec = {
        "kind": "traversal",
        "input": {"vertices_parquet": vp, "edges_parquet": ep},
        "jsonld": doc,
    }
    rows = sorted(r["_lng"] for r in run_job(spark, spec).collect())
    assert rows == [2, 3]


def test_context_prefix_expansion():
    """Prefix other than '0' and full-IRI keys both expand correctly."""
    doc = (
        '{"@context":{"ns":"' + LIB + '"},"@type":"ns:Traversal",'
        '"ns:Traversal/steps":{"@value":[{"@type":"ns:step/N"},'
        '{"@type":"' + LIB + 'step/Count"}],'
        '"@type":"@vector(' + LIB + 'Step)"}}'
    )
    assert jsonld_to_steps(doc) == [{"step": "N"}, {"step": "count"}]


def test_missing_operands_raise_valueerror():
    """Malformed documents (step present, operand absent) must raise the
    module's promised ValueError — not decode to str(None) labels or
    crash with int(None) TypeErrors."""
    import pytest

    for bad in ({"@type": "0:step/As"}, {"@type": "0:step/Limit"},
                {"@type": "0:step/Skip"}, {"@type": "0:step/Tail"},
                {"@type": "0:step/Range"}, {"@type": "0:step/Coin"},
                {"@type": "0:step/Constant"}):
        doc = steps_to_jsonld([{"step": "N"}])
        doc["0:Traversal/steps"]["@value"].append(bad)
        with pytest.raises(ValueError, match="required operand|missing"):
            jsonld_to_steps(doc)
