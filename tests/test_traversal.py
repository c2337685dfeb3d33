"""Traversal-DSL parity tests — golden values ported from the reference's
guide specs (``/root/reference/core/shared/src/test/scala/lspace/librarian/
task/AsyncGuideSpec.scala``, same suite as SyncGuideSpec) on the behavioral
twin of ``SampleGraph.loadSocial`` (tests/social_fixture.py).

Every expected value below is the reference's own golden value; line
citations point at the originating spec."""

from __future__ import annotations

import datetime as dt

import pytest

from l_space_spark.traversal import P
from tests.social_fixture import social_graph

D = dt.date.fromisoformat


@pytest.fixture(scope="module")
def g(spark):
    gr = social_graph(spark)
    gr.vertices.persist().count()
    gr.edges.persist().count()
    return gr


# ---------------------------------------------------------------- scans
def test_scan_nodes(g):
    assert g.N().count_value() == 11  # 1 address + 4 places + 6 persons


def test_scan_edges_label_filtered(g):
    assert g.E("knows").count_value() == 12  # 6 mutual relations


def test_scan_values_distinct(g):
    # value identity dedups equal literals (structure/Values.scala:104-117):
    # 12 strings + 4 longs {1,2,4,300} + 4 doubles + 6 dates
    assert g.V().count_value() == 26


# ---------------------------------------------------------------- moves
def test_out_name_of_garrison(g):
    # AsyncGuideSpec.scala:75-84
    vals = g.N().has("name", P.eqv("Garrison")).out("name").values()
    assert vals == ["Garrison"]


def test_property_inheritance_givenname_extends_name(g):
    # out("name") must see Yoshio's givenname (Ontology/Property @extends;
    # structure/Resource.scala:101-107 inheritance-aware matching)
    names = g.N().has_label("person").out("name").value_set()
    assert names == {"Yoshio", "Levi", "Gray", "Kevin", "Stan", "Garrison"}


def test_in_move(g):
    # persons born in Crystal Springs: place <-birthPlace- person
    from tests.social_fixture import CRYSTAL
    names = g.N().has_id(CRYSTAL).in_("birthPlace").out("name").value_set()
    assert names == {"Yoshio", "Levi"}


def test_edge_from_to(g):
    assert g.E("knows").from_().dedup().count_value() == 6
    assert g.E("knows").to_().dedup().count_value() == 6


def test_edge_metadata_as_columns(g):
    # the two timestamp edges-on-edges (SampleGraph.scala:116-129)
    assert g.E("name").has("ts").count_value() == 2
    assert g.E("name").has("ts", P.eqv(4)).to_().values() == ["Crystal Springs"]


def test_label_step(g):
    assert g.N().label().dedup().value_set() == {"address", "place", "person"}


def test_iri_and_id(g):
    from tests.social_fixture import GARRISON, IRI
    assert g.N().has_iri(f"{IRI}/person/56789").id_().values() == [GARRISON]
    assert g.N().has_id(GARRISON).iri().values() == [f"{IRI}/person/56789"]


# ---------------------------------------------------------------- filters
def test_has_birthdate_count(g):
    # AsyncGuideSpec.scala:141-150
    assert g.N().has("birthDate").count_value() == 6


@pytest.mark.parametrize(
    "pred,expected",
    [
        (P.gt(D("2002-06-13")), 2),       # AsyncGuideSpec.scala:151-160
        (P.gte(D("2002-06-13")), 3),      # :162-171
        (P.lt(D("2002-06-13")), 3),       # :173-182
        (P.lte(D("2002-06-13")), 4),      # :184-193
        (P.inside(D("2002-06-13"), D("2009-04-10")), 2),   # :195-204
        (P.outside(D("2002-06-13"), D("2009-04-10")), 3),  # :206-215
        (P.between(D("2002-06-13"), D("2009-04-10")), 3),  # :217-226
    ],
)
def test_has_birthdate_predicates(g, pred, expected):
    assert g.N().has("birthDate", pred).count_value() == expected


@pytest.mark.parametrize(
    "pred,expected",
    [
        (None, 5),                  # AsyncGuideSpec.scala:223 (numeric block)
        (P.gt(300), 2),             # :224 — cross-type: int pred vs doubles
        (P.gt(300.0), 2),           # :225
        (P.gte(300), 3),            # :226 — includes the Int-typed 300
        (P.lt(300), 2),             # :227
        (P.lte(300), 3),            # :228
        (P.inside(300, 3000), 2),   # :229 (excl-excl)
        (P.inside(300, 3000.5), 2), # :230
        (P.outside(300, 3000), 2),  # :231
        (P.between(300, 3000), 3),  # :232 (incl-incl)
    ],
)
def test_has_balance_numeric(g, pred, expected):
    t = g.N().has("balance", pred) if pred else g.N().has("balance")
    assert t.count_value() == expected


def test_has_not(g):
    assert g.N().has_not("balance").count_value() == 6  # 11 - 5


def test_has_label_types(g):
    # typed-value filtering (commented golden block AsyncGuideSpec.scala:777-784)
    assert g.N().out("balance").has_label("@int").values() == [300]
    assert g.N().out("balance").has_label("@double").count_value() == 4
    assert g.N().out("balance").has_label("@number").count_value() == 5


def test_is_predicate(g):
    vals = g.N().out("balance").has_label("@double").is_(P.gt(300.0)).value_set()
    assert vals == {500.5, 2230.3}


def test_string_predicates(g):
    names = g.N().out("name")
    assert names.is_(P.prefix("G")).value_set() == {"Gray", "Garrison"}
    assert names.is_(P.suffix("n")).value_set() == {"Stan", "Garrison", "Kevin"}
    assert names.is_(P.regex("^.ev")).value_set() == {"Levi", "Kevin"}
    assert names.is_(P.fuzzy("Gary", 2)).value_set() == {"Gray"}
    assert names.is_(P.within("Stan", "Levi")).value_set() == {"Stan", "Levi"}
    assert names.is_(P.contains("ev")).value_set() == {"Levi", "Kevin"}


def test_pred_composition(g):
    both = P.gt(0.0) & P.lt(400.0)
    assert g.N().out("balance").has_label("@double").is_(both).value_set() == {10.34}


def test_coin(g):
    # AsyncGuideSpec.scala:289-294 (made deterministic; Coin's seed field is
    # unused in the reference, step/Coin.scala:56)
    assert g.N().coin(0.0).count_value() == 0
    assert g.N().coin(1.0).count_value() == 11


# -------------------------------------------------- correlated sub-traversals
def test_where(g):
    # AsyncGuideSpec.scala:338-347
    names = g.N().where(lambda t: t.has("balance")).out("name").value_set()
    assert names == {"Yoshio", "Levi", "Gray", "Kevin", "Stan"}


def test_and(g):
    # AsyncGuideSpec.scala:348-357
    n = g.N().and_(
        lambda t: t.has("balance", P.gt(300)),
        lambda t: t.has("balance", P.lt(3000)),
    ).count_value()
    assert n == 2


def test_or(g):
    # AsyncGuideSpec.scala:358-367
    n = g.N().or_(
        lambda t: t.has("balance", P.gt(300)),
        lambda t: t.has("balance", P.lt(-200)),
    ).count_value()
    assert n == 3


def test_union_count(g):
    # AsyncGuideSpec.scala:368-377 — union keeps duplicates (none here)
    n = g.N().union(
        lambda t: t.has("balance", P.gt(300)),
        lambda t: t.has("balance", P.lt(-200)),
    ).count_value()
    assert n == 3


def test_union_dedup_semantics(g):
    # AsyncGuideSpec.scala:693-732 — UNION ALL then explicit dedup
    first = g.N().limit(1)
    assert first.union(lambda t: t.out().limit(1),
                       lambda t: t.out().limit(1)).count_value() == 2
    assert first.union(lambda t: t.out().limit(1),
                       lambda t: t.out().limit(1)).dedup().count_value() == 1
    assert first.union(lambda t: t.out().limit(2),
                       lambda t: t.out().limit(2)).count_value() == 4
    assert first.union(lambda t: t.out().limit(2),
                       lambda t: t.out().limit(2)).dedup().count_value() == 2


def test_not(g):
    # only the address node has no name (incl. inherited givenname)
    assert g.N().not_(lambda t: t.has("name")).count_value() == 1


def test_union_with_balance_names(g):
    # AsyncGuideSpec.scala:609-621
    names = (
        g.N().union(
            lambda t: t.has("balance", P.lt(0.0)),
            lambda t: t.has("balance", P.gt(2000.0)),
        ).dedup().out("name").value_set()
    )
    assert names == {"Levi", "Gray"}


def test_local_count_per_person(g):
    # AsyncGuideSpec.scala:387-396
    counts = g.N().has_label("person").local(lambda t: t.out("name").count()).values()
    assert counts == [1, 1, 1, 1, 1, 1]


def test_local_head_per_person(g):
    # AsyncGuideSpec.scala:409-417
    names = g.N().has_label("person").local(
        lambda t: t.out("name").has_label("@string").head()
    ).value_set()
    assert names == {"Kevin", "Yoshio", "Stan", "Garrison", "Gray", "Levi"}


def test_coalesce(g):
    # per-traverser first non-empty branch (AsyncGuideSpec.scala:440-447)
    vals = g.N().has_label("person").coalesce_(
        lambda t: t.out("balance").has_label("@double"),
        lambda t: t.out("rate"),
        lambda t: t.out("name"),
    )
    # 4 doubles, Stan falls through to rate(4), Garrison to name
    assert vals.count_value() == 6
    assert "Garrison" in vals.value_set()


def test_choose(g):
    # AsyncGuideSpec.scala:482-499 (constant(true/false) → long 1/0 here)
    from tests.social_fixture import IRI
    got = g.N().has_iri(f"{IRI}/place/123").choose(
        lambda t: t.count().is_(P.eqv(1)),
        lambda t: t.constant(1),
        lambda t: t.constant(0),
    ).values()
    assert got == [1]
    got = g.N().has_iri(f"{IRI}/place/123").choose(
        lambda t: t.count().is_(P.eqv(2)),
        lambda t: t.constant(1),
        lambda t: t.constant(0),
    ).values()
    assert got == [0]


# ---------------------------------------------------------------- barriers
def test_sum_mean(g):
    # AsyncGuideSpec.scala:919-947
    s = g.N().out("balance").has_label("@double").sum_().values()[0]
    assert s == pytest.approx(2496.09)
    m = g.N().out("balance").has_label("@double").mean().values()[0]
    assert m == pytest.approx(624.0225)


def test_max_argmax_walkback(g):
    # AsyncGuideSpec.scala:832-917 — max/min return the winning traverser
    assert g.N().out("balance").has_label("@int").max_().values() == [300]
    assert g.N().out("balance").has_label("@double").max_().values() == [2230.30]
    assert g.N().out("balance").has_label("@number").max_().values() == [2230.30]
    assert (
        g.N().out("balance").has_label("@double").max_().in_("balance").count_value()
        == 1
    )
    assert (
        g.N().out("balance").has_label("@double").max_().in_("balance")
        .out("name").values() == ["Gray"]
    )
    assert g.N().out("balance").has_label("@double").min_().values() == [-245.05]
    assert (
        g.N().out("balance").has_label("@double").min_().in_("balance")
        .out("name").values() == ["Levi"]
    )


def test_group_label_counts(g):
    # AsyncGuideSpec.scala:648-659: value-set {4, 6, 1}
    rows = g.N().group(lambda t: t.label(), lambda t: t.count()).collect()
    assert {int(r["value"]) for r in rows} == {4, 6, 1}


def test_group_by_knows_count(g):
    # AsyncGuideSpec.scala:537-546: Levi's bucket key = 2
    from tests.social_fixture import IRI
    rows = (
        g.N().has_iri(f"{IRI}/person/12345")
        .group(lambda t: t.out("knows").count())
        .collect()
    )
    assert len(rows) == 1 and rows[0]["key"] == "2"


def test_group_collect(g):
    rows = g.N().has_label("person").group(lambda t: t.label()).collect()
    assert len(rows) == 1
    assert len(rows[0]["values"]) == 6


# ----------------------------------------------------------- order / clipping
def test_order_head_name(g):
    # AsyncGuideSpec.scala:785-795: first name in ascending order
    got = (
        g.N().order(lambda t: t.out("name").has_label("@string"))
        .limit(1).out("name").values()
    )
    assert got == ["Crystal Springs"]


def test_order_desc_balance(g):
    # AsyncGuideSpec.scala:796-830
    assert (
        g.N().order(lambda t: t.out("balance").has_label("@double"), ascending=False)
        .limit(1).out("balance").values() == [2230.30]
    )
    assert (
        g.N().order(lambda t: t.out("balance").has_label("@double"))
        .limit(1).out("balance").values() == [-245.05]
    )
    assert (
        g.N().order(lambda t: t.out("balance").has_label("@double"), ascending=False)
        .limit(1).out("name").values() == ["Gray"]
    )


def test_skip_range_tail(g):
    # AsyncGuideSpec.scala:734-755
    from tests.social_fixture import IRI
    garrison = g.N().has_iri(f"{IRI}/person/56789")
    assert garrison.out("knows").skip(1).count_value() == 1
    assert garrison.out("knows").range_(1, 1).count_value() == 1
    ordered = g.N().has_label("person").order(lambda t: t.out("name"))
    assert ordered.tail(2).out("name").value_set() == {"Stan", "Yoshio"}
    assert ordered.last().out("name").values() == ["Yoshio"]
    assert ordered.head().out("name").values() == ["Garrison"]


# ---------------------------------------------------------------- projections
def test_project(g):
    # AsyncGuideSpec.scala:561-573: Levi.out(knows) projected to
    # (name, balance>2001) = {(Gray, [2230.3]), (Yoshio, [])}
    from tests.social_fixture import IRI
    rows = (
        g.N().has_iri(f"{IRI}/person/12345").out("knows")
        .project(
            lambda t: t.out("name"),
            lambda t: t.out("balance").has_label("@double").is_(P.gt(2001.0)),
            names=["name", "big_balance"],
        )
        .collect()
    )
    got = {(tuple(r["name"]), tuple(r["big_balance"])) for r in rows}
    assert got == {(("Gray",), ("2230.3",)), (("Yoshio",), ())}


def test_out_map(g):
    # AsyncGuideSpec.scala:86-90 outMap nonEmpty + shape
    from tests.social_fixture import LEVI
    rows = g.N().has_id(LEVI).out_map().collect()
    assert len(rows) == 1
    m = rows[0]["m"]
    assert set(m.keys()) == {"name", "birthDate", "birthPlace", "balance",
                             "rate", "address", "knows"}
    assert m["name"] == ["Levi"]
    assert len(m["knows"]) == 2


def test_in_map(g):
    from tests.social_fixture import CRYSTAL
    rows = g.N().has_id(CRYSTAL).in_map().collect()
    assert len(rows) == 1
    assert len(rows[0]["m"]["birthPlace"]) == 2


def test_as_select(g):
    from tests.social_fixture import GARRISON
    # walk out then select back the labeled start position
    t = g.N().has_id(GARRISON).as_("start").out("knows").select("start")
    assert t.dedup().id_().value_set() == {GARRISON}


# ------------------------------------------------------------------- repeat
def test_repeat_max(g):
    # AsyncGuideSpec.scala:953-962: max=2 ⇒ 3 hops, emit final frontier
    from tests.social_fixture import IRI
    names = (
        g.N().has_iri(f"{IRI}/person/12345")
        .repeat(lambda t: t.out("knows"), max_loops=2)
        .dedup().out("name").value_set()
    )
    assert names == {"Yoshio", "Gray", "Garrison", "Stan"}


def test_repeat_noloop_paths(g):
    # AsyncGuideSpec.scala:964-975: simple paths of length 3 from Levi
    from tests.social_fixture import IRI
    df = (
        g.N(track_paths=True).has_iri(f"{IRI}/person/12345")
        .repeat(lambda t: t.out("knows"), max_loops=2, noloop=True)
        .path(lambda t: t.out("name").has_label("@string"))
    )
    got = {tuple(x[0] for x in r["mapped"]) for r in df.collect()}
    assert got == {
        ("Levi", "Gray", "Kevin", "Garrison"),
        ("Levi", "Gray", "Kevin", "Stan"),
    }


def test_repeat_collect(g):
    # AsyncGuideSpec.scala:977-988: collect emits every round ⇒ all six
    from tests.social_fixture import IRI
    names = (
        g.N().has_iri(f"{IRI}/person/12345")
        .repeat(lambda t: t.out("knows"), max_loops=3, collect=True)
        .dedup().out("name").value_set()
    )
    assert names == {"Yoshio", "Gray", "Garrison", "Stan", "Levi", "Kevin"}


def test_repeat_until(g):
    # AsyncGuideSpec.scala:990-1002: stop where out(knows) reaches Gray
    from tests.social_fixture import IRI
    names = (
        g.N().has_iri(f"{IRI}/person/12345")
        .repeat(
            lambda t: t.out("knows"),
            max_loops=3,
            until=lambda t: t.out("knows").has_iri(f"{IRI}/person/345"),
        )
        .dedup().out("name").value_set()
    )
    assert names == {"Levi", "Kevin"}


def test_repeat_until_collect(g):
    # AsyncGuideSpec.scala:1004-1015
    from tests.social_fixture import IRI
    names = (
        g.N().has_iri(f"{IRI}/person/12345")
        .repeat(
            lambda t: t.out("knows"),
            max_loops=3,
            collect=True,
            until=lambda t: t.has_iri(f"{IRI}/person/345"),
        )
        .dedup().out("name").value_set()
    )
    assert names == {"Gray", "Yoshio", "Levi"}


def test_out_e_map(g):
    # OutEMap (step/OutEMap.scala:33): outgoing EDGES grouped by label —
    # same label shape as out_map, values are edge ids (all distinct)
    from tests.social_fixture import LEVI
    rows = g.N().has_id(LEVI).out_e_map().collect()
    assert len(rows) == 1
    m = rows[0]["m"]
    assert set(m.keys()) == {"name", "birthDate", "birthPlace", "balance",
                             "rate", "address", "knows"}
    assert len(m["knows"]) == 2
    eids = [e for v in m.values() for e in v]
    assert len(set(eids)) == len(eids)


def test_in_e_map(g):
    from tests.social_fixture import CRYSTAL
    rows = g.N().has_id(CRYSTAL).in_e_map().collect()
    assert len(rows) == 1
    assert len(rows[0]["m"]["birthPlace"]) == 2


def test_R_scans_all_resources(g):
    # R (step/R.scala:38, unwired even in the reference): nodes ∪ edges ∪ values
    n = g.N().count_value()
    e = g.E().count_value()
    v = g.V().count_value()
    assert g.R().count_value() == n + e + v
    kinds = {r["_kind"] for r in g.R().to_df().select("_kind").distinct().collect()}
    assert "node" in kinds and "edge" in kinds and len(kinds) > 2


def test_edge_reification_statement_about_statement(spark):
    """SampleGraph.scala:116 — ``_name --- "timestamp" --> 5L``: an edge
    anchored ON an edge. Meta-edge rows carry the base edge's
    ``Graph.edge_id()`` as their ``src``; a forward move from an
    edge-focused traverser hops onto them, and because meta-edges are
    ordinary edge rows the reification chains (edge→edge→edge)."""
    from pyspark.sql import functions as F

    from l_space_spark.traversal import Graph

    base = spark.createDataFrame(
        [(1, "name", "string", None, "San José de Maipo", None, None, None)],
        "src long, label string, dst_kind string, dst_id long,"
        " dst_str string, dst_dbl double, dst_lng long, dst_dt date",
    )

    def meta_of(e, label, lng):
        return e.select(
            Graph.edge_id().alias("src"), F.lit(label).alias("label"),
            F.lit("long").alias("dst_kind"),
            F.lit(None).cast("long").alias("dst_id"),
            F.lit(None).cast("string").alias("dst_str"),
            F.lit(None).cast("double").alias("dst_dbl"),
            F.lit(lng).cast("long").alias("dst_lng"),
            F.lit(None).cast("date").alias("dst_dt"),
        )

    ts_edge = meta_of(base, "timestamp", 5)          # statement about name
    prov_edge = meta_of(ts_edge, "revision", 2)      # statement about THAT
    vertices = spark.createDataFrame(
        [(1, None, None)], "id long, iri string, labels array<string>"
    )
    g = Graph(vertices, base.unionByName(ts_edge).unionByName(prov_edge))

    # node → name edge → timestamp meta-edge → long value
    t = g.N().out_e("name").out_e("timestamp")
    assert t.to_df().count() == 1
    assert t.to_().values() == [5]
    # one more hop: the meta-edge's own meta-edge
    assert g.N().out_e("name").out_e("timestamp").out_e(
        "revision").to_().values() == [2]
    # out() from an edge focus goes straight to the value
    assert g.N().out_e("name").out("timestamp").values() == [5]
    # node-level traversal untouched by the meta rows
    assert g.N().out("name").values() == ["San José de Maipo"]
    # and a graph WITHOUT meta-edges still yields nothing from an edge hop
    g0 = Graph(vertices, base)
    assert g0.N().out_e("name").out_e("timestamp").to_df().count() == 0
