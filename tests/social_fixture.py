"""The golden social micro-graph — behavioral twin of the reference fixture.

Mirrors ``SampleGraph.loadSocial``
(``/root/reference/core/shared/src/main/scala/lspace/util/SampleGraph.scala:96-320``):
1 address, 4 places, 6 persons, 6 undirected ``knows`` relations (the
reference's ``a --- knows --- b`` creates a mutual relation — verified
against the repeat/path golden values, ``AsyncGuideSpec.scala:953-1017``),
typed properties (name/givenname, birthDate, balance incl. one Int-typed
value, rate), and the two edge-on-edge ``timestamp`` statements on name
edges (``SampleGraph.scala:116-129``) encoded as an edge metadata column.

Built long-form (see l_space_spark.traversal module doc). All golden test
values in test_traversal.py come from the reference's own spec.
"""

from __future__ import annotations

import datetime as dt

from l_space_spark.traversal import Graph

IRI = "https://example.org"

# address gets the lowest id so the DSL's deterministic N.limit(1) picks a
# node with ≥2 out-edges (the union/limit golden tests assume that shape)
ADDRESS = 1
SAN_JOSE, CRYSTAL, HARIDWAR, TALCA = 10, 11, 12, 13
YOSHIO, LEVI, GRAY, KEVIN, STAN, GARRISON = 21, 22, 23, 24, 25, 26

VERTICES = [
    (ADDRESS, None, ["address"]),
    (SAN_JOSE, f"{IRI}/place/123", ["place"]),
    (CRYSTAL, f"{IRI}/place/12345", ["place"]),
    (HARIDWAR, f"{IRI}/place/345", ["place"]),
    (TALCA, f"{IRI}/place/34567", ["place"]),
    (YOSHIO, f"{IRI}/person/123", ["person"]),
    (LEVI, f"{IRI}/person/12345", ["person"]),
    (GRAY, f"{IRI}/person/345", ["person"]),
    (KEVIN, f"{IRI}/person/34567", ["person"]),
    (STAN, f"{IRI}/person/567", ["person"]),
    (GARRISON, f"{IRI}/person/56789", ["person"]),
]

_D = dt.date.fromisoformat


def _prop(src, label, kind, s=None, d=None, l=None, t=None, ts=None):
    return (src, label, kind, None, s, d, l, t, ts)


def _link(src, label, dst, ts=None):
    return (src, label, "node", dst, None, None, None, None, ts)


KNOWS_PAIRS = [
    (GARRISON, STAN), (GARRISON, KEVIN), (KEVIN, STAN),
    (KEVIN, GRAY), (GRAY, LEVI), (LEVI, YOSHIO),
]

EDGES = [
    # address properties (SampleGraph.scala:98-103)
    _prop(ADDRESS, "postalcode", "string", s="888"),
    _prop(ADDRESS, "street", "string", s="apples"),
    _prop(ADDRESS, "housenumber", "long", l=1),
    # place names; the two `timestamp` edges-on-edges become the ts column
    _prop(SAN_JOSE, "name", "string", s="San José de Maipo", ts=5),
    _prop(CRYSTAL, "name", "string", s="Crystal Springs", ts=4),
    _prop(HARIDWAR, "name", "string", s="Haridwar"),
    _prop(TALCA, "name", "string", s="Talca"),
    # persons (SampleGraph.scala:170-290); Yoshio uses givenname (extends name)
    _prop(YOSHIO, "givenname", "string", s="Yoshio"),
    _prop(YOSHIO, "birthDate", "date", t=_D("1996-08-18")),
    _link(YOSHIO, "birthPlace", CRYSTAL),
    _prop(YOSHIO, "balance", "double", d=10.34),
    _prop(YOSHIO, "rate", "long", l=4),
    _link(YOSHIO, "address", ADDRESS),
    _prop(LEVI, "name", "string", s="Levi"),
    _prop(LEVI, "birthDate", "date", t=_D("2008-12-20")),
    _link(LEVI, "birthPlace", CRYSTAL),
    _prop(LEVI, "balance", "double", d=-245.05),
    _prop(LEVI, "rate", "long", l=2),
    _link(LEVI, "address", ADDRESS),
    _prop(GRAY, "name", "string", s="Gray"),
    _prop(GRAY, "birthDate", "date", t=_D("1997-04-10")),
    _link(GRAY, "birthPlace", HARIDWAR),
    _prop(GRAY, "balance", "double", d=2230.30),
    _prop(GRAY, "rate", "long", l=1),
    _link(GRAY, "address", ADDRESS),
    _prop(KEVIN, "name", "string", s="Kevin"),
    _prop(KEVIN, "birthDate", "date", t=_D("2008-11-30")),
    _link(KEVIN, "birthPlace", SAN_JOSE),
    _prop(KEVIN, "balance", "double", d=500.50),
    _prop(KEVIN, "rate", "long", l=2),
    _link(KEVIN, "address", ADDRESS),
    _prop(STAN, "name", "string", s="Stan"),
    _prop(STAN, "birthDate", "date", t=_D("2002-06-13")),
    _link(STAN, "birthPlace", SAN_JOSE),
    _prop(STAN, "balance", "long", l=300),  # Int-typed balance (SampleGraph.scala:259)
    _prop(STAN, "rate", "long", l=4),
    _link(STAN, "address", ADDRESS),
    _prop(GARRISON, "name", "string", s="Garrison"),
    _prop(GARRISON, "birthDate", "date", t=_D("1994-06-18")),
    _link(GARRISON, "birthPlace", TALCA),
    _link(GARRISON, "address", ADDRESS),
] + [
    # mutual knows (SampleGraph.scala:293-300)
    _link(a, "knows", b) for a, b in KNOWS_PAIRS
] + [
    _link(b, "knows", a) for a, b in KNOWS_PAIRS
]


def social_graph(spark) -> Graph:
    vertices = spark.createDataFrame(
        VERTICES, "id long, iri string, labels array<string>"
    )
    edges = spark.createDataFrame(
        EDGES,
        "src long, label string, dst_kind string, dst_id long, dst_str string,"
        " dst_dbl double, dst_lng long, dst_dt date, ts long",
    )
    return Graph(
        vertices,
        edges,
        property_hierarchy={"givenname": ["name"]},  # Property @extends
    )
