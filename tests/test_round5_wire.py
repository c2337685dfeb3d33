"""Round-5 wire-path and driver-window invariants.

Pins (a) the JSON-LD wire document of jsonld_wire_nation to the exact
step list of its DSL twin (the two entries share one oracle, so a
decode drift would surface only as a driver-gate diff — this makes it
a unit failure instead), (b) the GraphQL nested-clip query's parse
shape, (c) the 50-slot driver window's structural invariants, and
(d) the prefix-filter candidate stage's superset (no-false-negative)
property in isolation from the verify stage."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from l_space_spark.jsonld import jsonld_to_steps, steps_to_jsonld
from l_space_spark.queries import (
    _DRIVER_WINDOW,
    _JSONLD_NATION_DOC,
    ORACLES,
    QUERIES,
)


def test_jsonld_nation_doc_is_the_dsl_twin():
    steps = jsonld_to_steps(_JSONLD_NATION_DOC)
    assert steps == [
        {"step": "N"},
        {"step": "has", "args": ["c_acctbal", {"p": "gt", "args": [9000.0]}]},
        {"step": "out", "args": ["in_nation"]},
        {"step": "out", "args": ["n_name"]},
    ]
    # the encoder reproduces an equivalent wire document (decode∘encode
    # fixpoint on the executable subset)
    assert jsonld_to_steps(steps_to_jsonld(steps)) == steps


def test_graphql_nested_clip_parse_shape():
    from l_space_spark.graphql import parse_graphql

    q = parse_graphql(
        '{ _(n_name: "NATION_3") { name: n_name '
        'customers(limit: 5, offset: 2) { name: c_name '
        'nation { n_name } } } }'
    )
    assert q.parameters == [("n_name", "NATION_3")]
    assert q.limit is None and q.offset is None
    [name_p, cust_p] = q.projections
    assert (name_p.field, name_p.alias) == ("n_name", "name")
    assert (cust_p.limit, cust_p.offset) == (5, 2)
    [leaf_name, nation_p] = cust_p.projections
    assert (leaf_name.field, leaf_name.alias) == ("c_name", "name")
    assert nation_p.projections[0].field == "n_name"


def test_driver_window_structure():
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    assert not missing, missing
    # every r5 window entry carries an exact oracle (no rows-only rows)
    unoracled = [n for n in _DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_post_r5_ledger_names_are_real_and_not_in_window():
    """The POST-R5 LEDGER comment names catalog entries that are NOT in
    the window — a rename/removal must break here, not silently rot."""
    import l_space_spark.queries as qmod

    src = open(qmod.__file__).read()
    i = src.index("POST-R5 LEDGER")
    block = src[i:src.index("]", i)]
    listed = set(re.findall(r"[a-z0-9_]+", block)) & set(QUERIES)
    assert len(listed) == 40, len(listed)
    overlap = listed & set(_DRIVER_WINDOW)
    assert not overlap, overlap


def test_prefix_candidates_are_a_superset_of_true_pairs(spark):
    """The candidate stage alone (before verification) must contain
    every qualifying pair — the lemma, tested independently so a future
    'optimization' that breaks the no-false-negative property fails
    here even if the verify stage masks it on the oracle corpus."""
    from l_space_spark.operators.dedup import (
        jaccard_prefix_candidates, shingle_index,
    )

    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),     # near-dup of 1
        (3, "a b c q r s t u"),     # shares a hot prefix block only
        (4, "q r s t u v w y"),
        (5, "a b c d e f g h"),     # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ex = shingle_index(docs, "doc_id", "text", 3)
    cand = {(r["a"], r["b"]) for r in
            jaccard_prefix_candidates(ex, 1, 2).collect()}
    import itertools

    sets = {
        i: {" ".join(t.split()[j:j + 3]) for j in range(len(t.split()) - 2)}
        for i, t in rows
    }
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if 3 * inter >= len(sets[a]) + len(sets[b]):
            assert (a, b) in cand, (a, b)
