"""Bow-tie decomposition vs a hand-built graph with every class present."""

from l_space_spark.operators.bowtie import bowtie_classes

from conftest import edges_df


def _classes(spark, pairs, **kw):
    return {r["id"]: r["cls"]
            for r in bowtie_classes(spark, edges_df(spark, pairs),
                                    **kw).collect()}


def test_all_six_classes(spark):
    pairs = [
        (1, 2), (2, 3), (3, 1),       # core: the 3-cycle (largest SCC)
        (10, 0), (0, 1),              # in: chain into the core
        (3, 4), (4, 5),               # out: chain out of the core
        (0, 6), (6, 4),               # tube: in -> 6 -> out, bypasses core
        (0, 7),                       # tendril: hangs forward off in
        (8, 4),                       # tendril: hangs backward off out
        (20, 21),                     # disconnected pair
    ]
    got = _classes(spark, pairs)
    assert got == {
        1: "core", 2: "core", 3: "core",
        0: "in", 10: "in",
        4: "out", 5: "out",
        6: "tube",
        7: "tendril", 8: "tendril",
        20: "disconnected", 21: "disconnected",
    }


def test_singleton_core_tiebreak(spark):
    # no cycle at all: every SCC is a singleton; the deterministic pick
    # is the smallest vertex id, whose closure defines out
    pairs = [(5, 6), (1, 2), (2, 3)]
    got = _classes(spark, pairs)
    assert got[1] == "core" and got[2] == "out" and got[3] == "out"
    assert got[5] == "disconnected" and got[6] == "disconnected"


def test_degenerate_inputs(spark):
    assert _classes(spark, [(4, 4)]) == {}          # self-loop only
    got = _classes(spark, [(1, 2), (2, 1), (2, 2)])  # 2-cycle + loop
    assert got == {1: "core", 2: "core"}
