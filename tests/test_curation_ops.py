"""Unit tests for the round-4 fifth-session curation/analytics family:
SemDeDup, DSIR selection, funnel conversion, retention cohorts, and
n-gram containment — crafted inputs with hand-checked expectations (the
sf-fixture oracle parity is covered by test_entry_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


class TestSemDeDup:
    def test_duplicates_dropped_min_id_kept(self, spark):
        from l_space_spark.operators.semdedup import semdedup

        # two tight groups on orthogonal axes + one loner; k=2 puts the
        # groups in separate clusters (seeds = ids 0 and 1)
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
            (5, [0.998, 0.02, 0.0, 0.0]),   # near-dup of 0 and 2
            (1, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.999, 0.01, 0.0]),   # near-dup of 1
        ]
        out = semdedup(_emb(spark, rows), k=2, iters=2, threshold=0.95)
        got = {r["vec_id"]: (r["keep"], r["dup_of"]) for r in out.collect()}
        assert got[0] == (1, -1)
        assert got[1] == (1, -1)
        assert got[2] == (0, 0)
        assert got[3] == (0, 1)
        assert got[5] == (0, 0)  # min-id wins, not 2

    def test_orthogonal_all_kept(self, spark):
        from l_space_spark.operators.semdedup import semdedup

        rows = [(i, [1.0 if j == i else 0.0 for j in range(4)])
                for i in range(4)]
        out = semdedup(_emb(spark, rows), k=2, iters=2, threshold=0.9)
        assert all(r["keep"] == 1 for r in out.collect())


class TestDsir:
    def _docs(self, spark):
        # target docs speak "alpha beta", raw background speaks
        # "gamma delta"; doc 99 is a raw doc written in target language
        # long enough that add-one smoothing over 64 buckets doesn't
        # drown the observed counts
        rows = [
            (1, "t", "alpha beta " * 20),
            (2, "t", "alpha beta " * 10),
            (3, "r", "gamma delta " * 20),
            (4, "r", "gamma delta " * 10),
            (99, "r", "alpha beta " * 20),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

    def test_target_like_doc_outranks_background(self, spark):
        from l_space_spark.operators.dsir import dsir_select

        out = dsir_select(
            self._docs(spark), F.col("source") == "t", "doc_id", "text",
            buckets=64, top_k=5,
        ).collect()
        rank = {r["id"]: r["rnk"] for r in out}
        avg = {r["id"]: r["avg_w_e6"] for r in out}
        # the target-language raw doc scores like the target docs and
        # above every background doc
        assert avg[99] > avg[3] and avg[99] > avg[4]
        assert max(rank[1], rank[2], rank[99]) < min(rank[3], rank[4])

    def test_weight_table_shape(self, spark):
        from l_space_spark.operators.dsir import dsir_weights

        w = dsir_weights(
            self._docs(spark), F.col("source") == "t", "doc_id", "text",
            buckets=64,
        )
        rows = w.collect()
        assert all(0 <= r["bkt"] < 64 for r in rows)
        assert all(r["t_cnt"] <= r["r_cnt"] for r in rows)
        # target-heavy buckets weigh above parity, background below
        assert any(r["w_e6"] > 1_000_000 for r in rows)
        assert any(r["w_e6"] < 1_000_000 for r in rows)


class TestFunnel:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [(int(u), f"2024-01-0{d} 00:00:0{s}", t) for u, d, s, t in rows],
            "user_id long, ts_s string, event_type string",
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
                 "event_type")

    def test_strict_ordering(self, spark):
        from l_space_spark.operators.funnel import funnel_steps

        rows = [
            (1, 1, 1, "signup"), (1, 1, 2, "click"), (1, 1, 3, "purchase"),
            (2, 1, 2, "signup"), (2, 1, 1, "click"),  # click BEFORE signup
            (3, 1, 1, "signup"),
            (4, 1, 1, "click"),                       # never signed up
        ]
        out = funnel_steps(
            self._events(spark, rows), ["signup", "click", "purchase"]
        ).collect()
        users = {r["step_name"]: r["users"] for r in out}
        assert users == {"signup": 3, "click": 1, "purchase": 1}
        conv = {r["step_name"]: r["conv_vs_first_e6"] for r in out}
        assert conv["signup"] == 1_000_000
        assert conv["click"] == 333_333  # round-half-up(1e6/3)

    def test_zero_first_step_users(self, spark):
        """No step-1 users at all: conversions are 0 (the fp_e6 den==0
        guard), matching the oracle's CASE WHEN guard — not NULL, not a
        divide-by-zero."""
        from l_space_spark.operators.funnel import funnel_steps

        rows = [(1, 1, 1, "click")]  # nobody ever signs up
        out = funnel_steps(
            self._events(spark, rows), ["signup", "click"]
        ).collect()
        by_step = {r["step_name"]: r for r in out}
        assert by_step["signup"]["users"] == 0
        assert by_step["signup"]["conv_vs_first_e6"] == 0
        assert by_step["click"]["conv_vs_first_e6"] == 0
        assert by_step["click"]["conv_vs_prev_e6"] == 0

    def test_same_timestamp_does_not_count(self, spark):
        from l_space_spark.operators.funnel import funnel_steps

        rows = [(1, 1, 1, "signup"), (1, 1, 1, "click")]
        out = funnel_steps(
            self._events(spark, rows), ["signup", "click"]
        ).collect()
        users = {r["step_name"]: r["users"] for r in out}
        assert users == {"signup": 1, "click": 0}


class TestRetention:
    def test_cohort_offsets(self, spark):
        from l_space_spark.operators.funnel import retention_cohorts

        rows = [
            (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-02"),
            (2, "2024-01-01"),
            (3, "2024-01-02"), (3, "2024-01-04"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts_s string"
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        out = retention_cohorts(ev).collect()
        cells = {(r["cohort_day"], r["day_offset"]):
                 (r["users"], r["retention_e6"]) for r in out}
        d0 = 19723  # 2024-01-01 in epoch days
        assert cells[(d0, 0)] == (2, 1_000_000)
        assert cells[(d0, 1)] == (1, 500_000)   # only user 1 returns
        assert cells[(d0 + 1, 0)] == (1, 1_000_000)
        assert cells[(d0 + 1, 2)] == (1, 1_000_000)
        assert len(cells) == 4


class TestContainment:
    def test_asymmetric_excerpt(self, spark):
        from l_space_spark.operators.dedup import containment_pairs

        # doc 2 is an exact excerpt of doc 1; doc 3 unrelated
        docs = spark.createDataFrame(
            [
                (1, "one two three four five six seven eight"),
                (2, "two three four five"),
                (3, "nine ten eleven twelve thirteen"),
            ],
            "doc_id long, text string",
        )
        out = containment_pairs(docs, "doc_id", "text", n=3,
                                c_num=1, c_den=2).collect()
        got = {(r["a"], r["b"]): r["containment_e6"] for r in out}
        # all of 2's 3-grams (2 of them) appear in 1 → containment 1.0
        assert got[(2, 1)] == 1_000_000
        # 1 has 6 shingles, 2 shared → 1/3 < 1/2: no (1, 2) row
        assert (1, 2) not in got
        assert not any(a == 3 or b == 3 for a, b in got)
