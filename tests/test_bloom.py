"""Bloom filter sketch (operators/sketch.py bloom_*): exactness against a
Python twin, the no-false-negative guarantee, and the bit_or merge law."""

import hashlib

import pytest
from pyspark.sql import functions as F

from l_space_spark.operators.sketch import (
    BLOOM_WORD_BITS,
    bloom_build,
    bloom_merge,
    bloom_probe,
)

WORDS = 8          # tiny filter → plenty of collisions to exercise
K = 3
M_BITS = WORDS * BLOOM_WORD_BITS


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_positions(v, k=K, m_bits=M_BITS):
    return [_h60(f"{v}:{i}") % m_bits for i in range(k)]


def _py_filter(values):
    words = {}
    for v in values:
        for p in _py_positions(v):
            w, b = divmod(p, BLOOM_WORD_BITS)
            words[w] = words.get(w, 0) | (1 << b)
    return words


MEMBERS = list(range(0, 40, 2))          # evens 0..38
PROBES = list(range(40))                 # evens = members, odds = non


@pytest.fixture(scope="module")
def flt(spark):
    df = spark.createDataFrame([(v,) for v in MEMBERS], "v long")
    return bloom_build(df, "v", k=K, words=WORDS).persist()


def test_filter_words_match_python_twin(spark, flt):
    got = {r["word"]: r["bits"] for r in flt.collect()}
    assert got == _py_filter(MEMBERS)


def test_no_false_negatives_and_twin_predictions(spark, flt):
    probes = spark.createDataFrame([(v,) for v in PROBES], "v long")
    got = {
        r["id"]: r["predicted"]
        for r in bloom_probe(flt, probes, "v", k=K, words=WORDS).collect()
    }
    assert set(got) == set(PROBES)
    pyf = _py_filter(MEMBERS)
    for v in PROBES:
        want = int(all(
            (pyf.get(p // BLOOM_WORD_BITS, 0) >> (p % BLOOM_WORD_BITS)) & 1
            for p in _py_positions(v)
        ))
        assert got[v] == want, v
        if v in MEMBERS:
            assert got[v] == 1  # a member can never be predicted out


def test_merge_law(spark, flt):
    half_a = spark.createDataFrame([(v,) for v in MEMBERS[:10]], "v long")
    half_b = spark.createDataFrame([(v,) for v in MEMBERS[10:]], "v long")
    merged = bloom_merge(
        bloom_build(half_a, "v", k=K, words=WORDS).unionByName(
            bloom_build(half_b, "v", k=K, words=WORDS)
        )
    )
    whole = {r["word"]: r["bits"] for r in flt.collect()}
    assert {r["word"]: r["bits"] for r in merged.collect()} == whole


def test_word_values_stay_nonnegative(spark, flt):
    assert flt.where(F.col("bits") < 0).count() == 0
