"""Winnowing fingerprints: python twin + the paper's coverage guarantee."""

import hashlib
import re

from l_space_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_match_pairs,
)


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def toks(t):
    return re.findall(r"[a-z0-9]+", t.lower())


def twin_fps(text, k, w):
    ts = toks(text)
    hs = [h60(" ".join(ts[i:i + k])) for i in range(len(ts) - k + 1)]
    if not hs:
        return set()
    out = set()
    last = max(1, len(hs) - w + 1)
    for s in range(last):  # 0-based starts; positions reported 1-based
        win = hs[s:s + w] if len(hs) >= w else hs
        mh = min(win)
        pos = max(i for i in range(s, s + len(win)) if hs[i] == mh)
        out.add((pos + 1, mh))
    return out


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_python_twin(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 40)))
        for _ in range(30)
    ]
    got = {}
    for r in winnow_fingerprints(docs_df(spark, texts), k=3, w=4).collect():
        got.setdefault(r["doc"], set()).add((r["pos"], r["fp"]))
    want = {i: twin_fps(t, 3, 4) for i, t in enumerate(texts)}
    want = {i: s for i, s in want.items() if s}
    assert got == want


def test_shared_run_guarantee(spark):
    # the paper's guarantee: a shared run of >= w+k-1 tokens yields at
    # least one shared fingerprint HASH between the two documents
    k, w = 4, 4
    run = "alpha beta gamma delta epsilon zeta eta"  # 7 = w+k-1 tokens
    texts = [
        "one two three " + run + " four five",
        "six seven " + run + " eight nine ten",
    ]
    rows = winnow_fingerprints(docs_df(spark, texts), k=k, w=w).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r["doc"]].add(r["fp"])
    assert fps[0] & fps[1]


def test_short_and_empty_docs(spark):
    texts = ["a b c d e", "a b", ""]  # 2 grams at k=4; <k tokens; empty
    rows = winnow_fingerprints(docs_df(spark, texts), k=4, w=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc"], []).append(r)
    assert set(by_doc) == {0}  # short/empty docs contribute nothing
    # 2 grams < w: single all-gram window → exactly one fingerprint
    assert len(by_doc[0]) == 1


def test_match_pairs_and_df_cap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [base + " uniq%d tail" % i for i in range(3)] + [
        "totally different words here with no overlap at all whatsoever"
    ]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared"]
        for r in winnow_match_pairs(
            docs_df(spark, texts), k=4, w=4, min_shared=1
        ).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= set(pairs)
    assert all((3 not in p) for p in pairs)
    # df cap: the shared fingerprints live in 3 docs; max_df=2 kills them
    assert (
        winnow_match_pairs(
            docs_df(spark, texts), k=4, w=4, min_shared=1, max_df=2
        ).count()
        == 0
    )
