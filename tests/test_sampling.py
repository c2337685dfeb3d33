"""Per-group capped sampling: quotas, determinism, two-level == global."""

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from l_space_spark.operators.sampling import group_capped_sample


def _df(spark, n_groups=5, per_group=40):
    rows = [
        (g * 1000 + i, f"g{g}", f"payload-{g}-{i}")
        for g in range(n_groups)
        for i in range(per_group)
    ]
    return spark.createDataFrame(rows, "key long, grp string, payload string")


def test_quota_exact_and_schema_preserved(spark):
    df = _df(spark)
    out = group_capped_sample(df, ["grp"], "key", cap=6, shards=4)
    assert out.columns == df.columns
    counts = {r["grp"]: r["cnt"] for r in
              out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {f"g{g}": 6 for g in range(5)}


def test_small_groups_kept_whole(spark):
    df = _df(spark, n_groups=3, per_group=4)
    out = group_capped_sample(df, ["grp"], "key", cap=10)
    assert out.count() == 12


def test_two_level_equals_single_window(spark):
    df = _df(spark)
    out = {r["key"] for r in
           group_capped_sample(df, ["grp"], "key", cap=5, shards=4).collect()}

    def h60(v):
        return int(hashlib.md5(f"cap:{v}".encode()).hexdigest()[:15], 16)

    w = Window.partitionBy("grp").orderBy("__h", "key")
    brute = {r["key"] for r in
             df.withColumn("__h", F.udf(h60, "long")("key"))
             .withColumn("__r", F.row_number().over(w))
             .where(F.col("__r") <= 5).collect()}
    assert out == brute


def test_cap_monotone_prefix(spark):
    df = _df(spark)
    k5 = {r["key"] for r in
          group_capped_sample(df, ["grp"], "key", cap=5).collect()}
    k8 = {r["key"] for r in
          group_capped_sample(df, ["grp"], "key", cap=8).collect()}
    assert k5 < k8


def test_seed_redraws(spark):
    df = _df(spark)
    a = {r["key"] for r in
         group_capped_sample(df, ["grp"], "key", 5, seed="a").collect()}
    b = {r["key"] for r in
         group_capped_sample(df, ["grp"], "key", 5, seed="b").collect()}
    assert a != b and len(a) == len(b) == 25


def test_weighted_sample_matches_replica_twin(spark):
    import hashlib

    from l_space_spark.operators.sampling import weighted_sample_per_group

    rows = [(g * 100 + i, f"g{g}", (g * 100 + i) % 7)
            for g in range(3) for i in range(15)]
    df = spark.createDataFrame(rows, "key long, grp string, w long")
    got = {(r["grp"], r["key"]) for r in
           weighted_sample_per_group(
               df, ["grp"], "key", "w", n=4, shards=4).collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = set()
    for g in range(3):
        draws = []
        for k, grp, w in rows:
            if grp != f"g{g}" or w <= 0:
                continue
            d = min(h60(f"wcap:{k}:{r}") for r in range(1, w + 1))
            draws.append((d, k))
        for _, k in sorted(draws)[:4]:
            want.add((f"g{g}", k))
    assert got == want
    # zero-weight rows never sampled
    assert not any(k % 7 == 0 for _, k in got)


def test_weighted_sample_is_weight_proportional(spark):
    """Statistical sanity over many seeds: an item with weight 9 among
    ten weight-1 items wins first place ~9/19 of the time."""
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    wins = 0
    trials = 400
    for t in range(trials):
        best = min(
            (min(h60(f"s{t}:{k}:{r}") for r in range(1, w + 1)), k)
            for k, w in [(0, 9)] + [(i, 1) for i in range(1, 11)]
        )
        wins += best[1] == 0
    assert abs(wins / trials - 9 / 19) < 0.08


def test_hash_split_deterministic_and_exclusive(spark):
    from l_space_spark.operators.sampling import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = hash_split(df, "doc_id").collect()
    b = hash_split(df, "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # stable
    counts = {}
    for r in a:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.06 < counts["val"] / 2000 < 0.14
    # growth-stability: a subset keeps its assignments
    sub = {r["doc_id"]: r["split"]
           for r in hash_split(df.limit(500), "doc_id").collect()}
    full = {r["doc_id"]: r["split"] for r in a}
    assert all(full[k] == v for k, v in sub.items())
    # salt changes the assignment
    alt = {r["doc_id"]: r["split"]
           for r in hash_split(df, "doc_id", salt="other").collect()}
    assert any(alt[k] != full[k] for k in full)


def test_negative_samples_matches_replica(spark):
    import hashlib

    from l_space_spark.operators.sampling import negative_samples

    wts = [(10, 1), (11, 5), (12, 2), (13, 92)]  # one heavy "hub" vertex
    pairs = [(1, 2), (1, 3), (2, 3)]
    W = sum(w for _, w in wts)
    lo, acc = {}, 0
    for vid, w in sorted(wts):
        lo[vid] = acc
        acc += w

    def owner(d):
        return max(v for v in lo if lo[v] <= d)

    exp = set()
    for c, x in pairs:
        for j in range(3):
            h = int(hashlib.md5(f"neg:{c}:{x}:{j}".encode())
                    .hexdigest()[:15], 16)
            exp.add((c, x, j, owner(h % W)))

    out = negative_samples(
        spark,
        spark.createDataFrame(pairs, "center long, context long"),
        spark.createDataFrame(wts, "id long, w long"),
        k=3, blocks=8,
    )
    got = {(r["center"], r["context"], r["k"], r["neg"])
           for r in out.collect()}
    assert got == exp
    # exactly one owner per draw, heavy vertex dominates
    assert len(got) == 9
    negs = [n for *_, n in got]
    assert negs.count(13) >= 6  # 92% of the mass

    # zero total weight -> empty, typed
    empty = negative_samples(
        spark,
        spark.createDataFrame(pairs, "center long, context long"),
        spark.createDataFrame([], "id long, w long"),
        k=2,
    )
    assert empty.count() == 0 and empty.columns == [
        "center", "context", "k", "neg"]
