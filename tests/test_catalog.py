"""Catalog-table source layer (SURVEY §2.1 `G`, §4.1): `table:<db>` refs
resolve through spark.table, row-level delete prefers DELETE FROM with a
copy-on-write fallback, and input snapshots pin superstep checkpoints.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from l_space_spark.sources import (
    delete_where_table, load, register_tables, table_fingerprint,
)

SF_DIR = "/root/testdata/sf0.001"


def test_register_tables_and_catalog_load(spark):
    ref = register_tables(spark, SF_DIR, database="lspace_t1",
                          tables=["nation", "customer"])
    try:
        assert ref == "table:lspace_t1"
        via_catalog = load(spark, ref, "nation").orderBy("n_nationkey").collect()
        via_path = load(spark, SF_DIR, "nation").orderBy("n_nationkey").collect()
        assert via_catalog == via_path
    finally:
        spark.sql("DROP DATABASE IF EXISTS lspace_t1 CASCADE")


def test_catalog_scan_keeps_pushdown(spark):
    """spark.table over the registered external parquet must still push
    filters + prune columns — the pruning the Iceberg path inherits."""
    register_tables(spark, SF_DIR, database="lspace_t2", tables=["customer"])
    try:
        df = (
            spark.table("lspace_t2.customer")
            .where(F.col("c_acctbal") > 1000)
            .select("c_custkey")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "GreaterThan(c_acctbal" in plan
        read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
        assert "c_name" not in read_schema
    finally:
        spark.sql("DROP DATABASE IF EXISTS lspace_t2 CASCADE")


def test_full_catalog_queries_through_table_ref(spark):
    """Representative catalog queries run unchanged against table: refs
    and match their parquet-path results (the Iceberg-swap guarantee)."""
    from l_space_spark.queries import QUERIES

    ref = register_tables(spark, SF_DIR, database="lspace_t3")
    try:
        for name in ("group_agg_q1", "join_group_topk", "dedup_exact_sha"):
            got = QUERIES[name](spark, ref).collect()
            want = QUERIES[name](spark, SF_DIR).collect()
            assert got == want, name
    finally:
        spark.sql("DROP DATABASE IF EXISTS lspace_t3 CASCADE")


def test_delete_where_table_fallback(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.range(0, 100).withColumn(
        "flag",
        F.when(F.pmod("id", F.lit(4)) == 3, F.lit(None)).otherwise(
            F.pmod("id", F.lit(4))
        ),
    ).write.parquet(path)
    spark.sql("CREATE DATABASE IF NOT EXISTS lspace_t4")
    spark.catalog.createTable("lspace_t4.tbl", path=path, source="parquet")
    try:
        n = delete_where_table(spark, "lspace_t4.tbl", "flag = 0")
        assert n == 25
        back = spark.table("lspace_t4.tbl")
        assert back.count() == 75
        # NULL-flag rows (predicate NULL) were kept
        assert back.where(F.col("flag").isNull()).count() == 25
    finally:
        spark.sql("DROP DATABASE IF EXISTS lspace_t4 CASCADE")


def test_table_fingerprint_tracks_input_changes(spark, tmp_path):
    path = str(tmp_path / "fp")
    spark.range(0, 10).write.parquet(path)
    f1 = table_fingerprint(spark, path)
    f2 = table_fingerprint(spark, path)
    assert f1 == f2 and f1.startswith("files:")
    spark.range(10, 20).write.mode("append").parquet(path)
    assert table_fingerprint(spark, path) != f1


def test_jobspec_pins_input_snapshot_in_checkpoint_meta(spark, tmp_path):
    """A checkpointed algorithm job records the input fingerprint in its
    config hash; changing the input makes resume start fresh instead of
    continuing from the other input's states."""
    from l_space_spark.jobspec import run_job
    from l_space_spark.plans.superstep import SuperstepRunner

    path = str(tmp_path / "edges")
    spark.range(0, 50).select(
        F.pmod(F.xxhash64("id"), F.lit(20)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(20)).alias("dst"),
    ).write.parquet(path)
    ck = str(tmp_path / "ck")
    spec = {
        "kind": "algorithm", "algorithm": "connected_components",
        "input": {"edges_parquet": path}, "checkpoint_dir": ck,
    }
    run_job(spark, spec)
    metas = [
        json.load(open(os.path.join(ck, d, "_meta.json")))
        for d in sorted(os.listdir(ck)) if d.startswith("state_")
        and os.path.exists(os.path.join(ck, d, "_meta.json"))
    ]
    assert metas, "no checkpoint meta written"
    h1 = metas[-1]["config_hash"]

    # same input → same config hash → resumable; changed input → different
    fp1 = table_fingerprint(spark, path)
    r_same = SuperstepRunner(
        spark, max_iters=100, tol=0.0, checkpoint_dir=ck,
        config={"algo": "connected_components", "impl": "dataframe",
                "input_snapshot": fp1},
    )
    assert r_same.config_hash == h1
    assert r_same.latest_checkpoint() is not None

    spark.range(0, 5).select(
        F.lit(100).alias("src"), F.lit(101).alias("dst")
    ).write.mode("append").parquet(path)
    fp2 = table_fingerprint(spark, path)
    assert fp2 != fp1
    r_changed = SuperstepRunner(
        spark, max_iters=100, tol=0.0, checkpoint_dir=ck,
        config={"algo": "connected_components", "impl": "dataframe",
                "input_snapshot": fp2},
    )
    assert r_changed.latest_checkpoint() is None  # refuses stale states


def test_delete_where_table_preserves_bucketing_and_companion(spark, tmp_path):
    """Deleting from a BUCKETED catalog table must keep the bucketed
    layout readable (the naive directory swap leaves plain files under
    bucketed metadata → INVALID_BUCKET_FILE on the next scan) and must
    propagate to the {table}__by_dst companion so the two indexes never
    diverge."""
    from l_space_spark.sources import delete_where_table, write_bucketed_edges

    edges = spark.range(0, 1000).select(
        F.pmod(F.xxhash64("id"), F.lit(50)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50)).alias("dst"),
    )
    write_bucketed_edges(edges, "dwt_bkt", buckets=4,
                         path=str(tmp_path / "e"), reverse=True)
    try:
        before = spark.table("dwt_bkt").count()
        expect = spark.table("dwt_bkt").where("src = 7").count()
        n = delete_where_table(spark, "dwt_bkt", "src = 7")
        assert n == expect > 0

        # both copies still readable, same multiset, no src=7 anywhere
        base = sorted(map(tuple, spark.table("dwt_bkt").collect()))
        comp = sorted(map(tuple, spark.table("dwt_bkt__by_dst").collect()))
        assert base == comp and len(base) == before - n
        assert all(r[0] != 7 for r in base)

        # the base table still claims AND delivers bucketed layout: an
        # aggregation on the bucket key plans without an exchange
        plan = (spark.table("dwt_bkt").groupBy("src").count()
                ._jdf.queryExecution().executedPlan().toString())
        assert "Bucketed: true" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS dwt_bkt")
        spark.sql("DROP TABLE IF EXISTS dwt_bkt__by_dst")


def test_driver_window_rejects_stale_names():
    """A renamed/removed catalog entry must fail LOUD, not silently
    shrink the driver's 50-slot correctness sample."""
    import pytest

    from l_space_spark import queries as q

    q._DRIVER_WINDOW.append("no_such_entry_xyz")
    try:
        with pytest.raises(AssertionError, match="no_such_entry_xyz"):
            q.queries()
    finally:
        q._DRIVER_WINDOW.remove("no_such_entry_xyz")
    assert list(q.queries())[:len(q._DRIVER_WINDOW)] == q._DRIVER_WINDOW
