"""Generator determinism + extraction correctness + the sha256 per-row invariant."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from l_space_spark import extract, synth

N_REPOS = 120
FILES = 3


def test_generator_deterministic_and_partition_independent(spark):
    a = synth.generate_repos(spark, N_REPOS, FILES, seed=42, num_partitions=2)
    b = synth.generate_repos(spark, N_REPOS, FILES, seed=42, num_partitions=7)
    pa = a.orderBy("repo", "path").toPandas()
    pb = b.orderBy("repo", "path").toPandas()
    pd.testing.assert_frame_equal(pa, pb)
    # matches the pure-pandas oracle
    po = (
        synth.repos_pandas_oracle(N_REPOS, FILES, seed=42)
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pa.reset_index(drop=True), po)


def test_sha256_invariant(spark):
    """Spark sha2(content,256) == hashlib oracle, before AND after extraction."""
    repos = synth.generate_repos(spark, N_REPOS, FILES, seed=42)
    with_sha = extract.with_content_sha(repos)
    rows = with_sha.select("content", "content_sha").collect()
    assert len(rows) == N_REPOS * FILES
    for r in rows:
        assert r["content_sha"] == hashlib.sha256(r["content"].encode()).hexdigest()

    # extraction must not disturb the source rows: re-check after running it
    names = extract.extract_edge_names(repos)
    names.count()
    again = extract.with_content_sha(repos).select("content", "content_sha").collect()
    for r in again:
        assert r["content_sha"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_extracted_edges_match_generator_oracle(spark):
    repos = synth.generate_repos(spark, N_REPOS, FILES, seed=42)
    names = extract.extract_edge_names(repos)
    got = {
        (int(r["src_repo"][4:]), int(r["dst_repo"][4:]))
        for r in names.collect()
    }
    assert got == synth.expected_edges(N_REPOS, seed=42)


def test_import_pattern_parses_all_four_language_syntaxes(spark):
    """One capture group over python/scala/java/go import forms; noise
    lines (comments, indented imports, unrelated modules) extract nothing."""
    fixtures = [
        ("python", "import repo00007\nimport numpy\n", ["repo00007"]),
        ("scala", "import repo00011.core._\n", ["repo00011"]),
        ("java", "import repo00042.core.Api;\n", ["repo00042"]),
        ("go", 'import "github.com/l-space/repo00099"\n', ["repo00099"]),
        ("python", "# import repo00001\n  import repo00002\n", []),
        ("go", 'import "fmt"\n', []),
    ]
    df = spark.createDataFrame(
        [(f"r{i}", f"f{i}", "c", lang, content)
         for i, (lang, content, _) in enumerate(fixtures)],
        "repo string, path string, commit string, lang string, content string",
    )
    hits = df.select(
        "repo",
        F.regexp_extract_all(
            F.col("content"), F.lit(extract.IMPORT_PATTERN), 1
        ).alias("m"),
    ).collect()
    got = {r["repo"]: sorted(r["m"]) for r in hits}
    want = {f"r{i}": sorted(exp) for i, (_, _, exp) in enumerate(fixtures)}
    assert got == want


def test_vertex_encoding_no_collisions_and_join_consistent(spark):
    repos = synth.generate_repos(spark, N_REPOS, FILES, seed=42)
    vertices, edges = extract.build_graph(repos)
    v = vertices.collect()
    assert len({r["id"] for r in v}) == len(v)  # xxhash64 collision-free here
    # every edge endpoint resolves to a vertex
    n_edges = edges.count()
    assert (
        edges.join(vertices.select(F.col("id").alias("src")), "src", "left_semi").count()
        == n_edges
    )
    assert (
        edges.join(vertices.select(F.col("id").alias("dst")), "dst", "left_semi").count()
        == n_edges
    )


def test_delete_where_sink(spark, tmp_path):
    from pyspark.sql import functions as F

    from l_space_spark.sources import delete_where

    path = str(tmp_path / "tbl")
    spark.range(0, 100).withColumn("flag", F.pmod("id", F.lit(4))).write.parquet(path)
    n = delete_where(spark, path, F.col("flag") == 0)
    assert n == 25
    back = spark.read.parquet(path)
    assert back.count() == 75
    assert back.where(F.col("flag") == 0).count() == 0
    # second delete is a no-op
    assert delete_where(spark, path, F.col("flag") == 0) == 0


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """Three-valued logic: rows where the delete predicate evaluates to NULL
    (here: NULL flag vs `flag == 0`) do NOT match the predicate and must be
    KEPT — the naive `where(~cond)` silently deleted them."""
    from pyspark.sql import functions as F

    from l_space_spark.sources import delete_where

    path = str(tmp_path / "tbl_null")
    df = spark.range(0, 90).withColumn(
        "flag",
        F.when(F.pmod("id", F.lit(3)) == 2, F.lit(None)).otherwise(
            F.pmod("id", F.lit(3))
        ),
    )
    df.write.parquet(path)  # 30 rows flag=0, 30 flag=1, 30 flag=NULL
    n = delete_where(spark, path, F.col("flag") == 0)
    assert n == 30
    back = spark.read.parquet(path)
    assert back.count() == 60
    assert back.where(F.col("flag").isNull()).count() == 30  # NULLs survived
    assert back.where(F.col("flag") == 1).count() == 30
