"""Deterministic synthetic ``repos`` table (the BASELINE.json ``input_hint`` shape).

Schema: ``repo string, path string, commit string, lang string, content string``.

Every cell is a pure function of ``(seed, repo_index, file_index)`` via a
counter-based splitmix64 hash — NO stateful RNG — so the table is identical
regardless of partitioning, parallelism, or generation order. That is what
makes it safe to generate distributedly at any scale (the 10^12-file story:
``spark.range`` over file indices, ``mapInPandas`` per batch, no driver data).

Graph shape: out-degree per repo is heavy-tailed (discrete Pareto, s≈2) and
destination choice is biased toward low repo indices (power-law IN-degree),
so high-degree hubs exist at every scale — this exercises the skew/salting
path (SURVEY §4.2.4).

``content`` embeds one import/dependency line per outgoing link (spread
round-robin over the repo's files) in the FILE'S OWN LANGUAGE SYNTAX —
``import repoX`` (python), ``import repoX.core._`` (scala),
``import repoX.core.Api;`` (java), ``import "github.com/l-space/repoX"``
(go) — plus deterministic filler, so edge extraction (extract.py) must
parse real multi-language import forms yet stays exactly derivable and
checkable by a pandas oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ("python", "scala", "java", "go")

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set).

    uint64 wraparound is the point — suppress numpy's overflow warnings.
    """
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        z = x
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> np.uint64(31))


def _h(seed: int, *parts: np.ndarray | int) -> np.ndarray:
    """Counter-based hash of (seed, parts...) → uint64, vectorized."""
    acc = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    out = None
    for p in parts:
        arr = np.asarray(p, dtype=np.uint64)
        cur = _splitmix64((arr ^ acc) & _MASK)
        out = cur if out is None else _splitmix64((out ^ cur) & _MASK)
        acc = np.uint64(0x9E3779B97F4A7C15)
    return out


def _u01(bits: np.ndarray) -> np.ndarray:
    return (bits >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def out_degrees(n_repos: int, seed: int, max_degree: int, s: float = 2.0) -> np.ndarray:
    """Heavy-tailed out-degree per repo: 1 + floor(u^(-1/(s-1))) capped."""
    i = np.arange(n_repos, dtype=np.uint64)
    u = _u01(_h(seed, i, 0xDE6))
    u = np.clip(u, 1e-12, 1.0)
    deg = 1 + np.floor(u ** (-1.0 / (s - 1.0))).astype(np.int64) - 1
    return np.clip(deg, 1, max_degree)


def dest_for(repo_idx: np.ndarray, k: np.ndarray, n_repos: int, seed: int,
             in_skew: float = 2.0) -> np.ndarray:
    """k-th outgoing destination of repo_idx; biased to low ids (in-degree skew)."""
    u = _u01(_h(seed, repo_idx.astype(np.uint64), k.astype(np.uint64), 0xD57))
    dst = np.floor(float(n_repos) * (u ** in_skew)).astype(np.int64)
    dst = np.minimum(dst, n_repos - 1)
    # avoid self-loop deterministically
    self_loop = dst == repo_idx.astype(np.int64)
    dst[self_loop] = (dst[self_loop] + 1) % n_repos
    return dst


def expected_edges(n_repos: int, seed: int, max_degree: int = 64) -> set[tuple[int, int]]:
    """Driver-side oracle: the exact distinct (src, dst) edge set."""
    deg = out_degrees(n_repos, seed, max_degree)
    edges: set[tuple[int, int]] = set()
    for i in range(n_repos):
        ks = np.arange(deg[i], dtype=np.uint64)
        ri = np.full(int(deg[i]), i, dtype=np.uint64)
        for d in dest_for(ri, ks, n_repos, seed):
            edges.add((i, int(d)))
    return edges


_FILLER_WORDS = (
    "graph edge vertex rank label component triangle shuffle partition "
    "broadcast superstep convergence lineage checkpoint iceberg parquet"
).split()


def _file_rows(repo_idx: np.ndarray, file_idx: np.ndarray, n_repos: int,
               files_per_repo: int, seed: int, max_degree: int) -> pd.DataFrame:
    """Build rows for (repo_idx, file_idx) pairs — pure function, vectorized where it counts."""
    deg = out_degrees(n_repos, seed, max_degree)
    repos = np.char.add("repo", np.char.zfill(repo_idx.astype("U8"), 5))
    exts = {"python": "py", "scala": "scala", "java": "java", "go": "go"}
    langs = [LANGS[int(x) % len(LANGS)] for x in (repo_idx + file_idx)]
    paths = [f"src/f{j}.{exts[lg]}" for j, lg in zip(file_idx, langs)]

    import_forms = {
        "python": "import repo{d:05d}",
        "scala": "import repo{d:05d}.core._",
        "java": "import repo{d:05d}.core.Api;",
        "go": 'import "github.com/l-space/repo{d:05d}"',
    }
    comment = {"python": "#", "scala": "//", "java": "//", "go": "//"}
    contents = []
    for i, j, repo, lang in zip(repo_idx, file_idx, repos, langs):
        d = int(deg[i])
        # file j owns links k ≡ j (mod files_per_repo)
        ks = np.arange(j, d, files_per_repo, dtype=np.uint64)
        lines = [f"{comment[lang]} {repo} {lang} file {j}"]
        if ks.size:
            dsts = dest_for(np.full(ks.size, i, dtype=np.uint64), ks, n_repos, seed)
            form = import_forms[lang]
            lines += [form.format(d=int(d2)) for d2 in dsts]
        fw = _h(seed, np.uint64(i), np.uint64(j), 0xF111)
        lines.append("# " + " ".join(
            _FILLER_WORDS[int((int(fw) >> (4 * t)) % len(_FILLER_WORDS))] for t in range(6)))
        contents.append("\n".join(lines) + "\n")

    commits = [hashlib.sha256(f"{r}/{p}".encode()).hexdigest()[:40]
               for r, p in zip(repos, paths)]
    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs,
         "content": contents}
    )


def generate_repos(
    spark: SparkSession,
    n_repos: int = 1000,
    files_per_repo: int = 3,
    seed: int = 42,
    max_degree: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation of the input table.

    ``spark.range`` over the global file index → ``mapInPandas``; each batch
    derives its rows purely from indices, so this scales to any size without
    a driver-side materialization (the 10^12-file pattern).
    """
    total = n_repos * files_per_repo
    parts = num_partitions or max(spark.sparkContext.defaultParallelism, 4)
    rng = spark.range(0, total, 1, parts)

    def gen(batches):
        for pdf in batches:
            gid = pdf["id"].to_numpy()
            yield _file_rows(
                (gid // files_per_repo).astype(np.int64),
                (gid % files_per_repo).astype(np.int64),
                n_repos, files_per_repo, seed, max_degree,
            )

    schema = "repo string, path string, commit string, lang string, content string"
    return rng.mapInPandas(gen, schema=schema)


def repos_pandas_oracle(n_repos: int, files_per_repo: int = 3, seed: int = 42,
                        max_degree: int = 64) -> pd.DataFrame:
    """Pure-pandas oracle of the full table (small scales only)."""
    gid = np.arange(n_repos * files_per_repo, dtype=np.int64)
    return _file_rows(gid // files_per_repo, gid % files_per_repo,
                      n_repos, files_per_repo, seed, max_degree)
