"""Corpus shaping for training pipelines — chunking and context packing.

Two deterministic, SQL-reproducible stages that sit between curation
and the training loader:

``chunk_documents``
    Fixed-size sliding-window character chunks with overlap — the
    retrieval/embedding-prep cut. Pure Catalyst (``sequence`` →
    ``explode`` → ``substring``): no UDF, whole-stage-codegen friendly,
    and embarrassingly parallel (per-row fan-out, no shuffle at all —
    the explode happens inside the scan stage).

``pack_contexts``
    Greedy sequential context-window packing: documents in a fixed
    total order (``doc_id``) are laid head-to-tail on an infinite token
    tape, and each document is assigned to the context bin where it
    STARTS (``bin = floor(exclusive_prefix_sum / capacity)``, position
    ``pos_in_bin = prefix % capacity``). This is the standard
    concat-then-split packing used to build fixed-length training
    examples from variable-length documents; emitting (bin, pos) per
    document keeps the operator relational (the loader's final
    concat+split is a groupBy(bin) away).

    The prefix sum is the scale problem: a single
    ``Window.orderBy(doc_id)`` puts the whole corpus in ONE task. The
    operator instead runs a two-level (shard-local window + broadcast
    shard-offset join) prefix sum, the same decomposition as
    ``sampling``'s sharded ranks: any monotone function of ``doc_id``
    works as the shard key, so ``doc_id div shard_block`` keeps shards
    order-aligned with zero coordination; per-shard windows are
    bounded, and the shard-offset table (one row per shard) broadcasts.
    Result is bit-identical to the single-window form — that identity
    is the catalog oracle (plain window cumsum in SQL) and is
    property-tested.

Reference analog: none — L-space has no corpus-shaping surface at all;
the nearest idiom is client-side iteration over a traversal result.
Both stages exist because the north-star framing (LLM training-data
pipeline over 100 TB) needs them, per the round brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    chunk_size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window chunks: starts 1, 1+stride, … (1-based, matching
    SQL ``substring``), stride = chunk_size − overlap; every document
    emits at least one chunk, and the last chunk may be short. Returns
    ``(*id_cols, chunk_id, chunk_start, chunk_text, chunk_len)``."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # last chunk index: ceil(max(len - size, 0) / stride) in pure ints
    # (integer `div`, never float: exact at any length); NULL text is
    # treated as '' so the one-chunk-per-document contract holds —
    # sequence(0, NULL) would silently drop the row otherwise
    last = F.expr(
        f"(greatest(length(coalesce({text_col}, '')) - {chunk_size}, 0)"
        f" + {stride - 1}) div {stride}"
    ).cast("long")
    chunk = F.explode(F.sequence(F.lit(0).cast("long"), last))
    start = (F.col("chunk_id") * stride + 1).cast("long")
    return (
        df.select(*id_cols, F.col(text_col), chunk.alias("chunk_id"))
        .withColumn("chunk_start", start)
        .select(
            *id_cols,
            "chunk_id",
            "chunk_start",
            F.expr(
                f"substring(coalesce({text_col}, ''),"
                f" chunk_start, {chunk_size})"
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix",
    shard_block: int = 1 << 20,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order,
    without a global single-task window: shard by the order-aligned key
    ``order_col div shard_block``, window within each shard, then add
    broadcast per-shard offsets. ``order_col`` must be a unique bigint;
    ``shard_block`` sizes shards (ids per shard), not their count."""
    shard = F.expr(f"{order_col} div {shard_block}")
    w_in = (
        Window.partitionBy("_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = df.withColumn("_shard", shard).withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w_in), F.lit(0))
    )
    w_sh = (
        Window.orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_shard")
        .agg(F.sum(value_col).alias("_tot"))
        .select(
            "_shard",
            F.coalesce(F.sum("_tot").over(w_sh), F.lit(0)).alias("_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_shard")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_shard", "_local", "_off")
    )


def pack_contexts(
    df: DataFrame,
    capacity: int,
    order_col: str = "doc_id",
    tokens_col: Column | None = None,
    shard_block: int = 1 << 20,
) -> DataFrame:
    """Assign each document a context bin and in-bin start position
    (greedy sequential packing, see module doc). ``tokens_col``
    defaults to the engine's standard alnum token count of ``text``.
    Returns ``(order_col, n_tok, bin, pos_in_bin)``."""
    if tokens_col is None:
        # the engine's shared token definition (functions/text.py) —
        # the same TOKENS_RE the oracle's _TOKENS_SQL mirrors
        tokens_col = F.size(tokens(F.col("text")))
    toks = df.select(
        F.col(order_col), tokens_col.cast("long").alias("n_tok")
    )
    pre = exclusive_prefix_sum(
        toks, order_col, "n_tok", shard_block=shard_block
    )
    return pre.select(
        order_col,
        "n_tok",
        F.expr(f"prefix div {capacity}").cast("long").alias("bin"),
        F.pmod(F.col("prefix"), F.lit(capacity)).cast("long")
        .alias("pos_in_bin"),
    )


def _isqrt(col: Column) -> Column:
    """Exact integer sqrt: floor(sqrt(x)) with ±1 correction. IEEE
    sqrt is correctly rounded in both engines, but floor of it can
    still be off by one near perfect squares for large x — the two
    integer comparisons repair that deterministically."""
    s0 = F.floor(F.sqrt(col.cast("double"))).cast("long")
    s1 = F.when(s0 * s0 > col, s0 - 1).otherwise(s0)
    return F.when((s1 + 1) * (s1 + 1) <= col, s1 + 1).otherwise(s1)


def mixture_allocation(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Training-mixture planning: split a token ``budget`` across
    sources proportionally to ``sqrt(tokens_s)`` — the α = 1/2
    temperature reweighting that upsamples small/rare sources relative
    to raw proportional sampling (the standard multilingual/multi-domain
    mixture trick). All arithmetic is integer-exact: weights via
    corrected integer sqrt, quotas via ``budget·w div Σw``, and the
    rounding leftover distributed by the largest-remainder method
    (ties to the lexicographically first source), so Σalloc == budget
    always.

    Scale shape: one groupBy(source) over the corpus (combiner-backed
    sums), then all remaining work — including the one global window —
    happens on the sources table, whose cardinality is the number of
    DISTINCT SOURCES (tens to thousands), not documents. Returns
    ``(source, n_docs, n_tok, weight, alloc_tokens, share_e6)``.
    """
    if tokens_col is None:
        tokens_col = F.size(tokens(F.col("text")))
    per = (
        df.select(F.col(source_col).alias("source"),
                  tokens_col.cast("long").alias("t"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("t").alias("n_tok"))
        .select("source", "n_docs", "n_tok",
                _isqrt(F.col("n_tok")).alias("weight"))
    )
    tot = per.agg(F.sum("weight").alias("tw"))
    per = per.crossJoin(F.broadcast(tot))
    per = per.select(
        "source", "n_docs", "n_tok", "weight",
        F.expr(f"({budget} * weight) div tw").alias("base"),
        F.expr(f"({budget} * weight) % tw").alias("rem"),
    )
    leftover = F.lit(budget) - F.sum("base").over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    )
    rank = F.row_number().over(
        Window.orderBy(F.desc("rem"), F.asc("source"))
    )
    out = per.select(
        "source", "n_docs", "n_tok", "weight",
        (F.col("base")
         + F.when(rank <= leftover, F.lit(1)).otherwise(F.lit(0)))
        .alias("alloc_tokens"),
    )
    return out.select(
        "source", "n_docs", "n_tok", "weight", "alloc_tokens",
        F.expr(f"(1000000 * alloc_tokens) div {budget}").alias("share_e6"),
    )
