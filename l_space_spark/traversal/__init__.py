"""Fluent DataFrame-backed traversal DSL — step parity with L-space's Librarian.

Re-imagines the reference's 53 traversal steps
(``core/shared/src/main/scala/lspace/librarian/traversal/step/Step.scala:78-133``)
executed by the Sync/Async guides
(``core/.../librarian/task/SyncGuide.scala``, ``AsyncGuide.scala``) as lazy
Catalyst plans over TWO DataFrames:

- ``vertices(id long, iri string, labels array<string>, …)``
- ``edges(edge_id long, src long, label string, dst_kind string, dst_id long,
  dst_str string, dst_dbl double, dst_lng long, dst_dt date, …metadata)``

The long-form typed edge table is the relational collapse of L-space's
Node/Edge/Value resource model (``structure/Graph.scala:81-89``): a property
``person --name--> "Levi"`` is an edge row with ``dst_kind='string'``; a link
``person --knows--> person`` has ``dst_kind='node'``. Edge-on-edge
meta-statements (``SampleGraph.scala:116``) become metadata COLUMNS on the
edge row — the idiomatic relational encoding (SURVEY §1.1).

Execution model: every step is a DataFrame transformation; the traverser
stream (``librarian/traversal/Librarian.scala:14-59``) is a DataFrame whose
rows carry a uniform resource focus::

    _kind ∈ {node,string,double,long,date,edge} · _id · _str · _dbl · _lng · _dt

plus bookkeeping columns (``_tid`` correlation key, ``_path``, ``_ord``,
``_as_*`` alias snapshots). Correlated sub-traversals (where/and/or/not/
local/group/order-by/project/repeat-until) are decorrelated into semi/anti/
aggregate joins on ``_tid`` — the rewrite the reference never does (it
interprets tuple-at-a-time); here Catalyst plans, prunes, and codegens every
step. Barriers (count/sum/mean/max/min/group/order — reference
``step/Step.scala:209-271``) group by the enclosing scope, which is how
``Local`` (per-element barriers, ``SyncGuide.scala:510-515``) falls out for
free.

Scale notes: moves are equi hash joins against the edge table keyed by
``src`` (reverse moves by a null-safe struct key); Catalyst broadcasts small
frontiers automatically and AQE splits skewed keys. Global ``order`` is an
inherent gather — ``order().limit(k)`` collapses to TakeOrderedAndProject.
``repeat`` localCheckpoints each round to stop iterative-lineage blowup
(SURVEY §4.2.1).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable, Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.ckpt import strip_plan_stats

from ..functions.predicates import P, Pred, operand_family  # noqa: F401

FOCUS = ["_kind", "_id", "_str", "_dbl", "_lng", "_dt"]
_EDGE_COLS = [
    "edge_id", "src", "label", "dst_kind", "dst_id", "dst_str", "dst_dbl",
    "dst_lng", "dst_dt",
]
# value-kind groups for hasLabel — the datatype lattice collapse (SURVEY §1.3)
_TYPE_KINDS = {
    "@string": ("string",),
    "@int": ("long",),
    "@long": ("long",),
    "@double": ("double",),
    "@number": ("double", "long"),
    "@date": ("date",),
    "@temporal": ("date",),
}


def _closure(hierarchy: dict[str, list[str]] | None) -> dict[str, set[str]]:
    """label → {label} ∪ all labels that transitively extend it.

    The Spark stand-in for the reference's inheritance-aware label matching
    (``structure/Resource.scala:101-107``, ``Ontology.scala`` ``@extends``):
    a query for ``name`` also matches ``givenname`` if givenname extends name.
    """
    hierarchy = hierarchy or {}
    # ancestors per label (transitive)
    anc: dict[str, set[str]] = {}

    def ancestors(lbl: str, seen: frozenset = frozenset()) -> set[str]:
        if lbl in anc:
            return anc[lbl]
        out: set[str] = set()
        for p in hierarchy.get(lbl, []):
            if p not in seen:
                out.add(p)
                out |= ancestors(p, seen | {lbl})
        anc[lbl] = out
        return out

    desc: dict[str, set[str]] = {}
    labels = set(hierarchy)
    for lbl in labels:
        for a in ancestors(lbl) | {lbl}:
            desc.setdefault(a, set()).add(lbl)
    return desc


def _null(col: str) -> Column:
    typ = {"_kind": "string", "_id": "long", "_str": "string",
           "_dbl": "double", "_lng": "long", "_dt": "date"}[col]
    return F.lit(None).cast(typ).alias(col)


def value_column(kind_col: Column = None) -> Column:
    """Single display/compare value as string (terminal convenience)."""
    return F.coalesce(
        F.col("_str"),
        F.col("_dbl").cast("string"),
        F.col("_lng").cast("string"),
        F.col("_dt").cast("string"),
        F.col("_id").cast("string"),
    )


class Graph:
    """A property graph = vertices + long-form typed edges (see module doc)."""

    def __init__(
        self,
        vertices: DataFrame,
        edges: DataFrame,
        property_hierarchy: dict[str, list[str]] | None = None,
        ontology_hierarchy: dict[str, list[str]] | None = None,
        edges_by_dst: DataFrame | None = None,
        all_node_dst: bool = False,
    ) -> None:
        """``edges_by_dst``: the SAME edge rows physically keyed by their
        target (e.g. a ``{table}__by_dst`` bucketed table from
        ``sources.write_bucketed_edges(reverse=True)``) — the reference's
        ``edgesByTo`` companion index
        (``store/cassandra/.../CassandraGraphTables.scala:7-21``). When set
        AND ``all_node_dst`` holds (every edge targets a node, the link-graph
        shape — ``from_edgelist`` sets it automatically), reverse moves
        (``in_``/``in_e``) equi-join on ``dst_id`` against this copy instead
        of struct-joining the src-keyed table, so the edge side keeps its
        bucketing and never re-shuffles at query time."""
        for c in ("iri", "labels"):
            if c not in vertices.columns:
                vertices = vertices.withColumn(
                    c,
                    F.lit(None).cast("string" if c == "iri" else "array<string>"),
                )
        edges = self._norm_edges(edges)
        self.edges_by_dst = (
            None if edges_by_dst is None else self._norm_edges(edges_by_dst)
        )
        self._all_node_dst = all_node_dst
        self.vertices = vertices
        self.edges = edges
        self._prop_desc = _closure(property_hierarchy)
        self._ont_desc = _closure(ontology_hierarchy)
        self._meta_cols = [c for c in edges.columns if c not in _EDGE_COLS]

    @staticmethod
    def edge_id():
        """Deterministic edge identity over the long-form edge columns —
        the SAME expression ``_norm_edges`` assigns, exposed so callers can
        REIFY an edge: compute the base edge's id and use it as the ``src``
        of meta-edge rows (statement-about-statement, reference
        ``SampleGraph.scala:116``). Meta-edges are ordinary edge rows, so
        the reification chains to any depth, and pointing AT an edge works
        symmetrically via ``dst_kind='edge', dst_id=edge_id``."""
        return F.xxhash64("src", "label", "dst_kind", "dst_id", "dst_str",
                          "dst_dbl", "dst_lng", "dst_dt")

    @staticmethod
    def _norm_edges(edges: DataFrame) -> DataFrame:
        for c, t in (("dst_id", "long"), ("dst_str", "string"),
                     ("dst_dbl", "double"), ("dst_lng", "long"),
                     ("dst_dt", "date")):
            if c not in edges.columns:
                edges = edges.withColumn(c, F.lit(None).cast(t))
        if "edge_id" not in edges.columns:
            edges = edges.withColumn("edge_id", Graph.edge_id())
        return edges

    # ------------------------------------------------------------------ build
    @classmethod
    def from_edgelist(
        cls,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        label: str = "linked",
        edges_by_dst: DataFrame | None = None,
        **kw,
    ) -> "Graph":
        """Adapter from a bare link-graph ``edges(src, dst[, label])`` table.

        ``edges_by_dst``: optionally the same raw rows read from a
        dst-bucketed companion table (``write_bucketed_edges(reverse=True)``)
        — converted through the identical projection (aliasing preserves the
        bucketed partitioning; ``edge_id`` is a deterministic hash so both
        copies agree) and used for reverse moves. All edges here target
        nodes, so the fast reverse path is always sound (``all_node_dst``).
        """

        def to_long(e: DataFrame) -> DataFrame:
            lbl = F.col("label") if "label" in e.columns else F.lit(label)
            return e.select(
                F.col("src").cast("long").alias("src"),
                lbl.alias("label"),
                F.lit("node").alias("dst_kind"),
                F.col("dst").cast("long").alias("dst_id"),
            )

        if vertices is None:
            vertices = (
                edges.select(F.col("src").alias("id"))
                .unionByName(edges.select(F.col("dst").alias("id")))
                .distinct()
            )
        return cls(
            vertices, to_long(edges),
            edges_by_dst=None if edges_by_dst is None else to_long(edges_by_dst),
            all_node_dst=True, **kw,
        )

    @staticmethod
    def melt_properties(
        df: DataFrame,
        id_col: str,
        str_cols: Iterable[str] = (),
        num_cols: Iterable[str] = (),
        date_cols: Iterable[str] = (),
    ) -> DataFrame:
        """Wide columns → long-form property-edge rows (one per non-null cell).

        The inverse of the reference's value-edge creation
        (``structure/Graph.scala:160-181``) for relational inputs.
        """
        parts = []
        for c in str_cols:
            parts.append(df.select(
                F.col(id_col).cast("long").alias("src"), F.lit(c).alias("label"),
                F.lit("string").alias("dst_kind"), F.lit(None).cast("long").alias("dst_id"),
                F.col(c).cast("string").alias("dst_str"),
                F.lit(None).cast("double").alias("dst_dbl"),
                F.lit(None).cast("long").alias("dst_lng"),
                F.lit(None).cast("date").alias("dst_dt"),
            ).where(F.col("dst_str").isNotNull()))
        for c in num_cols:
            is_integral = dict(df.dtypes)[c] in ("int", "bigint", "smallint", "tinyint")
            parts.append(df.select(
                F.col(id_col).cast("long").alias("src"), F.lit(c).alias("label"),
                F.lit("long" if is_integral else "double").alias("dst_kind"),
                F.lit(None).cast("long").alias("dst_id"),
                F.lit(None).cast("string").alias("dst_str"),
                (F.col(c).cast("double") if not is_integral else F.lit(None).cast("double")).alias("dst_dbl"),
                (F.col(c).cast("long") if is_integral else F.lit(None).cast("long")).alias("dst_lng"),
                F.lit(None).cast("date").alias("dst_dt"),
            ).where(F.col(c).isNotNull()))
        for c in date_cols:
            parts.append(df.select(
                F.col(id_col).cast("long").alias("src"), F.lit(c).alias("label"),
                F.lit("date").alias("dst_kind"), F.lit(None).cast("long").alias("dst_id"),
                F.lit(None).cast("string").alias("dst_str"),
                F.lit(None).cast("double").alias("dst_dbl"),
                F.lit(None).cast("long").alias("dst_lng"),
                F.col(c).cast("date").alias("dst_dt"),
            ).where(F.col("dst_dt").isNotNull()))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ---------------------------------------------------------------- helpers
    def _expand_labels(self, keys: tuple[str, ...], ontology: bool = False) -> set[str]:
        desc = self._ont_desc if ontology else self._prop_desc
        out: set[str] = set()
        for k in keys:
            out |= desc.get(k, {k}) | {k}
        return out

    def _edges_for(self, keys: tuple[str, ...],
                   frame: DataFrame | None = None) -> DataFrame:
        e = self.edges if frame is None else frame
        if keys:
            e = e.where(F.col("label").isin(sorted(self._expand_labels(keys))))
        return e

    # ----------------------------------------------------------------- scans
    def N(self, track_paths: bool = False) -> "Traversal":
        """Scan all nodes — reference ``N`` (``SyncGuide.scala:59-89``)."""
        df = self.vertices.select(
            F.lit("node").alias("_kind"),
            F.col("id").alias("_id"),
            _null("_str"), _null("_dbl"), _null("_lng"), _null("_dt"),
        )
        if track_paths:
            df = df.withColumn("_path", F.array(F.col("_id")))
        return Traversal(self, df)

    def E(self, *keys: str) -> "Traversal":
        """Scan all edges — reference ``E`` (``SyncGuide.scala:90-119``)."""
        e = self._edges_for(keys)
        df = e.select(
            F.lit("edge").alias("_kind"),
            F.col("edge_id").alias("_id"),
            _null("_str"), _null("_dbl"), _null("_lng"), _null("_dt"),
            F.col("src").alias("_e_src"), F.col("label").alias("_e_label"),
            F.col("dst_kind").alias("_e_dst_kind"), F.col("dst_id").alias("_e_dst_id"),
            F.col("dst_str").alias("_e_dst_str"), F.col("dst_dbl").alias("_e_dst_dbl"),
            F.col("dst_lng").alias("_e_dst_lng"), F.col("dst_dt").alias("_e_dst_dt"),
            *[F.col(c).alias(f"_e_meta_{c}") for c in self._meta_cols],
        )
        return Traversal(self, df)

    def R(self) -> "Traversal":
        """Scan ALL resources — nodes ∪ edges ∪ values. Reference ``R``
        (``step/R.scala:38``) exists in the model but is UNWIRED in its
        local guides (commented out of the DSL, ``Traversal.scala:105-107``);
        the relational encoding makes it a trivial union of the three scans
        (edge-focus columns null for non-edges)."""
        n, e, v = self.N().df, self.E().df, self.V().df
        out = n.unionByName(e, allowMissingColumns=True).unionByName(
            v, allowMissingColumns=True
        )
        return Traversal(self, out)

    def V(self) -> "Traversal":
        """Scan all distinct literal values — reference ``V``
        (``SyncGuide.scala:120-149``); dedup mirrors value-identity
        (``structure/Values.scala:104-117``)."""
        e = self.edges.where(F.col("dst_kind") != "node")
        df = e.select(
            F.col("dst_kind").alias("_kind"),
            _null("_id"),
            F.col("dst_str").alias("_str"), F.col("dst_dbl").alias("_dbl"),
            F.col("dst_lng").alias("_lng"), F.col("dst_dt").alias("_dt"),
        ).distinct()
        return Traversal(self, df)


def _num(col_dbl: Column, col_lng: Column) -> Column:
    return F.coalesce(col_dbl, col_lng.cast("double"))


class Traversal:
    """Immutable step chain; each method returns a new Traversal (the lazy
    logical plan — reference ``Traversal.scala:116-120``)."""

    def __init__(self, graph: Graph, df: DataFrame, scope: list[str] | None = None,
                 small: bool = False):
        self.graph = graph
        self.df = df
        self.scope = list(scope or [])
        # "traverser set is small" fact — see hint_small()
        self.small = small

    def _with(self, df: DataFrame, scope: list[str] | None = None) -> "Traversal":
        return Traversal(self.graph, df, self.scope if scope is None else scope,
                         small=self.small)

    def hint_small(self, small: bool = True) -> "Traversal":
        """Declare the CURRENT traverser set small enough to broadcast
        (sticky until cleared). Moves then BROADCAST the traverser side of
        the edge join instead of shuffling both sides — which sidesteps
        edge-side join-key skew entirely: a celebrity vertex owning 25% of
        all edges puts those rows in ONE task under any shuffle join
        (AQE skew-split covers sort-merge, and not this), but under a
        broadcast probe the celebrity's edges stay spread across the
        scan's balanced file splits. Catalyst cannot infer this on its own
        (frontier DataFrames come out of checkpoints/shuffles with no
        usable size stats). ``repeat`` sets it adaptively from the
        materialized per-round frontier count. Measured A/B + plan pin:
        BENCH/skew_frontier_ab.json, tests/test_plans.py."""
        t = self._with(self.df)
        t.small = small
        return t

    @property
    def _carry(self) -> list[str]:
        return [c for c in self.df.columns if c not in FOCUS]

    # ------------------------------------------------------------- sub-trav
    def _tagged(self) -> "Traversal":
        """Assign a deterministic per-row correlation key ``_tid``.

        ``xxhash64`` over all columns, disambiguated (exact-duplicate rows
        and hash collisions) by a row_number over a window PARTITIONED BY
        the hash — partitions are O(duplicates) rows, so the assignment is
        fully distributed. The round-1 formulation (row_number over an
        unpartitioned ``Window.orderBy(*all)``) funneled every correlated
        sub-traversal through a single task — a scalability ceiling, not a
        correctness issue. _tid is a (h, r) struct: joinable, groupable,
        orderable (deterministic tie-break), never user-visible.
        """
        if "_tid" in self.df.columns:
            return self
        cols = list(self.df.columns)
        h = F.xxhash64(*[F.col(c) for c in cols])
        w = Window.partitionBy("__tid_h").orderBy(*[F.col(c) for c in cols])
        df = (
            self.df.withColumn("__tid_h", h)
            .withColumn(
                "_tid",
                F.struct(
                    F.col("__tid_h").alias("h"),
                    F.row_number().over(w).alias("r"),
                ),
            )
            .drop("__tid_h")
        )
        return self._with(df)

    def _apply_sub(self, fn: Callable[["Traversal"], "Traversal"]) -> DataFrame:
        """Run ``fn`` seeded from this traversal with per-traverser scope."""
        seeded = self._tagged()
        sub = Traversal(self.graph, seeded.df, seeded.scope + ["_tid"])
        return fn(sub).df

    # ---------------------------------------------------------------- moves
    def _move(self, keys: tuple[str, ...], to_edge: bool, reverse: bool) -> "Traversal":
        g = self.graph
        # reverse moves on a link graph (every edge targets a node) with a
        # dst-keyed companion table available: equi-join that copy on dst_id
        # — its bucketing survives the projection, so the edge side needs no
        # exchange (the reference's edgesByTo index, CassandraGraphTables
        # .scala:7-21; plan-pinned in tests/test_plans.py)
        by_dst = reverse and g._all_node_dst and g.edges_by_dst is not None
        e = g._edges_for(keys, frame=g.edges_by_dst if by_dst else None)
        pre = [F.col(c).alias(f"__e_{c}") for c in e.columns]
        e = e.select(*pre)
        # forward moves start from nodes OR edges — an edge-focused row's
        # edge_id may itself anchor edges (statement-about-statement,
        # reference SampleGraph.scala:116 `_name --- "timestamp" --> 5L`;
        # meta-edge rows carry the base edge's `edge_id()` as their `src`,
        # and since meta-edges are ordinary edge rows the reification
        # chains to any depth). The by_dst reverse path keeps nodes only —
        # every edge in that mode targets a node (all_node_dst), and a
        # bare `_id` equi-join would otherwise let an edge-focused row's
        # edge_id hash spuriously match a node id (the struct join
        # excluded those via `_kind`)
        cur = (
            self.df.where(F.col("_kind").isin("node", "edge"))
            if not reverse
            else (self.df.where(F.col("_kind") == "node") if by_dst else self.df)
        )
        # a new move invalidates edge focus + ordering
        drop = [c for c in cur.columns if c.startswith("_e_") or c == "_ord"]
        cur = cur.drop(*drop)
        carry = [c for c in cur.columns if c not in FOCUS]

        if not reverse:
            cond = cur["_id"] == e["__e_src"]
        elif by_dst:
            cond = cur["_id"] == e["__e_dst_id"]
        else:
            # reverse move: match the edge's typed destination against the
            # current resource (node id or literal value) — one null-safe
            # struct equi-join (hash join; the Cassandra provider's
            # edgesByTo/edgesByToAndKey tables are this join's index,
            # store/cassandra/.../CassandraGraphTables.scala:7-21)
            left_m = F.struct(
                F.col("_kind").alias("k"), F.col("_id").alias("i"),
                F.col("_str").alias("s"), F.col("_dbl").alias("d"),
                F.col("_lng").alias("l"), F.col("_dt").alias("t"),
            )
            right_m = F.struct(
                F.col("__e_dst_kind").alias("k"), F.col("__e_dst_id").alias("i"),
                F.col("__e_dst_str").alias("s"), F.col("__e_dst_dbl").alias("d"),
                F.col("__e_dst_lng").alias("l"), F.col("__e_dst_dt").alias("t"),
            )
            cur = cur.withColumn("__m", left_m)
            e = e.withColumn("__m", right_m)
            cond = cur["__m"].eqNullSafe(e["__m"])

        # small traverser set → broadcast it (skew-immune edge probe;
        # see hint_small); otherwise let Catalyst/AQE pick
        j = (F.broadcast(cur) if self.small else cur).join(e, cond, "inner")
        if to_edge:
            sel = [
                F.lit("edge").alias("_kind"), F.col("__e_edge_id").alias("_id"),
                _null("_str"), _null("_dbl"), _null("_lng"), _null("_dt"),
                F.col("__e_src").alias("_e_src"), F.col("__e_label").alias("_e_label"),
                F.col("__e_dst_kind").alias("_e_dst_kind"),
                F.col("__e_dst_id").alias("_e_dst_id"),
                F.col("__e_dst_str").alias("_e_dst_str"),
                F.col("__e_dst_dbl").alias("_e_dst_dbl"),
                F.col("__e_dst_lng").alias("_e_dst_lng"),
                F.col("__e_dst_dt").alias("_e_dst_dt"),
                *[F.col(f"__e_{c}").alias(f"_e_meta_{c}") for c in self.graph._meta_cols],
            ]
        elif not reverse:
            sel = [
                F.when(F.col("__e_dst_kind") == "node", F.lit("node"))
                .otherwise(F.col("__e_dst_kind")).alias("_kind"),
                F.col("__e_dst_id").alias("_id"),
                F.col("__e_dst_str").alias("_str"), F.col("__e_dst_dbl").alias("_dbl"),
                F.col("__e_dst_lng").alias("_lng"), F.col("__e_dst_dt").alias("_dt"),
            ]
        else:
            sel = [
                F.lit("node").alias("_kind"), F.col("__e_src").alias("_id"),
                _null("_str"), _null("_dbl"), _null("_lng"), _null("_dt"),
            ]
        out = j.select(*sel, *[cur[c] for c in carry if not c.startswith("__m")])
        if "_path" in out.columns and not to_edge:
            nid = F.col("_id")
            out = out.withColumn(
                "_path",
                F.when(F.col("_kind") == "node", F.concat(F.col("_path"), F.array(nid)))
                .otherwise(F.col("_path")),
            )
        return self._with(out)

    def out(self, *keys: str) -> "Traversal":
        """Forward hop — reference ``Out`` (``SyncGuide.scala:191-199``)."""
        return self._move(keys, to_edge=False, reverse=False)

    def out_e(self, *keys: str) -> "Traversal":
        """Hop onto the outgoing edge — ``OutE`` (``SyncGuide.scala:200-208``)."""
        return self._move(keys, to_edge=True, reverse=False)

    def in_(self, *keys: str) -> "Traversal":
        """Reverse hop — ``In`` (``SyncGuide.scala:209-217``)."""
        return self._move(keys, to_edge=False, reverse=True)

    def in_e(self, *keys: str) -> "Traversal":
        """Hop onto the incoming edge — ``InE`` (``SyncGuide.scala:218-226``)."""
        return self._move(keys, to_edge=True, reverse=True)

    def from_(self) -> "Traversal":
        """Edge → source node — ``From`` (``SyncGuide.scala:166-173``)."""
        df = self.df.where(F.col("_kind") == "edge")
        keep = [c for c in df.columns if not c.startswith("_e_") and c not in FOCUS and c != "_ord"]
        out = df.select(
            F.lit("node").alias("_kind"), F.col("_e_src").alias("_id"),
            _null("_str"), _null("_dbl"), _null("_lng"), _null("_dt"), *keep,
        )
        return self._with(out)

    def to_(self) -> "Traversal":
        """Edge → target resource — ``To`` (``SyncGuide.scala:174-181``)."""
        df = self.df.where(F.col("_kind") == "edge")
        keep = [c for c in df.columns if not c.startswith("_e_") and c not in FOCUS and c != "_ord"]
        out = df.select(
            F.when(F.col("_e_dst_kind") == "node", F.lit("node"))
            .otherwise(F.col("_e_dst_kind")).alias("_kind"),
            F.col("_e_dst_id").alias("_id"),
            F.col("_e_dst_str").alias("_str"), F.col("_e_dst_dbl").alias("_dbl"),
            F.col("_e_dst_lng").alias("_lng"), F.col("_e_dst_dt").alias("_dt"),
            *keep,
        )
        return self._with(out)

    def label(self) -> "Traversal":
        """Resource → its labels as string values — ``Label``
        (``SyncGuide.scala:227-235``)."""
        df = self.df
        carry = [c for c in df.columns if c not in FOCUS and not c.startswith("_e_")]
        nodes = (
            df.where(F.col("_kind") == "node")
            .join(self.graph.vertices.select(F.col("id").alias("__vid"), F.col("labels").alias("__lb")),
                  F.col("_id") == F.col("__vid"), "inner")
            .select(F.explode("__lb").alias("__l"), *carry)
        )
        if "_e_label" in df.columns:
            edges = df.where(F.col("_kind") == "edge").select(
                F.col("_e_label").alias("__l"), *carry
            )
            u = nodes.unionByName(edges)
        else:
            u = nodes
        out = u.select(
            F.lit("string").alias("_kind"), _null("_id"),
            F.col("__l").alias("_str"), _null("_dbl"), _null("_lng"), _null("_dt"),
            *carry,
        )
        return self._with(out)

    def iri(self) -> "Traversal":
        """Node → IRI string (reference sugar ``.iri``,
        ``Traversal.scala:443-445``)."""
        v = self.graph.vertices.select(F.col("id").alias("__vid"), F.col("iri").alias("__iri"))
        df = self.df.where(F.col("_kind") == "node").join(
            v, F.col("_id") == F.col("__vid"), "inner"
        )
        carry = [c for c in self.df.columns if c not in FOCUS]
        out = df.select(
            F.lit("string").alias("_kind"), _null("_id"),
            F.col("__iri").alias("_str"), _null("_dbl"), _null("_lng"), _null("_dt"),
            *carry,
        )
        return self._with(out)

    def id_(self) -> "Traversal":
        """Resource → long id — ``Id`` (``SyncGuide.scala:160-165``)."""
        carry = self._carry
        out = self.df.select(
            F.lit("long").alias("_kind"), _null("_id"), _null("_str"),
            _null("_dbl"), F.col("_id").alias("_lng"), _null("_dt"), *carry,
        )
        return self._with(out)

    def constant(self, v: Any) -> "Traversal":
        """Replace value — ``Constant`` (``SyncGuide.scala:182-184``)."""
        fam = operand_family(v)
        kind = {"str": "string", "num": "double" if isinstance(v, float) else "long",
                "date": "date"}[fam]
        carry = self._carry
        out = self.df.select(
            F.lit(kind).alias("_kind"), _null("_id"),
            (F.lit(v) if kind == "string" else _null("_str")).alias("_str"),
            (F.lit(float(v)) if kind == "double" else _null("_dbl")).alias("_dbl"),
            (F.lit(int(v)) if kind == "long" else _null("_lng")).alias("_lng"),
            (F.lit(v) if kind == "date" else _null("_dt")).alias("_dt"),
            *carry,
        )
        return self._with(out)

    # -------------------------------------------------------------- filters
    def _pred_col(self, pred: Pred, prefix: str = "") -> Column:
        fam = pred.family.split(":")[0]
        cols = {
            "str": F.col(prefix + ("_str" if not prefix else "dst_str")),
            "num": _num(F.col(prefix + ("_dbl" if not prefix else "dst_dbl")),
                        F.col(prefix + ("_lng" if not prefix else "dst_lng"))),
            "date": F.col(prefix + ("_dt" if not prefix else "dst_dt")),
            "array": F.col(prefix + ("_str" if not prefix else "dst_str")),
        }
        return cols.get(fam, cols["str"])

    def has(self, key: str, pred: Pred | None = None) -> "Traversal":
        """Property-existence/predicate filter — ``Has``
        (``SyncGuide.scala:246-263``); left-semi against the edge table."""
        return self._has(key, pred, anti=False)

    def has_not(self, key: str, pred: Pred | None = None) -> "Traversal":
        """Negated ``Has`` — ``HasNot`` (``SyncGuide.scala:264-281``)."""
        return self._has(key, pred, anti=True)

    def _has(self, key: str, pred: Pred | None, anti: bool) -> "Traversal":
        meta = f"_e_meta_{key}"
        if meta in self.df.columns:
            # edge-focus metadata column (edges-on-edges as columns)
            cond = F.col(meta).isNotNull()
            if pred is not None:
                cond = cond & pred(F.col(meta))
            return self._with(self.df.where(~cond if anti else cond))
        e = self.graph._edges_for((key,))
        if pred is not None:
            # typed destination column chosen by the predicate operand family
            fam = pred.family.split(":")[0]
            col = {"str": F.col("dst_str"),
                   "num": _num(F.col("dst_dbl"), F.col("dst_lng")),
                   "date": F.col("dst_dt")}.get(fam, F.col("dst_str"))
            e = e.where(pred(col))
        e = e.select(F.col("src").alias("__hs")).distinct()
        how = "left_anti" if anti else "left_semi"
        out = self.df.join(e, self.df["_id"] == e["__hs"], how)
        return self._with(out)

    def has_id(self, *ids: int) -> "Traversal":
        """``HasId`` (``SyncGuide.scala:282-287``)."""
        return self._with(self.df.where(F.col("_id").isin(list(ids))))

    def has_iri(self, *iris: str) -> "Traversal":
        """``HasIri`` (``SyncGuide.scala:288-293``)."""
        v = self.graph.vertices.where(F.col("iri").isin(list(iris))).select(
            F.col("id").alias("__vid")
        )
        out = self.df.join(v, self.df["_id"] == v["__vid"], "left_semi")
        return self._with(out)

    def has_label(self, *labels: str) -> "Traversal":
        """Type/label filter — ``HasLabel`` (``SyncGuide.scala:294-299``),
        inheritance-aware via the precomputed closure."""
        kinds: set[str] = set()
        node_labels: set[str] = set()
        for lbl in labels:
            if lbl in _TYPE_KINDS:
                kinds |= set(_TYPE_KINDS[lbl])
            else:
                node_labels |= self.graph._expand_labels((lbl,), ontology=True)
        cond = F.lit(False)
        if kinds:
            cond = cond | F.col("_kind").isin(sorted(kinds))
        df = self.df
        if node_labels:
            v = self.graph.vertices.where(
                F.arrays_overlap(
                    F.col("labels"),
                    F.array(*[F.lit(x) for x in sorted(node_labels)]),
                )
            ).select(F.col("id").alias("__vl"))
            df = df.join(v, df["_id"] == v["__vl"], "left")
            cond = cond | ((F.col("_kind") == "node") & F.col("__vl").isNotNull())
            out = df.where(cond).drop("__vl")
        else:
            out = df.where(cond)
        return self._with(out)

    def is_(self, pred: Pred) -> "Traversal":
        """Predicate on the current value — ``Is`` (``SyncGuide.scala:360-368``)."""
        return self._with(self.df.where(pred(self._pred_col(pred))))

    def coin(self, p: float, seed: int = 42) -> "Traversal":
        """Seeded Bernoulli sample — ``Coin`` (``SyncGuide.scala:355-359``);
        the reference uses Math.random (its Coin.seed field is unused) — we
        make it deterministic by hashing the focus."""
        u = (F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in FOCUS]), F.lit(seed)),
                    F.lit(1 << 20)) / F.lit(float(1 << 20)))
        return self._with(self.df.where(u < F.lit(p)))

    def dedup(self) -> "Traversal":
        """Global distinct on value identity — ``Dedup``
        (``SyncGuide.scala:310-330``)."""
        keep = self.scope + FOCUS
        extra = [c for c in self.df.columns if c not in keep]
        if extra:
            return self._with(self.df.dropDuplicates(keep))
        return self._with(self.df.distinct())

    # --------------------------------------------- correlated sub-traversals
    def where(self, fn: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """Exists-subquery — ``Where`` (``SyncGuide.scala:343-348``) as a
        left-semi join on the correlation key."""
        seeded = self._tagged()
        sub = seeded._apply_sub(fn).select("_tid").distinct()
        return seeded._with(seeded.df.join(sub, "_tid", "left_semi"))

    def and_(self, *fns: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """All branches non-empty — ``And`` (``SyncGuide.scala:331-336``)."""
        t = self
        for fn in fns:
            t = t.where(fn)
        return t

    def or_(self, *fns: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """Any branch non-empty — ``Or`` (``SyncGuide.scala:337-342``)."""
        seeded = self._tagged()
        subs = [seeded._apply_sub(fn).select("_tid") for fn in fns]
        u = subs[0]
        for s in subs[1:]:
            u = u.unionByName(s)
        return seeded._with(seeded.df.join(u.distinct(), "_tid", "left_semi"))

    def not_(self, fn: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """Branch empty — ``Not`` (``SyncGuide.scala:349-354``): anti join."""
        seeded = self._tagged()
        sub = seeded._apply_sub(fn).select("_tid").distinct()
        return seeded._with(seeded.df.join(sub, "_tid", "left_anti"))

    def local(self, fn: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """Run sub-traversal per traverser with per-element barriers —
        ``Local`` (``SyncGuide.scala:510-515``): barriers inside the sub
        group on the correlation key instead of globally."""
        seeded = self._tagged()
        sub = Traversal(self.graph, seeded.df, seeded.scope + ["_tid"])
        res = fn(sub)
        out = res.df.drop("_ord")
        return Traversal(self.graph, out, self.scope)

    def union(self, *fns: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """Concatenate branch results, duplicates kept — ``Union``
        (``SyncGuide.scala:655-662``; UNION ALL semantics per
        ``AsyncGuideSpec.scala:693-702``)."""
        seeded = self._tagged()
        sub_seed = Traversal(self.graph, seeded.df, seeded.scope + ["_tid"])
        dfs = []
        for fn in fns:
            d = fn(sub_seed).df.drop("_ord")
            dfs.append(d)
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d, allowMissingColumns=True)
        return Traversal(self.graph, u, self.scope)

    def coalesce_(self, *fns: Callable[["Traversal"], "Traversal"]) -> "Traversal":
        """First non-empty branch per traverser — ``Coalesce``
        (``SyncGuide.scala:486-496``)."""
        seeded = self._tagged()
        sub_seed = Traversal(self.graph, seeded.df, seeded.scope + ["_tid"])
        dfs = []
        for i, fn in enumerate(fns):
            dfs.append(fn(sub_seed).df.drop("_ord").withColumn("_branch", F.lit(i)))
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d, allowMissingColumns=True)
        w = Window.partitionBy("_tid")
        u = u.withColumn("__minb", F.min("_branch").over(w))
        out = u.where(F.col("_branch") == F.col("__minb")).drop("_branch", "__minb")
        return Traversal(self.graph, out, self.scope)

    def choose(
        self,
        cond: Callable[["Traversal"], "Traversal"],
        right: Callable[["Traversal"], "Traversal"],
        left: Callable[["Traversal"], "Traversal"],
    ) -> "Traversal":
        """If/else on sub-traversal non-emptiness — ``Choose``
        (``SyncGuide.scala:497-509``)."""
        seeded = self._tagged()
        cond_tids = seeded._apply_sub(cond).select("_tid").distinct()
        yes = seeded._with(seeded.df.join(cond_tids, "_tid", "left_semi"))
        no = seeded._with(seeded.df.join(cond_tids, "_tid", "left_anti"))
        r = right(Traversal(self.graph, yes.df, seeded.scope + ["_tid"])).df
        l = left(Traversal(self.graph, no.df, seeded.scope + ["_tid"])).df
        return Traversal(self.graph, r.unionByName(l, allowMissingColumns=True),
                         self.scope)

    # -------------------------------------------------------------- barriers
    def _gb(self):
        return self.df.groupBy(*[F.col(c) for c in self.scope])

    def count(self) -> "Traversal":
        """``Count`` (``SyncGuide.scala:718-728``)."""
        agg = self._gb().agg(F.count(F.lit(1)).alias("__n"))
        out = agg.select(
            F.lit("long").alias("_kind"), _null("_id"), _null("_str"),
            _null("_dbl"), F.col("__n").alias("_lng"), _null("_dt"),
            *self.scope,
        )
        return self._with(out)

    def _numeric(self) -> Column:
        return _num(F.col("_dbl"), F.col("_lng"))

    def sum_(self) -> "Traversal":
        """``Sum`` (``SyncGuide.scala:756-775``)."""
        agg = self.df.groupBy(*self.scope).agg(F.sum(self._numeric()).alias("__s"))
        out = agg.select(
            F.lit("double").alias("_kind"), _null("_id"), _null("_str"),
            F.col("__s").alias("_dbl"), _null("_lng"), _null("_dt"), *self.scope,
        )
        return self._with(out)

    def mean(self) -> "Traversal":
        """``Mean`` (``SyncGuide.scala:735-755``)."""
        agg = self.df.groupBy(*self.scope).agg(F.avg(self._numeric()).alias("__m"))
        out = agg.select(
            F.lit("double").alias("_kind"), _null("_id"), _null("_str"),
            F.col("__m").alias("_dbl"), _null("_lng"), _null("_dt"), *self.scope,
        )
        return self._with(out)

    def _arg_extreme(self, desc: bool) -> "Traversal":
        """max/min are ARGMAX/ARGMIN — they return the extreme traverser
        itself (``SyncGuide.scala:421-458`` / ``382-420``), so ``.in_(...)``
        can walk back from the winning value."""
        val = F.coalesce(self._numeric().cast("string"), F.col("_str"),
                         F.col("_dt").cast("string"))
        num = self._numeric()
        order = [num.desc_nulls_last() if desc else num.asc_nulls_last(),
                 F.col("_str").desc() if desc else F.col("_str").asc(),
                 F.col("_dt").desc() if desc else F.col("_dt").asc()]
        w = Window.partitionBy(*self.scope).orderBy(*order) if self.scope else \
            Window.orderBy(*order)
        out = (
            self.df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        _ = val
        return self._with(out)

    def max_(self) -> "Traversal":
        return self._arg_extreme(desc=True)

    def min_(self) -> "Traversal":
        return self._arg_extreme(desc=False)

    # ------------------------------------------------------- order / clipping
    def order(
        self,
        by: Callable[["Traversal"], "Traversal"] | None = None,
        ascending: bool = True,
    ) -> "Traversal":
        """Global sort — ``Order`` (``SyncGuide.scala:790-887``). Sort key =
        first value of the by-traversal per traverser (min, deterministic).
        Materializes ``_ord`` so clip steps (limit/skip/range/tail) are
        order-aware. order().limit(k) ⇒ Spark TakeOrderedAndProject."""
        seeded = self._tagged()
        if by is not None:
            sub = seeded._apply_sub(by)
            keys = sub.groupBy("_tid").agg(
                F.min(_num(F.col("_dbl"), F.col("_lng"))).alias("__kn"),
                F.min("_str").alias("__ks"),
                F.min("_dt").alias("__kd"),
            )
            j = seeded.df.join(keys, "_tid", "inner")
        else:
            j = seeded.df.withColumn(
                "__kn", _num(F.col("_dbl"), F.col("_lng"))
            ).withColumn("__ks", F.col("_str")).withColumn("__kd", F.col("_dt"))
        cols = [F.col("__kn"), F.col("__ks"), F.col("__kd")]
        order = [c.asc_nulls_last() if ascending else c.desc_nulls_last() for c in cols]
        order += [F.col("_tid").asc()]  # stable tiebreak
        w = Window.partitionBy(*self.scope).orderBy(*order) if self.scope else \
            Window.orderBy(*order)
        out = (
            j.withColumn("_ord", F.row_number().over(w))
            .drop("__kn", "__ks", "__kd")
        )
        return self._with(out)

    def _ensure_ord(self) -> "Traversal":
        if "_ord" in self.df.columns:
            return self
        ocols = [F.col(c) for c in FOCUS]
        w = Window.partitionBy(*self.scope).orderBy(*ocols) if self.scope else \
            Window.orderBy(*ocols)
        return self._with(self.df.withColumn("_ord", F.row_number().over(w)))

    def limit(self, n: int) -> "Traversal":
        """``Limit`` (``SyncGuide.scala:465-467``)."""
        t = self._ensure_ord()
        return t._with(t.df.where(F.col("_ord") <= n))

    def skip(self, n: int) -> "Traversal":
        """``Skip`` (``SyncGuide.scala:468-470``)."""
        t = self._ensure_ord()
        return t._with(t.df.where(F.col("_ord") > n))

    def range_(self, lo: int, hi: int) -> "Traversal":
        """Rows [lo..hi], 1-based inclusive — ``Range``
        (``SyncGuide.scala:471-473`` ``slice(low-1, high)``)."""
        t = self._ensure_ord()
        return t._with(t.df.where((F.col("_ord") >= lo) & (F.col("_ord") <= hi)))

    def tail(self, n: int) -> "Traversal":
        """``Tail`` (``SyncGuide.scala:474-476``)."""
        t = self._ensure_ord()
        w = Window.partitionBy(*self.scope) if self.scope else Window.partitionBy()
        df = t.df.withColumn("__mx", F.max("_ord").over(w))
        return t._with(df.where(F.col("_ord") > F.col("__mx") - n).drop("__mx"))

    def head(self) -> "Traversal":
        """``Head`` (``SyncGuide.scala:376-378``)."""
        return self.limit(1)

    def last(self) -> "Traversal":
        """``Last`` (``SyncGuide.scala:379-381``)."""
        return self.tail(1)

    # --------------------------------------------------------------- repeat
    def repeat(
        self,
        body: Callable[["Traversal"], "Traversal"],
        max_loops: int | None = None,
        until: Callable[["Traversal"], "Traversal"] | None = None,
        collect: bool = False,
        noloop: bool = False,
        broadcast_frontier_rows: int = 500_000,
    ) -> "Traversal":
        """Iterative expansion — ``Repeat`` (``SyncGuide.scala:516-654``),
        the superstep primitive, as a driver loop of DataFrame jobs.

        Semantics verified against the reference's golden tests
        (``AsyncGuideSpec.scala:953-1017``): with ``max_loops=m`` the body
        runs m+1 times; ``until`` (non-empty sub-traversal) exits+emits a
        traverser between rounds; ``collect`` emits every round's frontier;
        ``noloop`` kills traversers revisiting a node on their own path
        (requires path tracking; auto-enabled). Each round is
        localCheckpoint-ed to cut iterative lineage (SURVEY §4.2.1); the
        unbounded default cap mirrors the reference's max-depth guard
        (``SyncGuide.scala:569,582``).

        ``broadcast_frontier_rows``: per-round adaptive skew strategy — the
        frontier is checkpointed anyway, so its exact row count is cheap;
        below the threshold the next round's moves broadcast the frontier
        (``hint_small``), which keeps a celebrity vertex's edge block
        spread across the scan's file splits instead of funneling it into
        one shuffle task. 0 disables. 500k rows ≈ tens of MB of focus
        columns — well inside executor broadcast budgets at cluster scale.
        """
        iters = (max_loops + 1) if max_loops is not None else 20
        frontier = self.df
        frontier_small = self.small
        if noloop and "_path" not in frontier.columns:
            frontier = frontier.withColumn(
                "_path",
                F.when(F.col("_kind") == "node", F.array(F.col("_id")))
                .otherwise(F.array().cast("array<long>")),
            )
        emitted: list[DataFrame] = []
        for _ in range(iters):
            cur = Traversal(self.graph, frontier, self.scope,
                            small=frontier_small)
            nxt = body(cur).df
            if noloop:
                # _path already includes the new node: revisit ⇔ it appears earlier
                dup = F.array_contains(
                    F.slice(F.col("_path"), 1, F.greatest(F.size("_path") - 1, F.lit(0))),
                    F.col("_id"),
                )
                nxt = nxt.where((F.col("_kind") != "node") | ~dup)
            nxt = nxt.localCheckpoint(eager=True).transform(strip_plan_stats)
            if until is not None:
                t = Traversal(self.graph, nxt, self.scope)._tagged()
                sat = t._apply_sub(until).select("_tid").distinct()
                stop = t.df.join(sat, "_tid", "left_semi").drop("_tid")
                go = t.df.join(sat, "_tid", "left_anti").drop("_tid")
                emitted.append(nxt if collect else stop)
                frontier = go
            else:
                if collect:
                    emitted.append(nxt)
                frontier = nxt
            # the frontier is checkpointed — an exact count is one cheap
            # metadata-ish job and feeds both the stop check and the
            # adaptive broadcast decision
            n_frontier = frontier.count()
            if n_frontier == 0:
                break
            frontier_small = (
                0 < broadcast_frontier_rows and
                n_frontier <= broadcast_frontier_rows
            )
        if not collect:
            emitted.append(frontier)
        out = emitted[0]
        for d in emitted[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return self._with(out)

    # ---------------------------------------------------------- projections
    def as_(self, name: str) -> "Traversal":
        """Label the current position — ``As`` (``SyncGuide.scala:1050-1087``)."""
        df = self.df
        for c in FOCUS:
            df = df.withColumn(f"_as_{name}__{c}", F.col(c))
        return self._with(df)

    def select(self, name: str) -> "Traversal":
        """Re-focus on a labeled position — ``Select``."""
        df = self.df
        for c in FOCUS:
            df = df.withColumn(c, F.col(f"_as_{name}__{c}"))
        return self._with(df)

    def path(
        self, by: Callable[["Traversal"], "Traversal"] | None = None
    ) -> DataFrame:
        """Terminal: per-traverser node path — ``Path``
        (``SyncGuide.scala:952-975``). Returns ``path: array<long>`` plus,
        with ``by``, ``mapped: array<array<string>>`` (the by-traversal run
        over every path element, order-preserving). Path tracking must be on
        (``N(track_paths=True)``) — the reference also pays the cost only
        when the query demands it."""
        if "_path" not in self.df.columns:
            raise ValueError("path tracking not enabled; seed with N(track_paths=True)")
        if by is None:
            return self.df.select(F.col("_path").alias("path"))
        t = self._tagged()
        ex = t.df.select(
            "_tid", F.posexplode("_path").alias("__pos", "__pid")
        )
        seed = ex.select(
            F.lit("node").alias("_kind"), F.col("__pid").alias("_id"),
            _null("_str"), _null("_dbl"), _null("_lng"), _null("_dt"),
            "_tid", "__pos",
        )
        sub = by(Traversal(self.graph, seed, ["_tid", "__pos"]))
        per_elem = sub.df.groupBy("_tid", "__pos").agg(
            F.sort_array(F.collect_list(value_column())).alias("__vals")
        )
        base = ex.select("_tid", "__pos").distinct().join(
            per_elem, ["_tid", "__pos"], "left"
        ).select(
            "_tid", "__pos",
            F.coalesce(F.col("__vals"), F.array().cast("array<string>")).alias("__vals"),
        )
        mapped = base.groupBy("_tid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__vals"))),
                lambda s: s["__vals"],
            ).alias("mapped")
        )
        return t.df.select("_tid", F.col("_path").alias("path")).join(
            mapped, "_tid", "left"
        ).drop("_tid")

    def project(
        self, *fns: Callable[["Traversal"], "Traversal"], names: list[str] | None = None
    ) -> DataFrame:
        """Terminal: per-traverser tuple of sub-traversal results —
        ``Project`` (``SyncGuide.scala:985-1047``). Each projection is the
        sorted collected values (as strings) of its sub-traversal."""
        t = self._tagged()
        names = names or [f"p{i}" for i in range(len(fns))]
        out = t.df.select("_tid", *[c for c in t.df.columns if c in FOCUS])
        for fn, nm in zip(fns, names):
            sub = t._apply_sub(fn)
            agg = sub.groupBy("_tid").agg(
                F.sort_array(F.collect_list(value_column())).alias(nm)
            )
            out = out.join(agg, "_tid", "left").withColumn(
                nm, F.coalesce(F.col(nm), F.array().cast("array<string>"))
            )
        return out.drop(*FOCUS, "_tid")

    def group(
        self,
        by: Callable[["Traversal"], "Traversal"],
        value: Callable[["Traversal"], "Traversal"] | None = None,
    ) -> DataFrame:
        """Terminal: group traversers by the by-traversal's result —
        ``Group`` (``SyncGuide.scala:667-716``). Returns ``(key, …)`` where
        key = sorted collected by-values (string). With ``value``, the
        value-traversal runs per bucket (barriers scoped per key), yielding
        one row per (key, value-row)."""
        t = self._tagged()
        keys = t._apply_sub(by).groupBy("_tid").agg(
            F.array_join(F.sort_array(F.collect_list(value_column())), "|").alias("_gkey")
        )
        tagged = t.df.join(keys, "_tid", "inner")
        if value is None:
            return tagged.groupBy("_gkey").agg(
                F.sort_array(F.collect_list(value_column())).alias("values")
            ).withColumnRenamed("_gkey", "key")
        sub = Traversal(self.graph, tagged, ["_gkey"])
        res = value(sub)
        out = res.df.withColumnRenamed("_gkey", "key")
        return out.select("key", value_column().alias("value"))

    def out_map(self, *keys: str) -> DataFrame:
        """Terminal: neighbors grouped by edge label — ``OutMap``
        (``SyncGuide.scala:896-948``): ``(id, m: map<label, array<value>>)``."""
        e = self.graph._edges_for(keys)
        cur = self.df.where(F.col("_kind") == "node").select(F.col("_id")).distinct()
        j = cur.join(e, cur["_id"] == e["src"], "inner")
        val = F.coalesce(
            F.col("dst_str"), F.col("dst_dbl").cast("string"),
            F.col("dst_lng").cast("string"), F.col("dst_dt").cast("string"),
            F.col("dst_id").cast("string"),
        )
        per_label = j.groupBy("_id", "label").agg(
            F.sort_array(F.collect_list(val)).alias("vals")
        )
        return per_label.groupBy("_id").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("label", "vals")))
            ).alias("m")
        ).withColumnRenamed("_id", "id")

    def in_map(self, *keys: str) -> DataFrame:
        """``InMap`` — reverse neighbors grouped by label (node focus)."""
        e = self.graph._edges_for(keys).where(F.col("dst_kind") == "node")
        cur = self.df.where(F.col("_kind") == "node").select(F.col("_id")).distinct()
        j = cur.join(e, cur["_id"] == e["dst_id"], "inner")
        per_label = j.groupBy("_id", "label").agg(
            F.sort_array(F.collect_list(F.col("src").cast("string"))).alias("vals")
        )
        return per_label.groupBy("_id").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("label", "vals")))
            ).alias("m")
        ).withColumnRenamed("_id", "id")

    def out_e_map(self, *keys: str) -> DataFrame:
        """``OutEMap`` (``step/OutEMap.scala:33``, exec
        ``SyncGuide.scala:896-948``): outgoing EDGES grouped by edge label —
        ``(id, m: map<label, array<edge_id>>)``. The edge-focused sibling of
        ``out_map`` (which groups the *destinations*)."""
        e = self.graph._edges_for(keys)
        cur = self.df.where(F.col("_kind") == "node").select(F.col("_id")).distinct()
        j = cur.join(e, cur["_id"] == e["src"], "inner")
        per_label = j.groupBy("_id", "label").agg(
            F.sort_array(F.collect_list(F.col("edge_id"))).alias("eids")
        )
        return per_label.groupBy("_id").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("label", "eids")))
            ).alias("m")
        ).withColumnRenamed("_id", "id")

    def in_e_map(self, *keys: str) -> DataFrame:
        """``InEMap`` (``step/InEMap.scala:32``) — incoming edges grouped by
        label per node: ``(id, m: map<label, array<edge_id>>)``."""
        e = self.graph._edges_for(keys).where(F.col("dst_kind") == "node")
        cur = self.df.where(F.col("_kind") == "node").select(F.col("_id")).distinct()
        j = cur.join(e, cur["_id"] == e["dst_id"], "inner")
        per_label = j.groupBy("_id", "label").agg(
            F.sort_array(F.collect_list(F.col("edge_id"))).alias("eids")
        )
        return per_label.groupBy("_id").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("label", "eids")))
            ).alias("m")
        ).withColumnRenamed("_id", "id")

    # -------------------------------------------------------------- terminals
    def to_df(self) -> DataFrame:
        """The traverser stream as a DataFrame (focus + scope columns)."""
        return self.df

    def values(self) -> list:
        """Collect typed python values (reference ``toValue`` unboxing,
        ``Guide.scala:152-182``)."""
        order = [F.col("_ord").asc()] if "_ord" in self.df.columns else \
            [F.col(c) for c in FOCUS]
        rows = self.df.orderBy(*order).collect()
        out = []
        for r in rows:
            k = r["_kind"]
            if k == "node" or k == "edge":
                out.append(("node" if k == "node" else "edge", r["_id"]))
            elif k == "string":
                out.append(r["_str"])
            elif k == "double":
                out.append(r["_dbl"])
            elif k == "long":
                out.append(r["_lng"])
            elif k == "date":
                out.append(r["_dt"])
            else:
                out.append(None)
        return out

    def value_set(self) -> set:
        return set(self.values())

    def head_value(self) -> Any:
        vs = self.values()
        return vs[0] if vs else None

    def count_value(self) -> int:
        return int(self.count().values()[0])
