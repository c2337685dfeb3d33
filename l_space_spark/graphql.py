"""GraphQL → traversal front end — the reference's declarative text query.

Re-expresses L-space's GraphQL subset (``core/shared/src/main/scala/lspace/
graphql/Query.scala:16-36``, ``Projection.scala:19-46``, parser
``parse/core/.../codec/graphql/Decoder.scala:33-90``) over the DataFrame
traversal DSL:

- ``{ name description }``            → per-node projection of property values
- ``{ alias: field }``                → aliased projection column
- ``{ knows { name } }``              → nested projection; flattened to one
  column per LEAF path (``knows_name`` = collected names of known nodes) —
  the relational collapse of the reference's nested-tuple output, consistent
  with SURVEY §1.1's edge-row encoding
- ``{ field(prop: "v") ... }``        → ``has(prop, P.eqv(v))`` applied
  BEFORE the field's move (``Projection.scala:34-36``)
- ``{ _(prop: "v") { ... } }``        → query-level ``has`` filter on the
  start nodes (``Query.scala:26-28``)
- ``{ _(limit: n, offset: m) {...} }``→ query-level clipping
  (``Query.scala:29-34``); applied to the traverser stream (1:1 with
  projected rows, deterministic via the DSL's ``_ord``)

A context dict maps field names to properties, like the reference's
ActiveContext (``Decoder.scala:64-70``): ``{"knows": {"property":
"knows", "reverse": True}}`` gives ``@reverse`` (``in_`` instead of
``out``) and aliasing of wire names onto property labels.

- ``{ knows(limit: n, offset: m) {...} }`` → projection-level clipping
  (``Projection.scala:19-46`` parses these): the hop's reached resources
  are clipped PER TRAVERSER before deeper hops. The DSL's clip steps
  window-partition by the sub-traversal scope (which includes ``_tid``
  inside a projection), so ``limit``/``skip``/``range_`` apply per start
  node, deterministically ordered by the resource's typed identity.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame

from .functions.predicates import P

_IGNORABLE = set(" ,\t\n\r")
_STOPPERS = set(":{}()") | _IGNORABLE


@dataclass
class Projection:
    field: str
    alias: str
    parameters: list[tuple[str, Any]] = dc_field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    projections: list["Projection"] = dc_field(default_factory=list)


@dataclass
class Query:
    projections: list[Projection]
    parameters: list[tuple[str, Any]] = dc_field(default_factory=list)
    limit: int | None = None
    offset: int | None = None


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in _IGNORABLE:
        i += 1
    return i


def _read_token(s: str, i: int) -> tuple[str, int]:
    j = i
    while j < len(s) and s[j] not in _STOPPERS:
        j += 1
    return s[i:j], j


def _convert(v: str) -> Any:
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v in ("true", "false"):
        return v == "true"
    return v


def _parse_args(s: str, i: int) -> tuple[list[tuple[str, Any]], int]:
    """After '(' — list of (key, value); strings quoted with \" or \"\"\"."""
    out: list[tuple[str, Any]] = []
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise ValueError("unterminated argument list")
        if s[i] == ")":
            return out, i + 1
        key, i = _read_token(s, i)
        i = _skip_ws(s, i)
        if i >= len(s) or s[i] != ":":
            raise ValueError(f"expected ':' after argument {key!r}")
        i = _skip_ws(s, i + 1)
        if s.startswith('"""', i):
            end = s.find('"""', i + 3)
            if end < 0:
                raise ValueError("unterminated block string")
            val: Any = s[i + 3:end]
            i = end + 3
        elif s[i] == '"':
            end = s.find('"', i + 1)
            if end < 0:
                raise ValueError("unterminated string")
            val = s[i + 1:end]
            i = end + 1
        else:
            raw, i = _read_token(s, i)
            val = _convert(raw)
        out.append((key, val))


def _split_clip(
    args: list[tuple[str, Any]],
) -> tuple[list[tuple[str, Any]], int | None, int | None]:
    params, limit, offset = [], None, None
    for k, v in args:
        if k == "limit":
            limit = int(v)
        elif k == "offset":
            offset = int(v)
        else:
            params.append((k, v))
    return params, limit, offset


def _parse_projections(s: str, i: int) -> tuple[list[Projection], int]:
    """After '{' — projections until the matching '}' (consumed)."""
    out: list[Projection] = []
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise ValueError("unterminated selection set")
        if s[i] == "}":
            return out, i + 1
        name, i = _read_token(s, i)
        if not name:
            raise ValueError(f"expected field name at offset {i}")
        i = _skip_ws(s, i)
        alias = name
        if i < len(s) and s[i] == ":":  # alias: field
            i = _skip_ws(s, i + 1)
            name, i = _read_token(s, i)
            i = _skip_ws(s, i)
        p = Projection(field=name, alias=alias)
        if i < len(s) and s[i] == "(":
            args, i = _parse_args(s, i + 1)
            p.parameters, p.limit, p.offset = _split_clip(args)
            i = _skip_ws(s, i)
        if i < len(s) and s[i] == "{":
            p.projections, i = _parse_projections(s, i + 1)
        out.append(p)


def parse_graphql(text: str) -> Query:
    """The reference Decoder's subset: ``{ [_(args)] projections }``."""
    i = _skip_ws(text, 0)
    if i >= len(text) or text[i] != "{":
        raise ValueError("graphql query must start with '{'")
    i = _skip_ws(text, i + 1)
    params: list[tuple[str, Any]] = []
    limit = offset = None
    if text.startswith("_", i):
        j = _skip_ws(text, i + 1)
        if j < len(text) and text[j] == "(":
            args, j = _parse_args(text, j + 1)
            params, limit, offset = _split_clip(args)
            j = _skip_ws(text, j)
            if j >= len(text) or text[j] != "{":
                raise ValueError("expected selection set after _() arguments")
            projections, j = _parse_projections(text, j + 1)
            j = _skip_ws(text, j)
            if j >= len(text) or text[j] != "}":
                raise ValueError("expected closing '}'")
            if not projections:
                raise ValueError("empty graphql object")
            return Query(projections, params, limit, offset)
    projections, i = _parse_projections(text, i)
    if not projections:
        raise ValueError("empty graphql object")
    return Query(projections)


def _resolve(field: str, context: dict | None) -> tuple[str, bool]:
    d = (context or {}).get(field)
    if d is None:
        return field, False
    return d.get("property", field), bool(d.get("reverse", False))


def _leaf_paths(
    p: Projection, context: dict | None,
) -> list[tuple[str, list[Projection]]]:
    """Flatten nested projections to (column_name, [chain of projections])
    — one output column per leaf field path."""
    if not p.projections:
        return [(p.alias, [p])]
    out = []
    for child in p.projections:
        for name, chain in _leaf_paths(child, context):
            out.append((f"{p.alias}_{name}", [p] + chain))
    return out


def _clip(t, limit: int | None, offset: int | None):
    """limit/offset → the DSL's range_/limit/skip (1-based inclusive range)."""
    if limit is not None and offset is not None:
        return t.range_(offset + 1, offset + limit)
    if limit is not None:
        return t.limit(limit)
    if offset is not None:
        return t.skip(offset)
    return t


def graphql_to_dataframe(graph, text: str,
                         context: dict | None = None) -> DataFrame:
    """Compile + run a GraphQL query against a ``traversal.Graph``.

    Output: one row per start node surviving the query-level filters and
    clipping; one array<string> column per leaf projection path (sorted
    collected values — the ``project`` terminal's shape)."""
    query = parse_graphql(text)
    t = graph.N()
    for prop, val in query.parameters:
        t = t.has(prop, P.eqv(val))
    # clipping BEFORE the (1:1 per traverser) projection — same row set as
    # the reference's project-then-clip, deterministic via _ord
    t = _clip(t, query.limit, query.offset)

    names: list[str] = []
    fns = []
    for p in query.projections:
        for name, chain in _leaf_paths(p, context):
            names.append(name)

            def fn(sub, chain=chain):
                for hop in chain:
                    for prop, val in hop.parameters:
                        sub = sub.has(prop, P.eqv(val))
                    prop, rev = _resolve(hop.field, context)
                    sub = sub.in_(prop) if rev else sub.out(prop)
                    # projection-level clipping: per-traverser (the sub's
                    # scope includes _tid), before any deeper hop
                    sub = _clip(sub, hop.limit, hop.offset)
                return sub

            fns.append(fn)
    return t.project(*fns, names=names)
