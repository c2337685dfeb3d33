"""JSON-LD wire codec for traversals — the reference's serialization syntax.

L-space ships traversals over the wire as JSON-LD nodes typed
``https://ns.l-space.eu/librarian/Traversal`` whose ``Traversal/steps``
property holds a ``@vector`` of step nodes (encode ``core/shared/src/main/
scala/lspace/librarian/traversal/Traversal.scala:1282-1288`` /
``Step.toNode`` per step; decode ``parse/core/.../decode/DecodeJsonLD.scala:
134-146`` → ``Traversal.toTraversal``). This module maps that syntax onto
the engine's existing executable wire program — the job-spec step list
(``jobspec.py``: ``{"step": name, "args": [...]}``) — so a serialized
reference traversal runs unchanged::

    steps = jsonld_to_steps(wire_json)          # reference wire → program
    df    = run_job(spark, {"kind": "traversal",
                            "input": {...}, "jsonld": wire_json})
    doc   = steps_to_jsonld(steps)              # program → reference wire

Shapes matched against the reference's own decoder spec strings
(``parse/core/.../codec/json/jsonld/JsonLDDecoderSpec.scala:73-115`` —
both of those exact documents are decoded in ``tests/test_jsonld.py``):

- compact IRIs expand through the ``@context`` prefix map
  (``{"0": "https://ns.l-space.eu/librarian/"}``)
- a step node is ``{"@type": "0:step/<Name>", "<property>": <value>...}``
  with property IRIs per step (e.g. ``0:step/Has/Key``,
  ``0:MoveStep/label``, ``0:step/Range/low``)
- typed scalars are ``{"@value": v, "@type": "@int"|...}``; resource
  references are ``{"@id": iri}``
- predicates are nodes typed ``0:p/<Name>`` with the operand under
  ``0:p/value`` (EqP/SeqP/CollectionP), ``0:p/range/lower``/``upper``
  (RangeP), or ``0:p/collection/value`` (``logic/predicate/*.scala``)
- a sub-traversal argument is a node carrying ``0:Traversal/steps``;
  ``Project/by`` stores its by-traversals in REVERSE construction order
  (visible in the decoder spec's project example) — the codec restores
  construction order

Decoding is total over the engine's executable subset; an unknown step or
predicate raises ``ValueError`` rather than silently dropping semantics
(``TimeLimit`` points at the superstep runner's ``time_limit_s`` budget,
``plans/superstep.py:82``, which is where the engine implements it).
"""

from __future__ import annotations

import json
from typing import Any

NS = "https://ns.l-space.eu/"
LIB = NS + "librarian/"
STEP_VECTOR_TYPE = f"@vector({LIB}Step)"
TRAVERSAL_LIST_TYPE = f"@list({LIB}Traversal)"

# wire step name <-> job-spec step name (jobspec._ALIASES maps the spec
# names onto the DSL's reserved-word escapes)
_WIRE_TO_SPEC = {
    "N": "N", "E": "E", "V": "V", "R": "R",
    "Out": "out", "OutE": "outE", "In": "in", "InE": "inE",
    "From": "from", "To": "to", "Label": "label",
    "Has": "has", "HasNot": "hasNot", "HasLabel": "hasLabel",
    "HasId": "hasId", "HasIri": "hasIri", "Is": "is", "Coin": "coin",
    "Where": "where", "And": "and", "Or": "or", "Not": "not",
    "Dedup": "dedup", "Union": "union", "Coalesce": "coalesce",
    "Choose": "choose", "Local": "local", "Repeat": "repeat",
    "Count": "count", "Sum": "sum", "Mean": "mean",
    "Max": "max", "Min": "min", "Group": "group", "Order": "order",
    "Limit": "limit", "Skip": "skip", "Range": "range", "Tail": "tail",
    "Head": "head", "Last": "last", "Project": "project",
    "As": "as", "Select": "select", "Constant": "constant", "Id": "id",
    "OutMap": "outMap", "InMap": "inMap",
    "OutEMap": "outEMap", "InEMap": "inEMap", "Path": "path",
}
_SPEC_TO_WIRE = {v: k for k, v in _WIRE_TO_SPEC.items()}

_MOVE_STEPS = {"Out", "OutE", "In", "InE", "OutMap", "InMap",
               "OutEMap", "InEMap"}

# predicate wire name <-> P registry method (functions/predicates.py)
_PRED_TO_SPEC = {
    "Eqv": "eqv", "Neqv": "neqv", "Gt": "gt", "Gte": "gte",
    "Lt": "lt", "Lte": "lte", "Between": "between", "Inside": "inside",
    "Outside": "outside", "Within": "within", "Intersect": "intersect",
    "Disjoint": "disjoint", "Contains": "contains", "Prefix": "prefix",
    "Suffix": "suffix", "Regex": "regex", "Fuzzy": "fuzzy",
    "ContainsPrefix": "contains_prefix", "ContainsRegex": "contains_regex",
    "ContainsFuzzy": "contains_fuzzy",
}
_SPEC_TO_PRED = {v: k for k, v in _PRED_TO_SPEC.items()}
# RangeP predicates carry (lower, upper) instead of a single operand
_RANGE_PREDS = {"Between", "Inside", "Outside"}


# --------------------------------------------------------------------- decode
def _expand(term: str, ctx: dict[str, str]) -> str:
    """Expand a compact IRI through the @context prefix map."""
    if ":" in term and not term.startswith(("http://", "https://", "@")):
        pfx, rest = term.split(":", 1)
        if pfx in ctx:
            return ctx[pfx] + rest
    return term


def _strip_lib(iri: str) -> str:
    if not iri.startswith(LIB):
        raise ValueError(f"not an l-space librarian IRI: {iri!r}")
    return iri[len(LIB):]


def _decode_value(v: Any, ctx: dict[str, str]) -> Any:
    """A typed scalar, resource reference, or list thereof → python value."""
    if isinstance(v, list):
        return [_decode_value(x, ctx) for x in v]
    if isinstance(v, dict):
        if "@value" in v:
            inner = v["@value"]
            if isinstance(inner, list):
                return [_decode_value(x, ctx) for x in inner]
            return inner
        if "@id" in v:
            return v["@id"]
        raise ValueError(f"unrecognized value node: {v!r}")
    return v


def _node_type(d: dict, ctx: dict[str, str]) -> str | None:
    t = d.get("@type")
    if isinstance(t, list):
        t = t[0] if t else None
    return _expand(t, ctx) if isinstance(t, str) else None


def _props(d: dict, ctx: dict[str, str]) -> dict[str, Any]:
    """Non-keyword entries with their keys expanded to full IRIs."""
    return {_expand(k, ctx): v for k, v in d.items() if not k.startswith("@")}


def _decode_pred(d: dict, ctx: dict[str, str]) -> dict:
    t = _node_type(d, ctx)
    if t is None:
        raise ValueError(f"predicate node missing @type: {d!r}")
    name = _strip_lib(t)
    if not name.startswith("p/"):
        raise ValueError(f"not a predicate node: {t!r}")
    wire = name[len("p/"):]
    props = _props(d, ctx)
    if wire in ("And", "Or"):
        subs = props.get(LIB + "p/value", [])
        if isinstance(subs, dict):
            subs = [subs]
        decoded = [_decode_pred(s, ctx) for s in subs]
        if not decoded:
            raise ValueError(f"empty {wire} predicate")
        if len(decoded) == 1:
            return decoded[0]
        # group node — preserves nesting exactly (P.and_/P.or_ in jobspec);
        # flattening into base+and+or keys mis-associates And(Or(..), ..)
        return {"p": wire.lower(), "args": decoded}
    spec = _PRED_TO_SPEC.get(wire)
    if spec is None:
        raise ValueError(f"unknown predicate {wire!r}")
    if wire in _RANGE_PREDS:
        lo = _decode_value(props[LIB + "p/range/lower"], ctx)
        hi = _decode_value(props[LIB + "p/range/upper"], ctx)
        return {"p": spec, "args": [lo, hi]}
    raw = props.get(LIB + "p/value", props.get(LIB + "p/collection/value"))
    if raw is None:
        raise ValueError(f"predicate {wire!r} missing operand")
    val = _decode_value(raw, ctx)
    if spec in ("within",):  # variadic on the P registry
        args = val if isinstance(val, list) else [val]
    elif spec in ("intersect", "disjoint"):
        args = [val if isinstance(val, list) else [val]]
    else:
        args = [val]
    return {"p": spec, "args": args}


def _decode_traversal_node(d: dict, ctx: dict[str, str]) -> dict:
    steps_prop = None
    for k, v in d.items():
        if not k.startswith("@") and _expand(k, ctx) == LIB + "Traversal/steps":
            steps_prop = v
    if steps_prop is None:
        raise ValueError(f"traversal node without Traversal/steps: {d!r}")
    raw = steps_prop.get("@value", steps_prop) if isinstance(steps_prop, dict) \
        else steps_prop
    if not isinstance(raw, list):
        raise ValueError("Traversal/steps must hold a step vector")
    return {"steps": [_decode_step(s, ctx) for s in raw]}


def _sub(props: dict, key: str, ctx: dict[str, str]) -> dict | None:
    v = props.get(LIB + key)
    if v is None:
        return None
    if isinstance(v, dict) and "@value" in v:
        v = v["@value"]
    if isinstance(v, list):
        if len(v) != 1:
            raise ValueError(f"{key}: expected one traversal, got {len(v)}")
        v = v[0]
    return _decode_traversal_node(v, ctx)


def _subs(props: dict, key: str, ctx: dict[str, str]) -> list[dict]:
    v = props.get(LIB + key, [])
    if isinstance(v, dict) and "@value" in v:
        v = v["@value"]
    if isinstance(v, dict):
        v = [v]
    return [_decode_traversal_node(x, ctx) for x in v]


def _scalar(props: dict, key: str, ctx: dict[str, str], default=None):
    v = props.get(LIB + key)
    return default if v is None else _decode_value(v, ctx)


def _required(props: dict, key: str, ctx: dict[str, str]):
    """Like ``_scalar`` but a missing operand is a malformed document:
    raise the module's promised ValueError instead of letting ``None``
    leak into ``str()``/``int()`` (silent 'None' labels, TypeErrors)."""
    v = _scalar(props, key, ctx)
    if v is None:
        raise ValueError(f"step missing required operand {key!r}")
    return v


def _as_list(v: Any) -> list:
    return v if isinstance(v, list) else [v]


def _decode_step(d: dict, ctx: dict[str, str]) -> dict:
    t = _node_type(d, ctx)
    if t is None:
        raise ValueError(f"step node missing @type: {d!r}")
    name = _strip_lib(t)
    if not name.startswith("step/"):
        raise ValueError(f"not a step node: {t!r}")
    wire = name[len("step/"):]
    props = _props(d, ctx)
    spec = _WIRE_TO_SPEC.get(wire)
    if spec is None:
        hint = (" (the engine's analog is the superstep runner's "
                "time_limit_s budget)" if wire == "TimeLimit" else "")
        raise ValueError(f"unsupported step {wire!r}{hint}")
    out: dict[str, Any] = {"step": spec}
    args: list[Any] = []
    kwargs: dict[str, Any] = {}

    if wire in ("N", "E", "V", "R"):
        sel = props.get(LIB + f"step/{wire}/{wire.lower() if wire != 'N' else 'node'}")
        # resource-set selectors (step/N/node etc.) pin the scan to specific
        # resources; the engine's scan steps are whole-table (filter with
        # hasId/hasIri instead), so a pinned scan is out of subset
        if wire == "E":
            sel = props.get(LIB + "step/E/edge", sel)
        if wire == "V":
            sel = props.get(LIB + "step/V/value", sel)
        if wire == "R":
            sel = props.get(LIB + "step/R/resource", sel)
        if sel:
            raise ValueError(f"resource-pinned {wire} scan is out of subset; "
                             "filter with hasId/hasIri after the scan")
    elif wire in _MOVE_STEPS or wire in ("From", "To", "Label"):
        labels = props.get(LIB + "MoveStep/label")
        if labels is not None:
            args.extend(str(x) for x in _as_list(_decode_value(labels, ctx)))
    elif wire in ("Has", "HasNot"):
        key = props.get(LIB + f"step/{wire}/Key")
        if key is None:
            raise ValueError(f"{wire} step missing Key")
        args.append(str(_decode_value(key, ctx)))
        pred = props.get(LIB + f"step/{wire}/Predicate")
        if pred is not None:
            pnodes = [_decode_pred(p, ctx) for p in _as_list(pred)]
            # multiple predicate nodes on one Has = conjunction
            args.append(pnodes[0] if len(pnodes) == 1
                        else {"p": "and", "args": pnodes})
    elif wire == "HasLabel":
        labels = props.get(LIB + "step/HasLabel/Label")
        if labels is None:
            raise ValueError("HasLabel step missing Label")
        args.extend(str(x) for x in _as_list(_decode_value(labels, ctx)))
    elif wire == "HasId":
        ids = props.get(LIB + "step/HasId/Id")
        if ids is None:
            raise ValueError("HasId step missing Id")
        args.extend(int(x) for x in _as_list(_decode_value(ids, ctx)))
    elif wire == "HasIri":
        iris = props.get(LIB + "step/HasIri/iri")
        if iris is None:
            raise ValueError("HasIri step missing iri")
        args.extend(str(x) for x in _as_list(_decode_value(iris, ctx)))
    elif wire == "Is":
        pred = props.get(LIB + "step/Is/Predicate")
        if pred is None:
            raise ValueError("Is step missing Predicate")
        pnodes = [_decode_pred(p, ctx) for p in _as_list(pred)]
        args.append(pnodes[0] if len(pnodes) == 1
                    else {"p": "and", "args": pnodes})
    elif wire == "Coin":
        args.append(float(_required(props, "step/Coin/p", ctx)))
        seed = _scalar(props, "step/Coin/seed", ctx)
        if seed is not None:
            kwargs["seed"] = int(seed)
    elif wire in ("As", "Select"):
        args.append(str(_required(props, f"step/{wire}/name", ctx)))
    elif wire == "Constant":
        args.append(_required(props, "step/Constant/value", ctx))
    elif wire == "Limit":
        args.append(int(_required(props, "step/Limit/max", ctx)))
    elif wire == "Skip":
        args.append(int(_required(props, "step/Skip/n", ctx)))
    elif wire == "Tail":
        args.append(int(_required(props, "step/Tail/max", ctx)))
    elif wire == "Range":
        # reference Range(low, high) executes slice(low-1, high)
        # (SyncGuide.scala:471-473) = 1-based rows [low..high] — exactly
        # the DSL's range_(lo, hi), so low/high pass through unchanged
        args.append(int(_required(props, "step/Range/low", ctx)))
        args.append(int(_required(props, "step/Range/high", ctx)))
    elif wire in ("Where", "Not", "Local"):
        sub = _sub(props, f"step/{wire}/traversal", ctx)
        if sub is None:
            raise ValueError(f"{wire} step missing traversal")
        args.append(sub)
    elif wire in ("And", "Or", "Union", "Coalesce"):
        args.extend(_subs(props, f"step/{wire}/traversal", ctx))
    elif wire == "Choose":
        cond = _sub(props, "step/Choose/traversal", ctx)
        right = _sub(props, "step/Choose/right", ctx)
        left = _sub(props, "step/Choose/left", ctx)
        if cond is None or right is None or left is None:
            raise ValueError("Choose step needs traversal, right, left")
        args.extend([cond, right, left])
    elif wire == "Repeat":
        body = _sub(props, "step/Repeat/traversal", ctx)
        if body is None:
            raise ValueError("Repeat step missing traversal")
        args.append(body)
        until = _sub(props, "step/Repeat/until", ctx)
        if until is not None:
            kwargs["until"] = until
        mx = _scalar(props, "step/Repeat/max", ctx)
        if mx is not None:
            kwargs["max_loops"] = int(mx)
        for flag in ("collect", "noloop"):
            v = _scalar(props, f"step/Repeat/{flag}", ctx)
            if v is not None:
                kwargs[flag] = bool(v)
    elif wire == "Group":
        by = _sub(props, "step/Group/by", ctx)
        if by is None:
            raise ValueError("Group step missing by")
        args.append(by)
        value = _sub(props, "step/Group/value", ctx)
        if value is not None:
            args.append(value)
    elif wire == "Order":
        by = _sub(props, "step/Order/by", ctx)
        if by is not None:
            args.append(by)
        inc = _scalar(props, "step/Order/increasing", ctx)
        if inc is not None:
            kwargs["ascending"] = bool(inc)
    elif wire in ("Max", "Min"):
        if props.get(LIB + f"step/{wire}/by") is not None:
            raise ValueError(f"{wire} with a by-traversal is out of subset "
                             "(the engine's max/min are argmax/argmin over "
                             "the focus value)")
    elif wire == "Project":
        bys = props.get(LIB + "step/Project/by")
        if bys is None:
            raise ValueError("Project step missing by")
        if isinstance(bys, dict) and "@value" in bys:
            bys = bys["@value"]
        # the wire stores by-traversals in reverse construction order
        # (JsonLDDecoderSpec.scala:102's project example) — restore it
        args.extend(_decode_traversal_node(b, ctx)
                    for b in reversed(_as_list(bys)))
    elif wire == "Path":
        by = _sub(props, "step/Path/by", ctx)
        if by is not None:
            kwargs["by"] = by
    # Count/Sum/Mean/Dedup/Head/Last/Id: no arguments

    if args:
        out["args"] = args
    if kwargs:
        out["kwargs"] = kwargs
    return out


def jsonld_to_steps(doc: str | dict) -> list[dict]:
    """Reference JSON-LD traversal document → executable job-spec step list."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    raw_ctx = doc.get("@context", {})
    ctx = {k: v for k, v in raw_ctx.items()
           if isinstance(v, str) and not k.startswith("@")}
    t = _node_type(doc, ctx)
    if t is not None and t != LIB + "Traversal":
        raise ValueError(f"not a Traversal document: @type={t!r}")
    return _decode_traversal_node(doc, ctx)["steps"]


# --------------------------------------------------------------------- encode
def _encode_value(v: Any) -> dict:
    if isinstance(v, bool):
        return {"@value": v, "@type": "@boolean"}
    if isinstance(v, int):
        return {"@value": v, "@type": "@int"}
    if isinstance(v, float):
        return {"@value": v, "@type": "@double"}
    return {"@value": v, "@type": "@string"}


def _encode_pred(p: dict) -> dict:
    name = p["p"]
    args = p.get("args", [])
    if name in ("and", "or"):
        # group node — children are predicate dicts, nesting preserved
        return {"@type": f"0:p/{name.capitalize()}",
                "0:p/value": [_encode_pred(q) for q in args]}
    wire = _SPEC_TO_PRED.get(name)
    if wire is None:
        raise ValueError(f"unknown predicate {name!r}")
    node: dict[str, Any] = {"@type": f"0:p/{wire}"}
    if wire in _RANGE_PREDS:
        node["0:p/range/lower"] = _encode_value(args[0])
        node["0:p/range/upper"] = _encode_value(args[1])
    elif wire in ("Intersect", "Disjoint"):
        vals = args[0] if len(args) == 1 and isinstance(args[0], list) else args
        node["0:p/collection/value"] = [_encode_value(v) for v in vals]
    elif wire == "Within":
        node["0:p/value"] = [_encode_value(v) for v in args]
    else:
        # Contains is substring-on-scalar in this engine — scalar operand
        node["0:p/value"] = _encode_value(args[0])
    # legacy flat combinator keys: jobspec evaluates base & ands first, then
    # | ors — encode in that association: Or(And(base, *ands), *ors)
    if p.get("and"):
        node = {"@type": "0:p/And",
                "0:p/value": [node] + [_encode_pred(q) for q in p["and"]]}
    if p.get("or"):
        node = {"@type": "0:p/Or",
                "0:p/value": [node] + [_encode_pred(q) for q in p["or"]]}
    return node


def _encode_traversal(steps: list[dict]) -> dict:
    return {"0:Traversal/steps": {
        "@value": [_encode_step(s) for s in steps],
        "@type": STEP_VECTOR_TYPE,
    }}


def _encode_step(s: dict) -> dict:
    spec = s["step"]
    wire = _SPEC_TO_WIRE.get(spec)
    if wire is None:
        raise ValueError(f"step {spec!r} has no wire encoding")
    args = list(s.get("args", []))
    kwargs = dict(s.get("kwargs", {}))
    node: dict[str, Any] = {"@type": f"0:step/{wire}"}

    def enc_sub(a: dict) -> dict:
        return _encode_traversal(a["steps"])

    if wire in _MOVE_STEPS or wire in ("From", "To", "Label"):
        if args:
            ids = [{"@id": a} for a in args]
            node["0:MoveStep/label"] = ids if len(ids) > 1 else ids[0]
    elif wire in ("Has", "HasNot"):
        node[f"0:step/{wire}/Key"] = {"@id": args[0]}
        if len(args) > 1:
            node[f"0:step/{wire}/Predicate"] = _encode_pred(args[1])
    elif wire == "HasLabel":
        ids = [{"@id": a} for a in args]
        node["0:step/HasLabel/Label"] = ids if len(ids) > 1 else ids[0]
    elif wire == "HasId":
        vs = [_encode_value(a) for a in args]
        node["0:step/HasId/Id"] = vs if len(vs) > 1 else vs[0]
    elif wire == "HasIri":
        vs = [_encode_value(a) for a in args]
        node["0:step/HasIri/iri"] = vs if len(vs) > 1 else vs[0]
    elif wire == "Is":
        node["0:step/Is/Predicate"] = _encode_pred(args[0])
    elif wire == "Coin":
        node["0:step/Coin/p"] = _encode_value(float(args[0]))
        if "seed" in kwargs:
            node["0:step/Coin/seed"] = _encode_value(int(kwargs["seed"]))
    elif wire in ("As", "Select"):
        node[f"0:step/{wire}/name"] = _encode_value(args[0])
    elif wire == "Constant":
        node["0:step/Constant/value"] = _encode_value(args[0])
    elif wire == "Limit":
        node["0:step/Limit/max"] = _encode_value(int(args[0]))
    elif wire == "Skip":
        node["0:step/Skip/n"] = _encode_value(int(args[0]))
    elif wire == "Tail":
        node["0:step/Tail/max"] = _encode_value(int(args[0]))
    elif wire == "Range":
        node["0:step/Range/low"] = _encode_value(int(args[0]))
        node["0:step/Range/high"] = _encode_value(int(args[1]))
    elif wire in ("Where", "Not", "Local"):
        node[f"0:step/{wire}/traversal"] = enc_sub(args[0])
    elif wire in ("And", "Or", "Union", "Coalesce"):
        node[f"0:step/{wire}/traversal"] = [enc_sub(a) for a in args]
    elif wire == "Choose":
        node["0:step/Choose/traversal"] = enc_sub(args[0])
        node["0:step/Choose/right"] = enc_sub(args[1])
        node["0:step/Choose/left"] = enc_sub(args[2])
    elif wire == "Repeat":
        node["0:step/Repeat/traversal"] = enc_sub(args[0])
        if "until" in kwargs:
            node["0:step/Repeat/until"] = enc_sub(kwargs["until"])
        if "max_loops" in kwargs:
            node["0:step/Repeat/max"] = _encode_value(int(kwargs["max_loops"]))
        for flag in ("collect", "noloop"):
            if flag in kwargs:
                node[f"0:step/Repeat/{flag}"] = _encode_value(
                    bool(kwargs[flag]))
    elif wire == "Group":
        node["0:step/Group/by"] = enc_sub(args[0])
        if len(args) > 1:
            node["0:step/Group/value"] = enc_sub(args[1])
    elif wire == "Order":
        if args:
            node["0:step/Order/by"] = enc_sub(args[0])
        if "ascending" in kwargs:
            node["0:step/Order/increasing"] = _encode_value(
                bool(kwargs["ascending"]))
    elif wire == "Project":
        node["0:step/Project/by"] = {
            "@value": [_encode_traversal(a["steps"]) for a in reversed(args)],
            "@type": TRAVERSAL_LIST_TYPE,
        }
    elif wire == "Path":
        if "by" in kwargs:
            node["0:step/Path/by"] = enc_sub(kwargs["by"])
    return node


def steps_to_jsonld(steps: list[dict]) -> dict:
    """Job-spec step list → the reference's JSON-LD traversal document."""
    doc = {"@context": {"0": LIB}, "@type": "0:Traversal"}
    doc.update(_encode_traversal(steps))
    return doc
