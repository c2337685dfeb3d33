"""Predicate library — Spark-expression parity with L-space's ``P``.

Reference: the 22 predicate classes under
``core/shared/src/main/scala/lspace/librarian/logic/predicate/`` (registry
``P.scala:49-72``) with semantics defined by ``DefaultAssistent.scala``:

- equality is universal (``Eqv``/``Neqv``)
- order predicates compare cross-numeric (Int vs Double vs Long), temporal,
  and string (``DefaultAssistent.scala:15-63,84-113``)
- ``between`` is inclusive-inclusive, ``inside`` exclusive-exclusive,
  ``outside`` is the complement of ``between``'s interior
  (verified by the reference's golden counts,
  ``AsyncGuideSpec.scala:191-220``)
- string: ``prefix``/``suffix``/``regex``/``fuzzy``
- collections: ``within``/``intersect``/``disjoint``/``contains``

A ``Pred`` is a pure function ``Column -> Column(boolean)`` plus the python
operand(s), kept so the traversal layer can pick the right typed value column
(string/numeric/date) for the comparison — the Spark analog of the
reference's runtime datatype dispatch (``DataType.scala:50-176``).

Everything compiles to built-in Catalyst expressions (JVM-side, codegen'd,
pushdown-able) — no Python UDFs.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def operand_family(v: Any) -> str:
    """'str' | 'num' | 'date' | 'array' — drives typed-column selection."""
    if isinstance(v, bool):
        return "num"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, (_dt.date, _dt.datetime)):
        return "date"
    if isinstance(v, (list, tuple, set)):
        inner = next(iter(v), "")
        return "array:" + operand_family(inner)
    return "str"


@dataclass(frozen=True)
class Pred:
    name: str
    fn: Callable[[Column], Column]
    family: str  # which typed column the predicate compares against

    def __call__(self, col: Column) -> Column:
        return self.fn(col)

    # boolean composition — reference predicate/And.scala, Or.scala,
    # combinators P.scala:85-86,134-139
    def __and__(self, other: "Pred") -> "Pred":
        return Pred(
            f"and({self.name},{other.name})",
            lambda c: self.fn(c) & other.fn(c),
            self.family,
        )

    def __or__(self, other: "Pred") -> "Pred":
        return Pred(
            f"or({self.name},{other.name})",
            lambda c: self.fn(c) | other.fn(c),
            self.family,
        )


def _lit(v: Any) -> Column:
    return F.lit(v)


class P:
    """Factory namespace mirroring the reference's ``P`` object."""

    # --- variadic grouping (predicate/And.scala, Or.scala) --------------------
    # Group constructors preserve arbitrary nesting — ``P.and_(P.or_(a, b), c)``
    # is (a|b)&c, which the flat base+and+or dict shape cannot express.
    @staticmethod
    def and_(*preds: "Pred") -> Pred:
        if not preds:
            raise ValueError("P.and_ needs at least one predicate")
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out

    @staticmethod
    def or_(*preds: "Pred") -> Pred:
        if not preds:
            raise ValueError("P.or_ needs at least one predicate")
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out

    # --- equality (predicate/Eqv.scala, Neqv.scala) --------------------------
    @staticmethod
    def eqv(v: Any) -> Pred:
        return Pred(f"eqv({v!r})", lambda c: c == _lit(v), operand_family(v))

    @staticmethod
    def neqv(v: Any) -> Pred:
        return Pred(f"neqv({v!r})", lambda c: c != _lit(v), operand_family(v))

    # --- order (Gt/Gte/Lt/Lte; cross-numeric per DefaultAssistent) -----------
    @staticmethod
    def gt(v: Any) -> Pred:
        return Pred(f"gt({v!r})", lambda c: c > _lit(v), operand_family(v))

    @staticmethod
    def gte(v: Any) -> Pred:
        return Pred(f"gte({v!r})", lambda c: c >= _lit(v), operand_family(v))

    @staticmethod
    def lt(v: Any) -> Pred:
        return Pred(f"lt({v!r})", lambda c: c < _lit(v), operand_family(v))

    @staticmethod
    def lte(v: Any) -> Pred:
        return Pred(f"lte({v!r})", lambda c: c <= _lit(v), operand_family(v))

    # --- ranges (Between incl-incl, Inside excl-excl, Outside) ---------------
    @staticmethod
    def between(lo: Any, hi: Any) -> Pred:
        return Pred(
            f"between({lo!r},{hi!r})",
            lambda c: (c >= _lit(lo)) & (c <= _lit(hi)),
            operand_family(lo),
        )

    @staticmethod
    def inside(lo: Any, hi: Any) -> Pred:
        return Pred(
            f"inside({lo!r},{hi!r})",
            lambda c: (c > _lit(lo)) & (c < _lit(hi)),
            operand_family(lo),
        )

    @staticmethod
    def outside(lo: Any, hi: Any) -> Pred:
        return Pred(
            f"outside({lo!r},{hi!r})",
            lambda c: (c < _lit(lo)) | (c > _lit(hi)),
            operand_family(lo),
        )

    # --- membership / collections (Within/Intersect/Disjoint/Contains) -------
    @staticmethod
    def within(*vs: Any) -> Pred:
        vals = list(vs[0]) if len(vs) == 1 and isinstance(vs[0], (list, set, tuple)) else list(vs)
        return Pred(
            f"within({vals!r})", lambda c: c.isin(vals), operand_family(vals[0])
        )

    @staticmethod
    def intersect(vs: list) -> Pred:
        return Pred(
            f"intersect({vs!r})",
            lambda c: F.arrays_overlap(c, F.array(*[F.lit(v) for v in vs])),
            "array:" + operand_family(next(iter(vs), "")),
        )

    @staticmethod
    def disjoint(vs: list) -> Pred:
        return Pred(
            f"disjoint({vs!r})",
            lambda c: ~F.arrays_overlap(c, F.array(*[F.lit(v) for v in vs])),
            "array:" + operand_family(next(iter(vs), "")),
        )

    @staticmethod
    def contains(v: Any) -> Pred:
        # on arrays: membership; on strings: substring (reference Contains
        # dispatches on the value's datatype)
        fam = operand_family(v)
        if fam == "str":
            return Pred(f"contains({v!r})", lambda c: c.contains(v), "str")
        return Pred(f"contains({v!r})", lambda c: F.array_contains(c, v), "array:" + fam)

    # --- strings (Prefix/Suffix/Regex/Fuzzy + Contains* variants) ------------
    @staticmethod
    def prefix(v: str) -> Pred:
        return Pred(f"prefix({v!r})", lambda c: c.startswith(v), "str")

    @staticmethod
    def suffix(v: str) -> Pred:
        return Pred(f"suffix({v!r})", lambda c: c.endswith(v), "str")

    @staticmethod
    def regex(pattern: str) -> Pred:
        return Pred(f"regex({pattern!r})", lambda c: c.rlike(pattern), "str")

    @staticmethod
    def fuzzy(v: str, max_dist: int | None = None) -> Pred:
        d = max_dist if max_dist is not None else max(1, len(v) // 4)
        return Pred(
            f"fuzzy({v!r},{d})", lambda c: F.levenshtein(c, F.lit(v)) <= d, "str"
        )

    @staticmethod
    def contains_prefix(v: str) -> Pred:
        return Pred(
            f"containsPrefix({v!r})",
            lambda c: F.exists(c, lambda x: x.startswith(v)),
            "array:str",
        )

    @staticmethod
    def contains_regex(pattern: str) -> Pred:
        return Pred(
            f"containsRegex({pattern!r})",
            lambda c: F.exists(c, lambda x: x.rlike(pattern)),
            "array:str",
        )

    @staticmethod
    def contains_fuzzy(v: str, max_dist: int | None = None) -> Pred:
        d = max_dist if max_dist is not None else max(1, len(v) // 4)
        return Pred(
            f"containsFuzzy({v!r},{d})",
            lambda c: F.exists(c, lambda x: F.levenshtein(x, F.lit(v)) <= d),
            "array:str",
        )
