"""Function library: L-space predicate parity (``P``) + text/vector helpers."""

from .predicates import P, Pred  # noqa: F401
