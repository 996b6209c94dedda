"""Shared helpers for oracle-parity-safe query authoring.

Float parity strategy (SURVEY.md §7 "hard parts"): sums of doubles are
order-dependent, and Spark and DuckDB reduce in different orders. Any
SUM over a double column therefore goes through ``decimal(18,2)``
(exact arithmetic, order-independent) and is cast back to double at
the end — both engines then produce bit-identical results. Averages
are computed as (exact decimal sum → double) / count so the final
division is a single IEEE op on identical operands in both engines.

This costs nothing at scale: decimal sums are still map-side partial
aggregates inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(c: str | Column) -> Column:
    """Column as exact decimal(18,2) (inputs are money/qty-like)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: str | Column) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(dec(c)).cast("double")


def davg(c: str | Column) -> Column:
    """Deterministic average: exact sum (double) / count (single IEEE div)."""
    return F.sum(dec(c)).cast("double") / F.count(F.lit(1))


# DuckDB-side equivalents (kept adjacent so the pairing is auditable).
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"


def make_registry():
    """The one (QUERIES, ORACLES, query) registration triple every
    operator module uses — consolidated r7 (review: 13 modules
    carried character-identical copies of this decorator, so a
    registration-time change had 13 places to drift). Bonus the
    copies never had: duplicate query names raise at import instead
    of silently shadowing (the r5 grep-truncation incident shipped a
    shadowed duplicate exactly this way)."""
    queries: dict = {}
    oracles: dict[str, str] = {}

    def query(name: str, oracle: str | None = None):
        def deco(fn):
            if name in queries:
                raise ValueError(
                    f"duplicate query registration: {name!r} — the "
                    "second definition would silently shadow the first"
                )
            queries[name] = fn
            if oracle is not None:
                oracles[name] = oracle
            return fn

        return deco

    return queries, oracles, query
