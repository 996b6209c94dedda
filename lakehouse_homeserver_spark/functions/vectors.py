"""Vector math as JVM-side column expressions (SURVEY.md §2.K3).

All operations are `zip_with` / `aggregate` folds over
``array<float>`` columns cast to double — whole-stage-codegen
expressions, no Python UDF, no serialization of vectors to the
driver. The fold is a sequential left fold, which both Spark and
DuckDB's ``list_sum`` evaluate in list order → deterministic,
oracle-comparable doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
