"""CLI: print the formatted physical plan of any registered query.

    python -m lakehouse_homeserver_spark.plans tpch_q5_local_supplier_volume
    python -m lakehouse_homeserver_spark.plans q1_pricing_summary /root/testdata/sf0.1

Use it after changing an operator: the plan you ship should be the
plan you meant (pushdown present, dims broadcast, no cartesian).
"""

from __future__ import annotations

import sys

from ..registry import all_queries
from ..session import get_spark
from .explain import formatted_plan, pushed_filters, read_schema_columns


def main() -> int:
    if len(sys.argv) < 2:
        names = "\n  ".join(sorted(all_queries()))
        print(f"usage: python -m lakehouse_homeserver_spark.plans <query> [sf_dir]\n\nqueries:\n  {names}")
        return 1
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    qs = all_queries()
    if name not in qs:
        print(f"unknown query {name!r}; run with no args to list")
        return 1
    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[name](spark, sf_dir)
    print(formatted_plan(df))
    print("PushedFilters:", pushed_filters(df) or "(none)")
    print("Scanned columns per file scan:", read_schema_columns(df) or "(none)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
