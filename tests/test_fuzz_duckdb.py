"""Differential fuzz of the relational core against DuckDB (VERDICT
r6 next-round #6).

Every certified query exercises a HAND-PICKED operator combination;
the residual correctness risk is the combinatorial space between them
— a filter shape nobody composed with a left join, a window over an
expression group, EXCEPT ALL over computed columns. This suite walks
that space mechanically: a seeded generator emits random queries in
the COMMON ANSI subset both engines parse identically (the same
text runs on both — no translation layer to hide a semantics bug in),
Spark and DuckDB both execute them over the same parquet fixture, and
results must match under the driver's own canonicalization (sorted
column names, order-insensitive rows, midnight-timestamp→date).

Reference parity: the reference exposes the FULL SQL surface of its
engines by construction (/root/reference/README.md:72-75 — users
write arbitrary SQL against the lakehouse); point-certifying 256
queries can't cover that contract, differential testing can
approximate it.

Dialect-common subset rules (each is a known cross-engine trap the
generator must stay inside — documented so a future shape addition
doesn't re-discover them the hard way):
- SUM over doubles only through CAST(.. AS DECIMAL(18,2)) — exact,
  summation-order-free; raw double sums differ in final ulps.
- AVG only over ints (both return DOUBLE); AVG(decimal) returns
  DECIMAL(p+4) in Spark vs DOUBLE in DuckDB.
- SUM(int) wrapped in CAST(.. AS BIGINT): DuckDB widens to INT128
  which pandas materializes as float64/object.
- % only on non-negative ints (negative-operand % is
  implementation-signed).
- ROW_NUMBER/LAG/LEAD/frames only over a TOTAL order (tie-break with
  the table's key column); RANK/DENSE_RANK may see ties.
- No ORDER BY without LIMIT (compare is order-insensitive anyway);
  ORDER BY ... LIMIT k always tie-broken by key so the SELECTED SET
  is deterministic.
- String comparisons beyond =/IN/LIKE avoided except MIN/MAX on the
  pure-ASCII TPC-H columns (binary collation agrees there).
- double→int always FLOOR-then-CAST: bare CAST(double AS BIGINT)
  truncates in Spark but rounds-half-even in DuckDB (this fuzzer's
  first run caught it 7 times in 200 queries).
- DECIMAL results fold to float in the canon: duckdb's .df() already
  materializes DECIMAL as float64, Spark's toPandas keeps Decimal —
  a pandas-boundary artifact, not an engine divergence.
- (r8, found by the first rollup-shape run) ROLLUP/GROUPING SETS that
  include the grand-total () set DIVERGE on empty input: Spark's
  Expand-based plan emits 3 rows per input row, so an empty relation
  produces NO groups at all — including the grand total — while
  DuckDB (and Postgres; ANSI reads this way) still emit the one ()
  row, as a bare global aggregate would. Shapes carrying () append
  HAVING COUNT(*) > 0 so both engines drop that row; the deviation
  itself is Spark-upstream behavior, not this engine's.

A divergence fails the test and prints the SQL + seed; per VERDICT
the fix lands as BOTH an engine/oracle fix and (if it exposed an
operator gap) a named regression query.
"""

from __future__ import annotations

import datetime
import os
import random

import pytest

from lakehouse_homeserver_spark.sources import register_views

# --- fixture-schema metadata --------------------------------------
# key: a unique-per-row column (total-order tie-breaker).
# ints/nums/strs/dates: columns by type class. nums are parquet
# doubles — aggregated only via decimal casts per the rules above.
T = {
    "region": dict(key="r_regionkey", ints=["r_regionkey"], nums=[], strs=["r_name"], dates=[]),
    "nation": dict(key="n_nationkey", ints=["n_nationkey", "n_regionkey"], nums=[], strs=["n_name"], dates=[]),
    "customer": dict(key="c_custkey", ints=["c_custkey", "c_nationkey"], nums=["c_acctbal"], strs=["c_name", "c_mktsegment"], dates=[]),
    "supplier": dict(key="s_suppkey", ints=["s_suppkey", "s_nationkey"], nums=["s_acctbal"], strs=["s_name"], dates=[]),
    "part": dict(key="p_partkey", ints=["p_partkey", "p_size"], nums=["p_retailprice"], strs=["p_name", "p_brand", "p_type"], dates=[]),
    "orders": dict(key="o_orderkey", ints=["o_orderkey", "o_custkey"], nums=["o_totalprice"], strs=["o_orderstatus", "o_orderpriority"], dates=["o_orderdate"]),
    "lineitem": dict(key=None, ints=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"], nums=["l_quantity", "l_extendedprice", "l_discount", "l_tax"], strs=["l_returnflag", "l_linestatus"], dates=["l_shipdate"]),
}
# lineitem's unique key is composite:
LINEITEM_KEY = ("l_orderkey", "l_linenumber")

# FK edges: (left table, left col, right table, right col)
FK = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

STR_LITS = {
    "r_name": ["ASIA", "EUROPE", "AMERICA"],
    "n_name": ["CHINA", "FRANCE", "BRAZIL", "KENYA"],
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
    "p_brand": ["Brand#11", "Brand#23", "Brand#44"],
    "p_type": ["STANDARD", "SMALL", "LARGE"],
}
LIKE_PATS = ["%a%", "B%", "%5", "%ING%", "%r%e%"]
DATE_LITS = ["1993-06-01", "1994-01-01", "1995-07-15", "1996-12-31", "1997-03-01"]


class Gen:
    """Seeded random query generator over the common dialect subset."""

    def __init__(self, seed: int):
        self.r = random.Random(seed)

    # -- expression atoms ------------------------------------------
    def key_cols(self, t: str) -> list[str]:
        return list(LINEITEM_KEY) if t == "lineitem" else [T[t]["key"]]

    def int_expr(self, t: str) -> str:
        c = self.r.choice(T[t]["ints"])
        return self.r.choice([
            c,
            f"({c} + 3)",
            f"({c} % 7)",
            f"ABS({c} - 10)",
            # FLOOR before the int cast: bare CAST(double AS BIGINT)
            # TRUNCATES in Spark but ROUNDS in DuckDB (found by this
            # fuzzer's first run) — floor-then-cast agrees everywhere.
            f"CAST(FLOOR({c} / 4) AS BIGINT)" if self.r.random() < 0.5 else f"({c} * 2)",
        ])

    def str_expr(self, t: str) -> str:
        if not T[t]["strs"]:
            return None
        c = self.r.choice(T[t]["strs"])
        return self.r.choice([
            c,
            f"UPPER({c})",
            f"LOWER({c})",
            f"SUBSTR({c}, 1, 3)",
            f"LENGTH({c})",
            f"({c} || '_x')",
            f"REPLACE({c}, 'a', '#')",
            f"TRIM({c})",
        ])

    def date_expr(self, t: str) -> str:
        if not T[t]["dates"]:
            return None
        c = self.r.choice(T[t]["dates"])
        return self.r.choice([
            f"EXTRACT(YEAR FROM {c})",
            f"EXTRACT(MONTH FROM {c})",
            f"DATE_TRUNC('month', {c})",
            f"DATE_TRUNC('year', {c})",
        ])

    def case_expr(self, t: str) -> str:
        return (
            f"CASE WHEN {self.pred(t)} THEN {self.r.randrange(100)} "
            f"ELSE {self.r.randrange(100)} END"
        )

    def scalar(self, t: str) -> str:
        picks = [self.int_expr, self.case_expr]
        if T[t]["strs"]:
            picks.append(self.str_expr)
        if T[t]["dates"]:
            picks.append(self.date_expr)
        if T[t]["nums"]:
            picks.append(lambda tt: f"CAST({self.r.choice(T[tt]['nums'])} AS DECIMAL(18,2))")
        return self.r.choice(picks)(t)

    # -- predicates --------------------------------------------------
    def atom_pred(self, t: str) -> str:
        kind = self.r.random()
        if kind < 0.35:
            c = self.r.choice(T[t]["ints"])
            op = self.r.choice(["<", "<=", ">", ">=", "=", "<>"])
            return f"{c} {op} {self.r.randrange(0, 2000)}"
        if kind < 0.55 and T[t]["strs"]:
            c = self.r.choice(T[t]["strs"])
            if c in STR_LITS and self.r.random() < 0.6:
                lits = self.r.sample(STR_LITS[c], k=min(2, len(STR_LITS[c])))
                quoted = ", ".join(f"'{x}'" for x in lits)
                neg = "NOT " if self.r.random() < 0.3 else ""
                return f"{c} {neg}IN ({quoted})"
            return f"{c} LIKE '{self.r.choice(LIKE_PATS)}'"
        if kind < 0.7 and T[t]["nums"]:
            c = self.r.choice(T[t]["nums"])
            lo = self.r.randrange(0, 5000)
            return f"{c} BETWEEN {lo} AND {lo + self.r.randrange(100, 5000)}"
        if kind < 0.85 and T[t]["dates"]:
            c = self.r.choice(T[t]["dates"])
            op = self.r.choice(["<", ">="])
            return f"{c} {op} TIMESTAMP '{self.r.choice(DATE_LITS)} 00:00:00'"
        # NULL semantics through NULLIF (fixture has no natural NULLs)
        c = self.r.choice(T[t]["ints"])
        return self.r.choice([
            f"NULLIF({c} % 5, 0) IS NULL",
            f"NULLIF({c} % 5, 0) IS NOT NULL",
            f"COALESCE(NULLIF({c} % 3, 0), 99) > 1",
        ])

    def pred(self, t: str, depth: int = 0) -> str:
        if depth < 2 and self.r.random() < 0.4:
            glue = self.r.choice(["AND", "OR"])
            return f"({self.pred(t, depth + 1)} {glue} {self.pred(t, depth + 1)})"
        if self.r.random() < 0.1:
            return f"NOT ({self.atom_pred(t)})"
        return self.atom_pred(t)

    # -- aggregates ---------------------------------------------------
    def agg_expr(self, t: str, alias: str) -> str:
        choices = [
            "COUNT(*)",
            f"CAST(COUNT(DISTINCT {self.r.choice(T[t]['ints'])}) AS BIGINT)",
            f"CAST(SUM({self.int_expr(t)}) AS BIGINT)",
            f"MIN({self.r.choice(T[t]['ints'])})",
            f"MAX({self.int_expr(t)})",
            f"AVG({self.r.choice(T[t]['ints'])})",
        ]
        if T[t]["nums"]:
            c = self.r.choice(T[t]["nums"])
            choices += [
                f"SUM(CAST({c} AS DECIMAL(18,2)))",
                f"MIN(CAST({c} AS DECIMAL(18,2)))",
                f"MAX(CAST({c} AS DECIMAL(18,2)))",
            ]
        if T[t]["strs"]:
            c = self.r.choice(T[t]["strs"])
            choices += [f"MIN({c})", f"MAX({c})"]
        return f"{self.r.choice(choices)} AS {alias}"

    def group_cols(self, t: str) -> list[str]:
        pool = list(T[t]["strs"]) + [f"({c} % {self.r.randrange(2, 8)})" for c in T[t]["ints"]]
        if T[t]["dates"]:
            pool.append(f"EXTRACT(YEAR FROM {self.r.choice(T[t]['dates'])})")
        self.r.shuffle(pool)
        return pool[: self.r.randrange(1, 3)]

    # -- query shapes --------------------------------------------------
    def q_filter_project(self) -> str:
        t = self.r.choice(list(T))
        keys = self.key_cols(t)
        cols = [f"{self.scalar(t)} AS x{i}" for i in range(self.r.randrange(1, 4))]
        return (
            f"SELECT {', '.join(keys + cols)} FROM {t} "
            f"WHERE {self.pred(t)}"
        )

    def q_aggregate(self) -> str:
        t = self.r.choice(list(T))
        gs = self.group_cols(t)
        gnames = [f"g{i}" for i in range(len(gs))]
        gsel = ", ".join(f"{g} AS {n}" for g, n in zip(gs, gnames))
        aggs = ", ".join(self.agg_expr(t, f"a{i}") for i in range(self.r.randrange(1, 4)))
        where = f" WHERE {self.pred(t)}" if self.r.random() < 0.6 else ""
        having = f" HAVING COUNT(*) > {self.r.randrange(1, 4)}" if self.r.random() < 0.3 else ""
        return (
            f"SELECT {gsel}, {aggs} FROM {t}{where} "
            f"GROUP BY {', '.join(gs)}{having}"
        )

    def q_global_agg(self) -> str:
        t = self.r.choice(list(T))
        aggs = ", ".join(self.agg_expr(t, f"a{i}") for i in range(self.r.randrange(1, 4)))
        where = f" WHERE {self.pred(t)}" if self.r.random() < 0.7 else ""
        return f"SELECT {aggs} FROM {t}{where}"

    def q_join(self) -> str:
        lt, lc, rt, rc = self.r.choice(FK)
        jtype = self.r.choice(["JOIN", "LEFT JOIN", "JOIN", "JOIN"])
        frm = f"{lt} {jtype} {rt} ON {lt}.{lc} = {rt}.{rc}"
        # optionally extend one more hop from rt
        ext = [e for e in FK if e[0] == rt]
        t3 = None
        if ext and self.r.random() < 0.5:
            _, mc, t3, tc = self.r.choice(ext)
            frm += f" {self.r.choice(['JOIN', 'LEFT JOIN'])} {t3} ON {rt}.{mc} = {t3}.{tc}"
        where = f" WHERE {self.pred(lt)}" if self.r.random() < 0.5 else ""
        if self.r.random() < 0.6:
            gs = self.group_cols(rt if self.r.random() < 0.5 else lt)
            gnames = [f"g{i}" for i in range(len(gs))]
            gsel = ", ".join(f"{g} AS {n}" for g, n in zip(gs, gnames))
            aggs = ", ".join(self.agg_expr(lt, f"a{i}") for i in range(self.r.randrange(1, 3)))
            return f"SELECT {gsel}, {aggs} FROM {frm}{where} GROUP BY {', '.join(gs)}"
        keys = [f"{lt}.{k}" for k in self.key_cols(lt)]
        cols = [f"{self.scalar(rt)} AS x0"]
        return f"SELECT {', '.join(keys)}, {', '.join(cols)} FROM {frm}{where}"

    def q_window(self) -> str:
        t = self.r.choice([x for x in T if T[x]["key"]])  # simple key
        key = T[t]["key"]
        part = self.r.choice(
            T[t]["strs"] + [f"({self.r.choice(T[t]['ints'])} % 5)"]
        )
        order_col = self.r.choice(T[t]["ints"] + T[t]["nums"])
        fn = self.r.choice([
            f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {order_col}, {key})",
            f"RANK() OVER (PARTITION BY {part} ORDER BY {order_col})",
            f"DENSE_RANK() OVER (PARTITION BY {part} ORDER BY {order_col})",
            f"CAST(SUM({self.r.choice(T[t]['ints'])}) OVER (PARTITION BY {part} ORDER BY {order_col}, {key} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
            f"LAG({self.r.choice(T[t]['ints'])}, 1) OVER (PARTITION BY {part} ORDER BY {order_col}, {key})",
            f"LEAD({self.r.choice(T[t]['ints'])}, 1) OVER (PARTITION BY {part} ORDER BY {order_col}, {key})",
        ])
        inner = f"SELECT {key}, {fn} AS w FROM {t}"
        if self.r.random() < 0.5:
            return f"SELECT * FROM ({inner}) sub WHERE w <= {self.r.randrange(2, 6)}"
        return inner

    def q_setop(self) -> str:
        t = self.r.choice(list(T))
        expr = self.scalar(t)
        op = self.r.choice(
            ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
        )
        return (
            f"SELECT {expr} AS v FROM {t} WHERE {self.pred(t)} "
            f"{op} SELECT {expr} AS v FROM {t} WHERE {self.pred(t)}"
        )

    def q_order_limit(self) -> str:
        t = self.r.choice([x for x in T if T[x]["key"]])
        key = T[t]["key"]
        c = self.r.choice(T[t]["ints"] + T[t]["nums"])
        d = self.r.choice(["ASC", "DESC"])
        where = f" WHERE {self.pred(t)}" if self.r.random() < 0.5 else ""
        return (
            f"SELECT {key}, {self.scalar(t)} AS x0 FROM {t}{where} "
            f"ORDER BY {c} {d}, {key} LIMIT {self.r.randrange(5, 40)}"
        )

    def q_distinct(self) -> str:
        t = self.r.choice(list(T))
        exprs = [f"{self.scalar(t)} AS x{i}" for i in range(self.r.randrange(1, 3))]
        return f"SELECT DISTINCT {', '.join(exprs)} FROM {t} WHERE {self.pred(t)}"

    def q_subquery(self) -> str:
        # scalar subquery in a predicate — correlated forms are in the
        # certified suite; fuzz the uncorrelated shape composed with
        # random filters.
        t, lc, rt, rc = self.r.choice(FK)
        agg = f"(SELECT CAST(FLOOR(AVG({rc})) AS BIGINT) FROM {rt})"
        keys = self.key_cols(t)
        return (
            f"SELECT {', '.join(keys)} FROM {t} "
            f"WHERE {lc} <= {agg} AND {self.pred(t)}"
        )

    def q_exists(self) -> str:
        # correlated EXISTS / NOT EXISTS along an FK edge, composed
        # with random predicates on both sides — Catalyst decorrelates
        # to semi/anti joins, DuckDB to its own mark joins; results
        # must agree regardless of strategy.
        rt, rc, t, lc = self.r.choice(FK)  # reversed: parent has child
        neg = self.r.choice(["EXISTS", "NOT EXISTS"])
        keys = self.key_cols(t)
        return (
            f"SELECT {', '.join(keys)} FROM {t} WHERE {neg} ("
            f"SELECT 1 FROM {rt} WHERE {rt}.{rc} = {t}.{lc}"
            f" AND {self.pred(rt)}) AND {self.pred(t)}"
        )

    def q_in_subquery(self) -> str:
        rt, rc, t, lc = self.r.choice(FK)
        neg = "NOT " if self.r.random() < 0.4 else ""
        keys = self.key_cols(t)
        # NOT IN over a nullable projection is a classic three-valued-
        # logic trap, but rc is a key column (non-null) in every edge,
        # so both engines agree; keep the subquery side non-null.
        return (
            f"SELECT {', '.join(keys)} FROM {t} "
            f"WHERE {lc} {neg}IN (SELECT {rc} FROM {rt} WHERE {self.pred(rt)})"
        )

    def q_anti_join(self) -> str:
        # LEFT JOIN ... IS NULL — the manual anti-join; planner must
        # not lose rows to join-strategy differences.
        rt, rc, t, lc = self.r.choice(FK)
        keys = [f"{t}.{k}" for k in self.key_cols(t)]
        return (
            f"SELECT {', '.join(keys)} FROM {t} "
            f"LEFT JOIN (SELECT {rc} AS jk FROM {rt} WHERE {self.pred(rt)}) sub "
            f"ON {t}.{lc} = sub.jk WHERE sub.jk IS NULL"
        )

    def q_cte(self) -> str:
        # CTE consumed twice (aggregate + filter) — exercises each
        # engine's CTE materialization/inlining decisions.
        t = self.r.choice(list(T))
        gs = self.group_cols(t)[:1]
        return (
            f"WITH base AS (SELECT {gs[0]} AS g, COUNT(*) AS n FROM {t} "
            f"WHERE {self.pred(t)} GROUP BY {gs[0]}) "
            f"SELECT b.g, b.n FROM base b "
            f"JOIN (SELECT MAX(n) AS mx FROM base) m ON b.n = m.mx"
        )

    def q_date_funcs(self) -> str:
        t = self.r.choice([x for x in T if T[x]["dates"]])
        c = self.r.choice(T[t]["dates"])
        keys = self.key_cols(t)
        exprs = self.r.sample(
            [
                f"EXTRACT(YEAR FROM {c})",
                f"EXTRACT(MONTH FROM {c})",
                f"EXTRACT(DAY FROM {c})",
                f"EXTRACT(HOUR FROM {c})",
                f"DATE_TRUNC('week', {c})",
                f"DATE_TRUNC('quarter', {c})",
                f"CAST({c} AS DATE)",
                f"({c} + INTERVAL 7 DAY)",
                f"({c} - INTERVAL 90 DAY)",
            ],
            k=2,
        )
        cols = [f"{e} AS x{i}" for i, e in enumerate(exprs)]
        return (
            f"SELECT {', '.join(keys + cols)} FROM {t} WHERE {self.pred(t)}"
        )

    def q_join_having(self) -> str:
        lt, lc, rt, rc = self.r.choice(FK)
        gs = self.group_cols(rt)[:1]
        agg = self.agg_expr(lt, "a0")
        return (
            f"SELECT {gs[0]} AS g0, {agg} FROM {lt} "
            f"JOIN {rt} ON {lt}.{lc} = {rt}.{rc} "
            f"WHERE {self.pred(lt)} GROUP BY {gs[0]} "
            f"HAVING COUNT(*) >= {self.r.randrange(1, 5)}"
        )

    def q_rollup(self) -> str:
        # ROLLUP with GROUPING() disambiguators: super-aggregate NULLs
        # vs data NULLs must canonicalize identically in both engines.
        # GROUPING() returns tinyint in Spark, int in DuckDB — CAST.
        t = self.r.choice(list(T))
        g1, g2 = (self.group_cols(t) + self.group_cols(t))[:2]
        if g1 == g2:
            g2 = f"({self.r.choice(T[t]['ints'])} % 3)"
        agg = self.agg_expr(t, "a0")
        where = f" WHERE {self.pred(t)}" if self.r.random() < 0.5 else ""
        return (
            f"SELECT {g1} AS g0, {g2} AS g1, "
            f"CAST(GROUPING({g1}) AS BIGINT) AS gr0, "
            f"CAST(GROUPING({g2}) AS BIGINT) AS gr1, {agg} "
            f"FROM {t}{where} GROUP BY ROLLUP({g1}, {g2}) "
            # empty-input grand-total trap (dialect rule above)
            f"HAVING COUNT(*) > 0"
        )

    def q_grouping_sets(self) -> str:
        t = self.r.choice(list(T))
        g1, g2 = (self.group_cols(t) + self.group_cols(t))[:2]
        if g1 == g2:
            g2 = f"({self.r.choice(T[t]['ints'])} % 4)"
        agg = self.agg_expr(t, "a0")
        sets = self.r.choice(
            [f"(({g1}), ({g2}))", f"(({g1}, {g2}), ({g1}), ())"]
        )
        return (
            f"SELECT {g1} AS g0, {g2} AS g1, "
            f"CAST(GROUPING({g1}) AS BIGINT) AS gr0, "
            f"CAST(GROUPING({g2}) AS BIGINT) AS gr1, {agg} "
            f"FROM {t} GROUP BY GROUPING SETS {sets} "
            f"HAVING COUNT(*) > 0"
        )

    def q_range_frame(self) -> str:
        # RANGE frames are tie-safe (peers always included), so an
        # int ORDER key needs no tie-breaker for SUM/COUNT/MIN/MAX.
        t = self.r.choice([x for x in T if T[x]["key"]])
        key = T[t]["key"]
        part = self.r.choice(
            T[t]["strs"] + [f"({self.r.choice(T[t]['ints'])} % 4)"]
        )
        oc = self.r.choice(T[t]["ints"])
        lo = self.r.randrange(1, 50)
        frame = self.r.choice(
            [
                f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW",
                f"RANGE BETWEEN {lo} PRECEDING AND {lo} FOLLOWING",
                "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            ]
        )
        fn = self.r.choice(
            [
                f"CAST(SUM({self.r.choice(T[t]['ints'])}) OVER (PARTITION BY {part} ORDER BY {oc} {frame}) AS BIGINT)",
                f"COUNT(*) OVER (PARTITION BY {part} ORDER BY {oc} {frame})",
                f"MIN({self.r.choice(T[t]['ints'])}) OVER (PARTITION BY {part} ORDER BY {oc} {frame})",
            ]
        )
        return f"SELECT {key}, {fn} AS w FROM {t} WHERE {self.pred(t)}"

    def q_filter_distinct_agg(self) -> str:
        # FILTER-clause and DISTINCT aggregates (both dialects since
        # Spark 3.0 / DuckDB forever); COUNT(DISTINCT str) and
        # SUM(DISTINCT int) stay in exact integer land.
        t = self.r.choice(list(T))
        gs = self.group_cols(t)[:1]
        ic = self.r.choice(T[t]["ints"])
        aggs = self.r.sample(
            [
                f"COUNT(*) FILTER (WHERE {self.atom_pred(t)}) AS fa",
                f"COUNT(DISTINCT {self.r.choice(T[t]['strs'] + T[t]['ints'])}) AS da",
                f"CAST(SUM(DISTINCT {ic}) AS BIGINT) AS sa",
                f"CAST(SUM({ic}) FILTER (WHERE {self.atom_pred(t)}) AS BIGINT) AS sf",
            ],
            k=2,
        )
        return (
            f"SELECT {gs[0]} AS g0, {', '.join(aggs)} FROM {t} "
            f"GROUP BY {gs[0]}"
        )

    def q_string_funcs(self) -> str:
        # the function set where both dialects agree exactly (1-based
        # positive-offset SUBSTR; no INSTR/POSITION — return types and
        # 0-vs-1 conventions differ)
        t = self.r.choice(list(T))
        s = self.r.choice(T[t]["strs"])
        keys = self.key_cols(t)
        exprs = self.r.sample(
            [
                f"UPPER({s})",
                f"LOWER({s})",
                f"CAST(LENGTH({s}) AS BIGINT)",
                f"SUBSTR({s}, {self.r.randrange(1, 4)}, {self.r.randrange(1, 6)})",
                f"REPLACE({s}, '{self.r.choice('aeiou')}', '_')",
                f"TRIM({s})",
                f"CONCAT({s}, '#', {s})",
            ],
            k=2,
        )
        cols = [f"{e} AS x{i}" for i, e in enumerate(exprs)]
        return (
            f"SELECT {', '.join(keys + cols)} FROM {t} WHERE {self.pred(t)}"
        )

    def q_self_join_derived(self) -> str:
        # self-join of two derived aggregates of the same table on the
        # group key — each engine is free to reuse or re-plan the
        # subquery; results must agree either way.
        t = self.r.choice(list(T))
        g = self.group_cols(t)[0]
        p1, p2 = self.pred(t), self.pred(t)
        return (
            f"SELECT a.g AS g0, a.n AS n1, b.n AS n2 FROM "
            f"(SELECT {g} AS g, COUNT(*) AS n FROM {t} WHERE {p1} GROUP BY {g}) a "
            f"JOIN "
            f"(SELECT {g} AS g, COUNT(*) AS n FROM {t} WHERE {p2} GROUP BY {g}) b "
            f"ON a.g = b.g"
        )

    # -- events/timestamp family (r8): the TIMESTAMP(NANOS) column
    # whose schema-on-read normalization (session.py nanosAsLong +
    # registry truncation) has its own trap history — fuzz the time
    # semantics, not just the relational core. Kept out of T: no FK
    # edges, and ts is a TIMESTAMP (not DATE), so it gets its own
    # literal/bucket helpers.
    _EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]
    _TS_LITS = [
        "2024-01-05 00:00:00", "2024-01-12 12:00:00",
        "2024-01-20 06:30:00", "2024-01-28 23:00:00",
    ]

    def _ev_pred(self) -> str:
        opts = [
            f"event_type = '{self.r.choice(self._EVENT_TYPES)}'",
            f"event_type IN ({', '.join(repr(x) for x in self.r.sample(self._EVENT_TYPES, 2))})",
            f"ts >= TIMESTAMP '{self.r.choice(self._TS_LITS)}'",
            f"ts < TIMESTAMP '{self.r.choice(self._TS_LITS)}'",
            f"(user_id % {self.r.randrange(2, 9)}) = {self.r.randrange(0, 2)}",
        ]
        a, b = self.r.sample(opts, 2)
        return f"({a} {self.r.choice(['AND', 'OR'])} {b})"

    def q_event_time(self) -> str:
        kind = self.r.randrange(3)
        if kind == 0:
            # tumbling bucket aggregation — the i2 window class
            unit = self.r.choice(["hour", "day", "minute"])
            return (
                f"SELECT DATE_TRUNC('{unit}', ts) AS bucket, "
                f"event_type AS g0, COUNT(*) AS n, "
                f"CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v "
                f"FROM events WHERE {self._ev_pred()} "
                f"GROUP BY DATE_TRUNC('{unit}', ts), event_type"
            )
        if kind == 1:
            # projection: extracts + interval arithmetic over ts
            exprs = self.r.sample(
                [
                    "CAST(EXTRACT(HOUR FROM ts) AS BIGINT)",
                    "CAST(EXTRACT(DAY FROM ts) AS BIGINT)",
                    "CAST(EXTRACT(MINUTE FROM ts) AS BIGINT)",
                    "DATE_TRUNC('day', ts)",
                    "(ts + INTERVAL 3 HOUR)",
                    "(ts - INTERVAL 45 MINUTE)",
                    "CAST(ts AS DATE)",
                ],
                k=2,
            )
            cols = [f"{e} AS x{i}" for i, e in enumerate(exprs)]
            return (
                f"SELECT event_id, {', '.join(cols)} FROM events "
                f"WHERE {self._ev_pred()}"
            )
        # per-user ordered window over event time (total order via
        # event_id tie-break; raw stored doubles compare bit-exact)
        fn = self.r.choice(
            [
                "LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)",
                "LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)",
                "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)",
                "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
            ]
        )
        return (
            f"SELECT event_id, {fn} AS w FROM events "
            f"WHERE {self._ev_pred()}"
        )

    def q_case_agg(self) -> str:
        """r9: conditional aggregation (pivot-style SUM/COUNT over a
        CASE) — the agg form every BI layer emits, previously only
        reachable when q_aggregate happened to pick a CASE-free agg
        around a predicate-free SUM."""
        t = self.r.choice(list(T))
        gs = self.group_cols(t)
        gnames = [f"g{i}" for i in range(len(gs))]
        gsel = ", ".join(f"{g} AS {n}" for g, n in zip(gs, gnames))
        p1, p2 = self.pred(t), self.pred(t)
        aggs = [
            f"CAST(SUM(CASE WHEN {p1} THEN {self.int_expr(t)} ELSE 0 END)"
            f" AS BIGINT) AS a0",
            f"COUNT(CASE WHEN {p2} THEN 1 END) AS a1",
        ]
        if T[t]["nums"]:
            c = self.r.choice(T[t]["nums"])
            aggs.append(
                f"SUM(CASE WHEN {p1} THEN CAST({c} AS DECIMAL(18,2)) "
                f"ELSE CAST(0 AS DECIMAL(18,2)) END) AS a2"
            )
        return (
            f"SELECT {gsel}, {', '.join(aggs)} FROM {t} "
            f"GROUP BY {', '.join(gs)}"
        )

    def q_scalar_subquery(self) -> str:
        """r9: scalar subqueries in the projection — one uncorrelated
        (global MAX) and one equality-correlated child count over an
        FK edge (the common dialect subset both engines decorrelate
        to a join)."""
        lt, lc, rt, rc = self.r.choice(
            [e for e in FK if T[e[2]]["key"]]
        )
        keys = self.key_cols(rt)
        corr = (
            f"(SELECT COUNT(*) FROM {lt} WHERE {lt}.{lc} = {rt}.{rc}) AS n_child"
        )
        glob = (
            f"(SELECT MAX({self.r.choice(T[lt]['ints'])}) FROM {lt}) AS gmax"
        )
        where = f" WHERE {self.pred(rt)}" if self.r.random() < 0.5 else ""
        return f"SELECT {', '.join(keys)}, {corr}, {glob} FROM {rt}{where}"

    def query(self) -> str:
        shape = self.r.choice(
            [
                self.q_filter_project,
                self.q_aggregate,
                self.q_aggregate,
                self.q_global_agg,
                self.q_join,
                self.q_join,
                self.q_window,
                self.q_setop,
                self.q_order_limit,
                self.q_distinct,
                self.q_subquery,
                self.q_exists,
                self.q_in_subquery,
                self.q_anti_join,
                self.q_cte,
                self.q_date_funcs,
                self.q_join_having,
                # round-8 additions
                self.q_rollup,
                self.q_grouping_sets,
                self.q_range_frame,
                self.q_filter_distinct_agg,
                self.q_string_funcs,
                self.q_self_join_derived,
                self.q_event_time,
                self.q_event_time,
                # round-9 additions
                self.q_case_agg,
                self.q_scalar_subquery,
            ]
        )
        return shape()


# --- comparison (driver-faithful canon, numpy-scalar-normalized) ----

def _canon(pdf) -> list[str]:
    """Driver-faithful order/column canon PLUS the pandas-boundary
    type folds this harness needs and the driver doesn't: the same
    SQL text yields DECIMAL on both engines, but duckdb's .df()
    materializes DECIMAL as float64 while Spark's toPandas gives
    Decimal objects (and empty-group MAX as None vs NaN) — fold both
    to rounded float/None so only genuine VALUE divergence fails."""
    import decimal
    import math

    import numpy as np

    pdf = pdf[sorted(map(str, pdf.columns))]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        out = []
        for v in tup:
            if isinstance(v, np.generic):
                v = v.item()
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if hasattr(v, "to_pydatetime"):
                v = v.to_pydatetime()
            if isinstance(v, datetime.datetime) and v.time() == datetime.time(0):
                v = v.date()
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 9)
            out.append(repr(v))
        rows.append("|".join(out))
    return sorted(rows)


N_QUERIES = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "200"))
SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260815"))


@pytest.fixture(scope="module")
def spark_views(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark


def test_differential_fuzz(spark_views, duck):
    """Run N seeded random common-dialect queries on both engines;
    results must be canon-identical. On failure prints every
    divergent SQL with its index so it can be replayed standalone:
    SPARK_GRAFT_FUZZ_SEED=<seed> pytest -k differential -s
    """
    g = Gen(SEED)
    failures = []
    for i in range(N_QUERIES):
        sql = g.query()
        try:
            spdf = spark_views.sql(sql).toPandas()
            dpdf = duck.execute(sql).df()
        except Exception as e:  # parse/execution divergence is a finding too
            failures.append((i, sql, f"{type(e).__name__}: {str(e)[:200]}"))
            continue
        if len(spdf) != len(dpdf):
            failures.append((i, sql, f"rowcount {len(spdf)} vs {len(dpdf)}"))
            continue
        if sorted(map(str, spdf.columns)) != sorted(map(str, dpdf.columns)):
            failures.append(
                (i, sql, f"cols {sorted(spdf.columns)} vs {sorted(dpdf.columns)}")
            )
            continue
        cs, cd = _canon(spdf), _canon(dpdf)
        if cs != cd:
            diff = next(
                (a, b) for a, b in zip(cs, cd) if a != b
            ) if len(cs) == len(cd) else ("", "")
            failures.append((i, sql, f"values diverge, first: {diff[0][:120]} vs {diff[1][:120]}"))
    msg = "\n\n".join(f"[{i}] {s}\n  -> {why}" for i, s, why in failures)
    assert not failures, f"{len(failures)}/{N_QUERIES} fuzz divergences (seed={SEED}):\n{msg}"
