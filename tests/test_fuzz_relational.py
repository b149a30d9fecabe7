"""Differential query fuzzing: randomly composed filter -> groupBy ->
aggregate specs executed on BOTH engines from one spec.

The oracle suite pins 153 hand-written query pairs; this fuzzer covers
the composition space BETWEEN them — every case derives a Spark
DataFrame plan and a DuckDB SQL string from the same randomly drawn
spec, so any hash mismatch is an engine-semantics divergence (filter
pushdown interaction, grouping of computed keys, aggregate null
handling), not a transcription error. Seeds are fixed: the 16 cases
are deterministic, CI-stable, and each failure message prints the
full spec for replay.

Money aggregates run in exact integer cents (LONG) on both sides —
the repo-wide convention that makes sums order-independent and the
hashes bit-stable (see relational/tpch.py pricing_summary).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tools.check_oracle import frame_hash, normalize

LINEITEM = f"{SF_SMALL}/lineitem.parquet"

# ---- the spec space ------------------------------------------------------
# (name, spark column builder, duckdb SQL fragment)
FILTERS = [
    ("qty_lo", lambda: F.col("l_quantity") >= 25, "l_quantity >= 25"),
    ("qty_hi", lambda: F.col("l_quantity") < 40, "l_quantity < 40"),
    (
        "ship_96",
        lambda: F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"),
        "l_shipdate >= TIMESTAMP '1996-01-01'",
    ),
    (
        "ship_pre97",
        lambda: F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"),
        "l_shipdate < TIMESTAMP '1997-01-01'",
    ),
    ("flag_r", lambda: F.col("l_returnflag") == "R", "l_returnflag = 'R'"),
    ("disc_pos", lambda: F.col("l_discount") > 0.02, "l_discount > 0.02"),
]

KEYS = [
    ("l_returnflag", lambda: F.col("l_returnflag"), "l_returnflag"),
    ("l_linestatus", lambda: F.col("l_linestatus"), "l_linestatus"),
    (
        "ship_year",
        lambda: F.year("l_shipdate").cast("long"),
        "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)",
    ),
    (
        "supp_mod",
        lambda: (F.col("l_suppkey") % 10).cast("long"),
        "CAST(l_suppkey % 10 AS BIGINT)",
    ),
    (
        "qty_band",
        lambda: F.floor(F.col("l_quantity") / 10).cast("long"),
        "CAST(FLOOR(l_quantity / 10) AS BIGINT)",
    ),
]

_CENTS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
AGGS = [
    (
        "n_rows",
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "COUNT(*) AS n_rows",
    ),
    (
        "sum_cents",
        lambda: F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "sum_cents"
        ),
        f"SUM({_CENTS}) AS sum_cents",
    ),
    (
        "max_cents",
        lambda: F.max(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "max_cents"
        ),
        f"MAX({_CENTS}) AS max_cents",
    ),
    (
        "min_qty",
        lambda: F.min(F.col("l_quantity")).alias("min_qty"),
        "MIN(l_quantity) AS min_qty",
    ),
    (
        "n_parts",
        lambda: F.countDistinct("l_partkey").alias("n_parts"),
        "COUNT(DISTINCT l_partkey) AS n_parts",
    ),
    (
        "sum_qty",
        lambda: F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        "SUM(CAST(l_quantity AS BIGINT)) AS sum_qty",
    ),
]


def draw_spec(seed: int):
    rng = random.Random(seed)
    filters = rng.sample(FILTERS, rng.randint(0, 2))
    keys = rng.sample(KEYS, rng.randint(1, 2))
    aggs = rng.sample(AGGS, rng.randint(2, 3))
    return filters, keys, aggs


def spec_label(filters, keys, aggs) -> str:
    return (
        f"WHERE {[f[0] for f in filters]} "
        f"GROUP BY {[k[0] for k in keys]} AGG {[a[0] for a in aggs]}"
    )


@pytest.mark.parametrize("seed", range(16))
def test_random_composition_matches_duckdb(spark, seed):
    filters, keys, aggs = draw_spec(seed)

    # Spark side: declarative composition of the same spec
    df = spark.read.parquet(LINEITEM)
    for _, col, _ in filters:
        df = df.filter(col())
    got = (
        df.groupBy(*[k[1]().alias(k[0]) for k in keys])
        .agg(*[a[1]() for a in aggs])
        .toPandas()
    )

    # DuckDB side: the textbook SQL for the same spec
    where = (
        "WHERE " + " AND ".join(f[2] for f in filters) if filters else ""
    )
    key_sql = ", ".join(f"{k[2]} AS {k[0]}" for k in keys)
    agg_sql = ", ".join(a[2] for a in aggs)
    sql = (
        f"SELECT {key_sql}, {agg_sql} FROM lineitem {where} "
        f"GROUP BY {', '.join(k[0] for k in keys)}"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    want = con.sql(sql).df()

    label = spec_label(filters, keys, aggs)
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w = normalize(got), normalize(want)
    assert sorted(g.columns) == sorted(w.columns), label
    assert frame_hash(g) == frame_hash(w), f"value hash: {label}\n{sql}"


# ---- join compositions ---------------------------------------------------
ORDER_FILTERS = [
    ("stat_f", lambda: F.col("o_orderstatus") == "F", "o_orderstatus = 'F'"),
    (
        "od_96",
        lambda: F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"),
        "o_orderdate >= TIMESTAMP '1996-01-01'",
    ),
    (
        "prio_urgent",
        lambda: F.col("o_orderpriority") == "1-URGENT",
        "o_orderpriority = '1-URGENT'",
    ),
]

JOIN_KEYS = [
    ("o_orderstatus", lambda: F.col("o_orderstatus"), "o_orderstatus"),
    ("o_orderpriority", lambda: F.col("o_orderpriority"), "o_orderpriority"),
    (
        "order_year",
        lambda: F.year("o_orderdate").cast("long"),
        "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)",
    ),
] + KEYS[:3]


@pytest.mark.parametrize("seed", range(100, 110))
def test_random_join_composition_matches_duckdb(spark, seed):
    """Same contract through a fact-fact join: filters drawn on BOTH
    sides must push through the join identically in both engines."""
    orders_path = f"{SF_SMALL}/orders.parquet"
    rng = random.Random(seed)
    lfilters = rng.sample(FILTERS, rng.randint(0, 2))
    ofilters = rng.sample(ORDER_FILTERS, rng.randint(0, 2))
    keys = rng.sample(JOIN_KEYS, rng.randint(1, 2))
    aggs = rng.sample(AGGS, rng.randint(2, 3))

    line = spark.read.parquet(LINEITEM)
    for _, col, _ in lfilters:
        line = line.filter(col())
    orders = spark.read.parquet(orders_path)
    for _, col, _ in ofilters:
        orders = orders.filter(col())
    got = (
        line.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(*[k[1]().alias(k[0]) for k in keys])
        .agg(*[a[1]() for a in aggs])
        .toPandas()
    )

    conds = [f[2] for f in lfilters] + [f[2] for f in ofilters]
    where = "WHERE " + " AND ".join(conds) if conds else ""
    key_sql = ", ".join(f"{k[2]} AS {k[0]}" for k in keys)
    agg_sql = ", ".join(a[2] for a in aggs)
    sql = (
        f"SELECT {key_sql}, {agg_sql} FROM lineitem "
        f"JOIN orders ON l_orderkey = o_orderkey {where} "
        f"GROUP BY {', '.join(k[0] for k in keys)}"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{orders_path}'")
    want = con.sql(sql).df()

    label = (
        f"l={[f[0] for f in lfilters]} o={[f[0] for f in ofilters]} "
        f"k={[k[0] for k in keys]} a={[a[0] for a in aggs]}"
    )
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w = normalize(got), normalize(want)
    assert frame_hash(g) == frame_hash(w), f"value hash: {label}\n{sql}"


# ---- window-function compositions -----------------------------------------
# The engine's most-used primitive class between the hand-written
# oracle pairs: specs draw partition keys, an order expression, and a
# mix of ranking / offset / frame aggregates, then replay in DuckDB.
#
# Determinism contract: ranking functions (rank/dense_rank) order by
# the bare expression — peers share a rank, so ties are well-defined;
# everything row-positional (row_number, lag/lead, ROWS frames) appends
# the unique (l_orderkey, l_linenumber) tiebreaker so the total order
# is identical in both engines. Frame sums run in exact integer cents.

ORDER_EXPRS = [
    ("by_qty", lambda: F.col("l_quantity"), "l_quantity"),
    (
        "by_cents",
        lambda: F.round(F.col("l_extendedprice") * 100).cast("long"),
        _CENTS,
    ),
    ("by_ship", lambda: F.col("l_shipdate"), "l_shipdate"),
]

# (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem —
# duplicated line rows with different payloads exist — so the
# positional tiebreak appends cents and quantity; rows still tied after
# that are full-duplicate window inputs and therefore interchangeable.
def _tie():
    return [
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.round(F.col("l_extendedprice") * 100).cast("long"),
        F.col("l_quantity"),
    ]


_TIE_SQL = f"l_orderkey, l_linenumber, {_CENTS}, l_quantity"


def _wf_pool():
    from pyspark.sql import Window

    cents = lambda: F.round(F.col("l_extendedprice") * 100).cast("long")

    def total(w):  # positional: unique total order
        return w[0].orderBy(w[1](), *_tie())

    def peers(w):  # ranking: peers share rank, no tiebreaker
        return w[0].orderBy(w[1]())

    return [
        (
            "row_num",
            lambda w: F.row_number().over(total(w)),
            lambda o: f"ROW_NUMBER() OVER ({{P}} ORDER BY {o}, {_TIE_SQL})",
        ),
        (
            "rnk",
            lambda w: F.rank().over(peers(w)),
            lambda o: f"RANK() OVER ({{P}} ORDER BY {o})",
        ),
        (
            "drnk",
            lambda w: F.dense_rank().over(peers(w)),
            lambda o: f"DENSE_RANK() OVER ({{P}} ORDER BY {o})",
        ),
        (
            "lag_cents",
            lambda w: F.lag(cents(), 1).over(total(w)),
            lambda o: f"LAG({_CENTS}, 1) OVER ({{P}} ORDER BY {o}, {_TIE_SQL})",
        ),
        (
            "lead_qty",
            lambda w: F.lead(F.col("l_quantity"), 2).over(total(w)),
            lambda o: f"LEAD(l_quantity, 2) OVER ({{P}} ORDER BY {o}, {_TIE_SQL})",
        ),
        (
            "cum_cents",
            lambda w: F.sum(cents()).over(
                total(w).rowsBetween(Window.unboundedPreceding, 0)
            ),
            lambda o: (
                f"SUM({_CENTS}) OVER ({{P}} ORDER BY {o}, {_TIE_SQL} "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            ),
        ),
        (
            "roll_max_cents",
            lambda w: F.max(cents()).over(total(w).rowsBetween(-3, 0)),
            lambda o: (
                f"MAX({_CENTS}) OVER ({{P}} ORDER BY {o}, {_TIE_SQL} "
                "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
            ),
        ),
        (
            "roll_min_qty",
            lambda w: F.min(F.col("l_quantity")).over(
                total(w).rowsBetween(-2, 1)
            ),
            lambda o: (
                f"MIN(l_quantity) OVER ({{P}} ORDER BY {o}, {_TIE_SQL} "
                "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)"
            ),
        ),
        (
            "ntile4",
            lambda w: F.ntile(4).over(total(w)),
            lambda o: f"NTILE(4) OVER ({{P}} ORDER BY {o}, {_TIE_SQL})",
        ),
        # distribution ranks: peers ordering (ties share a value); both
        # engines compute the same single division of exact integers
        (
            "pct_rank",
            lambda w: F.percent_rank().over(peers(w)),
            lambda o: f"PERCENT_RANK() OVER ({{P}} ORDER BY {o})",
        ),
        (
            "cume",
            lambda w: F.cume_dist().over(peers(w)),
            lambda o: f"CUME_DIST() OVER ({{P}} ORDER BY {o})",
        ),
        (
            "pct_cnt",
            lambda w: F.count(F.lit(1)).over(
                total(w).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            lambda o: (
                f"COUNT(*) OVER ({{P}} ORDER BY {o}, {_TIE_SQL} "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
            ),
        ),
    ]


@pytest.mark.parametrize("seed", range(200, 216))
def test_random_window_composition_matches_duckdb(spark, seed):
    from pyspark.sql import Window

    rng = random.Random(seed)
    filters = rng.sample(FILTERS, rng.randint(0, 1))
    pkeys = rng.sample(KEYS, rng.randint(0, 2))
    order = rng.choice(ORDER_EXPRS)
    funcs = rng.sample(_wf_pool(), rng.randint(2, 3))

    base = Window.partitionBy(*[k[1]() for k in pkeys]) if pkeys else (
        Window.partitionBy()
    )
    w = (base, order[1])

    df = spark.read.parquet(LINEITEM)
    for _, col, _ in filters:
        df = df.filter(col())
    got = df.select(
        "l_orderkey",
        "l_linenumber",
        *[fn[1](w).alias(fn[0]) for fn in funcs],
    ).toPandas()

    p_sql = (
        "PARTITION BY " + ", ".join(k[2] for k in pkeys) if pkeys else ""
    )
    where = "WHERE " + " AND ".join(f[2] for f in filters) if filters else ""
    fn_sql = ", ".join(
        fn[2](order[2]).replace("{P}", p_sql) + f" AS {fn[0]}"
        for fn in funcs
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, {fn_sql} "
        f"FROM lineitem {where}"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    want = con.sql(sql).df()

    label = (
        f"f={[f[0] for f in filters]} p={[k[0] for k in pkeys]} "
        f"o={order[0]} fn={[fn[0] for fn in funcs]}"
    )
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w2 = normalize(got), normalize(want)
    assert sorted(g.columns) == sorted(w2.columns), label
    assert frame_hash(g) == frame_hash(w2), f"value hash: {label}\n{sql}"


# ---- grouping-set compositions (ROLLUP / CUBE + grouping_id) --------------
# The r9 hierarchy-report family (region_nation_rollup, events_cube)
# fuzzed between the hand-written pairs: specs draw 2-3 keys, a
# grouping mode, and integer aggregates; GROUPING_ID is computed over
# the same key order on both engines so every subtotal row is labeled
# identically. Aggregates stay exact-integer (the repo convention), so
# the hash is bit-stable.

GROUP_MODES = ["rollup", "cube"]


@pytest.mark.parametrize("seed", range(300, 308))
def test_random_grouping_sets_match_duckdb(spark, seed):
    rng = random.Random(seed)
    filters = rng.sample(FILTERS, rng.randint(0, 1))
    keys = rng.sample(KEYS, rng.randint(2, 3))
    aggs = rng.sample(AGGS, rng.randint(2, 3))
    mode = rng.choice(GROUP_MODES)

    df = spark.read.parquet(LINEITEM)
    for _, col, _ in filters:
        df = df.filter(col())
    grouped = (
        df.rollup(*[k[1]().alias(k[0]) for k in keys])
        if mode == "rollup"
        else df.cube(*[k[1]().alias(k[0]) for k in keys])
    )
    got = grouped.agg(
        F.grouping_id().cast("long").alias("gid"),
        *[a[1]() for a in aggs],
    ).toPandas()

    where = "WHERE " + " AND ".join(f[2] for f in filters) if filters else ""
    key_sql = ", ".join(f"{k[2]} AS {k[0]}" for k in keys)
    gsql = ", ".join(k[2] for k in keys)
    agg_sql = ", ".join(a[2] for a in aggs)
    sql = (
        f"SELECT {key_sql}, CAST(GROUPING({gsql}) AS BIGINT) AS gid, "
        f"{agg_sql} FROM lineitem {where} "
        f"GROUP BY {mode.upper()}({gsql})"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    want = con.sql(sql).df()

    label = (
        f"{mode} f={[f[0] for f in filters]} k={[k[0] for k in keys]} "
        f"a={[a[0] for a in aggs]}"
    )
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w = normalize(got), normalize(want)
    assert sorted(g.columns) == sorted(w.columns), label
    assert frame_hash(g) == frame_hash(w), f"value hash: {label}\n{sql}"


# ---- ordered string-aggregation compositions ------------------------------
# The region_nations_csv family: per-order CSV cells (groups bounded by
# basket size, <= 7 rows) with an explicit ORDER BY inside the
# aggregate. Spark derives the same order via array_sort over
# (order-key, tiebreak, value) structs — determinism from sorting, never
# from collect order; DESC variants reverse the sorted array.

STRAGG_VALUES = [
    (
        "linenum",
        "CAST(l_linenumber AS VARCHAR)",
        lambda: F.col("l_linenumber").cast("string"),
    ),
    (
        "qty",
        "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)",
        lambda: F.col("l_quantity").cast("long").cast("string"),
    ),
    (
        "cents",
        f"CAST({_CENTS} AS VARCHAR)",
        lambda: F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .cast("string"),
    ),
]

# (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
# (duplicated line rows with different payloads exist), so every ORDER
# BY below is totalized by appending the aggregated VALUE itself as the
# last sort key — rows still tied after that are interchangeable
# because all their sort keys AND the emitted value are equal.
STRAGG_ORDERS = [
    ("by_line", "l_linenumber", lambda: F.col("l_linenumber"), False),
    (
        "by_qty_desc",
        "l_quantity DESC, l_linenumber DESC",
        lambda: F.col("l_quantity"),
        True,
    ),
    (
        "by_cents",
        f"{_CENTS}, l_linenumber",
        lambda: F.round(F.col("l_extendedprice") * 100).cast("long"),
        False,
    ),
]


@pytest.mark.parametrize("seed", range(400, 406))
def test_random_ordered_string_agg_matches_duckdb(spark, seed):
    rng = random.Random(seed)
    filters = rng.sample(FILTERS, rng.randint(0, 1))
    val = rng.choice(STRAGG_VALUES)
    order = rng.choice(STRAGG_ORDERS)

    df = spark.read.parquet(LINEITEM)
    for _, col, _ in filters:
        df = df.filter(col())
    # struct sort: (order expr, l_linenumber tiebreak, value) —
    # lexicographic struct comparison IS the ORDER BY; reverse for DESC
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                order[2]().alias("o"),
                F.col("l_linenumber").alias("t"),
                val[2]().alias("v"),
            )
        )
    )
    if order[3]:
        arr = F.reverse(arr)
    val_dir = " DESC" if order[3] else ""
    got = (
        df.groupBy(F.col("l_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.array_join(
                F.transform(arr, lambda x: x["v"]), ","
            ).alias("csv"),
        )
        .toPandas()
    )

    where = "WHERE " + " AND ".join(f[2] for f in filters) if filters else ""
    sql = (
        f"SELECT l_orderkey, COUNT(*) AS n_items, "
        f"STRING_AGG({val[1]}, ',' "
        f"ORDER BY {order[1]}, {val[1]}{val_dir}) AS csv "
        f"FROM lineitem {where} GROUP BY l_orderkey"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    want = con.sql(sql).df()

    label = f"f={[f[0] for f in filters]} v={val[0]} o={order[0]}"
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w = normalize(got), normalize(want)
    assert frame_hash(g) == frame_hash(w), f"value hash: {label}\n{sql}"


# ---- bounded-frame percentile compositions --------------------------------
# The rolling_median family: exact interpolated percentiles over ROWS
# frames. Inputs are integer-valued (quantity, cents) and p is a
# quarter fraction, so the type-7 interpolation is exact in double on
# both engines — no rounding ambiguity exists to begin with.

PCT_VALUES = [
    ("qty", "l_quantity", lambda: F.col("l_quantity")),
    (
        "cents",
        _CENTS,
        lambda: F.round(F.col("l_extendedprice") * 100).cast("long"),
    ),
]

PCT_FRAMES = [("p3c", -3, 0), ("p6c", -6, 0), ("p4f2", -4, 2)]
PCT_PS = [0.25, 0.5, 0.75]


@pytest.mark.parametrize("seed", range(500, 506))
def test_random_bounded_frame_percentile_matches_duckdb(spark, seed):
    from pyspark.sql import Window

    rng = random.Random(seed)
    filters = rng.sample(FILTERS, rng.randint(0, 1))
    pkeys = rng.sample(KEYS, rng.randint(0, 1))
    val = rng.choice(PCT_VALUES)
    frame = rng.choice(PCT_FRAMES)
    p = rng.choice(PCT_PS)

    base = (
        Window.partitionBy(*[k[1]() for k in pkeys])
        if pkeys
        else Window.partitionBy()
    )
    # (l_orderkey, l_linenumber) is not unique in the synthetic data;
    # appending the value expression itself makes the order total (any
    # residual ties have equal window inputs, so they are harmless)
    w = base.orderBy(
        F.col("l_orderkey"), F.col("l_linenumber"), val[2]()
    ).rowsBetween(frame[1], frame[2])

    df = spark.read.parquet(LINEITEM)
    for _, col, _ in filters:
        df = df.filter(col())
    got = df.select(
        "l_orderkey",
        "l_linenumber",
        F.percentile(val[2](), F.lit(p)).over(w).alias("pct"),
    ).toPandas()

    p_sql = (
        "PARTITION BY " + ", ".join(k[2] for k in pkeys) if pkeys else ""
    )
    lead = (
        f"{-frame[1]} PRECEDING AND "
        + (f"{frame[2]} FOLLOWING" if frame[2] > 0 else "CURRENT ROW")
    )
    where = "WHERE " + " AND ".join(f[2] for f in filters) if filters else ""
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"QUANTILE_CONT({val[1]}, {p}) OVER ({p_sql} "
        f"ORDER BY l_orderkey, l_linenumber, {val[1]} "
        f"ROWS BETWEEN {lead}) AS pct "
        f"FROM lineitem {where}"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    want = con.sql(sql).df()

    label = (
        f"f={[f[0] for f in filters]} p={[k[0] for k in pkeys]} "
        f"v={val[0]} fr={frame[0]} q={p}"
    )
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w2 = normalize(got), normalize(want)
    assert frame_hash(g) == frame_hash(w2), f"value hash: {label}\n{sql}"


# ---- IGNORE-NULLS carry-forward compositions ------------------------------
# The purchase_attribution family: last(expr_if_cond, ignorenulls) over
# a running frame == LAST_VALUE(CASE ... END IGNORE NULLS). Specs draw
# the carried value, the gating condition, the frame end (current row
# vs 1 preceding), and an optional partition key; the order is the
# totalized positional tiebreak.

CARRY_VALUES = [
    (
        "cents",
        _CENTS,
        lambda: F.round(F.col("l_extendedprice") * 100).cast("long"),
    ),
    ("qty", "l_quantity", lambda: F.col("l_quantity")),
    ("line", "l_linenumber", lambda: F.col("l_linenumber")),
]

CARRY_CONDS = [
    ("flag_r", "l_returnflag = 'R'", lambda: F.col("l_returnflag") == "R"),
    ("qty_25", "l_quantity >= 25", lambda: F.col("l_quantity") >= 25),
    ("disc", "l_discount > 0.02", lambda: F.col("l_discount") > 0.02),
]

CARRY_ENDS = [("cur", 0, "CURRENT ROW"), ("prev", -1, "1 PRECEDING")]


@pytest.mark.parametrize("seed", range(600, 606))
def test_random_ignore_nulls_carry_matches_duckdb(spark, seed):
    from pyspark.sql import Window

    rng = random.Random(seed)
    pkeys = rng.sample(KEYS, rng.randint(0, 1))
    val = rng.choice(CARRY_VALUES)
    cond = rng.choice(CARRY_CONDS)
    end = rng.choice(CARRY_ENDS)

    base = (
        Window.partitionBy(*[k[1]() for k in pkeys])
        if pkeys
        else Window.partitionBy()
    )
    w = base.orderBy(*_tie()).rowsBetween(Window.unboundedPreceding, end[1])

    df = spark.read.parquet(LINEITEM)
    got = df.select(
        "l_orderkey",
        "l_linenumber",
        F.last(
            F.when(cond[2](), val[2]()), ignorenulls=True
        ).over(w).alias("carried"),
    ).toPandas()

    p_sql = (
        "PARTITION BY " + ", ".join(k[2] for k in pkeys) if pkeys else ""
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"LAST_VALUE(CASE WHEN {cond[1]} THEN {val[1]} END IGNORE NULLS) "
        f"OVER ({p_sql} ORDER BY {_TIE_SQL} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND {end[2]}) AS carried "
        f"FROM lineitem"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    want = con.sql(sql).df()

    label = (
        f"p={[k[0] for k in pkeys]} v={val[0]} c={cond[0]} end={end[0]}"
    )
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w2 = normalize(got), normalize(want)
    assert frame_hash(g) == frame_hash(w2), f"value hash: {label}\n{sql}"


# ---- semi / anti join (EXISTS subquery) compositions -----------------------
# Spark's left_semi/left_anti against the textbook EXISTS / NOT EXISTS
# correlated subquery — the decorrelation path both engines optimize
# differently, composed with filters drawn on BOTH sides and the
# integer-exact aggregate pool.


@pytest.mark.parametrize("seed", range(700, 706))
def test_random_semi_anti_composition_matches_duckdb(spark, seed):
    orders_path = f"{SF_SMALL}/orders.parquet"
    rng = random.Random(seed)
    lfilters = rng.sample(FILTERS, rng.randint(0, 1))
    ofilters = rng.sample(ORDER_FILTERS, rng.randint(1, 2))
    keys = rng.sample(KEYS, rng.randint(1, 2))
    aggs = rng.sample(AGGS, rng.randint(2, 3))
    anti = rng.random() < 0.5

    line = spark.read.parquet(LINEITEM)
    for _, col, _ in lfilters:
        line = line.filter(col())
    orders = spark.read.parquet(orders_path)
    for _, col, _ in ofilters:
        orders = orders.filter(col())
    got = (
        line.join(
            orders,
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti" if anti else "left_semi",
        )
        .groupBy(*[k[1]().alias(k[0]) for k in keys])
        .agg(*[a[1]() for a in aggs])
        .toPandas()
    )

    o_where = " AND ".join(f[2] for f in ofilters)
    l_where = (
        "AND " + " AND ".join(f[2] for f in lfilters) if lfilters else ""
    )
    verb = "NOT EXISTS" if anti else "EXISTS"
    key_sql = ", ".join(f"{k[2]} AS {k[0]}" for k in keys)
    agg_sql = ", ".join(a[2] for a in aggs)
    sql = (
        f"SELECT {key_sql}, {agg_sql} FROM lineitem "
        f"WHERE {verb} (SELECT 1 FROM orders "
        f"WHERE o_orderkey = l_orderkey AND {o_where}) {l_where} "
        f"GROUP BY {', '.join(k[0] for k in keys)}"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{orders_path}'")
    want = con.sql(sql).df()

    label = (
        f"{'anti' if anti else 'semi'} l={[f[0] for f in lfilters]} "
        f"o={[f[0] for f in ofilters]} k={[k[0] for k in keys]} "
        f"a={[a[0] for a in aggs]}"
    )
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w = normalize(got), normalize(want)
    assert sorted(g.columns) == sorted(w.columns), label
    assert frame_hash(g) == frame_hash(w), f"value hash: {label}\n{sql}"


# ---- set-operation compositions (INTERSECT / EXCEPT / UNION ALL) -----------
# Spark's intersectAll/exceptAll/unionAll against the SQL set verbs —
# bag semantics (ALL) so duplicate rows count, composed from two
# filtered projections of the same fact table.

SETOP_PROJS = [
    (
        "flag_stat",
        ["l_returnflag", "l_linestatus"],
        "l_returnflag, l_linestatus",
    ),
    (
        "key_qty",
        ["l_orderkey", "l_quantity"],
        "l_orderkey, l_quantity",
    ),
    (
        "supp_year",
        None,  # computed below
        "CAST(l_suppkey % 10 AS BIGINT) AS sm, "
        "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS sy",
    ),
]


@pytest.mark.parametrize("seed", range(800, 806))
def test_random_set_op_composition_matches_duckdb(spark, seed):
    rng = random.Random(seed)
    fa = rng.choice(FILTERS)
    fb = rng.choice([f for f in FILTERS if f[0] != fa[0]])
    proj = rng.choice(SETOP_PROJS)
    op = rng.choice(["intersect", "except", "union"])

    df = spark.read.parquet(LINEITEM)

    def side(flt):
        d = df.filter(flt[1]())
        if proj[1] is not None:
            return d.select(*proj[1])
        return d.select(
            (F.col("l_suppkey") % 10).cast("long").alias("sm"),
            F.year("l_shipdate").cast("long").alias("sy"),
        )

    a, b = side(fa), side(fb)
    if op == "intersect":
        got = a.intersectAll(b).toPandas()
        verb = "INTERSECT ALL"
    elif op == "except":
        got = a.exceptAll(b).toPandas()
        verb = "EXCEPT ALL"
    else:
        got = a.unionAll(b).toPandas()
        verb = "UNION ALL"

    sql = (
        f"SELECT {proj[2]} FROM lineitem WHERE {fa[2]} "
        f"{verb} "
        f"SELECT {proj[2]} FROM lineitem WHERE {fb[2]}"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
    want = con.sql(sql).df()

    label = f"{op} a={fa[0]} b={fb[0]} proj={proj[0]}"
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w = normalize(got), normalize(want)
    assert frame_hash(g) == frame_hash(w), f"value hash: {label}\n{sql}"


# ---- datetime-function compositions ----------------------------------------
# Cross-engine datetime semantics are a classic divergence source
# (week start, truncation of sub-second units, extract field names);
# these specs pin Spark's date_trunc/extract surface against DuckDB
# over the microsecond event timestamps. All outputs are exact
# integers/timestamps — nothing to round. DOW is deliberately absent
# (Spark dayofweek is 1=Sunday, DuckDB dow is 0=Sunday: a known
# mapping difference, not a parity target).

EVENTS = f"{SF_SMALL}/events.parquet"

TRUNC_UNITS = ["year", "quarter", "month", "week", "day", "hour"]
EXTRACT_FIELDS = [
    ("ex_year", lambda: F.year("ts"), "year(ts)"),
    ("ex_month", lambda: F.month("ts"), "month(ts)"),
    ("ex_day", lambda: F.dayofmonth("ts"), "day(ts)"),
    ("ex_hour", lambda: F.hour("ts"), "hour(ts)"),
    ("ex_minute", lambda: F.minute("ts"), "minute(ts)"),
    ("ex_doy", lambda: F.dayofyear("ts"), "dayofyear(ts)"),
]
DT_FILTERS = [
    ("all", None, "TRUE"),
    (
        "after_j10",
        lambda: F.col("ts") >= "2024-01-10",
        "ts >= TIMESTAMP '2024-01-10 00:00:00'",
    ),
    (
        "clicks",
        lambda: F.col("event_type") == "click",
        "event_type = 'click'",
    ),
]


@pytest.mark.parametrize("seed", range(900, 910))
def test_random_datetime_composition_matches_duckdb(spark, seed):
    rng = random.Random(seed)
    unit = rng.choice(TRUNC_UNITS)
    fields = rng.sample(EXTRACT_FIELDS, rng.randint(1, 2))
    flt = rng.choice(DT_FILTERS)

    df = spark.read.parquet(EVENTS)
    if flt[1] is not None:
        df = df.filter(flt[1]())
    got = (
        df.groupBy(
            F.date_trunc(unit, "ts").alias("bucket"),
            *[f[1]().cast("long").alias(f[0]) for f in fields],
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("bucket", *[f[0] for f in fields])
        .toPandas()
    )

    fields_sql = ", ".join(
        f"CAST({f[2]} AS BIGINT) AS {f[0]}" for f in fields
    )
    names = ", ".join(f[0] for f in fields)
    sql = (
        f"SELECT date_trunc('{unit}', ts) AS bucket, {fields_sql}, "
        "COUNT(*) AS n, MIN(ts) AS first_ts, MAX(ts) AS last_ts "
        f"FROM events WHERE {flt[2]} "
        f"GROUP BY bucket, {names} ORDER BY bucket, {names}"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{EVENTS}'")
    want = con.sql(sql).df()

    label = f"unit={unit} fields={[f[0] for f in fields]} filter={flt[0]}"
    assert len(got) == len(want), f"row count: {label}\n{sql}"
    g, w = normalize(got), normalize(want)
    assert frame_hash(g) == frame_hash(w), f"value hash: {label}\n{sql}"
