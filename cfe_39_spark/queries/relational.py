"""Relational operator surface (SURVEY.md §2.3 R1-R24), one oracle-checked
query per operator family over the driver's TPC-H-ish testdata.

All queries are pure DataFrame plans — Catalyst handles pushdown, pruning
and join-strategy selection (SURVEY.md §4.1); tests assert the physical
plan properties (PushedFilters, broadcast, TakeOrderedAndProject) at
sf0.001 so a regression that silently de-optimizes a plan fails CI.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .base import register, table


# ------------------------------------------------------------------ #
# R1 scan + projection / R2 filter pushdown (one query: the plan tests
# assert BOTH the pruned ReadSchema and the PushedFilters list on it)
# ------------------------------------------------------------------ #
@register(
    "r01_scan_filter_pushdown",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         AND l_shipdate <  TIMESTAMP '1996-01-01'
         AND l_returnflag IN ('A', 'R')
         AND l_quantity > 25""",
)
def r01(spark, sf):
    """R1+R2: column-pruned scan with conjunctive predicates — ReadSchema
    shows only the 5 referenced columns and every filter is pushed to the
    parquet scan (asserted in tests/test_plans.py)."""
    li = table(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_quantity") > 25)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# ------------------------------------------------------------------ #
# R3/R4 equi-joins (broadcast + sort-merge)
# ------------------------------------------------------------------ #
@register(
    "r03_broadcast_join",
    """SELECT p.p_brand,
              CAST(count(*) AS BIGINT) AS n_lines,
              ROUND(sum(l.l_extendedprice), 2) AS revenue
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       GROUP BY p.p_brand""",
)
def r03(spark, sf):
    """R3: fact ⋈ small dim — explicit broadcast() hint; at 100 TB the dim
    still fits in memory, so this never shuffles the fact side."""
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "r04_sortmerge_join",
    """SELECT o.o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_lines,
              ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY o.o_orderpriority""",
)
def r04(spark, sf):
    """R4: large-large equi-join — sort-merge/shuffled-hash territory; both
    sides shuffle on the join key once, AQE coalesces the result."""
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


# ------------------------------------------------------------------ #
# R5 theta/range join, R6 as-of join
# ------------------------------------------------------------------ #
@register(
    "r05_range_join",
    """SELECT a.event_type,
              CAST(count(*) AS BIGINT) AS n_pairs
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND b.ts > a.ts
        AND b.ts <= a.ts + INTERVAL 5 MINUTE
       GROUP BY a.event_type""",
)
def r05(spark, sf):
    """R5: banded self range-join — equi key (user_id) carries the shuffle,
    the time band is a post-join residual, so this is NOT a nested-loop."""
    e = table(spark, sf, "events")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "r06_asof_join",
    """SELECT o_orderkey, event_id AS last_event_id, event_type AS last_event_type
       FROM (
         SELECT o.o_orderkey, e.event_id, e.event_type,
                row_number() OVER (
                  PARTITION BY o.o_orderkey
                  ORDER BY e.ts DESC, e.event_id DESC) AS rn
         FROM orders o JOIN events e
           ON e.user_id = o.o_custkey
          AND e.ts <= o.o_orderdate + INTERVAL 29 YEAR
       ) WHERE rn = 1""",
)
def r06(spark, sf):
    """R6: as-of join — latest event per (order, shifted cutoff).
    Composition: equi-join on key + row_number over event-time (SURVEY.md
    §2.3 R6).  The +29y shift aligns the 1995-2001 order dates with the
    2024 event window so the cutoff bites mid-stream."""
    o = table(spark, sf, "orders")
    e = table(spark, sf, "events")
    cutoff = F.col("o_orderdate") + F.expr("INTERVAL 29 YEARS")
    j = o.join(e, (e.user_id == o.o_custkey) & (e.ts <= cutoff))
    w = Window.partitionBy("o_orderkey").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "o_orderkey",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
    )


# ------------------------------------------------------------------ #
# R7/R8/R9 semi / anti / outer joins
# ------------------------------------------------------------------ #
@register(
    "r07_semi_anti_join",
    """SELECT 'semi' AS op, c_custkey, c_mktsegment FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       UNION ALL
       SELECT 'anti' AS op, c_custkey, c_mktsegment FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 300000)""",
)
def r07(spark, sf):
    """R7+R8 existence joins, tagged: left-semi (customers with at least
    one order) unioned with left-anti (customers with no order above
    300k).  The physical plan contains BOTH a LeftSemi and a LeftAnti
    join (asserted in tests/test_plans.py)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("op"), "c_custkey", "c_mktsegment")
    )
    big = o.filter(F.col("o_totalprice") > 300000)
    anti = (
        c.join(big, c.c_custkey == big.o_custkey, "left_anti")
        .select(F.lit("anti").alias("op"), "c_custkey", "c_mktsegment")
    )
    return semi.unionByName(anti)


@register(
    "r09_outer_join",
    """SELECT o.o_orderkey,
              CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
              ROUND(coalesce(sum(l.l_extendedprice), 0), 2) AS revenue
       FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY o.o_orderkey""",
)
def r09(spark, sf):
    """R9: left-outer join preserving orders with zero lineitems."""
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0)), 2).alias("revenue"),
        )
    )


# ------------------------------------------------------------------ #
# R10 hash agg (TPC-H Q1 shape), R11 distinct, R12 rollup
# ------------------------------------------------------------------ #
@register(
    "r10_hashagg_q1",
    """SELECT l_returnflag, l_linestatus,
              ROUND(sum(l_quantity), 2)                                    AS sum_qty,
              ROUND(sum(l_extendedprice), 2)                               AS sum_base_price,
              ROUND(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
              ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              ROUND(avg(l_quantity), 4)                                    AS avg_qty,
              ROUND(avg(l_extendedprice), 4)                               AS avg_price,
              ROUND(avg(l_discount), 4)                                    AS avg_disc,
              CAST(count(*) AS BIGINT)                                     AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def r10(spark, sf):
    """R10: TPC-H Q1 — partial+final HashAggregate, map-side combine."""
    li = table(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "r11_distinct",
    """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
              CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
              CAST(count(*) AS BIGINT)                  AS n_rows,
              true AS approx_within_5pct
       FROM lineitem""",
)
def r11(spark, sf):
    """R11 exact + approximate count-distinct in one pass: the exact
    counts (expand + two-phase agg under the hood) next to HyperLogLog++
    ``approx_count_distinct`` — the sketch that replaces the exact plan at
    10^10 rows (fixed-size state per partition, one tiny merge, no key
    shuffle).  The sketch estimate is engine-specific, so the oracled
    output is the exact counts plus a bound check: both estimates within
    5% of exact (rsd pinned to 0.01, so 5% is a >4-sigma margin)."""
    li = table(spark, sf, "lineitem")
    a = li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("as_"),
    )
    within = (
        F.abs(F.col("ap") - F.col("n_parts")) <= 0.05 * F.col("n_parts")
    ) & (F.abs(F.col("as_") - F.col("n_supps")) <= 0.05 * F.col("n_supps"))
    return a.select("n_parts", "n_supps", "n_rows", within.alias("approx_within_5pct"))


@register(
    "r12_rollup",
    """SELECT l_returnflag, l_linestatus,
              GROUPING(l_returnflag, l_linestatus) AS gid,
              CAST(count(*) AS BIGINT) AS n,
              ROUND(sum(l_quantity), 2) AS sum_qty
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def r12(spark, sf):
    """R12: rollup with grouping_id — partial aggregates at every level."""
    li = table(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")


# ------------------------------------------------------------------ #
# R13/R14/R15 window functions
# ------------------------------------------------------------------ #
@register(
    "r13_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice
       FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders
       ) WHERE rn = 1""",
)
def r13(spark, sf):
    """R13: ranking window — top order per customer (deterministic tiebreak)."""
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "r14_window_lag_frame",
    """SELECT o_custkey, o_orderkey,
              CAST(date_diff('day',
                lag(o_orderdate) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev,
              ROUND(sum(o_totalprice) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS running_spend
       FROM orders""",
)
def r14(spark, sf):
    """R14+R15 analytic windows over one shared (partition, order) spec:
    lag (gap in days between consecutive orders) and an explicit
    rowsBetween running-sum frame — Spark evaluates both in a single
    Window node over one sort, no extra shuffle for the second column."""
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
        F.round(F.sum("o_totalprice").over(wf), 2).alias("running_spend"),
    )


# ------------------------------------------------------------------ #
# R16 top-k, R17 set ops
# ------------------------------------------------------------------ #
@register(
    "r16_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def r16(spark, sf):
    """R16: orderBy+limit — Spark plans TakeOrderedAndProject (true top-k,
    per-partition heaps, no global sort)."""
    o = table(spark, sf, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _years(spark, sf):
    o = table(spark, sf, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_custkey")
    y96 = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    return y95, y96


@register(
    "r17_set_ops",
    """SELECT 'intersect' AS op, o_custkey FROM (
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
       UNION ALL
       SELECT 'intersect_all' AS op, o_custkey FROM (
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         INTERSECT ALL
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
       UNION ALL
       SELECT 'except_all' AS op, o_custkey FROM (
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         EXCEPT ALL
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')""",
)
def r17(spark, sf):
    """R17 set operations, tagged: INTERSECT (set semantics) plus the
    intersectAll/exceptAll multiset variants — bag semantics keep per-row
    multiplicity (one hash-count per side + min/difference on counts
    under the hood; same single-shuffle cost class as distinct)."""
    y95, y96 = _years(spark, sf)
    inter = y95.intersect(y96).select(F.lit("intersect").alias("op"), "o_custkey")
    inter_all = y95.intersectAll(y96).select(
        F.lit("intersect_all").alias("op"), "o_custkey"
    )
    exc = y95.exceptAll(y96).select(F.lit("except_all").alias("op"), "o_custkey")
    return inter.unionByName(inter_all).unionByName(exc)


# ------------------------------------------------------------------ #
# R18 string, R19 datetime, R20 math
# ------------------------------------------------------------------ #
@register(
    "r18_string_funcs",
    """SELECT p_partkey,
              upper(split_part(p_type, ' ', 1)) AS grade,
              lower(split_part(p_type, ' ', -1)) AS finish,
              CAST(length(p_name) AS INT) AS name_len,
              regexp_extract(p_brand, '[0-9]+') AS brand_num,
              concat_ws('/', p_brand, trim(p_type)) AS brand_type
       FROM part""",
)
def r18(spark, sf):
    """R18: string kitchen-sink — split/upper/lower/length/regexp/concat."""
    p = table(spark, sf, "part")
    words = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.upper(words.getItem(0)).alias("grade"),
        F.lower(F.element_at(words, -1)).alias("finish"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", r"[0-9]+", 0).alias("brand_num"),
        F.concat_ws("/", F.col("p_brand"), F.trim(F.col("p_type"))).alias("brand_type"),
    )


@register(
    "r19_datetime",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
              CAST(year(o_orderdate) AS INT) AS order_year,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(sum(o_totalprice), 2) AS month_revenue
       FROM orders
       GROUP BY 1, 2""",
)
def r19(spark, sf):
    """R19: date_trunc/year bucketing — monthly order rollup."""
    o = table(spark, sf, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_revenue"),
        )
    )


@register(
    "r20_math_funcs",
    """SELECT l_orderkey, l_linenumber,
              floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net,
              ROUND(sqrt(l_quantity), 4) AS sqrt_qty,
              ROUND(ln(l_extendedprice), 4) AS ln_price,
              ROUND(pow(1 + l_tax, 2), 6) AS tax_sq,
              CAST(abs(l_quantity - 25) AS DOUBLE) AS qty_dev,
              CAST(((l_orderkey * 2654435761 % 64) + 64) % 64 AS BIGINT) AS salt
       FROM lineitem WHERE l_orderkey % 100 = 0""",
)
def r20(spark, sf):
    """R20: math surface incl. the multiplicative-hash salting demo used by
    the CDC engine's skew machinery (SURVEY.md §2.2 C3)."""
    li = table(spark, sf, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        # floor-based cent rounding: bit-identical across engines on the same
        # double input, unlike ROUND whose half-up base differs (Java
        # shortest-decimal vs binary value)
        (
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
            / 100
        ).alias("net"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.log("l_extendedprice"), 4).alias("ln_price"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.abs(F.col("l_quantity") - 25).cast("double").alias("qty_dev"),
        F.pmod(F.col("l_orderkey") * 2654435761, F.lit(64)).cast("long").alias("salt"),
    )


# ------------------------------------------------------------------ #
# R21 arrays (higher-order) + R22 maps, R23 JSON, R24 conditional
# ------------------------------------------------------------------ #
@register(
    "r21_array_map_funcs",
    """SELECT o_orderkey,
              CAST(len(ks) AS INT) AS n_items,
              CAST(len(list_filter(ks, x -> x % 2 = 0)) AS INT) AS n_even,
              CAST(list_sum(list_transform(ks, x -> x * x)) AS BIGINT) AS sum_sq,
              CAST(ks[1] AS BIGINT) AS first_item,
              CAST(list_max(ks) AS BIGINT) AS max_item,
              o_orderstatus AS status,
              2 AS n_keys,
              true AS has_prio
       FROM (
         SELECT o_orderkey, o_orderstatus, range(o_orderkey % 7 + 1) AS ks
         FROM orders
       )""",
)
def r21(spark, sf):
    """R21 higher-order array functions (transform/filter/aggregate — all
    JVM-side, same kernels the token pipeline uses, C8) plus R22 map
    functions: a per-row map is built with create_map and read back via
    element_at / map_keys / map_contains_key.  Raw map columns stringify
    differently per engine, so the map is reduced to its scalar reads —
    which the oracle CAN verify (round 2's r22 was rows-only)."""
    o = table(spark, sf, "orders")
    ks = F.sequence(F.lit(0).cast("long"), F.col("o_orderkey") % 7)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.size(ks).alias("n_items"),
        F.size(F.filter(ks, lambda x: x % 2 == 0)).alias("n_even"),
        F.aggregate(
            F.transform(ks, lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.element_at(ks, 1).alias("first_item"),
        F.array_max(ks).alias("max_item"),
        F.element_at(m, "status").alias("status"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.map_contains_key(m, "prio").alias("has_prio"),
    )


@register(
    "r23_json_funcs",
    """SELECT event_id,
              CAST(json_extract(props, '$.k') AS BIGINT) AS k,
              CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod
       FROM events""",
)
def r23(spark, sf):
    """R23: JSON extraction from the events.props payload column."""
    e = table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select("event_id", k.alias("k"), (k % 10).alias("k_mod"))


@register(
    "r24_conditional",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 200000 THEN 'high'
                   WHEN o_totalprice > 100000 THEN 'mid'
                   ELSE 'low' END AS price_band,
              coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
              (o_orderstatus IS NOT DISTINCT FROM 'F') AS is_final
       FROM orders""",
)
def r24(spark, sf):
    """R24: when/otherwise, coalesce, nullif, null-safe equality — the same
    expression shapes as the CDC LWW tiebreak (SURVEY.md §2.3 R24)."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.col("o_orderstatus").eqNullSafe("F").alias("is_final"),
    )
