"""Core analytics queries (SURVEY.md §2.11 Q1–Q10 plus the wider operator
families: windows, rollup/cube, set ops, semi/anti joins, as-of join).

Reference parity: the reference (supabase/stripe-sync-engine) delegates this
layer to Postgres over its synced tables (`README.md:18-20`); here it is
native Spark SQL/Catalyst. Each query cites the SURVEY operator ids it
exercises.

Scale notes (100 TB discipline):
* Dimension joins (region/nation/customer-sized sides) are explicitly
  ``broadcast()`` so fact tables never shuffle for them.
* Aggregations are expressed on DataFrames → Catalyst does partial
  (map-side) aggregation automatically; no ``collect()`` anywhere.
* Filters are applied directly on scan columns so they push into the
  Parquet reader (visible as ``PushedFilters`` in ``.explain``).
* Exact-decimal arithmetic (see ``m()``/``dsum``) adds no shuffle: it only
  changes the aggregation buffer type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stripe_sync_engine_spark.plans.registry import register
from stripe_sync_engine_spark.tables import load_table


def m(c: Column | str, scale: int = 4) -> Column:
    """Money/measure cast: exact DECIMAL so aggregates hash-match DuckDB.

    Testdata doubles carry 2 decimal digits, so DECIMAL(18, scale>=2) is
    lossless; sums in decimal are order-independent (exact), unlike double.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


def as_double(c: Column) -> Column:
    return c.cast("double")


# SQL fragment mirrors of m()/dsum for the DuckDB oracle strings.
def sql_m(expr: str, scale: int = 4) -> str:
    return f"CAST({expr} AS DECIMAL(18,{scale}))"


# Decimal sizing matters for cross-engine exactness: Spark caps decimal
# precision at 38 and, when a multiply chain exceeds it, silently REDUCES
# SCALE (rounding!) while DuckDB behaves differently. Keeping prices at
# DECIMAL(12,2) and rates at DECIMAL(3,2) keeps every product chain well
# under precision 38 → exact in both engines.
PRICE = "decimal(12,2)"
RATE = "decimal(3,2)"


def price(c: str) -> Column:
    return F.col(c).cast(PRICE)


def rate(c: str) -> Column:
    return F.col(c).cast(RATE)


def revenue_expr() -> Column:
    return price("l_extendedprice") * (F.lit(1).cast(RATE) - rate("l_discount"))


SQL_REVENUE_EXPR = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"


# ---------------------------------------------------------------------------
# Q1 — point lookup (SURVEY S4-analog, P2): filter pushes to Parquet scan.
# ---------------------------------------------------------------------------
@register(
    "q01_point_lookup",
    oracle="SELECT * FROM customer WHERE c_custkey = 42",
    operators="S4,P2",
)
def q01_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key; predicate pushdown to the Parquet scan."""
    return load_table(spark, sf_dir, "customer").where(F.col("c_custkey") == 42)


# ---------------------------------------------------------------------------
# Q2 — revenue per customer (SURVEY J6 equi-join, A4 hash agg).
# ---------------------------------------------------------------------------
@register(
    "q02_revenue_per_customer",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM({SQL_REVENUE_EXPR}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY c.c_custkey, c.c_name
    """,
    operators="J6,A4",
)
def q02_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join (orders⋈lineitem, sort-merge/shuffle-hash picked by
    Catalyst+AQE) followed by a broadcast join to the customer dimension."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            as_double(F.sum(revenue_expr())).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — top-10 customers by revenue (SURVEY O3 top-k → TakeOrderedAndProject).
# ---------------------------------------------------------------------------
@register(
    "q03_top10_customers",
    oracle=f"""
        SELECT o_custkey AS c_custkey, CAST(SUM({SQL_REVENUE_EXPR}) AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o_custkey
        ORDER BY SUM({SQL_REVENUE_EXPR}) DESC, o_custkey
        LIMIT 10
    """,
    operators="O3,J6,A4",
)
def q03_top10_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy().limit(k) compiles to TakeOrderedAndProject — no full
    sort at scale. Deterministic tie-break on c_custkey (exact decimal
    revenue makes ties well-defined)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(revenue_expr()).alias("_rev_exact"))
    )
    return (
        rev.orderBy(F.col("_rev_exact").desc(), F.col("o_custkey"))
        .limit(10)
        .select(F.col("o_custkey").alias("c_custkey"), as_double(F.col("_rev_exact")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q4 — latest event per user (SURVEY A3 argmax / §2.5 window).
# ---------------------------------------------------------------------------
@register(
    "q04_latest_event_per_user",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    operators="A3,W",
)
def q04_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed argmax via row_number window — the same reduction the merge
    engine applies before every upsert (batch-internal last-write-wins)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Q5 — anti-join: orders with no lineitems (SURVEY J3 left-anti).
# ---------------------------------------------------------------------------
@register(
    "q05_orders_without_lineitems",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    operators="J3,S7",
)
def q05_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the backbone of the reference's missing-parent
    backfill (findMissingEntries, database/postgres.ts:106-120)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# Q6 — fold event batches through the timestamp-protected merge (SURVEY S9,
#      T1/T2): snapshot equals global last-write-wins.
# ---------------------------------------------------------------------------
@register(
    "q06_merge_snapshot",
    oracle="""
        SELECT user_id, event_id AS last_event_id, ts AS last_synced_at, event_type AS last_event_type, value AS last_value
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    operators="S9,T1,T2,A3",
)
def q06_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replays the events table through the engine's timestamp-protected
    merge operator in 4 out-of-order batches; the resulting snapshot must
    equal the declarative last-write-wins (the oracle). Exercises the exact
    semantics of upsertManyWithTimestampProtection
    (reference: database/postgres.ts:64-104,159-204)."""
    from stripe_sync_engine_spark.operators.merge import merge_upsert_clustered

    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("id"),
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_synced_at"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )
    # Deterministic batch split; applied out of order (3,1,4,2) to prove
    # arrival order does not matter (T2 idempotent/out-of-order semantics).
    batches = [events.where(F.pmod(F.col("last_event_id"), F.lit(4)) == i) for i in (2, 0, 3, 1)]
    snapshot: DataFrame | None = None
    # The fold runs through the engine's SINGLE-EXCHANGE merge form
    # (r16, guide §2.4; VERDICT r15 #7): the join-based merge_upsert
    # chain re-exchanged 6 times (one argmax window per batch + the
    # full-outer joins, whose coalesce(t.id, s.id) output key hides the
    # partitioning from Catalyst), while merge_upsert_clustered — the
    # operator the sync layer's hot path already uses, equivalence
    # property-tested in tests/test_merge_properties.py — is one
    # union+window exchange per merge: 4 exchanges, and the
    # quarter-batches each cross the network once instead of the
    # accumulated snapshot re-shuffling per step. Identical
    # timestamp-protected T1/T2 semantics and result; NULL merge keys
    # don't arise (events.user_id is the oracle's partition key).
    for b in batches:
        snapshot = merge_upsert_clustered(
            snapshot, b, cluster_expr=F.col("id"), key="id",
            ts_col="last_synced_at", tiebreak_cols=["last_event_id"],
        )
    return snapshot.select(
        F.col("id").alias("user_id"), "last_event_id", "last_synced_at", "last_event_type", "last_value"
    )


# ---------------------------------------------------------------------------
# Q7 — explode array into child rows with parent key (SURVEY 2.8 explode, J5).
# ---------------------------------------------------------------------------
@register(
    "q07_explode_tokens",
    oracle="""
        SELECT doc_id,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    """,
    operators="2.8-explode,J5",
)
def q07_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode a per-row list into child rows stamped with the parent key —
    the subscription_items / line-items pattern (reference stripeSync.ts:1632)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")


# ---------------------------------------------------------------------------
# Q8 — daily windows + date functions (SURVEY T4, 2.8 date fns).
# ---------------------------------------------------------------------------
# Shared trailing-window fragment: the scheduled-incremental predicate
# (/sync/weekly: created >= anchor-7d, anchored at max(ts) for determinism)
# is ONE definition used by q08's oracle and pinned in pytest — the folded
# q08b_trailing_window semantics live on as the *_trail7 columns below.
SQL_TRAIL7_CUTOFF = "(SELECT max(ts) - INTERVAL 7 DAY FROM events)"


@register(
    "q08_daily_rollup",
    oracle=f"""
        WITH anchor AS (SELECT {SQL_TRAIL7_CUTOFF} AS cutoff)
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
               COUNT(CASE WHEN ts >= cutoff THEN 1 END) AS n_events_trail7,
               CAST(SUM(CASE WHEN ts >= cutoff
                             THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS total_value_trail7
        FROM events CROSS JOIN anchor
        GROUP BY 1, 2
    """,
    operators="T4,A4,2.8-date,P2",
)
def q08_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup + scheduled-incremental trailing window in ONE scan.

    Folds the former q08b_trailing_window (/sync/weekly analog: rows with
    ts >= max(ts)-7d) into the daily rollup as conditional aggregates: both
    families share the events scan and the (day, event_type) exchange, so
    the fold costs nothing at 100 TB. The trailing anchor is a 1-row
    broadcast-joined aggregate, never a collect(); summing q08's *_trail7
    columns over event_type reproduces the old q08b result exactly (pinned
    in tests/test_operators.py::test_q08_trailing_fold_parity).
    """
    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg((F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("_cutoff"))
    trail = F.col("ts") >= F.col("_cutoff")
    return (
        events.join(F.broadcast(cutoff))
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            as_double(F.sum(m("value"))).alias("total_value"),
            F.count(F.when(trail, F.lit(1))).alias("n_events_trail7"),
            as_double(F.sum(F.when(trail, m("value")))).alias("total_value_trail7"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 — distinct FK extraction (SURVEY A1).
# ---------------------------------------------------------------------------
@register(
    "q09_distinct_custkeys",
    oracle="SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_custkey IS NOT NULL",
    operators="A1",
)
def q09_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct FK ids before backfill fan-out (reference getUniqueIds,
    stripeSync.ts:38-46); shuffle-level partial aggregation is automatic."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_custkey").isNotNull()).select(F.col("o_custkey").alias("custkey")).distinct()


# ---------------------------------------------------------------------------
# Q10 — set-difference delete (SURVEY J4/S11 replace-set semantics).
# ---------------------------------------------------------------------------
@register(
    "q10_set_difference_delete",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type
        FROM events e
        WHERE NOT EXISTS (
            SELECT 1 FROM events s WHERE s.event_type = 'signup' AND s.user_id = e.user_id
        )
    """,
    operators="J4,S11",
)
def q10_set_difference_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows of A not keyed in B — the replace-set delete
    (deleteRemovedActiveEntitlements, reference stripeSync.ts:1650-1660)."""
    events = load_table(spark, sf_dir, "events")
    signup_users = events.where(F.col("event_type") == "signup").select("user_id").distinct()
    return events.join(signup_users, "user_id", "left_anti").select("event_id", "user_id", "event_type")


# ---------------------------------------------------------------------------
# Wider operator families (SURVEY §2.3 J6, §2.5, §2.6, §2.7)
# ---------------------------------------------------------------------------
@register(
    "q11_semi_join",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
        )
    """,
    operators="J2",
)
def q11_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi existence join (reference findMissingEntries' positive half)."""
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000).select("o_custkey")
    return customer.join(big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q12_rollup_region_nation",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal,
               COUNT(*) AS n_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    operators="A4-groupingsets,J6",
)
def q12_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup over broadcast dimension joins (grouping sets)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return joined.rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation")).agg(
        as_double(F.sum(m("c_acctbal"))).alias("total_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "q13_running_total",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_value,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_1h_value
        FROM events
    """,
    operators="W-frame,W-frame-range",
)
def q13_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative ROWS frame AND trailing-one-hour RANGE frame in one
    query (subsumes the former q30_time_range_frame entry — the fold
    that freed the registry slot for dd_span_dedup). Both windows
    partition by user_id, so they share ONE exchange; Spark has no
    interval RANGE frame, so the trailing window orders by
    microseconds-since-epoch with the equivalent numeric range —
    value-identical to DuckDB's interval frame (RANGE includes ts-peers
    on both engines)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w1h = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        as_double(F.sum(m("value")).over(w)).alias("running_value"),
        as_double(F.sum(m("value")).over(w1h)).alias("trailing_1h_value"),
    )


@register(
    "q14_lag_gap_seconds",
    oracle="""
        SELECT event_id, user_id, ts,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         ts) AS gap_us
        FROM events
    """,
    operators="W-analytic",
)
def q14_lag_gap_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic window: microsecond gap between consecutive events."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).cast("long")
    return events.select("event_id", "user_id", "ts", gap.alias("gap_us"))


@register(
    "q15_topn_per_group",
    oracle=f"""
        SELECT nation, c_custkey, revenue, rnk FROM (
            SELECT n.n_name AS nation, c.c_custkey,
                   CAST(SUM({SQL_REVENUE_EXPR}) AS DOUBLE) AS revenue,
                   rank() OVER (PARTITION BY n.n_name ORDER BY SUM({SQL_REVENUE_EXPR}) DESC, c.c_custkey) AS rnk
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY n.n_name, c.c_custkey
        ) WHERE rnk <= 3
    """,
    operators="W-rank,J6,A4",
)
def q15_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group: agg → rank window → filter (no global sort)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(F.sum(revenue_expr()).alias("_rev"))
    )
    w = Window.partitionBy("nation").orderBy(F.col("_rev").desc(), F.col("c_custkey"))
    return (
        rev.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select("nation", "c_custkey", as_double(F.col("_rev")).alias("revenue"), F.col("rnk").cast("long").alias("rnk"))
    )


@register(
    "q16_set_ops",
    oracle="""
        SELECT 'except' AS op, user_id AS key_id FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
        UNION ALL
        SELECT 'union' AS op, user_id AS key_id FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            UNION
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
        UNION ALL
        SELECT 'intersect' AS op, custkey AS key_id FROM (
            SELECT o_custkey AS custkey FROM orders
            INTERSECT
            SELECT user_id AS custkey FROM events
        )
    """,
    operators="2.7-setops,SET-intersect",
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three SQL set operators (distinct semantics) in one result,
    tagged by an ``op`` column: EXCEPT and UNION between two event
    cohorts, INTERSECT between the orders fact and the events stream
    (formerly the separate q22_intersect registry entry).

    subtract == SQL EXCEPT (exceptAll would keep a user who clicked more
    often than they purchased); intersect plans as a left-semi aggregate
    join with key-only projections pruning both scans."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.where(F.col("event_type") == "click").select("user_id")
    buyers = events.where(F.col("event_type") == "purchase").select("user_id")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    users = events.select(F.col("user_id").alias("custkey"))
    tag = lambda df, op, col: df.select(F.lit(op).alias("op"), F.col(col).alias("key_id"))  # noqa: E731
    return (
        tag(clickers.subtract(buyers), "except", "user_id")
        .unionByName(tag(clickers.union(buyers).distinct(), "union", "user_id"))
        .unionByName(tag(orders.intersect(users), "intersect", "custkey"))
    )


@register(
    "q17_left_join_coalesce",
    oracle="""
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
               CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS total_spent
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        GROUP BY c.c_custkey
    """,
    operators="J6-outer,A4",
)
def q17_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side filter and null-safe aggregation."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            as_double(F.coalesce(F.sum(m("o_totalprice")), F.lit(0).cast("decimal(18,4)"))).alias("total_spent"),
        )
    )


@register(
    "q18_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({SQL_REVENUE_EXPR}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM({SQL_REVENUE_EXPR} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    operators="A4,P2",
)
def q18_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-heavy partial aggregation with
    a pushed-down date filter."""
    one = F.lit(1).cast(RATE)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("2024-12-01 00:00:00").cast("timestamp"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        as_double(F.sum(price("l_quantity"))).alias("sum_qty"),
        as_double(F.sum(price("l_extendedprice"))).alias("sum_base_price"),
        as_double(F.sum(revenue_expr())).alias("sum_disc_price"),
        as_double(F.sum(revenue_expr() * (one + rate("l_tax")))).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q19_asof_join",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, e.event_id AS asof_event_id, e.ts AS asof_ts
        FROM orders o
        ASOF LEFT JOIN events e
          ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    """,
    operators="J6-asof",
)
def q19_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest event at or before each order date, per key) —
    an operator Spark lacks natively, built from union + window
    (single shuffle on the key; no cross/range explosion). See
    operators/asof.py."""
    from stripe_sync_engine_spark.operators.asof import asof_join

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return asof_join(
        left=orders,
        right=events,
        left_key="o_custkey",
        right_key="user_id",
        left_time="o_orderdate",
        right_time="ts",
        right_payload={"event_id": "asof_event_id", "ts": "asof_ts"},
        right_order=["ts", "event_id"],
    )


@register(
    "q20_cube_status_priority",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    operators="A4-cube",
)
def q20_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        as_double(F.sum(m("o_totalprice"))).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Q21 — interval range join (SURVEY J6 theta-range): clicks within 10
# minutes after each purchase. Closes the J6 "no theta/interval-range
# query exercised" gap (VERDICT r1).
# ---------------------------------------------------------------------------
@register(
    "q21_range_join",
    oracle="""
        SELECT a.event_id, COUNT(*) AS n_clicks,
               MIN(epoch_us(b.ts) - epoch_us(a.ts)) AS min_gap_us
        FROM events a
        JOIN events b
          ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        WHERE a.event_type = 'purchase' AND b.event_type = 'click'
        GROUP BY a.event_id
    """,
    operators="J6-range",
)
def q21_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key) via the bucketed band-join operator —
    O(pairs-in-band), never a nested-loop cross product. See
    operators/range_join.py for the physical strategy."""
    from stripe_sync_engine_spark.operators.range_join import interval_range_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select("event_id", "ts")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("ts").alias("click_ts")
    )
    pairs = interval_range_join(
        purchases, clicks, left_time="ts", right_time="click_ts", lower_s=0, upper_s=600
    )
    return pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.min(F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("ts"))).alias("min_gap_us"),
    )


# ---------------------------------------------------------------------------
# Q23 — batch sessionization (gaps-and-islands; batch twin of the
# applyInPandasWithState streaming sessionizer in streaming/sessions.py).
# ---------------------------------------------------------------------------
@register(
    "q23_sessionize",
    oracle="""
        WITH g AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM g
        )
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_id
    """,
    operators="T5,A4,window",
)
def q23_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30-min gap) over the events stream table — one
    shuffle on user_id shared by the lag window, the cumulative-sum
    window, and the final aggregation."""
    from stripe_sync_engine_spark.streaming.sessions import sessionize_batch

    events = load_table(spark, sf_dir, "events")
    return sessionize_batch(events, gap_s=1800)


# ---------------------------------------------------------------------------
# Q24 — PIVOT (wide conditional aggregation). Explicit value list so no
# extra distinct-values job runs and the plan is a single hash aggregate.
# ---------------------------------------------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q24_pivot",
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click') AS n_click,
               COUNT(*) FILTER (event_type = 'error') AS n_error,
               COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (event_type = 'view') AS n_view
        FROM events GROUP BY user_id
    """,
    operators="A4-pivot",
)
def q24_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot events to one column per type. The explicit values list keeps
    it one aggregation pass (no distinct-scan) and a fixed output schema —
    the only scale-safe way to pivot."""
    events = load_table(spark, sf_dir, "events")
    pivoted = events.groupBy("user_id").pivot("event_type", list(EVENT_TYPES)).count()
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# Q25 — exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`,
# verified bit-identical interpolation).
# ---------------------------------------------------------------------------
@register(
    "q25_percentiles",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY event_type
    """,
    operators="A4-percentile",
)
def q25_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group. Exact percentile
    is a sort-based aggregate; at 100 TB the approx_percentile sketch
    (t-digest, mergeable, fixed memory) is the scale path — exact here
    because the oracle must hash-match."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


@register(
    "q29_grouping_sets",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal,
               COUNT(*) AS n_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r.r_name), (n.n_name), ())
    """,
    operators="A4-groupingsets,J6",
)
def q29_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not expressible as rollup/cube): per-region,
    per-nation, and grand totals in one pass — Spark expands the sets with
    a single Expand node feeding one hash aggregation, not three scans."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    base = joined.select(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "c_acctbal"
    )
    return base.groupingSets([["region"], ["nation"], []], "region", "nation").agg(
        as_double(F.sum(m("c_acctbal"))).alias("total_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# q30_time_range_frame folded into q13_running_total (same events scan,
# same user_id window exchange) — the registry slot now holds
# dd_span_dedup (plans/dedup.py).
