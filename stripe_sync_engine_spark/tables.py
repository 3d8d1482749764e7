"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an ``sf`` directory.

Reading through ``spark.read.parquet`` keeps predicate pushdown and column
pruning available to Catalyst (``PushedFilters`` / ``ReadSchema`` in
``.explain``), which is the scan behavior we need at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    try:
        # Runtime-settable; applied here as well as in session.py so
        # driver-provided sessions get the same plans (see session.py for
        # why InferFiltersFromGenerate pessimizes computed-array explodes).
        from stripe_sync_engine_spark.session import EXCLUDED_OPTIMIZER_RULES

        spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)
    except Exception:
        pass
    if name == "events":
        # Two generations of driver testdata exist: parquet TIMESTAMP(NANOS)
        # (needs nanosAsLong to read at all) and plain timestamp[us] with no
        # timezone (which Spark infers as TIMESTAMP_NTZ). Normalize both to
        # session-TZ TIMESTAMP below; these confs are runtime-settable and
        # applied here as well so driver-provided sessions work.
        # session.timeZone=UTC makes the NTZ→LTZ cast below bit-exact
        # against DuckDB's naive timestamps even when the driver built the
        # session in a non-UTC zone (engine sessions already set it —
        # session.py). nanosAsLong has no per-read option, so it is
        # session-wide by necessity; the NTZ inference toggle is passed as
        # a per-read option further down instead of mutating the session.
        for key, val in (
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.session.timeZone", "UTC"),
        ):
            try:
                spark.conf.set(key, val)
            except Exception:
                pass
    reader = spark.read
    if name == "events":
        # Per-read (not session-global): new-generation files infer their
        # no-tz micros column as TIMESTAMP_NTZ unless disabled; scoping the
        # toggle to this read leaves other parquet reads' inference alone.
        reader = reader.option("inferTimestampNTZ", "false")
    df = reader.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Normalize events.ts to TIMESTAMP (LTZ) regardless of which physical
    # type the driver wrote:
    #   * TIMESTAMP(NANOS) + nanosAsLong → epoch-nanos LONG: truncate to
    #     micros, exactly what DuckDB does reading the same file.
    #   * timestamp[us] (no tz) → TIMESTAMP_NTZ: cast to timestamp. The
    #     session TZ is UTC (session.py), so the cast is bit-exact and
    #     matches DuckDB's native read.
    # Downstream expressions (F.unix_micros, range frames, sessionization)
    # require LTZ TIMESTAMP, so this is the single choke point for the
    # normalization.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Fan a SMALL scan out across the session's cores before CPU-heavy
    per-row work (shingling, hashing, vector math, Arrow-batched UDFs).

    Parquet split planning sizes partitions by BYTES (maxPartitionBytes /
    openCostInBytes) — it knows nothing about downstream CPU cost, and a
    sub-row-group file can never split anyway, so a 600 KB documents file
    becomes ONE task doing minutes of per-row hashing while 31 cores idle.
    The guard makes this scale-correct: when the scan already has at least
    as many splits as the session has cores (any real dataset at 100 TB —
    thousands of row groups), this is the identity and no shuffle is ever
    added. The repartition only fires for inputs small enough that
    shuffling their raw bytes is trivially cheap (< one split's worth
    per core, by construction).

    An explicit ``repartition(n)`` (not a rebalance hint) on purpose: AQE
    would coalesce a rebalance of a few MB right back to one partition —
    partition count here is chosen for CPU spread, not shuffle-size
    targets."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
