"""Parquet-backed table store — the engine's warehouse layer.

The reference stores entities in Postgres tables under a ``stripe`` schema
(``database/migrate.ts:15-66`` bootstraps them); this engine stores one
Parquet dataset per entity under a warehouse directory and rewrites
through versioned directories with an atomic pointer swap (Spark cannot
overwrite a dataset it is currently reading, and a crash mid-write must
never corrupt the current version — the pointer file is the commit).

Scale note: at 100 TB you would swap this class for Delta/Iceberg tables
(real MERGE, partition-level rewrites, concurrent writers). Everything
above this layer is pure DataFrame logic, so the swap is confined here.
The ``migrate()`` analog of the reference's migration runner records
applied DDL in a ``_migrations`` dataset.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from stripe_sync_engine_spark.schemas.entities import entity_schema, entity_tables


class TableStore:
    """Versioned parquet datasets: <root>/<table>/v<N> + <root>/<table>/CURRENT."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._dir(table), "CURRENT")

    def exists(self, table: str) -> bool:
        return os.path.exists(self._pointer(table))

    def read(self, table: str) -> DataFrame | None:
        if not self.exists(table):
            return None
        with open(self._pointer(table)) as f:
            version = f.read().strip()
        return self.spark.read.parquet(os.path.join(self._dir(table), version))

    def write(self, table: str, df: DataFrame) -> None:
        """Write a new version and atomically swap the CURRENT pointer."""
        tdir = self._dir(table)
        os.makedirs(tdir, exist_ok=True)
        version = f"v{int(time.time() * 1000)}_{os.getpid()}"
        path = os.path.join(tdir, version)
        df.write.mode("overwrite").parquet(path)
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer(table))
        self._vacuum(table, keep=version)

    def _vacuum(self, table: str, keep: str) -> None:
        tdir = self._dir(table)
        for name in os.listdir(tdir):
            if name.startswith("v") and name != keep:
                shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)

    # -- DDL / migration-runner analog (SURVEY S13) -------------------------
    def migrate(self) -> list[str]:
        """Bootstrap every entity table (empty dataset with the declared
        StructType) — the analog of runMigrations (reference
        database/migrate.ts:15-66): idempotent, ordered, recorded."""
        applied = []
        for table in entity_tables():
            if not self.exists(table):
                empty = self.spark.createDataFrame([], entity_schema(table))
                self.write(table, empty)
                applied.append(table)
        record = os.path.join(self.root, "_migrations.json")
        with open(record, "w") as f:
            json.dump({"tables": entity_tables(), "applied_at": time.time()}, f)
        return applied
