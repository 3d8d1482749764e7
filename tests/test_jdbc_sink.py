"""JDBC sink construction tests — the SQL/option layer is pure and fully
testable without a Postgres server; the execution path is exercised only
for its driver-absent error contract (no JDBC driver jar ships in this
container)."""

import pytest

from stripe_sync_engine_spark.sinks import PostgresJdbcSink


@pytest.fixture()
def sink():
    return PostgresJdbcSink(jdbc_url="jdbc:postgresql://db:5432/app", user="u", password="p")


def test_jdbc_options_target_vs_staging(sink):
    tgt = sink.jdbc_options("charges")
    stg = sink.jdbc_options("charges", staging=True)
    assert tgt["dbtable"] == '"stripe"."charges"'
    assert stg["dbtable"] == '"stripe_staging"."charges"'
    assert tgt["driver"] == "org.postgresql.Driver"
    assert tgt["user"] == "u" and tgt["password"] == "p"
    assert int(tgt["numPartitions"]) > 0 and int(tgt["batchsize"]) > 0


def test_upsert_sql_matches_reference_semantics(sink):
    """Mirrors constructUpsertWithTimestampProtectionSql
    (database/postgres.ts:181-204): every non-key column updated from
    EXCLUDED, timestamp-protection WHERE on the conflicting row."""
    sql = sink.upsert_sql("charges", ["id", "amount", "last_synced_at"])
    assert 'INSERT INTO "stripe"."charges" ("id", "amount", "last_synced_at")' in sql
    assert 'ON CONFLICT ("id") DO UPDATE SET' in sql
    assert '"amount" = EXCLUDED."amount"' in sql
    assert '"last_synced_at" = EXCLUDED."last_synced_at"' in sql
    assert '"id" = EXCLUDED' not in sql  # key never updated
    assert 'WHERE "stripe"."charges"."last_synced_at" IS NULL' in sql
    assert 'OR "stripe"."charges"."last_synced_at" < EXCLUDED."last_synced_at"' in sql


def test_upsert_sql_requires_key_and_ts(sink):
    with pytest.raises(ValueError):
        sink.upsert_sql("charges", ["amount", "last_synced_at"])
    with pytest.raises(ValueError):
        sink.upsert_sql("charges", ["id", "amount"])


def test_delete_sql(sink):
    sql = sink.delete_sql("products")
    assert sql == (
        'DELETE FROM "stripe"."products" WHERE "id" IN '
        '(SELECT "id" FROM "stripe_staging"."products")'
    )


def test_identifier_quoting_rejects_injection(sink):
    with pytest.raises(ValueError):
        sink.jdbc_options('x"; DROP TABLE y; --')


def test_write_upsert_without_driver_raises_clear_error(sink, spark):
    df = spark.createDataFrame([("ch_1", 1, None)], "id string, amount long, last_synced_at timestamp")
    with pytest.raises(RuntimeError, match="JDBC staging write failed"):
        sink.write_upsert(df, "charges")
