"""Full projected-row fidelity on production-shaped webhook payloads.

Each fixture (tests/fixtures_corpus.py — ported from the reference's e2e
corpus, packages/fastify-app/src/test/stripe/, exercised there by
test/webhooks.test.ts:64-168) is driven through the engine, and the merged
table row is compared FIELD BY FIELD against an independent Python-side
projection of the same payload implementing the declared contract:
declared columns only, missing → NULL, unknown dropped, typed casts,
nested objects stored as compact JSON text. This catches projection bugs
that id-presence checks (the synthesized-fixture sweeps) cannot — e.g.
a nested refunds envelope silently nulled or a boolean mis-cast.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest

from pyspark.sql.types import BooleanType, DoubleType, LongType

from stripe_sync_engine_spark.schemas.entities import entity_schema
from stripe_sync_engine_spark.sources.stripe_api import InMemoryStripeAPI
from stripe_sync_engine_spark.storage import TableStore
from stripe_sync_engine_spark.sync import StripeSparkSync, SyncConfig
from stripe_sync_engine_spark.sync import registry as R
from tests.fixtures_corpus import CORPUS

# fixture name → target table (via the event-route registry)
CASES = sorted((name, R.EVENT_ROUTES[ev["type"]][0]) for name, ev in CORPUS.items())


@pytest.fixture(scope="module")
def corpus_engine(spark, tmp_path_factory):
    """One engine, all fixtures processed once (module-scoped: each case
    then asserts on its own table). Expansion/backfill are disabled so the
    stored row is the pure projection of the webhook payload."""
    store = TableStore(spark, str(tmp_path_factory.mktemp("wh_corpus")))
    eng = StripeSparkSync(
        spark,
        store,
        api=InMemoryStripeAPI(),
        config=SyncConfig(backfill_related_entities=False, auto_expand_lists=False),
    )
    eng.process_webhook_events(
        eng.events_df_from_json([json.dumps(ev) for ev in CORPUS.values()])
    )
    return eng


def expected_row(entity: str, payload: dict, created: int) -> dict:
    """The declared projection contract, implemented independently of the
    engine (P1: declared columns, missing → NULL, typed casts; nested
    objects → compact JSON text; sync timestamps = event.created)."""
    ts = datetime.fromtimestamp(created, tz=timezone.utc).replace(tzinfo=None)
    exp = {}
    for f in entity_schema(entity).fields:
        name = f.name
        if name in ("updated_at", "last_synced_at"):
            exp[name] = ts
            continue
        v = payload.get(name)
        if entity == "customers" and name == "deleted":
            exp[name] = bool(v) if v is not None else False
        elif v is None:
            exp[name] = None
        elif isinstance(f.dataType, LongType):
            exp[name] = int(v)
        elif isinstance(f.dataType, BooleanType):
            exp[name] = bool(v)
        elif isinstance(f.dataType, DoubleType):
            exp[name] = float(v)
        elif isinstance(v, (dict, list)):
            # Spark's JSON re-serialization emits raw UTF-8, not \uXXXX
            exp[name] = json.dumps(v, separators=(",", ":"), ensure_ascii=False)
        elif isinstance(v, bool):
            exp[name] = "true" if v else "false"
        else:
            exp[name] = str(v)
    return exp


@pytest.mark.parametrize("name,entity", CASES)
def test_fixture_projects_exactly(corpus_engine, name, entity):
    ev = CORPUS[name]
    payload = ev["data"]["object"]
    want = expected_row(entity, payload, ev["created"])
    df = corpus_engine.store.read(entity)
    got_rows = [r.asDict() for r in df.where(df.id == payload["id"]).collect()]
    assert len(got_rows) == 1, f"{name}: expected exactly one row for {payload['id']}"
    got = got_rows[0]
    diffs = {
        k: (got.get(k), want[k]) for k in want if got.get(k) != want[k]
    }
    assert not diffs, f"{name}/{entity}: field mismatches {diffs}"


def test_subscription_items_side_write(corpus_engine):
    """The subscription fixture's embedded items land in subscription_items
    with the parent FK stamped and the price flattened to its id."""
    ev = CORPUS["subscription_created"]
    items = ev["data"]["object"]["items"]["data"]
    df = corpus_engine.store.read("subscription_items")
    rows = {r["id"]: r.asDict() for r in df.collect()}
    for item in items:
        assert item["id"] in rows, item["id"]
        got = rows[item["id"]]
        assert got["subscription"] == ev["data"]["object"]["id"]
        price = item.get("price")
        if isinstance(price, dict):
            assert got["price"] == price["id"]
