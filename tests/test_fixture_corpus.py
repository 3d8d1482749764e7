"""Full projected-row fidelity on production-shaped webhook payloads.

Every fixture of the reference's e2e corpus (tests/fixtures_corpus.py —
all 71 of packages/fastify-app/src/test/stripe/, exercised there by
test/webhooks.test.ts:64-200) is driven through the engine with an
assertion per route action:

* upsert events: the merged table row is compared FIELD BY FIELD against
  an independent Python-side projection of the same payload implementing
  the declared contract (declared columns only, missing → NULL, unknown
  dropped, typed casts, nested objects stored as compact JSON text) —
  stronger than the reference's id+timestamp row check.
* delete events (the reference asserts 200-only): the row is absent.
* customer.deleted: the soft-delete flag is set (partial-column merge).
* entitlement summary: the customer's active-entitlement set equals the
  payload's set (replace-set semantics).

Many fixtures reuse one object id with IDENTICAL event.created and even
event ids (charge_captured/failed/... all mutate one charge), so a single
shared batch would be nondeterministic under last-write-wins. Fixtures
are therefore partitioned into WAVES with no (entity, object id)
collision; each wave gets its own engine/store and is processed as one
batch.
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

# fixture name → (table, action) via the event-route registry
ROUTES = {name: R.EVENT_ROUTES[ev["type"]] for name, ev in CORPUS.items()}
UPSERT_CASES = sorted(n for n, (_, a) in ROUTES.items() if a == R.UPSERT)
DELETE_CASES = sorted(n for n, (_, a) in ROUTES.items() if a == R.DELETE)

# wave partition: no two fixtures in a wave share (entity, object id)
WAVES: list[list[str]] = []
_seen: list[set] = []
for _name in sorted(CORPUS):
    _key = (ROUTES[_name][0], CORPUS[_name]["data"]["object"].get("id"))
    for _w, _s in zip(WAVES, _seen):
        if _key not in _s:
            _w.append(_name)
            _s.add(_key)
            break
    else:
        WAVES.append([_name])
        _seen.append({_key})


@pytest.fixture(scope="module")
def corpus_engines(spark, tmp_path_factory):
    """fixture name → the engine whose store processed it. Expansion and
    backfill are disabled so each stored row is the pure projection of its
    webhook payload."""
    seed_types = {
        "products": "product.created",
        "prices": "price.created",
        "plans": "plan.created",
        "tax_ids": "customer.tax_id.created",
    }
    engines: dict[str, StripeSparkSync] = {}
    for wi, names in enumerate(WAVES):
        store = TableStore(spark, str(tmp_path_factory.mktemp(f"wh_corpus{wi}")))
        eng = StripeSparkSync(
            spark,
            store,
            api=InMemoryStripeAPI(),
            config=SyncConfig(backfill_related_entities=False, auto_expand_lists=False),
        )
        # Seed a row for every delete fixture in this wave (its matching
        # upsert fixture lives in ANOTHER wave by construction), so the
        # delete assertions exercise an actual deletion rather than
        # absence from a store that never held the row.
        seeds = [
            json.dumps(
                {
                    "id": f"evt_seed_{wi}_{i}",
                    "object": "event",
                    "type": seed_types[ROUTES[n][0]],
                    "created": 1,
                    "data": {"object": dict(CORPUS[n]["data"]["object"], deleted=False)},
                }
            )
            for i, n in enumerate(names)
            if ROUTES[n][1] == R.DELETE
        ]
        if seeds:
            eng.process_webhook_events(eng.events_df_from_json(seeds))
            for n in names:  # the seed really landed before the delete runs
                if ROUTES[n][1] == R.DELETE:
                    df = eng.store.read(ROUTES[n][0])
                    oid = CORPUS[n]["data"]["object"]["id"]
                    assert df.where(df.id == oid).count() == 1
        eng.process_webhook_events(
            eng.events_df_from_json([json.dumps(CORPUS[n]) for n in names])
        )
        engines.update({n: eng for n in names})
    return engines


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


@pytest.mark.parametrize("name", UPSERT_CASES)
def test_fixture_projects_exactly(corpus_engines, name):
    ev = CORPUS[name]
    entity = ROUTES[name][0]
    payload = ev["data"]["object"]
    want = expected_row(entity, payload, ev["created"])
    df = corpus_engines[name].store.read(entity)
    got_rows = [r.asDict() for r in df.where(df.id == payload["id"]).collect()]
    assert len(got_rows) == 1, f"{name}: expected exactly one row for {payload['id']}"
    got = got_rows[0]
    diffs = {k: (got.get(k), want[k]) for k in want if got.get(k) != want[k]}
    assert not diffs, f"{name}/{entity}: field mismatches {diffs}"


@pytest.mark.parametrize("name", DELETE_CASES)
def test_fixture_delete_leaves_no_row(corpus_engines, name):
    """The reference asserts only a 200 for these (webhooks.test.ts:170-
    200); here the delete route's effect is asserted: the row — seeded
    into the wave's store before the batch (corpus_engines) — is gone."""
    ev = CORPUS[name]
    entity = ROUTES[name][0]
    oid = ev["data"]["object"]["id"]
    df = corpus_engines[name].store.read(entity)
    assert df is None or df.where(df.id == oid).count() == 0, f"{name}: {oid} not deleted"


def test_customer_deleted_sets_soft_flag(corpus_engines):
    ev = CORPUS["customer_deleted"]
    oid = ev["data"]["object"]["id"]
    df = corpus_engines["customer_deleted"].store.read("customers")
    rows = [r.asDict() for r in df.where(df.id == oid).collect()]
    assert len(rows) == 1 and rows[0]["deleted"] is True


def test_entitlement_summary_replaces_set(corpus_engines):
    ev = CORPUS["active_entitlement_summary_updated"]
    obj = ev["data"]["object"]
    cust = obj["customer"]
    want = {e["id"] for e in obj["entitlements"]["data"]}
    df = corpus_engines["active_entitlement_summary_updated"].store.read("active_entitlements")
    got = {r["id"] for r in df.where(df.customer == cust).collect()}
    assert got == want


def test_corpus_is_complete():
    """Every reference fixture type is represented and routed."""
    assert len(CORPUS) == 71
    assert set(ROUTES) == set(CORPUS)
    covered = {R.UPSERT, R.DELETE, R.CUSTOMER_DELETED, R.ENTITLEMENT_SUMMARY}
    assert {a for _, a in ROUTES.values()} <= covered


def test_subscription_items_side_write(corpus_engines):
    """The subscription fixture's embedded items land in subscription_items
    with the parent FK stamped and the price flattened to its id."""
    ev = CORPUS["subscription_created"]
    items = ev["data"]["object"]["items"]["data"]
    df = corpus_engines["subscription_created"].store.read("subscription_items")
    rows = {r["id"]: r.asDict() for r in df.collect()}
    for item in items:
        assert item["id"] in rows, item["id"]
        got = rows[item["id"]]
        assert got["subscription"] == ev["data"]["object"]["id"]
        price = item.get("price")
        if isinstance(price, dict):
            assert got["price"] == price["id"]
