"""HTTP Stripe client (sources/stripe_http.py) against an in-process stub
server — cursor pagination, created pushdown, retry/backoff, 404→None,
and a full engine backfill through the HTTP path matching the in-memory
API's results. No network: the stub binds 127.0.0.1:0.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

import pytest

from stripe_sync_engine_spark.sources.stripe_http import (
    HTTPStripeAPI,
    StripeHTTPError,
)

# ---------------------------------------------------------------------------
# stub server: collections registered by exact REST path; implements the
# Stripe list envelope (limit / starting_after / has_more), created[...]
# bounds, equality filters (parent fan-out), and injectable failures.


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence request logging
        pass

    def _send(self, status: int, payload: dict, headers: dict | None = None):
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        srv = self.server
        srv.requests.append(self.path)
        srv.auth_headers.append(self.headers.get("Authorization"))
        if srv.failures:
            status, headers = srv.failures.pop(0)
            return self._send(status, {"error": {"message": "injected failure"}}, headers)
        parsed = urlsplit(self.path)
        path, q = parsed.path, dict(parse_qsl(parsed.query))
        if path in srv.collections:
            return self._send(200, self._list(srv.collections[path], q))
        coll, _, oid = path.rpartition("/")
        if coll in srv.collections:
            for o in srv.collections[coll]:
                if o["id"] == oid:
                    return self._send(200, o)
            return self._send(
                404, {"error": {"code": "resource_missing", "message": f"No such: {oid}"}}
            )
        return self._send(404, {"error": {"message": f"Unknown path {path}"}})

    def _list(self, objs: list[dict], q: dict) -> dict:
        bounds = {
            "created[gt]": lambda c, v: c > v,
            "created[gte]": lambda c, v: c >= v,
            "created[lt]": lambda c, v: c < v,
            "created[lte]": lambda c, v: c <= v,
        }
        out = list(objs)
        for k, v in q.items():
            if k in bounds:
                out = [o for o in out if bounds[k](o.get("created") or 0, int(v))]
            elif k in ("limit", "starting_after") or (k, v) == ("status", "all"):
                continue
            else:  # equality filter (parent fan-out: customer=..., subscription=...)
                out = [o for o in out if o.get(k) == v]
        out.sort(key=lambda o: (-(o.get("created") or 0), o["id"]))  # newest-first
        start = 0
        if "starting_after" in q:
            ids = [o["id"] for o in out]
            start = ids.index(q["starting_after"]) + 1
        limit = int(q.get("limit", 10))
        page = out[start : start + limit]
        return {"object": "list", "data": page, "has_more": start + limit < len(out)}


@pytest.fixture()
def stub():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.collections = {}
    srv.failures = []
    srv.requests = []
    srv.auth_headers = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.base_url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def client(stub, **kw):
    kw.setdefault("backoff_s", 0.0)
    kw.setdefault("sleep", lambda s: None)
    return HTTPStripeAPI("sk_test_123", base_url=stub.base_url, **kw)


# ---------------------------------------------------------------------------


def test_list_paginates_with_cursor(stub):
    stub.collections["/v1/products"] = [
        {"id": f"prod_{i:04d}", "created": 1000 + i} for i in range(250)
    ]
    pages = list(client(stub).list("products"))
    assert [len(p) for p in pages] == [100, 100, 50]
    ids = [o["id"] for page in pages for o in page]
    assert len(set(ids)) == 250  # no dup, no loss across cursors
    assert ids[0] == "prod_0249"  # newest-first, like the real API
    # the cursor actually flowed: page 2's request carries starting_after
    assert any("starting_after=prod_0150" in r for r in stub.requests)
    assert all(h == "Bearer sk_test_123" for h in stub.auth_headers)


def test_created_bounds_are_pushed_down(stub):
    stub.collections["/v1/charges"] = [{"id": f"ch_{i}", "created": i * 100} for i in range(10)]
    pages = list(client(stub).list("charges", created={"gte": 300, "lt": 700}))
    got = {o["id"] for page in pages for o in page}
    assert got == {"ch_3", "ch_4", "ch_5", "ch_6"}
    assert any("created%5Bgte%5D=300" in r and "created%5Blt%5D=700" in r for r in stub.requests)


def test_subscriptions_list_includes_status_all(stub):
    stub.collections["/v1/subscriptions"] = [{"id": "sub_1", "created": 1}]
    list(client(stub).list("subscriptions"))
    assert any("status=all" in r for r in stub.requests)


def test_retry_on_429_honors_retry_after(stub):
    stub.collections["/v1/customers"] = [{"id": "cus_1", "created": 1}]
    stub.failures = [(429, {"Retry-After": "3"}), (500, {})]
    delays = []
    api = client(stub, sleep=delays.append)
    assert api.retrieve("customers", "cus_1")["id"] == "cus_1"
    assert len(delays) == 2 and delays[0] >= 3.0  # Retry-After wins over backoff


def test_retries_exhausted_raises(stub):
    stub.failures = [(503, {})] * 3
    with pytest.raises(StripeHTTPError) as ei:
        client(stub, max_retries=3).retrieve("customers", "cus_x")
    assert ei.value.status == 503


def test_4xx_does_not_retry_and_404_returns_none(stub):
    stub.collections["/v1/customers"] = []
    assert client(stub).retrieve("customers", "cus_missing") is None
    stub.failures = [(401, {})]
    with pytest.raises(StripeHTTPError) as ei:
        client(stub).retrieve("customers", "cus_1")
    assert ei.value.status == 401
    assert len([r for r in stub.requests if "cus_1" in r]) == 1  # no retry on 4xx


def test_bare_404_without_resource_missing_raises(stub):
    """Only Stripe's explicit resource_missing code maps to None (deleted);
    an infrastructure 404 (proxy, wrong base path) must surface — the
    engine's read-repair would otherwise hard-delete live rows."""
    # no /v1/products collection registered → the stub's unknown-path 404
    # carries no error code, like a misrouted gateway response
    with pytest.raises(StripeHTTPError) as ei:
        client(stub).retrieve("products", "prod_1")
    assert ei.value.status == 404 and ei.value.code is None


def test_no_sleep_after_final_attempt(stub):
    stub.failures = [(503, {"Retry-After": "60"})] * 2
    delays = []
    with pytest.raises(StripeHTTPError):
        client(stub, max_retries=2, sleep=delays.append).retrieve("customers", "cus_1")
    # one sleep between the two attempts, none after the final failure
    assert len(delays) == 1


def test_parent_fanout_and_subresources(stub):
    stub.collections["/v1/payment_methods"] = [
        {"id": "pm_1", "customer": "cus_a", "created": 1},
        {"id": "pm_2", "customer": "cus_b", "created": 2},
    ]
    stub.collections["/v1/checkout/sessions/cs_1/line_items"] = [
        {"id": "li_1", "created": 1},
        {"id": "li_2", "created": 2},
    ]
    stub.collections["/v1/invoices/in_1/lines"] = [{"id": "il_1", "created": 1}]
    stub.collections["/v1/subscription_items"] = [
        {"id": "si_1", "subscription": "sub_1", "created": 1},
        {"id": "si_2", "subscription": "sub_2", "created": 2},
    ]
    api = client(stub)
    assert [o["id"] for o in api.list_by_parent("payment_methods", "customer", "cus_a")] == ["pm_1"]
    assert {o["id"] for o in api.list_line_items("cs_1")} == {"li_1", "li_2"}
    assert [o["id"] for o in api.list_expanded("invoices", "in_1", "lines")] == ["il_1"]
    assert [o["id"] for o in api.list_expanded("subscriptions", "sub_1", "items")] == ["si_1"]


def test_unknown_entity_raises():
    with pytest.raises(ValueError):
        HTTPStripeAPI("sk").list("not_an_entity")


# ---------------------------------------------------------------------------
# end-to-end: the engine's backfill through the HTTP client produces the
# same table state as through the in-memory API.


def test_engine_backfill_through_http(spark, tmp_path, stub):
    from stripe_sync_engine_spark.sources.stripe_api import InMemoryStripeAPI
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync import StripeSparkSync
    from tests import fixtures as fx

    products = [fx.product(id=f"prod_{i}", created=1000 + i) for i in range(130)]
    customers = [fx.customer(id=f"cus_{i}", created=2000 + i) for i in range(7)]
    stub.collections["/v1/products"] = products
    stub.collections["/v1/customers"] = customers

    http_eng = StripeSparkSync(
        spark, TableStore(spark, str(tmp_path / "wh_http")), api=client(stub)
    )
    mem_api = InMemoryStripeAPI()
    for p in products:
        mem_api.put("products", p)
    for c in customers:
        mem_api.put("customers", c)
    mem_eng = StripeSparkSync(spark, TableStore(spark, str(tmp_path / "wh_mem")), api=mem_api)

    for eng in (http_eng, mem_eng):
        assert eng.sync_backfill("products")["products"] == 130
        assert eng.sync_backfill("customers", created={"gte": 2003})["customers"] == 4
    for table in ("products", "customers"):
        h = {r["id"] for r in http_eng.store.read(table).collect()}
        m = {r["id"] for r in mem_eng.store.read(table).collect()}
        assert h == m


def test_list_by_parent_carries_extra_list_params(stub):
    """Parent fan-out must apply the same extra params as list() —
    subscriptions without status=all would silently exclude canceled ones,
    diverging from the in-memory API and the reference."""
    stub.collections["/v1/subscriptions"] = [
        {"id": "sub_c", "customer": "cus_a", "status": "canceled", "created": 1},
        {"id": "sub_a", "customer": "cus_a", "status": "active", "created": 2},
    ]
    got = {o["id"] for o in client(stub).list_by_parent("subscriptions", "customer", "cus_a")}
    assert got == {"sub_a", "sub_c"}
    assert any("status=all" in r and "customer=cus_a" in r for r in stub.requests)


# ---------------------------------------------------------------------------
# Round-7 hardening: a total wall-clock deadline bounds retrying (attempt
# caps alone are unbounded in TIME when Retry-After is large), and windowed
# backfills report per-flush progress instead of staying silent.
def test_total_deadline_bounds_retry_time(stub):
    """An always-429 window with a huge Retry-After: the deadline clips
    each sleep to the remaining budget and surfaces the last 429 loudly —
    total simulated wall time never exceeds the budget."""
    stub.failures = [(429, {"Retry-After": "3600"})] * 100

    class FakeTime:
        t = 0.0

        def sleep(self, s):
            self.t += s

        def clock(self):
            return self.t

    ft = FakeTime()
    api = client(
        stub, max_retries=50, total_deadline_s=10.0, sleep=ft.sleep, clock=ft.clock
    )
    with pytest.raises(StripeHTTPError) as ei:
        api.retrieve("customers", "cus_x")
    assert ei.value.status == 429
    assert ft.t <= 10.0 + 1e-9  # never slept past the budget
    # far fewer than max_retries attempts were made before the budget won
    assert 1 < len(stub.requests) < 50


def test_total_deadline_none_preserves_attempt_cap(stub):
    stub.failures = [(503, {})] * 4
    with pytest.raises(StripeHTTPError):
        client(stub, max_retries=4, total_deadline_s=None).retrieve("customers", "c")
    assert len(stub.requests) == 4


def test_windowed_backfill_reports_progress(spark, tmp_path, stub):
    """sync_backfill_windows(on_progress=...) fires after every flush of
    every window with a monotonically growing per-window count summing to
    the total — a long backfill is observable while it runs."""
    import threading as _threading

    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync import StripeSparkSync, SyncConfig
    from stripe_sync_engine_spark.sync.engine import FLUSH_CHUNK

    stub.collections["/v1/products"] = [
        {"id": f"prod_{i:04d}", "object": "product", "created": 1000 + i} for i in range(600)
    ]
    engine = StripeSparkSync(
        spark,
        TableStore(spark, str(tmp_path / "wh_prog")),
        api=client(stub),
        config=SyncConfig(backfill_related_entities=False),
    )
    events, lock = [], _threading.Lock()

    def on_progress(ev):
        with lock:
            events.append(dict(ev))

    total = engine.sync_backfill_windows(
        "products", {"gte": 1000, "lt": 1600}, n_windows=3, on_progress=on_progress
    )
    assert total == 600
    assert all(e["entity"] == "products" for e in events)
    windows = {json.dumps(e["created"], sort_keys=True) for e in events}
    assert len(windows) == 3  # every window reported
    by_window: dict[str, list[int]] = {}
    for e in events:
        by_window.setdefault(json.dumps(e["created"], sort_keys=True), []).append(e["synced"])
    for counts in by_window.values():
        assert counts == sorted(counts)  # monotone within a window
        assert len(counts) >= 1
    assert sum(c[-1] for c in by_window.values()) == 600
    # flush cadence: a 200-object window reports at FLUSH_CHUNK granularity
    assert any(c == FLUSH_CHUNK for counts in by_window.values() for c in counts) or (
        FLUSH_CHUNK > 200
    )
