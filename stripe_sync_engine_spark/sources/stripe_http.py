"""HTTP implementation of the ``StripeAPI`` protocol.

The reference talks to live Stripe through the official SDK
(stripeSync.ts:780-1058: paginated ``list`` at 100/page, ``retrieve``,
per-parent fan-out; the SDK supplies cursor pagination and retries under
the hood). This module supplies the same behavior over the public REST
API with nothing but ``urllib`` — cursor pagination via
``starting_after``, ``created[...]`` predicate pushdown, retry with
exponential backoff on 429/5xx (honoring ``Retry-After``), and
``resource_missing`` → ``None`` so the engine's read-repair path treats
a 404 as a deletion, exactly as the reference does
(stripeSync.ts:1090-1099).

Scan shape at scale is unchanged from the protocol docstring
(``stripe_api.py``): a cursor API is driver-serial per entity, so
parallelism comes from backfilling entities concurrently and splitting
``created`` ranges — each page-batch then feeds the distributed merge
pipeline. The client itself must therefore be cheap and streaming: pages
are yielded as they arrive, never accumulated.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator

from stripe_sync_engine_spark.sources.stripe_api import PAGE_SIZE

DEFAULT_BASE_URL = "https://api.stripe.com"

# entity name (registry vocabulary) → REST collection path
ENTITY_PATHS: dict[str, str] = {
    "products": "/v1/products",
    "prices": "/v1/prices",
    "plans": "/v1/plans",
    "coupons": "/v1/coupons",
    "promotion_codes": "/v1/promotion_codes",
    "customers": "/v1/customers",
    "subscriptions": "/v1/subscriptions",
    "subscription_items": "/v1/subscription_items",
    "subscription_schedules": "/v1/subscription_schedules",
    "invoices": "/v1/invoices",
    "invoice_payments": "/v1/invoice_payments",
    "charges": "/v1/charges",
    "setup_intents": "/v1/setup_intents",
    "payment_methods": "/v1/payment_methods",
    "payment_intents": "/v1/payment_intents",
    "tax_ids": "/v1/tax_ids",
    "credit_notes": "/v1/credit_notes",
    "disputes": "/v1/disputes",
    "early_fraud_warnings": "/v1/radar/early_fraud_warnings",
    "refunds": "/v1/refunds",
    "reviews": "/v1/reviews",
    "checkout_sessions": "/v1/checkout/sessions",
    "features": "/v1/entitlements/features",
    "active_entitlements": "/v1/entitlements/active_entitlements",
}

# extra list() params some collections require (reference passes
# status:'all' so canceled subscriptions still sync, stripeSync.ts:846)
EXTRA_LIST_PARAMS: dict[str, dict[str, str]] = {
    "subscriptions": {"status": "all"},
}

# (entity, embedded prop) → subresource path template for list_expanded
# (reference expandEntity call sites: charge refunds :1072, credit-note
# lines :1115, invoice lines :1280, subscription items :1618)
EXPANDED_PATHS: dict[tuple[str, str], str] = {
    ("charges", "refunds"): "/v1/charges/{id}/refunds",
    ("credit_notes", "lines"): "/v1/credit_notes/{id}/lines",
    ("invoices", "lines"): "/v1/invoices/{id}/lines",
    ("subscriptions", "items"): "/v1/subscription_items?subscription={id}",
}

RETRY_STATUS = {429, 500, 502, 503, 504}


class StripeHTTPError(RuntimeError):
    def __init__(self, status: int, message: str, code: str | None = None):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message
        self.code = code  # Stripe error code, e.g. "resource_missing"


class HTTPStripeAPI:
    """``StripeAPI`` over REST. Drop-in for ``InMemoryStripeAPI`` in the
    engine's backfill / read-repair / fan-out paths."""

    def __init__(
        self,
        api_key: str,
        base_url: str = DEFAULT_BASE_URL,
        max_retries: int = 5,
        backoff_s: float = 0.5,
        timeout_s: float = 30.0,
        api_version: str | None = None,
        total_deadline_s: float | None = 300.0,
        sleep=time.sleep,
        clock=time.monotonic,
    ):
        """``total_deadline_s``: hard cap on the TOTAL wall-clock one
        request may spend across retries INCLUDING backoff sleeps. The
        attempt-count cap alone is unbounded in time — a throttling proxy
        sending ``Retry-After: 3600`` would park a long backfill for hours
        per request; the deadline surfaces the last error loudly instead,
        and individual sleeps are clipped to the remaining budget. None
        disables the cap (attempt count still bounds)."""
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.max_retries = max(1, max_retries)  # at least the initial attempt
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.api_version = api_version
        self.total_deadline_s = total_deadline_s
        self._sleep = sleep  # injectable for tests
        self._clock = clock  # injectable for tests (advanced by fake sleep)

    # -- transport -----------------------------------------------------
    def _request(self, path: str, params: dict | None = None) -> dict:
        qs = urllib.parse.urlencode(params or {})
        sep = "&" if "?" in path else "?"
        url = self.base_url + path + (sep + qs if qs else "")
        headers = {"Authorization": f"Bearer {self.api_key}"}
        if self.api_version:
            headers["Stripe-Version"] = self.api_version
        last: StripeHTTPError | None = None
        deadline = (
            self._clock() + self.total_deadline_s if self.total_deadline_s is not None else None
        )
        for attempt in range(self.max_retries):
            req = urllib.request.Request(url, headers=headers)
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return json.load(resp)
            except urllib.error.HTTPError as e:
                body = e.read().decode("utf-8", "replace")
                try:
                    err = json.loads(body).get("error", {})
                    msg, code = err.get("message", body), err.get("code")
                except (json.JSONDecodeError, AttributeError):
                    msg, code = body, None
                last = StripeHTTPError(e.code, msg, code)
                if e.code not in RETRY_STATUS:
                    raise last from None
                retry_after = e.headers.get("Retry-After")
            except urllib.error.URLError as e:  # connection reset / DNS / timeout
                last = StripeHTTPError(0, str(e.reason))
                retry_after = None
            if attempt == self.max_retries - 1:
                break  # no retry remains: surface the error immediately
            delay = self.backoff_s * (2**attempt)
            if retry_after:
                try:
                    delay = max(delay, float(retry_after))
                except ValueError:
                    pass
            if deadline is not None:
                remaining = deadline - self._clock()
                if remaining <= 0:
                    break  # budget spent: surface the last error loudly
                delay = min(delay, remaining)  # never sleep past the deadline
            self._sleep(delay)
        raise last  # retries/deadline exhausted

    def _paginate(self, path: str, params: dict) -> Iterator[list[dict]]:
        """Cursor pagination: follow ``starting_after`` while ``has_more``.
        Pages are yielded as received — nothing is buffered, so a 10M-object
        collection streams through the caller's FLUSH_CHUNK batching."""
        params = dict(params, limit=PAGE_SIZE)
        while True:
            page = self._request(path, params)
            data = page.get("data", [])
            if data:
                yield data
            if not page.get("has_more") or not data:
                return
            params["starting_after"] = data[-1]["id"]

    def _path(self, entity: str) -> str:
        try:
            return ENTITY_PATHS[entity]
        except KeyError:
            raise ValueError(f"no REST path known for entity {entity!r}") from None

    # -- StripeAPI protocol --------------------------------------------
    def retrieve(self, entity: str, obj_id: str) -> dict | None:
        try:
            return self._request(self._path(entity) + "/" + urllib.parse.quote(obj_id))
        except StripeHTTPError as e:
            # ONLY Stripe's explicit resource_missing means "this object no
            # longer exists" (the signal read-repair maps to a delete —
            # reference stripeSync.ts:267-273). A bare 404 from a proxy,
            # a wrong base_url, or a routing blip must surface as an error,
            # or infrastructure trouble would hard-delete live rows.
            if e.status == 404 and e.code == "resource_missing":
                return None
            raise

    def list(self, entity: str, created: dict | None = None) -> Iterator[list[dict]]:
        params = dict(EXTRA_LIST_PARAMS.get(entity, {}))
        for op, v in (created or {}).items():
            if op not in ("gt", "gte", "lt", "lte"):
                raise ValueError(f"unsupported created bound {op!r}")
            params[f"created[{op}]"] = int(v)
        return self._paginate(self._path(entity), params)

    def list_line_items(self, session_id: str) -> list[dict]:
        path = f"/v1/checkout/sessions/{urllib.parse.quote(session_id)}/line_items"
        return [item for page in self._paginate(path, {}) for item in page]

    def list_expanded(self, entity: str, obj_id: str, prop: str) -> list[dict]:
        tmpl = EXPANDED_PATHS.get((entity, prop))
        if tmpl is None:
            raise ValueError(f"no subresource path for {entity!r}.{prop!r}")
        path = tmpl.format(id=urllib.parse.quote(obj_id))
        return [item for page in self._paginate(path, {}) for item in page]

    def list_by_parent(self, entity: str, parent_field: str, parent_id: str) -> list[dict]:
        # same extra params as list(): e.g. subscriptions need status=all or
        # Stripe's default filter silently excludes canceled ones — the
        # in-memory API (and the reference) returns them
        params = dict(EXTRA_LIST_PARAMS.get(entity, {}), **{parent_field: parent_id})
        return [item for page in self._paginate(self._path(entity), params) for item in page]
