"""Builders for Stripe-shaped webhook events (FIXTURES.md §1-2): the same
envelope/entity shapes the reference's test corpus uses
(packages/fastify-app/src/test/stripe/*.json)."""

from __future__ import annotations

import json
from itertools import count

_seq = count(1)


def event(event_type: str, obj: dict, created: int = 1_700_000_000, event_id: str | None = None) -> str:
    return json.dumps(
        {
            "id": event_id or f"evt_{next(_seq):06d}",
            "object": "event",
            "api_version": "2020-03-02",
            "created": created,
            "data": {"object": obj},
            "livemode": False,
            "pending_webhooks": 1,
            "request": None,
            "type": event_type,
        }
    )


def charge(id="ch_1", customer="cus_1", invoice=None, amount=4200, paid=True, status="succeeded", **kw) -> dict:
    return {
        "id": id, "object": "charge", "amount": amount, "paid": paid,
        "status": status, "currency": "usd", "customer": customer,
        "invoice": invoice, "created": 1_699_000_000, "captured": True,
        "refunded": False, "livemode": False,
        "metadata": {"k": "v"}, **kw,
    }


def customer(id="cus_1", name="Ada", email="ada@example.com", **kw) -> dict:
    return {
        "id": id, "object": "customer", "name": name, "email": email,
        "balance": 0, "created": 1_698_000_000, "currency": "usd",
        "delinquent": False, "livemode": False, "metadata": {}, **kw,
    }


def invoice(id="in_1", customer="cus_1", subscription=None, total=4200, status="open", lines=None, **kw) -> dict:
    return {
        "id": id, "object": "invoice", "customer": customer,
        "subscription": subscription, "total": total, "status": status,
        "currency": "usd", "created": 1_698_500_000, "amount_due": total,
        "amount_paid": 0, "amount_remaining": total, "paid": False,
        "lines": lines or {"object": "list", "data": [], "has_more": False},
        **kw,
    }


def subscription(id="sub_1", customer="cus_1", items=None, status="active", **kw) -> dict:
    return {
        "id": id, "object": "subscription", "customer": customer,
        "status": status, "created": 1_698_600_000,
        "cancel_at_period_end": False, "livemode": False,
        "items": {"object": "list", "data": items or [], "has_more": False},
        **kw,
    }


def sub_item(id="si_1", subscription="sub_1", price="price_1", quantity=1, **kw) -> dict:
    return {
        "id": id, "object": "subscription_item", "subscription": subscription,
        "price": {"id": price, "object": "price"}, "quantity": quantity,
        "created": 1_698_600_000, **kw,
    }


def product(id="prod_1", name="Widget", **kw) -> dict:
    return {"id": id, "object": "product", "name": name, "active": True,
            "created": 1_697_000_000, "livemode": False, **kw}


def price(id="price_1", product="prod_1", unit_amount=1000, **kw) -> dict:
    return {"id": id, "object": "price", "product": product, "active": True,
            "unit_amount": unit_amount, "currency": "usd", "type": "recurring",
            "created": 1_697_100_000, "livemode": False, **kw}


def checkout_session(id="cs_1", customer="cus_1", **kw) -> dict:
    return {"id": id, "object": "checkout.session", "customer": customer,
            "amount_total": 5000, "amount_subtotal": 5000, "currency": "usd",
            "mode": "payment", "status": "complete", "payment_status": "paid",
            "created": 1_699_100_000, "livemode": False, **kw}


def line_item(id="li_1", price="price_1", quantity=2, **kw) -> dict:
    return {"id": id, "object": "item", "amount_total": 2000,
            "amount_subtotal": 2000, "amount_discount": 0, "amount_tax": 0,
            "currency": "usd", "price": {"id": price, "object": "price"},
            "quantity": quantity, **kw}


def entitlement_summary(customer="cus_1", ents=None) -> dict:
    return {
        "object": "entitlements.active_entitlement_summary",
        "customer": customer,
        "entitlements": {"object": "list", "data": ents or [], "has_more": False},
    }


def entitlement(id="ent_1", feature="feat_1", lookup_key="f1") -> dict:
    return {"id": id, "object": "entitlements.active_entitlement",
            "feature": {"id": feature, "object": "entitlements.feature"},
            "lookup_key": lookup_key, "livemode": False}
