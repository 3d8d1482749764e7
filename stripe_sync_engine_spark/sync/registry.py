"""Routing tables for the sync engine — transcriptions of the reference's
dispatch logic (cited per entry), kept as data so both the batch and the
streaming paths share them.

* ``EVENT_ROUTES``: webhook event type → (entity, action) — the ~80-case
  switch in ``processEvent`` (reference stripeSync.ts:107-578).
* ``ID_PREFIX_DISPATCH``: Stripe id prefix → entity — ``syncSingleEntity``
  (reference stripeSync.ts:606-662). Ordered longest-prefix-first so
  ``sub_sched_`` wins over ``sub_``.
* ``FINAL_STATES``: refetch-suppression predicate per entity (reference
  stripeSync.ts:588-604 and the entityInFinalState call sites
  :119,:168,:189,:244,:359,:379,:421,:443,:464).
* ``BACKFILL_PARENTS``: child entity → [(fk_column, parent_entity)] —
  the related-entity backfills (e.g. upsertCharges backfills customers +
  invoices, stripeSync.ts:1060-1070).
* ``BACKFILL_ORDER``: the dependency-ordered 'all' backfill (reference
  stripeSync.ts:686-702).
"""

from __future__ import annotations

UPSERT = "upsert"
DELETE = "delete"
CUSTOMER_DELETED = "customer_deleted"
ENTITLEMENT_SUMMARY = "entitlement_summary"

_CHARGE_EVENTS = [
    "charge.captured", "charge.expired", "charge.failed", "charge.pending",
    "charge.refunded", "charge.succeeded", "charge.updated",
]
_CHECKOUT_EVENTS = [
    "checkout.session.async_payment_failed",
    "checkout.session.async_payment_succeeded",
    "checkout.session.completed", "checkout.session.expired",
]
_SUBSCRIPTION_EVENTS = [
    "customer.subscription.created", "customer.subscription.deleted",
    "customer.subscription.paused",
    "customer.subscription.pending_update_applied",
    "customer.subscription.pending_update_expired",
    "customer.subscription.trial_will_end", "customer.subscription.resumed",
    "customer.subscription.updated",
]
_INVOICE_EVENTS = [
    "invoice.created", "invoice.deleted", "invoice.finalized",
    "invoice.finalization_failed", "invoice.paid",
    "invoice.payment_action_required", "invoice.payment_failed",
    "invoice.payment_succeeded", "invoice.upcoming", "invoice.sent",
    "invoice.voided", "invoice.marked_uncollectible", "invoice.updated",
]

EVENT_ROUTES: dict[str, tuple[str, str]] = {
    **{t: ("charges", UPSERT) for t in _CHARGE_EVENTS},
    "customer.deleted": ("customers", CUSTOMER_DELETED),
    **{t: ("checkout_sessions", UPSERT) for t in _CHECKOUT_EVENTS},
    "customer.created": ("customers", UPSERT),
    "customer.updated": ("customers", UPSERT),
    **{t: ("subscriptions", UPSERT) for t in _SUBSCRIPTION_EVENTS},
    "customer.tax_id.created": ("tax_ids", UPSERT),
    "customer.tax_id.updated": ("tax_ids", UPSERT),
    "customer.tax_id.deleted": ("tax_ids", DELETE),
    **{t: ("invoices", UPSERT) for t in _INVOICE_EVENTS},
    "product.created": ("products", UPSERT),
    "product.updated": ("products", UPSERT),
    "product.deleted": ("products", DELETE),
    "price.created": ("prices", UPSERT),
    "price.updated": ("prices", UPSERT),
    "price.deleted": ("prices", DELETE),
    "plan.created": ("plans", UPSERT),
    "plan.updated": ("plans", UPSERT),
    "plan.deleted": ("plans", DELETE),
    **{t: ("setup_intents", UPSERT) for t in [
        "setup_intent.canceled", "setup_intent.created",
        "setup_intent.requires_action", "setup_intent.setup_failed",
        "setup_intent.succeeded",
    ]},
    **{t: ("subscription_schedules", UPSERT) for t in [
        "subscription_schedule.aborted", "subscription_schedule.canceled",
        "subscription_schedule.completed", "subscription_schedule.created",
        "subscription_schedule.expiring", "subscription_schedule.released",
        "subscription_schedule.updated",
    ]},
    **{t: ("payment_methods", UPSERT) for t in [
        "payment_method.attached", "payment_method.automatically_updated",
        "payment_method.detached", "payment_method.updated",
    ]},
    **{t: ("disputes", UPSERT) for t in [
        "charge.dispute.created", "charge.dispute.funds_reinstated",
        "charge.dispute.funds_withdrawn", "charge.dispute.updated",
        "charge.dispute.closed",
    ]},
    **{t: ("payment_intents", UPSERT) for t in [
        "payment_intent.amount_capturable_updated", "payment_intent.canceled",
        "payment_intent.created", "payment_intent.partially_funded",
        "payment_intent.payment_failed", "payment_intent.processing",
        "payment_intent.requires_action", "payment_intent.succeeded",
    ]},
    **{t: ("credit_notes", UPSERT) for t in [
        "credit_note.created", "credit_note.updated", "credit_note.voided",
    ]},
    "radar.early_fraud_warning.created": ("early_fraud_warnings", UPSERT),
    "radar.early_fraud_warning.updated": ("early_fraud_warnings", UPSERT),
    **{t: ("refunds", UPSERT) for t in [
        "refund.created", "refund.failed", "refund.updated",
        "charge.refund.updated",
    ]},
    "review.closed": ("reviews", UPSERT),
    "review.opened": ("reviews", UPSERT),
    "entitlements.active_entitlement_summary.updated": (
        "active_entitlements", ENTITLEMENT_SUMMARY,
    ),
    "invoice_payment.paid": ("invoice_payments", UPSERT),
}

# Longest-prefix-first (reference stripeSync.ts:606-662).
ID_PREFIX_DISPATCH: list[tuple[str, str]] = [
    ("sub_sched_", "subscription_schedules"),
    ("issfr_", "early_fraud_warnings"),
    ("inpay_", "invoice_payments"),
    ("price_", "prices"),
    ("prod_", "products"),
    ("seti_", "setup_intents"),
    ("feat_", "features"),
    ("cus_", "customers"),
    ("sub_", "subscriptions"),
    ("txi_", "tax_ids"),
    ("prv_", "reviews"),
    ("in_", "invoices"),
    ("pm_", "payment_methods"),
    ("dp_", "disputes"),
    ("du_", "disputes"),
    ("ch_", "charges"),
    ("pi_", "payment_intents"),
    ("cn_", "credit_notes"),
    ("re_", "refunds"),
    ("cs_", "checkout_sessions"),
]

# Entities where a failed refetch (Stripe 404 resource_missing) means the
# object was deleted upstream → delete the row (reference
# stripeSync.ts:267-273 products, :300-306 prices, :333-339 plans).
DELETE_ON_REFETCH_MISSING: frozenset[str] = frozenset({"products", "prices", "plans"})

# entity → (status column, final values): skip refetch when already final.
FINAL_STATES: dict[str, tuple[str, tuple[str, ...]]] = {
    "charges": ("status", ("failed", "succeeded")),
    "subscriptions": ("status", ("canceled", "incomplete_expired")),
    "invoices": ("status", ("void",)),
    "setup_intents": ("status", ("canceled", "succeeded")),
    "payment_intents": ("status", ("canceled", "succeeded")),
    "subscription_schedules": ("status", ("canceled", "completed")),
    "disputes": ("status", ("won", "lost")),
    "credit_notes": ("status", ("void",)),
}

# child entity → [(fk column, parent entity)] (reference: upsertCharges
# :1060-1070, upsertInvoices :1280-1300, upsertSubscriptions :1607-1648, …)
BACKFILL_PARENTS: dict[str, list[tuple[str, str]]] = {
    "charges": [("customer", "customers"), ("invoice", "invoices")],
    "invoices": [("customer", "customers"), ("subscription", "subscriptions")],
    "subscriptions": [("customer", "customers")],
    "subscription_schedules": [("customer", "customers")],
    "setup_intents": [("customer", "customers")],
    "payment_methods": [("customer", "customers")],
    "payment_intents": [("customer", "customers"), ("invoice", "invoices")],
    "credit_notes": [("customer", "customers"), ("invoice", "invoices")],
    "disputes": [("charge", "charges")],
    "early_fraud_warnings": [("charge", "charges")],
    "refunds": [("charge", "charges")],
    "reviews": [("charge", "charges"), ("payment_intent", "payment_intents")],
    "prices": [("product", "products")],
    "plans": [("product", "products")],
    "tax_ids": [("customer", "customers")],
    "checkout_sessions": [("customer", "customers")],
    "active_entitlements": [("feature", "features")],
    "invoice_payments": [("invoice", "invoices")],
}

# Dependency-ordered full backfill (reference stripeSync.ts:686-702).
BACKFILL_ORDER: list[str] = [
    "products", "prices", "plans", "customers", "subscriptions",
    "subscription_schedules", "invoices", "charges", "setup_intents",
    "payment_methods", "payment_intents", "tax_ids", "credit_notes",
    "disputes", "early_fraud_warnings", "refunds", "checkout_sessions",
]

# Entities whose payload embeds a list that may be truncated
# (expandEntity call sites: charge refunds :1072, credit-note lines :1115,
# invoice lines :1280, subscription items :1618).
EXPANDABLE_LISTS: dict[str, str] = {
    "charges": "refunds",
    "credit_notes": "lines",
    "invoices": "lines",
    "subscriptions": "items",
}
