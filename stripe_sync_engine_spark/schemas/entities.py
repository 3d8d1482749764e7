"""Entity schemas, transcribed from the reference's projection lists and
migration DDL (NOT copied code — column inventories are the interface).

Sources (reference, /root/reference/packages/sync-engine/src/):
* property lists: ``schemas/<entity>.ts`` (e.g. charge.ts:3-43,
  customer.ts:3-27, invoice.ts:3-65, subscription.ts:3-40)
* authoritative types: ``database/migrations/0001…0042`` (e.g.
  0006_charges.sql, 0002_customers.sql, 0005_invoices.sql,
  0004_subscriptions.sql, 0035_checkout_sessions.sql)
* sync metadata columns: 0012_add_updated_at.sql, 0033_add_last_synced_at.sql

Type mapping per SURVEY.md §1.2: pg bigint/integer → LongType (money stays
integer cents), boolean → BooleanType, double precision → DoubleType,
text/enum → StringType, jsonb → StringType holding raw JSON text (keeps
oracle comparison canonical; ``from_json``/``get_json_object`` reconstruct
structure on demand). Every table additionally carries ``updated_at`` and
``last_synced_at`` TimestampType maintained by the merge engine.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Column-name → type classification, from the migration DDL scan
# (all integer/bigint unified to LongType).
LONG_COLS = {
    "amount", "amount_due", "amount_off", "amount_paid", "amount_refunded",
    "amount_remaining", "amount_requested", "amount_reversed", "amount_capturable",
    "amount_discount", "amount_received", "amount_shipping", "amount_subtotal",
    "amount_tax", "amount_total", "application_fee_amount", "attempt_count",
    "balance", "billing_cycle_anchor", "cancel_at", "canceled_at", "completed_at",
    "created", "current_period_end", "current_period_start", "days_until_due",
    "discount_amount", "due_date", "duration_in_months", "ended_at",
    "ending_balance", "expires_at", "interval_count", "max_redemptions",
    "next_invoice_sequence", "next_payment_attempt",
    "next_pending_invoice_item_invoice", "out_of_band_amount", "pending_webhooks",
    "period_end", "period_start", "post_payment_credit_notes_amount",
    "pre_payment_credit_notes_amount", "quantity", "redeem_by", "released_at",
    "start_date", "starting_balance", "subtotal", "subtotal_excluding_tax",
    "tax", "times_redeemed", "total", "total_excluding_tax",
    "trial_period_days", "unit_amount", "updated", "voided_at",
    "webhooks_delivered_at",
}
BOOL_COLS = {
    "actionable", "active", "allow_promotion_codes", "attempted",
    "auto_advance", "automatic", "cancel_at_period_end", "captured",
    "deleted", "delinquent", "is_charge_refundable", "is_default", "livemode",
    "open", "paid", "refunded", "shippable", "valid",
}
DOUBLE_COLS = {"application_fee_percent", "percent_off", "percent_off_precise"}

# Per-entity projection lists (reference schemas/*.ts; order preserved).
ENTITY_PROPS: dict[str, list[str]] = {
    # schemas/product.ts:3-20, migrations/0001_products.sql + 0027 + 0031
    "products": [
        "id", "object", "active", "default_price", "description", "metadata",
        "name", "created", "images", "marketing_features", "livemode",
        "package_dimensions", "shippable", "statement_descriptor", "unit_label",
        "updated", "url",
    ],
    # schemas/customer.ts:3-27, migrations/0002_customers.sql + 0015
    "customers": [
        "id", "object", "address", "description", "email", "metadata", "name",
        "phone", "shipping", "balance", "created", "currency", "default_source",
        "delinquent", "discount", "invoice_prefix", "invoice_settings",
        "livemode", "next_invoice_sequence", "preferred_locales", "tax_exempt",
        "deleted",
    ],
    # schemas/price.ts:3-19, migrations/0003_prices.sql
    "prices": [
        "id", "object", "active", "currency", "metadata", "nickname",
        "recurring", "type", "unit_amount", "billing_scheme", "created",
        "livemode", "lookup_key", "tiers_mode", "transform_quantity",
        "unit_amount_decimal", "product",
    ],
    # schemas/subscription.ts:3-40, migrations/0004 + 0039 + 0041
    "subscriptions": [
        "id", "object", "cancel_at_period_end", "current_period_end",
        "current_period_start", "default_payment_method", "items", "metadata",
        "pending_setup_intent", "pending_update", "status",
        "application_fee_percent", "billing_cycle_anchor", "billing_thresholds",
        "cancel_at", "canceled_at", "collection_method", "created",
        "days_until_due", "default_source", "default_tax_rates", "discount",
        "ended_at", "livemode", "next_pending_invoice_item_invoice",
        "pause_collection", "pending_invoice_item_interval", "start_date",
        "transfer_data", "trial_end", "trial_start", "schedule", "customer",
        "latest_invoice", "plan", "billing_mode",
    ],
    # schemas/invoice.ts:3-65, migrations/0005 + 0023
    "invoices": [
        "id", "object", "auto_advance", "collection_method", "currency",
        "description", "hosted_invoice_url", "lines", "metadata", "period_end",
        "period_start", "status", "total", "account_country", "account_name",
        "account_tax_ids", "amount_due", "amount_paid", "amount_remaining",
        "application_fee_amount", "attempt_count", "attempted",
        "billing_reason", "created", "custom_fields", "customer_address",
        "customer_email", "customer_name", "customer_phone",
        "customer_shipping", "customer_tax_exempt", "customer_tax_ids",
        "default_tax_rates", "discount", "discounts", "due_date",
        "ending_balance", "footer", "invoice_pdf", "last_finalization_error",
        "livemode", "next_payment_attempt", "number", "paid",
        "payment_settings", "post_payment_credit_notes_amount",
        "pre_payment_credit_notes_amount", "receipt_number",
        "starting_balance", "statement_descriptor", "status_transitions",
        "subtotal", "tax", "total_discount_amounts", "total_tax_amounts",
        "transfer_data", "webhooks_delivered_at", "customer", "subscription",
        "payment_intent", "default_payment_method", "default_source",
        "on_behalf_of", "charge",
    ],
    # schemas/charge.ts:3-43, migrations/0006 + 0017
    "charges": [
        "id", "object", "paid", "order", "amount", "review", "source",
        "status", "created", "dispute", "invoice", "outcome", "refunds",
        "captured", "currency", "customer", "livemode", "metadata", "refunded",
        "shipping", "application", "description", "destination",
        "failure_code", "on_behalf_of", "fraud_details", "receipt_email",
        "payment_intent", "receipt_number", "transfer_group",
        "amount_refunded", "application_fee", "failure_message",
        "source_transfer", "balance_transaction", "statement_descriptor",
        "payment_method_details",
    ],
    # schemas/dispute.ts:3-19, migrations/0008_disputes.sql
    "disputes": [
        "id", "object", "amount", "charge", "created", "currency",
        "balance_transactions", "evidence", "evidence_details",
        "is_charge_refundable", "livemode", "metadata", "payment_intent",
        "reason", "status",
    ],
    # schemas/plan.ts:3-20, migrations/0011 + 0022
    "plans": [
        "id", "object", "active", "amount", "created", "product", "currency",
        "interval", "livemode", "metadata", "nickname", "tiers_mode",
        "usage_type", "billing_scheme", "interval_count", "aggregate_usage",
        "transform_usage", "trial_period_days",
    ],
    # schemas/subscription_item.ts:3-15, migrations/0013 + 0032
    "subscription_items": [
        "id", "object", "billing_thresholds", "created", "deleted", "metadata",
        "quantity", "price", "subscription", "tax_rates",
        "current_period_end", "current_period_start",
    ],
    # schemas/setup_intents.ts:3-15, migrations/0018
    "setup_intents": [
        "id", "object", "created", "customer", "description",
        "payment_method", "status", "usage", "cancellation_reason",
        "latest_attempt", "mandate", "single_use_mandate", "on_behalf_of",
    ],
    # schemas/payment_methods.ts:3-10, migrations/0019
    "payment_methods": [
        "id", "object", "created", "customer", "type", "billing_details",
        "metadata", "card",
    ],
    # schemas/payment_intent.ts:3-39, migrations/0021
    "payment_intents": [
        "id", "object", "amount", "amount_capturable", "amount_details",
        "amount_received", "application", "application_fee_amount",
        "automatic_payment_methods", "canceled_at", "cancellation_reason",
        "capture_method", "client_secret", "confirmation_method", "created",
        "currency", "customer", "description", "invoice", "last_payment_error",
        "livemode", "metadata", "next_action", "on_behalf_of",
        "payment_method", "payment_method_options", "payment_method_types",
        "processing", "receipt_email", "review", "setup_future_usage",
        "shipping", "statement_descriptor", "statement_descriptor_suffix",
        "status", "transfer_data", "transfer_group",
    ],
    # schemas/subscription_schedules.ts:3-20, migrations/0024 + 0041
    "subscription_schedules": [
        "id", "object", "application", "canceled_at", "completed_at",
        "created", "current_phase", "customer", "default_settings",
        "end_behavior", "livemode", "metadata", "phases", "released_at",
        "released_subscription", "status", "subscription", "test_clock",
        "billing_mode",
    ],
    # schemas/tax_id.ts:3-11, migrations/0025
    "tax_ids": [
        "id", "country", "customer", "type", "value", "object", "created",
        "livemode", "owner",
    ],
    # schemas/credit_note.ts:3-31, migrations/0026
    "credit_notes": [
        "id", "object", "amount", "amount_shipping", "created", "currency",
        "customer", "customer_balance_transaction", "discount_amount",
        "discount_amounts", "invoice", "lines", "livemode", "memo", "metadata",
        "number", "out_of_band_amount", "pdf", "reason", "refund",
        "shipping_cost", "status", "subtotal", "subtotal_excluding_tax",
        "tax_amounts", "total", "total_excluding_tax", "type", "voided_at",
    ],
    # schemas/early_fraud_warning.ts:3-10, migrations/0028
    "early_fraud_warnings": [
        "id", "object", "actionable", "charge", "created", "fraud_type",
        "livemode", "payment_intent",
    ],
    # schemas/review.ts:3-16, migrations/0029
    "reviews": [
        "id", "object", "billing_zip", "created", "charge", "closed_reason",
        "livemode", "ip_address", "ip_address_location", "open",
        "opened_reason", "payment_intent", "reason", "session",
    ],
    # schemas/refund.ts:3-16, migrations/0030
    "refunds": [
        "id", "object", "amount", "balance_transaction", "charge", "created",
        "currency", "destination_details", "metadata", "payment_intent",
        "reason", "receipt_number", "source_transfer_reversal", "status",
        "transfer_reversal",
    ],
    # schemas/checkout_sessions.ts:4-66, migrations/0035
    "checkout_sessions": [
        "id", "object", "adaptive_pricing", "after_expiration",
        "allow_promotion_codes", "amount_subtotal", "amount_total",
        "automatic_tax", "billing_address_collection", "cancel_url",
        "client_reference_id", "client_secret", "collected_information",
        "consent", "consent_collection", "created", "currency",
        "currency_conversion", "custom_fields", "custom_text", "customer",
        "customer_creation", "customer_details", "customer_email", "discounts",
        "expires_at", "invoice", "invoice_creation", "livemode", "locale",
        "metadata", "mode", "optional_items", "payment_intent", "payment_link",
        "payment_method_collection", "payment_method_configuration_details",
        "payment_method_options", "payment_method_types", "payment_status",
        "permissions", "phone_number_collection", "presentment_details",
        "recovered_from", "redirect_on_completion", "return_url",
        "saved_payment_method_options", "setup_intent",
        "shipping_address_collection", "shipping_cost", "shipping_details",
        "shipping_options", "status", "submit_type", "subscription",
        "success_url", "tax_id_collection", "total_details", "ui_mode", "url",
        "wallet_options",
    ],
    # schemas/checkout_session_line_items.ts:3-14, migrations/0036
    "checkout_session_line_items": [
        "id", "object", "amount_discount", "amount_subtotal", "amount_tax",
        "amount_total", "currency", "description", "price", "quantity",
        "checkout_session",
    ],
    # schemas/feature.ts:3-10, migrations/0037
    "features": [
        "id", "object", "livemode", "name", "lookup_key", "active", "metadata",
    ],
    # schemas/active_entitlement.ts:3-9, migrations/0038
    "active_entitlements": [
        "id", "object", "feature", "lookup_key", "livemode", "customer",
    ],
    # schemas/invoice_payment.ts:3-14, migrations/0040
    "invoice_payments": [
        "id", "object", "amount_paid", "amount_requested", "created",
        "currency", "invoice", "is_default", "livemode", "payment", "status",
        "status_transitions",
    ],
}

# Vestigial tables (migration exists, no sync handler — SURVEY §1.3):
# ported as tables only so a reference user's DDL surface is complete.
VESTIGIAL_PROPS: dict[str, list[str]] = {
    # migrations/0007_coupons.sql
    "coupons": [
        "id", "object", "amount_off", "created", "currency",
        "duration", "duration_in_months", "livemode", "max_redemptions",
        "metadata", "name", "percent_off", "percent_off_precise", "redeem_by",
        "times_redeemed", "valid",
    ],
    # migrations/0009_events.sql
    "stripe_events": ["id", "object", "api_version", "created", "data", "livemode",
                      "pending_webhooks", "request", "type"],
    # migrations/0010_payouts.sql
    "payouts": [
        "id", "object", "amount", "arrival_date", "automatic",
        "balance_transaction", "created", "currency", "description",
        "destination", "failure_balance_transaction", "failure_code",
        "failure_message", "livemode", "metadata", "method", "source_type",
        "statement_descriptor", "status", "type",
    ],
}

# Fields that are enum-as-text in the reference; validated with isin at
# merge time (Spark has no enum type). migrations/0005:2-8, 0004:2-16,
# 0003:1-9, 0024:1-7, 0039, 0023.
ENUM_VALUES: dict[tuple[str, str], tuple[str, ...]] = {
    ("invoices", "status"): ("draft", "open", "paid", "uncollectible", "void", "deleted"),
    ("subscriptions", "status"): (
        "trialing", "active", "canceled", "incomplete", "incomplete_expired",
        "past_due", "unpaid", "paused",
    ),
    ("prices", "type"): ("one_time", "recurring"),
    ("prices", "tiers_mode"): ("graduated", "volume"),
    ("subscription_schedules", "status"): (
        "not_started", "active", "completed", "released", "canceled",
    ),
}


def _col_type(name: str):
    if name in LONG_COLS:
        return LongType()
    if name in BOOL_COLS:
        return BooleanType()
    if name in DOUBLE_COLS:
        return DoubleType()
    return StringType()


def entity_schema(entity: str) -> StructType:
    """StructType for an entity table: declared projection + sync metadata
    (updated_at / last_synced_at, reference migrations 0012 + 0033)."""
    props = ENTITY_PROPS.get(entity) or VESTIGIAL_PROPS[entity]
    fields = [StructField(p, _col_type(p), nullable=(p != "id")) for p in props]
    fields.append(StructField("updated_at", TimestampType(), nullable=False))
    fields.append(StructField("last_synced_at", TimestampType(), nullable=True))
    return StructType(fields)


def entity_tables() -> list[str]:
    """All actively synced entity tables."""
    return list(ENTITY_PROPS)


# Storage bucket key per entity — the hash-partition key of the table's
# parquet store. Default is the primary key ``id``; child-set tables whose
# write semantics are per-PARENT set operations (soft-delete reconciliation
# of subscription items — reference markDeletedSubscriptionItems,
# stripeSync.ts:1559-1583 — and the entitlement replace-set,
# deleteRemovedActiveEntitlements :1650-1660) bucket by the parent FK
# instead: one parent's rows co-locate, so BOTH the merge and the
# stale-row discovery prune to the batch parents' buckets (O(batch), never
# an O(table) scan). Safe because a child never changes parent (Stripe
# subscription items are bound to their subscription, entitlements to
# their customer), so a row's bucket is stable for its lifetime.
# INVARIANT: a declared FK bucket key must be an IMMUTABLE attribute of
# the entity (in Stripe's model an item never changes subscription, an
# entitlement never changes customer). The clustered merge and all bucket
# pruning assume one key ↔ one bucket-key value
# (operators/merge.py merge_upsert_clustered contract); parent-set changes
# flow through replace-set/reconcile, never through a plain merge.
BUCKET_KEYS: dict[str, str] = {
    "subscription_items": "subscription",
    "active_entitlements": "customer",
}


def bucket_key(entity: str) -> str:
    """The storage bucket key for an entity table (see BUCKET_KEYS)."""
    return BUCKET_KEYS.get(entity, "id")
