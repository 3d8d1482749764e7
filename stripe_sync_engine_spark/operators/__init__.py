"""Engine operators: merge/upsert family (SURVEY §2.1 S8–S12), keyed
dedup (A3), as-of join, and child-table reconciliation."""
