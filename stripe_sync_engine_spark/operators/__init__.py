"""Engine operators: merge/upsert family (SURVEY §2.1 S8–S12), keyed
dedup (A3), as-of join, child-table reconciliation, incremental rollups,
skew mitigation — plus the training-data layer's incremental gates
(``incremental_dedup``, ``embedding_index``), sequence packing
(``packing``), the verifiable corpus shard exporter (``export``),
ExactSubstr-style span-level dedup (``span_dedup``), deterministic
weighted corpus mixing with maintained category counts, the
length-stratified heavy-tail-bounded draw with its feed-maintained
hash-CDF, fan-out-delivered fold windows with a read-only drift audit
(``apply_window`` / ``verify``), and manifest-verified exports for both
recipe kinds (``mixing``), persisted BM25 postings
(``postings``) and IVF-PQ ANN (``pq_index``), and the derived-index
drift audit + repair loop (``index_audit``)."""
