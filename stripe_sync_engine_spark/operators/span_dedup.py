"""Span-level (substring) deduplication — find and clip token sequences
that repeat across the corpus, the ExactSubstr stage of a training-data
pipeline (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better": repeated 50-token spans are memorization fuel even when
whole documents are unique; doc-level dedup cannot see them).

The suffix-array formulation of that paper is a single-machine design;
the standard distributed approximation is k-gram hashing, which this
module implements Spark-first:

1. **Gram generation** — per doc, every k-token window becomes one row
   ``(doc, pos, xxhash64(gram))`` via sequence/slice/posexplode — all
   JVM-side expressions, no Python. This explode is O(total tokens)
   rows, the irreducible cost of substring-level dedup at any scale;
   each row is 24 bytes (two longs + an int), not the gram text.
2. **Repeated-gram filter** — ``groupBy(hash).count() >= min_repeats``
   is a map-side-combined partial aggregation: the shuffle carries one
   partial count per distinct gram per partition, NOT one row per
   occurrence. Duplicates-in-one-doc count too (a doc that repeats its
   own boilerplate gets clipped — same as the reference algorithm).
3. **Occurrence recovery** — a left-semi join of the gram rows against
   the surviving hashes; hash collisions (2^-64) can only over-mark a
   span, never lose one, which is the conservative direction for dedup.
4. **Interval merge** — duplicated windows at positions p cover tokens
   [p, p+k); same-length intervals sorted by start merge with a
   lag-window break flag + running sum, then one groupBy — the window
   and the groupBy share the doc_id exchange, so steps 3→4 cost one
   shuffle on the (small) surviving rows.

At 100 TB: step 1's row count is the token count — partition-local and
never collected; step 2's shuffle is bounded by DISTINCT grams (Heaps'
law sublinear); everything after operates only on duplicated positions,
which real corpora keep to a few percent. No driver-side state at all.

Reference analog: none (training-data-pipeline extension; the synced
Stripe tables have no long-text columns to clip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tokens(text_col: str):
    """Whitespace tokens with empties dropped — the same tokenization the
    LM scorer and doc profile use, so span indices line up across stages."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def repeated_spans(
    docs: DataFrame,
    k: int = 20,
    min_repeats: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, span_start, span_end)`` — maximal merged token-index
    intervals [start, end) covered by at least one k-token window whose
    content occurs ``min_repeats``+ times corpus-wide. Docs shorter than
    ``k`` tokens produce no rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_repeats < 2:
        raise ValueError(f"min_repeats must be >= 2, got {min_repeats}")
    # Materialize the token array BEFORE the per-window lambda: an
    # expression (split+filter) referenced inside a HOF lambda re-evaluates
    # per element — O(n²) per doc; a bound column is an O(k) array slice.
    base = docs.select(F.col(id_col), _tokens(text_col).alias("_toks")).where(
        F.size("_toks") >= k
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - k),
        lambda i: F.xxhash64(F.array_join(F.slice("_toks", i + 1, k), " ")),
    )
    occ = base.select(F.col(id_col), F.posexplode(grams).alias("pos", "h"))
    # Keep the gram rows alive across the count and the semi-join — the
    # two consumers below would otherwise re-run the explode scan.
    occ = occ.persist()
    try:
        dup = (
            occ.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= min_repeats)
            .select("h")
        )
        hits = occ.join(dup, "h", "left_semi")
        w = Window.partitionBy(id_col).orderBy("pos")
        # Two selects: window functions can't nest, so the break flag
        # (lag) materializes before the running sum that groups spans.
        flagged = hits.select(
            id_col,
            "pos",
            F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0))
            .otherwise(F.lit(1))
            .alias("brk"),
        )
        grouped = flagged.select(
            id_col,
            "pos",
            F.sum("brk")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("grp"),
        )
        out = grouped.groupBy(id_col, "grp").agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
        ).select(id_col, "span_start", "span_end")
        # Materialize before unpersisting so callers never re-trigger the
        # lineage against a released cache.
        out = out.localCheckpoint(eager=True)
    finally:
        occ.unpersist()
    return out


def clip_repeated_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` with every span's tokens removed from ``text_col`` (plus
    ``tokens_clipped``). The conventional ExactSubstr treatment keeps ONE
    copy of each duplicated sequence; dropping every marked occurrence is
    deliberate here — which copy to keep is corpus-policy (the keep-list
    pipeline's job), while clipping is a pure function of the spans.
    Clipping can create NEW adjacencies that form previously-absent
    k-grams; iterate to a fixed point if that matters (one pass removes
    >99% in practice, per the paper's own appendix)."""
    agg = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    clipped = (
        docs.join(agg, id_col, "left")
        .withColumn("_spans", F.coalesce(F.col("_spans"), F.array()))
        # Bound column, not an inline expression: the keep-filter lambda
        # references the token array per element (see repeated_spans).
        .withColumn("_toks", _tokens(text_col))
    )
    kept = F.filter(
        F.transform("_toks", lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("_spans"),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] < sp["span_end"]),
        ),
    )
    return (
        clipped.withColumn("_kept", kept)
        .withColumn(
            "tokens_clipped",
            (F.size("_toks") - F.size("_kept")).cast("long"),
        )
        .withColumn(
            text_col, F.array_join(F.transform("_kept", lambda s: s["t"]), " ")
        )
        .drop("_spans", "_toks", "_kept")
    )
