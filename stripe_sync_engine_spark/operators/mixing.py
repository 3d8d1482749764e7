"""Deterministic weighted corpus mixing — the data-mixture assembly
step of a training pipeline: given per-category target proportions
(the "30% code, 40% web, 30% books" recipe), solve the per-category
keep RATES the current corpus supports and draw the sample with a
salted content-hash threshold, so the mixture is reproducible
byte-for-byte across runs, engines, and cluster layouts.

Why hash-threshold and not ``df.sample()``: Spark's sampler is
seed-per-partition — the drawn set changes with partitioning, task
retries, and cluster size, which makes a training corpus impossible to
reproduce or audit. Here each row's draw is a pure function of
(id, salt) via the repo's ONE md5→int64 bridge (``export.h32_col`` /
``export.sql_h32``), so the same corpus + same salt = the same mixture
anywhere, a different salt = an independent redraw (epoch resampling),
and any row's membership can be re-derived after the fact.

At 100 TB: ``sample_mixture`` is ONE scan with a broadcast literal map
and zero shuffle — the filter is whole-stage-codegen'd JVM expressions
(md5/conv/CASE), no Python anywhere. The rates solver reads one
map-side-combined ``groupBy(category).count()`` whose driver-side
result is bounded by the category-set size (``MAX_CATEGORIES`` guards
the bounded-collect rule — a high-cardinality column passed as the
category by mistake fails loudly, never OOMs the driver).

Reference analog: none (training-data-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stripe_sync_engine_spark.operators.export import h32_col, sql_h32

#: the draw space of the 32-bit hash: thresholds are rate × H32_SPACE
H32_SPACE = 1 << 32

#: bounded-collect guard for the rates solver's category histogram
MAX_CATEGORIES = 10_000


def mixture_rates(
    category_counts: dict[str, int],
    target_props: dict[str, float],
    total: int | None = None,
) -> dict[str, float]:
    """Per-category keep rates realizing ``target_props`` over a corpus
    with ``category_counts`` rows per category.

    ``total=None`` solves for the LARGEST feasible sample preserving the
    exact proportions: the binding category is the one that runs out
    first (``min over c of count_c / prop_c``), everything else
    down-samples to match — the standard mixture-assembly waterline. An
    explicit ``total`` must be feasible; an infeasible ask RAISES naming
    the binding category and the maximum feasible total instead of
    silently delivering a skewed mixture (the engine's loud-failure
    rule: a training recipe that quietly shifted its proportions is the
    worst kind of wrong). Proportions must be positive and are
    normalized to sum 1; categories absent from ``target_props`` get
    rate 0.0 — exclusion is explicit in the returned dict."""
    if not target_props:
        raise ValueError("target_props is empty — nothing to mix")
    if total is not None and total <= 0:
        raise ValueError(
            f"total={total} — a mixture needs a positive sample size (a "
            "mis-computed total must fail loudly, not deliver an empty "
            "training corpus)"
        )
    if any(p < 0 for p in target_props.values()) or sum(target_props.values()) <= 0:
        raise ValueError(f"target proportions must be positive: {target_props}")
    norm = sum(target_props.values())
    props = {c: p / norm for c, p in target_props.items()}
    missing = [c for c, p in props.items() if p > 0 and not category_counts.get(c)]
    if missing:
        raise ValueError(
            f"categories {missing} have target proportion > 0 but no corpus "
            "rows — the mixture is unrealizable"
        )
    feasible = min(category_counts[c] / p for c, p in props.items() if p > 0)
    if total is None:
        total = feasible
    elif total > feasible + 1e-9:
        binding = min(
            (c for c, p in props.items() if p > 0),
            key=lambda c: category_counts[c] / props[c],
        )
        raise ValueError(
            f"total={total} is infeasible: category {binding!r} has "
            f"{category_counts[binding]} rows but needs "
            f"{props[binding] * total:.0f}; max feasible total preserving "
            f"these proportions is {int(feasible)}"
        )
    # NULL categories (None key — real language-ID output has them) can
    # never be targeted: exclude them here so the returned rates dict is
    # persistable/sortable and the SQL mirror never sees a None key; the
    # sampler drops NULL-category rows regardless (their threshold
    # lookup is NULL → 0).
    rates = {c: 0.0 for c in category_counts if c is not None}
    for c, p in props.items():
        if p > 0:
            rates[c] = min(1.0, (p * total) / category_counts[c])
    return rates


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    category_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Rows whose salted 32-bit draw falls under their category's
    threshold: ``h32(id || ':' || salt) < rate_c × 2^32``. Original
    schema; deterministic; one codegen'd scan, zero shuffle. Nested
    property (useful for curriculum subsets): for the same salt, the
    sample at a lower rate is a SUBSET of the sample at a higher rate."""
    thresholds = {
        c: int(round(r * H32_SPACE)) for c, r in rates.items() if c is not None
    }
    mapping = F.create_map(
        *[F.lit(x) for cv in thresholds.items() for x in cv]
    )
    u = h32_col(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    return docs.where(u < F.coalesce(mapping[F.col(category_col)], F.lit(0)))


def _sql_str(s: str) -> str:
    """Render a Python string as a SQL string literal, doubling embedded
    single quotes — a category value like ``don't`` or a quoted salt must
    produce valid (and non-injectable) oracle SQL, or the DuckDB mirror
    silently desynchronizes from the Spark draw."""
    return "'" + s.replace("'", "''") + "'"


def mixture_where_sql(
    rates: dict[str, float],
    category_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> str:
    """DuckDB mirror of ``sample_mixture``'s predicate (the oracle side
    of the ONE h32 formula) — AND it into a SELECT over the same table
    to reproduce the exact drawn set. Category values and the salt are
    quote-escaped so the mirror stays byte-equivalent to the Spark side
    for any string content."""
    u = sql_h32(f"(CAST({id_col} AS VARCHAR) || {_sql_str(':' + salt)})")
    cases = " ".join(
        f"WHEN {_sql_str(c)} THEN ({u}) < {int(round(r * H32_SPACE))}"
        for c, r in sorted(rates.items())
        if c is not None  # NULL categories never match a CASE arm anyway
    )
    return f"(CASE {category_col} {cases} ELSE FALSE END)"


def assemble_mixture(
    docs: DataFrame,
    target_props: dict[str, float],
    total: int | None = None,
    category_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> tuple[DataFrame, dict[str, float]]:
    """Count → solve → draw, in one call: returns ``(sampled_df,
    rates)`` so the realized recipe is auditable (persist the rates
    beside the corpus manifest and the mixture is reconstructible
    forever). The category histogram is the one aggregation; its
    driver-side size is guarded by ``MAX_CATEGORIES``."""
    counts_df = docs.groupBy(category_col).count().limit(MAX_CATEGORIES + 1)
    rows = counts_df.collect()
    if len(rows) > MAX_CATEGORIES:
        raise ValueError(
            f"{category_col!r} has more than {MAX_CATEGORIES} distinct "
            "values — not a category column; mixing on it would collect "
            "an unbounded histogram"
        )
    counts = {r[category_col]: int(r["count"]) for r in rows}
    rates = mixture_rates(counts, target_props, total=total)
    return sample_mixture(docs, rates, category_col, id_col, salt), rates
