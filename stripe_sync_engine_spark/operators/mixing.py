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

Two weighted draws (mixtures are specified in tokens, not documents):
the EXPECTATION draw (``assemble_mixture(weight_col=...)`` — same
per-doc threshold, token share realized in expectation with variance
rho(1-rho)*sum(w^2)) and the LENGTH-STRATIFIED draw
(``assemble_stratified_mixture`` — per-(category, weight-stratum)
thresholds from each stratum's weighted hash-CDF with residual carry;
deterministic realized-share bound even on heavy-tailed corpora).
Both recipes ride the export manifest (``mixture_record`` /
``stratified_record``) and verify through one dispatch point
(``member_col_from_record``).

Reference analog: none (training-data-pipeline extension).
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stripe_sync_engine_spark.operators.export import h32_col, sql_h32

#: the draw space of the 32-bit hash: thresholds are rate × H32_SPACE
H32_SPACE = 1 << 32

#: bounded-collect guard for the rates solver's category histogram
MAX_CATEGORIES = 10_000

#: hash-bins per (category, weight-stratum) in the stratified weighted
#: draw's CDF histogram — finer bins tighten the lightest stratum's
#: residual (~W_stratum/STRATUM_BINS) at the cost of driver rows
STRATUM_BINS = 256

#: bounded-collect guard for the stratified solver: its histogram is
#: |targeted categories| × ≤64 strata × STRATUM_BINS driver rows
MAX_TARGET_CATEGORIES = 32

#: the sampled fold audit escalates an audit margin to an EXACT recount
#: when single rows dominate it — when the margin's per-row weight scale
#: w is at least this fraction of the slice's scaled estimate, the
#: claim and any sample differ by whole-row atoms no concentration
#: bound separates (the blind spot VERDICT r14 named), so the audit
#: recounts just that margin from the unsampled buckets instead of
#: passing it silently
ATOM_ESCALATION_FRACTION = 0.125

#: more atom-shaped margins than this and the corpus histogram is
#: dominated by shapes sampling has no power over — the audit degrades
#: honestly to the exact scan instead of building an unbounded filter
ATOM_ESCALATION_CAP = 64


def _stratum_col(weight_col: str):
    """Weight-stratum index: ``floor(log2(max(w, 1)))`` — docs within a
    stratum differ ≤2× in weight. Exact cross-engine: log2 is exact at
    powers of two and irrational (ulp-safe under floor) elsewhere.
    Mirrored by :func:`_stratum_sql`."""
    return F.floor(F.log2(F.greatest(F.col(weight_col), F.lit(1)))).cast("int")


def _stratum_sql(weight_col: str) -> str:
    return f"CAST(floor(log2(greatest({weight_col}, 1))) AS INT)"


def _require_integral_weight(df: DataFrame, weight_col: str) -> None:
    """Weight columns must be integral (token counts ARE integers).

    The maintained counter folds per-window deltas with ``int()`` — a
    fractional weight column would truncate PER WINDOW and silently
    drift from the scan-path histogram (which truncates only the final
    total), and tiny fractional negatives could trip the negative-count
    check spuriously. Reject up front, everywhere a weight enters, so
    both paths stay byte-identical; scale fractional weights to a fixed-
    point integer column instead."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dt = df.schema[weight_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"weight_col {weight_col!r} has type {dt.simpleString()} — "
            "weights must be integral (the incremental counter folds "
            "integer deltas per window; a fractional column would drift "
            "from the scan path). Scale to a fixed-point integer column."
        )


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


def mixture_member_col(
    rates: dict[str, float],
    category_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
):
    """The membership predicate COLUMN of a drawn mixture —
    ``h32(id || ':' || salt) < rate_c × 2^32`` — shared by the sampler
    and the export verifier so "in the mixture" has exactly one
    definition."""
    thresholds = {
        c: int(round(r * H32_SPACE)) for c, r in rates.items() if c is not None
    }
    mapping = F.create_map(
        *[F.lit(x) for cv in thresholds.items() for x in cv]
    )
    u = h32_col(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    return u < F.coalesce(mapping[F.col(category_col)], F.lit(0))


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
    return docs.where(mixture_member_col(rates, category_col, id_col, salt))


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


def stratified_weighted_rates(
    docs: DataFrame,
    target_props: dict[str, float],
    category_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    weight_col: str = "n_tokens",
    total: int | None = None,
    n_bins: int = STRATUM_BINS,
    cdf: dict | None = None,
) -> dict[str, dict[int, float]]:
    """The length-stratified weighted draw's solver — the TIGHT-BOUND
    alternative to the expectation-only weighted solve. ``cdf``: a
    precomputed ``{(category, stratum, hash_bin): weight}`` histogram
    (``StratifiedCDF.poll()`` — the change-feed-maintained form) makes
    the solve O(1) with ZERO corpus scans; prefer ``StratifiedCDF.
    solve()``, which supplies salt and n_bins from its own pinned state
    so they cannot mismatch.

    Why: ``mixture_rates`` over SUM(weight) realizes the token share only
    in expectation, with per-category variance rho(1-rho)*sum(w_i^2) — on a
    heavy-tailed corpus a few huge docs dominate sum(w^2) and the realized
    share swings by one huge doc per coin flip. A SINGLE hash threshold
    can't fix that either: cumulative-weight-vs-threshold is monotone, so
    one huge doc early in hash order blocks every doc behind it
    (measured: 19/20ths of the target lost on the pinned fixture).

    The fix is stratification by doc weight: stratum = floor(log2(w)),
    so docs within a stratum differ at most 2x in weight. Each targeted
    category's target weight is allocated across its strata pro rata
    (uniform weight-rate rho_c per stratum — composition stays unbiased),
    and each stratum gets its OWN threshold solved from that stratum's
    weighted hash-CDF (closest bin boundary), processing strata from
    HEAVIEST to LIGHTEST and carrying each stratum's rounding residual
    into the next: the fine-grained light strata absorb the heavy
    strata's atomicity error.

    DETERMINISTIC GUARANTEE (no RNG anywhere): |realized_c − rho_c*W_c|
    ≤ HALF THE HEAVIEST (category, stratum, hash-bin) CELL'S weight —
    provable by induction on the residual (a picking stratum leaves
    |residual| ≤ half its largest bin by the closest-boundary rule; a
    clamping stratum can only shrink the carried residual's magnitude),
    hypothesis-swept in tests/test_mixing.py. In the adversarial worst
    case (every doc of a stratum in one bin) that is half the stratum's
    weight — whole-doc sampling cannot beat doc atomicity — and ≈ one
    hash-bin of the LIGHTEST stratum (~W_light/n_bins) whenever the
    light strata carry enough mass to absorb the heavy strata's
    rounding, the typical corpus shape. Pinned by tests/test_mixing.py's
    heavy-tailed fixture, where the residual carry recovers the target
    exactly while the expectation draw is off by a fifth of it.

    NO CURRICULUM-SUBSET PROPERTY — unlike the flat draw. The flat
    draw's single per-category threshold is monotone in the rate, so a
    lower-total draw under the same salt is a subset of a higher-total
    one. Here the residual carry makes per-stratum thresholds
    NON-MONOTONE in ``total``: raising the total can clamp a heavy
    stratum to 1.0 and push a LOWER threshold into a lighter stratum
    (measured: ~18% of random recipes; pinned counterexample in
    tests/test_mixing.py). Curriculum schedules that need nested draws
    must use the flat expectation draw or freeze one stratified recipe
    per curriculum stage.

    Plan shape: ONE map-side-combined aggregation over the targeted
    categories only — ``groupBy(category, stratum, hash_bin)`` — whose
    driver-side size is bounded by |recipe| × 64 strata × n_bins
    (recipe-sized, never corpus-sized; ``MAX_TARGET_CATEGORIES`` guards
    the bounded-collect rule). The draw itself stays a single codegen'd
    row-local predicate (``stratified_member_col``), zero shuffle, and
    any row's membership is re-derivable forever from the returned
    thresholds + salt. Weights must be integral (enforced) and
    non-negative (zero-weight docs land in stratum 0).

    ``total`` is a weight total; None solves the feasibility waterline
    ``min(W_c/p_c)`` exactly as the expectation path does. Returns
    ``{category: {stratum: rate}}`` with each rate an exact float64
    ``t/2^32`` (t a 32-bit integer)."""
    if not target_props:
        raise ValueError("target_props is empty — nothing to mix")
    if any(p < 0 for p in target_props.values()) or sum(target_props.values()) <= 0:
        raise ValueError(f"target proportions must be positive: {target_props}")
    norm = sum(target_props.values())
    props = {c: p / norm for c, p in target_props.items() if p / norm > 0}
    targeted = sorted(props)
    if len(targeted) > MAX_TARGET_CATEGORIES:
        raise ValueError(
            f"{len(targeted)} targeted categories exceeds "
            f"{MAX_TARGET_CATEGORIES} — the stratified solver collects a "
            "per-(category, stratum, hash-bin) histogram; an unbounded "
            "recipe would collect unbounded driver state"
        )
    bin_w = H32_SPACE // n_bins
    # hist[cat][band][bin] -> weight
    hist: dict[str, dict[int, dict[int, int]]] = {c: {} for c in targeted}
    if cdf is not None:
        # the maintained path (StratifiedCDF.poll()): ZERO corpus scans —
        # the caller owns the contract that the cdf was maintained under
        # the SAME salt/weight_col/n_bins (StratifiedCDF pins all three
        # in its state and exposes solve(), which cannot mismatch)
        for (c, band, hb), w in cdf.items():
            if c in hist:
                hist[c].setdefault(int(band), {})[int(hb)] = int(w)
    else:
        _require_integral_weight(docs, weight_col)
        u = h32_col(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
        rows = (
            docs.where(F.col(category_col).isin(targeted))
            .groupBy(
                F.col(category_col).alias("_cat"),
                _stratum_col(weight_col).alias("_band"),
                F.floor(u / bin_w).cast("long").alias("_bin"),
            )
            .agg(F.sum(F.col(weight_col)).alias("_w"))
            .collect()
        )
        for r in rows:
            hist[str(r["_cat"])].setdefault(int(r["_band"]), {})[int(r["_bin"])] = int(r["_w"])
    totals = {
        c: sum(w for bins in bands.values() for w in bins.values())
        for c, bands in hist.items()
    }
    missing = [c for c in targeted if totals.get(c, 0) <= 0]
    if missing:
        raise ValueError(
            f"categories {missing} have target proportion > 0 but no corpus "
            "weight — the mixture is unrealizable"
        )
    feasible = min(totals[c] / props[c] for c in targeted)
    if total is None:
        total = feasible
    elif total > feasible + 1e-9:
        binding = min(targeted, key=lambda c: totals[c] / props[c])
        raise ValueError(
            f"total={total} is infeasible: category {binding!r} has weight "
            f"{totals[binding]} but needs {props[binding] * total:.0f}; max "
            f"feasible total preserving these proportions is {int(feasible)}"
        )
    strata: dict[str, dict[int, float]] = {}
    for c in targeted:
        rho = (props[c] * total) / totals[c]
        band_w = {
            b: sum(bins.values()) for b, bins in hist[c].items()
        }
        residual = 0.0
        rates_c: dict[int, float] = {}
        # heaviest stratum first: its atomicity error flows DOWN into
        # ever finer strata, which can absorb it
        for b in sorted(band_w, reverse=True):
            if band_w[b] <= 0:
                # an all-zero-weight stratum (0-token docs land in
                # stratum 0 with weight 0): drawing it cannot move the
                # realized token share, but the rate-1.0 clamp below
                # would unconditionally sweep EVERY such doc into the
                # mixture (clamped >= 0 - 1e-9 is always true) and
                # surprise doc-count audits — draw nothing instead; the
                # residual passes through unchanged either way.
                rates_c[b] = 0.0
                continue
            tgt = rho * band_w[b] + residual
            clamped = min(max(tgt, 0.0), float(band_w[b]))
            if clamped >= band_w[b] - 1e-9:
                rates_c[b] = 1.0
                residual = tgt - band_w[b]
                continue
            cum = 0
            best_t, best_cum, best_err = 0, 0, abs(clamped)
            for hb in sorted(hist[c][b]):
                cum += hist[c][b][hb]
                err = abs(cum - clamped)
                if err < best_err:
                    best_err, best_t, best_cum = err, (hb + 1) * bin_w, cum
                if cum >= clamped:
                    break  # monotone past the target: no better prefix ahead
            rates_c[b] = best_t / H32_SPACE
            residual = tgt - best_cum
        strata[c] = rates_c
    return strata


def stratified_member_col(
    strata: dict[str, dict[int, float]],
    category_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    salt: str = "",
):
    """Membership predicate COLUMN of a stratified draw: the row's
    (category, weight-stratum) selects its threshold and the salted h32
    draw compares against it — one codegen'd row-local expression, zero
    shuffle, NULL categories and un-recipe'd strata draw nothing."""
    thresholds = {
        f"{c}|{b}": int(round(r * H32_SPACE))
        for c, bands in strata.items()
        if c is not None
        for b, r in bands.items()
    }
    mapping = F.create_map(*[F.lit(x) for kv in thresholds.items() for x in kv])
    key = F.concat(
        F.col(category_col), F.lit("|"), _stratum_col(weight_col).cast("string")
    )
    u = h32_col(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    return u < F.coalesce(mapping[key], F.lit(0))


def sample_stratified_mixture(
    docs: DataFrame,
    strata: dict[str, dict[int, float]],
    category_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    salt: str = "",
) -> DataFrame:
    """Apply a stratified draw (see ``stratified_weighted_rates``):
    original schema, deterministic, one codegen'd scan, zero shuffle."""
    return docs.where(
        stratified_member_col(strata, category_col, id_col, weight_col, salt)
    )


def stratified_where_sql(
    strata: dict[str, dict[int, float]],
    category_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    salt: str = "",
) -> str:
    """DuckDB mirror of ``stratified_member_col`` (same ONE h32 formula,
    same stratum formula) — AND it into a SELECT over the same table to
    reproduce the exact drawn set."""
    u = sql_h32(f"(CAST({id_col} AS VARCHAR) || {_sql_str(':' + salt)})")
    band = _stratum_sql(weight_col)
    cat_cases = []
    for c, bands in sorted(strata.items()):
        if c is None:
            continue
        band_cases = " ".join(
            f"WHEN {b} THEN ({u}) < {int(round(r * H32_SPACE))}"
            for b, r in sorted(bands.items())
        )
        cat_cases.append(
            f"WHEN {_sql_str(c)} THEN (CASE {band} {band_cases} ELSE FALSE END)"
        )
    return f"(CASE {category_col} {' '.join(cat_cases)} ELSE FALSE END)"


def assemble_stratified_mixture(
    docs: DataFrame,
    target_props: dict[str, float],
    total: int | None = None,
    category_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    weight_col: str = "n_tokens",
) -> tuple[DataFrame, dict[str, dict[int, float]]]:
    """Solve → draw for the length-stratified weighted mixture: returns
    ``(sampled_df, strata)`` where ``strata`` is the per-(category,
    stratum) threshold recipe (persist it beside the corpus manifest and
    the mixture is reconstructible forever, exactly like the flat
    ``rates`` record). Use instead of ``assemble_mixture(weight_col=...)``
    when the corpus is heavy-tailed and the realized token share must be
    deterministically close to target — see
    ``stratified_weighted_rates`` for the bound."""
    strata = stratified_weighted_rates(
        docs, target_props, category_col, id_col, salt, weight_col,
        total=total,
    )
    return (
        sample_stratified_mixture(
            docs, strata, category_col, id_col, weight_col, salt
        ),
        strata,
    )


def assemble_mixture(
    docs: DataFrame,
    target_props: dict[str, float],
    total: int | None = None,
    category_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    counts: dict | None = None,
    weight_col: str | None = None,
) -> tuple[DataFrame, dict[str, float]]:
    """Count → solve → draw, in one call: returns ``(sampled_df,
    rates)`` so the realized recipe is auditable (persist the rates
    beside the corpus manifest and the mixture is reconstructible
    forever). The category histogram is the one aggregation; its
    driver-side size is guarded by ``MAX_CATEGORIES``.

    ``counts``: a precomputed per-category histogram of ``docs`` —
    pass ``CategoryCounts.poll()`` (the change-feed-maintained exact
    counts) and the solve is O(1) with ZERO corpus scans, the
    steady-state path for recipes re-solved per epoch over a mutating
    corpus. The caller owns the contract that the counts describe
    ``docs``' current state (the maintained counter's poll does).

    ``weight_col``: solve the proportions over a per-row WEIGHT (e.g.
    ``n_tokens``) instead of row counts — training mixtures are
    specified in tokens, not documents. The histogram becomes
    ``SUM(weight)`` per category, ``total`` (when given) is a weight
    total, and the returned rates realize the target proportions in
    EXPECTATION over the weight (the draw stays the same per-doc salted
    hash threshold — document membership stays deterministic and
    reproducible). The expectation guarantee carries VARIANCE
    ρ(1-ρ)·Σw² per category: fine when no document dominates (relative
    SD ~ 1/√n_eff), but with heavy-tailed doc lengths a category whose
    tokens concentrate in a few huge docs can realize a token share far
    from target — tests/test_mixing.py pins both regimes. For a
    deterministic bound use :func:`assemble_stratified_mixture` (the
    length-stratified draw: per-(category, weight-stratum) thresholds
    with residual carry — one extra recipe-bounded aggregation).
    ``CategoryCounts`` takes the same ``weight_col`` for the maintained
    path (expectation draw only — the histogram carries no hash
    distribution, which the stratified solve needs)."""
    if counts is None:
        if weight_col is not None:
            _require_integral_weight(docs, weight_col)
        agg = (
            F.count(F.lit(1)) if weight_col is None else F.sum(F.col(weight_col))
        ).alias("count")
        counts_df = docs.groupBy(category_col).agg(agg).limit(MAX_CATEGORIES + 1)
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


def mixture_record(
    rates: dict[str, float],
    salt: str,
    category_col: str = "lang",
    id_col: str = "doc_id",
) -> dict:
    """The JSON-able recipe record an export manifest carries
    (``export_corpus_shards(..., mixture=...)``): everything needed to
    re-derive any row's membership FOREVER — rates, salt, and the two
    column names. Takes "persist the rates beside the corpus manifest"
    from advice to mechanism; ``verify_mixture`` consumes it."""
    return {
        "rates": {str(c): float(r) for c, r in rates.items() if c is not None},
        "salt": str(salt),
        "category_col": category_col,
        "id_col": id_col,
    }


def stratified_record(
    strata: dict[str, dict[int, float]],
    salt: str,
    category_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
) -> dict:
    """``mixture_record``'s counterpart for the length-stratified draw:
    per-(category, stratum) thresholds plus the weight column the
    stratum formula reads — everything ``verify_mixture`` needs to
    re-derive any exported row's membership forever (stratum keys are
    stringified for JSON; ``member_col_from_record`` restores them)."""
    return {
        "kind": "stratified",
        "strata": {
            str(c): {str(b): float(r) for b, r in bands.items()}
            for c, bands in strata.items()
            if c is not None
        },
        "salt": str(salt),
        "category_col": category_col,
        "id_col": id_col,
        "weight_col": weight_col,
    }


def member_col_from_record(rec: dict):
    """Membership predicate COLUMN from a persisted recipe record — ONE
    dispatch point shared by ``verify_mixture`` and any auditor reading
    an export manifest, so both recipe kinds re-derive membership
    through the same code that drew them (flat ``rates`` records carry
    no ``kind`` for backward compatibility with pre-r12 manifests)."""
    if rec.get("kind") == "stratified":
        strata = {
            c: {int(b): float(r) for b, r in bands.items()}
            for c, bands in rec["strata"].items()
        }
        return stratified_member_col(
            strata,
            rec["category_col"],
            rec["id_col"],
            rec["weight_col"],
            rec["salt"],
        )
    return mixture_member_col(
        rec["rates"], rec["category_col"], rec["id_col"], rec["salt"]
    )


#: bounded-collect cap for verify_mixture's violation/missing id lists
VERIFY_REPORT_LIMIT = 20


def verify_mixture(spark, out_dir: str, source: DataFrame | None = None) -> dict:
    """Re-derive mixture membership for every exported row from the
    manifest ALONE and fail on any row that should not be in the drawn
    set (wrong-draw rows, zero-rate or un-recipe'd categories). With
    ``source`` (the corpus the mixture was drawn from), additionally
    checks COMPLETENESS: every row the recipe draws from the source must
    be present in the export.

    ONE column-pruned scan of the export: the (id, member) projection is
    cached, and the totals aggregate, the bounded violation-id collect,
    and the completeness anti-join all reuse it (plus one source scan
    when given); all codegen'd JVM expressions. Violation/missing id
    lists are bounded (``VERIFY_REPORT_LIMIT``) — the engine's
    bounded-collect rule. Returns ``{"ok", "violations",
    "violation_ids", "missing", "missing_ids", "total_docs"}``."""
    import os

    from stripe_sync_engine_spark.operators.export import read_manifest

    manifest = read_manifest(out_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    mix = manifest.get("mixture")
    if mix is None:
        raise ValueError(
            f"manifest under {out_dir} records no mixture — export with "
            "mixture=mixture_record(rates, salt, ...) to make the drawn "
            "set verifiable"
        )
    idc = mix["id_col"]
    member = member_col_from_record(mix)

    def _check_recipe_cols(df: DataFrame, which: str) -> None:
        # a stratified recipe re-derives membership from category AND
        # weight; an export (or source) whose projection dropped one of
        # them must fail with the reason, not an unresolved-column error
        need = [mix["category_col"], idc]
        if mix.get("kind") == "stratified":
            need.append(mix["weight_col"])
        absent = [c for c in need if c not in df.columns]
        if absent:
            raise ValueError(
                f"{which} is missing column(s) {absent} that the "
                f"manifest's {mix.get('kind', 'rates')} recipe needs to "
                "re-derive membership — the mixture was exported with a "
                "projection that cannot be verified; keep the recipe's "
                "category/id/weight columns in the export"
            )

    data_dir = os.path.join(out_dir, "data")
    probe = None
    try:
        if os.path.isdir(data_dir):
            exported = spark.read.parquet(data_dir)
            _check_recipe_cols(exported, f"export under {out_dir}")
            probe = (
                exported
                .select(F.col(idc), member.alias("_member"))
                .persist()
            )
            agg = probe.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(~F.col("_member"), F.lit(1))).alias("bad"),
            ).first()
            total, n_bad = int(agg["n"]), int(agg["bad"])
            bad_ids = (
                sorted(
                    r[idc]
                    for r in probe.where(~F.col("_member"))
                    .select(idc)
                    .limit(VERIFY_REPORT_LIMIT)
                    .collect()
                )
                if n_bad
                else []
            )
        else:
            n_bad, bad_ids, total = 0, [], 0

        n_missing, missing_ids = 0, []
        if source is not None:
            _check_recipe_cols(source, "source")
            drawn = source.where(member_col_from_record(mix)).select(idc)
            have = probe.select(idc) if probe is not None else drawn.limit(0)
            missing = drawn.join(have, idc, "left_anti").localCheckpoint(eager=True)
            n_missing = missing.count()
            if n_missing:
                missing_ids = sorted(
                    r[idc] for r in missing.limit(VERIFY_REPORT_LIMIT).collect()
                )
    finally:
        if probe is not None:
            probe.unpersist()

    return {
        "ok": n_bad == 0 and n_missing == 0,
        "violations": n_bad,
        "violation_ids": bad_ids,
        "missing": n_missing,
        "missing_ids": missing_ids,
        "total_docs": total,
    }


class _MaintainedFold(abc.ABC):
    """Shared machinery for change-feed-maintained driver-side
    histograms (``CategoryCounts``, ``StratifiedCDF``): one durable
    consumer with a two-phase pinned window, one atomic counts+cursor
    side-file commit BEFORE the ack, loud negative-count divergence,
    the wiped-cursor guard, and ``rebase()`` as the universal remedy.

    Crash-exactness is the pinned window's: a crash after the state
    write but before the ack re-delivers the IDENTICAL window
    (identical ``until``), the state's ``applied_until`` matches, and
    the apply is skipped — counts are never double-applied. A crash
    before the state write simply re-applies. Negative counts fail
    loudly: they mean the feed and the state diverged (an unmaintained
    rewind, a wiped cursor), and the remedy is ``rebase()``.

    Retention contract: like every feed consumer, the store's
    ``vacuum_retain_s`` must exceed the maximal poll lag — and a
    REBUCKET of the entity inside the consumer's lag window makes the
    feed raise (bucket ids incomparable across widths); the recovery
    here is ``rebase()``, which recounts and realigns in one O(table)
    pass — the same cost the feed's full-diff escape hatch would pay.

    Subclasses define the GROUPING: ``_group_cols()`` (aliased
    ``_g0.._gN``), ``_key_of(raw_tuple)`` / ``_decode_key(stored)`` /
    ``_sort_key(key)``, the entry cap ``_max_entries`` + ``_guard``
    (the error-message subject), and ``_state_meta()`` — extra pinned
    parameters (a CDF's salt/n_bins) written into the state file and
    VALIDATED on read, so state maintained under different parameters
    fails loudly instead of folding garbage."""

    # subclass contract (abstract — an incomplete subclass fails at
    # instantiation, not at first poll)
    _max_entries: int = MAX_CATEGORIES

    @abc.abstractmethod
    def _group_cols(self) -> list:
        """Aliased grouping columns ``_g0.._gN`` for window deltas and
        rebase recounts."""

    @abc.abstractmethod
    def _key_of(self, raw: tuple):
        """Normalize a raw grouped-row tuple into the histogram key."""

    @abc.abstractmethod
    def _decode_key(self, stored):
        """Rebuild the key from its JSON-stored form."""

    @abc.abstractmethod
    def _sort_key(self, key):
        """Stable ordering for the persisted counts list."""

    @abc.abstractmethod
    def _guard(self) -> str:
        """The error-message subject for the entry-cap guards."""

    def _state_meta(self) -> dict:
        return {}

    # shared machinery
    def _weight(self):
        return F.lit(1) if self.weight_col is None else F.col(self.weight_col)

    def _read_state(self) -> dict:
        import json

        try:
            with open(self._state_path()) as f:
                state = json.load(f)
        except FileNotFoundError:
            return {"applied_until": 0, "counts": [], **self._state_meta()}
        for k, v in self._state_meta().items():
            if state.get(k) != v:
                raise RuntimeError(
                    f"maintained state at {self._state_path()} was built "
                    f"with {k}={state.get(k)!r} but this instance uses "
                    f"{v!r} — folding on top would corrupt the histogram; "
                    "construct with the recorded parameters or rebase() a "
                    "fresh instance"
                )
        return state

    def counts(self) -> dict:
        """The current maintained histogram (key → integer weight).
        Reads only the side file — call ``poll()`` first to fold in new
        commits."""
        return {
            self._decode_key(k): int(v)
            for k, v in self._read_state()["counts"]
        }

    def cursor(self) -> int:
        """The commit-ms the maintained counts are current to (0 =
        never loaded). Reads only the side file — the public peek the
        streaming fan-out's start guard and operator tooling use."""
        return int(self._read_state()["applied_until"])

    def identity(self) -> dict:
        """The fold's public identity for operator tooling — the
        audit → repair handshake key: ``{"state": <state-file path>,
        "guard": <error-message subject>}``. The state path is the
        cross-process identity (the guard parameters — salt, n_bins,
        weight column — ride the path/state meta), so a repair run can
        match a failing audit row back to a fold object without
        reaching into private attributes."""
        return {"state": self._state_path(), "guard": self._guard()}

    def _write_state(self, cursor: int, counts: dict) -> None:
        from stripe_sync_engine_spark.commitio import atomic_write_json

        atomic_write_json(
            self._state_path(),
            {
                "applied_until": int(cursor),
                **self._state_meta(),
                "counts": sorted(
                    counts.items(), key=lambda kv: self._sort_key(kv[0])
                ),
            },
        )

    def _grouped_rows(self, df, value_col, with_rows: bool = False) -> list:
        cols = self._group_cols()
        aggs = [value_col.alias("_v")]
        if with_rows:
            aggs.append(F.count(F.lit(1)).alias("_n"))
        rows = (
            df.groupBy(*cols)
            .agg(*aggs)
            .limit(self._max_entries + 1)
            .collect()
        )
        if len(rows) > self._max_entries:
            raise ValueError(
                f"{self._guard()} produced more than {self._max_entries} "
                "distinct entries — not a bounded grouping; maintaining "
                "it would grow unbounded driver state"
            )
        names = [f"_g{i}" for i in range(len(cols))]
        if with_rows:
            return [
                (
                    self._key_of(tuple(r[n] for n in names)),
                    int(r["_v"]),
                    int(r["_n"]),
                )
                for r in rows
            ]
        return [
            (self._key_of(tuple(r[n] for n in names)), int(r["_v"]))
            for r in rows
        ]

    def poll(self) -> dict:
        """Fold one change window into the counts and return the
        refreshed histogram. Cheap when idle (no new commits: one
        no-op feed plan). Call it wherever the corpus's other feed
        consumers poll (the maintenance cron)."""
        state = self._read_state()
        applied0 = int(state["applied_until"])
        since0 = int(self.engine._read_cursors(self.consumer).get(self.entity, 0))
        if applied0 != since0:
            # Divergence guards, checked BEFORE the consume so a refusal
            # has no side effects at all — no new pinned window, and
            # crucially no ACK: even over an EMPTY window, acking would
            # silently adopt a foreign cursor (e.g. re-arm dual-surface
            # delivery on a fan-out-advanced fold — the inconsistency
            # ADVICE r14 flagged). The ONE legitimate state≠cursor shape
            # is the crash retry of a poll (or the initial load) that
            # committed state but died before its ack, identified by its
            # PINNED window matching the state's applied_until; the
            # retry below re-delivers that identical window, the
            # applied_until match skips the fold, and the ack completes.
            pin0 = int(self.engine._read_pending(self.consumer).get(self.entity, 0))
            if pin0 != applied0:
                if since0 == 0:
                    # counts exist but the consumer's cursor is gone: the
                    # next window would be the WHOLE table as inserts
                    # re-applied on top of non-empty counts — every delta
                    # positive, the negative-count check blind, every
                    # entry silently ~doubled. (A fan-out-delivered fold —
                    # state ahead of a never-advanced own cursor — lands
                    # here too: same loud stop, remedy named below.)
                    raise RuntimeError(
                        f"counts state for {self.entity!r}/{self._guard()} "
                        f"is at commit {applied0} but consumer "
                        f"{self.consumer!r} has no cursor — either the cursor "
                        "was wiped (the re-delivered initial load would double "
                        "every count; rebase() to recount and realign) or this "
                        "fold is fan-out-delivered (maintain_corpus_indexes("
                        "mixture_folds=...)) and must NOT also poll(): keep "
                        "delivery on exactly one surface"
                    )
                if applied0 == 0:
                    # the mirror image: a live cursor over EMPTY state —
                    # the state file was wiped out-of-band; folding new
                    # windows on top would produce a partial histogram
                    # that no later guard can tell from a real one
                    raise RuntimeError(
                        f"consumer {self.consumer!r} for {self.entity!r}/"
                        f"{self._guard()} is at commit {since0} but the "
                        "maintained counts state is empty — the state file "
                        "was wiped out-of-band, and folding new windows "
                        "over empty counts would build a silently partial "
                        "histogram. rebase() to recount and realign"
                    )
                if applied0 > since0:
                    # state AHEAD of the own cursor: this fold was
                    # advanced by fan-out delivery (apply_window), and
                    # polling would re-fold the already-applied
                    # (since0, applied0] range with all-positive deltas —
                    # the doubling the negative-count guard cannot see.
                    # Refused regardless of whether the next window is
                    # empty, straddling, or head-aligned.
                    raise RuntimeError(
                        f"maintained fold for {self.entity!r}/{self._guard()} "
                        f"is at commit {applied0} but its own consumer "
                        f"{self.consumer!r} is at {since0} — the fold was "
                        "advanced by fan-out delivery (maintain_corpus_indexes("
                        "mixture_folds=...)); polling it now would re-fold the "
                        f"({since0}, {applied0}] range and double those counts. "
                        "Deliver through exactly one surface: keep the fan-out, "
                        "or rebase(at_ms=<own cursor>) to return to poll()-only"
                    )
                # state BEHIND a live cursor (a state file restored from
                # backup): the (applied0, since0] range was consumed and
                # acked but its deltas are missing from these counts, and
                # the feed can never re-deliver it under this cursor —
                # the hazard is the MISSED range, not a double-count
                # (ADVICE r14: the two directions need different
                # diagnoses; the remedy is the same).
                raise RuntimeError(
                    f"maintained fold for {self.entity!r}/{self._guard()} "
                    f"is at commit {applied0} but its own consumer "
                    f"{self.consumer!r} is already at {since0} — the state "
                    "is BEHIND its cursor (e.g. a state file restored from "
                    f"backup): the ({applied0}, {since0}] range was "
                    "consumed but never folded into these counts and "
                    "cannot be re-delivered; the histogram is silently "
                    "stale. rebase() to recount and realign"
                )
        feed, cursor = self.engine.consume_changes(
            self.consumer,
            self.entity,
            emit_update_preimages=True,
            pin_window=True,
        )
        if feed is None:
            return self.counts()
        if int(cursor) != applied0:
            self._fold_window(state, feed, int(cursor))
        self.engine.ack_changes(self.consumer, self.entity, int(cursor))
        return self.counts()

    def _fold_window(self, state: dict, feed, until: int) -> None:
        """Fold one change window's net deltas into ``state``'s counts
        and commit counts + cursor in ONE atomic side-file write (no
        ack — the caller owns whichever consumer cursor delivered the
        window). Shared by ``poll()`` (own consumer) and
        ``apply_window()`` (fan-out delivery)."""
        if self.weight_col is not None:
            _require_integral_weight(feed, self.weight_col)
        w = self._weight()
        delta = F.sum(
            F.when(
                F.col("_change_type").isin("insert", "update"), w
            ).otherwise(-w)
        )
        counts = {
            self._decode_key(k): int(v) for k, v in state["counts"]
        }
        for key, d in self._grouped_rows(feed, delta):
            n = counts.get(key, 0) + d
            if n < 0:
                raise RuntimeError(
                    f"entry {key!r} went negative applying "
                    f"window {until} — the feed and the maintained "
                    "state diverged (wiped cursor / unmaintained "
                    "rewind); rebase() to recount"
                )
            if n:
                counts[key] = n
            else:
                counts.pop(key, None)
        if len(counts) > self._max_entries:
            # each window is bounded above, but the ACCUMULATED set
            # could still creep past the cap across many windows —
            # the same unbounded-driver-state failure, caught here
            raise ValueError(
                f"{self._guard()} has accumulated more than "
                f"{self._max_entries} distinct entries — maintaining "
                "it is unbounded driver state"
            )
        # ONE atomic commit of counts + cursor, BEFORE the ack: the
        # pinned window makes the crash-retry byte-identical, and the
        # applied_until match makes the re-apply a skip
        self._write_state(until, counts)

    def apply_window(self, feed, since_ms: int, until_ms: int) -> None:
        """Fold a change window that was consumed by ANOTHER durable
        consumer — the corpus CDC fan-out
        (``engine.maintain_corpus_indexes(mixture_folds=[...])``) — so
        ONE bucket-diff per cycle serves the index targets AND the
        mixing folds, instead of every standing mixture re-diffing the
        same window under its own consumer (N redundant diffs at
        deployment).

        Alignment contract: the fold applies exactly the windows the
        fan-out delivers, in order. A window at or below the fold's
        ``applied_until`` is SKIPPED — the fan-out's crash retry
        re-delivers the identical pinned window, and the skip is what
        makes that replay idempotent (the same applied_until-match rule
        ``poll()`` uses). A window starting PAST the fold's cursor
        raises: the fold missed windows (it joined an already-advanced
        fan-out, or mixed standalone ``poll()`` with fan-out delivery);
        onboard with ``rebase(at_ms=<the fan-out's current cursor>)``
        and hand every subsequent window over. The feed must carry
        update pre-images — the fan-out enforces the flag when folds
        are passed — or an update could not move its weight out of the
        old (category, stratum)."""
        state = self._read_state()
        applied = int(state["applied_until"])
        since, until = int(since_ms), int(until_ms)
        if applied >= until:
            return  # crash replay of an already-folded window
        if applied != since:
            raise RuntimeError(
                f"maintained fold for {self.entity!r}/{self._guard()} "
                f"is at commit {applied} but the fan-out window covers "
                f"({since}, {until}] — the fold missed windows (joined "
                "an already-advanced fan-out, or mixed standalone "
                "poll() with fan-out delivery); rebase(at_ms="
                f"{since}) to realign, then deliver every window"
            )
        self._fold_window(state, feed, until)

    def rebase(self, at_ms: int | None = None) -> dict:
        """Recount from the current table and restart the feed from its
        head — initialization for a table with history the consumer
        never saw, and the drift remedy (the counts analog of
        ``refresh_rollup``). The recount and the cursor baseline are
        planned under the same head commit.

        ``at_ms``: recount AS OF that retained commit instead of the
        head — the onboarding alignment for fan-out delivery (rebase at
        the fan-out consumer's CURRENT cursor, so the next delivered
        window starts exactly where the recount ended; ``at_ms=0``
        means before any commit — empty counts). An aged-out snapshot
        raises loudly, exactly like any time-travel read."""
        if at_ms is not None:
            head = int(at_ms)
        else:
            commits = self.engine.store.commits(self.entity)
            head = commits[-1] if commits else 0
        # pinned AS OF the head the cursor is baselined to: a writer
        # landing between the commits() read and the recount would
        # otherwise be counted now AND re-delivered by the next poll
        table = (
            self.engine.store.read(self.entity, as_of_ms=head) if head else None
        )
        counts: dict = {}
        if table is not None:
            if self.weight_col is not None:
                _require_integral_weight(table, self.weight_col)
            counts = dict(self._grouped_rows(table, F.sum(self._weight())))
        self._write_state(head, counts)
        self.engine.ack_changes(self.consumer, self.entity, int(head))
        return self.counts()

    def verify(
        self,
        sample: int | None = None,
        z: float = 6.0,
        epoch: int | None = None,
    ) -> dict:
        """Read-only drift audit of the maintained histogram — the
        ``audit_corpus_indexes`` analog for fold state: recount the
        table AS OF the fold's own committed cursor and diff against
        the maintained counts, committing NOTHING (the remedy for a
        failing report is ``rebase()``). Recounting at the cursor (not
        the head) makes the check exact even while the fold lags the
        table — windows past the cursor are future work, not drift.
        Catches out-of-band mutations no feed can see: a wiped or
        hand-edited state file, a fractional weight column that slipped
        in before the integral guard, a restored-from-backup table
        under a live cursor.

        ``sample=None`` (the deep option): one map-side-combined
        O(table) scan, exact per key. ``sample=k``: recount only ``k``
        deterministically-chosen snapshot BUCKETS — rows hash into
        buckets uniformly (``pmod(xxhash64(key), n)``), so the slice is
        a ~k/n row sample and the scan reads only k/n of the table; the
        slice recount is scaled by 1/f and compared per AUDIT MARGIN
        (``_audit_margin_key`` — the key itself for count folds, the
        many-row (category, stratum) margin for the CDF's single-row
        cells) under a concentration tolerance
        ``z·sqrt(max(claim, est, w)·w·(1-f)/f) + z·w`` with ``w`` the
        margin's weight scale: the subclass's ``_key_weight_scale``
        when the margin bounds its rows' weights (the stratified CDF's
        stratum does), else the margin's slice mean row weight, else
        the global slice mean; 1 for count folds.
        The sampled audit catches GROSS drift — a doubled or wiped
        large margin — not off-by-a-few or per-cell corruption that
        preserves margins; tighten by raising ``sample`` or run the
        exact form. Margins where SINGLE ROWS dominate (the margin's
        weight scale ≥ ``ATOM_ESCALATION_FRACTION`` of its slice
        estimate — whole-row atoms no concentration bound separates)
        are AUTO-ESCALATED to an exact recount of just those margins
        from the unsampled buckets (one filtered complement scan,
        bounded by ``ATOM_ESCALATION_CAP`` margins; past the cap the
        audit degrades honestly to the exact scan, reported under
        ``"degraded"``), closing the r14 atom blind spot without
        unbounding the audit.

        Bucket choice rotates with the fold's cursor AND an audit
        ``epoch`` (rank by md5(bucket:cursor:epoch)) — default the
        wall-clock UTC day — so repeated audits cover different slices
        EVEN WHEN THE CORPUS IS IDLE (a cursor-only seed re-read the
        same k buckets forever at exactly the moment out-of-band
        mutation is likeliest). The audit is read-only, so replay
        determinism across days is not a contract; pass an explicit
        ``epoch`` to pin the draw (tests, or an operator re-checking
        one slice). ``sample >= n_buckets`` degrades to the exact scan
        (``sample <= 0`` too). Returns ``{"ok", "cursor", "mode",
        "drift": {key: (maintained, actual-or-estimate)}}`` with drift
        capped at 50 entries; the sampled form keys drift by audit
        margin and adds ``"sample": {"buckets", "of", "fraction",
        "epoch", "bucket_ids"}`` plus ``"escalated"``/
        ``"escalated_buckets"`` when the atom escalation ran."""
        state = self._read_state()
        cursor = int(state["applied_until"])
        maintained = {
            self._decode_key(k): int(v) for k, v in state["counts"]
        }
        table, chosen, n_b = None, None, 0
        if epoch is None:
            import time

            epoch = int(time.time() // 86400)
        epoch = int(epoch)
        if cursor:
            if sample is not None and int(sample) > 0:
                # ONE snapshot resolution serves the bucket count, the
                # choice, and the scan; k >= n_buckets comes back as the
                # full scan, which the exact path below reuses
                # (sample <= 0 falls through to the exact scan — the
                # storage primitive rejects 0-bucket samples)
                res = self.engine.store.read_bucket_sample(
                    self.entity,
                    int(sample),
                    seed=f"{cursor}:{epoch}",
                    as_of_ms=cursor,
                )
                if res is not None:
                    table, chosen, n_b = res
            else:
                table = self.engine.store.read(self.entity, as_of_ms=cursor)
        if chosen is not None and len(chosen) < n_b:
            return self._verify_sampled(
                cursor, maintained, table, chosen, n_b, float(z), epoch
            )
        actual: dict = {}
        if table is not None:
            if self.weight_col is not None:
                _require_integral_weight(table, self.weight_col)
            actual = {
                k: v
                for k, v in self._grouped_rows(table, F.sum(self._weight()))
                if v
            }
        drift = {
            key: (maintained.get(key, 0), actual.get(key, 0))
            for key in set(maintained) | set(actual)
            if maintained.get(key, 0) != actual.get(key, 0)
        }
        capped = dict(
            sorted(drift.items(), key=lambda kv: self._sort_key(kv[0]))[:50]
        )
        return {
            "ok": not drift,
            "cursor": cursor,
            "mode": "exact",
            "drift": capped,
        }

    def _key_weight_scale(self, key):
        """Per-key row-weight scale for the sampled audit's tolerance,
        when the AUDIT KEY ITSELF bounds its rows' weights (None =
        derive from the slice). ``StratifiedCDF`` overrides: its audit
        margins carry the log2 weight stratum, so a (category, stratum)
        margin's rows weigh < 2^(stratum+1) — without this, a
        heavy-stratum margin's tolerance would be computed from the
        corpus-wide mean weight and false-flag clean folds (a single
        10^6-token doc is in the slice or not; no mean-weight tolerance
        covers that swing)."""
        return None

    def _audit_margin_key(self, key):
        """Aggregation key for the SAMPLED audit (default: the key
        itself). Folds whose cells hold single rows — the stratified
        CDF's (category, stratum, bin) cells at deployment bin counts —
        have no per-cell statistical power under ANY tolerance (one row
        is in the slice or it isn't); aggregating claims and slice
        recounts to a many-row margin ((category, stratum) for the
        CDF) restores real detection power. Per-cell corruption that
        exactly preserves the margins is sampled-invisible by
        construction; the exact scan (``sample=None``) is the deep
        option that sees it."""
        return key

    @abc.abstractmethod
    def _margin_predicate(self, margins: list):
        """Row predicate selecting exactly the rows of the given audit
        MARGINS (``_audit_margin_key`` values) — the filter behind the
        sampled audit's atom escalation, which recounts only those
        margins from the unsampled buckets. Bounded: callers pass at
        most ``ATOM_ESCALATION_CAP`` margins, so the predicate stays a
        small codegen'd expression."""

    def _verify_sampled(
        self,
        cursor: int,
        maintained: dict,
        table,
        chosen: list,
        n_b: int,
        z: float,
        epoch: int,
    ) -> dict:
        """The k-bucket statistical recount behind ``verify(sample=k)``
        — see its docstring for the tolerance contract. Claims and the
        slice recount are both aggregated to ``_audit_margin_key``
        before comparing; the tolerance's variance base is
        ``max(claim, est, w)`` — the claim side is the H0 variance
        anchor (so a genuinely missed slice doesn't false-flag small
        clean keys), and because the tolerance grows only as
        sqrt(claim·w), an inflated claim still flags once the inflation
        exceeds ~z²·w·(1-f)/f rows' worth.

        ATOM ESCALATION (closing the r14 blind spot): a margin whose
        weight scale ``w`` is ≥ ``ATOM_ESCALATION_FRACTION`` of its
        slice estimate is dominated by single rows — the claim and the
        slice differ by whole-row atoms no concentration bound
        separates, so the tolerance comparison has no power over it.
        Such margins (and any margin the slice missed entirely) are
        recounted EXACTLY instead: one scan of the complement buckets
        filtered to just those margins (``_margin_predicate`` — a
        selective codegen'd predicate the parquet reader pushes down),
        added to the slice's unscaled contribution; any difference from
        the claim is drift, no tolerance. The escalation is bounded by
        ``ATOM_ESCALATION_CAP`` margins — past it the whole audit
        degrades to the exact scan with the reason under
        ``"degraded"`` (an atom-dominated histogram is one sampling
        fundamentally cannot audit)."""
        import math

        f = len(chosen) / n_b
        margins: dict = {}
        for key, v in maintained.items():
            mk = self._audit_margin_key(key)
            margins[mk] = margins.get(mk, 0) + int(v)
        slice_w: dict = {}
        slice_n: dict = {}
        slice_rows = 0
        slice_total = 0
        if table is not None:
            if self.weight_col is not None:
                _require_integral_weight(table, self.weight_col)
            for key, v, n in self._grouped_rows(
                table, F.sum(self._weight()), with_rows=True
            ):
                mk = self._audit_margin_key(key)
                slice_w[mk] = slice_w.get(mk, 0) + int(v)
                slice_n[mk] = slice_n.get(mk, 0) + int(n)
                slice_rows += int(n)
                slice_total += int(v)
        wbar_global = (slice_total / slice_rows) if slice_rows else 1.0
        drift: dict = {}
        escalate: list = []
        for mk in set(margins) | set(slice_w):
            n_claim = margins.get(mk, 0)
            est = slice_w.get(mk, 0) / f
            w = self._key_weight_scale(mk)
            if w is None:
                w = (
                    slice_w[mk] / slice_n[mk]
                    if slice_n.get(mk)
                    else wbar_global
                )
            w = max(float(w), 1.0)
            if w >= ATOM_ESCALATION_FRACTION * max(est, 1.0):
                # single rows dominate this margin (or the slice saw
                # none of it): no tolerance has power here — recount it
                # exactly below instead of comparing statistically
                escalate.append(mk)
                continue
            tol = z * math.sqrt(
                max(n_claim, est, w, 1.0) * w * (1.0 - f) / f
            ) + z * w
            if abs(est - n_claim) > tol:
                drift[mk] = (n_claim, int(round(est)))
        report_extra: dict = {}
        if escalate:
            if len(escalate) > ATOM_ESCALATION_CAP:
                exact = self.verify(sample=None, z=z)
                exact["degraded"] = (
                    f"{len(escalate)} atom-shaped margins exceed "
                    f"ATOM_ESCALATION_CAP={ATOM_ESCALATION_CAP} — the "
                    "histogram is dominated by few-row margins sampling "
                    "cannot audit; ran the exact scan instead"
                )
                return exact
            esc_set = set(escalate)
            comp_w: dict = {}
            complement = sorted(set(range(n_b)) - set(chosen))
            if complement:
                # same as_of_ms → same snapshot manifest as the slice
                # scan (resolution is deterministic), so slice +
                # complement partition the table exactly
                rest = self.engine.store.read(
                    self.entity, as_of_ms=cursor, buckets=complement
                )
                if rest is not None:
                    rest = rest.where(self._margin_predicate(escalate))
                    for key, v in self._grouped_rows(
                        rest, F.sum(self._weight())
                    ):
                        mk = self._audit_margin_key(key)
                        if mk in esc_set:
                            comp_w[mk] = comp_w.get(mk, 0) + int(v)
            for mk in escalate:
                exact_v = slice_w.get(mk, 0) + comp_w.get(mk, 0)
                if exact_v != margins.get(mk, 0):
                    drift[mk] = (margins.get(mk, 0), exact_v)
            report_extra = {
                "escalated": sorted(escalate, key=repr),
                "escalated_buckets": len(complement),
            }
        capped = dict(sorted(drift.items(), key=lambda kv: repr(kv[0]))[:50])
        return {
            "ok": not drift,
            "cursor": cursor,
            "mode": "sampled",
            "sample": {
                "buckets": len(chosen),
                "of": n_b,
                "fraction": f,
                "epoch": epoch,
                "bucket_ids": list(chosen),
            },
            "drift": capped,
            **report_extra,
        }


class CategoryCounts(_MaintainedFold):
    """Exact per-category row counts of a store table, maintained
    incrementally from the change feed — the steady-state histogram
    source for ``mixture_rates``, replacing ``assemble_mixture``'s
    full ``groupBy(category).count()`` scan with an O(changed buckets)
    poll. Each poll aggregates the window's net rows to a per-category
    delta (insert/update post-images +1, delete and update pre-images
    -1 — with pre-images an update moves its count between categories
    exactly); the histogram stays ≤ ``MAX_CATEGORIES`` entries BY THE
    SAME GUARD the scan path enforces. Crash/retention/divergence
    semantics: ``_MaintainedFold``.

    ``weight_col``: maintain ``SUM(weight)`` per category instead of
    row counts (token-weighted mixtures — see
    ``assemble_mixture(weight_col=...)``). Update pre-images carry the
    OLD row's weight, so a weight change moves exactly the delta. A
    weighted counter keeps its own consumer/state (a doc counter and a
    token counter on the same column coexist). Weight columns must be
    INTEGRAL (enforced loudly at poll/rebase): the fold truncates each
    window's delta with ``int()``, so a fractional column would drift
    from the scan-path histogram and could trip the negative-count
    check on tiny fractional negatives.

    At 100 TB: the poll's cost is the change window's touched buckets;
    the aggregation is map-side-combined into ≤ |categories| rows. The
    corpus is never rescanned after the initial load.

    Reference analog: none (training-data-pipeline extension)."""

    _max_entries = MAX_CATEGORIES

    def __init__(
        self,
        engine,
        entity: str,
        category_col: str = "lang",
        weight_col: str | None = None,
    ):
        self.engine = engine
        self.entity = entity
        self.category_col = category_col
        self.weight_col = weight_col
        tag = f":{weight_col}" if weight_col else ""
        self.consumer = f"mixture_counts:{entity}:{category_col}{tag}"

    def _state_path(self) -> str:
        import os

        tag = f".{self.weight_col}" if self.weight_col else ""
        return os.path.join(
            self.engine.store.root,
            "_mixture_counts",
            f"{self.entity}.{self.category_col}{tag}.json",
        )

    def _group_cols(self) -> list:
        return [F.col(self.category_col).alias("_g0")]

    def _key_of(self, raw: tuple):
        return raw[0] if raw[0] is None else str(raw[0])

    def _decode_key(self, stored):
        return stored if stored is None else str(stored)

    def _sort_key(self, key):
        return (key is None, key)

    def _guard(self) -> str:
        return repr(self.category_col)

    def _margin_predicate(self, margins: list):
        # audit margins ARE category values (None = NULL category)
        vals = [m for m in margins if m is not None]
        pred = (
            F.col(self.category_col).isin(vals) if vals else F.lit(False)
        )
        if any(m is None for m in margins):
            pred = pred | F.col(self.category_col).isNull()
        return pred


#: entry cap for a maintained stratified CDF: |categories| × ≤64 strata
#: × n_bins present-only cells — generous for any sane recipe corpus
MAX_CDF_ENTRIES = 250_000


class StratifiedCDF(_MaintainedFold):
    """The (category, weight-stratum, hash-bin) weight histogram of a
    PINNED-SALT corpus draw, maintained from the change feed — the
    steady-state input of the length-stratified weighted mixture:
    ``solve()`` re-derives per-stratum thresholds after corpus
    mutations with ZERO corpus scans, closing the asymmetry where flat
    mixtures re-solved O(window) (``CategoryCounts``) but stratified
    ones re-scanned the corpus for their hash-CDF.

    The salt MUST be pinned because the histogram's hash-bin axis is
    ``h32(id:salt)`` — a standing mixture does pin it (the incremental
    mixture-export flow carries one salt in its manifest for the life
    of the export); an epoch redraw under a NEW salt re-bins every row
    and therefore starts its own CDF (one ``rebase()``, the same
    O(corpus) the fresh epoch's solve would pay anyway). salt, n_bins,
    and the weight/id columns are pinned in the state file and
    validated on read, so state maintained under different parameters
    fails loudly instead of folding garbage. Crash/retention/
    divergence semantics: ``_MaintainedFold``.

    At 100 TB: the poll's cost is the change window's touched buckets;
    driver state is present-only (category, stratum, bin) cells,
    capped at ``MAX_CDF_ENTRIES``. Weights must be integral (enforced).

    Reference analog: none (training-data-pipeline extension)."""

    _max_entries = MAX_CDF_ENTRIES

    def __init__(
        self,
        engine,
        entity: str,
        salt: str,
        category_col: str = "lang",
        weight_col: str = "n_tokens",
        id_col: str = "doc_id",
        n_bins: int = STRATUM_BINS,
    ):
        import hashlib

        if weight_col is None:
            raise ValueError("StratifiedCDF requires a weight_col")
        self.engine = engine
        self.entity = entity
        self.salt = salt
        self.category_col = category_col
        self.weight_col = weight_col
        self.id_col = id_col
        self.n_bins = n_bins
        sd = hashlib.md5(salt.encode("utf-8")).hexdigest()[:8]
        self._salt_digest = sd
        self.consumer = (
            f"mixture_cdf:{entity}:{category_col}:{weight_col}:{sd}:{n_bins}"
        )

    def _state_path(self) -> str:
        import os

        return os.path.join(
            self.engine.store.root,
            "_mixture_counts",
            f"{self.entity}.{self.category_col}.{self.weight_col}"
            f".{self._salt_digest}.{self.n_bins}.cdf.json",
        )

    def _state_meta(self) -> dict:
        return {
            "salt": self.salt,
            "n_bins": self.n_bins,
            "weight_col": self.weight_col,
            "id_col": self.id_col,
        }

    def _group_cols(self) -> list:
        bin_w = H32_SPACE // self.n_bins
        u = h32_col(
            F.concat(F.col(self.id_col).cast("string"), F.lit(":" + self.salt))
        )
        return [
            F.col(self.category_col).alias("_g0"),
            _stratum_col(self.weight_col).alias("_g1"),
            F.floor(u / bin_w).cast("long").alias("_g2"),
        ]

    def _key_of(self, raw: tuple):
        c, band, hb = raw
        return (c if c is None else str(c), int(band), int(hb))

    def _decode_key(self, stored):
        c, band, hb = stored
        return (c if c is None else str(c), int(band), int(hb))

    def _sort_key(self, key):
        c, band, hb = key
        return (c is None, c if c is not None else "", band, hb)

    def _guard(self) -> str:
        return (
            f"({self.category_col!r}, stratum, hash-bin) "
            f"[salt {self._salt_digest}]"
        )

    def _key_weight_scale(self, key):
        # the audit margin's stratum bounds its rows' weights: stratum
        # s holds weights in [2^s, 2^(s+1)) — the exact per-margin
        # scale the sampled audit's tolerance needs on heavy-tailed
        # corpora
        _c, stratum = key
        return float(2 ** (int(stratum) + 1))

    def _audit_margin_key(self, key):
        # (category, stratum, bin) cells hold ~single rows at
        # deployment bin counts — zero per-cell sampling power; the
        # (category, stratum) margin has the stratum's full row count
        c, stratum, _hb = key
        return (c, int(stratum))

    def _margin_predicate(self, margins: list):
        # audit margins are (category, stratum) pairs; the stratum is
        # re-derived from the weight column exactly as _group_cols does
        s = _stratum_col(self.weight_col)
        pred = F.lit(False)
        for c, band in margins:
            cat = (
                F.col(self.category_col).isNull()
                if c is None
                else F.col(self.category_col) == c
            )
            pred = pred | (cat & (s == int(band)))
        return pred

    def solve(
        self, target_props: dict[str, float], total: int | None = None
    ) -> dict[str, dict[int, float]]:
        """Poll the feed, then solve the stratified thresholds from the
        maintained CDF — salt and n_bins come from this instance's
        pinned state, so they cannot mismatch the histogram. ZERO
        corpus scans; returns the same ``{category: {stratum: rate}}``
        as the scan-path ``stratified_weighted_rates``."""
        cdf = self.poll()
        return stratified_weighted_rates(
            None,
            target_props,
            self.category_col,
            self.id_col,
            self.salt,
            self.weight_col,
            total=total,
            n_bins=self.n_bins,
            cdf=cdf,
        )
