"""Corpus shard export: the last stage of a training-data pipeline —
write a curated corpus as deterministic, size-bounded, independently
verifiable shards that a dataloader can consume and a rerun can resume.

Layout: ``out_dir/data/shard=K/*.parquet`` + ``out_dir/manifest.json``.

* **Deterministic assignment**: shard = md5(doc_id) % n_shards — the
  same formula as ``txt_bpe_tokens``' sequence packing, so a document's
  export shard IS its pack shard when ``n_shards == N_PACK_SHARDS``.
* **Deterministic order**: rows sort by id within each shard file, so a
  byte-identical rerun produces byte-identical shard content.
* **Verifiable manifest**: per-shard row counts plus two commutative
  digests — an id-set digest (sum of xxhash64(id)) and a content digest
  (sum of xxhash64 over the JSON of the full row). Commutative sums are
  deliberate: they aggregate map-side in any order, so manifest
  computation is ONE groupBy with partial aggregation, never an ordered
  collect. (The in-file sort is for reproducible bytes; the digests
  don't depend on it.)
* **Atomic + resumable**: the manifest lands via tmp-file + rename (the
  store's commit pattern). A rerun with ``resume=True`` recomputes the
  per-shard digests from the input and rewrites ONLY shards whose
  digest changed or whose manifest entry is missing — dynamic partition
  overwrite, untouched shard directories are not rewritten.

At 100 TB: one hash repartition to co-locate shards, one map-side-
combined aggregation for the manifest, and per-shard parquet writes —
no ordered global operation anywhere. Raise ``n_shards`` to
O(corpus_bytes / desired_shard_bytes); each shard stays one writer
task's output. Verification (``verify_export``) is an embarrassingly
parallel re-scan compared against the manifest.

Reference analog: none (the reference syncs INTO a database; exporting
curated corpora out is the training-data-pipeline extension).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from stripe_sync_engine_spark.commitio import atomic_write_json
from pyspark.sql import functions as F

MANIFEST_NAME = "manifest.json"
FORMAT_VERSION = 1


# 8 hex chars = 32 bits of md5. Mod bias is ≤ n_shards/2^32 — uniform up
# to millions of shards. (A 2-char prefix caps the key space at 256
# buckets: n_shards > 256 would silently leave shards permanently empty,
# and any n_shards not dividing 256 skews shard sizes by up to 50%.)
SHARD_HEX_CHARS = 8

# The dedup/fingerprint families' "h32" draw is a FIXED 32-bit quantity —
# their Spark sides hard-code substr(1, 8) — so its width is a separate
# constant: tuning SHARD_HEX_CHARS for shard-assignment reasons must not
# silently move every dd_*/txt_fingerprint oracle.
H32_HEX_CHARS = 8


def _nibble_sum_sql(var: str, n_chars: int) -> str:
    """DuckDB mirror of Spark's ``conv(md5(var).substr(1, n_chars), 16,
    10)`` (DuckDB has no conv(); strpos-per-nibble reproduces it)."""
    return " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(md5({var}), {i}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (n_chars - i)}"
        for i in range(1, n_chars + 1)
    )


def h32_col(col):
    """Spark side of ``sql_h32``: the ONE md5→int64 32-bit uniform draw
    (uniform on [0, 2^32) for distinct inputs) — consumers: shard
    assignment below, the mixing sampler's keep-threshold
    (``operators/mixing``). Pass any string-able Column; never re-inline
    the conv/md5/substr chain, or a consumer desynchronizes from its
    DuckDB oracle."""
    return F.conv(
        F.md5(col.cast("string")).substr(1, H32_HEX_CHARS), 16, 10
    ).cast("long")


def _shard_col(id_col: str, n_shards: int):
    # NOT expressed via h32_col: SHARD_HEX_CHARS is a separate constant
    # by design (see its comment) — tuning shard width must not move the
    # h32 consumers' oracles, and vice versa.
    return (
        F.conv(
            F.md5(F.col(id_col).cast("string")).substr(1, SHARD_HEX_CHARS), 16, 10
        ).cast("long")
        % n_shards
    )


def sql_h32(var: str) -> str:
    """The md5→int64 "h32" bridge the dedup/textops oracles bind to their
    own variables — ONE copy, fixed at ``H32_HEX_CHARS``."""
    return _nibble_sum_sql(var, H32_HEX_CHARS)


def shard_sql(var: str, n: int) -> str:
    """DuckDB mirror of ``_shard_col`` for oracle SQL."""
    return f"(({_nibble_sum_sql(var, SHARD_HEX_CHARS)}) % {n})"


def _digest_aggs(id_col: str, cols: list[str]):
    """Digest aggregates: commutative SUMs of 64-bit hashes, accumulated
    in DECIMAL(38,0) (ANSI mode makes a long sum throw on overflow, and
    random hashes overflow almost surely) and wrapped to 64 bits driver-
    side by ``_wrap64``. Decimal(38) holds ~1e19 row-hash sums before its
    own bound — far past any shard size."""
    return [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.xxhash64(F.col(id_col)).cast("decimal(38,0)")).alias("id_digest"),
        F.sum(
            F.xxhash64(F.to_json(F.struct(*cols))).cast("decimal(38,0)")
        ).alias("content_digest"),
    ]


def _wrap64(v) -> int:
    return int(v or 0) % (1 << 64)


def _shard_stats(df: DataFrame, id_col: str, n_shards: int) -> dict[int, dict]:
    """Per-shard (n_docs, id_digest, content_digest) in one aggregation."""
    rows = (
        df.withColumn("_shard", _shard_col(id_col, n_shards))
        .groupBy("_shard")
        .agg(*_digest_aggs(id_col, list(df.columns)))
        .collect()
    )
    stats = {
        int(r["_shard"]): {
            "n_docs": int(r["n_docs"]),
            "id_digest": _wrap64(r["id_digest"]),
            "content_digest": _wrap64(r["content_digest"]),
        }
        for r in rows
    }
    for k in range(n_shards):
        stats.setdefault(k, {"n_docs": 0, "id_digest": 0, "content_digest": 0})
    return stats


def _overwrite_shards(df: DataFrame, data_dir: str, todo: list[int], n_parts: int, id_col: str) -> None:
    """Rewrite the ``todo`` shard directories via dynamic partition
    overwrite; rows sort by id within each shard for reproducible bytes.
    ``df`` must already carry the ``shard`` column."""
    spark = df.sparkSession
    out = (
        df.filter(F.col("shard").isin(todo))
        .repartition(n_parts, "shard")
        .sortWithinPartitions("shard", id_col)
    )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(mode_key, None)
    spark.conf.set(mode_key, "dynamic")
    try:
        out.write.partitionBy("shard").mode("overwrite").parquet(data_dir)
    finally:
        if prev_mode is None:
            spark.conf.unset(mode_key)
        else:
            spark.conf.set(mode_key, prev_mode)


def _sweep_foreign_shards(data_dir: str, n_shards: int) -> None:
    """Remove shard directories outside ``range(n_shards)``.

    A prior export with a LARGER n_shards leaves shard dirs that dynamic
    partition overwrite never touches (it only replaces partitions present
    in the write); without this sweep a re-export with fewer shards — the
    exact recovery the resume n_shards-mismatch error prescribes — would
    report success while dataloaders read every doc twice."""
    if not os.path.isdir(data_dir):
        return
    for name in os.listdir(data_dir):
        if not name.startswith("shard="):
            continue
        try:
            k = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if not 0 <= k < n_shards:
            shutil.rmtree(os.path.join(data_dir, name), ignore_errors=True)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    atomic_write_json(
        os.path.join(out_dir, MANIFEST_NAME), manifest, indent=1, sort_keys=True
    )


def read_manifest(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def export_corpus_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    resume: bool = False,
    mixture: dict | None = None,
) -> dict:
    """Export ``df`` as verified shards; returns the committed manifest.

    ``resume=True`` + an existing manifest: shards whose digests already
    match the input are skipped (their directories are left untouched);
    only changed/missing shards are rewritten via dynamic partition
    overwrite. The manifest is committed atomically AFTER the data
    writes, so a crash mid-export leaves the previous manifest authoritative.

    ``mixture``: the drawn-mixture recipe this export realizes
    (``mixing.mixture_record(rates, salt, ...)`` for the flat draw,
    ``mixing.stratified_record(strata, salt, ...)`` for the
    length-stratified one) — recorded verbatim in the manifest so
    membership of every row is re-derivable from the manifest alone,
    forever (``mixing.verify_mixture`` enforces it, dispatching on the
    record's kind). ``resume=True`` with ``mixture=None`` carries the
    previous manifest's recipe forward; passing a DIFFERENT recipe on
    resume raises, because the untouched shards still realize the old
    one — re-export from scratch when the recipe changes.
    """
    if mixture is not None and not (
        isinstance(mixture, dict)
        and "salt" in mixture
        and ("rates" in mixture or "strata" in mixture)
    ):
        raise ValueError(
            "mixture must be a mixing.mixture_record(...) or "
            "mixing.stratified_record(...) dict (needs 'salt' and "
            "'rates'/'strata')"
        )
    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    stats = _shard_stats(df, id_col, n_shards)

    prev = read_manifest(out_dir) if resume else None
    if prev is not None and prev.get("n_shards") != n_shards:
        raise ValueError(
            f"resume with n_shards={n_shards} against a manifest written with "
            f"n_shards={prev.get('n_shards')}; re-export without resume"
        )
    if prev is not None:
        if mixture is None:
            mixture = prev.get("mixture")  # the recipe travels with the data
        elif prev.get("mixture") is not None and prev["mixture"] != mixture:
            raise ValueError(
                "resume with a different mixture recipe: the skipped shards "
                "still realize the previous one — re-export without resume"
            )
    todo = [
        k
        for k, s in stats.items()
        if prev is None or prev["shards"].get(str(k)) != s
    ]

    # Dynamic partition overwrite only replaces partitions PRESENT in the
    # write; a shard whose docs all disappeared since the last export must
    # have its stale directory removed explicitly — as must directories a
    # previous export wrote under a different (larger) n_shards.
    emptied = [k for k in todo if stats[k]["n_docs"] == 0]
    for k in emptied:
        shutil.rmtree(os.path.join(data_dir, f"shard={k}"), ignore_errors=True)
    todo = [k for k in todo if stats[k]["n_docs"] > 0]

    if todo:
        _overwrite_shards(
            df.withColumn("shard", _shard_col(id_col, n_shards)),
            data_dir,
            todo,
            n_shards,
            id_col,
        )
    # Sweep AFTER the data writes, just before the manifest commit: a
    # crash mid-write then leaves the previous (larger-n_shards) manifest
    # with its directories still intact, per the crash contract above.
    _sweep_foreign_shards(data_dir, n_shards)

    manifest = {
        "format_version": FORMAT_VERSION,
        "n_shards": n_shards,
        "id_col": id_col,
        "columns": list(df.columns),
        "exported_at_ms": int(time.time() * 1000),
        "total_docs": sum(s["n_docs"] for s in stats.values()),
        "shards": {str(k): stats[k] for k in sorted(stats)},
        "shards_rewritten": sorted(todo + emptied),
    }
    if mixture is not None:
        manifest["mixture"] = mixture
    _write_manifest(out_dir, manifest)
    return manifest


def export_changed_shards(
    df: DataFrame,
    out_dir: str,
    changed_ids: DataFrame,
    id_col: str = "doc_id",
) -> dict:
    """Incremental export: rewrite only the shards touched by a change set.

    ``resume=True`` re-digests the WHOLE corpus to discover what changed —
    a full scan per export. When the caller already knows the changed ids
    (the engine's change data feed emits exactly this), the scan shrinks
    to the affected shards: ``changed_ids`` (one column of ids — inserts,
    updates AND deletes since the last export) maps to its shard set
    (driver-side distinct, bounded by ``n_shards``), stats recompute over
    ONLY those shards of ``df``, untouched shards carry forward from the
    manifest, and the rewrite overwrites just those shard directories
    (dynamic partition overwrite). The shard filter on ``df`` prunes IO
    when the source is itself partitioned/bucketed by the same md5-shard
    key (lay out the corpus store that way for incremental export);
    against an unpartitioned source it is a cheap filter over one scan —
    still saving the stats aggregation and the rewrite, which is where
    the work is. A deleted doc's id still maps to its old shard, so that
    shard recomputes from a ``df`` that no longer contains it — deletions
    shrink the shard correctly.

    A MIXTURE export increments the same way: pass the CURRENT drawn set
    as ``df`` (``mixing.sample_mixture`` over the mutated corpus) and the
    corpus feed's changed ids — a category flip that moves a doc into or
    out of the drawn set is a changed id, so its shard recomputes against
    the new membership; the manifest's recipe record carries forward
    (e2e incl. both flip directions:
    ``tests/test_mixing.py::test_mixture_export_incremental_from_change_feed``).
    """
    prev = read_manifest(out_dir)
    if prev is None:
        raise FileNotFoundError(
            f"no {MANIFEST_NAME} under {out_dir}; run export_corpus_shards first"
        )
    if prev["id_col"] != id_col:
        raise ValueError(f"manifest id_col={prev['id_col']!r} != {id_col!r}")
    # Column set AND order must match the manifest: touched shards would
    # otherwise recompute their digests over the new column struct while
    # untouched shards carry forward old-column digests — a mismatch that
    # only surfaces later as a confusing verify_export failure. A reshaped
    # corpus is a NEW export (run export_corpus_shards), not an increment.
    if list(df.columns) != prev["columns"]:
        raise ValueError(
            f"column mismatch vs manifest: df has {list(df.columns)!r}, "
            f"manifest recorded {prev['columns']!r}; a reordered or "
            "reshaped projection requires a fresh export_corpus_shards"
        )
    n_shards = int(prev["n_shards"])
    data_dir = os.path.join(out_dir, "data")
    the_id = changed_ids.columns[0]
    touched = sorted(
        int(r[0])
        for r in changed_ids.select(
            _shard_col(the_id, n_shards).alias("_shard")
        )
        .distinct()
        .collect()
    )

    shards = {int(k): dict(v) for k, v in prev["shards"].items()}
    emptied: list[int] = []
    todo: list[int] = []
    if touched:
        sub = df.filter(_shard_col(id_col, n_shards).isin(touched))
        sub_stats = _shard_stats(sub, id_col, n_shards)
        for k in touched:
            if shards.get(k) == sub_stats[k]:
                continue  # replayed/no-op change: leave the shard alone
            shards[k] = sub_stats[k]
            if sub_stats[k]["n_docs"] == 0:
                emptied.append(k)
            else:
                todo.append(k)
        for k in emptied:
            shutil.rmtree(os.path.join(data_dir, f"shard={k}"), ignore_errors=True)
        if todo:
            _overwrite_shards(
                sub.withColumn("shard", _shard_col(id_col, n_shards)),
                data_dir,
                todo,
                len(todo),
                id_col,
            )

    manifest = {
        **prev,
        "exported_at_ms": int(time.time() * 1000),
        "total_docs": sum(s["n_docs"] for s in shards.values()),
        "shards": {str(k): shards[k] for k in sorted(shards)},
        "shards_rewritten": sorted(todo + emptied),
    }
    _write_manifest(out_dir, manifest)
    return manifest


def verify_export(spark: SparkSession, out_dir: str) -> dict:
    """Re-scan the shards and compare counts + digests to the manifest.

    Returns {"ok": bool, "mismatched_shards": [...], "total_docs": n}.
    An absent data directory verifies an all-empty manifest (zero-doc
    shards write no directory)."""
    manifest = read_manifest(out_dir)
    if manifest is None:
        raise FileNotFoundError(f"no {MANIFEST_NAME} under {out_dir}")
    id_col = manifest["id_col"]
    data_dir = os.path.join(out_dir, "data")
    expected = manifest["shards"]
    if not os.path.isdir(data_dir):
        actual: dict[str, dict] = {}
    else:
        df = spark.read.parquet(data_dir)
        cols = [c for c in manifest["columns"]]
        rows = df.groupBy("shard").agg(*_digest_aggs(id_col, cols)).collect()
        actual = {
            str(int(r["shard"])): {
                "n_docs": int(r["n_docs"]),
                "id_digest": _wrap64(r["id_digest"]),
                "content_digest": _wrap64(r["content_digest"]),
            }
            for r in rows
        }
    mismatched = []
    for k, exp in expected.items():
        got = actual.get(k, {"n_docs": 0, "id_digest": 0, "content_digest": 0})
        if got != exp:
            mismatched.append(int(k))
    extra = [int(k) for k in actual if k not in expected]
    mismatched.extend(extra)
    return {
        "ok": not mismatched,
        "mismatched_shards": sorted(mismatched),
        "total_docs": sum(s["n_docs"] for s in actual.values()),
    }
