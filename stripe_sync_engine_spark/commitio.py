"""The ONE commit primitive for every durable side-file the engine keeps
— manifests, history snapshots, fold ledgers, consumer cursors, rollup
state, the packer's layout pin, export manifests, landing envelopes, and
the streaming funnel log all route through here.

PORTABILITY CONTRACT (stated once, in one place, so the assumption is
explicit and swappable): these primitives rely on POSIX filesystem
semantics —

* ``atomic_write_*`` commits via write-to-temp + fsync + ``os.replace``
  + parent-directory fsync. POSIX guarantees the replace is an ATOMIC
  pointer swap on the same filesystem: a reader sees the old complete
  content or the new complete content, never a torn file, and a crash
  mid-write leaves only an ignorable dot-prefixed temp beside the
  target. The two fsyncs extend all-or-nothing from process crashes to
  MACHINE crashes (journal replay cannot surface an empty target).
* ``append_line`` relies on small single-``write()`` appends landing
  intact (the funnel log additionally tolerates torn tails by skipping
  unparseable lines on read).

This holds on local disks, NFS, and HDFS-POSIX mounts — the sandbox and
most on-prem deployments. S3/GCS-STYLE OBJECT STORES HAVE NO ATOMIC
RENAME: ``os.replace`` over a FUSE mount degrades to copy+delete, whose
failure window can expose a missing or torn file. Deploying the engine's
metadata layer onto an object store means swapping THIS module's two
write primitives for the store's conditional-put (if-match/if-none-match
generation preconditions on S3/GCS both express the same
compare-and-swap), exactly the way Delta Lake swaps its LogStore per
backend. Data files never need the swap — they are immutable
write-once version dirs; only these pointer/side files carry the
rename-atomicity assumption.

Single-writer expectations stay with the CALLERS (the store's commit
lock, the gates' external-serialization contract, the stream's serial
foreachBatch); this module only guarantees that each individual commit
is all-or-nothing.
"""

from __future__ import annotations

import json
import os


def atomic_write_text(path: str, text: str) -> None:
    """Atomically replace ``path`` with ``text`` (see module contract).
    Creates the parent directory if needed. The temp name is
    DOT-PREFIXED: Spark's file-stream source ignores dot-files, so a
    half-written landing envelope is never listed — and the prefix is
    harmless for every other side-file."""
    d, base = os.path.split(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{base}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(text)
        # fsync BEFORE the rename, and the parent dir after: without
        # both, a power loss shortly after os.replace can surface an
        # empty or missing target on journal replay — the same reason
        # Delta's HDFS LogStore syncs file and directory. A crashed
        # PROCESS never needs this (the page cache survives); this is
        # the machine-crash half of the durability contract.
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    if d:
        try:
            dfd = os.open(d, os.O_RDONLY)
        except OSError:
            return  # directory fsync unsupported (some mounts): best effort
        try:
            os.fsync(dfd)
        except OSError:
            pass
        finally:
            os.close(dfd)


def atomic_write_json(path: str, obj, **dump_kwargs) -> None:
    """Atomically replace ``path`` with ``obj`` as JSON (see module
    contract). ``dump_kwargs`` pass through to ``json.dump`` (e.g. the
    export manifest's ``indent``/``sort_keys``)."""
    atomic_write_text(path, json.dumps(obj, **dump_kwargs))


def append_line(path: str, line: str) -> None:
    """Append ``line`` (newline added) to ``path`` in one ``write()``
    call — the durable-log primitive (funnel metrics, maintenance log).
    Deliberately NOT fsynced: readers tolerate a torn or lost tail line
    after a crash (``read_funnel_metrics`` skips unparseable lines, and
    a lost funnel line is re-appended by the batch's replay), so paying
    a sync per log line buys nothing the contract needs."""
    with open(path, "a") as f:
        f.write(line + "\n")
