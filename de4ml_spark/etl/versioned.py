"""Versioned parquet tables: snapshot-on-write, time travel, and vacuum.

Layout: ``<root>/v=<N>/`` immutable parquet snapshot dirs plus a
``<root>/_VERSIONS`` commit log (committed version numbers, ascending, one
per line; the last line is the current version). Writers never mutate an
existing snapshot: a commit writes ``v=N+1`` to completion, then publishes
it by atomically replacing the log (tmp file + ``os.replace``).
Consequences:

- Concurrent readers resolve the log once and then scan an immutable
  directory — they can never observe a half-written table (the failure
  mode ADVICE.md flagged for delete-then-move swaps).
- A crash mid-commit leaves the previous snapshot current plus an orphan
  ``v=`` dir the log never recorded. Orphans stay distinguishable from
  committed snapshots forever (they are absent from the log), are skipped
  by readers, and are removed by the next ``vacuum``.
- Old snapshots stay readable (``read(root, version=K)``) until vacuumed —
  time travel for debugging/reproducing a training run's exact inputs.

This is the Iceberg/Delta snapshot-log pattern minus the manifest/
statistics layer (plain parquet — the driver environment has no
table-format package). At cluster scale the log replace maps onto the
metastore/catalog commit, which provides the same atomicity on object
stores that lack atomic rename.

Single-writer assumption (like a metastore-less Delta): concurrent commits
race on the log; callers serialize writes per table. Readers are lock-free.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_LOG = "_VERSIONS"


def _log_path(root: str) -> str:
    return os.path.join(root, _LOG)


def _version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v={version}")


def _scan_dirs(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def committed_versions(root: str) -> list[int]:
    """Versions recorded in the commit log, ascending."""
    try:
        with open(_log_path(root)) as f:
            return [int(line) for line in f.read().split() if line.strip()]
    except FileNotFoundError:
        return []


def latest_version(root: str) -> int | None:
    vs = committed_versions(root)
    return vs[-1] if vs else None


def _write_log(root: str, versions: list[int]) -> None:
    tmp = _log_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(str(v) for v in versions))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _log_path(root))  # atomic on POSIX


def commit(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Write ``df`` as the next snapshot and atomically publish it in the
    commit log. Returns the new version number. Orphan dirs from crashed
    commits are skipped over, never reused."""
    os.makedirs(root, exist_ok=True)
    log = committed_versions(root)
    next_v = max([*log, *_scan_dirs(root), -1]) + 1
    df.write.mode("overwrite").parquet(_version_dir(root, next_v))
    _write_log(root, [*log, next_v])
    return next_v


def read(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the current snapshot, or time-travel to a committed ``version``."""
    log = committed_versions(root)
    if not log:
        raise FileNotFoundError(f"no committed version under {root}")
    v = log[-1] if version is None else version
    if v not in log or not os.path.isdir(_version_dir(root, v)):
        raise FileNotFoundError(
            f"version {v} of {root} is not a committed, retained snapshot"
        )
    return spark.read.parquet(_version_dir(root, v))


def history(root: str) -> list[dict]:
    """All snapshot dirs, oldest first: version, file count, bytes, whether
    committed (in the log) and whether current."""
    log = committed_versions(root)
    cur = log[-1] if log else None
    out = []
    for v in _scan_dirs(root):
        d = _version_dir(root, v)
        files = [
            os.path.join(d, f)
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        ]
        out.append(
            {
                "version": v,
                "n_files": len(files),
                "bytes": sum(os.path.getsize(f) for f in files),
                "is_current": v == cur,
                "committed": v in log,
            }
        )
    return out


def vacuum(root: str, keep: int = 2) -> list[int]:
    """Drop orphan dirs (crashed commits, never in the log) and all but the
    newest ``keep`` committed snapshots. The current version is always
    kept; the log is rewritten without the dropped versions. Returns the
    removed versions."""
    log = committed_versions(root)
    if not log:
        return []
    cur = log[-1]
    drop_committed = [v for v in log[: max(len(log) - keep, 0)] if v != cur]
    orphans = [v for v in _scan_dirs(root) if v not in log]
    removed = []
    for v in drop_committed + orphans:
        target = _version_dir(root, v)
        if os.path.isdir(target):
            shutil.rmtree(target)
        removed.append(v)
    if drop_committed:
        _write_log(root, [v for v in log if v not in drop_committed])
    return sorted(removed)


def upsert(
    spark: SparkSession, root: str, updates: DataFrame, key: str | list[str]
) -> int:
    """Keyed MERGE committed as a new snapshot: rows matching an update's
    (composite) key are replaced, new keys append, history stays readable.
    The read side scans the current snapshot (immutable), so unlike an
    in-place rewrite there is no read-your-own-write hazard mid-merge."""
    keys = [key] if isinstance(key, str) else list(key)
    current = read(spark, root)
    merged = current.join(updates, keys, "left_anti").unionByName(updates)
    return commit(spark, root, merged)


def compact(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """OPTIMIZE: rewrite the current snapshot bin-packed into files of
    ~``target_file_bytes`` and commit the result as a NEW snapshot —
    readers on the old version are untouched (snapshot isolation), and
    vacuum reclaims the fragmented one later. This is the small-files
    fix for streaming/epoch-append tables: thousands of KB-scale epoch
    files make every scan pay per-file open + listing + task-launch
    costs; at 100 TB the same call maps onto Delta OPTIMIZE / Iceberg
    rewrite_data_files. File count = ceil(bytes / target) via coalesce
    (no shuffle — pure read-merge-write). Returns the new version."""
    import math

    cur = latest_version(root)
    if cur is None:
        raise FileNotFoundError(f"no committed version under {root}")
    d = _version_dir(root, cur)
    size = sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    return commit(spark, root, read(spark, root).coalesce(n_files))


def snapshot_diff(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int,
    key: str | list[str],
) -> DataFrame:
    """Change-data-feed read between two committed snapshots: one row per
    changed key with ``_change`` in {'insert', 'delete', 'update'} — the
    Delta/Iceberg CDF shape over the snapshot log.

    Keys present only in ``to`` are inserts, only in ``from`` deletes;
    keys in both whose non-key content fingerprint differs are updates
    (unchanged rows are NOT emitted). The fingerprint is md5 over the
    canonical JSON of the non-key columns (the with_provenance content
    hash), so the diff is one full-outer join on the key — no row-by-row
    comparison columns to enumerate.

    Scale: both sides scan their immutable snapshot; the join shuffles
    each side once on the key; output is bounded by churn, not table
    size.
    """
    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    old = read(spark, root, from_version)
    new = read(spark, root, to_version)
    # provenance columns (__-prefixed, e.g. __source_file) differ per
    # commit by construction — including them would report every key as
    # an update, defeating the churn-bounded contract above
    payload = [
        c for c in new.columns if c not in keys and not c.startswith("__")
    ]

    def fp(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            *keys, F.md5(F.to_json(F.struct(*payload))).alias(name)
        )

    joined = fp(old, "__fp_old").join(fp(new, "__fp_new"), keys, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit("insert"))
        .when(F.col("__fp_new").isNull(), F.lit("delete"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("update"))
    )
    diff_keys = joined.withColumn("_change", change).filter(
        F.col("_change").isNotNull()
    ).select(*keys, "_change")
    # attach the current payload for inserts/updates, the old one for
    # deletes, so the feed is directly applyable downstream
    new_side = new.join(
        diff_keys.filter(F.col("_change") != "delete"), keys
    )
    del_side = old.join(
        diff_keys.filter(F.col("_change") == "delete"), keys
    )
    return new_side.unionByName(del_side)
