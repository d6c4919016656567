"""A minimal transaction-log table format over plain parquet — the
lakehouse mechanism (Delta/Iceberg-style) reduced to its core:

  <table>/
    _txlog/00000000.json   {"version": 0, "add": [files...], "remove": []}
    _txlog/00000001.json   {"version": 1, "add": [...], "remove": [...]}
    part-*.parquet         immutable data files

Reads resolve a SNAPSHOT: replay the log up to the requested version,
accumulating add/remove sets, and scan exactly the live files — which
gives time travel (read any historical version), atomic commits (the
log entry is written last, via atomic rename, so a crashed writer
leaves only invisible orphan data files), and compaction that rewrites
files without changing the visible rows.

Why this matters at 100 TB: the query layer never lists the data
directory (object-store LIST is slow and eventually-consistent); the
log IS the source of truth for which of millions of files are live,
and each snapshot read plans a scan over just that file set. This
module keeps the log tiny (JSON per commit, driver-side — the data
path stays distributed parquet IO through the normal reader).

Single-writer by design (versions are claimed by atomic
rename-if-absent; a loser raises) — the engine's scope is snapshot
isolation + time travel, not multi-writer conflict resolution.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, "_txlog")


def _entry_path(table_path: str, version: int) -> str:
    return os.path.join(_log_dir(table_path), f"{version:08d}.json")


def _stage_data_files(df: DataFrame, table_path: str) -> list[str]:
    """Write df's rows as immutable parquet files inside the table dir
    (via a temp subdir + move, so half-written files never carry a
    visible name) and return their relative file names."""
    os.makedirs(table_path, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="_stage_", dir=table_path)
    df.write.mode("overwrite").parquet(os.path.join(tmp, "out"))
    names = []
    for p in sorted(os.listdir(os.path.join(tmp, "out"))):
        if p.startswith("part-") and p.endswith(".parquet"):
            new_name = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(tmp, "out", p), os.path.join(table_path, new_name))
            names.append(new_name)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return names


def _commit(table_path: str, version: int, add: list[str], remove: list[str]) -> None:
    """Atomically publish a log entry: write to a temp name, then
    link(2) into place — link fails if the version already exists, so
    two racing writers cannot both claim a version."""
    os.makedirs(_log_dir(table_path), exist_ok=True)
    entry = {"version": version, "add": add, "remove": remove}
    tmp = _entry_path(table_path, version) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    try:
        os.link(tmp, _entry_path(table_path, version))
    except FileExistsError:
        raise RuntimeError(f"txlog version {version} already committed (concurrent writer)")
    finally:
        os.unlink(tmp)


def latest_version(table_path: str) -> int:
    """Highest committed version, or -1 for an empty/absent table."""
    d = _log_dir(table_path)
    if not os.path.isdir(d):
        return -1
    versions = [
        int(p[:-5]) for p in os.listdir(d) if p.endswith(".json") and p[:-5].isdigit()
    ]
    return max(versions, default=-1)


def txlog_append(df: DataFrame, table_path: str) -> int:
    """Append df's rows as a new version; returns the version number."""
    add = _stage_data_files(df, table_path)
    v = latest_version(table_path) + 1
    _commit(table_path, v, add=add, remove=[])
    return v


def txlog_overwrite(df: DataFrame, table_path: str) -> int:
    """Replace the table contents (logical overwrite): the new version
    removes every currently-live file and adds the new ones. Old
    versions remain readable — nothing is deleted from disk."""
    live = _live_files(table_path, latest_version(table_path))
    add = _stage_data_files(df, table_path)
    v = latest_version(table_path) + 1
    _commit(table_path, v, add=add, remove=sorted(live))
    return v


def txlog_compact(spark: SparkSession, table_path: str, target_files: int = 1) -> int:
    """Rewrite the live file set into ``target_files`` files without
    changing visible rows (OPTIMIZE): read the current snapshot,
    coalesce, commit add+remove in one version."""
    current = txlog_read(spark, table_path)
    add = _stage_data_files(current.coalesce(target_files), table_path)
    live = _live_files(table_path, latest_version(table_path))
    v = latest_version(table_path) + 1
    _commit(table_path, v, add=add, remove=sorted(live))
    return v


def txlog_delete_where(spark: SparkSession, table_path: str, predicate) -> int:
    """Row-level DELETE via copy-on-write — the Delta/Iceberg DELETE
    shape: ONE distributed pass finds which live files actually
    contain matching rows (input_file_name aggregation; the collect is
    bounded by the file count, never the row count), ONLY those files
    are rewritten without their matching rows, and the commit swaps
    them atomically (add=rewrites, remove=affected). Untouched files
    — at 100 TB, the overwhelming majority — survive in place, and
    every prior version still time-travels to the pre-delete rows
    until vacuumed (the retention story a real forget-me pipeline
    pairs with this).

    NULL predicate results count as no-match (SQL DELETE semantics):
    such rows are KEPT."""
    from pyspark.sql import functions as F

    v = latest_version(table_path)
    live = sorted(_live_files(table_path, v))
    paths = [os.path.join(table_path, f) for f in live]
    if not paths:
        return v  # empty table — DELETE is a no-op, no new version
    match = F.coalesce(predicate, F.lit(False))
    df = spark.read.parquet(*paths)
    affected = sorted(
        r[0]
        for r in df.filter(match)
        .select(F.element_at(F.split(F.input_file_name(), "/"), -1).alias("f"))
        .distinct()
        .collect()
    )
    if not affected:
        return v  # nothing to delete — no new version
    keep = spark.read.parquet(
        *[os.path.join(table_path, f) for f in affected]
    ).filter(~match)
    add = _stage_data_files(keep, table_path)
    _commit(table_path, v + 1, add=add, remove=affected)
    return v + 1


def _live_files(table_path: str, version: int) -> set[str]:
    live: set[str] = set()
    for v in range(version + 1):
        with open(_entry_path(table_path, v)) as f:
            entry = json.load(f)
        live.update(entry["add"])
        live.difference_update(entry["remove"])
    return live


def txlog_read(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: the table as of ``version`` (default: latest).
    Plans a parquet scan over exactly the live files of that snapshot —
    orphaned files from failed writers and files removed by later
    versions are invisible by construction."""
    v = latest_version(table_path) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no txlog table at {table_path}")
    floor = vacuum_floor(table_path)
    if v < floor:
        raise ValueError(
            f"txlog version {v} is below the vacuum retention floor {floor} "
            f"at {table_path} — its data files have been reclaimed"
        )
    if not os.path.exists(_entry_path(table_path, v)):
        raise FileNotFoundError(f"txlog version {v} does not exist at {table_path}")
    live = sorted(_live_files(table_path, v))
    if not live:
        raise ValueError(f"txlog version {v} has no live files")
    return spark.read.parquet(*[os.path.join(table_path, p) for p in live])


def vacuum_floor(table_path: str) -> int:
    """Lowest version whose snapshot is still fully readable (0 if the
    table has never been vacuumed)."""
    marker = os.path.join(_log_dir(table_path), "_vacuum.json")
    if not os.path.exists(marker):
        return 0
    with open(marker) as f:
        return json.load(f)["floor_version"]


def txlog_vacuum(table_path: str, retain_versions: int = 2) -> list[str]:
    """Reclaim data files no longer reachable from the last
    ``retain_versions`` snapshots (Delta/Iceberg VACUUM / expire-
    snapshots): any parquet file in the table dir that is not live in
    ANY retained snapshot is deleted — this covers files compacted or
    overwritten away AND orphans from crashed writers (staged but
    never committed). The retention floor is recorded in the log dir
    so a later time travel below it fails with a clear error instead
    of a missing-file scan. Returns the deleted file names.

    Scale note: vacuum touches only the log (KBs) and issues unlinks —
    it never reads data files, so its cost is O(#files), not O(bytes).
    Like Delta's VACUUM with zero retention-hours, it must not run
    concurrently with an in-flight writer (staged-but-uncommitted
    files look like orphans); production deployments add an age floor.
    """
    latest = latest_version(table_path)
    if latest < 0:
        return []
    floor = max(0, latest - retain_versions + 1)
    keep: set[str] = set()
    for v in range(floor, latest + 1):
        keep |= _live_files(table_path, v)
    deleted = []
    for p in sorted(os.listdir(table_path)):
        if p.endswith(".parquet") and p not in keep:
            os.unlink(os.path.join(table_path, p))
            deleted.append(p)
    marker = os.path.join(_log_dir(table_path), "_vacuum.json")
    tmp = marker + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"floor_version": floor}, f)
    os.replace(tmp, marker)
    return deleted


def _file_stats(table_path: str, names: list[str], stats_cols: list[str]) -> dict:
    """Per-file min/max of ``stats_cols``, read from the parquet FOOTERS
    (row-group statistics — no data pages touched). Stored in the log
    entry so the read path can prune files without opening them."""
    import pyarrow.parquet as pq

    out: dict = {}
    for name in names:
        md = pq.ParquetFile(os.path.join(table_path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        col_stats = {}
        for c in stats_cols:
            if c not in idx:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                col_stats[c] = [min(mins), max(maxs)]
        out[name] = col_stats
    return out


def txlog_append_with_stats(
    df: DataFrame, table_path: str, stats_cols: list[str]
) -> int:
    """txlog_append + per-file min/max footer stats recorded in the
    commit, enabling data skipping on reads (the Delta/Iceberg
    file-pruning mechanism: the LOG answers 'which files can contain
    x ∈ [lo, hi]', so a selective query plans a scan over a fraction
    of the table without any directory or footer I/O at read time)."""
    add = _stage_data_files(df, table_path)
    v = latest_version(table_path) + 1
    entry_stats = _file_stats(table_path, add, stats_cols)
    os.makedirs(_log_dir(table_path), exist_ok=True)
    entry = {"version": v, "add": add, "remove": [], "stats": entry_stats}
    tmp = _entry_path(table_path, v) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    try:
        os.link(tmp, _entry_path(table_path, v))
    except FileExistsError:
        raise RuntimeError(f"txlog version {v} already committed (concurrent writer)")
    finally:
        os.unlink(tmp)
    return v


def txlog_read_skipping(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Snapshot read pruned by the log's per-file min/max: only files
    whose [min, max] range for ``col`` intersects [lo, hi] enter the
    scan (files without recorded stats are conservatively kept). The
    residual filter is still applied — skipping is an optimization,
    never a semantics change."""
    v = latest_version(table_path) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no txlog table at {table_path}")
    live = _live_files(table_path, v)
    stats: dict = {}
    for ver in range(v + 1):
        with open(_entry_path(table_path, ver)) as f:
            entry = json.load(f)
        stats.update(entry.get("stats", {}))
    keep = []
    for name in sorted(live):
        s = stats.get(name, {}).get(col)
        if s is None or (s[0] <= hi and s[1] >= lo):
            keep.append(name)
    if not keep:
        # empty-but-typed result: scan one live file, filter to nothing
        any_file = sorted(live)[0]
        base = spark.read.parquet(os.path.join(table_path, any_file))
        return base.filter("1 = 0")
    df = spark.read.parquet(*[os.path.join(table_path, p) for p in keep])
    from pyspark.sql import functions as F

    return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))


def committed_batch_ids(table_path: str) -> set:
    """Batch ids recorded by txlog_ingest_batch commits so far."""
    ids = set()
    for v in range(latest_version(table_path) + 1):
        with open(_entry_path(table_path, v)) as f:
            entry = json.load(f)
        if "batchId" in entry:
            ids.add(entry["batchId"])
    return ids


def txlog_ingest_batch(df: DataFrame, table_path: str, batch_id: int):
    """Exactly-once streaming ingestion: append ``df`` as one commit
    TAGGED with the micro-batch id; a redelivered batch (foreachBatch
    re-runs after a failure/restart) finds its id already committed
    and is skipped — the log itself is the idempotence ledger, no
    side table. Returns the committed version, or None if skipped."""
    if batch_id in committed_batch_ids(table_path):
        return None
    add = _stage_data_files(df, table_path)
    v = latest_version(table_path) + 1
    os.makedirs(_log_dir(table_path), exist_ok=True)
    entry = {"version": v, "add": add, "remove": [], "batchId": batch_id}
    tmp = _entry_path(table_path, v) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    try:
        os.link(tmp, _entry_path(table_path, v))
    except FileExistsError:
        raise RuntimeError(f"txlog version {v} already committed (concurrent writer)")
    finally:
        os.unlink(tmp)
    return v
