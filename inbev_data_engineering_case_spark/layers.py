"""Medallion layer sinks and the snapshot catalog (OP-02/06/07/08/09).

The reference materializes every pipeline run as a fresh timestamped folder
``brewery_data_{YYYY-MM-DD-HH-MM}`` and downstream stages resolve their input
by latest-snapshot discovery — reverse-lexicographic folder sort, first folder
holding data files (``.csv`` for bronze, a ``_SUCCESS`` marker for silver)
(reference dags/data_transformations_bronze_to_silver.py:52-63,
dags/gold_data_aggregation.py:19-30). That contract is kept: it gives
full-reload snapshot semantics with idempotent overwrite and a natural
retry/recovery joint (SURVEY.md §1.1, §3.4).

Scale notes (100 TB design point):
- ``write_layer`` takes a ``target_file_mb`` hint and repartitions by the
  partition keys so each Hive partition is written by few tasks — the
  reference's ``partitionBy('country','state')`` over default shuffle
  partitions sprays hundreds of tiny files (SURVEY.md §4.3-2). Repartitioning
  by the partition columns routes each partition's rows to one task; AQE
  handles residual skew.
- Run-ids are caller-supplied (no wall-clock in library code) so runs are
  deterministic and replayable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_PREFIX = "brewery_data"
SUCCESS_MARKER = "_SUCCESS"


def snapshot_path(base_dir: str, run_id: str, prefix: str = SNAPSHOT_PREFIX) -> str:
    """``{base}/{prefix}_{run_id}`` — run_id is the caller's timestamp string
    (the reference uses ``%Y-%m-%d-%H-%M`` in America/Sao_Paulo; any
    lexicographically-chronological id works)."""
    return os.path.join(base_dir, f"{prefix}_{run_id}")


def _resolve_snapshot(
    base_dir: str,
    prefix: str,
    require_success: bool,
    data_suffix: str | None,
    cutoff: str | None,
) -> str | None:
    """Shared committed-snapshot walk: newest folder (optionally <=
    ``cutoff``) that passes the ``_SUCCESS``/data gates, or None. ONE
    copy of the publish-gating contract so the latest and as-of readers
    can never diverge."""
    if not os.path.isdir(base_dir):
        raise FileNotFoundError(f"layer directory does not exist: {base_dir}")
    folders = sorted(
        (
            f
            for f in os.listdir(base_dir)
            if f.startswith(prefix) and (cutoff is None or f <= cutoff)
        ),
        reverse=True,
    )
    for folder in folders:
        path = os.path.join(base_dir, folder)
        if not os.path.isdir(path):
            continue
        names = os.listdir(path)
        if require_success and SUCCESS_MARKER not in names:
            continue
        if data_suffix is not None and not any(
            n.endswith(data_suffix) for n in names
        ):
            continue
        return path
    return None


def latest_snapshot(
    base_dir: str,
    prefix: str = SNAPSHOT_PREFIX,
    require_success: bool = True,
    data_suffix: str | None = None,
) -> str:
    """OP-08: newest snapshot folder that actually contains data.

    ``require_success=True`` gates on Spark's committed-output ``_SUCCESS``
    marker (the silver/gold rule); ``data_suffix='.csv'`` replicates the
    bronze rule (any page file present). Raises if nothing qualifies.
    """
    path = _resolve_snapshot(
        base_dir, prefix, require_success, data_suffix, cutoff=None
    )
    if path is None:
        raise FileNotFoundError(
            f"no valid '{prefix}_*' snapshot under {base_dir} "
            f"(require_success={require_success}, data_suffix={data_suffix})"
        )
    return path


def snapshot_as_of(
    base_dir: str,
    as_of_run_id: str,
    prefix: str = SNAPSHOT_PREFIX,
    require_success: bool = True,
    data_suffix: str | None = None,
) -> str:
    """Time travel over the snapshot layout: the newest committed
    snapshot whose run id is <= ``as_of_run_id`` — "the table as the
    pipeline published it at that moment". Works because run ids are
    lexicographically chronological (the reference's timestamp format,
    ``snapshot_path``); same ``_SUCCESS``/data gates as
    ``latest_snapshot`` (one shared walk, ``_resolve_snapshot``), so an
    uncommitted write can never be selected by a historical read either.
    With ``zorder_compact``'s rewrites this is the poor-man's Delta time
    travel: reproduce any day's gold numbers, or pin a training run's
    input to the snapshot it started from while the daily pipeline keeps
    publishing."""
    path = _resolve_snapshot(
        base_dir,
        prefix,
        require_success,
        data_suffix,
        cutoff=f"{prefix}_{as_of_run_id}",
    )
    if path is None:
        raise FileNotFoundError(
            f"no committed '{prefix}_*' snapshot at or before "
            f"{as_of_run_id!r} under {base_dir}"
        )
    return path


class SnapshotConflictError(RuntimeError):
    """Another writer published a snapshot after this writer read its
    parent — the staged delta was computed against a stale base and must
    be recomputed against the new latest snapshot, then retried."""


def _parent_run_id(path: str | None, prefix: str) -> str | None:
    return (
        None
        if path is None
        else os.path.basename(path).removeprefix(f"{prefix}_")
    )


def commit_snapshot(
    base_dir: str,
    run_id: str,
    write_fn,
    expected_parent: str | None,
    prefix: str = SNAPSHOT_PREFIX,
    lock_timeout_s: float = 60.0,
) -> str:
    """Optimistic-concurrency snapshot publish for the read-modify-write
    artifact loops (``advance_corpus_artifacts`` writers, ``scd2_merge``,
    ``run_stream_upsert_parquet`` snapshots): two overlapping runs — a
    retry racing its original is the realistic case — must not interleave
    snapshot advancement and silently lose one delta.

    Protocol:

    1. The caller reads the CURRENT latest snapshot, computes its new
       state from it, and passes that snapshot's run id as
       ``expected_parent`` (None for the first snapshot ever).
    2. ``write_fn(staging_dir)`` creates and fills the hidden staging
       dir — a Spark write does both (its default ErrorIfExists mode is
       why the dir is NOT pre-created); plain-file writers
       ``os.makedirs`` it first. A ``_SUCCESS`` marker is added if the
       writer didn't.
    3. The commit: under an ``flock``-held lock file, re-check that the
       latest committed snapshot is still ``expected_parent`` and the
       target doesn't exist, then one atomic ``os.rename`` publishes the
       staging dir. Any other outcome raises ``SnapshotConflictError``
       and the staging dir is cleaned up — the loser recomputes from the
       NEW latest (both deltas survive) and retries with a fresh,
       HIGHER-SORTING run id (enforced: a run id that doesn't sort after
       its parent would publish invisibly under the newest-first reader
       and silently lose its delta).

    The lock guards only the check+rename critical section
    (microseconds; Spark writes happen before, unlocked, so writers
    stage in parallel). flock is released by the kernel when the holder
    dies — there is no stale-lock state to break, and
    ``lock_timeout_s`` bounds only how long a waiter queues. On a
    local/NFSv4/HDFS-fuse filesystem this is correct as-is; on S3-style
    stores swap the lock+rename for the store's conditional-put (the
    protocol shape is unchanged — this function is the one place to do
    it).
    """
    import fcntl
    import shutil
    import time
    import uuid

    if expected_parent is not None and run_id <= expected_parent:
        raise ValueError(
            f"commit_snapshot: run_id {run_id!r} does not sort after the "
            f"expected parent {expected_parent!r} — readers resolve the "
            "lexicographically NEWEST snapshot, so a lower-sorting commit "
            "would publish successfully yet stay permanently invisible "
            "(and its delta would be silently lost)"
        )
    os.makedirs(base_dir, exist_ok=True)
    final = snapshot_path(base_dir, run_id, prefix)
    staging = os.path.join(
        base_dir, f".staging_{prefix}_{run_id}_{uuid.uuid4().hex[:8]}"
    )
    # the lock file is a tiny permanent sentinel per table dir, held via
    # flock: the kernel releases it when the holder dies, so there is no
    # stale-lock state and no break-the-lock race (an unlink-based
    # existence lock can be "broken" twice, letting two writers into the
    # critical section). The file is deliberately never unlinked —
    # unlinking a live flock target is the classic lock-split bug.
    lock = os.path.join(base_dir, f".{prefix}.commit_lock")
    try:
        # write_fn owns staging creation: Spark's default ErrorIfExists
        # save mode refuses a pre-created directory, so plain-file
        # writers os.makedirs(staging) themselves
        write_fn(staging)
        if not os.path.isdir(staging):
            raise ValueError(
                "commit_snapshot: write_fn produced no staging directory "
                f"at {staging}"
            )
        marker = os.path.join(staging, SUCCESS_MARKER)
        if not os.path.exists(marker):
            open(marker, "w").close()

        lock_fd = os.open(lock, os.O_CREAT | os.O_RDWR)
        try:
            deadline = time.monotonic() + lock_timeout_s
            while True:
                try:
                    fcntl.flock(lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except BlockingIOError:
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"commit lock {lock} not acquired within "
                            f"{lock_timeout_s}s"
                        ) from None
                    time.sleep(0.02)
            current = _resolve_snapshot(base_dir, prefix, True, None, None)
            current_id = _parent_run_id(current, prefix)
            if current_id != expected_parent:
                raise SnapshotConflictError(
                    f"latest snapshot is {current_id!r}, not the expected "
                    f"parent {expected_parent!r} — recompute against it "
                    "and retry"
                )
            if os.path.exists(final):
                raise SnapshotConflictError(
                    f"snapshot {run_id!r} already published — retry with "
                    "a fresh run id"
                )
            os.rename(staging, final)  # atomic publish
        finally:
            os.close(lock_fd)  # drops the flock
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return final


def next_snapshot_run(base_dir: str, prefix: str) -> tuple[str | None, str]:
    """(expected_parent, next run id) for a ``commit_snapshot`` of a
    rebuild-style artifact (the materialized text/ANN indexes): run ids
    are zero-padded integers, so lexicographic snapshot order == build
    order with no wall-clock dependence.

    Use this ONLY when the staged state is parent-independent (a full
    rebuild). A delta writer that READ a specific parent snapshot must
    derive ``expected_parent`` from that path via ``run_id_of`` — a
    second directory walk here could see a commit that landed after the
    read, and the expected-parent check would then pass against a
    parent the delta was NOT computed from (silently dropping the
    interleaved writer's delta)."""
    try:
        parent = _parent_run_id(latest_snapshot(base_dir, prefix), prefix)
    except FileNotFoundError:
        parent = None
    return parent, next_run_after(parent)


def run_id_of(snapshot_path: str, prefix: str) -> str:
    """Run id of a resolved snapshot path — the value a delta writer
    passes as ``expected_parent`` so the commit is pinned to the exact
    generation it read (see ``next_snapshot_run``). Delegates to the
    same parser ``commit_snapshot`` uses for its own parent resolution,
    so the two can never diverge on snapshot naming."""
    return _parent_run_id(snapshot_path, prefix)


def next_run_after(parent: str | None) -> str:
    """Next zero-padded integer run id after ``parent``."""
    return f"{(int(parent) if parent else 0) + 1:012d}"


def commit_snapshot_with_retry(
    base_dir: str,
    prefix: str,
    write_fn,
    attempts: int = 3,
    keep_snapshots: int | None = None,
) -> str:
    """``commit_snapshot`` for PARENT-INDEPENDENT publishes (full
    rebuilds): on a lost race the staged state is still valid against
    the new parent, so just re-resolve and retry with a fresh higher
    run id. Delta writers must NOT use this — their state depends on
    the parent they read, so a conflict means recompute, not retry."""
    for _attempt in range(attempts):
        parent, run_id = next_snapshot_run(base_dir, prefix)
        try:
            path = commit_snapshot(
                base_dir, run_id, write_fn, expected_parent=parent,
                prefix=prefix,
            )
            break
        except SnapshotConflictError:
            continue
    else:
        raise SnapshotConflictError(
            f"lost the '{prefix}' commit race {attempts} times under "
            f"{base_dir}"
        )
    if keep_snapshots:
        prune_snapshots(base_dir, prefix, keep_snapshots)
    return path


def link_parquet_files(src_dir: str, dst_dir: str) -> int:
    """Hard-link every data file of a parquet directory into ``dst_dir``
    (markers and hidden files skipped): byte-zero reuse of an existing
    generation's files inside a new staged snapshot. Part-file names
    carry task UUIDs, so linked and freshly written files cannot
    collide.

    Filesystems without hard-link support (NFS exports with links
    disabled, FUSE object-store mounts — EPERM/ENOTSUP/EXDEV) fall
    back to a byte copy per file: the delta append/compaction paths
    then work anywhere ``commit_snapshot``'s rename protocol does,
    just without the zero-byte reuse."""
    os.makedirs(dst_dir, exist_ok=True)
    n = 0
    for name in os.listdir(src_dir):
        if name.startswith(("_", ".")):
            continue
        _link_or_copy(
            os.path.join(src_dir, name), os.path.join(dst_dir, name)
        )
        n += 1
    return n


def _link_or_copy(src: str, dst: str) -> None:
    """Hard-link ``src`` to ``dst``, falling back to a byte copy on
    capability errors. Filesystems report missing hard-link support
    with a zoo of errnos (EPERM, ENOTSUP, EXDEV, but also EINVAL on
    FAT-backed mounts and ENOSYS on some SMB/NFS exports), so the
    fallback DENYLISTS the errnos that always mean a caller bug
    instead of allowlisting capability ones: EEXIST is a double-staged
    destination and ENOENT/ENOTDIR/EISDIR are path mistakes — those
    stay loud failures rather than a silent copy-over; everything
    else degrades to copy2, keeping the docstring promise that the
    staging paths work anywhere the rename protocol does."""
    import errno
    import shutil

    try:
        os.link(src, dst)
    except OSError as e:
        if e.errno in (
            errno.EEXIST,
            errno.ENOENT,
            errno.ENOTDIR,
            errno.EISDIR,
        ):
            raise
        shutil.copy2(src, dst)


def prune_snapshots(base_dir: str, prefix: str, keep: int) -> None:
    """Drop all but the newest ``keep`` committed snapshots — bounds
    disk growth across repeated rebuilds of a derived artifact.

    Pruning does NOT synchronize with readers: a reader that resolved
    generation N and is still scanning (or lazily holds a DataFrame
    over it) fails with FileNotFoundError if ``keep`` newer publishes
    land first and N is deleted. The default ``keep=2`` in the index
    builders tolerates one overlapping rebuild; in a serving deployment
    set ``keep`` above the number of publishes that can occur within
    the longest reader's lifetime (or ``None`` to keep all — required
    if readers pin old snapshots via ``snapshot_as_of``) and compact
    offline."""
    import shutil

    snaps = sorted(
        d for d in os.listdir(base_dir) if d.startswith(f"{prefix}_")
    )
    for d in snaps[:-keep] if keep else []:
        shutil.rmtree(os.path.join(base_dir, d), ignore_errors=True)


def write_layer(
    df: DataFrame,
    path: str,
    partition_keys: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """OP-06/OP-07: partitioned columnar sink.

    Repartitions by the partition keys first so each Hive partition is
    produced by a single task (small-file fix, SURVEY.md §4.3-2). With AQE
    enabled, skewed partitions are still split at runtime.
    """
    writer = df
    if partition_keys:
        writer = df.repartition(*partition_keys)
    w = writer.write.mode(mode).format(fmt)
    if partition_keys:
        w = w.partitionBy(*partition_keys)
    w.save(path)
    # Dynamic-partition overwrite commits without a _SUCCESS marker; the
    # marker is this engine's snapshot-validity contract (OP-08), so write it
    # explicitly once the save has committed. (Local FS here; on object
    # stores the equivalent is the job-commit marker of the committer in use.)
    marker = os.path.join(path, SUCCESS_MARKER)
    if not os.path.exists(marker):
        open(marker, "w").close()


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under a path via the Hadoop FileSystem API — works for
    any scheme Spark can read (file://, hdfs://, s3a://), no driver-side
    os.walk that would break off-local-disk."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(jpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files; returns the file
    count. The operational fix for the 100 TB failure mode streaming and
    per-partition sinks create — millions of KB-sized files whose
    open/list overhead dwarfs the scan (every NameNode/S3-LIST call is a
    file, every task starts with a footer read).

    With ``sort_cols``, rows are range-partitioned and sorted within each
    output file on those columns — parquet then records tight min/max
    stats per row group, so later range predicates on the sort key prune
    whole files (poor-man's clustering; same intent as Delta OPTIMIZE
    ZORDER on one dimension).

    ``dst`` must differ from ``src``: overwrite-in-place would delete the
    input mid-read. Swap via the snapshot/latest_snapshot contract."""
    import math

    def norm(p: str) -> str:
        # abspath would mangle URI schemes (s3a://...); normalize local
        # paths only, trim trailing slashes on the rest
        return p.rstrip("/") if "://" in p else os.path.abspath(p)

    if norm(dst) == norm(src):
        raise ValueError("compact_parquet: dst must differ from src")
    n_files = max(
        1, math.ceil(dir_bytes(spark, src) / target_file_bytes)
    )
    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    return n_files


def add_zorder_key(
    df: DataFrame,
    dims: list[str],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append a Morton (Z-order) key interleaving ``dims`` — integer
    columns (pre-quantize money/decimals exactly, e.g. cents) scaled to
    ``[0, 2^bits)`` against their GLOBAL min/max, bits interleaved so
    rows close in every dimension get close keys.

    The bounds are a broadcast 1-row aggregate (one extra pass over the
    scan's min/max — at 100 TB, read them from table statistics
    instead); scaling and interleaving are pure int64 expressions, so
    the key is deterministic and engine-portable."""
    from inbev_data_engineering_case_spark.functions import (
        bit_interleave,
        morton_bucket_expr,
    )

    aggs = []
    for c in dims:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs)
    buckets = [
        morton_bucket_expr(c, f"_lo_{c}", f"_hi_{c}", bits) for c in dims
    ]
    drop = [f"_lo_{c}" for c in dims] + [f"_hi_{c}" for c in dims]
    return (
        df.join(F.broadcast(bounds))
        .withColumn(key_col, bit_interleave(buckets, bits))
        .drop(*drop)
    )


def zorder_compact(
    spark: SparkSession,
    src: str,
    dst: str,
    dims: list[str],
    bits: int = 16,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Multi-dimensional clustering rewrite (the intent of Delta
    OPTIMIZE ZORDER): range-partition and sort the table by its Morton
    key, so parquet min/max stats stay tight on EVERY interleaved
    dimension and a selective predicate on any of them prunes whole
    files — ``compact_parquet``'s single-key clustering covers one
    dimension; this covers d of them at ~2^d coarser granularity per
    dim. Returns the output file count."""
    import math

    if os.path.abspath(dst) == os.path.abspath(src):
        raise ValueError("zorder_compact: dst must differ from src")
    n_files = max(1, math.ceil(dir_bytes(spark, src) / target_file_bytes))
    df = add_zorder_key(spark.read.parquet(src), dims, bits)
    (
        df.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(dst)
    )
    return n_files


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots of the same table:
    returns ``key_cols + (change)`` with change ∈ {insert, update,
    delete} — the feed an incremental downstream (gold refresh, index
    update, cache invalidation) consumes instead of re-reading the whole
    new snapshot.

    One full-outer shuffle join on the keys; change detection compares a
    single xxhash64 over ``compare_cols`` (default: all non-key columns,
    sorted for stability), so the exchange carries key + 8-byte hash per
    side regardless of row width — the same narrow-shuffle discipline as
    exact dedup. Unchanged rows are filtered out before anything
    downstream."""
    compare_cols = compare_cols or sorted(
        c for c in new.columns if c not in key_cols
    )

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        cols = [F.col(c).cast("string") for c in compare_cols]
        return df.select(
            *key_cols, F.xxhash64(*cols).alias(f"{alias}_h")
        )

    joined = hashed(old, "old").join(
        hashed(new, "new"), on=key_cols, how="full_outer"
    )
    change = (
        F.when(F.col("old_h").isNull(), F.lit("insert"))
        .when(F.col("new_h").isNull(), F.lit("delete"))
        .when(F.col("old_h") != F.col("new_h"), F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def publish_view(spark: SparkSession, df: DataFrame, name: str) -> list[str]:
    """OP-09: register as a global temp view and return the catalog listing
    (reference gold_data_aggregation.py:53-56)."""
    df.createOrReplaceGlobalTempView(name)
    return [t.name for t in spark.catalog.listTables("global_temp")]


def delete_rows(
    spark: SparkSession,
    src: str,
    dst: str,
    key_col: str,
    keys: list,
) -> dict:
    """Surgical (GDPR-style) key deletion: publish a new snapshot in
    which only the files that CAN contain a target key are rewritten —
    every other file is hard-linked (fallback: copied) byte-identical.

    At 100 TB this is the difference between a full-table rewrite and
    touching a handful of files: each parquet footer's min/max stats for
    ``key_col`` are checked against the sorted key list (files without
    stats are conservatively rewritten), so on a table clustered by the
    key (``compact_parquet(sort_cols=...)`` / ``zorder_compact``) a
    deletion request for k users rewrites O(k) files. The rewrite path
    itself is one Spark filter job over just the affected files; the
    output lands in ``dst`` next to the linked files and gets a
    ``_SUCCESS`` marker, so ``latest_snapshot`` / ``snapshot_as_of``
    publish-gating applies unchanged (the source snapshot stays intact
    for time travel — deletes COMPACT history only when old snapshots
    are retired).

    Returns ``{"files_total", "files_rewritten", "rows_deleted"}``.

    Replay-safe: the snapshot is assembled in a scratch directory and
    published with one atomic rename — a retried job after a mid-run
    crash finds either no ``dst`` (and rebuilds from scratch; stale
    scratch dirs are reaped first) or the complete published snapshot
    (and fails fast on the rename instead of appending duplicates).
    """
    import bisect
    import glob
    import shutil

    import pyarrow.parquet as pq

    # validate the request before ANY filesystem work: an empty key list
    # would reach .isin() with zero arguments (analysis error after the
    # scratch dir exists), and a None key would make sorted() raise on
    # the mixed-type compare — and can never match anyway (NULL-keyed
    # rows are explicitly preserved below)
    keys = list(keys)
    if not keys:
        raise ValueError("delete_rows: keys is empty — nothing to delete")
    if any(k is None for k in keys):
        raise ValueError(
            "delete_rows: keys contains None — NULL keys never match a "
            "deletion request (NULL-keyed rows are preserved); drop them "
            "from the request"
        )

    # a trailing slash would break the atomic rename publish (ENOENT on
    # Linux for a nonexistent "dir/" rename target)
    dst = dst.rstrip("/")
    if os.path.abspath(dst) == os.path.abspath(src):
        raise ValueError("delete_rows: dst must differ from src")
    if os.path.exists(dst):
        raise FileExistsError(
            f"delete_rows: {dst} already exists — snapshots are immutable "
            "(a completed run published it; point a retry at a new dst or "
            "remove the old snapshot explicitly)"
        )
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {src}")
    key_list = sorted(set(keys))
    file_rows: dict[str, int] = {}

    def may_contain(path: str) -> bool:
        md = pq.ParquetFile(path).metadata
        file_rows[path] = md.num_rows  # cache: no second footer read
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            stats = None
            for ci in range(group.num_columns):
                col = group.column(ci)
                if col.path_in_schema == key_col:
                    stats = col.statistics
                    break
            if stats is None or not stats.has_min_max:
                return True  # no stats -> must assume it matches
            lo, hi = stats.min, stats.max
            i = bisect.bisect_left(key_list, lo)
            if i < len(key_list) and key_list[i] <= hi:
                return True
        return False

    touched = [f for f in files if may_contain(f)]
    touched_set = set(touched)
    untouched = [f for f in files if f not in touched_set]

    # build in a scratch dir; publish with one atomic rename at the end
    building = dst + "._building"
    shutil.rmtree(building, ignore_errors=True)  # reap a crashed attempt
    os.makedirs(building)
    for f in untouched:
        _link_or_copy(f, os.path.join(building, os.path.basename(f)))

    rows_deleted = 0
    if touched:
        before = sum(file_rows[f] for f in touched)
        # NULL-safe: ~isin(...) is NULL (dropped by filter) for NULL
        # keys, which would silently delete every anonymous row in a
        # rewritten file — keep NULL-keyed rows explicitly
        kept = spark.read.parquet(*touched).filter(
            ~F.col(key_col).isin(*key_list) | F.col(key_col).isNull()
        )
        tmp = dst + "._delete_tmp"
        kept.write.mode("overwrite").parquet(tmp)
        after = 0
        for i, f in enumerate(
            sorted(glob.glob(os.path.join(tmp, "*.parquet")))
        ):
            after += pq.ParquetFile(f).metadata.num_rows
            os.replace(
                f,
                os.path.join(
                    building, f"rewrite-{i:05d}-{os.path.basename(f)}"
                ),
            )
        shutil.rmtree(tmp, ignore_errors=True)
        rows_deleted = before - after
    open(os.path.join(building, SUCCESS_MARKER), "w").close()
    os.rename(building, dst)  # atomic publish
    return {
        "files_total": len(files),
        "files_rewritten": len(touched),
        "rows_deleted": rows_deleted,
    }
