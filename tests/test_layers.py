"""Snapshot catalog (OP-08) unit tests: latest-folder resolution,
_SUCCESS gating, data-suffix gating, and failure when nothing qualifies."""

from __future__ import annotations

import os

import pytest

from inbev_data_engineering_case_spark.layers import (
    latest_snapshot,
    snapshot_path,
    write_layer,
)


def mkdir_snapshot(base, run_id, files=()):
    p = snapshot_path(str(base), run_id)
    os.makedirs(p, exist_ok=True)
    for f in files:
        open(os.path.join(p, f), "w").close()
    return p


def test_latest_prefers_newest_valid(tmp_path):
    mkdir_snapshot(tmp_path, "2024-01-01-00-00", ["_SUCCESS", "x.parquet"])
    newest = mkdir_snapshot(tmp_path, "2024-06-01-00-00", ["_SUCCESS", "y.parquet"])
    mkdir_snapshot(tmp_path, "2024-12-01-00-00")  # newer but no _SUCCESS
    assert latest_snapshot(str(tmp_path)) == newest


def test_latest_bronze_rule_csv_suffix(tmp_path):
    mkdir_snapshot(tmp_path, "2024-01-01-00-00", ["page_0.csv"])
    newest = mkdir_snapshot(tmp_path, "2024-02-01-00-00", ["page_0.csv"])
    mkdir_snapshot(tmp_path, "2024-03-01-00-00", ["notes.txt"])  # no csv
    got = latest_snapshot(str(tmp_path), require_success=False, data_suffix=".csv")
    assert got == newest


def test_latest_raises_when_empty(tmp_path):
    mkdir_snapshot(tmp_path, "2024-01-01-00-00")  # invalid: no marker
    with pytest.raises(FileNotFoundError):
        latest_snapshot(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        latest_snapshot(str(tmp_path / "missing"))


def test_write_layer_partitions_and_success(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], ["country", "state", "v"]
    )
    out = str(tmp_path / "out")
    write_layer(df, out, ["country", "state"])
    names = os.listdir(out)
    assert "_SUCCESS" in names
    assert {"country=a", "country=b"} <= set(names)
    # Small-file fix: repartition by keys → one file per leaf partition.
    leaf = os.path.join(out, "country=a", "state=x")
    assert len([f for f in os.listdir(leaf) if f.endswith(".parquet")]) == 1
    back = spark.read.parquet(out)
    assert back.count() == 3


def test_compact_parquet_reduces_files_and_keeps_rows(spark, tmp_path):
    from inbev_data_engineering_case_spark.layers import (
        compact_parquet,
        dir_bytes,
    )

    src = str(tmp_path / "fragmented")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(64).write.parquet(src)  # the streaming-sink failure mode
    n_small = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    )
    assert n_small == 64

    dst = str(tmp_path / "compacted")
    total = dir_bytes(spark, src)
    n = compact_parquet(spark, src, dst, target_file_bytes=total // 2)
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == n <= 3  # ceil(total / (total//2)) = 2 (3 on rounding)
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id)").first()[0] == df.selectExpr(
        "sum(id)"
    ).first()[0]

    # sorted variant: each output file covers a disjoint id range -> later
    # range predicates prune whole files via parquet min/max stats
    dst2 = str(tmp_path / "clustered")
    n2 = compact_parquet(
        spark, src, dst2, target_file_bytes=total // 2, sort_cols=["id"]
    )
    per_file = [
        (spark.read.parquet(f"{dst2}/{f}").selectExpr(
            "min(id)", "max(id)"
        ).first())
        for f in os.listdir(dst2) if f.endswith(".parquet")
    ]
    spans = sorted((lo, hi) for lo, hi in per_file)
    assert all(
        prev_hi < lo for (_, prev_hi), (lo, _) in zip(spans, spans[1:])
    )
    assert n2 == len(spans)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="dst must differ"):
        compact_parquet(spark, src, src)


def test_snapshot_diff_cdc_known_answer(spark):
    from inbev_data_engineering_case_spark.layers import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged -> absent from the diff
         (2, "b", 21.0),          # value update
         (4, "D", 40.0),          # non-key column update
         (5, "e", 50.0)],         # insert; 3 deleted
        "k long, name string, v double",
    )
    diff = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, key_cols=["k"]).collect()
    }
    assert diff == {2: "update", 3: "delete", 4: "update", 5: "insert"}

    # compare_cols narrows change detection: name-only edits vanish
    vdiff = {
        r["k"]: r["change"]
        for r in snapshot_diff(
            old, new, key_cols=["k"], compare_cols=["v"]
        ).collect()
    }
    assert vdiff == {2: "update", 3: "delete", 5: "insert"}


def test_snapshot_as_of_time_travel(tmp_path):
    from inbev_data_engineering_case_spark.layers import snapshot_as_of

    jan = mkdir_snapshot(tmp_path, "2024-01-01-00-00", ["_SUCCESS", "a.parquet"])
    mkdir_snapshot(tmp_path, "2024-03-01-00-00")  # uncommitted (no _SUCCESS)
    jun = mkdir_snapshot(tmp_path, "2024-06-01-00-00", ["_SUCCESS", "b.parquet"])

    # historical read: the March cut resolves to January — the newest
    # COMMITTED snapshot at that moment (the uncommitted one is skipped)
    assert snapshot_as_of(str(tmp_path), "2024-03-15-00-00") == jan
    # an as-of on the exact run id is inclusive
    assert snapshot_as_of(str(tmp_path), "2024-01-01-00-00") == jan
    # a future as-of sees the latest
    assert snapshot_as_of(str(tmp_path), "2025-01-01-00-00") == jun
    # before the first commit: nothing existed
    with pytest.raises(FileNotFoundError):
        snapshot_as_of(str(tmp_path), "2023-12-31-23-59")


def test_delete_rows_rewrites_only_matching_files(spark, tmp_path):
    """Surgical delete: on a key-clustered table, deleting a few keys
    rewrites only the file(s) whose min/max span them — the other files
    land byte-identical (hard-linked), the keys are gone, and everything
    else survives."""
    import filecmp
    import glob

    from inbev_data_engineering_case_spark.layers import (
        compact_parquet,
        delete_rows,
    )

    df = spark.range(0, 1000).selectExpr(
        "id AS user_id", "id * 2 AS value"
    )
    raw = str(tmp_path / "raw")
    df.write.parquet(raw)
    src = str(tmp_path / "clustered")
    # tiny target -> several files, disjoint user_id spans per file
    compact_parquet(spark, raw, src, target_file_bytes=4096,
                    sort_cols=["user_id"])
    files_before = sorted(glob.glob(src + "/*.parquet"))
    assert len(files_before) > 2

    dst = str(tmp_path / "deleted")
    stats = delete_rows(spark, src, dst, "user_id", [3, 7])
    assert stats["rows_deleted"] == 2
    assert stats["files_total"] == len(files_before)
    # keys 3 and 7 sit in the low span: one file rewritten (maybe two if
    # a span boundary splits them), the rest linked byte-identical
    assert stats["files_rewritten"] < len(files_before)
    linked = [
        f for f in glob.glob(dst + "/*.parquet")
        if not os.path.basename(f).startswith("rewrite-")
    ]
    assert linked, "expected untouched files to be carried over"
    for f in linked:
        twin = os.path.join(src, os.path.basename(f))
        assert filecmp.cmp(f, twin, shallow=False)

    out = spark.read.parquet(dst)
    assert out.count() == 998
    assert out.filter("user_id IN (3, 7)").count() == 0
    # remaining data intact, not just counts
    assert out.agg({"value": "sum"}).first()[0] == sum(
        i * 2 for i in range(1000) if i not in (3, 7)
    )


def test_delete_rows_preserves_null_keyed_rows(spark, tmp_path):
    """NULL-safety regression: ~isin() is NULL for NULL keys, which a
    filter drops — anonymous rows in a rewritten file must survive a
    delete that doesn't name them."""
    from inbev_data_engineering_case_spark.layers import delete_rows

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 30), (None, 40), (7, 70)],
        "user_id long, value long",
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    dst = str(tmp_path / "dst")
    stats = delete_rows(spark, src, dst, "user_id", [7])
    assert stats["rows_deleted"] == 1
    out = spark.read.parquet(dst)
    assert out.count() == 4
    assert out.filter("user_id IS NULL").count() == 2


def test_delete_rows_refuses_replay_into_published_snapshot(spark, tmp_path):
    """Replay safety: a retry into an already-published dst must fail
    fast instead of appending duplicate rewrite files; a crashed
    attempt's scratch dir is reaped and rebuilt."""
    from inbev_data_engineering_case_spark.layers import delete_rows

    src = str(tmp_path / "src")
    spark.range(0, 100).selectExpr("id AS user_id").coalesce(1).write.parquet(
        src
    )
    dst = str(tmp_path / "dst")
    # simulate a crashed earlier attempt: stale scratch dir exists
    os.makedirs(dst + "._building")
    open(dst + "._building/leftover.parquet", "w").close()
    stats = delete_rows(spark, src, dst, "user_id", [5])
    assert stats["rows_deleted"] == 1
    out = spark.read.parquet(dst)
    assert out.count() == 99  # stale scratch reaped, not included
    # second run into the published snapshot: refuse, leave it intact
    with pytest.raises(FileExistsError):
        delete_rows(spark, src, dst, "user_id", [5])
    assert spark.read.parquet(dst).count() == 99


def test_delete_rows_accepts_trailing_slash_dst(spark, tmp_path):
    from inbev_data_engineering_case_spark.layers import delete_rows

    src = str(tmp_path / "src")
    spark.range(0, 50).selectExpr("id AS user_id").coalesce(1).write.parquet(
        src
    )
    dst = str(tmp_path / "out") + "/"  # trailing slash must not break publish
    stats = delete_rows(spark, src, dst, "user_id", [1])
    assert stats["rows_deleted"] == 1
    assert spark.read.parquet(dst).count() == 49


def test_delete_rows_rejects_empty_and_null_keys(spark, tmp_path):
    """Empty / None-bearing key lists fail up front with a clear error,
    before any scratch directory is created — not deep inside Spark with
    a zero-arg isin() analysis error or a mixed-type sorted() TypeError."""
    import os

    import pytest

    from inbev_data_engineering_case_spark.layers import delete_rows

    src = str(tmp_path / "src")
    spark.range(0, 10).selectExpr("id AS user_id").coalesce(1).write.parquet(
        src
    )
    dst = str(tmp_path / "out")
    with pytest.raises(ValueError, match="empty"):
        delete_rows(spark, src, dst, "user_id", [])
    with pytest.raises(ValueError, match="None"):
        delete_rows(spark, src, dst, "user_id", [3, None])
    # no scratch or partial output left behind by the rejected requests
    assert not os.path.exists(dst)
    assert not os.path.exists(dst + "._building")


# ---------------------------------------------------------------------------
# optimistic-concurrency snapshot commit
# ---------------------------------------------------------------------------


def _read_corpus(base):
    """Current corpus state: the id set stored in the latest snapshot."""
    from inbev_data_engineering_case_spark.layers import (
        SNAPSHOT_PREFIX,
        _parent_run_id,
        _resolve_snapshot,
    )

    latest = _resolve_snapshot(str(base), SNAPSHOT_PREFIX, True, None, None)
    if latest is None:
        return None, set()
    with open(os.path.join(latest, "ids.txt")) as f:
        return _parent_run_id(latest, SNAPSHOT_PREFIX), {
            int(x) for x in f.read().split()
        }


def _advance(base, run_id, delta, barrier=None):
    """One read-modify-write advance: read latest, union the delta,
    commit against the observed parent. Returns the conflict if it lost."""
    from inbev_data_engineering_case_spark.layers import (
        SnapshotConflictError,
        commit_snapshot,
    )

    parent, ids = _read_corpus(base)
    merged = ids | set(delta)
    if barrier is not None:
        barrier.wait()  # both writers observed the SAME parent

    def write(staging):
        os.makedirs(staging)  # write_fn owns staging creation
        with open(os.path.join(staging, "ids.txt"), "w") as f:
            f.write(" ".join(str(x) for x in sorted(merged)))

    try:
        commit_snapshot(str(base), run_id, write, parent)
        return None
    except SnapshotConflictError as e:
        return e


def test_commit_snapshot_exactly_one_winner_loser_retry_keeps_both(tmp_path):
    """Two concurrent advances race from the same parent: exactly one
    publishes; the loser gets SnapshotConflictError, recomputes against
    the winner's snapshot, and its retry preserves BOTH deltas. No
    staging or lock litter survives."""
    import threading

    assert _advance(tmp_path, "2024-01-01-00-00", {1, 2}) is None  # seed

    barrier = threading.Barrier(2)
    results = {}

    def run(name, run_id, delta):
        results[name] = _advance(tmp_path, run_id, delta, barrier)

    t_a = threading.Thread(target=run, args=("a", "2024-01-02-00-00", {10}))
    t_b = threading.Thread(target=run, args=("b", "2024-01-02-00-01", {20}))
    t_a.start(); t_b.start(); t_a.join(); t_b.join()

    losers = [k for k, v in results.items() if v is not None]
    assert len(losers) == 1  # exactly one winner, one conflict
    _parent, ids = _read_corpus(tmp_path)
    winner_delta = {10} if losers == ["b"] else {20}
    assert ids == {1, 2} | winner_delta  # loser's delta NOT silently lost

    # loser retries from the new latest with a fresh run id
    loser_delta = {20} if losers == ["b"] else {10}
    assert _advance(tmp_path, "2024-01-02-00-05", loser_delta) is None
    _parent, ids = _read_corpus(tmp_path)
    assert ids == {1, 2, 10, 20}  # both deltas survived the race

    # no staging litter; the flock sentinel is the one deliberate dotfile
    litter = [n for n in os.listdir(tmp_path) if n.startswith(".")]
    assert litter == [".brewery_data.commit_lock"]


def test_commit_snapshot_rejects_duplicate_run_id_and_breaks_stale_lock(
    tmp_path,
):
    """A non-advancing run id is rejected up front (it would publish
    invisibly under the newest-first reader), an uncommitted leftover
    dir with the target name conflicts instead of being overwritten, a
    lock file left by a dead process doesn't block (flock died with it),
    and a lock HELD by a live writer times out rather than deadlocking."""
    import fcntl

    from inbev_data_engineering_case_spark.layers import (
        SNAPSHOT_PREFIX,
        SnapshotConflictError,
        commit_snapshot,
        snapshot_path,
    )

    assert _advance(tmp_path, "2024-01-01-00-00", {1}) is None
    # replayed / lower-sorting run id: rejected before any work
    with pytest.raises(ValueError, match="sort after"):
        commit_snapshot(
            str(tmp_path),
            "2024-01-01-00-00",
            lambda staging: None,
            "2024-01-01-00-00",
        )
    # an uncommitted leftover dir with the target name conflicts
    os.makedirs(snapshot_path(str(tmp_path), "2024-01-02-00-00"))
    with pytest.raises(SnapshotConflictError, match="already published"):
        commit_snapshot(
            str(tmp_path),
            "2024-01-02-00-00",
            lambda staging: os.makedirs(staging),
            "2024-01-01-00-00",
        )

    # a lock FILE left behind by a dead process carries no flock: the
    # next commit proceeds immediately
    lock = os.path.join(tmp_path, f".{SNAPSHOT_PREFIX}.commit_lock")
    open(lock, "w").close()
    assert _advance(tmp_path, "2024-01-03-00-00", {2}) is None
    _parent, ids = _read_corpus(tmp_path)
    assert ids == {1, 2}

    # a lock HELD by a live process makes a second writer time out
    holder = os.open(lock, os.O_RDWR)
    fcntl.flock(holder, fcntl.LOCK_EX)
    try:
        with pytest.raises(TimeoutError, match="commit lock"):
            commit_snapshot(
                str(tmp_path),
                "2024-01-04-00-00",
                lambda staging: os.makedirs(staging),
                "2024-01-03-00-00",
                lock_timeout_s=0.3,
            )
    finally:
        os.close(holder)
    # released: the same commit succeeds now
    assert _advance(tmp_path, "2024-01-05-00-00", {3}) is None


def test_link_parquet_files_falls_back_to_copy(tmp_path, monkeypatch):
    """Filesystems without hard-link support (FUSE object-store mounts,
    NFS with links disabled) raise OSError from os.link; the delta
    append/compaction paths must then degrade to a byte copy rather
    than fail where commit_snapshot's rename protocol itself works.
    Simulated by making os.link raise EPERM."""
    import errno

    from inbev_data_engineering_case_spark.layers import link_parquet_files

    src = tmp_path / "src"
    src.mkdir()
    (src / "part-000.parquet").write_bytes(b"payload")
    (src / "_SUCCESS").write_bytes(b"")
    (src / ".hidden").write_bytes(b"x")

    def deny_link(a, b, **kw):
        raise OSError(errno.EPERM, "hard links not supported")

    monkeypatch.setattr(os, "link", deny_link)
    dst = tmp_path / "dst"
    n = link_parquet_files(str(src), str(dst))
    assert n == 1  # markers and hidden files still skipped
    assert (dst / "part-000.parquet").read_bytes() == b"payload"
    # copies, not links: distinct inodes
    assert (
        os.stat(dst / "part-000.parquet").st_ino
        != os.stat(src / "part-000.parquet").st_ino
    )

    # EEXIST is NOT a capability gap — a double-staged destination is
    # a staging bug and must stay a loud failure, not a silent
    # copy-over (the fallback is restricted to the no-link errnos)
    monkeypatch.undo()
    dst2 = tmp_path / "dst2"
    link_parquet_files(str(src), str(dst2))
    with pytest.raises(OSError):
        link_parquet_files(str(src), str(dst2))
