"""Snapshot/time-travel catalog tier: commit protocol, as-of reads,
rollback lineage, vacuum retention, and crash/corruption loudness."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mapreducego_spark.sources.snapshots import (
    commit_snapshot,
    current_version,
    merge_into_snapshot,
    read_snapshot,
    rollback,
    snapshots,
    vacuum,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_commit_read_and_listing_round_trip(spark, tmp_path):
    table = str(tmp_path / "t")
    assert current_version(table) is None
    v0 = commit_snapshot(_mk(spark, [(1, "a"), (2, "b")]), table)
    v1 = commit_snapshot(_mk(spark, [(1, "a2"), (2, "b"), (3, "c")]), table)
    assert (v0, v1) == (0, 1)
    assert current_version(table) == 1
    assert {r["k"]: r["val"] for r in read_snapshot(spark, table).collect()} \
        == {1: "a2", 2: "b", 3: "c"}
    # as-of v0 is the ORIGINAL table, untouched by the later commit
    assert {r["k"]: r["val"]
            for r in read_snapshot(spark, table, 0).collect()} \
        == {1: "a", 2: "b"}
    log = snapshots(table)
    assert [(e["action"], e["version"], e["parent"]) for e in log] == [
        ("commit", 0, -1), ("commit", 1, 0),
    ]
    with pytest.raises(ValueError, match="never committed"):
        read_snapshot(spark, table, 9)


def test_rollback_preserves_history_and_sets_lineage(spark, tmp_path):
    table = str(tmp_path / "t")
    commit_snapshot(_mk(spark, [(1, "a")]), table)             # v0
    commit_snapshot(_mk(spark, [(1, "b")]), table)             # v1
    rollback(table, 0)                                         # seq 2
    assert current_version(table) == 0
    assert read_snapshot(spark, table).collect()[0]["val"] == "a"
    # v1 stays readable after the rollback — history is not destroyed
    assert read_snapshot(spark, table, 1).collect()[0]["val"] == "b"
    v3 = commit_snapshot(_mk(spark, [(1, "c")]), table)        # seq/v 3
    log = snapshots(table)
    assert log[2]["action"] == "rollback" and log[2]["to"] == 0
    assert log[3]["parent"] == 0  # lineage shows the rollback
    assert v3 == 3  # the rollback consumed sequence 2
    with pytest.raises(ValueError, match="uncommitted"):
        rollback(table, 2)


def test_merge_into_snapshot_is_update_or_insert(spark, tmp_path):
    table = str(tmp_path / "t")
    commit_snapshot(_mk(spark, [(1, "a"), (2, "b")]), table)
    merge_into_snapshot(
        spark, table, _mk(spark, [(2, "B"), (3, "C")]), "k"
    )
    assert {r["k"]: r["val"] for r in read_snapshot(spark, table).collect()} \
        == {1: "a", 2: "B", 3: "C"}


def test_vacuum_drops_old_versions_loudly_never_current(spark, tmp_path):
    table = str(tmp_path / "t")
    for i in range(4):
        commit_snapshot(_mk(spark, [(1, f"v{i}")]), table)
    removed = vacuum(table, keep_last=2)
    assert removed == [0, 1]
    with pytest.raises(ValueError, match="vacuumed"):
        read_snapshot(spark, table, 0)
    with pytest.raises(ValueError, match="vacuumed"):
        rollback(table, 1)
    # survivors still read; the vacuum is itself a logged action
    assert read_snapshot(spark, table, 2).collect()[0]["val"] == "v2"
    assert snapshots(table)[-1]["action"] == "vacuum"
    # rollback then vacuum: the now-OLD current version is always
    # kept (it is outside the newest-1 window yet survives), and the
    # newest version survives by the retention window itself
    rollback(table, 2)
    removed = vacuum(table, keep_last=1)
    assert removed == []
    assert read_snapshot(spark, table).collect()[0]["val"] == "v2"
    assert read_snapshot(spark, table, 3).collect()[0]["val"] == "v3"
    # a later commit moves the window: now both old versions drop
    commit_snapshot(_mk(spark, [(1, "v6")]), table)
    assert sorted(vacuum(table, keep_last=1)) == [2, 3]
    assert read_snapshot(spark, table).collect()[0]["val"] == "v6"
    with pytest.raises(ValueError, match=">= 1"):
        vacuum(table, keep_last=0)


def test_crash_mid_commit_leaves_table_readable_and_retry_clean(
    spark, tmp_path
):
    """The commit order is data -> log -> pointer: simulate a crash
    after the data write (orphan v1 dir, no log entry, pointer on
    v0). Readers must still see v0; the retried commit must reuse
    sequence 1, overwrite the orphan, and leave a consistent log."""
    table = str(tmp_path / "t")
    commit_snapshot(_mk(spark, [(1, "a")]), table)
    # crash: data dir for the next version exists, log/pointer do not
    _mk(spark, [(1, "PARTIAL")]).write.parquet(os.path.join(table, "v1"))
    assert current_version(table) == 0
    assert read_snapshot(spark, table).collect()[0]["val"] == "a"
    assert len(snapshots(table)) == 1  # orphan is invisible to the log
    with pytest.raises(ValueError, match="never committed"):
        read_snapshot(spark, table, 1)
    # retry overwrites the orphan under the same sequence number
    v = commit_snapshot(_mk(spark, [(1, "b")]), table)
    assert v == 1
    assert read_snapshot(spark, table, 1).collect()[0]["val"] == "b"


def test_log_gap_and_corrupt_pointer_refuse(spark, tmp_path):
    table = str(tmp_path / "t")
    for i in range(3):
        commit_snapshot(_mk(spark, [(1, f"v{i}")]), table)
    os.remove(os.path.join(table, "_LOG", "00000001.json"))
    with pytest.raises(ValueError, match="log gap"):
        snapshots(table)
    table2 = str(tmp_path / "t2")
    commit_snapshot(_mk(spark, [(1, "a")]), table2)
    with open(os.path.join(table2, "_CURRENT"), "w") as f:
        f.write("garbage")
    with pytest.raises(ValueError, match="corrupt _CURRENT"):
        current_version(table2)


def test_snapshot_time_travel_entry_versions_and_lineage(spark, sf_dir):
    """The registry entry end to end: versions [0,1,2,4] (3 is the
    rollback's sequence number), v4's parent is 1, and the v4 state
    reflects u3 applied to v1 — not to v2."""
    from mapreducego_spark.sources.snapshots import snapshot_time_travel

    rows = snapshot_time_travel(spark, sf_dir).collect()
    versions = sorted({r["version"] for r in rows})
    assert versions == [0, 1, 2, 4]
    parents = {r["version"]: r["parent"] for r in rows}
    assert parents == {0: -1, 1: 0, 2: 1, 4: 1}
    # v4 carries X1 leftovers only on keys %10==0 that are NOT %5==0
    # — there are none (10 | k implies 5 | k), so X1 must vanish at v4
    v4_status = {r["status"] for r in rows if r["version"] == 4}
    assert "X3" in v4_status and "X1" not in v4_status
    # and no X2 at v4: the rollback discarded u2
    assert "X2" not in v4_status


def test_snapshot_changes_classifies_and_filters_carried_rows(spark, tmp_path):
    from mapreducego_spark.sources.snapshots import snapshot_changes

    table = str(tmp_path / "t")
    commit_snapshot(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "k long, val string"
        ),
        table,
    )
    commit_snapshot(
        spark.createDataFrame(
            # 1 carried (must NOT appear), 2 updated, 3 null->value
            # update, 4 inserted; no row for a delete yet
            [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "k long, val string"
        ),
        table,
    )
    rows = {r["k"]: r for r in snapshot_changes(spark, table, 0, 1, "k").collect()}
    assert set(rows) == {2, 3, 4}
    assert rows[2]["change_type"] == "update" and rows[2]["old_val"] == "b"
    # null-safe diff: NULL -> 'c' is an update, not a carried row
    assert rows[3]["change_type"] == "update" and rows[3]["old_val"] is None
    assert rows[4]["change_type"] == "insert" and rows[4]["old_val"] is None
    # a delete shows the before payload with null afters
    commit_snapshot(
        spark.createDataFrame([(2, "B")], "k long, val string"), table
    )
    d = {r["k"]: r for r in snapshot_changes(spark, table, 1, 2, "k").collect()}
    assert d[1]["change_type"] == "delete" and d[1]["new_val"] is None
    assert d[1]["old_val"] == "a"
    import pytest

    with pytest.raises(ValueError, match="from < to"):
        snapshot_changes(spark, table, 2, 2, "k")
    with pytest.raises(ValueError, match="never committed"):
        snapshot_changes(spark, table, 0, 9, "k")
