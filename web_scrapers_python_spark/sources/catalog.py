"""Snapshot catalog — the engine's checkpointed state store.

Design target is **Iceberg** (SURVEY §1.4, §2.10 E5): every crawl round
commits `frontier` / `seen` / `articles` / `round_metrics` atomically,
and resume/time-travel reads any previous snapshot (`VERSION AS OF`).
This sandbox ships no Iceberg runtime jar and has no network, so this
module provides the same semantics over plain parquet:

- one immutable data directory per table snapshot
  (``<warehouse>/<table>/snap-<n>/``) — write-once, like Iceberg data
  + manifest files;
- an atomic pointer flip (``os.replace`` of ``current.json``) as the
  commit — like the Iceberg catalog's metadata-pointer swap;
- a snapshot log (``snapshots.json``) carrying per-snapshot lineage
  properties (round, counts) — like Iceberg's snapshot summary;
- ``commit_round`` groups multiple table snapshots under one round tag
  so a crash between table writes is recoverable (rounds are replayed
  from the last complete tag — write-ahead intent + idempotent replay).

On a real cluster every call maps 1:1 onto Iceberg:
``write_snapshot`` → ``df.writeTo(tbl).overwritePartitions()`` /
``append()``; ``read(snapshot_id=k)`` → ``VERSION AS OF``;
``commit_round`` → a single multi-table transaction (or per-table
snapshots + the round tag in snapshot properties, as here).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._tdir(table), "current.json")

    def _log(self, table: str) -> str:
        return os.path.join(self._tdir(table), "snapshots.json")

    # -- snapshot log ------------------------------------------------------
    def snapshots(self, table: str) -> list[dict[str, Any]]:
        try:
            with open(self._log(table)) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def current_snapshot(self, table: str) -> dict[str, Any] | None:
        try:
            with open(self._pointer(table)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # -- write path ----------------------------------------------------------
    def write_snapshot(self, table: str, df: DataFrame,
                       properties: dict[str, Any] | None = None,
                       partition_by: list[str] | None = None,
                       mode: str = "overwrite",
                       base_snapshot_id: int | None = None) -> int:
        """Materialize df as the table's next snapshot and commit it
        atomically. ``mode='append'`` writes only the new rows but the
        new snapshot references all prior data dirs too — exactly an
        Iceberg append snapshot (new manifests + carried-over ones).
        ``base_snapshot_id`` pins WHICH snapshot an append extends
        (default: the latest). Callers replaying a round after a crash
        must pin the last committed round's id so orphaned data dirs
        from the torn round are not carried forward. Returns the
        snapshot id."""
        tdir = self._tdir(table)
        os.makedirs(tdir, exist_ok=True)
        snaps = self.snapshots(table)
        snap_id = (snaps[-1]["id"] + 1) if snaps else 0
        data_dir = os.path.join(tdir, f"snap-{snap_id}")
        tmp_dir = data_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp_dir)
        os.replace(tmp_dir, data_dir)  # data visible only after rename

        paths = [data_dir]
        if mode == "append" and snaps:
            if base_snapshot_id is None:
                paths = snaps[-1]["paths"] + paths
            elif base_snapshot_id >= 0:
                paths = self._paths_of(table, base_snapshot_id) + paths
            # base_snapshot_id == -1: fresh lineage, carry nothing (the
            # caller knows no committed base exists — e.g. replaying the
            # first round after a crash left an orphaned snapshot)
        entry = {
            "id": snap_id,
            "paths": paths,
            "committed_at": time.time(),
            "properties": properties or {},
        }
        snaps.append(entry)
        self._atomic_json(self._log(table), snaps)
        self._atomic_json(self._pointer(table), entry)  # the commit
        return snap_id

    @staticmethod
    def _atomic_json(path: str, obj: Any) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, path)

    def _paths_of(self, table: str, snapshot_id: int) -> list[str]:
        for s in self.snapshots(table):
            if s["id"] == snapshot_id:
                return s["paths"]
        raise FileNotFoundError(f"{table}: no snapshot {snapshot_id}")

    # -- read path -----------------------------------------------------------
    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame:
        """Read current snapshot, or time-travel (`VERSION AS OF`)."""
        if snapshot_id is None:
            cur = self.current_snapshot(table)
            if cur is None:
                raise FileNotFoundError(f"table {table} has no snapshot")
            return self.spark.read.parquet(*cur["paths"])
        return self.spark.read.parquet(*self._paths_of(table, snapshot_id))

    def snapshot_properties(self, table: str, snapshot_id: int) -> dict:
        for s in self.snapshots(table):
            if s["id"] == snapshot_id:
                return s.get("properties", {})
        raise FileNotFoundError(f"{table}: no snapshot {snapshot_id}")

    def set_snapshot_properties(self, table: str, snapshot_id: int,
                                properties: dict) -> None:
        """Replace a snapshot's properties (Iceberg: snapshot summary /
        table-property update — metadata only, no data rewrite)."""
        snaps = self.snapshots(table)
        for s in snaps:
            if s["id"] == snapshot_id:
                s["properties"] = properties
                break
        else:
            raise FileNotFoundError(f"{table}: no snapshot {snapshot_id}")
        self._atomic_json(self._log(table), snaps)
        cur = self.current_snapshot(table)
        if cur and cur["id"] == snapshot_id:
            cur["properties"] = properties
            self._atomic_json(self._pointer(table), cur)

    def read_snapshot_delta(self, table: str, snapshot_id: int) -> DataFrame:
        """Read ONLY the data dir written by this snapshot — for an
        append snapshot, exactly the delta rows it added."""
        return self.spark.read.parquet(
            os.path.join(self._tdir(table), f"snap-{snapshot_id}"))

    def snapshot_delta_rowcount(self, table: str, snapshot_id: int) -> int:
        """Row count of ONLY the data dir written by this snapshot, from
        parquet footers read driver-side (no Spark job at all — the
        metrics layer calls this every round). For an append snapshot
        this is the delta's size."""
        import pyarrow.parquet as pq
        d = os.path.join(self._tdir(table), f"snap-{snapshot_id}")
        return sum(
            pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
            for f in os.listdir(d) if f.endswith(".parquet"))

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    def compact(self, table: str,
                properties: dict[str, Any] | None = None) -> int:
        """Iceberg ``rewrite_data_files`` analog for append tables:
        rewrite the current snapshot's accumulated delta dirs into one
        dir and commit it as a new (overwrite) snapshot. Run every k
        rounds / on a maintenance schedule — an append-only table
        otherwise accumulates one directory per round, and the
        many-small-files tax grows with crawl age. Data is unchanged;
        old snapshots remain time-travelable."""
        props = {"compacted": True, **(properties or {})}
        return self.write_snapshot(table, self.read(table), props)

    # -- round transaction ----------------------------------------------------
    def commit_round(self, round_no: int,
                     table_snapshots: dict[str, int]) -> None:
        """Record that round `round_no` committed the given per-table
        snapshot ids. A round is durable only once this pointer lands;
        resume replays from the latest complete round."""
        rounds_path = os.path.join(self.warehouse, "rounds.json")
        rounds = self.rounds()
        rounds.append({"round": round_no, "snapshots": table_snapshots,
                       "committed_at": time.time()})
        self._atomic_json(rounds_path, rounds)

    def rounds(self) -> list[dict[str, Any]]:
        try:
            with open(os.path.join(self.warehouse, "rounds.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def last_complete_round(self) -> dict[str, Any] | None:
        rounds = self.rounds()
        return rounds[-1] if rounds else None
