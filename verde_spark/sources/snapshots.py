"""Snapshot-versioned parquet table store (Iceberg-style semantics, no jar).

The north rule targets *Iceberg tables of Common-Crawl-style web pages at
10^12-document scale*.  This container has neither the Spark Iceberg
runtime jar nor pyiceberg (COVERAGE.md documents the failed install
attempts), so this module re-creates the table-format SEMANTICS that
matter at that scale from scratch, over plain parquet plus tiny JSON
manifests:

- **Snapshot isolation + atomic commit** — every write produces an
  immutable snapshot file ``_snapshots/v{N}.json`` listing the exact
  data files that make up the table at that version; readers resolve
  the ``CURRENT`` pointer (committed via ``os.replace``, atomic on
  POSIX) so a reader never sees a half-written table.
- **Time travel** — ``read(spark, version=3)`` reconstructs any
  historical version from its manifest; ``rollback(version)`` commits a
  NEW snapshot that points at the old file set (history is never
  rewritten, same as Iceberg's rollback).
- **Manifest-based file pruning with column stats** — each manifest row
  carries the file's row count plus per-column min/max harvested from
  the parquet footer (pyarrow reads only metadata, not data).  At read
  time ``prune={"col": (lo, hi)}`` drops files whose stat range cannot
  intersect BEFORE Spark ever lists them.  This is the Iceberg scan
  planning model: at 10^12 rows the query that touches one spatial cell
  must open thousands of files, not millions, and directory listing
  alone cannot deliver that — footer stats in the manifest can.
- **Sized output files** — ``target_rows_per_file`` forwards to
  Spark's ``maxRecordsPerFile`` so appends at scale produce uniformly
  sized files instead of one file per shuffle partition (small-file
  problem) or 10 GB monsters (straggler problem).

Only the Iceberg *interchange format* (Avro manifest lists readable by
other engines) is out of scope — that genuinely requires the blocked
dependencies; the operational contract (atomic commits, time travel,
stats-pruned scans, append/overwrite/rollback lineage) is all here and
tested.

Reference parity note: the reference (fatiando/verde) has no storage
layer at all — this module exists for the north rule's table contract,
not for API parity.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

SNAP_DIR = "_snapshots"
CURRENT = "CURRENT"

def _file_stats(path: str, stat_cols: Optional[Sequence[str]]) -> dict:
    """Row count + per-column min/max from the parquet footer only."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    stats: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if stat_cols is not None and name not in stat_cols:
                continue
            s = col.statistics
            if s is None or not s.has_min_max:
                continue
            lo, hi = s.min, s.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                except UnicodeDecodeError:
                    continue
            if hasattr(lo, "isoformat"):
                lo, hi = lo.isoformat(), hi.isoformat()
            if name in stats:
                stats[name][0] = min(stats[name][0], lo)
                stats[name][1] = max(stats[name][1], hi)
            else:
                stats[name] = [lo, hi]
    return {"rows": md.num_rows, "bytes": os.path.getsize(path), "stats": stats}


class SnapshotStore:
    """Snapshot-versioned parquet table rooted at ``path``.

    >>> store = SnapshotStore("/data/pages")
    >>> store.append(df)                       # -> version 1
    >>> store.append(more, target_rows_per_file=1_000_000)  # -> version 2
    >>> store.read(spark)                      # current (v2) table
    >>> store.read(spark, version=1)           # time travel
    >>> store.read(spark, prune={"cell": (100, 200)})  # stats-pruned scan
    >>> store.rollback(1)                      # -> version 3 == v1 file set
    >>> store.history(spark)                   # lineage + metrics DataFrame
    """

    def __init__(self, path: str, stat_cols: Optional[Sequence[str]] = None):
        self.path = path
        self.snap_path = os.path.join(path, SNAP_DIR)
        self.stat_cols = list(stat_cols) if stat_cols is not None else None
        os.makedirs(self.snap_path, exist_ok=True)

    # -- snapshot plumbing ---------------------------------------------------

    def current_version(self) -> int:
        """Committed version; 0 = empty table."""
        try:
            with open(os.path.join(self.snap_path, CURRENT)) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return 0

    def _snapshot(self, version: int) -> dict:
        with open(os.path.join(self.snap_path, f"v{version:08d}.json")) as fh:
            return json.load(fh)

    def _commit(self, snap: dict, expected_parent: int) -> int:
        """Write the snapshot then atomically swing CURRENT (os.replace).

        Optimistic concurrency: if another writer committed since we
        planned (CURRENT moved past ``expected_parent``), raise instead
        of silently dropping their snapshot from history.  The snapshot
        file itself is the commit arbiter: it is opened with exclusive
        create ('x'), so two writers racing past the CURRENT check can
        never both claim the same version — the loser raises instead of
        truncating the winner's snapshot (a check-then-act CURRENT probe
        alone would let the second open('w') silently clobber the first).
        """
        if self.current_version() != expected_parent:
            raise RuntimeError(
                f"concurrent commit: expected parent v{expected_parent}, "
                f"CURRENT is v{self.current_version()}"
            )
        version = expected_parent + 1
        snap = {**snap, "version": version, "parent": expected_parent}
        try:
            fh = open(
                os.path.join(self.snap_path, f"v{version:08d}.json"), "x"
            )
        except FileExistsError:
            raise RuntimeError(
                f"concurrent commit: snapshot v{version} already written "
                "by another committer"
            ) from None
        with fh:
            json.dump(snap, fh)
        tmp = os.path.join(self.snap_path, f".{CURRENT}.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(self.snap_path, CURRENT))  # atomic
        return version

    # -- writes ----------------------------------------------------------------

    def _write_files(
        self, df: DataFrame, target_rows_per_file: Optional[int]
    ) -> list[dict]:
        """Write df's parquet under a fresh uuid dir; return manifest rows."""
        sub = uuid.uuid4().hex
        out = os.path.join(self.path, "data", sub)
        writer = df.write.mode("error")
        if target_rows_per_file is not None:
            writer = writer.option("maxRecordsPerFile", int(target_rows_per_file))
        writer.parquet(out)
        entries = []
        for root, _dirs, files in os.walk(out):
            for name in sorted(files):
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                entries.append(
                    {"path": os.path.relpath(full, self.path),
                     **_file_stats(full, self.stat_cols)}
                )
        return entries

    def append(
        self,
        df: DataFrame,
        target_rows_per_file: Optional[int] = None,
    ) -> int:
        """Commit df's rows as a new snapshot = parent files + new files."""
        parent = self.current_version()
        base = self._snapshot(parent)["files"] if parent else []
        new = self._write_files(df, target_rows_per_file)
        return self._commit(
            {"operation": "append", "files": base + new,
             "added_files": len(new), "added_rows": sum(e["rows"] for e in new)},
            expected_parent=parent,
        )

    def overwrite(
        self,
        df: DataFrame,
        target_rows_per_file: Optional[int] = None,
    ) -> int:
        """Commit a snapshot containing ONLY df's rows (logical replace).

        Old files stay on disk, referenced by older snapshots — time
        travel to them still works (physical GC is `expire`, like
        Iceberg's expire_snapshots).
        """
        parent = self.current_version()
        new = self._write_files(df, target_rows_per_file)
        return self._commit(
            {"operation": "overwrite", "files": new,
             "added_files": len(new), "added_rows": sum(e["rows"] for e in new)},
            expected_parent=parent,
        )

    def rollback(self, version: int) -> int:
        """New snapshot whose file set is exactly ``version``'s."""
        old = self._snapshot(version)
        parent = self.current_version()
        return self._commit(
            {"operation": f"rollback:v{version}", "files": old["files"],
             "added_files": 0, "added_rows": 0},
            expected_parent=parent,
        )

    # -- reads -----------------------------------------------------------------

    def files(
        self,
        version: Optional[int] = None,
        prune: Optional[dict] = None,
    ) -> list[str]:
        """Absolute data-file paths for a version, after stats pruning.

        ``prune={"col": (lo, hi)}`` keeps a file unless its footer
        min/max proves no row can land in [lo, hi].  Files with no
        harvested stats for the column are conservatively kept.
        """
        version = self.current_version() if version is None else version
        if version == 0:
            return []
        kept = []
        for entry in self._snapshot(version)["files"]:
            ok = True
            for col, (lo, hi) in (prune or {}).items():
                st = entry["stats"].get(col)
                if st is not None and (st[0] > hi or st[1] < lo):
                    ok = False
                    break
            if ok:
                kept.append(os.path.join(self.path, entry["path"]))
        return kept

    def read(
        self,
        spark: SparkSession,
        version: Optional[int] = None,
        prune: Optional[dict] = None,
    ) -> DataFrame:
        """Table at ``version`` (default CURRENT) as a DataFrame.

        Pruning here removes whole files from the scan plan — Spark
        never lists or opens them; any residual predicate must still be
        applied by the caller (pruning is a superset guarantee, exactly
        like Iceberg scan planning + residual evaluation).
        """
        paths = self.files(version, prune)
        if not paths:
            raise ValueError(f"empty table at {self.path} (v{version})")
        return spark.read.parquet(*paths)

    # -- lineage + metrics -------------------------------------------------------

    def history(self, spark: SparkSession) -> DataFrame:
        """One row per snapshot: version, parent, operation, files, rows."""
        rows = []
        for v in range(1, self.current_version() + 1):
            s = self._snapshot(v)
            rows.append(
                (s["version"], s["parent"], s["operation"], len(s["files"]),
                 sum(e["rows"] for e in s["files"]),
                 s.get("added_files", 0), s.get("added_rows", 0))
            )
        return spark.createDataFrame(
            rows,
            "version int, parent int, operation string, n_files int, "
            "n_rows long, added_files int, added_rows long",
        )

    def expire(self, keep_from_version: int) -> int:
        """Delete data files referenced ONLY by snapshots < keep_from_version.

        Returns the number of files removed.  Mirrors Iceberg's
        expire_snapshots: time travel below the horizon stops working,
        everything at or above keeps its exact file set.
        """
        keep: set[str] = set()
        for v in range(keep_from_version, self.current_version() + 1):
            keep.update(e["path"] for e in self._snapshot(v)["files"])
        removed = 0
        for v in range(1, keep_from_version):
            for e in self._snapshot(v)["files"]:
                full = os.path.join(self.path, e["path"])
                if e["path"] not in keep and os.path.exists(full):
                    os.remove(full)
                    removed += 1
        return removed
