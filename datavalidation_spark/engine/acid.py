"""Iceberg-style atomic manifest commits over plain parquet.

Why this exists: the round-1 audit sink appended two parquet directories
non-atomically (violations first, verdicts second — ``engine/audit.py``), so
a crash between the writes left violation rows for partitions that had no
verdict; the next resume re-validated those partitions and double-counted
their violations (ADVICE r1, medium).

This module implements the commit protocol ACID table formats use, on plain
files (the container ships no Iceberg/Delta jars — documented swap point):

* data files are written to an invisible staging directory, then renamed
  into the data area (rename is metadata-only on the same filesystem);
* a single commit file is created with ``O_CREAT|O_EXCL`` (atomic on POSIX —
  the same role an Iceberg metadata-pointer swap or Delta ``_delta_log``
  JSON plays) listing EVERY data file of EVERY logical table in the
  transaction;
* readers enumerate commit files and read exactly the listed data files —
  an uncommitted (crashed) write is invisible, and a multi-table write
  (verdicts + violations) becomes visible all-or-nothing.

Concurrent committers race on the sequence number; the loser of the
``O_EXCL`` create retries with the next sequence — optimistic concurrency,
exactly Iceberg's strategy. In production, replace ``ManifestLog`` with the
real table format behind the same three methods.

Reference analog: the reference persists validation results implicitly via
Streamlit session state + CSV download (``streamlit_app.py:140-151``) — it
has no durable audit at all; this is new capability required by the
north_rule ("recording per-partition lineage ... to a Delta/Iceberg audit
table so a killed job resumes without recomputing validated partitions").
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ManifestLog:
    """Atomic multi-table commits: ``commit({name: df, ...})`` makes all
    tables' new files visible in one filesystem-atomic step."""

    def __init__(self, root: str):
        self.root = root
        self.commits_dir = os.path.join(root, "_commits")

    # -- write ------------------------------------------------------------

    def _stage(self, name: str, df: DataFrame) -> list[str]:
        """Write df as parquet data files under the table dir; return their
        final (visible-only-via-manifest) paths."""
        table_dir = os.path.join(self.root, name)
        staging = os.path.join(table_dir, f"_staged-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        os.makedirs(table_dir, exist_ok=True)
        final: list[str] = []
        for i, part in enumerate(sorted(glob.glob(os.path.join(staging, "*.parquet")))):
            dest = os.path.join(table_dir, f"{uuid.uuid4().hex}-{i}.parquet")
            os.replace(part, dest)
            final.append(dest)
        # remove the staging dir (listdir, not glob — Spark leaves hidden
        # .crc/_SUCCESS markers behind); leftovers are inert either way
        for leftover in os.listdir(staging):
            os.remove(os.path.join(staging, leftover))
        os.rmdir(staging)
        return final

    def commit(self, tables: dict[str, DataFrame], meta: dict | None = None) -> int:
        """Stage every table's data files, then publish them with ONE atomic
        commit-file creation. Returns the commit sequence number."""
        files = {name: self._stage(name, df) for name, df in tables.items()}
        os.makedirs(self.commits_dir, exist_ok=True)
        payload = json.dumps(
            {"tables": files, "meta": meta or {}}, sort_keys=True
        ).encode()
        seq = self._next_seq()
        while True:
            path = os.path.join(self.commits_dir, f"{seq:08d}.json")
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                seq += 1  # lost the race — optimistic retry on the next slot
                continue
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            return seq

    def _next_seq(self) -> int:
        existing = glob.glob(os.path.join(self.commits_dir, "*.json"))
        if not existing:
            return 1
        return 1 + max(int(os.path.basename(p).split(".")[0]) for p in existing)

    # -- read -------------------------------------------------------------

    def committed_files(self, name: str) -> list[str]:
        out: list[str] = []
        for path in sorted(glob.glob(os.path.join(self.commits_dir, "*.json"))):
            with open(path, "rb") as f:
                out.extend(json.load(f).get("tables", {}).get(name, []))
        return [p for p in out if os.path.exists(p)]

    def read(self, spark: SparkSession, name: str) -> DataFrame | None:
        """All committed rows of a logical table; None before first commit.
        Uncommitted staged/renamed-but-unpublished files are never read."""
        files = self.committed_files(name)
        if not files:
            return None
        return spark.read.parquet(*files)
