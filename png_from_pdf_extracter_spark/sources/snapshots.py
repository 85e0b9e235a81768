"""Snapshot-versioned tables: the Iceberg commit protocol over parquet.

The north rule targets Iceberg tables; ``Catalog`` wraps parquet
directories with Iceberg-shaped *call* semantics but a directory-rename
commit that is weaker than Iceberg's (a reader racing ``compact`` can see
the path missing for an instant). This module supplies the missing piece
— Iceberg's actual commit design, minus the jars:

- every write lands its files in an immutable, write-once data directory
  (``data/v{N}/``) that no later operation ever mutates;
- a JSON **manifest** (``meta/v{N}.json``) names the data directories
  that make up snapshot N (append = parent's list + the new dir,
  overwrite/compact = just the new dir) plus lineage metadata;
- a single **pointer file** (``meta/_current``) names the live manifest,
  flipped with ``os.replace`` — atomic on POSIX, so every reader sees
  exactly one committed snapshot, before or after, NEVER missing and
  never a mix. This is the snapshot-atomic commit the plain catalog's
  two-rename swap cannot give (``catalog.py:152-158``);
- **optimistic concurrency**: the manifest file is claimed with
  ``O_CREAT | O_EXCL`` — two racing writers cannot both create
  ``v{N}.json``; the loser re-reads the head and retries on fresh state
  (Iceberg's CAS-on-metadata-pointer, file-system edition);
- **time travel**: ``read(version=K)`` plans over snapshot K's manifest
  while the head moves on — the audit/repro primitive for training-data
  lineage ("which exact corpus trained run X?");
- **expire_snapshots** deletes manifests older than the retention and
  any data directory no surviving manifest references (Iceberg's
  ``expire_snapshots`` + orphan-file cleanup in one step). A crash
  mid-write leaves an orphan ``data/v{N}/`` with no manifest: invisible
  to readers, reclaimed here.

Scale note: the manifest lists directories, not files, so its size is
O(appends since last compact), not O(files); ``compact`` resets it to one
entry. Readers hand Spark the directory list — partition discovery stays
parallel on the cluster, and nothing here walks data files on the driver.
"""

from __future__ import annotations

import itertools
import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed the version this writer was building."""


class SnapshotTable:
    _seq = itertools.count()

    def __init__(self, root: str, table: str):
        self.root = os.path.join(root, table)
        self.meta = os.path.join(self.root, "meta")
        self.data = os.path.join(self.root, "data")
        os.makedirs(self.meta, exist_ok=True)
        os.makedirs(self.data, exist_ok=True)

    # ---------------------------------------------------------- metadata
    def _pointer(self) -> str:
        return os.path.join(self.meta, "_current")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        with open(os.path.join(self.meta, f"v{v}.json")) as fh:
            return json.load(fh)

    def versions(self) -> list:
        out = []
        for f in os.listdir(self.meta):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def _claim(self, version: int, manifest: dict) -> None:
        """Claim ``v{version}.json`` atomically WITH its content: the
        manifest is fully written + fsynced to a temp file first, then
        ``os.link`` publishes it — link fails if the name exists (the CAS
        that serializes racing writers) and can never expose a torn or
        empty manifest. A claimed manifest is therefore always complete,
        which is what makes ``_roll_forward`` safe: a writer that crashes
        after claiming has already made its commit durable, and any later
        writer may finish the pointer flip on its behalf."""
        path = os.path.join(self.meta, f"v{version}.json")
        tmp = os.path.join(
            self.meta, f".claim-{os.getpid()}-{next(self._seq)}.tmp"
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflict(
                f"snapshot v{version} already claimed in {self.root}"
            )
        finally:
            os.unlink(tmp)

    def _roll_forward(self) -> None:
        """Crash recovery: flip the pointer to the highest contiguous
        CLAIMED version. A claimed manifest is durable by construction
        (``_claim``), so finishing a crashed writer's flip is correct —
        without this, an orphan claim would block its version number
        forever and wedge every later commit."""
        claimed = set(self.versions())
        cur = self.current_version() or 0
        head = cur
        while head + 1 in claimed:
            head += 1
        if head != cur:
            self._flip(head)

    def _flip(self, version: int) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._pointer())  # atomic: readers see old or new

    # ------------------------------------------------------------ writes
    def _commit(
        self,
        df: DataFrame,
        op: str,
        retries: int = 3,
        extra: dict | None = None,
    ) -> int:
        """Write df's files into a fresh data dir, then commit a manifest
        referencing them. On CommitConflict the DATA is kept (it is
        version-independent) and only the metadata round retries against
        the new head — Iceberg's retry loop, where the expensive file
        write never re-runs. ``extra`` keys are merged into the manifest
        (used by the streaming sink to stamp batch ids)."""
        self._roll_forward()
        base = (self.current_version() or 0) + 1
        # pid + in-process counter make the staged dir unique even when two
        # threads of one writer race the same base version
        staged = os.path.join(
            self.data, f"v{base}-{os.getpid()}-{next(self._seq)}"
        )
        df.write.mode("overwrite").parquet(staged)
        last: Exception | None = None
        for _ in range(retries + 1):
            self._roll_forward()
            head = self.current_version()
            version = (head or 0) + 1
            if op == "append" and head is not None:
                dirs = list(self.manifest(head)["dirs"]) + [staged]
            else:
                dirs = [staged]
            manifest = {
                "version": version,
                "parent": head,
                "op": op,
                "dirs": dirs,
            }
            if extra:
                manifest.update(extra)
            try:
                self._claim(version, manifest)
            except CommitConflict as exc:  # head moved: re-read, retry
                last = exc
                continue
            self._flip(version)
            return version
        raise last  # type: ignore[misc]

    def append(self, df: DataFrame, extra: dict | None = None) -> int:
        return self._commit(df, "append", extra=extra)

    def overwrite(self, df: DataFrame, extra: dict | None = None) -> int:
        return self._commit(df, "overwrite", extra=extra)

    # ------------------------------------------------------------- reads
    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        m = self.manifest(version)
        return spark.read.parquet(*m["dirs"])

    # ------------------------------------------------------ maintenance
    def compact(
        self, spark: SparkSession, target_file_mb: int = 128
    ) -> dict:
        """Snapshot-atomic small-files rewrite: read the head snapshot,
        rewrite it at ~target size into a new data dir, commit it as an
        ``overwrite`` snapshot. Readers pinned to older versions keep
        working — their data dirs are immutable until expired."""
        head = self.current_version()
        nbytes = 0
        nfiles = 0
        for d in self.manifest(head)["dirs"]:
            for dirpath, _dirs, files in os.walk(d):
                for f in files:
                    if f.endswith(".parquet"):
                        nfiles += 1
                        nbytes += os.path.getsize(os.path.join(dirpath, f))
        n_out = max(1, math.ceil(nbytes / (target_file_mb * 1024 * 1024)))
        df = self.read(spark, head).repartition(n_out)
        version = self._commit(df, "compact")
        return {
            "files_before": nfiles,
            "bytes": nbytes,
            "version": version,
        }

    def expire_snapshots(self, keep: int = 1) -> dict:
        """Drop all but the newest ``keep`` manifests, then delete every
        data dir no surviving manifest references — including orphan dirs
        from crashed writes that never committed. The head is never
        expired."""
        vs = self.versions()
        cur = self.current_version()
        survivors = set(vs[-keep:])
        if cur is not None:
            survivors.add(cur)
        removed_manifests = 0
        for v in vs:
            if v not in survivors:
                os.remove(os.path.join(self.meta, f"v{v}.json"))
                removed_manifests += 1
        live = set()
        for v in survivors:
            live.update(self.manifest(v)["dirs"])
        removed_dirs = 0
        for d in os.listdir(self.data):
            full = os.path.join(self.data, d)
            if full not in live:
                shutil.rmtree(full, ignore_errors=True)
                removed_dirs += 1
        return {
            "removed_manifests": removed_manifests,
            "removed_dirs": removed_dirs,
        }
