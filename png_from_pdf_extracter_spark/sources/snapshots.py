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
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer committed the version this writer was building."""


class IncrementalScanError(RuntimeError):
    """The requested snapshot range contains a non-append commit, so the
    appended-directories diff does not describe the change set."""


class SnapshotTable:
    _seq = itertools.count()

    def __init__(
        self, root: str, table: str, stats_cols: list | None = None
    ):
        """``stats_cols``: column names whose per-data-dir min/max are
        recorded in every manifest this writer commits (Iceberg's
        column-stats file skipping, directory granularity). Readers use
        them via ``read_pruned``; tables written without stats still read
        fine — pruning just keeps every dir."""
        self.root = os.path.join(root, table)
        self.meta = os.path.join(self.root, "meta")
        self.data = os.path.join(self.root, "data")
        self.stats_cols = list(stats_cols or [])
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
        # commit wall-clock, stamped once at claim time: the basis for
        # TIMESTAMP AS OF time travel (version_as_of/read_as_of)
        manifest.setdefault("committed_at", time.time())
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
        staged_stats = self._collect_stats(df, staged)
        # per-dir row count: parquet footers answer this without a data
        # scan, and the manifest then answers count(*) with NO scan at all
        # (Iceberg's snapshot-summary `total-records`)
        staged_rows = df.sparkSession.read.parquet(staged).count()
        last: Exception | None = None
        for _ in range(retries + 1):
            self._roll_forward()
            head = self.current_version()
            version = (head or 0) + 1
            stats = dict(staged_stats)
            rows = {staged: staged_rows}
            deletes: list = []
            delete_key = None
            parent = self.manifest(head) if head is not None else {}
            if op == "append" and head is not None:
                dirs = list(parent["dirs"]) + [staged]
                # carry forward the parent's per-dir stats/rows — dirs are
                # immutable, so their ranges and counts never change — and
                # any pending merge-on-read deletes (an append does not
                # materialize them; their applies_to scoping excludes the
                # new dir, so appended rows are never suppressed).
                # overwrite/compact land in the else branch: the rewrite
                # was read WITH deletes applied, so none carry over.
                stats = {**parent.get("stats", {}), **stats}
                rows = {**parent.get("rows", {}), **rows}
                deletes = list(parent.get("deletes", []))
                delete_key = parent.get("delete_key")
            else:
                dirs = [staged]
            manifest = {
                "version": version,
                "parent": head,
                "op": op,
                "dirs": dirs,
                "stats": stats,
                "rows": rows,
            }
            if deletes:
                manifest["deletes"] = deletes
                manifest["delete_key"] = delete_key
            # the streaming sinks' exactly-once guard reads max_batch_id
            # off the HEAD manifest — carry it through EVERY commit
            # (compact/overwrite/merge between micro-batches must not
            # reset the replay guard), monotone when extra also sets it
            if parent.get("max_batch_id") is not None:
                manifest["max_batch_id"] = parent["max_batch_id"]
            if extra:
                mbi = extra.get("max_batch_id")
                if mbi is not None and parent.get("max_batch_id") is not None:
                    extra = {
                        **extra,
                        "max_batch_id": max(mbi, parent["max_batch_id"]),
                    }
                manifest.update(extra)
            try:
                self._claim(version, manifest)
            except CommitConflict as exc:  # head moved: re-read, retry
                last = exc
                continue
            self._flip(version)
            return version
        raise last  # type: ignore[misc]

    # ------------------------------------------------------------- tags
    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under a NAME (Iceberg tags/refs): the
        training-data lineage handle — ``tag("run-42-corpus")`` before a
        training run makes "which exact corpus trained run X" a
        first-class, expiry-proof question. Tags are written atomically
        (temp + ``os.replace``) and re-tagging a name moves it."""
        v = self.current_version() if version is None else version
        if v is None or not os.path.exists(
            os.path.join(self.meta, f"v{v}.json")
        ):
            raise FileNotFoundError(f"no snapshot v{v} in {self.root}")
        path = os.path.join(self.meta, f"tag-{name}")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
        return v

    def tag_version(self, name: str) -> int:
        with open(os.path.join(self.meta, f"tag-{name}")) as fh:
            return int(fh.read().strip())

    def tags(self) -> dict:
        out = {}
        for f in os.listdir(self.meta):
            if f.startswith("tag-") and not f.endswith(".tmp"):
                with open(os.path.join(self.meta, f)) as fh:
                    out[f[4:]] = int(fh.read().strip())
        return out

    def drop_tag(self, name: str) -> None:
        os.remove(os.path.join(self.meta, f"tag-{name}"))

    def delete_keys(self, keys_df: DataFrame, key_col: str) -> int:
        """Merge-on-read row-level DELETE (the Iceberg v2 equality-delete
        shape): commit ONLY the key set — the table's data files are
        untouched, so deleting 100 rows from a 100 TB table costs one
        tiny parquet write plus a manifest flip. ``read()`` suppresses
        matching rows with a broadcast-able anti-join; ``compact()`` or
        any ``overwrite`` MATERIALIZES pending deletes (reads apply them,
        the rewrite commits without delete files).

        Each delete records the data dirs it ``applies_to`` — the dirs
        present when it committed. That is Iceberg's sequence-number
        scoping at directory granularity: rows APPENDED AFTER the delete
        are untouched even when they carry a deleted key, so
        delete-then-re-insert behaves like a real table. ``row_count()``
        honestly returns None while deletes are pending (the manifest
        cannot know the overlap). One ``key_col`` per table: a delete on
        a different key raises until pending deletes are materialized."""
        self._roll_forward()
        if self.current_version() is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        staged = os.path.join(
            self.data, f"del-{os.getpid()}-{next(self._seq)}"
        )
        keys_df.select(key_col).distinct().write.mode("overwrite").parquet(
            staged
        )
        last: Exception | None = None
        for _ in range(4):
            self._roll_forward()
            head = self.current_version()
            parent = self.manifest(head)
            prev_key = parent.get("delete_key")
            if prev_key is not None and prev_key != key_col:
                raise ValueError(
                    f"table already has pending deletes on {prev_key!r}; "
                    f"compact() to materialize before deleting on "
                    f"{key_col!r}"
                )
            version = head + 1
            manifest = {
                "version": version,
                "parent": head,
                "op": "delete",
                "dirs": list(parent["dirs"]),
                "stats": parent.get("stats", {}),
                "rows": parent.get("rows", {}),
                "deletes": parent.get("deletes", [])
                + [{"dir": staged, "applies_to": list(parent["dirs"])}],
                "delete_key": key_col,
            }
            if parent.get("max_batch_id") is not None:
                manifest["max_batch_id"] = parent["max_batch_id"]
            try:
                self._claim(version, manifest)
            except CommitConflict as exc:
                last = exc
                continue
            self._flip(version)
            return version
        raise last  # type: ignore[misc]

    def merge_mor(
        self, source: DataFrame, key_col: str, extra: dict | None = None
    ) -> int:
        """Merge-on-read UPSERT in ONE atomic commit (Iceberg v2 MoR
        MERGE): the source rows land as a new data dir AND the source
        keys land as an equality delete scoped to the PRE-merge dirs —
        old versions of matched keys are suppressed, new rows (scoped
        outside the delete) are visible, unmatched target rows pass
        through. No data rewrite: upserting a daily batch into a 100 TB
        table costs the batch write + a manifest flip, vs ``merge()``'s
        copy-on-write full rewrite. A crash before the flip leaves both
        staged dirs orphaned and invisible (expired later); readers see
        pre- or post-merge, never a torn mix."""
        self._roll_forward()
        if self.current_version() is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        tag = f"{os.getpid()}-{next(self._seq)}"
        staged_data = os.path.join(self.data, f"m{tag}")
        staged_del = os.path.join(self.data, f"del-{tag}")
        source.write.mode("overwrite").parquet(staged_data)
        source.select(key_col).distinct().write.mode("overwrite").parquet(
            staged_del
        )
        staged_stats = self._collect_stats(source, staged_data)
        staged_rows = source.sparkSession.read.parquet(staged_data).count()
        last: Exception | None = None
        for _ in range(4):
            self._roll_forward()
            head = self.current_version()
            parent = self.manifest(head)
            prev_key = parent.get("delete_key")
            if prev_key is not None and prev_key != key_col:
                raise ValueError(
                    f"table already has pending deletes on {prev_key!r}; "
                    f"compact() before merging on {key_col!r}"
                )
            version = head + 1
            manifest = {
                "version": version,
                "parent": head,
                "op": "merge_mor",
                "dirs": list(parent["dirs"]) + [staged_data],
                "stats": {**parent.get("stats", {}), **staged_stats},
                "rows": {**parent.get("rows", {}), staged_data: staged_rows},
                "deletes": parent.get("deletes", [])
                + [{"dir": staged_del, "applies_to": list(parent["dirs"])}],
                "delete_key": key_col,
            }
            if parent.get("max_batch_id") is not None:
                manifest["max_batch_id"] = parent["max_batch_id"]
            if extra:
                # same monotone guard as _commit: extra's replay cursor
                # must never regress a max_batch_id some OTHER commit
                # raised between the caller's read and this retry —
                # parent is re-read per attempt, so max() here is the
                # up-to-date bound
                mbi = extra.get("max_batch_id")
                if mbi is not None and parent.get("max_batch_id") is not None:
                    extra = {
                        **extra,
                        "max_batch_id": max(mbi, parent["max_batch_id"]),
                    }
                manifest.update(extra)
            try:
                self._claim(version, manifest)
            except CommitConflict as exc:
                last = exc
                continue
            self._flip(version)
            return version
        raise last  # type: ignore[misc]

    def _plan_with_deletes(
        self, spark: SparkSession, m: dict, dirs: list
    ) -> DataFrame:
        """Plan ``dirs`` with the manifest's scoped deletes applied: data
        dirs are grouped by WHICH deletes apply to them (usually one or
        two groups — appends after the last delete form the no-delete
        group) and each group anti-joins only its own key set. The union
        is a plan-level concat; every anti-join side is a tiny
        broadcast."""
        deletes = m.get("deletes", [])
        key = m.get("delete_key")
        groups: dict = {}
        for d in dirs:
            applicable = tuple(
                i for i, ent in enumerate(deletes)
                if d in ent["applies_to"]
            )
            groups.setdefault(applicable, []).append(d)
        out = None
        for applicable, ds in groups.items():
            df = spark.read.option("mergeSchema", "true").parquet(*ds)
            if applicable:
                keys = spark.read.parquet(
                    *[deletes[i]["dir"] for i in applicable]
                )
                df = df.join(F.broadcast(keys), key, "left_anti")
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True
            )
        return out

    def row_count(self, version: int | None = None) -> int | None:
        """``SELECT count(*)`` answered from the manifest alone — zero data
        files touched (Iceberg's snapshot-summary ``total-records``; the
        metadata-table read path). Works for any pinned ``version``
        (time-travel counts). Returns None when the manifest predates
        row accounting or any referenced dir lacks a recorded count —
        callers fall back to a real scan, never to a wrong number."""
        m = self.manifest(version)
        rows = m.get("rows")
        if rows is None or m.get("deletes"):
            # pending merge-on-read deletes: the manifest cannot know how
            # many data rows the key set suppresses
            return None
        counts = [rows.get(d) for d in m["dirs"]]
        if any(c is None for c in counts):
            return None
        return sum(counts)

    def append(self, df: DataFrame, extra: dict | None = None) -> int:
        return self._commit(df, "append", extra=extra)

    def overwrite(self, df: DataFrame, extra: dict | None = None) -> int:
        return self._commit(df, "overwrite", extra=extra)

    def _collect_stats(self, df: DataFrame, staged: str) -> dict:
        """Per-dir min/max for ``stats_cols``, read back from the staged
        parquet (a column-pruned footer-driven scan, not a recompute of
        the writer's plan). Only JSON-native values (numbers/strings) are
        recorded: a stringified timestamp/decimal would invite the pruner
        into lexicographic-vs-numeric traps ("9.5" > "10.2"), so
        non-native types record NO range and their dirs are always kept —
        pruning stays an optimization, never a correctness filter."""
        if not self.stats_cols:
            return {}
        from pyspark.sql import functions as F

        back = df.sparkSession.read.parquet(staged)
        cols = [c for c in self.stats_cols if c in back.columns]
        if not cols:
            return {}
        aggs = []
        for c in cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        row = back.agg(*aggs).first()
        def _json(v):
            # non-JSON-native (timestamp/decimal/date) -> None: the
            # pruner treats a missing bound as "always keep this dir"
            if isinstance(v, bool):
                return None
            return v if isinstance(v, (int, float, str)) or v is None else None
        return {
            staged: {
                c: [_json(row[f"min_{c}"]), _json(row[f"max_{c}"])]
                for c in cols
            }
        }

    # ------------------------------------------------------------- reads
    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Plan the snapshot's data dirs. ``mergeSchema`` makes column
        ADDITION a metadata-only operation (Iceberg's commonest schema
        evolution): an append whose df carries a new column commits
        normally, and reads project the union schema — rows from older
        dirs surface NULL for the new column, no rewrite of old data.
        Parquet resolves by name, so column order may differ per dir;
        renames/drops still need a rewrite (overwrite), same as
        parquet-backed Iceberg v1."""
        m = self.manifest(version)
        return self._plan_with_deletes(spark, m, m["dirs"])

    def version_as_of(self, ts: float) -> int:
        """TIMESTAMP AS OF resolution: the highest committed version
        whose ``committed_at`` is at or before ``ts`` (Iceberg's
        snapshot-id-as-of-time lookup). Versions claimed before the
        timestamp feature existed (no ``committed_at``) are treated as
        epoch-0, i.e. always eligible. Raises if no snapshot is old
        enough — reading "before the table existed" is an error, not an
        empty table."""
        best = None
        for v in self.versions():
            if v > (self.current_version() or 0):
                continue  # claimed but never pointer-flipped
            at = self.manifest(v).get("committed_at", 0.0)
            if at <= ts and (best is None or v > best):
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no snapshot at or before ts={ts} in {self.root}"
            )
        return best

    def read_as_of(self, spark: SparkSession, ts: float) -> DataFrame:
        """Time-travel read: the table exactly as committed at wall
        time ``ts`` — same MoR delete/upsert semantics as ``read`` at
        the resolved version."""
        return self.read(spark, version=self.version_as_of(ts))

    def history(self, spark: SparkSession) -> DataFrame:
        """The ``history``/``snapshots`` metadata table (Iceberg's
        inspection surface): one row per committed version with its
        commit time, operation, data-dir count, row count (when the
        manifest carries per-dir rows) and replay cursor. Driver-side
        by construction — the manifest list is the table's version
        count, never data-sized."""
        cur = self.current_version() or 0
        rows = []
        for v in self.versions():
            if v > cur:
                continue
            m = self.manifest(v)
            rc = (
                sum(m["rows"].values()) if m.get("rows") else None
            )
            rows.append(
                (
                    v,
                    float(m.get("committed_at", 0.0)),
                    m.get("op", "unknown"),
                    len(m.get("dirs", [])),
                    len(m.get("deletes", [])),
                    rc,
                    m.get("max_batch_id"),
                )
            )
        return spark.createDataFrame(
            rows,
            "version int, committed_at double, operation string, "
            "n_dirs int, n_delete_files int, rows long, "
            "max_batch_id long",
        )

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> tuple:
        """Manifest-level file skipping: plan only the data dirs whose
        recorded [min, max] range for ``col`` intersects [lo, hi] — the
        scan for ``WHERE col BETWEEN lo AND hi`` never opens the skipped
        dirs at all (Iceberg's stats-based pruning; parquet row-group
        pruning still applies inside the dirs that survive). Dirs with no
        recorded stats (older writers, null-only ranges) are always kept —
        pruning is an optimization, never a correctness filter, so the
        caller STILL applies the predicate. Returns (df, n_kept, n_total).
        """
        m = self.manifest(version)
        stats = m.get("stats", {})

        def _comparable(a, b):
            # prune only on same-kind comparisons: number vs number or
            # string vs string. A stat stored by an older writer as a
            # stringified timestamp/decimal vs a typed caller bound must
            # KEEP the dir, not TypeError or lexicographically mis-prune.
            num = (int, float)
            if isinstance(a, bool) or isinstance(b, bool):
                return False
            if isinstance(a, num) and isinstance(b, num):
                return True
            return isinstance(a, str) and isinstance(b, str)

        kept = []
        for d in m["dirs"]:
            rng = stats.get(d, {}).get(col)
            if rng is None or rng[0] is None or rng[1] is None:
                kept.append(d)
                continue
            mn, mx = rng
            below = (
                lo is not None and _comparable(mx, lo) and mx < lo
            )
            above = (
                hi is not None and _comparable(mn, hi) and mn > hi
            )
            if below or above:
                continue
            kept.append(d)
        if not kept:
            # empty result with the right schema: scan one dir, keep 0 rows
            df = self.read(spark, version).limit(0)
        else:
            df = self._plan_with_deletes(spark, m, kept)
        return df, len(kept), len(m["dirs"])

    def read_changes(
        self, spark: SparkSession, since: int, until: int | None = None
    ) -> DataFrame:
        """Incremental (CDC-style) scan: the rows APPENDED strictly after
        snapshot ``since`` up to and including ``until`` (default: head).
        Walks the parent chain validating every commit in the range is an
        ``append`` — an overwrite/compact in between rewrites history, so
        the directory diff would be wrong; raises IncrementalScanError
        and the caller falls back to a full diff. This is Iceberg's
        incremental append scan: the streaming/backfill primitive that
        lets a 100 TB consumer process only the new data per run."""
        head = self.current_version() if until is None else until
        if head is None or since > head:
            raise IncrementalScanError(
                f"bad range: since={since} until={head}"
            )
        new_dirs: list = []
        v = head
        while v is not None and v > since:
            m = self.manifest(v)
            if m["op"] != "append":
                raise IncrementalScanError(
                    f"snapshot v{v} is op={m['op']!r}; incremental append "
                    f"scan over ({since}, {head}] is not well-defined"
                )
            parent_dirs = (
                set(self.manifest(m["parent"])["dirs"])
                if m["parent"] is not None
                else set()
            )
            new_dirs.extend(d for d in m["dirs"] if d not in parent_dirs)
            v = m["parent"]
        if v != since and since != 0:
            raise IncrementalScanError(
                f"snapshot v{since} is not an ancestor of v{head}"
            )
        if not new_dirs:
            return self.read(spark, head).limit(0)
        return spark.read.option("mergeSchema", "true").parquet(*new_dirs)

    # ------------------------------------------------------------- merge
    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        keys,
        delete_col: str | None = None,
        broadcast_source: bool = True,
    ) -> int:
        """Transactional MERGE INTO: read the head snapshot, apply
        ``operators.merge.merge_upsert``, commit the result as an
        ``overwrite`` snapshot (copy-on-write, Iceberg's default MERGE).
        Readers pinned to older versions keep their view; the atomic
        pointer flip publishes the merged table all-or-nothing."""
        from ..operators.merge import merge_upsert

        target = self.read(spark)
        merged = merge_upsert(
            target,
            source,
            keys,
            delete_col=delete_col,
            broadcast_source=broadcast_source,
        )
        return self._commit(merged, "overwrite")

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
        # tagged snapshots are pinned: retention never expires a ref'd
        # manifest or the data dirs it needs (Iceberg's ref retention)
        survivors.update(v for v in self.tags().values() if v in set(vs))
        removed_manifests = 0
        for v in vs:
            if v not in survivors:
                os.remove(os.path.join(self.meta, f"v{v}.json"))
                removed_manifests += 1
        live = set()
        for v in survivors:
            m = self.manifest(v)
            live.update(m["dirs"])
            live.update(ent["dir"] for ent in m.get("deletes", []))
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
