"""MERGE INTO / upsert and SCD Type-2 history — the warehouse write surface.

The reference's sink is append-only (one reply per processed email,
``src/services/smtp_service.py:94-152``); a training-data warehouse also
needs *mutating* writes: re-ingested documents replace stale versions
(MERGE/upsert) and slowly-changing metadata keeps history (SCD2). Both are
expressed here as pure DataFrame->DataFrame plans so they compose with any
sink; ``SnapshotTable.merge`` wraps the upsert in a snapshot-atomic commit
(copy-on-write, Iceberg's default MERGE strategy).

Scale notes:
- ``merge_upsert`` is ONE shuffle (the full-outer join on the key). When
  the source (the change set) is small relative to the target — the common
  incremental-ingest shape — pass ``broadcast_source=True``: Spark cannot
  broadcast a full-outer join, so the plan splits into (a) target
  LEFT-join broadcast(source) for updates/deletes/keeps and (b) matched
  keys harvested with a broadcast semi-join (output ≤ |source|, tiny) and
  anti-joined against the source for the inserts. Both passes over the
  100 TB target are map-only — it never shuffles.
- ``scd2_apply`` joins only the CURRENT slice of the dimension against the
  updates (history rows pass through untouched via a cheap filter), so the
  shuffle is sized by |current| + |updates|, not by the full history.
- Neither uses a window or a sort. MERGE requires at most one source row
  per key (the ON-clause cardinality rule Iceberg/Delta enforce); checked
  here with one cheap aggregate, disable with ``check_cardinality=False``
  when the caller already guarantees it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


class MergeCardinalityError(ValueError):
    """More than one source row matched a single target key (the
    ON-clause cardinality violation Iceberg/Delta raise for MERGE)."""


def _check_unique(df: DataFrame, keys: Sequence[str]) -> None:
    dup = (
        df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise MergeCardinalityError(
            f"duplicate rows for merge keys {list(keys)}"
        )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    broadcast_source: bool = False,
    check_cardinality: bool = True,
) -> DataFrame:
    """MERGE INTO target USING source ON keys:

    - matched + ``delete_col`` true  -> WHEN MATCHED THEN DELETE
    - matched otherwise              -> WHEN MATCHED THEN UPDATE SET *
    - not matched (source-only)      -> WHEN NOT MATCHED THEN INSERT *
      (unless delete-flagged, which inserts nothing)
    - target-only                    -> row kept as-is

    Returns the post-merge table with the target's column set
    (``delete_col`` is control metadata and never lands in the output).
    Presence is tracked with explicit marker columns, never by null-ness
    of data columns — data columns may legitimately be null.
    """
    if check_cardinality:
        _check_unique(source, keys)
    data_cols = [c for c in target.columns if c not in keys]
    del_flag = (
        F.coalesce(F.col(delete_col), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )
    s = source.select(
        *keys,
        F.lit(True).alias("__in_s"),
        del_flag.alias("__del"),
        *[F.col(c).alias(f"__s_{c}") for c in data_cols],
    )

    if broadcast_source:
        # Map-only plan: the target is never shuffled.
        sb = F.broadcast(s)
        j = target.join(sb, list(keys), "left_outer")
        in_s = F.coalesce(F.col("__in_s"), F.lit(False))
        deleted = F.coalesce(F.col("__del"), F.lit(False))
        upd_cols: list[Column] = [F.col(k) for k in keys]
        for c in data_cols:
            upd_cols.append(
                F.when(in_s, F.col(f"__s_{c}")).otherwise(F.col(c)).alias(c)
            )
        kept = j.filter(~in_s | ~deleted).select(*upd_cols)
        # inserts: source keys unseen in the target. The semi-join output
        # is at most |source| rows, so the second join is small-small.
        matched = target.select(*keys).join(
            F.broadcast(source.select(*keys)), list(keys), "left_semi"
        )
        inserts = (
            source.join(F.broadcast(matched), list(keys), "left_anti")
            .filter(~del_flag)
            .select(*keys, *data_cols)
        )
        return kept.unionByName(inserts)

    t = target.select(
        *keys,
        F.lit(True).alias("__in_t"),
        *[F.col(c).alias(f"__t_{c}") for c in data_cols],
    )
    j = t.join(s, list(keys), "full_outer")
    in_t = F.coalesce(F.col("__in_t"), F.lit(False))
    in_s = F.coalesce(F.col("__in_s"), F.lit(False))
    deleted = F.coalesce(F.col("__del"), F.lit(False))
    kept = j.filter((in_t & ~in_s) | (in_s & ~deleted))
    out_cols: list[Column] = [F.col(k) for k in keys]
    for c in data_cols:
        out_cols.append(
            F.when(in_s, F.col(f"__s_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
        )
    return kept.select(*out_cols)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    check_cardinality: bool = True,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 over a history table.

    ``dim`` carries (*keys, *attrs, valid_from, valid_to, is_current);
    ``updates`` carries (*keys, *attrs, ts_col) — at most one row per key
    per batch (checked). For each update whose attrs differ from the key's
    CURRENT row: the current row closes (valid_to = update ts,
    is_current = false) and a new current row opens at the update ts.
    Updates for unseen keys insert a fresh current row. Updates equal to
    the current attrs are no-ops. Historical (already-closed) rows are
    never touched — they bypass the join on a map-only filter.
    """
    if check_cardinality:
        _check_unique(updates, keys)
    keep_cols = [*keys, *attrs, valid_from, valid_to, current_flag]
    history = dim.filter(~F.col(current_flag)).select(*keep_cols)
    current = dim.filter(F.col(current_flag)).select(
        *keys,
        F.lit(True).alias("__in_c"),
        *[F.col(a).alias(f"__c_{a}") for a in attrs],
        F.col(valid_from).alias("__c_from"),
        F.col(valid_to).alias("__c_to"),
    )
    u = updates.select(
        *keys,
        F.lit(True).alias("__in_u"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(ts_col).alias("__u_ts"),
    )
    j = current.join(u, list(keys), "full_outer")
    in_c = F.coalesce(F.col("__in_c"), F.lit(False))
    in_u = F.coalesce(F.col("__in_u"), F.lit(False))
    diff = F.lit(False)
    for a in attrs:
        diff = diff | ~F.col(f"__c_{a}").eqNullSafe(F.col(f"__u_{a}"))
    changed = in_c & in_u & diff

    to_dim = lambda from_col, to_col, cur, src: [  # noqa: E731
        *keys,
        *[F.col(f"__{src}_{a}").alias(a) for a in attrs],
        from_col.alias(valid_from),
        to_col.alias(valid_to),
        F.lit(cur).alias(current_flag),
    ]
    untouched = j.filter(in_c & (~in_u | ~diff)).select(
        *to_dim(F.col("__c_from"), F.col("__c_to"), True, "c")
    )
    closed = j.filter(changed).select(
        *to_dim(F.col("__c_from"), F.col("__u_ts"), False, "c")
    )
    null_to = F.lit(None).cast(dim.schema[valid_to].dataType)
    opened = j.filter(changed | (in_u & ~in_c)).select(
        *to_dim(F.col("__u_ts"), null_to, True, "u")
    )
    return (
        history.unionByName(untouched)
        .unionByName(closed)
        .unionByName(opened)
    )
