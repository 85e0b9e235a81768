"""Dataset-level data-quality verification — the Deequ / Great
Expectations shape: declare constraints on a table, verify them ALL in
one aggregation pass, get back a (check, column, observed, passed)
report.

This is the table-granularity complement to ``operators/validate.py``
(which classifies individual rows into a quarantine channel): validate
answers "which rows are bad", expectations answers "does this snapshot
of the corpus meet its contract" — the gate a 100 TB ingest pipeline
runs before promoting a snapshot.

Scale design: every declared check compiles to one or more aggregate
EXPRESSIONS over the same scan, so N checks cost ONE job with a single
combinable aggregate (count/sum/min/max/count_distinct), not N table
passes — the core Deequ trick. The single-row aggregate result is then
unpivoted to report rows with ``stack``; nothing is collected to the
driver. ``approx_unique=True`` swaps exact count_distinct for HLL++
``approx_count_distinct`` — at web scale the exact distinct forces a
shuffle of every distinct value, while the sketch stays map-combinable.

All JVM builtins; no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declared expectation. ``kind`` is one of:

    - ``complete``      no NULLs in ``col``
    - ``unique``        no duplicate values in ``col`` (NULLs ignored)
    - ``min_ge``        min(col) >= value
    - ``max_le``        max(col) <= value
    - ``mean_between``  value <= avg(col) <= value2
    - ``in_set``        every non-NULL value is in ``values``
    - ``non_empty``     table has at least one row

    ``observed`` in the report is, respectively: null count, duplicate
    count, min, max, mean, violation count, row count.
    """

    kind: str
    col: str = ""
    value: float = 0.0
    value2: float = 0.0
    values: tuple = field(default_factory=tuple)

    def __post_init__(self):
        kinds = (
            "complete", "unique", "min_ge", "max_le", "mean_between",
            "in_set", "non_empty",
        )
        if self.kind not in kinds:
            raise ValueError(f"unknown check kind {self.kind!r}")
        if self.kind != "non_empty" and not self.col:
            raise ValueError(f"check {self.kind!r} needs a column")
        if self.kind == "in_set" and not self.values:
            raise ValueError("in_set needs a non-empty values tuple")


def _observed(c: Check) -> Column:
    """The single aggregate expression whose value decides the check."""
    col = F.col(c.col) if c.col else None
    if c.kind == "complete":
        return F.count_if(col.isNull())
    if c.kind == "unique":
        return F.count(col) - F.count_distinct(col)
    if c.kind == "min_ge":
        return F.min(col).cast("double")
    if c.kind == "max_le":
        return F.max(col).cast("double")
    if c.kind == "mean_between":
        return F.avg(col)
    if c.kind == "in_set":
        vals = F.array(*[F.lit(v) for v in c.values])
        return F.count_if(col.isNotNull() & ~F.array_contains(vals, col))
    return F.count(F.lit(1))  # non_empty


def _passed(c: Check, observed: Column) -> Column:
    if c.kind in ("complete", "unique", "in_set"):
        return observed == 0
    if c.kind == "min_ge":
        return observed >= F.lit(float(c.value))
    if c.kind == "max_le":
        return observed <= F.lit(float(c.value))
    if c.kind == "mean_between":
        return (observed >= F.lit(float(c.value))) & (
            observed <= F.lit(float(c.value2))
        )
    return observed > 0  # non_empty


def expectation_report(
    df: DataFrame, checks: list, approx_unique: bool = False
) -> DataFrame:
    """Verify every ``Check`` in one aggregation pass over ``df``.

    Returns (check, col_name, observed double, passed boolean), one row
    per declared check. ``observed`` is rounded to 6 for cross-engine
    hash agreement; ``passed`` is decided on the UNROUNDED aggregate
    (counts are integers anyway; for mean/min/max gates a threshold set
    within 1e-6 of the true value is a mis-specified contract, not a
    rounding concern).
    """
    if not checks:
        raise ValueError("no checks declared")
    aggs = []
    for i, c in enumerate(checks):
        obs = _observed(c)
        if approx_unique and c.kind == "unique":
            obs = F.count(F.col(c.col)) - F.approx_count_distinct(c.col)
        aggs.append(F.round(obs.cast("double"), 6).alias(f"_o{i}"))
        aggs.append(_passed(c, obs.cast("double")).alias(f"_p{i}"))
    row = df.agg(*aggs)
    cells = ", ".join(
        f"'{c.kind}', '{c.col}', _o{i}, _p{i}" for i, c in enumerate(checks)
    )
    return row.selectExpr(
        f"stack({len(checks)}, {cells}) AS (check, col_name, observed, passed)"
    )
