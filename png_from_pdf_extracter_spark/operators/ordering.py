"""Stable ordering + group-reassembly.

The reference guarantees page order by ``sorted(glob(...))`` with 1-indexed
ordinals (``/root/reference/src/services/pdf_converter.py:133-158``) and
reassembles all pages of all PDFs of one message into a single reply
(``job_processor.py:106-146``). After parallel execution order is gone; we
restore it *logically*: ``sort_array(collect_list(struct(...)))`` keyed by
``unit_idx`` per turn, and by ``turn_idx`` per conversation. ``sort_array``
on a struct column sorts by the first field — keep the ordinal first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extractor.kernel import UNIT_SEP


def explode_units(extracted: DataFrame) -> DataFrame:
    """Per-turn rows (with ``units`` array) -> per-unit rows. The analog of
    the reference's one-PDF -> N-page fan-out."""
    return (
        extracted.filter(F.size("units") > 0)
        .select(
            "conv_id",
            "turn_idx",
            "partition_id",
            F.posexplode("units").alias("pos", "unit"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "partition_id",
            F.col("unit.unit_idx").alias("unit_idx"),
            F.col("unit.unit_text").alias("unit_text"),
            F.col("unit.spans").alias("spans"),
        )
    )


def reassemble_turns(units: DataFrame) -> DataFrame:
    """Per-unit rows -> per-turn text under stable unit ordering. Must
    reproduce the kernel's ``UNIT_SEP.join`` byte-for-byte (the determinism
    contract the equality tests check)."""
    assembled = F.sort_array(
        F.collect_list(F.struct("unit_idx", "unit_text", "spans"))
    )
    return units.groupBy("conv_id", "turn_idx").agg(
        F.array_join(
            F.transform(assembled, lambda u: u["unit_text"]), UNIT_SEP
        ).alias("extracted_text"),
        F.flatten(F.transform(assembled, lambda u: u["spans"])).alias("spans"),
        F.count("*").cast("int").alias("n_units"),
    )


def conversation_rollup(turns: DataFrame) -> DataFrame:
    """Conversation-level reassembly (the 'single reply regardless of size'
    semantics, ref spec.md:80): all extracted turns of a conversation joined
    in turn order, plus counts."""
    assembled = F.sort_array(
        F.collect_list(F.struct("turn_idx", "extracted_text"))
    )
    return turns.groupBy("conv_id").agg(
        F.array_join(
            F.transform(assembled, lambda t: t["extracted_text"]), UNIT_SEP
        ).alias("conv_text"),
        F.count("*").cast("int").alias("n_turns"),
        F.sum(F.length("extracted_text")).alias("total_chars"),
    )
