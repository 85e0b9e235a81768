"""png_from_pdf_extracter_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of the capabilities of
Soneritics/png-from-pdf-extracter (an IMAP->PDF->PNG->SMTP dataflow daemon,
see /root/reference) as an idiomatic PySpark batch/streaming pipeline over a
table of multi-turn transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
- ``extractor/``  pure-Python extraction kernel (no Spark imports) — the analog
  of the reference's MIME walk + pdf_converter subprocess kernel.
- ``datagen/``    deterministic synthetic transcripts + golden expected outputs.
- ``sources/``    parquet-backed catalog (Iceberg-style table API) + readers.
- ``functions/``  Column-level function library (sanitize, text analysis,
  dedup, similarity) built on pyspark.sql.functions.
- ``operators/``  job-level operators: salted repartition, stable ordering,
  quarantine split, anti-join resume.
- ``plans/``      the flagship end-to-end extraction plan + lineage metrics.
- ``streaming/``  Structured Streaming variant of the plan.
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = __version__
