"""Z-order clustered writes (Catalog.write_zordered): every listed
column must get file-level locality, i.e. each output file's footer
min/max range for BOTH columns is a small slice of the global range —
that is the property parquet scan pruning feeds on. Single-dimension
range clustering deliberately fails this for the second column, which is
the point of z-ordering."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.sources import Catalog


def _avg_file_span(table_dir: str, col: str, global_span: float) -> float:
    spans = []
    for f in glob.glob(f"{table_dir}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        spans.append((mx - mn) / global_span)
    assert spans
    return sum(spans) / len(spans)


def test_zorder_gives_both_columns_locality(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    n = 1 << 14
    # two independent uniform dimensions (decorrelated by hashing)
    df = spark.range(n).select(
        (F.col("id") % 128).alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(128)).alias("b"),
    )
    cat.write_zordered(df, "z", ["a", "b"], n_files=16, bits=7)
    cat.write_clustered(df, "r", ["a"], n_files=16)

    za = _avg_file_span(cat.path("z"), "a", 127.0)
    zb = _avg_file_span(cat.path("z"), "b", 127.0)
    ra = _avg_file_span(cat.path("r"), "a", 127.0)
    rb = _avg_file_span(cat.path("r"), "b", 127.0)

    # range clustering: perfect on its sort key, useless on the other
    assert ra < 0.2 and rb > 0.8
    # z-order: BOTH columns see a much narrower per-file range
    assert za < 0.6 and zb < 0.6, (za, zb)

    # data is intact and both filters still return identical results
    z = spark.read.parquet(cat.path("z"))
    assert z.count() == n
    got = z.filter("a between 10 and 20 and b between 30 and 40").count()
    want = df.filter("a between 10 and 20 and b between 30 and 40").count()
    assert got == want


def test_zorder_constant_column_degrades_gracefully(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df = spark.range(1000).select(
        F.lit(5).alias("a"), (F.col("id") % 50).alias("b")
    )
    cat.write_zordered(df, "zc", ["a", "b"], n_files=4, bits=6)
    z = spark.read.parquet(cat.path("zc"))
    assert z.count() == 1000
    assert _avg_file_span(cat.path("zc"), "b", 49.0) < 0.5
