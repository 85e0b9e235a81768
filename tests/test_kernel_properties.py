"""Property tests: the kernel never raises, always classifies (the reference's
"error channel, never poison the pipeline" contract — /root/reference/
src/services/job_processor.py:155-179), and its invariants hold on arbitrary
input. Inside a Spark UDF an exception would abort the task; classification
must be total.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from png_from_pdf_extracter_spark.extractor import ExtractorConfig, extract
from png_from_pdf_extracter_spark.extractor.kernel import UNIT_SEP

CFG = ExtractorConfig(max_bytes=1 << 20, max_units=64)

VALID_STATUS = {"ok", "no_payload", "empty", "error"}
VALID_ERR = {"", "corrupted", "protected", "too_large", "timeout"}

payloads = st.one_of(
    st.text(max_size=2000),
    st.text(alphabet="<>/ab%PDFhtml-pE()Tjoq\\ \n\t&;#x0123", max_size=2000),
    st.binary(max_size=500).map(lambda b: b.decode("latin-1")),
)


@given(payloads)
@settings(max_examples=300, deadline=None)
def test_total_classification_no_crash(text):
    r = extract(text, CFG)
    assert r.status in VALID_STATUS
    assert r.error_class in VALID_ERR
    if r.status != "ok":
        assert r.units == []
    else:
        assert len(r.units) >= 1


@given(payloads)
@settings(max_examples=200, deadline=None)
def test_invariants(text):
    r = extract(text, CFG)
    # unit ordinals are dense and 1-indexed (ref pdf_converter.py:141-158)
    assert [u.unit_idx for u in r.units] == list(range(1, len(r.units) + 1))
    # extracted_text is exactly the unit join (the reassembly contract the
    # Spark window/groupBy must reproduce)
    assert r.extracted_text == UNIT_SEP.join(u.text for u in r.units)
    # spans index into the original text
    for s, e, kind in r.spans:
        assert 0 <= s <= e <= len(text)
        assert kind in {"plain", "main", "heading", "page"}
    # determinism
    r2 = extract(text, CFG)
    assert r2.extracted_text == r.extracted_text
    assert r2.spans == r.spans
    assert (r2.status, r2.error_class) == (r.status, r.error_class)
