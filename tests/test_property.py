"""Property-based tests (hypothesis): the distributed pipeline equals the
independent pure-Python golden extractor on FUZZED inputs, not just the
seeded corpus — SURVEY §5's property-test layer.

Invariant under test (BASELINE.json): per document, the ordered
(kind, text, media_ref, order) sequence, for arbitrary well-formed inputs
(unique offsets per doc — the input contract; any int32 values, any unicode
text, HTML-ish noise, None texts).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from medical_ocr_service_spark.corpus import generator, golden
from medical_ocr_service_spark.operators import extract

SPAN_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "Zs"), include_characters="<>/\n "
        ),
        max_size=120,
    ),
)


@st.composite
def _doc(draw, idx: int):
    n = draw(st.integers(min_value=1, max_value=10))
    offsets = draw(
        st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    spans = []
    for off in offsets:
        txt = draw(_text)
        if draw(st.booleans()) and txt:
            txt = f"<html><nav>home | menu</nav>\n<p>{txt}</p>\n<footer>(c)</footer>"
        spans.append(("text", txt, None, off))
    return (f"fz{idx:04d}", spans)


@st.composite
def _batch(draw):
    k = draw(st.integers(min_value=1, max_value=8))
    return [draw(_doc(i)) for i in range(k)]


def _golden_seq(docs_rows):
    out = {}
    for doc_id, spans in docs_rows:
        doc = {
            "doc_id": doc_id,
            "spans": [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in spans
            ],
        }
        g = golden.extract_document(doc, {})
        out[doc_id] = [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in g["spans"]
        ]
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs_rows=_batch())
def test_prop_fuzzed_text_docs_span_equality(spark, docs_rows):
    df = spark.createDataFrame(docs_rows, schema=SPAN_SCHEMA)
    media = spark.createDataFrame(
        [], schema="media_ref string, layout_json string, width int, height int"
    )
    got = {}
    for r in extract.ordered_spans(df, media).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["kind"], r["text"], r["media_ref"], r["order"])
        )
    for v in got.values():
        v.sort(key=lambda s: s[3])
    expected = _golden_seq(docs_rows)
    # docs whose every span strips to nothing still appear (order ranks all
    # spans, not just non-empty ones); empty-span docs are absent from both
    assert got == {k: v for k, v in expected.items() if v}


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=1, max_value=2**31 - 1))
def test_prop_seeded_corpus_full_equality(spark, seed):
    """Any generator seed (not just the fixture seed): full pipeline incl.
    media XY-cut equals the golden extractor span-for-span."""
    docs, media_rows = generator.synthesize_corpus(25, seed=seed, pathological=False)
    doc_rows = [
        (
            d["doc_id"],
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
        )
        for d in docs
    ]
    df = spark.createDataFrame(doc_rows, schema=SPAN_SCHEMA)
    media = spark.createDataFrame(
        [
            (m["media_ref"], m["layout_json"], m["width"], m["height"])
            for m in media_rows
        ],
        schema="media_ref string, layout_json string, width int, height int",
    )
    got = {}
    for r in extract.ordered_spans(df, media).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["kind"], r["text"], r["media_ref"], r["order"])
        )
    for v in got.values():
        v.sort(key=lambda s: s[3])
    expected = {
        g["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in g["spans"]
        ]
        for g in golden.extract_corpus(docs, media_rows)
    }
    assert got == expected
