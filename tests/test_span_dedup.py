"""strip_repeated_spans (CCNet-style span-level dedup) vs a python oracle."""

from __future__ import annotations

import math

import pytest

from graphblas_algorithms_spark.pipeline.text import strip_repeated_spans


def _py_oracle(docs: list[tuple[int, str]], span: int, min_docs: int):
    """Reference implementation: exact same windowing/normalization."""
    spans = {}  # doc_id -> [(idx, span_text)]
    for doc_id, text in docs:
        toks = " ".join(text.lower().strip().split()).split(" ")
        n = math.ceil(len(toks) / span)
        spans[doc_id] = [
            (i, " ".join(toks[i * span : (i + 1) * span])) for i in range(n)
        ]
    df = {}
    for doc_id, lst in spans.items():
        for _, s in lst:
            df.setdefault(s, set()).add(doc_id)
    dup = {s for s, ids in df.items() if len(ids) >= min_docs}
    out = {}
    for doc_id, lst in spans.items():
        kept = [s for _, s in lst if s not in dup]
        out[doc_id] = (" ".join(kept), len(lst), len(lst) - len(kept))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog alpha beta gamma"),
    (1, "the quick brown fox jumps over the lazy dog delta epsilon zeta"),
    (2, "completely unique content with no shared windows at all here now"),
    (3, "short doc"),
    (4, "short doc"),  # whole doc duplicated -> empty clean_text
    (5, "  The   QUICK brown fox JUMPS over the lazy dog alpha beta gamma "),
]


@pytest.mark.parametrize("span,min_docs", [(4, 2), (8, 2), (3, 3)])
def test_matches_python_oracle(spark, span, min_docs):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_spans_dropped"])
        for r in strip_repeated_spans(docs, span, min_docs).collect()
    }
    want = _py_oracle(DOCS, span, min_docs)
    assert got == want


def test_fully_duplicated_doc_emits_empty_string(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in strip_repeated_spans(docs, span_tokens=2, min_docs=2).collect()
    }
    assert out[3]["clean_text"] == "" and out[4]["clean_text"] == ""
    assert out[3]["n_spans_dropped"] == out[3]["n_spans"]
    # normalization: doc 5 is doc 0 modulo case/whitespace, so their shared
    # windows are dropped from BOTH
    assert out[5]["n_spans_dropped"] > 0


def test_no_duplicates_is_identity_modulo_normalization(spark):
    docs = spark.createDataFrame([DOCS[2]], ["doc_id", "text"])
    row = strip_repeated_spans(docs, span_tokens=4, min_docs=2).collect()[0]
    assert row["clean_text"] == DOCS[2][1]
    assert row["n_spans_dropped"] == 0


def test_rejects_bad_span(spark):
    docs = spark.createDataFrame([DOCS[0]], ["doc_id", "text"])
    with pytest.raises(ValueError, match="span_tokens"):
        strip_repeated_spans(docs, span_tokens=0)
