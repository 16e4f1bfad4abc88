"""j42 BM25: exactness against a driver-side reference implementation of
the Okapi/Lucene formula, plus ranking sanity (more hits never hurts a
doc of equal length/tf profile is NOT asserted — BM25 doesn't promise it;
what IS promised: only hit docs appear, scores positive, idf from df)."""

from __future__ import annotations

import math
from collections import Counter

from scopus_spark.catalog import table
from scopus_spark.queries.pipeline import _BM25_B, _BM25_K1, _BM25_TERMS
from scopus_spark.registry import all_queries

Q = all_queries()

SMOKE_SF = "/root/testdata/sf0.001"


def _reference_bm25(texts: dict[int, str]):
    toks = {d: t.split(" ") for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    tf = {d: Counter(tok for tok in w if tok in _BM25_TERMS) for d, w in toks.items()}
    df = {t: sum(1 for c in tf.values() if c[t] > 0) for t in _BM25_TERMS}
    out = {}
    for d, c in tf.items():
        if not c:
            continue
        score = 0.0
        for t in _BM25_TERMS:
            if c[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            dl = len(toks[d])
            score += (
                idf
                * c[t]
                * (_BM25_K1 + 1)
                / (c[t] + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl))
            )
        out[d] = (sum(1 for t in _BM25_TERMS if c[t] > 0), round(score, 4))
    return out


def test_j42_matches_reference_exactly(spark):
    texts = {
        r["doc_id"]: r["text"] for r in table(spark, SMOKE_SF, "documents").collect()
    }
    want = _reference_bm25(texts)
    got = {
        r["doc_id"]: (r["n_hits"], r["bm25"])
        for r in Q["j42"](spark, SMOKE_SF).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        assert abs(got[d][1] - want[d][1]) <= 1e-4, (d, got[d], want[d])


def test_j42_invariants(spark, sf_dir):
    rows = Q["j42"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_hits"] <= len(_BM25_TERMS)  # only hit docs emitted
        assert r["bm25"] > 0.0
