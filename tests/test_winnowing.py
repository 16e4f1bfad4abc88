"""j39 winnowing — the POSITIONAL detection guarantee is the whole point:
any substring of length >= w + k - 1 shared by two documents must produce
at least one shared fingerprint value. Property-checked against the
registry implementation on adversarial shared-substring pairs.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

K, W = 5, 4
GUARANTEE = W + K - 1  # 8


def _winnow(text: str) -> set[tuple[int, str]]:
    """Reference implementation (pure python) of the registered rule:
    char k-gram md5 hex, windows of w, rightmost-min selection."""
    if len(text) < GUARANTEE:
        return set()
    grams = [
        hashlib.md5(text[i : i + K].encode()).hexdigest()
        for i in range(len(text) - K + 1)
    ]
    out = set()
    for i in range(len(grams) - W + 1):
        window = grams[i : i + W]
        m = min(window)
        # rightmost occurrence
        pos = i + max(j for j, h in enumerate(window) if h == m)
        out.add((pos + 1, m))  # 1-based like the SQL
    return out


@settings(max_examples=200, deadline=None)
@given(
    pre_a=st.text(alphabet="abcdefg ", max_size=30),
    pre_b=st.text(alphabet="abcdefg ", max_size=30),
    shared=st.text(alphabet="hijklmn ", min_size=GUARANTEE, max_size=25),
    suf_a=st.text(alphabet="abcdefg ", max_size=30),
    suf_b=st.text(alphabet="abcdefg ", max_size=30),
)
def test_shared_substring_guarantees_shared_fingerprint(
    pre_a, pre_b, shared, suf_a, suf_b
):
    a = pre_a + shared + suf_a
    b = pre_b + shared + suf_b
    fps_a = {fp for _, fp in _winnow(a)}
    fps_b = {fp for _, fp in _winnow(b)}
    assert fps_a & fps_b, (a, b)


def test_spark_matches_reference_implementation(spark):
    """The registered Spark expression equals the pure-python reference on
    tricky strings (ties, repeats, minimum-length, below-minimum)."""
    from pyspark.sql import functions as F

    from scopus_spark.operators.text import winnow_fingerprints

    texts = [
        "abcdefgh",                # exactly the guarantee length
        "abcdefg",                 # below it: must be empty
        "aaaaaaaaaaaa",            # all grams identical: tie-break stress
        "abcabcabcabcabc",         # periodic
        "the quick brown fox jumps over the lazy dog",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = (
        df.select("doc_id", F.explode(winnow_fingerprints("text")).alias("s"))
        .select("doc_id", "s.pos", "s.fp")
        .distinct()
        .collect()
    )
    got = {}
    for r in out:
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow(t), t
