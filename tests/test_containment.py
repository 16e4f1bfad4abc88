"""j44 / operators/dedup.containment_pairs — asymmetric near-dup tier.

The prefix-filter adaptation must be EXACT (zero false negatives vs brute
force), directional (src subsumed in dst, not vice versa), and planned
without a cartesian.
"""

from __future__ import annotations

from scopus_spark.operators.dedup import containment_pairs


def _shingles(text: str, k: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _brute_force(docs: list[tuple[int, str]], t: float) -> set[tuple[int, int]]:
    out = set()
    for a, ta in docs:
        sa = _shingles(ta)
        if not sa:
            continue
        for b, tb in docs:
            if a == b:
                continue
            inter = len(sa & _shingles(tb))
            if inter / len(sa) >= t:
                out.add((a, b))
    return out


def _mk_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_short_doc_embedded_in_long_is_directional(spark):
    long_text = " ".join(f"w{i}" for i in range(60))
    short_text = " ".join(f"w{i}" for i in range(20, 35))  # embedded span
    docs = [(1, short_text), (2, long_text), (3, " ".join(f"x{i}" for i in range(30)))]
    got = {
        (r.src_doc, r.dst_doc): r.containment
        for r in containment_pairs(_mk_df(spark, docs), threshold=0.8).collect()
    }
    # the short doc is fully contained forward, invisible to the reverse
    assert got == {(1, 2): 1.0}


def test_exact_duplicates_emit_both_directions(spark):
    t = " ".join(f"t{i}" for i in range(25))
    docs = [(7, t), (8, t)]
    got = {
        (r.src_doc, r.dst_doc): r.containment
        for r in containment_pairs(_mk_df(spark, docs), threshold=0.8).collect()
    }
    assert got == {(7, 8): 1.0, (8, 7): 1.0}


def test_zero_false_negatives_vs_brute_force(spark):
    """Deterministic mixed corpus: overlapping spans of a shared word
    stream at varying lengths/offsets — every brute-force pair must
    surface, with the exact same containment values."""
    stream = [f"s{i * 7 % 53}" for i in range(200)]
    docs = []
    for d in range(24):
        off = (d * 13) % 120
        ln = 12 + (d * 5) % 60
        docs.append((d, " ".join(stream[off : off + ln])))
    expected = _brute_force(docs, 0.8)
    rows = containment_pairs(_mk_df(spark, docs), threshold=0.8).collect()
    got = {(r.src_doc, r.dst_doc) for r in rows}
    assert got == expected
    # spot-check values against brute force at 6dp
    for r in rows:
        sa = _shingles(dict(docs)[r.src_doc])
        sb = _shingles(dict(docs)[r.dst_doc])
        assert abs(r.containment - round(len(sa & sb) / len(sa), 6)) < 1e-9


def test_no_cartesian_in_plan(spark, sf_dir):
    from scopus_spark.catalog import table

    d = table(spark, sf_dir, "documents")
    plan = (
        containment_pairs(d, threshold=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
