"""operators/text.learn_bpe — the distributed merge table must equal a
single-node reference implementation of BPE (Sennrich et al. 2016:
word-frequency table, most-frequent adjacent pair, greedy non-overlapping
left-to-right merge, count-then-lexicographic tie-break), rule for rule."""

from __future__ import annotations

import re
from collections import Counter

from scopus_spark.operators.text import learn_bpe


def _ref_bpe(texts: list[str], n_merges: int):
    vocab = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                vocab[w] += 1
    words = {tuple(list(w) + ["</w>"]): f for w, f in vocab.items()}
    out = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (lt, rt), cnt = best
        out.append((rank, lt, rt, lt + rt, cnt))
        new_words = {}
        for syms, f in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lt and syms[i + 1] == rt:
                    merged.append(lt + rt)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_words[tuple(merged)] = new_words.get(tuple(merged), 0) + f
        words = new_words
    return out


def _spark_bpe(spark, texts: list[str], n: int):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in learn_bpe(df, "text", n_merges=n)
        .orderBy("merge_rank")
        .collect()
    ]


def test_constructed_corpus(spark):
    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "that hat is the cat hat",
        "aaa aaab abab",
    ]
    assert _spark_bpe(spark, texts, 8) == _ref_bpe(texts, 8)


def test_overlapping_runs_merge_greedily(spark):
    """'aaaa' under merge (a,a) must become (aa, aa), never (a, aa, a) —
    the greedy non-overlapping contract."""
    texts = ["aaaa aaaa aaaa aa"]
    got = _spark_bpe(spark, texts, 2)
    want = _ref_bpe(texts, 2)
    assert got == want
    assert got[0][1:4] == ("a", "a", "aa")


def test_early_exhaustion(spark):
    """Fewer possible merges than requested: both stop at the same rank."""
    texts = ["ab ab ab"]
    assert _spark_bpe(spark, texts, 50) == _ref_bpe(texts, 50)


def test_j46_matches_reference_on_documents(spark, sf_dir):
    from scopus_spark.catalog import table
    from scopus_spark.queries.pipeline import j46_bpe_vocab

    texts = [r.text for r in table(spark, sf_dir, "documents").collect()]
    want = _ref_bpe(texts, 12)
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in j46_bpe_vocab(spark, sf_dir).orderBy("merge_rank").collect()
    ]
    assert got == want and len(got) == 12


def _py_apply_merge(syms, lt, rt, merged):
    """Reference greedy left-to-right non-overlapping merge."""
    out = []
    for s in syms:
        if out and out[-1] == lt and s == rt:
            out[-1] = merged
        else:
            out.append(s)
    return out


def test_bpe_encode_matches_reference_encoder(spark, sf_dir):
    """Token arrays from the distributed encoder equal a pure-python
    greedy encoder applying the same rules in rank order."""
    import re

    from scopus_spark.catalog import table
    from scopus_spark.operators.text import bpe_encode, learn_bpe

    d = table(spark, sf_dir, "documents").limit(25)
    merges = learn_bpe(d, "text", n_merges=8)
    rules = [
        (r["left"], r["right"], r["merged"])
        for r in merges.orderBy("merge_rank").collect()
    ]
    got = {
        (r["doc_id"], r["word_no"]): (r["w"], list(r["tokens"]))
        for r in bpe_encode(d, merges, "text").collect()
    }
    for row in d.select("doc_id", "text").collect():
        words = [w for w in re.split("[^a-z]+", row["text"].lower()) if w]
        for i, w in enumerate(words):
            syms = list(w) + ["</w>"]
            for lt, rt, merged in rules:
                syms = _py_apply_merge(syms, lt, rt, merged)
            assert got[(row["doc_id"], i)] == (w, syms), (row["doc_id"], i, w)


def test_bpe_encode_word_no_preserves_positions(spark, sf_dir):
    from scopus_spark.catalog import table
    from scopus_spark.operators.text import bpe_encode, learn_bpe
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents").limit(10)
    merges = learn_bpe(d, "text", n_merges=4)
    enc = bpe_encode(d, merges, "text")
    per_doc = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("word_no").alias("lo"),
        F.max("word_no").alias("hi"),
    )
    for r in per_doc.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
