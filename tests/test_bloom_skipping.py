"""Per-directory Bloom-filter point-lookup skipping (a34).

Contracts:
- with bloom_cols set, every commit records a per-directory filter for
  the column, built JVM-side from the files just written;
- read(point=(col, v)) / data_dirs(point=...) skip directories whose
  filter proves v absent, and NEVER skip a directory that holds v
  (no false negatives — checked exhaustively over all present keys);
- skipping actually bites: a point lookup on a high-cardinality
  unclustered key scans strictly fewer directories than the snapshot
  holds (where min/max stats are blind — every directory's range
  overlaps);
- merge and compact maintain the filters for their rewritten dirs;
- a missing filter admits (superset guarantee).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators.manifest import (
    _BLOOM_WORDS,
    VersionedTable,
    _bloom_admits,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _mk(spark, tmp_path, n=120, batches=4):
    """n keys spread over `batches` append commits, 2 partitions —
    keys are interleaved across commits (k % batches) so every
    directory's [min, max] k-range overlaps every other: range stats
    cannot prune, only membership can."""
    t = VersionedTable(str(tmp_path / "t"))
    rows = [(k, f"v{k}", k % 2) for k in range(n)]
    t.write_initial(
        _df(spark, [r for r in rows if r[0] % batches == 0]),
        "b",
        stats_cols=["k"],
        bloom_cols=["k"],
    )
    for i in range(1, batches):
        t.append(_df(spark, [r for r in rows if r[0] % batches == i]))
    return t, rows


def test_blooms_recorded_and_lookup_exact(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    m = t._read_manifest()
    all_dirs = [d for ds in m["partitions"].values() for d in ds]
    assert m["bloom_cols"] == ["k"]
    for d in all_dirs:
        words = m["blooms"][d]["k"]
        assert len(words) == _BLOOM_WORDS
        assert any(words)  # something was set
    # exact result through the pruned read
    got = [
        (r.k, r.v, r.b)
        for r in t.read(spark, point=("k", 42)).filter(F.col("k") == 42).collect()
    ]
    assert got == [(42, "v42", 0)]


def test_skipping_bites_where_minmax_is_blind(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    total = len(t.data_dirs())
    m = t._read_manifest()
    # min/max is blind by construction: every dir's k-range overlaps 42
    for d, st in m["stats"].items():
        lo, hi = st["k"]
        assert lo <= 42 <= hi or hi >= 42  # interleaved ranges overlap
    probed = len(t.data_dirs(point=("k", 42), spark=spark))
    assert probed < total  # bloom pruned where ranges could not
    # and the range prune alone keeps everything
    assert len(t.data_dirs(prune=("k", 42, 42))) == total


def test_no_false_negatives_over_all_keys(spark, tmp_path):
    t, rows = _mk(spark, tmp_path, n=80)
    # map key -> dirs that actually contain it
    holding: dict[int, set[str]] = {}
    for d in t.data_dirs():
        ks = {
            r.k
            for r in spark.read.parquet(f"{t.root}/{d}").select("k").collect()
        }
        for k in ks:
            holding.setdefault(k, set()).add(d)
    for k, dirs in holding.items():
        admitted = set(t.data_dirs(point=("k", int(k)), spark=spark))
        assert dirs <= admitted, f"bloom false negative for key {k}"


def test_merge_and_compact_maintain_blooms(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    t.merge(_df(spark, [(42, "patched", 0)]), key_cols=["k"], partition_col="b")
    got = [
        (r.k, r.v)
        for r in t.read(spark, point=("k", 42)).filter(F.col("k") == 42).collect()
    ]
    assert got == [(42, "patched")]
    t.compact(spark)
    m = t._read_manifest()
    for d in (d for ds in m["partitions"].values() for d in ds):
        assert "k" in m["blooms"].get(d, {}), f"compact dropped bloom for {d}"
    got = [
        (r.k, r.v)
        for r in t.read(spark, point=("k", 42)).filter(F.col("k") == 42).collect()
    ]
    assert got == [(42, "patched")]
    # post-compact: 2 dirs, a lookup admits at most both, still exact
    assert len(t.data_dirs(point=("k", 42), spark=spark)) <= len(t.data_dirs())


def test_missing_filter_admits(spark, tmp_path):
    assert _bloom_admits(None, [1, 2, 3])
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")  # NO bloom_cols
    # point lookup on a bloom-less table keeps every dir (superset rule)
    assert t.data_dirs(point=("k", 1), spark=spark) == t.data_dirs()


def test_point_lookup_needs_spark_and_value(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=16, batches=2)
    with pytest.raises(ValueError, match="needs spark"):
        t.data_dirs(point=("k", 1))
    with pytest.raises(ValueError, match="non-null"):
        t.read(spark, point=("k", None))
