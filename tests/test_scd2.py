"""e10 SCD Type-2 invariants: per key the validity intervals tile the
timeline (half-open, contiguous, non-overlapping), versions are dense,
exactly one row is current, and consecutive intervals really changed."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.registry import all_queries

Q = all_queries()


def test_e10_interval_tiling_and_versions(spark, sf_dir):
    rows = Q["e10"](spark, sf_dir).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    assert per_user  # non-empty
    for uid, rs in per_user.items():
        rs.sort(key=lambda r: r["version"])
        # dense versions from 1
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        # exactly one open (current) interval, and it is the last one
        currents = [r for r in rs if r["is_current"]]
        assert len(currents) == 1 and currents[0] is rs[-1]
        assert rs[-1]["effective_to"] is None
        for a, b in zip(rs, rs[1:]):
            # half-open contiguity: [from, to) tiles with no gap/overlap
            assert a["effective_to"] == b["effective_from"], (uid, a, b)
            assert a["effective_from"] < a["effective_to"]
            # a Type-2 row exists only because the attribute CHANGED
            assert a["attr"] != b["attr"], (uid, a, b)


def test_e10_first_interval_starts_at_first_event(spark, sf_dir):
    firsts = {
        r["user_id"]: r["first_ts"]
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .collect()
    }
    v1 = {
        r["user_id"]: r["effective_from"]
        for r in Q["e10"](spark, sf_dir).filter(F.col("version") == 1).collect()
    }
    assert v1 == firsts
