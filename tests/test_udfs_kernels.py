"""Python-boundary kernels (k-family) — driver-side unit coverage of
the numpy kernels the cogrouped/grouped applyInPandas keys wrap.

k10's follow-up counter must be hot-key safe: 10^5 orders x 10^5 events
for ONE cogroup key runs in bounded memory (searchsorted interval
counting, never an n_o x n_e matrix) and agrees with the brute-force
count on small inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd

from scopus_spark.queries.udfs import _count_followups


def _frames(od_hours: list[int], ev_hours: list[int]):
    base = np.datetime64("2024-01-01T00:00", "us")
    h = np.timedelta64(1, "h")
    odf = pd.DataFrame({"od": [base + x * h for x in od_hours]})
    edf = pd.DataFrame({"ts": [base + x * h for x in ev_hours]})
    return odf, edf


def test_matches_bruteforce_small():
    odf, edf = _frames([0, 10, 48], [1, 5, 23, 24, 30, 49, 80])
    od = odf["od"].to_numpy(dtype="datetime64[us]")
    ts = edf["ts"].to_numpy(dtype="datetime64[us]")
    day = np.timedelta64(1, "D")
    brute = int(
        ((ts[None, :] >= od[:, None]) & (ts[None, :] < od[:, None] + day)).sum()
    )
    assert _count_followups(odf, edf) == brute == 3 + 3 + 1


def test_boundary_semantics_inclusive_exclusive():
    # event AT the order time counts; event exactly +24h does not
    odf, edf = _frames([0], [0, 24])
    assert _count_followups(odf, edf) == 1


def test_unsorted_events_handled():
    odf, edf = _frames([0], [30, 1, 23, 50, 2])
    assert _count_followups(odf, edf) == 3


def test_hot_key_bounded_memory():
    """1e5 x 1e5 on one key: the matrix form would need ~10 GB; the
    searchsorted form finishes in well under a second and a few MB."""
    n = 100_000
    base = np.datetime64("2024-01-01T00:00", "us")
    sec = np.timedelta64(1, "s")
    odf = pd.DataFrame({"od": base + np.arange(n) * sec})
    edf = pd.DataFrame({"ts": base + (np.arange(n)[::-1] * 2) * sec})
    got = _count_followups(odf, edf)
    # analytic check: order i at t=i s covers events in [i, i+86400) s;
    # events sit at even seconds 0..2(n-1), so each order sees
    # ceil(min(86400, 2n - i) / 2) events (clipped at the tail)
    want = sum(
        max(0, (min(i + 86400, 2 * n - 1) - i + 1 + (1 if i % 2 == 0 else 0)) // 2)
        for i in range(n)
    )
    # compute want precisely instead: count even numbers in [i, i+86400)
    want = 0
    for i in range(n):
        lo, hi = i, min(i + 86400, 2 * (n - 1) + 1)
        if hi <= lo:
            continue
        want += (hi - 1 - (lo if lo % 2 == 0 else lo + 1)) // 2 + 1
    assert got == want
