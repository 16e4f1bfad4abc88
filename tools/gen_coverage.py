"""Regenerate docs/COVERAGE.md from the live registry.

Run after adding/removing declared keys:

    python tools/gen_coverage.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scopus_spark import registry  # noqa: E402


def natural(key: str) -> tuple:
    m = re.match(r"([a-z]+)(\d*)", key)
    return (m.group(1), int(m.group(2) or 0))


def main() -> None:
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    lines = [
        "# COVERAGE — SURVEY §2 inventory → implementation map",
        "",
        "Generated from `scopus_spark.registry` (every row is a live"
        " `queries()` key) by `tools/gen_coverage.py`.",
        "",
        "| key | check | implementation | summary |",
        "| --- | --- | --- | --- |",
    ]
    for key in sorted(queries, key=natural):
        fn = queries[key]
        check = "HASH" if key in oracles else "ROWS+unit"
        impl = f"`q/{fn.__module__.rsplit('.', 1)[-1]}.{fn.__name__}`"
        summary = (fn.__doc__ or "").strip().splitlines()
        lines.append(f"| {key} | {check} | {impl} | {summary[0] if summary else ''} |")
    n_hash = len(oracles)
    lines += [
        "",
        f"**{len(queries)} declared keys, {n_hash} HASH-checked.** The"
        " remaining keys are ROWS/UNIT by design (approximate, plan-assert,"
        " or streaming-only — see SURVEY §2).",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(queries)} keys, {n_hash} HASH")


if __name__ == "__main__":
    main()
