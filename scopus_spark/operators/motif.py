"""GraphFrames-style motif finding over plain edge DataFrames.

The n-family covers the dup-graph ALGORITHMS relationally (degrees,
connected components, label propagation, pagerank, collapse); this module
adds the missing API veneer: a `find(edges, pattern)` that compiles a
GraphFrames motif pattern into the chain of Catalyst equi-joins the
algorithms already use — declarative plan in, Catalyst-optimized joins
out, no new execution machinery.

Pattern grammar (the GraphFrames subset that covers its documented
examples):

    pattern := term (";" term)*
    term    := "(A)-[E]->(B)"        positive edge, names optional
             | "!(A)-[]->(B)"        negated edge (anonymous edge only,
                                     both vertices must be bound by a
                                     positive term)

Named vertices bind ACROSS terms (the same name is the same vertex).
Anonymous vertices `()` match without binding. A named vertex yields a
struct column `name` (full vertex row when `vertices` is given, else
`struct(id)`); a named edge yields a struct column of the full edge row.
Negated terms become LEFT ANTI joins — "no such edge exists".

Scale shape: each positive term is one equi-join against the edge table
on the already-bound endpoint(s) — the exact plan a hand-written
traversal produces; k-term motifs cost k-1 shuffle joins (broadcast when
the bound side is small), AQE handles dense-vertex skew. Negations are
anti-joins, map-side prunable the same way.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM = re.compile(r"^\s*(!?)\s*\((\w*)\)\s*-\s*\[(\w*)\]\s*->\s*\((\w*)\)\s*$")


def _parse(pattern: str) -> list[tuple[bool, str, str, str]]:
    terms = []
    for raw in pattern.split(";"):
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"unparseable motif term: {raw!r}")
        neg, src, edge, dst = m.group(1) == "!", m.group(2), m.group(3), m.group(4)
        if neg and edge:
            raise ValueError(f"negated term must use an anonymous edge []: {raw!r}")
        if not neg and not src and not dst and not edge:
            raise ValueError(f"term binds nothing: {raw!r}")
        if src and src == dst:
            raise ValueError(f"self-loop terms are not supported: {raw!r}")
        terms.append((neg, src, edge, dst))
    if not terms:
        raise ValueError("empty pattern")
    if all(t[0] for t in terms):
        raise ValueError("pattern needs at least one positive term")
    return terms


def find(
    edges: DataFrame, pattern: str, vertices: DataFrame | None = None
) -> DataFrame:
    """Find every binding of `pattern` in the directed graph `edges`.

    `edges` must carry `src` and `dst` columns (payload columns ride
    along into named-edge structs). `vertices`, when given, must carry
    `id`; named vertices then inner-join it (GraphFrames semantics:
    motif vertices must exist) and expose the full vertex row.
    """
    for c in ("src", "dst"):
        if c not in edges.columns:
            raise ValueError(f"edges must have a `{c}` column")
    if vertices is not None and "id" not in vertices.columns:
        raise ValueError("vertices must have an `id` column")

    terms = _parse(pattern)
    edge_names = [e for _, _, e, _ in terms if e]
    if len(edge_names) != len(set(edge_names)):
        raise ValueError("edge names must be distinct across terms")

    result: DataFrame | None = None
    bound: set[str] = set()
    anon = 0

    def vkey(name: str) -> str:
        return f"__v_{name}"

    for neg, src, edge, dst in terms:
        if neg:
            if not (src and dst) or not {src, dst} <= bound:
                raise ValueError(
                    "negated terms need both vertices bound by positive terms"
                )
            assert result is not None
            probe = edges.select(
                F.col("src").alias("__nsrc"), F.col("dst").alias("__ndst")
            )
            result = result.join(
                probe,
                (F.col(vkey(src)) == F.col("__nsrc"))
                & (F.col(vkey(dst)) == F.col("__ndst")),
                "left_anti",
            )
            continue

        names = {}
        for role, name in (("src", src), ("dst", dst)):
            if not name:
                anon += 1
                name = f"__anon{anon}"
            names[role] = name
        e = edges
        sel = [
            F.col("src").alias(vkey(names["src"])),
            F.col("dst").alias(vkey(names["dst"])),
        ]
        if edge:
            sel.append(F.struct(*[F.col(c) for c in edges.columns]).alias(edge))
        e = e.select(*sel)

        if result is None:
            result = e
        else:
            on = [vkey(n) for n in (names["src"], names["dst"]) if n in bound]
            if on:
                result = result.join(e, on=on, how="inner")
            else:
                raise ValueError(
                    "disconnected motif terms are not supported: "
                    f"({src})-[{edge}]->({dst}) shares no bound vertex"
                )
        bound |= {n for n in names.values() if not n.startswith("__anon")}

    assert result is not None
    # materialize named-vertex struct columns (attrs via vertices join)
    out = result
    for name in sorted(bound):
        if vertices is not None:
            v = vertices.select(
                F.col("id").alias("__vid"),
                F.struct(*[F.col(c) for c in vertices.columns]).alias(name),
            )
            out = out.join(v, F.col(vkey(name)) == F.col("__vid"), "inner").drop(
                "__vid"
            )
        else:
            out = out.withColumn(name, F.struct(F.col(vkey(name)).alias("id")))
    keep = sorted(bound) + [e for e in edge_names]
    return out.select(*keep)
