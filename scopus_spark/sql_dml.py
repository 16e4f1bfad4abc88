"""SQL DML front-end for VersionedTable: MERGE INTO / UPDATE / DELETE.

The warehouse user's CDC surface: the snapshot-isolated table layer
(operators/manifest.py) exposes merge / delete_keys / append as a
Python API; this module lets the same commits be issued as SQL text —
``SqlDml(spark).sql("MERGE INTO t USING s ON ... WHEN MATCHED ...")``
— which is how a warehouse user writes CDC.

Design: parse-and-dispatch, never a second evaluator. The statements
are parsed only down to their STRUCTURE (target, source, ON keys, WHEN
clauses, SET assignments); every expression — conditions, assignment
right-hand sides, insert values — is passed VERBATIM to Spark SQL over
temp views, so expression semantics are Catalyst's, not a
re-implementation. The dispatch:

  MERGE INTO  -> ONE VersionedTable.merge(delta = updates ∪ inserts,
                 deletes = delete-clause rows) commit (snapshot-
                 isolated, OCC-rebased, O(touched partitions))
  UPDATE      -> merge(delta = rewritten rows)  [copy-on-write]
  DELETE      -> delete_keys(matching keys)     [merge-on-read
                 tombstones: O(churn) commit, no file rewrite]

ANSI semantics kept: first-match-wins across WHEN clauses, a source
that matches one target row more than once raises, matched rows no
clause claims survive untouched, NOT MATCHED INSERT fills omitted
columns with NULL, conditions evaluating to NULL count as false.
``WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE`` (the full-snapshot-
sync clause) is supported.

Restrictions (raise loudly, never silently drift):
- the MERGE ON clause must be a conjunction of ``t.col = s.col``
  equalities covering exactly the registered key columns (the keyed-
  merge contract: partition_col is a pure function of key_cols);
- key columns and the partition column cannot be assigned (rewriting a
  key is a delete+insert, not an update);
- an INSERT column list must set the key columns and the partition
  column (a NULL partition value has no directory).

At 100 TB the cost model is exactly the Python API's: MERGE/UPDATE
rewrite only touched partitions, DELETE writes O(keys) tombstones, and
every statement is one OCC commit that concurrent writers rebase
against or conflict with.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from scopus_spark.operators.manifest import VersionedTable

__all__ = ["SqlDml", "DmlParseError"]


class DmlParseError(ValueError):
    """The statement is DML-shaped but not parseable under the
    supported grammar — the message names the unsupported piece."""


# --------------------------------------------------------------------------
# lexing helpers: all keyword / paren / comma scanning happens on a MASKED
# copy of the statement (string-literal contents blanked, same length), so
# a literal like 'WHEN MATCHED' or '(' inside quotes never confuses the
# structure scan; expression text is always sliced from the ORIGINAL.
# --------------------------------------------------------------------------


def _mask(sql: str) -> str:
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            j = min(j, n - 1)
            out.append("'" + " " * (j - i - 1) + "'")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _find_top(masked: str, word: str, start: int = 0) -> int:
    """Offset of the first paren-depth-0 occurrence of keyword ``word``
    at/after ``start``, or -1."""
    depth = 0
    for m in re.finditer(r"[()]|" + word, masked[start:], re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return start + m.start()
    return -1


def _find_all_top(masked: str, word: str, start: int = 0) -> list[int]:
    out, pos = [], start
    while True:
        i = _find_top(masked, word, pos)
        if i < 0:
            return out
        out.append(i)
        pos = i + 1


def _match_paren(masked: str, open_idx: int) -> int:
    """Index of the ')' matching masked[open_idx] == '('."""
    depth = 0
    for i in range(open_idx, len(masked)):
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise DmlParseError("unbalanced parentheses")


def _split_top(sql: str, masked: str, start: int, end: int, sep: str = ","):
    parts, depth, last = [], 0, start
    for i in range(start, end):
        c = masked[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(sql[last:i])
            last = i + 1
    parts.append(sql[last:end])
    return [p.strip() for p in parts]


_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"


@dataclass
class _Clause:
    kind: str  # 'matched' | 'not_matched' | 'not_matched_by_source'
    cond: str | None
    action: str  # 'update' | 'delete' | 'insert'
    assignments: dict[str, str] | None = None
    insert_cols: list[str] | None = None  # None => INSERT *
    insert_vals: list[str] | None = None


@dataclass
class _Merge:
    target: str
    talias: str
    source_sql: str  # view name or parenthesized subquery text
    salias: str
    on_sql: str
    on_pairs: list[tuple[str, str]]  # (target_col, source_col)
    clauses: list[_Clause]


def _parse_merge(sql: str, masked: str) -> _Merge:
    m = re.match(
        rf"\s*MERGE\s+INTO\s+({_IDENT})"
        rf"(?:\s+(?:AS\s+)?(?!USING\b)({_IDENT}))?\s+USING\s+",
        masked,
        re.I,
    )
    if not m:
        raise DmlParseError(
            "expected MERGE INTO <table> [AS alias] USING ..."
        )
    target, talias = sql[m.start(1) : m.end(1)], None
    if m.group(2):
        talias = sql[m.start(2) : m.end(2)]
    pos = m.end()
    while pos < len(masked) and masked[pos].isspace():
        pos += 1
    if pos < len(masked) and masked[pos] == "(":
        close = _match_paren(masked, pos)
        source_sql = "(" + sql[pos + 1 : close].strip() + ")"
        pos = close + 1
    else:
        sm = re.match(_IDENT, masked[pos:])
        if not sm:
            raise DmlParseError("expected USING <view> or (subquery)")
        source_sql = sql[pos : pos + sm.end()]
        pos += sm.end()
    am = re.match(
        rf"\s*(?:AS\s+)?(?!ON\b)({_IDENT})", masked[pos:], re.I
    )
    salias = None
    if am:
        salias = sql[pos + am.start(1) : pos + am.end(1)]
        pos += am.end()
    on_kw = re.match(r"\s*ON\b", masked[pos:], re.I)
    if not on_kw:
        raise DmlParseError("expected ON <condition> after USING source")
    on_start = pos + on_kw.end()
    when_idxs = _find_all_top(masked, r"\bWHEN\b", on_start)
    if not when_idxs:
        raise DmlParseError("MERGE needs at least one WHEN clause")
    on_sql = sql[on_start : when_idxs[0]].strip()
    talias = talias or target
    salias = salias or "s"

    on_pairs: list[tuple[str, str]] = []
    on_masked = _mask(on_sql)
    for part in _split_on_and(on_sql, on_masked):
        em = re.fullmatch(
            rf"\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*",
            part,
        )
        if not em:
            raise DmlParseError(
                "MERGE ON must be a conjunction of t.col = s.col "
                f"equalities (the keyed-merge contract); got {part!r}"
            )
        a1, c1, a2, c2 = em.groups()
        if a1.lower() == talias.lower() and a2.lower() == salias.lower():
            on_pairs.append((c1, c2))
        elif a2.lower() == talias.lower() and a1.lower() == salias.lower():
            on_pairs.append((c2, c1))
        else:
            raise DmlParseError(
                f"ON equality {part!r} must relate the target alias "
                f"{talias!r} and the source alias {salias!r}"
            )

    clauses: list[_Clause] = []
    bounds = when_idxs + [len(sql)]
    for ci in range(len(when_idxs)):
        cstart, cend = bounds[ci], bounds[ci + 1]
        then_at = _find_top(masked[:cend], r"\bTHEN\b", cstart)
        if then_at < 0:
            raise DmlParseError("WHEN clause without THEN")
        head = sql[cstart:then_at]
        hm = re.match(
            r"(?is)^\s*WHEN\s+(?:(NOT)\s+)?MATCHED"
            r"(?:\s+BY\s+(SOURCE|TARGET))?"
            r"(?:\s+AND\s+(?P<cond>.+?))?\s*$",
            head,
        )
        if not hm:
            raise DmlParseError(f"cannot parse WHEN clause head {head!r}")
        neg, by = hm.group(1), (hm.group(2) or "").upper()
        if neg is None and by:
            raise DmlParseError("MATCHED takes no BY qualifier")
        kind = (
            "matched"
            if neg is None
            else ("not_matched_by_source" if by == "SOURCE" else "not_matched")
        )
        cond = hm.group("cond")
        action_sql = sql[then_at + 4 : cend].strip()
        cl = _parse_action(kind, cond, action_sql)
        clauses.append(cl)
    return _Merge(
        target, talias, source_sql, salias, on_sql, on_pairs, clauses
    )


def _split_on_and(on_sql: str, on_masked: str) -> list[str]:
    parts, last = [], 0
    for i in _find_all_top(on_masked, r"\bAND\b"):
        parts.append(on_sql[last:i])
        last = i + 3
    parts.append(on_sql[last:])
    return parts


def _parse_action(kind: str, cond: str | None, action: str) -> _Clause:
    masked = _mask(action)
    um = re.match(r"(?is)^\s*UPDATE\s+SET\s+(.*)$", action)
    if um:
        if kind == "not_matched":
            raise DmlParseError("WHEN NOT MATCHED cannot UPDATE")
        return _Clause(
            kind, cond, "update", assignments_raw_update(um.group(1))
        )
    if re.fullmatch(r"(?is)\s*DELETE\s*", action):
        if kind == "not_matched":
            raise DmlParseError("WHEN NOT MATCHED cannot DELETE")
        return _Clause(kind, cond, "delete")
    im = re.match(r"(?is)^\s*INSERT\s*", action)
    if im:
        if kind != "not_matched":
            raise DmlParseError(
                "INSERT is only valid in WHEN NOT MATCHED [BY TARGET]"
            )
        rest = action[im.end() :].strip()
        if rest == "*":
            return _Clause(kind, cond, "insert")
        rm = _mask(rest)
        if not rest.startswith("("):
            raise DmlParseError(
                "expected INSERT * or INSERT (cols) VALUES (exprs)"
            )
        close = _match_paren(rm, 0)
        cols = [
            c.strip()
            for c in _split_top(rest, rm, 1, close)
        ]
        vm = re.match(r"\s*VALUES\s*\(", rm[close + 1 :], re.I)
        if not vm:
            raise DmlParseError("expected VALUES (...) after INSERT (cols)")
        vopen = close + 1 + vm.end() - 1
        vclose = _match_paren(rm, vopen)
        vals = _split_top(rest, rm, vopen + 1, vclose)
        if len(cols) != len(vals):
            raise DmlParseError(
                f"INSERT has {len(cols)} columns but {len(vals)} values"
            )
        bad = [c for c in cols if not re.fullmatch(_IDENT, c)]
        if bad:
            raise DmlParseError(f"bad INSERT column names {bad}")
        return _Clause(kind, cond, "insert", None, cols, vals)
    raise DmlParseError(f"unsupported MERGE action {action!r}")


def assignments_raw_update(set_sql: str) -> dict[str, str]:
    # alias stripping happens later (the executor knows the alias);
    # here assignments keep whatever prefix the user wrote
    masked = _mask(set_sql)
    out: dict[str, str] = {}
    for part in _split_top(set_sql, masked, 0, len(set_sql)):
        pm = _mask(part)
        eq = None
        depth = 0
        for i, ch in enumerate(pm):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "=" and depth == 0:
                eq = i
                break
        if eq is None:
            raise DmlParseError(f"SET item without '=': {part!r}")
        out[part[:eq].strip()] = part[eq + 1 :].strip()
    return out


# --------------------------------------------------------------------------
# executor
# --------------------------------------------------------------------------


class SqlDml:
    """Session-scoped SQL surface over registered VersionedTables.

    ``register(name, table, key_cols)`` declares the table's merge key
    (the table-level property a warehouse catalog would hold) and
    exposes the current snapshot as a temp view ``name`` for reads.
    ``sql(text)`` dispatches MERGE/UPDATE/DELETE against registered
    targets (returning the committed version) and passes every other
    statement to ``spark.sql`` after refreshing the read views."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, tuple[VersionedTable, list[str]]] = {}

    def register(
        self, name: str, table: VersionedTable, key_cols: list[str]
    ) -> None:
        if not re.fullmatch(_IDENT, name):
            raise ValueError(f"bad table name {name!r}")
        self._tables[name] = (table, list(key_cols))
        self.refresh(name)

    def refresh(self, name: str | None = None) -> None:
        """Re-point the read temp view(s) at the current snapshot."""
        for n in [name] if name else list(self._tables):
            vt, _ = self._tables[n]
            if vt.exists():
                vt.read(self.spark).createOrReplaceTempView(n)

    # -- dispatch ----------------------------------------------------------

    def sql(self, text: str):
        masked = _mask(text)
        head = re.match(r"\s*(\w+)", masked)
        kw = head.group(1).upper() if head else ""
        if kw == "MERGE":
            return self._merge(text, masked)
        if kw == "UPDATE":
            return self._update(text, masked)
        if kw == "DELETE":
            return self._delete(text, masked)
        self.refresh()
        return self.spark.sql(text)

    def _resolve(self, name: str) -> tuple[VersionedTable, list[str]]:
        if name not in self._tables:
            raise ValueError(
                f"{name!r} is not a registered VersionedTable "
                f"(registered: {sorted(self._tables)})"
            )
        return self._tables[name]

    def _tview(self, name: str, vt: VersionedTable) -> str:
        view = f"__vt_dml_{name}"
        vt.read(self.spark).createOrReplaceTempView(view)
        return view

    # -- MERGE -------------------------------------------------------------

    def _merge(self, sql: str, masked: str) -> int:
        p = _parse_merge(sql, masked)
        vt, key_cols = self._resolve(p.target)
        schema = vt.schema()
        pc = vt.partition_col()
        names = {f.name.lower(): f.name for f in schema.fields}
        on_target = [names.get(c.lower(), c) for c, _ in p.on_pairs]
        if sorted(x.lower() for x in on_target) != sorted(
            k.lower() for k in key_cols
        ):
            raise ValueError(
                f"MERGE ON columns {sorted(on_target)} must equate "
                f"exactly the registered key columns {sorted(key_cols)} "
                "(the keyed-merge contract)"
            )
        ta, sa = p.talias, p.salias
        tview = self._tview(p.target, vt)
        base_from = (
            f"FROM {tview} AS {ta} JOIN {p.source_sql} AS {sa} "
            f"ON {p.on_sql}"
        )
        # ANSI cardinality guard: a source that matches one target row
        # more than once makes UPDATE/DELETE nondeterministic. One
        # aggregate over the matched subset (bounded by the delta size).
        key_list = ", ".join(f"{ta}.{k}" for k in key_cols)
        dup = self.spark.sql(
            f"SELECT 1 AS one {base_from} GROUP BY {key_list} "
            f"HAVING count(*) > 1 LIMIT 1"
        )
        if dup.take(1):
            raise ValueError(
                "MERGE source matches a single target row more than "
                "once (ANSI cardinality violation) — deduplicate the "
                "source on the key columns first"
            )

        seen: dict[str, list[str]] = {
            "matched": [],
            "not_matched": [],
            "not_matched_by_source": [],
        }
        updates: list[str] = []
        inserts: list[str] = []
        deletes: list[str] = []
        kp_cols = list(dict.fromkeys([*key_cols, pc]))
        anti_target = (
            f"FROM {tview} AS {ta} LEFT ANTI JOIN {p.source_sql} "
            f"AS {sa} ON {p.on_sql}"
        )
        anti_source = (
            f"FROM {p.source_sql} AS {sa} LEFT ANTI JOIN {tview} "
            f"AS {ta} ON {p.on_sql}"
        )
        for cl in p.clauses:
            guard = [
                f"NOT coalesce(({c}), false)" for c in seen[cl.kind]
            ]
            where = " AND ".join(
                ([f"coalesce(({cl.cond}), false)"] if cl.cond else ["true"])
                + guard
            )
            seen[cl.kind].append(cl.cond or "true")
            if cl.action == "update":
                assigns = self._norm_assigns(cl.assignments or {}, names)
                self._refuse_key_assign(assigns, key_cols, pc)
                proj = ", ".join(
                    f"({assigns[f.name]}) AS {f.name}"
                    if f.name in assigns
                    else f"{ta}.{f.name} AS {f.name}"
                    for f in schema.fields
                )
                frm = (
                    anti_target
                    if cl.kind == "not_matched_by_source"
                    else base_from
                )
                updates.append(f"SELECT {proj} {frm} WHERE {where}")
            elif cl.action == "delete":
                proj = ", ".join(f"{ta}.{c} AS {c}" for c in kp_cols)
                frm = (
                    anti_target
                    if cl.kind == "not_matched_by_source"
                    else base_from
                )
                deletes.append(f"SELECT {proj} {frm} WHERE {where}")
            else:  # insert
                if cl.insert_cols is None:
                    vals = {f.name: f"{sa}.{f.name}" for f in schema.fields}
                else:
                    vals = {}
                    for c, v in zip(cl.insert_cols, cl.insert_vals or []):
                        actual = names.get(c.lower())
                        if actual is None:
                            raise ValueError(
                                f"INSERT column {c!r} is not in the "
                                "table schema"
                            )
                        vals[actual] = v
                missing = [c for c in kp_cols if c not in vals]
                if missing:
                    raise ValueError(
                        f"INSERT must set key/partition columns "
                        f"{missing} (a NULL key or partition value has "
                        "no merge identity)"
                    )
                proj = ", ".join(
                    f"({vals[f.name]}) AS {f.name}"
                    if f.name in vals
                    else (
                        f"CAST(NULL AS {f.dataType.simpleString()}) "
                        f"AS {f.name}"
                    )
                    for f in schema.fields
                )
                inserts.append(f"SELECT {proj} {anti_source} WHERE {where}")

        delta: DataFrame | None = None
        for q in updates + inserts:
            d = self.spark.sql(q)
            delta = d if delta is None else delta.unionByName(d)
        if delta is None:
            delta = self.spark.createDataFrame([], schema)
        del_df: DataFrame | None = None
        for q in deletes:
            d = self.spark.sql(q)
            del_df = d if del_df is None else del_df.unionByName(d)
        v = vt.merge(
            delta, key_cols=key_cols, partition_col=pc, deletes=del_df
        )
        self.refresh(p.target)
        return v

    @staticmethod
    def _norm_assigns(
        raw: dict[str, str], names: dict[str, str]
    ) -> dict[str, str]:
        out: dict[str, str] = {}
        for col, expr in raw.items():
            c = col
            if "." in c:
                c = c.split(".", 1)[1]
            actual = names.get(c.lower())
            if actual is None:
                raise ValueError(
                    f"SET target {col!r} is not a table column"
                )
            if actual in out:
                raise ValueError(f"column {actual!r} assigned twice")
            out[actual] = expr
        return out

    @staticmethod
    def _refuse_key_assign(
        assigns: dict[str, str], key_cols: list[str], pc: str
    ) -> None:
        bad = sorted(set(assigns) & {*key_cols, pc})
        if bad:
            raise ValueError(
                f"cannot assign key/partition columns {bad}: rewriting "
                "a merge key is a DELETE + INSERT, and the partition "
                "column is a pure function of the key (the keyed-merge "
                "contract)"
            )

    # -- UPDATE ------------------------------------------------------------

    def _update(self, sql: str, masked: str) -> int:
        m = re.match(
            rf"\s*UPDATE\s+({_IDENT})\s+SET\s+", masked, re.I
        )
        if not m:
            raise DmlParseError("expected UPDATE <table> SET ...")
        target = sql[m.start(1) : m.end(1)]
        vt, key_cols = self._resolve(target)
        schema = vt.schema()
        pc = vt.partition_col()
        names = {f.name.lower(): f.name for f in schema.fields}
        set_start = m.end()
        where_at = _find_top(masked, r"\bWHERE\b", set_start)
        set_sql = sql[set_start : where_at if where_at >= 0 else len(sql)]
        where = sql[where_at + 5 :].strip() if where_at >= 0 else None
        assigns = self._norm_assigns(
            assignments_raw_update(set_sql), names
        )
        self._refuse_key_assign(assigns, key_cols, pc)
        tview = self._tview(target, vt)
        proj = ", ".join(
            f"({assigns[f.name]}) AS {f.name}"
            if f.name in assigns
            else f.name
            for f in schema.fields
        )
        q = f"SELECT {proj} FROM {tview}"
        if where:
            q += f" WHERE {where}"
        v = vt.merge(
            self.spark.sql(q), key_cols=key_cols, partition_col=pc
        )
        self.refresh(target)
        return v

    # -- DELETE ------------------------------------------------------------

    def _delete(self, sql: str, masked: str) -> int:
        m = re.match(rf"\s*DELETE\s+FROM\s+({_IDENT})", masked, re.I)
        if not m:
            raise DmlParseError("expected DELETE FROM <table> [WHERE ...]")
        target = sql[m.start(1) : m.end(1)]
        vt, key_cols = self._resolve(target)
        pc = vt.partition_col()
        where = sql[m.end() :].strip()
        if where:
            if not re.match(r"(?is)^WHERE\s+", where):
                raise DmlParseError(
                    f"unexpected text after DELETE FROM: {where!r}"
                )
            where = where[5:].strip()
        tview = self._tview(target, vt)
        cols = ", ".join(dict.fromkeys([*key_cols, pc]))
        q = f"SELECT {cols} FROM {tview}"
        if where:
            q += f" WHERE {where}"
        v = vt.delete_keys(self.spark.sql(q), key_cols=key_cols)
        self.refresh(target)
        return v
