"""MySQL DDL parser: CREATE/ALTER/DROP/RENAME/TRUNCATE → structure ops.

Engine analog of the reference's hand-written parser (converter.py:1419–1574
for CREATE, :711–1189 for ALTER, :1297–1417 for comment stripping) — written
fresh as a quote/paren-aware scanner, not a port. The contract it must match
is behavioral, pinned by the reference's test cases (SURVEY.md §5.3,
FIXTURES.md F13):

- composite PRIMARY KEY (a, b); column-level PRIMARY KEY; fallback to a
  column literally named ``id``; error when no PK can be found
- KEY / INDEX / UNIQUE / CONSTRAINT / FULLTEXT / SPATIAL / FOREIGN KEY /
  CHECK lines are ignored
- multi-op ALTERs split on top-level commas; index/constraint sub-ops ignored
- COMMENT clauses (with embedded quotes) stripped without breaking parse
"""

from __future__ import annotations

import re

from .table_structure import TableField, TableStructure

_QUOTES = "'\"`"


def _scan_string(s: str, i: int) -> int:
    """Given s[i] is a quote char, return index just past the closing quote.
    Handles backslash escapes and doubled-quote escapes."""
    q = s[i]
    i += 1
    while i < len(s):
        c = s[i]
        if c == "\\" and q != "`" and i + 1 < len(s):
            i += 2
            continue
        if c == q:
            if i + 1 < len(s) and s[i + 1] == q:  # doubled quote escape
                i += 2
                continue
            return i + 1
        i += 1
    return i


def strip_sql_comments(sql: str) -> str:
    """Remove -- and # line comments and /* */ block comments, preserving
    quoted strings (reference strip_sql_comments, converter.py:346–347)."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in _QUOTES:
            j = _scan_string(sql, i)
            out.append(sql[i:j])
            i = j
        elif c == "-" and sql[i:i + 2] == "--":
            while i < n and sql[i] != "\n":
                i += 1
        elif c == "#":
            while i < n and sql[i] != "\n":
                i += 1
        elif c == "/" and sql[i:i + 2] == "/*":
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def strip_column_comments(defn: str) -> str:
    """Remove ``COMMENT '...'`` clauses from a column/table definition,
    quote-aware (reference converter.py:1297–1417; FIXTURES F08: comments
    containing quotes must not break the parse)."""
    out = []
    i, n = 0, len(defn)
    while i < n:
        c = defn[i]
        if c in _QUOTES:
            j = _scan_string(defn, i)
            out.append(defn[i:j])
            i = j
            continue
        m = re.match(r"comment\s*(=\s*)?", defn[i:], re.IGNORECASE)
        if m and (i == 0 or not (defn[i - 1].isalnum() or defn[i - 1] == "_")):
            k = i + m.end()
            if k < n and defn[k] in "'\"":
                i = _scan_string(defn, k)
                continue
        out.append(c)
        i += 1
    return "".join(out)


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` only at paren depth 0 and outside quotes (reference
    split_high_level, converter.py:283–343)."""
    parts, buf = [], []
    depth = 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in _QUOTES:
            j = _scan_string(s, i)
            buf.append(s[i:j])
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    if buf:
        parts.append("".join(buf))
    return [p for p in (x.strip() for x in parts) if p]


def _unquote_ident(tok: str) -> str:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == "`" and tok[-1] == "`":
        return tok[1:-1].replace("``", "`")
    return tok


def _unquote_value(tok: str) -> str:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] in "'\"" and tok[-1] == tok[0]:
        return tok[1:-1]
    return tok


# multi-word base types that must be merged before param parsing
_TWO_WORD_TYPES = {
    ("double", "precision"): "double",
    ("character", "varying"): "varchar",
}

_SKIP_LINE_STARTS = (
    "key", "index", "unique", "constraint", "fulltext", "spatial",
    "foreign", "check", "period",
)


def tokenize_column_def(defn: str) -> list[str]:
    """Tokenize one column definition, keeping parenthesized params attached
    to the preceding word: ``decimal(10, 2)`` is one token (reference ALTER
    tokenizer, converter.py:791–849)."""
    tokens = []
    i, n = 0, len(defn)
    while i < n:
        c = defn[i]
        if c.isspace():
            i += 1
            continue
        if c in _QUOTES:
            j = _scan_string(defn, i)
            tokens.append(defn[i:j])
            i = j
            continue
        if c == "(":
            depth = 1
            j = i + 1
            while j < n and depth:
                if defn[j] in _QUOTES:
                    j = _scan_string(defn, j)
                    continue
                if defn[j] == "(":
                    depth += 1
                elif defn[j] == ")":
                    depth -= 1
                j += 1
            if tokens:
                tokens[-1] += defn[i:j]
            else:
                tokens.append(defn[i:j])
            i = j
            continue
        j = i
        while j < n and not defn[j].isspace() and defn[j] not in "(,'\"`":
            j += 1
        tokens.append(defn[i:j])
        i = j
    return tokens


def parse_field_def(defn: str) -> tuple[TableField, bool]:
    """Parse one column definition → (field, is_column_level_pk)."""
    defn = strip_column_comments(defn).strip()
    tokens = tokenize_column_def(defn)
    if not tokens:
        raise ValueError(f"empty column definition: {defn!r}")
    name = _unquote_ident(tokens[0])
    rest = tokens[1:]
    if not rest:
        raise ValueError(f"column {name!r} has no type")

    # merge multi-word types
    t0 = rest[0].lower()
    base, params = t0, ""
    m = re.match(r"^([a-z_]+)\s*\((.*)\)$", t0, re.DOTALL)
    if m:
        base, params = m.group(1), m.group(2).strip()
    idx = 1
    if not m and idx < len(rest):
        merged = _TWO_WORD_TYPES.get((base, rest[idx].lower()))
        if merged:
            base = merged
            idx += 1

    field = TableField(name=name, base_type=base, params=params)
    is_pk = False
    i = idx
    while i < len(rest):
        tok = rest[i].lower()
        if tok == "unsigned":
            field.unsigned = True
        elif tok == "zerofill":
            pass
        elif tok == "not" and i + 1 < len(rest) and rest[i + 1].lower() == "null":
            field.nullable = False
            i += 1
        elif tok == "null":
            field.nullable = True
        elif tok == "default":
            if i + 1 < len(rest):
                nxt = rest[i + 1]
                if nxt.lower() == "current_timestamp" or nxt.lower().startswith("current_timestamp("):
                    field.default = "current_timestamp"
                else:
                    field.default = _unquote_value(nxt)
                i += 1
        elif tok == "character" and i + 1 < len(rest) and rest[i + 1].lower() == "set":
            if i + 2 < len(rest):
                field.charset = rest[i + 2].lower()
                i += 2
        elif tok.startswith("charset"):
            if i + 1 < len(rest):
                field.charset = rest[i + 1].lower()
                i += 1
        elif tok == "primary" and i + 1 < len(rest) and rest[i + 1].lower() == "key":
            is_pk = True
            i += 1
        elif tok in ("auto_increment", "collate", "on", "generated", "virtual",
                     "stored", "always", "invisible", "visible"):
            if tok == "collate" or tok == "on":
                i += 1  # skip argument ('on update current_timestamp' partly)
        i += 1
    return field, is_pk


_CREATE_RE = re.compile(
    r"^\s*create\s+table\s+(if\s+not\s+exists\s+)?(?P<name>[^\s(]+)\s*",
    re.IGNORECASE | re.DOTALL)


def parse_create_table(sql: str) -> TableStructure:
    """Parse CREATE TABLE → TableStructure (reference converter.py:1419–1574).

    Raises if no primary key can be determined — same contract as the
    reference (converter.py:1570–1571): fallback order is table-level
    PRIMARY KEY (a,b) → column-level PRIMARY KEY → a column named ``id``.
    """
    sql = strip_sql_comments(sql).strip().rstrip(";")
    m = _CREATE_RE.match(sql)
    if not m:
        raise ValueError(f"not a CREATE TABLE statement: {sql[:80]!r}")
    raw_name = m.group("name")
    name = _unquote_ident(raw_name.split(".")[-1])

    like = re.match(r"like\s+(?P<src>[^\s(;]+)", sql[m.end():], re.IGNORECASE)
    if like:
        st = TableStructure(table_name=name)
        st.like_table = _unquote_ident(like.group("src").split(".")[-1])  # type: ignore[attr-defined]
        return st

    open_idx = sql.find("(", m.end() - 1)
    if open_idx < 0:
        raise ValueError(f"CREATE TABLE without column list: {sql[:80]!r}")
    # find matching close paren
    depth, i = 0, open_idx
    while i < len(sql):
        c = sql[i]
        if c in _QUOTES:
            i = _scan_string(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = sql[open_idx + 1:i]
    tail = sql[i + 1:]

    st = TableStructure(table_name=name)
    explicit_pk: list[str] = []
    column_pk: list[str] = []
    for line in split_top_level(body, ","):
        lowered = line.lower()
        if lowered.startswith("primary"):
            pm = re.search(r"\((.*?)\)", line, re.DOTALL)
            if pm:
                explicit_pk = [_unquote_ident(p) for p in
                               split_top_level(pm.group(1), ",")]
            continue
        first_word = re.split(r"[\s(]", line.strip(), 1)[0].lower().strip("`")
        if first_word in _SKIP_LINE_STARTS and not line.strip().startswith("`"):
            continue
        field, is_pk = parse_field_def(line)
        st.fields.append(field)
        if is_pk:
            column_pk.append(field.name)

    cm = re.search(r"(?:default\s+)?(?:charset|character\s+set)\s*=?\s*(\w+)",
                   tail, re.IGNORECASE)
    if cm:
        st.charset = cm.group(1).lower()

    if explicit_pk:
        st.primary_keys = explicit_pk
    elif column_pk:
        st.primary_keys = column_pk
    elif "id" in st.field_names:
        st.primary_keys = ["id"]
    else:
        raise ValueError(f"table {name!r} has no primary key")
    missing = [p for p in st.primary_keys if p not in st.field_names]
    if missing:
        raise ValueError(f"primary key column(s) {missing} not in field list")
    return st


# --- ALTER TABLE -----------------------------------------------------------

_ALTER_RE = re.compile(r"^\s*alter\s+table\s+(?P<name>[^\s(]+)\s+(?P<body>.*)$",
                       re.IGNORECASE | re.DOTALL)

_IGNORED_ALTER = (
    "add index", "add key", "add unique", "add constraint", "add fulltext",
    "add spatial", "add foreign", "add check", "add period", "drop index",
    "drop key", "drop constraint", "drop foreign", "drop check",
    "alter index", "rename index", "rename key", "order by", "convert to",
    "character set", "charset", "default character set", "default charset",
    "engine", "auto_increment", "comment", "algorithm", "lock", "force",
    "enable keys", "disable keys", "row_format", "add partition",
    "drop partition", "partition by", "remove partitioning",
)


def parse_alter_table(sql: str) -> tuple[str, list[dict]]:
    """Parse ALTER TABLE → (table_name, [op, ...]).

    Ops: {'op': 'add_column', 'field': TableField, 'first': bool,
          'after': str|None}
         {'op': 'drop_column', 'name': str}
         {'op': 'modify_column', 'field': TableField}
         {'op': 'change_column', 'old_name': str, 'field': TableField}
         {'op': 'rename_column', 'old_name': str, 'new_name': str}
         {'op': 'rename_table', 'new_name': str}
    Index/constraint/engine sub-ops are dropped (reference converter.py:711–789).
    """
    sql = strip_sql_comments(sql).strip().rstrip(";")
    m = _ALTER_RE.match(sql)
    if not m:
        raise ValueError(f"not an ALTER TABLE statement: {sql[:80]!r}")
    table = _unquote_ident(m.group("name").split(".")[-1])
    ops: list[dict] = []
    for clause in split_top_level(m.group("body"), ","):
        low = clause.lower()
        if any(low.startswith(pfx) for pfx in _IGNORED_ALTER):
            continue
        if low.startswith("add"):
            rest = clause[3:].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            first = False
            after = None
            fm = re.search(r"\s+first\s*$", rest, re.IGNORECASE)
            if fm:
                first = True
                rest = rest[:fm.start()]
            am = re.search(r"\s+after\s+(\S+)\s*$", rest, re.IGNORECASE)
            if am:
                after = _unquote_ident(am.group(1))
                rest = rest[:am.start()]
            field, _ = parse_field_def(rest)
            ops.append({"op": "add_column", "field": field,
                        "first": first, "after": after})
        elif low.startswith("drop"):
            rest = clause[4:].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            ops.append({"op": "drop_column", "name": _unquote_ident(rest)})
        elif low.startswith("modify"):
            rest = clause[6:].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            rest = re.sub(r"\s+(first|after\s+\S+)\s*$", "", rest,
                          flags=re.IGNORECASE)
            field, _ = parse_field_def(rest)
            ops.append({"op": "modify_column", "field": field})
        elif low.startswith("change"):
            rest = clause[6:].strip()
            if rest.lower().startswith("column"):
                rest = rest[6:].strip()
            rest = re.sub(r"\s+(first|after\s+\S+)\s*$", "", rest,
                          flags=re.IGNORECASE)
            toks = tokenize_column_def(rest)
            old_name = _unquote_ident(toks[0])
            field, _ = parse_field_def(rest[len(toks[0]):].strip())
            ops.append({"op": "change_column", "old_name": old_name,
                        "field": field})
        elif low.startswith("rename"):
            rest = clause[6:].strip()
            rl = rest.lower()
            if rl.startswith("column"):
                rest = rest[6:].strip()
                parts = re.split(r"\s+to\s+", rest, flags=re.IGNORECASE)
                ops.append({"op": "rename_column",
                            "old_name": _unquote_ident(parts[0]),
                            "new_name": _unquote_ident(parts[1])})
            else:
                if rl.startswith("to") or rl.startswith("as"):
                    rest = rest[2:].strip()
                ops.append({"op": "rename_table",
                            "new_name": _unquote_ident(rest.split(".")[-1])})
        # anything else: ignore (same as reference)
    return table, ops


# --- other statements ------------------------------------------------------

def parse_drop_table(sql: str) -> tuple[list[str], bool]:
    """DROP TABLE [IF EXISTS] a[, b] → ([names], if_exists)."""
    sql = strip_sql_comments(sql).strip().rstrip(";")
    m = re.match(r"^\s*drop\s+(?:temporary\s+)?table\s+(if\s+exists\s+)?(?P<names>.+)$",
                 sql, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError(f"not a DROP TABLE: {sql[:80]!r}")
    names = [_unquote_ident(n.strip().split(".")[-1])
             for n in split_top_level(m.group("names"), ",")]
    return names, bool(m.group(1))


def parse_rename_table(sql: str) -> list[tuple[str, str]]:
    """RENAME TABLE a TO b[, c TO d] → [(a, b), ...]. Cross-DB renames
    rejected, same as the reference (db_replicator_realtime.py:236–266)."""
    sql = strip_sql_comments(sql).strip().rstrip(";")
    m = re.match(r"^\s*rename\s+table\s+(?P<body>.+)$", sql,
                 re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError(f"not a RENAME TABLE: {sql[:80]!r}")
    pairs = []
    for clause in split_top_level(m.group("body"), ","):
        parts = re.split(r"\s+to\s+", clause, flags=re.IGNORECASE)
        if len(parts) != 2:
            raise ValueError(f"bad RENAME clause: {clause!r}")
        src, dst = parts[0].strip(), parts[1].strip()
        sdb = src.split(".")[0] if "." in src else None
        ddb = dst.split(".")[0] if "." in dst else None
        if sdb != ddb:
            raise ValueError(f"cross-database rename not supported: {clause!r}")
        pairs.append((_unquote_ident(src.split(".")[-1]),
                      _unquote_ident(dst.split(".")[-1])))
    return pairs


def parse_truncate_table(sql: str) -> str:
    sql = strip_sql_comments(sql).strip().rstrip(";")
    m = re.match(r"^\s*truncate\s+(?:table\s+)?(?P<name>\S+)$", sql,
                 re.IGNORECASE)
    if not m:
        raise ValueError(f"not a TRUNCATE: {sql[:80]!r}")
    return _unquote_ident(m.group("name").split(".")[-1])


def db_name_from_query(sql: str) -> str | None:
    """Recover the database name qualifying the target table of a DDL
    statement, when present (reference binlog_replicator.py:384–425)."""
    sql = strip_sql_comments(sql).strip()
    pats = [
        r"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?(?P<q>[^\s(]+)",
        r"^\s*drop\s+table\s+(?:if\s+exists\s+)?(?P<q>[^\s(;,]+)",
        r"^\s*alter\s+table\s+(?P<q>[^\s(]+)",
        r"^\s*rename\s+table\s+(?P<q>[^\s(,]+)",
        r"^\s*truncate\s+(?:table\s+)?(?P<q>[^\s(;]+)",
        r"^\s*create\s+(?:unique\s+|fulltext\s+|spatial\s+)?index\s+\S+\s+on\s+(?P<q>[^\s(]+)",
        r"^\s*drop\s+index\s+\S+\s+on\s+(?P<q>[^\s(;]+)",
    ]
    for p in pats:
        m = re.match(p, sql, re.IGNORECASE)
        if m:
            q = m.group("q")
            if "." in q:
                return _unquote_ident(q.split(".")[0])
            return None
    return None
