"""Table metadata model — the engine's analog of the reference's
``TableStructure`` (reference table_structure.py:5–20), carried per table so
positional CDC payloads can be named and typed.

Design difference from the reference: fields carry their *parsed* MySQL type
(base type, params, unsigned flag, nullability) rather than a pre-rendered
target type string — the Spark type and the conversion expression are both
derived on demand (schema/type_mapping.py, functions/conversions.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass
class TableField:
    name: str
    base_type: str                 # lowercased: 'int', 'varchar', 'enum', ...
    params: str = ""               # raw parenthesized params: '10,2', "'a','b'"
    unsigned: bool = False
    nullable: bool = True
    default: str | None = None     # raw DEFAULT token (unquoted), if present
    charset: str | None = None     # column-level CHARACTER SET override
    # Delta-style column mapping: the name this column carries in parquet
    # files when it differs from the logical name (after a metadata-only
    # RENAME COLUMN, or an ADD COLUMN whose name collides with a stale
    # physical column). None -> physical == logical. Cleared whenever a
    # full rewrite (MODIFY/CHANGE/optimize) normalizes the files.
    physical: str | None = None

    @property
    def type_spec(self) -> str:
        spec = self.base_type
        if self.params:
            spec += f"({self.params})"
        if self.unsigned:
            spec += " unsigned"
        return spec

    def enum_values(self) -> list[str]:
        """Member labels for enum/set types, unquoted, in declared order."""
        from .ddl_parser import split_top_level
        vals = []
        for tok in split_top_level(self.params, ","):
            tok = tok.strip()
            if len(tok) >= 2 and tok[0] in "'\"" and tok[-1] == tok[0]:
                tok = tok[1:-1].replace("''", "'").replace('\\"', '"').replace("\\'", "'")
            vals.append(tok)
        return vals


@dataclass
class TableStructure:
    fields: list[TableField] = field(default_factory=list)
    primary_keys: list[str] = field(default_factory=list)
    table_name: str = ""
    charset: str | None = None     # table default charset

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def field(self, name: str) -> TableField:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def add_field(self, new: TableField, first: bool = False,
                  after: str | None = None) -> None:
        """Positional insert — ADD COLUMN [FIRST | AFTER x] (reference
        table_structure.py:28–44). Position matters because CDC payloads are
        positional tuples aligned to the MySQL column order."""
        if new.name in self.field_names:
            # idempotent under at-least-once DDL replay: a re-applied
            # ADD COLUMN must not append a duplicate (which would make
            # every later payload projection emit duplicate column names)
            self.update_field(new)
            return
        if first:
            self.fields.insert(0, new)
        elif after is not None:
            idx = self.field_names.index(after)
            self.fields.insert(idx + 1, new)
        else:
            self.fields.append(new)

    def remove_field(self, name: str) -> None:
        self.fields = [f for f in self.fields if f.name != name]

    def rename_field(self, old: str, new: str) -> None:
        self.fields = [replace(f, name=new) if f.name == old else f
                       for f in self.fields]
        self.primary_keys = [new if p == old else p for p in self.primary_keys]

    def update_field(self, updated: TableField) -> None:
        self.fields = [updated if f.name == updated.name else f
                       for f in self.fields]
