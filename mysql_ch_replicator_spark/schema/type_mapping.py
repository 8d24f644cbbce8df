"""MySQL type → Spark type matrix (SURVEY.md §1.2; reference
converter.py:384–533).

Notable deliberate deviations from the reference, all documented there:

- ``decimal(p,s)`` maps to DecimalType(p,s), not lossy Float64
  (reference converter.py:502–503 loses precision; we don't have to)
- unsigned integers widen to the next signed Spark type
  (``bigint unsigned`` → DecimalType(20,0) — Spark has no unsigned types)
- geometry maps to typed structs/arrays instead of opaque strings

``types_mapping`` config overrides (reference converter.py:387–389, e.g.
``char(36) → uuid``) are applied before the built-in matrix.
"""

from __future__ import annotations

from pyspark.sql import types as T

from .table_structure import TableField, TableStructure

POINT_TYPE = T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
])
POLYGON_TYPE = T.ArrayType(POINT_TYPE)
MULTIPOLYGON_TYPE = T.ArrayType(POLYGON_TYPE)

_INT_TYPES = {
    # base -> (signed spark type, unsigned spark type)
    "tinyint": (T.ByteType(), T.ShortType()),
    "smallint": (T.ShortType(), T.IntegerType()),
    "mediumint": (T.IntegerType(), T.IntegerType()),
    "int": (T.IntegerType(), T.LongType()),
    "integer": (T.IntegerType(), T.LongType()),
    "bigint": (T.LongType(), T.DecimalType(20, 0)),
}

_SIMPLE = {
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "real": T.DoubleType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),   # MySQL datetime is zone-less
    "timestamp": T.TimestampType(),     # instant, rendered in mysql_timezone
    "time": T.StringType(),             # reference: String (converter.py:523)
    "year": T.ShortType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "tinytext": T.StringType(),
    "text": T.StringType(),
    "mediumtext": T.StringType(),
    "longtext": T.StringType(),
    "enum": T.StringType(),
    "set": T.StringType(),              # csv of members, reference C4
    "json": T.StringType(),             # json text, reference C5
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "tinyblob": T.BinaryType(),
    "blob": T.BinaryType(),
    "mediumblob": T.BinaryType(),
    "longblob": T.BinaryType(),
    "bit": T.LongType(),
    "point": POINT_TYPE,
    "polygon": POLYGON_TYPE,
    "multipolygon": MULTIPOLYGON_TYPE,
    "uuid": T.StringType(),             # canonical 36-char text
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
}


def _decimal_params(params: str) -> tuple[int, int]:
    if not params:
        return 10, 0
    parts = [p.strip() for p in params.split(",")]
    prec = int(parts[0])
    scale = int(parts[1]) if len(parts) > 1 else 0
    return prec, scale


def spark_type_for(field: TableField,
                   types_mapping: dict[str, str] | None = None) -> T.DataType:
    """Resolve one column's Spark type (reference convert_type,
    converter.py:384–533)."""
    base = field.base_type
    if types_mapping:
        # user override keyed on full spec ('char(36)') or base type
        override = types_mapping.get(field.type_spec) or types_mapping.get(base)
        if override:
            ofield = TableField(name=field.name, base_type=override.lower())
            return spark_type_for(ofield)

    if base in ("tinyint", "bit") and field.params.strip() == "1":
        return T.BooleanType()
    if base in _INT_TYPES:
        signed, unsigned = _INT_TYPES[base]
        return unsigned if field.unsigned else signed
    if base in ("decimal", "numeric", "fixed", "dec"):
        prec, scale = _decimal_params(field.params)
        return T.DecimalType(min(prec, 38), min(scale, 37))
    if base in ("datetime", "timestamp") :
        return _SIMPLE[base]
    if base in _SIMPLE:
        return _SIMPLE[base]
    raise ValueError(f"unknown MySQL type: {field.type_spec!r} "
                     f"(column {field.name!r})")


def to_struct_type(structure: TableStructure,
                   types_mapping: dict[str, str] | None = None,
                   with_version: bool = True) -> T.StructType:
    """TableStructure → Spark StructType, plus the engine-added ``_version``
    column (reference clickhouse_api.py:21)."""
    fields = []
    for f in structure.fields:
        nullable = f.nullable and f.name not in structure.primary_keys
        fields.append(T.StructField(f.name, spark_type_for(f, types_mapping),
                                    nullable))
    if with_version:
        fields.append(T.StructField("_version", T.LongType(), False))
    return T.StructType(fields)
