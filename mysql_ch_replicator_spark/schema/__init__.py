from .table_structure import TableField, TableStructure
from .type_mapping import spark_type_for, to_struct_type
from .ddl_parser import (
    parse_create_table,
    parse_alter_table,
    strip_sql_comments,
    split_top_level,
    db_name_from_query,
)

__all__ = [
    "TableField", "TableStructure",
    "spark_type_for", "to_struct_type",
    "parse_create_table", "parse_alter_table",
    "strip_sql_comments", "split_top_level", "db_name_from_query",
]
