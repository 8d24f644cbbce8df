from .snapshot import load_table, load_tables, sharded_snapshot, TPCH_TABLES

__all__ = ["load_table", "load_tables", "sharded_snapshot", "TPCH_TABLES"]
