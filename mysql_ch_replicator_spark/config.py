"""Replication settings — the engine's YAML config surface.

Reproduces the reference's ``Settings`` (reference config.py:172–383 and
README.md:215–292): database/table glob patterns with exclude-wins semantics
(F1, config.py:261–282), target db/table renaming (config.py:300–316),
``types_mapping`` overrides (converter.py:380–389), per-table
partition/order/index overrides (config.py:300–328), cadence knobs, and env
overrides (config.py:240–259).

Spark-first: the MySQL/ClickHouse endpoint blocks become a JDBC url block and
a replica root path; ``partition_bys`` map to parquet/Delta partition columns,
``order_bys`` to a Z-order/sort-within-partition hint at compaction time.
"""

from __future__ import annotations

import dataclasses
import fnmatch
import os


@dataclasses.dataclass
class SourceSettings:
    """JDBC source (the reference's ``mysql:`` block, config.py:21–36)."""
    url: str = ""
    user: str = ""
    password: str = ""
    charset: str = "utf8mb4"


@dataclasses.dataclass
class ReplicaSettings:
    """Replica storage (the reference's ``clickhouse:`` block,
    config.py:39–75)."""
    root: str = ""
    erase_batch_size: int = 100_000   # config.py:74


_DEFAULT_LOG_LEVELS = ("critical", "error", "warning", "info", "debug")


@dataclasses.dataclass
class Settings:
    source: SourceSettings = dataclasses.field(default_factory=SourceSettings)
    replica: ReplicaSettings = dataclasses.field(default_factory=ReplicaSettings)

    # F1 — glob pattern include/exclude, exclude wins (config.py:261–282)
    databases: str | list[str] = "*"
    tables: str | list[str] = "*"
    exclude_databases: str | list[str] = ""
    exclude_tables: str | list[str] = ""

    # target renaming: source db/table → replica db/table (config.py:300–316)
    target_databases: dict[str, str] = dataclasses.field(default_factory=dict)
    target_tables: dict[str, str] = dataclasses.field(default_factory=dict)

    # type overrides, e.g. "char(36)" -> "uuid" (converter.py:380–389)
    types_mapping: dict[str, str] = dataclasses.field(default_factory=dict)

    # per-table physical-layout overrides (config.py:300–328)
    partition_bys: dict[str, list[str]] = dataclasses.field(default_factory=dict)
    order_bys: dict[str, list[str]] = dataclasses.field(default_factory=dict)
    indexes: dict[str, list[str]] = dataclasses.field(default_factory=dict)

    # SQL run after the initial snapshot publishes (config.py:330–337)
    post_initial_replication_commands: list[str] = \
        dataclasses.field(default_factory=list)

    # modes
    ignore_deletes: bool = False            # db_replicator_realtime.py:152–160
    skip_initial_replication: bool = False  # tests/test_mysql_ch_replicator.py:1081
    initial_replication_threads: int = 1    # db_replicator_initial.py:386

    # cadence / sizing knobs (BASELINE.md)
    initial_replication_batch_size: int = 50_000  # config.py:138
    records_per_file: int = 100_000               # config.py:113
    binlog_retention_period: float = 43_200.0     # config.py:114
    optimize_interval: float = 86_400.0           # config.py:135
    enable_optimize_final: bool = True            # config.py:189, db_optimizer.py:75
    mysql_timezone: str = "UTC"                   # converter.py:350–374
    log_level: str = "info"

    # version counter start for new tables — lets a rebuilt replica slot
    # under an existing one's version space (config.py:207,
    # clickhouse_api.py:205 get_last_used_version fallback)
    version_initial_value: int = 0

    # supervisor HTTP control plane bind (config.py:197–198; the
    # reference's FastAPI runner endpoint)
    http_host: str = "127.0.0.1"
    http_port: int = 0

    # -- loading ------------------------------------------------------------

    @classmethod
    def load(cls, path_or_dict) -> "Settings":
        """Load from a YAML/JSON file path or a plain dict, then apply env
        overrides and validate (reference config.py:172–238)."""
        if isinstance(path_or_dict, dict):
            raw = dict(path_or_dict)
        else:
            with open(path_or_dict, encoding="utf-8") as fh:
                text = fh.read()
            try:
                import yaml
                raw = yaml.safe_load(text) or {}
            except ImportError:  # pragma: no cover - yaml is normally present
                import json
                raw = json.loads(text)
        src = SourceSettings(**raw.pop("source", {}))
        rep = ReplicaSettings(**raw.pop("replica", {}))
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown settings: {sorted(unknown)}")
        settings = cls(source=src, replica=rep, **raw)
        settings._apply_env_overrides()
        settings.validate()
        return settings

    def _apply_env_overrides(self) -> None:
        """Env beats file — the full matrix of the reference's
        ``_apply_env_overrides`` (config.py:240–259: MYSQL_HOST/PORT/USER/
        PASSWORD/CHARSET + CLICKHOUSE_*) restated for the JDBC-url +
        replica-root surface; cadence/locale knobs included because
        they're the ones a container deploy overrides in practice."""
        if os.getenv("SOURCE_JDBC_URL"):
            self.source.url = os.getenv("SOURCE_JDBC_URL")
        if os.getenv("SOURCE_USER"):
            self.source.user = os.getenv("SOURCE_USER")
        if os.getenv("SOURCE_PASSWORD"):
            self.source.password = os.getenv("SOURCE_PASSWORD")
        if os.getenv("SOURCE_CHARSET"):
            self.source.charset = os.getenv("SOURCE_CHARSET")
        if os.getenv("REPLICA_ROOT"):
            self.replica.root = os.getenv("REPLICA_ROOT")
        if os.getenv("REPLICA_ERASE_BATCH_SIZE"):
            self.replica.erase_batch_size = \
                int(os.getenv("REPLICA_ERASE_BATCH_SIZE"))
        if os.getenv("MYSQL_TIMEZONE"):
            self.mysql_timezone = os.getenv("MYSQL_TIMEZONE")
        if os.getenv("LOG_LEVEL"):
            self.log_level = os.getenv("LOG_LEVEL").lower()
        if os.getenv("OPTIMIZE_INTERVAL"):
            self.optimize_interval = float(os.getenv("OPTIMIZE_INTERVAL"))
        if os.getenv("BINLOG_RETENTION_PERIOD"):
            self.binlog_retention_period = \
                float(os.getenv("BINLOG_RETENTION_PERIOD"))

    def validate(self) -> None:
        """Reference config.py:286–298, 366–383."""
        if self.log_level not in _DEFAULT_LOG_LEVELS:
            raise ValueError(f"wrong log level {self.log_level!r}")
        if self.initial_replication_threads < 1:
            raise ValueError("initial_replication_threads must be >= 1")
        if not isinstance(self.version_initial_value, int) \
                or self.version_initial_value < 0:
            raise ValueError("version_initial_value must be an int >= 0")
        if not isinstance(self.http_port, int) \
                or not (0 <= self.http_port <= 65535):
            raise ValueError("http_port must be an int in [0, 65535]")
        for m in (self.target_databases, self.target_tables,
                  self.types_mapping):
            if not isinstance(m, dict):
                raise ValueError("mapping settings must be dicts")
        try:
            import zoneinfo
            zoneinfo.ZoneInfo(self.mysql_timezone)
        except Exception as exc:
            raise ValueError(
                f"invalid mysql_timezone {self.mysql_timezone!r}") from exc

    # -- F1: pattern filters (exclude wins) ---------------------------------

    @staticmethod
    def is_pattern_matches(name: str, pattern: str | list[str]) -> bool:
        """fnmatch glob; '' / '*' / empty list-entry semantics match the
        reference (config.py:263–273)."""
        if not pattern or pattern == "*":
            return True
        if isinstance(pattern, str):
            return fnmatch.fnmatch(name, pattern)
        if isinstance(pattern, list):
            return any(fnmatch.fnmatch(name, p) for p in pattern)
        raise ValueError(f"bad pattern {pattern!r}")

    def is_database_matches(self, db_name: str) -> bool:
        if self.exclude_databases and \
                self.is_pattern_matches(db_name, self.exclude_databases):
            return False
        return self.is_pattern_matches(db_name, self.databases)

    def is_table_matches(self, table_name: str) -> bool:
        if self.exclude_tables and \
                self.is_pattern_matches(table_name, self.exclude_tables):
            return False
        return self.is_pattern_matches(table_name, self.tables)

    # -- target renaming ----------------------------------------------------

    def target_database(self, db_name: str) -> str:
        return self.target_databases.get(db_name, db_name)

    def target_table(self, table_name: str) -> str:
        return self.target_tables.get(table_name, table_name)
