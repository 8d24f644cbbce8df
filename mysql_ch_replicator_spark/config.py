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
    # driver threads overlapping per-table write jobs inside one
    # micro-batch (the reference gets the same overlap from per-db worker
    # processes, runner.py:176–200); 1 = sequential
    apply_parallelism: int = 8

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

    # supervisor database-rescan cadence (reference config.py:136/:190,
    # check_databases_updated runner.py:131–149): how often the
    # supervisor re-lists the event root for created/removed databases.
    # Dead-query restarts still happen every poll — only *discovery* is
    # rate-limited, exactly like the reference's 1 s process-check vs
    # 120 s database-rescan split.
    check_db_updated_interval: float = 120.0

    # Accepted-but-inert reference knobs (loaded without error so every
    # reference YAML works; each is a no-op here by design):
    #  - auto_restart_interval (config.py:137/:193): the reference
    #    restarts its per-db worker PROCESSES hourly to bound Python
    #    memory growth; Spark executors are long-lived JVMs and the
    #    streaming checkpoint already gives crash-equivalent restart, so
    #    there is nothing to restart on a timer.
    #  - cluster_mode (config.py:166/:203, ClickHouse ``ON CLUSTER``
    #    Distributed DDL): the replica root is one partitioned parquet
    #    namespace visible to every executor — there is no per-node DDL
    #    to fan out.
    #  - debug_log_level (config.py:150/:288): folded into log_level
    #    ("debug" wins over the default) at load time.
    auto_restart_interval: float = 3600.0
    cluster_mode: bool = False
    debug_log_level: bool = False

    # event-log directory (the reference's ``binlog_replicator.data_dir``,
    # config.py:111–113) — where EventLogWriter/stream_event_log live
    event_log_dir: str = ""

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
        if settings.debug_log_level:
            settings.log_level = "debug"
        settings._apply_env_overrides()
        settings.validate()
        return settings

    @classmethod
    def from_reference_yaml(cls, path_or_dict) -> "Settings":
        """Load a config written for the REFERENCE's YAML surface
        (reference config.py:172–238 + example_config.yaml) unchanged.

        Every reference key is accepted; blocks map onto the Spark-first
        surface: ``mysql`` → a JDBC url source, ``clickhouse`` → the
        replica settings (``cluster`` → cluster_mode), ``binlog_replicator``
        → the event-log dir/rotation/retention, and the list-form
        ``indexes``/``partition_bys``/``order_bys``/
        ``post_initial_replication_commands`` (per-db/table glob entries,
        reference config.py:38–62) flatten to the per-table dict form.
        Unknown keys raise, same as the reference (config.py:236)."""
        if isinstance(path_or_dict, dict):
            raw = dict(path_or_dict)
        else:
            import yaml
            with open(path_or_dict, encoding="utf-8") as fh:
                raw = yaml.safe_load(fh) or {}

        my = cls()._asdict_shallow()
        out: dict = {}
        mysql = raw.pop("mysql", {})
        if mysql:
            host = mysql.get("host", "localhost")
            port = int(mysql.get("port", 3306))
            out["source"] = {
                "url": f"jdbc:mysql://{host}:{port}",
                "user": mysql.get("user", "root"),
                "password": mysql.get("password", ""),
                "charset": mysql.get("charset", "utf8mb4"),
            }
        ch = raw.pop("clickhouse", {})
        if ch:
            out["replica"] = {"erase_batch_size":
                              int(ch.get("erase_batch_size", 100_000))}
            if ch.get("cluster"):
                raw.setdefault("cluster_mode", True)
        binlog = raw.pop("binlog_replicator", {})
        if binlog:
            out["event_log_dir"] = binlog.get("data_dir", "binlog")
            if "records_per_file" in binlog:
                out["records_per_file"] = int(binlog["records_per_file"])
            if "binlog_retention_period" in binlog:
                out["binlog_retention_period"] = \
                    float(binlog["binlog_retention_period"])

        def _exact_tables(entry) -> list[str]:
            """Expand an entry's ``tables`` into dict keys: exact names
            key directly; a glob keys as the glob itself (matched at
            lookup time by the per-table override getters)."""
            t = entry.get("tables", "*")
            return t if isinstance(t, list) else [t]

        for key, spec_field in (("indexes", "index"),
                                ("partition_bys", "partition_by"),
                                ("order_bys", "order_by")):
            entries = raw.pop(key, [])
            mapped: dict[str, list[str]] = {}
            for entry in entries:
                spec = entry.get(spec_field, "")
                cols = [c.strip().strip("`")
                        for c in spec.strip().strip("()").split(",")
                        if c.strip()]
                for t in _exact_tables(entry):
                    mapped.setdefault(t, []).extend(cols)
            if mapped:
                out[key] = mapped
        cmds = raw.pop("post_initial_replication_commands", [])
        if cmds:
            out["post_initial_replication_commands"] = \
                [c for entry in cmds for c in (entry.get("commands") or [])]

        for key in list(raw):
            if key in my:
                out[key] = raw.pop(key)
        raw.pop("settings_file", None)
        if raw:
            raise ValueError(
                f"unsupported reference config options: {sorted(raw)}")
        return cls.load(out)

    def _asdict_shallow(self) -> dict:
        return {f.name: getattr(self, f.name)
                for f in dataclasses.fields(self)}

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
        if self.apply_parallelism < 1:
            raise ValueError("apply_parallelism must be >= 1")
        if not isinstance(self.version_initial_value, int) \
                or self.version_initial_value < 0:
            raise ValueError("version_initial_value must be an int >= 0")
        if not isinstance(self.http_port, int) \
                or not (0 <= self.http_port <= 65535):
            raise ValueError("http_port must be an int in [0, 65535]")
        if self.check_db_updated_interval <= 0:
            raise ValueError("check_db_updated_interval must be positive")
        if self.auto_restart_interval < 0:
            raise ValueError("auto_restart_interval must be >= 0")
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

    # -- per-table layout overrides (glob-aware) -----------------------------

    def _table_override(self, mapping: dict[str, list[str]],
                        table: str) -> list[str]:
        """Exact table key wins; otherwise the first glob entry that
        matches. Reference Index/PartitionBy/OrderBy entries carry table
        GLOBS (config.py:38–56), so ``from_reference_yaml`` keeps glob
        keys verbatim and they resolve here at lookup time."""
        if table in mapping:
            return list(mapping[table])
        for pat, cols in mapping.items():
            if any(ch in pat for ch in "*?[") and fnmatch.fnmatch(table, pat):
                return list(cols)
        return []

    def partition_by_for(self, table: str) -> list[str]:
        return self._table_override(self.partition_bys, table)

    def order_by_for(self, table: str) -> list[str]:
        return self._table_override(self.order_bys, table)

    def indexes_for(self, table: str) -> list[str]:
        return self._table_override(self.indexes, table)

    # -- target renaming ----------------------------------------------------

    def target_database(self, db_name: str) -> str:
        return self.target_databases.get(db_name, db_name)

    def target_table(self, table_name: str) -> str:
        return self.target_tables.get(table_name, table_name)
