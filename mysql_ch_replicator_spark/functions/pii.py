"""PII detection and redaction for training-data cleaning.

The standard pre-training scrub pass (emails, IPv4 addresses, SSN-style
ids, phone numbers) as pure built-in column expressions — one
``regexp_extract_all`` per counter and a chain of ``regexp_replace`` for
redaction, all inside whole-stage codegen. No Python in the hot path, so
the scrub runs at scan speed and composes with any projection.

The patterns are deliberately restricted to syntax that Java regex
(Spark) and RE2 (DuckDB, the correctness oracle) evaluate identically:
character classes, bounded repetition, alternation-free bodies, and the
ASCII word boundary ``\\b`` — no lookaround, no backreferences.

Reference parity: the reference engine has no PII pass (its conversions
stop at type mapping, mysql_ch_replicator/converter.py); this module is
part of the beyond-reference training-data pipeline surface (SURVEY.md
§2, LLM-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: redaction applies top to bottom. Email first (its local part
# may contain digit runs), then the digit-shaped ids from most to least
# specific so an SSN is never half-eaten by the phone pattern.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\+\d{1,2}[ -]\d{3}[ -]\d{3,4}[ -]\d{4}", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_count(col: Column, kind: str) -> Column:
    """Number of matches of one PII kind ('email'|'ssn'|'phone'|'ipv4')."""
    pattern = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its bracketed placeholder, applying the
    patterns in PII_PATTERNS order (each replace is global)."""
    out = col
    for _, pattern, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_sql(text_expr: str) -> tuple[dict[str, str], str]:
    """The DuckDB twin: ({kind: count_expr}, redacted_expr) over
    ``text_expr`` — same patterns, same order, 'g' (global) replaces."""
    counts = {
        kind: f"len(regexp_extract_all({text_expr}, '{pattern}'))"
        for kind, pattern, _ in PII_PATTERNS
    }
    redacted = text_expr
    for _, pattern, placeholder in PII_PATTERNS:
        redacted = (f"regexp_replace({redacted}, '{pattern}', "
                    f"'{placeholder}', 'g')")
    return counts, redacted


def k_anonymity_report(df, qi_cols: list[str], k: int = 5):
    """k-anonymity audit over quasi-identifier columns — the release
    gate run before publishing a training corpus with demographic-ish
    metadata: every row whose QI combination is shared by fewer than
    ``k`` rows is re-identifiable by joining on those columns alone
    (Sweeney 2002).

    Returns one row per QI combination below the threshold plus the
    summary columns a release report needs: (qi..., group_n,
    at_risk=true). Pure two-level aggregate — the QI groupBy combines
    map-side, and the report is group-cardinality-bounded however
    large the corpus; no joins, no windows."""
    groups = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_n"))
    return (groups.withColumn("at_risk", F.col("group_n") < k)
            .where(F.col("at_risk"))
            .orderBy(*qi_cols))
