"""Statement gating — the ``SQLOptions::verify_plan`` analogue.

The reference runs every incoming SQL through a DataFusion ``SQLOptions``
gate before execution (reference: datafusion-flight-sql-server/src/
service.rs:92-101,170-175): three independent switches for DDL, DML, and
"statements" (SET and friends). Spark exposes no such verifier in PySpark, so
we parse the statement with the session's own SQL parser (JVM
``sessionState().sqlParser().parsePlan``) and classify the resulting logical
plan node by class name; a regex classifier is the fallback when the JVM walk
is unavailable (e.g. Spark Connect).

This is a pre-flight check on the *parsed* plan, like the reference — it runs
before analysis/execution and therefore costs no I/O.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import SparkSession


class PlanVerificationError(Exception):
    """Raised when a statement is rejected by the gate."""


# Parsed-plan class-name fragments → category. Spark DDL/DML parse to
# dedicated logical plan nodes, so a substring match on the class simple name
# is stable across Spark 3.4-4.x.
_DDL_FRAGMENTS = (
    "CreateTable",
    "CreateView",
    "CreateNamespace",
    "CreateFunction",
    "DropTable",
    "DropView",
    "DropNamespace",
    "DropFunction",
    "AlterTable",
    "AlterView",
    "AlterNamespace",
    "RenameTable",
    "ReplaceTable",
    "TruncateTable",
    "AddColumns",
    "DropColumns",
    "RenameColumn",
    "AlterColumn",
    "CreateIndex",
    "DropIndex",
)
_DML_FRAGMENTS = (
    "InsertInto",
    "InsertOverwrite",
    "DeleteFrom",
    "UpdateTable",
    "MergeInto",
    "OverwriteByExpression",
    "OverwritePartitions",
    "AppendData",
    "CopyInto",
)
_STATEMENT_FRAGMENTS = (
    "SetCommand",
    "SetCatalog",
    "SetNamespace",
    "ResetCommand",
    "AddJar",
    "AddFile",
    "AddArchive",
    "RefreshTable",
    "RefreshFunction",
    "CacheTable",
    "UncacheTable",
    "ClearCache",
    "AnalyzeTable",
    "AnalyzeColumn",
    "RepairTable",
    "LoadData",
    "TransactionStatement",
)

# Fallback keyword classifier (first significant token), used when the JVM
# parser is unreachable.
_DDL_RE = re.compile(r"^\s*(CREATE|DROP|ALTER|TRUNCATE|RENAME|REPLACE|COMMENT)\b", re.I)
_DML_RE = re.compile(r"^\s*(INSERT|UPDATE|DELETE|MERGE|COPY|IMPORT|LOAD)\b", re.I)
_STMT_RE = re.compile(
    r"^\s*(SET|RESET|USE|ADD\s+(JAR|FILE|ARCHIVE)|REFRESH|CACHE|UNCACHE|CLEAR|"
    r"ANALYZE|MSCK|BEGIN|COMMIT|ROLLBACK|START\s+TRANSACTION)\b",
    re.I,
)


@dataclass(frozen=True)
class SQLOptions:
    """Mirror of DataFusion's ``SQLOptions`` (reference: service.rs:92-101).

    The reference default for the Flight server denies all three categories
    (``with_allow_ddl(false).with_allow_dml(false)
    .with_allow_statements(false)``).
    """

    allow_ddl: bool = False
    allow_dml: bool = False
    allow_statements: bool = False

    def verify(self, spark: SparkSession, sql: str) -> None:
        """Raise :class:`PlanVerificationError` if ``sql`` is disallowed."""
        category = _classify(spark, sql)
        if category == "ddl" and not self.allow_ddl:
            raise PlanVerificationError(f"DDL not supported: {sql!r}")
        if category == "dml" and not self.allow_dml:
            raise PlanVerificationError(f"DML not supported: {sql!r}")
        if category == "statement" and not self.allow_statements:
            raise PlanVerificationError(f"Statements not supported: {sql!r}")


#: Gate used by the Flight server, matching the reference's server default
#: (queries only).
QUERY_ONLY = SQLOptions(allow_ddl=False, allow_dml=False, allow_statements=False)


def _classify(spark: SparkSession, sql: str) -> str:
    """Classify a statement as 'query' | 'ddl' | 'dml' | 'statement'."""
    cls = _parsed_plan_class(spark, sql)
    if cls is not None:
        if any(f in cls for f in _DDL_FRAGMENTS):
            return "ddl"
        if any(f in cls for f in _DML_FRAGMENTS):
            return "dml"
        if any(f in cls for f in _STATEMENT_FRAGMENTS):
            return "statement"
        return "query"
    # JVM unavailable → keyword fallback.
    if _DDL_RE.match(sql):
        return "ddl"
    if _DML_RE.match(sql):
        return "dml"
    if _STMT_RE.match(sql):
        return "statement"
    return "query"


def _parsed_plan_class(spark: SparkSession, sql: str) -> str | None:
    """Simple class name of the parsed (unanalyzed) logical plan, or None."""
    try:
        jplan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
        return jplan.getClass().getSimpleName()
    except Exception as exc:  # noqa: BLE001 - parse errors surface later
        # A genuine parse error should surface as an AnalysisException when
        # the query actually runs; the gate only cares about classification.
        name = type(exc).__name__
        if "ParseException" in name or "Parse" in str(exc)[:200]:
            # Let spark.sql raise the real error with its rich message.
            return None
        return None
