"""Plan inspection helpers — the audit loop for scale-readiness."""

from biodwh2_arcadedb_server_spark.plans.audit import (  # noqa: F401
    explain_str,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema_columns,
)
