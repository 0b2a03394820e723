"""Log bridging — A19 parity.

The reference pipes the embedded engine's log records into its own
logging framework with the requesting component's name injected as a
prefix, and maps the engine's level enum onto the host framework's
levels (`/root/reference/src/.../InjectionLogger.java:12-68`). The
Spark analog bridges in both directions:

- **Requester prefix** (`engine_logger`): a `logging.LoggerAdapter`
  that stamps ``[<requester>]`` on every record, so multi-component
  logs (CLI, HTTP server, workspace build) interleave readably in one
  Python logging tree — the injected-prefix semantics of the
  reference.
- **One level knob** (`set_engine_log_level`): maps a single Python
  logging level onto BOTH the package's Python loggers and Spark's
  JVM log4j root (``sparkContext.setLogLevel``), so turning the
  engine quiet/verbose is one call regardless of which side of the
  JVM boundary a record originates.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

PACKAGE_LOGGER = "biodwh2_arcadedb_server_spark"

# Python logging level → log4j level string (sc.setLogLevel accepts
# ALL, DEBUG, ERROR, FATAL, INFO, OFF, TRACE, WARN)
_LOG4J_LEVEL = {
    logging.DEBUG: "DEBUG",
    logging.INFO: "INFO",
    logging.WARNING: "WARN",
    logging.ERROR: "ERROR",
    logging.CRITICAL: "FATAL",
}


class _RequesterAdapter(logging.LoggerAdapter):
    """Prefixes every record with the requesting component's name."""

    def process(self, msg, kwargs):
        return f"[{self.extra['requester']}] {msg}", kwargs


def engine_logger(requester: str, name: str = PACKAGE_LOGGER) -> logging.LoggerAdapter:
    """Logger for one engine component: records flow into the shared
    package logging tree tagged ``[requester]``."""
    return _RequesterAdapter(logging.getLogger(name), {"requester": requester})


def set_engine_log_level(level: int, spark: SparkSession | None = None) -> str:
    """Apply one Python logging level to the package's Python loggers
    and (when a session is given) the JVM log4j root. Returns the
    log4j level applied — unknown Python levels clamp to the nearest
    mapped one."""
    log4j = _LOG4J_LEVEL.get(level)
    if log4j is None:
        # clamp to the nearest standard level at or above
        for py_level in sorted(_LOG4J_LEVEL):
            log4j = _LOG4J_LEVEL[py_level]
            if py_level >= level:
                break
    logging.getLogger(PACKAGE_LOGGER).setLevel(level)
    if spark is not None:
        spark.sparkContext.setLogLevel(log4j)
    return log4j
