"""A19 log bridging: requester-prefixed records in one logging tree,
one level knob spanning Python and the JVM log4j root (reference
parity: InjectionLogger.java:12-68)."""

from __future__ import annotations

import logging

from biodwh2_arcadedb_server_spark.logging_bridge import (
    PACKAGE_LOGGER,
    engine_logger,
    set_engine_log_level,
)


def test_requester_prefix(caplog):
    log = engine_logger("workspace-build")
    with caplog.at_level(logging.INFO, logger=PACKAGE_LOGGER):
        log.info("label %s loaded", "Customer")
    assert caplog.records[-1].getMessage() == "[workspace-build] label Customer loaded"


def test_two_requesters_share_one_tree(caplog):
    with caplog.at_level(logging.INFO, logger=PACKAGE_LOGGER):
        engine_logger("cli").info("starting")
        engine_logger("http-server").info("bound")
    msgs = [r.getMessage() for r in caplog.records[-2:]]
    assert msgs == ["[cli] starting", "[http-server] bound"]


def test_level_knob_maps_to_log4j(spark):
    assert set_engine_log_level(logging.DEBUG, spark) == "DEBUG"
    assert logging.getLogger(PACKAGE_LOGGER).level == logging.DEBUG
    # unknown in-between level clamps to the next mapped one
    assert set_engine_log_level(logging.INFO + 1, spark) == "WARN"
    # restore the suite's quiet default
    assert set_engine_log_level(logging.WARNING, spark) == "WARN"
