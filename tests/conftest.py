from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The suite reads small local parquet: opt in to the small-split
# scan tuning that get_spark() no longer bakes in as a library
# default (round-7 ADVICE).
os.environ.setdefault("SPARK_GRAFT_LOCAL_TUNING", "1")

from biodwh2_arcadedb_server_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF0001


@pytest.fixture(scope="session")
def sf_medium():
    return SF001
