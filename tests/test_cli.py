"""CLI lifecycle (A16-A17): port validation parity and the
create/query command path end-to-end on sf0.001."""

from __future__ import annotations

import pytest

from biodwh2_arcadedb_server_spark.cli import main, validate_port


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("2480", "2480"),  # single port
        ("2480-2489", "2480-2489"),  # range
        ("2489-2480", "2480-2489"),  # reversed range normalized
        ("-2480", "2480"),  # abs(), ArcadeDBService.java:62-79 parity
        ("garbage", "2480-2489"),  # fallback to default range
        (" 2481 ", "2481"),  # whitespace tolerated
    ],
)
def test_validate_port(raw, expected):
    assert validate_port(raw) == expected


def test_cli_create_then_query(spark, sf_small, tmp_path, capsys):
    ws = str(tmp_path / "cli_ws")
    assert main(["create", "--source", sf_small, "--workspace", ws]) == 0
    out = capsys.readouterr().out
    assert "workspace built" in out
    assert (
        main(
            [
                "query",
                "--source",
                sf_small,
                "--workspace",
                ws,
                "--sql",
                "SELECT COUNT(*) AS n FROM n_Nation",
            ]
        )
        == 0
    )
    assert "25" in capsys.readouterr().out
