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


def test_concurrent_two_client_serving(spark, sf_small):
    """A18: the embedded query server answers two authenticated
    clients whose requests overlap in flight (each thread fires
    several queries; both must see correct results and bad SQL must
    not take the server down)."""
    import base64
    import json
    import threading
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.sources.registry import register_tables

    register_tables(spark, sf_small)
    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(sql, headers=True):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=json.dumps({"sql": sql}).encode(),
            headers={"Authorization": f"Basic {auth}"} if headers else {},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    results: dict[str, list] = {"a": [], "b": [], "err": []}

    def client(name, sql, expect):
        try:
            for _ in range(3):
                out = post(sql)
                results[name].append(out["rows"][0][0] == expect)
        except Exception as exc:  # pragma: no cover - surfaced via assert
            results["err"].append(f"{name}: {exc}")

    t1 = threading.Thread(target=client, args=("a", "SELECT COUNT(*) AS n FROM nation", "25"))
    t2 = threading.Thread(target=client, args=("b", "SELECT COUNT(*) AS n FROM region", "5"))
    t1.start(); t2.start(); t1.join(); t2.join()
    try:
        assert not results["err"], results["err"]
        assert results["a"] == [True] * 3
        assert results["b"] == [True] * 3

        # unauthenticated requests are rejected (the biodwh2 user gate)
        import urllib.error

        try:
            post("SELECT 1", headers=False)
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401

        # bad SQL returns 400 and the server keeps serving
        try:
            post("SELECT FROM nowhere")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert post("SELECT 1 AS one")["rows"] == [["1"]]
    finally:
        srv.stop()
