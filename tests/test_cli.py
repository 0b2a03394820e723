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


def test_server_speaks_arcadedb_dialect(spark, sf_small):
    """Reference parity (ArcadeDBService.java:81-105): the /query
    endpoint accepts ArcadeDB-dialect statements — explicitly via
    language=arcadedb, and via the parse-failure fallback for
    Studio-style text Spark SQL cannot parse (SELECT FROM Type,
    TRAVERSE)."""
    import base64
    import json
    import urllib.request

    from pyspark.sql import functions as F

    from biodwh2_arcadedb_server_spark.server import QueryServer

    persons = spark.createDataFrame(
        [(1, "Person", "1", "pa", 10), (2, "Person", "2", "pb", 20)],
        "node_id long, label string, natural_key string, name string, age long",
    )
    persons.createOrReplaceTempView("n_Person")
    spark.createDataFrame(
        [(1, 2, "KNOWS")], "src long, dst long, label string"
    ).createOrReplaceTempView("edges")
    persons.select(
        "node_id", "label", "natural_key", F.create_map().alias("props")
    ).createOrReplaceTempView("nodes")

    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=json.dumps(payload).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    try:
        # explicit dialect routing
        out = post({"sql": "SELECT name FROM Person WHERE age = 20",
                    "language": "arcadedb"})
        assert out["rows"] == [["pb"]]
        # fallback: ArcadeDB shorthand Spark SQL cannot parse
        out = post({"sql": "SELECT FROM Person WHERE age = 10"})
        assert out["columns"][:2] == ["node_id", "label"] and len(out["rows"]) == 1
        # fallback covers TRAVERSE too
        out = post({"sql": "TRAVERSE out('KNOWS') FROM (SELECT FROM Person WHERE age = 10)"})
        assert sorted(r[0] for r in out["rows"]) == ["1", "2"]
        # plain Spark SQL still first-class
        assert post({"sql": "SELECT 2 AS two"})["rows"] == [["2"]]
    finally:
        srv.stop()


def test_console_page_and_dialect_query_through_it(spark, sf_small, tmp_path_factory):
    """Studio-analog console (reference README.md:19-26 workflow):
    GET / serves the HTML console behind the auth challenge, and the
    dialect statement the console posts executes through /query."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import build_workspace, load_workspace

    ws = str(tmp_path_factory.mktemp("console") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    load_workspace(spark, ws)
    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()
    try:
        # unauthenticated GET / challenges
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/")
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
            assert "Basic" in e.headers.get("WWW-Authenticate", "")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/",
            headers={"Authorization": f"Basic {auth}"},
        )
        with urllib.request.urlopen(req) as resp:
            page = resp.read().decode()
            assert resp.headers["Content-Type"].startswith("text/html")
        assert "<html" in page and "/query" in page and "/graphql" in page
        # the exact statement the console ships as its default
        body = _json.dumps(
            {"sql": "SELECT label, count(*) AS n FROM nodes "
                    "GROUP BY label ORDER BY n DESC", "language": "sql"}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=body,
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            out = _json.loads(resp.read())
        assert out["columns"] == ["label", "n"]
        assert len(out["rows"]) > 0
        # and a dialect MATCH through the same endpoint (console's
        # "ArcadeDB dialect" mode)
        body = _json.dumps(
            {"sql": "MATCH {type: Region, as: r}<-IN_REGION-"
                    "{type: Nation, as: n} RETURN r.natural_key AS rk, "
                    "count(*) AS n_nations",
             "language": "arcadedb"}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=body,
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            out = _json.loads(resp.read())
        assert out["columns"] == ["rk", "n_nations"] and len(out["rows"]) == 5
    finally:
        srv.stop()


def test_arcadedb_v1_api_wire_compat(spark, sf_small, tmp_path_factory):
    """The literal ArcadeDB REST shape: /api/v1/ready, /api/v1/query
    (idempotent, ArcadeDB-SQL language), /api/v1/command (gated
    writes) — {"result": [records]} responses."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import build_workspace, load_workspace

    ws = str(tmp_path_factory.mktemp("v1api") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    load_workspace(spark, ws)
    srv = QueryServer(spark, workspace_dir=ws, allow_writes=True)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=_json.dumps(payload).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read())

    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/v1/ready") as r:
            assert r.status == 204
        out = post(
            "/api/v1/query/biodwh2",
            {"language": "sql",
             "command": "SELECT n_name FROM Nation WHERE natural_key = 3"},
        )
        assert len(out["result"]) == 1 and "n_name" in out["result"][0]
        # graph dialect through the same route
        out2 = post(
            "/api/v1/query/biodwh2",
            {"language": "sql",
             "command": "SELECT natural_key, out('IN_REGION').size() AS d "
                        "FROM Nation WHERE natural_key <= 2"},
        )
        assert {r["d"] for r in out2["result"]} == {1}
        # non-idempotent on /query → 400
        try:
            post("/api/v1/query/biodwh2",
                 {"command": "INSERT INTO Nation SET natural_key = 990"})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # /command runs it (writes enabled on this server)
        out3 = post(
            "/api/v1/command/biodwh2",
            {"language": "sql",
             "command": "INSERT INTO Nation SET natural_key = 990, "
                        "n_name = 'WIRELAND'"},
        )
        assert out3["result"][0]["count"] == 1
        out4 = post(
            "/api/v1/query/biodwh2",
            {"command": "SELECT n_name FROM Nation WHERE natural_key = 990"},
        )
        assert out4["result"] == [{"n_name": "WIRELAND"}]
        # graphql language
        out5 = post(
            "/api/v1/query/biodwh2",
            {"language": "graphql",
             "command": "{ Nation(natural_key: 3) { n_name } }"},
        )
        assert len(out5["result"]) == 1
        # parameterized statement, the driver wire contract: named
        # :params bound server-side as escaped literals
        out6 = post(
            "/api/v1/query/biodwh2",
            {"language": "sql",
             "command": "SELECT n_name FROM Nation WHERE natural_key = :k",
             "params": {"k": 3}},
        )
        assert len(out6["result"]) == 1 and "n_name" in out6["result"][0]
        # a hostile param value stays one literal (no injection)
        out7 = post(
            "/api/v1/query/biodwh2",
            {"language": "sql",
             "command": "SELECT n_name FROM Nation WHERE n_name = :n",
             "params": {"n": "x' OR '1'='1"}},
        )
        assert out7["result"] == []
        # positional ? params
        out8 = post(
            "/api/v1/query/biodwh2",
            {"language": "sql",
             "command": "SELECT count(*) AS c FROM Nation "
                        "WHERE natural_key BETWEEN ? AND ?",
             "params": [0, 4]},
        )
        assert out8["result"][0]["c"] == 5
    finally:
        srv.stop()


def test_v1_api_spark_fallback_is_read_only(spark, sf_small, tmp_path_factory):
    """The /api/v1 Spark-SQL fallback must not run write-shaped
    statements the dialect rejected — neither on the idempotent
    /query route nor around the allow_writes gate (round-7 review)."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import build_workspace, load_workspace

    ws = str(tmp_path_factory.mktemp("v1ro") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    load_workspace(spark, ws)
    srv = QueryServer(spark)  # writes NOT enabled
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=_json.dumps(payload).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read())

    try:
        for path in ("/api/v1/query/db", "/api/v1/command/db"):
            try:
                post(path, {"command": "DROP VIEW n_Nation"})
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        # the view survived
        out = post("/api/v1/query/db",
                   {"command": "SELECT count(*) AS n FROM Nation"})
        assert out["result"][0]["n"] == 25
        # read-shaped Spark SQL still answers through the fallback
        out2 = post("/api/v1/query/db",
                    {"command": "SELECT 1 AS one UNION ALL SELECT 2"})
        assert len(out2["result"]) == 2
        # nested GraphQL over the wire serializes dates etc.
        out3 = post("/api/v1/query/db",
                    {"language": "graphql",
                     "command": "{ Customer(limit: 2) { c_name placed "
                                "{ o_orderdate } } }"})
        assert len(out3["result"]) == 2
        assert isinstance(out3["result"][0]["placed"], list)
    finally:
        srv.stop()


def test_query_endpoint_write_gate(spark, sf_small, tmp_path):
    """Round-7 ADVICE (high + medium): Spark-shaped writes that don't
    match claims_statement() — CTAS, INSERT INTO … SELECT, INSERT
    OVERWRITE DIRECTORY, and a write hidden behind a WITH head — must
    NOT execute on a read-only server's /query endpoint, and the CLI
    honors the same gate. allow_writes=True restores them."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.cli import _run_sql
    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.sources.registry import register_tables

    register_tables(spark, sf_small)
    srv = QueryServer(spark)  # writes NOT enabled
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(sql):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=_json.dumps({"sql": sql}).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read())

    out_dir = tmp_path / "exfil"
    writes = [
        "CREATE TABLE sneaky_ctas AS SELECT 1 AS x",
        "INSERT INTO nation SELECT * FROM nation",
        f"INSERT OVERWRITE DIRECTORY '{out_dir}' USING parquet SELECT 1",
        # the WITH head hid this from the old head allowlist
        "WITH c AS (SELECT 1 AS x) INSERT INTO nation SELECT * FROM nation",
        "CACHE TABLE nation",
    ]
    try:
        for sql in writes:
            try:
                post(sql)
                raise AssertionError(f"expected 403 for {sql!r}")
            except urllib.error.HTTPError as e:
                assert e.code == 403, sql
        assert not out_dir.exists()
        assert "sneaky_ctas" not in [
            t.name for t in spark.catalog.listTables()
        ]
        # reads still answer, including WITH-SELECT
        assert post("WITH c AS (SELECT 1 AS one) SELECT * FROM c")[
            "rows"
        ] == [["1"]]
    finally:
        srv.stop()

    # CLI: same fall-through, same gate
    with pytest.raises(PermissionError):
        _run_sql(spark, "CREATE TABLE sneaky_cli AS SELECT 1 AS x")
    # --allow-writes restores session-scoped Spark DDL
    _run_sql(
        spark, "CREATE TEMPORARY VIEW gate_ok AS SELECT 1 AS x",
        allow_writes=True,
    )
    assert spark.sql("SELECT * FROM gate_ok").count() == 1
    spark.catalog.dropTempView("gate_ok")


def test_v1_api_transaction_sessions(spark, sf_small, tmp_path_factory):
    """ArcadeDB v1 transaction routes (round 8): begin returns a
    session id; DML commands carrying the arcadedb-session-id header
    stage instead of executing; rollback leaves the workspace
    unchanged; a fresh begin → stage → commit applies atomically via
    the shadow-workspace swap; the committed state reads back."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import build_workspace, load_workspace

    ws = str(tmp_path_factory.mktemp("v1txn") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    load_workspace(spark, ws)
    srv = QueryServer(spark, workspace_dir=ws, allow_writes=True)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(path, payload=None, sid=None):
        headers = {"Authorization": f"Basic {auth}"}
        if sid:
            headers["arcadedb-session-id"] = sid
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=_json.dumps(payload or {}).encode(),
            headers=headers,
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read()), resp.headers

    def nation_count():
        out, _ = post("/api/v1/query/db",
                      {"command": "SELECT count(*) AS n FROM Nation"})
        return out["result"][0]["n"]

    base_n = nation_count()
    try:
        # --- begin → two staged commands → rollback: nothing applied
        out, hdrs = post("/api/v1/begin/db")
        sid = hdrs["arcadedb-session-id"]
        assert out["result"][0]["sessionId"] == sid
        for key in (990, 991):
            out, _ = post(
                "/api/v1/command/db",
                {"command": f"INSERT INTO Nation SET natural_key = {key}, "
                            f"n_name = 'TXN{key}'"},
                sid=sid,
            )
            assert out["result"][0]["operation"] == "staged"
        assert nation_count() == base_n  # staged, not applied
        out, _ = post("/api/v1/rollback/db", sid=sid)
        assert out["result"][0]["statements"] == 2
        assert nation_count() == base_n
        # the session is closed now
        try:
            post("/api/v1/commit/db", sid=sid)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # --- begin → stage → commit: applied atomically
        out, hdrs = post("/api/v1/begin/db")
        sid2 = hdrs["arcadedb-session-id"]
        post("/api/v1/command/db",
             {"command": "INSERT INTO Nation SET natural_key = 992, "
                         "n_name = 'TXNCOMMIT'"},
             sid=sid2)
        # reads inside the session still answer (pre-commit state)
        assert nation_count() == base_n
        out, _ = post("/api/v1/commit/db", sid=sid2)
        assert out["result"][0]["statements"] == 1
        assert nation_count() == base_n + 1
        out, _ = post("/api/v1/query/db",
                      {"command": "SELECT n_name FROM Nation "
                                  "WHERE natural_key = 992"})
        assert out["result"][0]["n_name"] == "TXNCOMMIT"

        # --- empty transaction commits as a no-op (read-only client
        # library pattern)
        _, hdrs = post("/api/v1/begin/db")
        out, _ = post("/api/v1/commit/db", sid=hdrs["arcadedb-session-id"])
        assert out["result"][0]["statements"] == 0

        # --- a failing statement rolls the whole transaction back
        _, hdrs = post("/api/v1/begin/db")
        sid3 = hdrs["arcadedb-session-id"]
        post("/api/v1/command/db",
             {"command": "INSERT INTO Nation SET natural_key = 993, "
                         "n_name = 'NEVER'"},
             sid=sid3)
        post("/api/v1/command/db",
             {"command": "DELETE FROM NoSuchType WHERE natural_key = 1"},
             sid=sid3)
        try:
            post("/api/v1/commit/db", sid=sid3)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert nation_count() == base_n + 1  # 993 NOT applied
    finally:
        srv.stop()


def test_v1_api_sqlscript(spark, sf_small, tmp_path_factory):
    """language=sqlscript: multi-statement scripts (Studio semantics —
    statements run in order, the LAST one's result answers); write
    scripts honor the same gates as single statements."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import build_workspace, load_workspace

    ws = str(tmp_path_factory.mktemp("sqlscript") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    load_workspace(spark, ws)
    srv = QueryServer(spark, workspace_dir=ws, allow_writes=True)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=_json.dumps(payload).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read())

    try:
        # read-only script on /query: last statement answers
        out = post(
            "/api/v1/query/biodwh2",
            {"language": "sqlscript",
             "command": "SELECT count(*) AS a FROM Region; "
                        "SELECT n_name FROM Nation WHERE natural_key = 3;"},
        )
        assert len(out["result"]) == 1 and "n_name" in out["result"][0]
        # any write statement inside a /query script -> 400
        try:
            post("/api/v1/query/biodwh2",
                 {"language": "sqlscript",
                  "command": "SELECT 1 FROM Region; "
                             "INSERT INTO Nation SET natural_key = 991"})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # write script on /command: runs in order, last result answers
        out2 = post(
            "/api/v1/command/biodwh2",
            {"language": "sqlscript",
             "command": "INSERT INTO Nation SET natural_key = 991, "
                        "n_name = 'SCRIPTIA'; "
                        "SELECT n_name FROM Nation WHERE natural_key = 991"},
        )
        assert out2["result"] == [{"n_name": "SCRIPTIA"}]
        # script inside a transaction: writes stage as a unit
        b = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/begin/biodwh2",
            data=b"{}", headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(b) as resp:
            sid = resp.headers["arcadedb-session-id"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/command/biodwh2",
            data=_json.dumps({
                "language": "sqlscript",
                "command": "INSERT INTO Nation SET natural_key = 992, "
                           "n_name = 'A'; INSERT INTO Nation SET "
                           "natural_key = 993, n_name = 'B'",
            }).encode(),
            headers={"Authorization": f"Basic {auth}",
                     "arcadedb-session-id": sid},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            staged = _json.loads(resp.read())["result"][0]
        assert staged["operation"] == "staged" and staged["statement"] == 1  # 0-based pos of the LAST staged statement
        c = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/commit/biodwh2",
            data=b"{}", headers={"Authorization": f"Basic {auth}",
                                 "arcadedb-session-id": sid},
            method="POST",
        )
        with urllib.request.urlopen(c) as resp:
            assert resp.status == 200
        out3 = post(
            "/api/v1/query/biodwh2",
            {"command": "SELECT count(*) AS n FROM Nation "
                        "WHERE natural_key IN [992, 993]"},
        )
        assert out3["result"][0]["n"] == 2
    finally:
        srv.stop()


def test_transaction_manager_ttl_and_stage_race_safety(spark, sf_small, tmp_path_factory):
    """Round-8 review fixes: idle sessions are evicted at begin (no
    permanent MAX_ACTIVE exhaustion), and staging into a just-closed
    session errors instead of appending to an orphan."""
    from biodwh2_arcadedb_server_spark import transactions as txn_mod
    from biodwh2_arcadedb_server_spark.transactions import (
        TransactionError,
        TransactionManager,
    )
    from biodwh2_arcadedb_server_spark.workspace import build_workspace

    ws = str(tmp_path_factory.mktemp("ttl") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    mgr = TransactionManager()
    sid = mgr.begin(ws)
    # age the session past the TTL and begin again: slot reclaimed
    mgr._txns[sid]["touched"] -= txn_mod.IDLE_TTL_SECONDS + 1
    sid2 = mgr.begin(ws)
    assert not mgr.active(sid) and mgr.active(sid2)
    # staging into the evicted session is a loud error
    import pytest as _pytest

    with _pytest.raises(TransactionError, match="unknown or closed"):
        mgr.stage(sid, "INSERT INTO Nation SET natural_key = 999")
    # rollback closes; stage after close errors (the race-window shape)
    mgr.stage(sid2, "INSERT INTO Nation SET natural_key = 999")
    mgr.rollback(sid2)
    with _pytest.raises(TransactionError, match="unknown or closed"):
        mgr.stage(sid2, "INSERT INTO Nation SET natural_key = 998")


def test_mixed_script_in_txn_stages_nothing(spark, sf_small, tmp_path_factory):
    """A rejected mixed read/write script must leave NOTHING staged —
    a later commit must not apply half a refused script (round-8
    review finding)."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import build_workspace, load_workspace

    ws = str(tmp_path_factory.mktemp("mixedtxn") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    load_workspace(spark, ws)
    srv = QueryServer(spark, workspace_dir=ws, allow_writes=True)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(path, payload, sid=None):
        headers = {"Authorization": f"Basic {auth}"}
        if sid:
            headers["arcadedb-session-id"] = sid
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=_json.dumps(payload).encode(), headers=headers, method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read()), resp.headers

    try:
        _, h = post("/api/v1/begin/biodwh2", {})
        sid = h["arcadedb-session-id"]
        try:
            post("/api/v1/command/biodwh2",
                 {"language": "sqlscript",
                  "command": "INSERT INTO Nation SET natural_key = 994, "
                             "n_name = 'LEAK'; SELECT FROM Nation"},
                 sid=sid)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # committing now applies NOTHING (empty transaction)
        out, _ = post("/api/v1/commit/biodwh2", {}, sid=sid)
        assert out["result"][0]["statements"] == 0
        chk, _ = post("/api/v1/query/biodwh2",
                      {"command": "SELECT count(*) AS n FROM Nation "
                                  "WHERE natural_key = 994"})
        assert chk["result"][0]["n"] == 0
    finally:
        srv.stop()


def test_v1_api_databases_and_exists(spark, sf_small):
    """ArcadeDB wire shape: GET /api/v1/databases lists ['biodwh2'],
    GET /api/v1/exists/{db} answers {"result": bool} — clients call
    both right after connect."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.sources.registry import register_tables

    register_tables(spark, sf_small)
    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def get(path):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            headers={"Authorization": f"Basic {auth}"},
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read())

    try:
        assert get("/api/v1/databases") == {"result": ["biodwh2"]}
        assert get("/api/v1/exists/biodwh2") == {"result": True}
        assert get("/api/v1/exists/nope") == {"result": False}
        # both are auth-gated
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/v1/databases"
            )
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
    finally:
        srv.stop()


def test_v1_server_management_surface(spark, sf_small):
    """ArcadeDB management wire shape (round 9): GET /api/v1/server
    reports status (user/version/uptime/databases/readOnly); POST
    /api/v1/server executes 'create database' / 'drop database' —
    403 on a read-only server, database inventory reflected in
    /databases and /exists, serving database protected from drop."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.sources.registry import register_tables

    register_tables(spark, sf_small)

    def client(srv, port):
        auth = base64.b64encode(
            f"{srv.username}:{srv.password}".encode()
        ).decode()

        def get(path):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                headers={"Authorization": f"Basic {auth}"},
            )
            with urllib.request.urlopen(req) as resp:
                return _json.loads(resp.read())

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=_json.dumps(payload).encode(),
                headers={"Authorization": f"Basic {auth}"},
                method="POST",
            )
            with urllib.request.urlopen(req) as resp:
                return _json.loads(resp.read())

        return get, post

    # read-only server: status works, management is 403
    srv = QueryServer(spark)
    port = srv.start()
    get, post = client(srv, port)
    try:
        status = get("/api/v1/server")
        assert status["user"] == srv.username
        assert status["databases"] == ["biodwh2"]
        assert status["readOnly"] is True
        assert status["uptimeSeconds"] >= 0
        try:
            post("/api/v1/server", {"command": "create database extra"})
            raise AssertionError("expected 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
    finally:
        srv.stop()

    # write-enabled: create → listed/exists → drop → gone; serving db
    # and unknown names are clean 400s
    srv = QueryServer(spark, allow_writes=True)
    port = srv.start()
    get, post = client(srv, port)
    try:
        assert post("/api/v1/server", {"command": "create database extra"}) == {"result": "ok"}
        assert get("/api/v1/databases") == {"result": ["biodwh2", "extra"]}
        assert get("/api/v1/exists/extra") == {"result": True}
        for bad in (
            {"command": "create database extra"},   # duplicate
            {"command": "drop database biodwh2"},   # serving db
            {"command": "drop database ghost"},     # unknown
            {"command": "shutdown"},                # unsupported verb
        ):
            try:
                post("/api/v1/server", bad)
                raise AssertionError(f"expected 400 for {bad}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        assert post("/api/v1/server", {"command": "drop database extra"}) == {"result": "ok"}
        assert get("/api/v1/exists/extra") == {"result": False}
    finally:
        srv.stop()


def test_v1_server_settings_events_and_svg(spark, sf_small, tmp_path_factory):
    """Round-11 wire surface (VERDICT r10 #5/#6): GET /api/v1/server
    reports the read-only settings block (mode=basic omits it), POST
    /api/v1/server 'get server events' reads the bounded event ring
    buffer on read-only AND write servers, and the neighborhood
    route's ?format=svg renders the node-link sketch carrying every
    neighbor RID (the console embeds it)."""
    import base64
    import json as _json
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import (
        build_workspace,
        load_workspace,
    )

    ws = str(tmp_path_factory.mktemp("v1svg") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    load_workspace(spark, ws)

    def client(srv, port):
        auth = base64.b64encode(
            f"{srv.username}:{srv.password}".encode()
        ).decode()

        def get(path, raw=False):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                headers={"Authorization": f"Basic {auth}"},
            )
            with urllib.request.urlopen(req) as resp:
                body = resp.read()
                ctype = resp.headers.get("Content-Type", "")
                return (body, ctype) if raw else _json.loads(body)

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=_json.dumps(payload).encode(),
                headers={"Authorization": f"Basic {auth}"},
                method="POST",
            )
            with urllib.request.urlopen(req) as resp:
                return _json.loads(resp.read())

        return get, post

    # read-only server: settings visible, events readable (a read)
    srv = QueryServer(spark, workspace_dir=ws)
    port = srv.start()
    get, post = client(srv, port)
    try:
        status = get("/api/v1/server")
        keys = {s["key"]: s for s in status["settings"]}
        assert keys["server.readOnly"]["value"] == "True"
        assert keys["spark.sql.shuffle.partitions"]["value"]
        assert "description" in keys["spark.sql.adaptive.enabled"]
        assert keys["server.name"]["overridden"] is False
        assert "settings" not in get("/api/v1/server?mode=basic")
        ev = post("/api/v1/server", {"command": "get server events"})
        assert any(
            e["component"] == "Server" and "server started" in e["message"]
            and "read-only" in e["message"]
            for e in ev["result"]
        )
    finally:
        srv.stop()

    # write server: management + DML events land in the buffer;
    # neighborhood SVG carries the neighbor RIDs
    srv = QueryServer(spark, workspace_dir=ws, allow_writes=True)
    port = srv.start()
    get, post = client(srv, port)
    try:
        post("/api/v1/server", {"command": "create database evdb"})
        post(
            "/api/v1/command/biodwh2",
            {"language": "sql",
             "command": "INSERT INTO Nation SET natural_key = 991, "
                        "n_name = 'EVENTLAND'"},
        )
        ev = post("/api/v1/server", {"command": "get server events"})[
            "result"
        ]
        assert any(
            e["component"] == "Management"
            and e["message"] == "create database evdb" for e in ev
        )
        assert any(
            e["component"] == "Command"
            and e["message"].startswith("INSERT INTO Nation") for e in ev
        )

        rid_rows = post(
            "/api/v1/query/biodwh2",
            {"language": "sql",
             "command": "SELECT @rid AS rid FROM Nation "
                        "WHERE natural_key = 3"},
        )["result"]
        rid = str(rid_rows[0]["rid"])
        hood = get(f"/api/v1/neighborhood/{rid}")
        n_rids = [e["rid"] for e in hood["out"] + hood["in"] if e["rid"]]
        assert n_rids, "expected 1-hop neighbors for Nation 3"
        body, ctype = get(
            f"/api/v1/neighborhood/{rid}?format=svg", raw=True
        )
        svg = body.decode()
        assert ctype.startswith("image/svg+xml")
        assert svg.startswith("<svg") and svg.endswith("</svg>")
        assert hood["rid"] in svg
        for nr in n_rids:
            assert nr in svg, f"neighbor {nr} missing from the sketch"
    finally:
        srv.stop()


def test_neighborhood_depth2_and_svg_legend(spark, sf_small, tmp_path_factory):
    """Round-12 console polish (VERDICT r11 #7): ?depth=2 returns a
    batched second-hop payload (entries anchored to their 1-hop
    neighbor via from_rid, own cap + truncated flag, depth=3
    rejected), and the SVG sketch carries a deterministic edge-type
    color legend (one .leg entry per distinct edge label, links
    stroked with the legend color)."""
    import base64
    import json as _json
    import re as _re
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import (
        build_workspace,
        load_workspace,
    )

    ws = str(tmp_path_factory.mktemp("hood2") / "ws")
    build_workspace(spark, sf_small, ws, force=True)
    load_workspace(spark, ws)
    srv = QueryServer(spark, workspace_dir=ws)
    port = srv.start()
    auth = base64.b64encode(
        f"{srv.username}:{srv.password}".encode()
    ).decode()

    def get(path, raw=False):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            headers={"Authorization": f"Basic {auth}"},
        )
        with urllib.request.urlopen(req) as resp:
            body = resp.read()
            return body if raw else _json.loads(body)

    try:
        from pyspark.sql import functions as F

        nid = (
            spark.table("n_Nation")
            .where(F.col("natural_key") == 3)
            .select("node_id")
            .collect()[0][0]
        )
        base = f"/api/v1/neighborhood/{nid}"
        h1 = get(base)
        h2 = get(base + "?depth=2")
        assert h2["depth"] == 2 and "hops2" in h2
        assert h2["out"] == h1["out"] and h2["in"] == h1["in"]
        assert h2["hops2"], "Nation 3 has 2-hop neighbors via Region"
        one_rids = {e["rid"] for e in h2["out"] + h2["in"]}
        for e in h2["hops2"]:
            assert e["from_rid"] in one_rids
            assert e["direction"] in ("out", "in")
            assert e["rid"] != h2["rid"]  # focus excluded from hop 2
        assert "hops2" in h2["truncated"]
        # depth cap enforced
        try:
            get(base + "?depth=3")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as exc:
            assert exc.code == 400

        svg = get(base + "?format=svg", raw=True).decode()
        edge_types = sorted(
            {e["edge"] for e in h1["out"] + h1["in"] if e.get("edge")}
        )
        assert edge_types, "Nation 3 should touch typed edges"
        legend = _re.findall(r'<text class="leg"[^>]*>([^<]+)</text>', svg)
        assert legend == edge_types
        # every link is stroked with a legend color (no grey default)
        strokes = set(_re.findall(r'<path class="e" stroke="(#\w+)"', svg))
        assert strokes and "#999" not in strokes
    finally:
        srv.stop()


def test_neighborhood_svg_draws_second_hop():
    """Round 13 (VERDICT r12 #7): ?depth=2 SVG draws the second hop —
    hop-2 nodes appear in the outer columns with their RIDs, each
    linked from its anchoring 1-hop neighbor, with hop-2 edge types
    in the legend. Pure renderer test over a fixed payload, fully
    deterministic."""
    from biodwh2_arcadedb_server_spark.server import render_neighborhood_svg

    payload = {
        "rid": "#1:3", "type": "Nation",
        "record": {"n_name": "CANADA"},
        "out": [
            {"edge": "IN_REGION", "rid": "#0:7", "type": "Region",
             "natural_key": "1"},
        ],
        "in": [
            {"edge": "CUST_IN_NATION", "rid": "#2:11", "type": "Customer",
             "natural_key": "5"},
        ],
        "truncated": {"out": False, "in": False, "hops2": False},
        "cap": 200,
        "depth": 2,
        "hops2": [
            {"from_rid": "#0:7", "edge": "IN_REGION", "rid": "#1:9",
             "type": "Nation", "natural_key": "9", "direction": "in"},
            {"from_rid": "#2:11", "edge": "PLACED", "rid": "#5:42",
             "type": "Order", "natural_key": "42", "direction": "out"},
        ],
    }
    svg = render_neighborhood_svg(payload)
    # hop-2 nodes rendered with their click-through RIDs
    assert "#1:9 Nation(9)" in svg
    assert "#5:42 Order(42)" in svg
    # hop-2 edge type entered the legend/color map (PLACED appears
    # only in hops2)
    assert "PLACED" in svg
    # wide canvas for the extra columns; count note still present
    assert 'width="1400"' in svg
    assert "+2 second-hop" in svg
    # depth-1 render unchanged: narrow canvas, affordance hint
    svg1 = render_neighborhood_svg(
        {k: v for k, v in payload.items() if k not in ("hops2", "depth")}
    )
    assert 'width="920"' in svg1 and "?depth=2" in svg1
    assert "#5:42" not in svg1

    # grouping: both hop-2 links start at their ANCHOR's coordinates —
    # the left anchor (#2:11 in-column) and right anchor (#0:7
    # out-column) each have exactly one extra outgoing path beyond
    # their 1-hop link
    assert svg.count("#2:11") == 1 and svg.count("#0:7") == 1
