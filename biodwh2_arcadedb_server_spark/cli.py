"""CLI lifecycle — reference parity for A16-A18 (SURVEY.md §3).

The reference exposes ``--create`` / ``--start`` / ``--create-start``
(`/root/reference/src/.../CmdArgs.java:6-25`,
`ArcadeDBServer.java:34-45`). Here:

- ``create``        — build the LPG workspace from a source dir (E1)
- ``start``         — register views, start the embedded concurrent
                      HTTP query server (server.QueryServer, the A18
                      analog of the reference's embedded ArcadeDB
                      HTTP server + ``biodwh2`` user) and serve an
                      interactive SQL loop alongside it (the Studio
                      console analog)
- ``create-start``  — both (E3)
- ``query``         — one-shot SQL against a workspace + source tables

Usage: ``python -m biodwh2_arcadedb_server_spark.cli create --source
/root/testdata/sf0.001 --workspace /tmp/ws``
"""

from __future__ import annotations

import argparse
import json
import sys

from biodwh2_arcadedb_server_spark.session import get_spark
from biodwh2_arcadedb_server_spark.sources.registry import register_tables
from biodwh2_arcadedb_server_spark.workspace import build_workspace, is_stale, load_workspace


def validate_port(value: str) -> str:
    """A17 parity (`ArcadeDBService.java:62-79`): accept "2480" or a
    range "2480-2489"; negatives are abs()'d; garbage falls back to
    the default range."""
    default = "2480-2489"
    v = value.strip()
    try:
        if "-" in v[1:]:
            lo, hi = v.split("-", 1) if not v.startswith("-") else (v[1:].split("-", 1))
            lo_i, hi_i = abs(int(lo)), abs(int(hi))
            return f"{min(lo_i, hi_i)}-{max(lo_i, hi_i)}"
        return str(abs(int(v)))
    except ValueError:
        return default


def port_candidates(spec: str) -> list[int]:
    """Expand a validated port spec ("2480" or "2480-2489") into the
    candidate list the server scans for the first free port —
    the reference's 2480-2489 behavior (`ArcadeDBService.java:62-79`)."""
    if "-" in spec:
        lo, hi = spec.split("-", 1)
        return list(range(int(lo), int(hi) + 1))
    return [int(spec)]


def start_server(
    spark,
    port_spec: str,
    password: str | None = None,
    workspace_dir: str | None = None,
    allow_writes: bool = False,
):
    """Start the embedded HTTP query server on the first free port of
    the validated spec. Returns the running QueryServer."""
    from biodwh2_arcadedb_server_spark.server import QueryServer

    last_err: Exception | None = None
    for port in port_candidates(validate_port(port_spec)):
        srv = QueryServer(
            spark, port=port, password=password,
            workspace_dir=workspace_dir, allow_writes=allow_writes,
        )
        try:
            srv.start()
            return srv
        except OSError as exc:  # port in use — scan on
            last_err = exc
    raise last_err or OSError("no free port in range")


def _setup(args) -> tuple:
    spark = get_spark("biodwh2-cli")
    register_tables(spark, args.source)
    return spark, args


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="biodwh2-arcadedb-server-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("create", "start", "create-start", "query"):
        sp = sub.add_parser(name)
        sp.add_argument("--source", required=True, help="source table dir (parquet)")
        sp.add_argument("--workspace", required=True, help="LPG workspace dir")
        sp.add_argument("--force", action="store_true", help="rebuild even if checksum matches")
        if name == "query":
            sp.add_argument("--sql", required=True)
            sp.add_argument(
                "--params",
                help="JSON dict (named :name) or list (positional ?) "
                     "of query parameters",
            )
        if name in ("start", "create-start", "query"):
            # Dialect DML (UPDATE/INSERT/DELETE) is OFF by default —
            # the reference serves the database read-only over HTTP.
            sp.add_argument(
                "--allow-writes", action="store_true",
                help="enable dialect DML against the workspace",
            )
        if name in ("start", "create-start"):
            sp.add_argument("--port", default="2480-2489", help="HTTP port or range")
            sp.add_argument("--no-server", action="store_true", help="console only")
    args = p.parse_args(argv)

    spark, args = _setup(args)
    if args.cmd in ("create", "create-start"):
        manifest = build_workspace(spark, args.source, args.workspace, force=args.force)
        n = sum(i["count"] for i in manifest["nodes"].values())
        e = sum(i["count"] for i in manifest["edges"].values())
        print(f"workspace built: {len(manifest['nodes'])} node labels ({n} nodes), "
              f"{len(manifest['edges'])} edge labels ({e} edges)")
    if args.cmd in ("start", "create-start"):
        if is_stale(args.source, args.workspace):
            # warn-only, like ArcadeDBServer.java:98-99
            print("WARNING: workspace is stale relative to source; rerun create", file=sys.stderr)
        load_workspace(spark, args.workspace)
        srv = None
        if not getattr(args, "no_server", False):
            srv = start_server(
                spark, args.port,
                workspace_dir=args.workspace,
                allow_writes=args.allow_writes,
            )
            print(
                f"query server on http://127.0.0.1:{srv.port} "
                f"(user {srv.username}, password {srv.password})"
            )
        print("views registered (n_<Label>, e_<LABEL>, nodes, edges). Enter SQL, blank line to exit.")
        for line in sys.stdin:
            sql = line.strip()
            if not sql:
                break
            try:
                _run_sql(
                    spark, sql, workspace=args.workspace,
                    allow_writes=args.allow_writes,
                ).show(50, truncate=False)
            except Exception as exc:  # keep the loop alive on bad SQL
                print(f"error: {exc}", file=sys.stderr)
        if srv is not None:
            srv.stop()
    if args.cmd == "query":
        load_workspace(spark, args.workspace)
        sql = args.sql
        if getattr(args, "params", None):
            from biodwh2_arcadedb_server_spark import arcadesql

            sql = arcadesql.bind_params(sql, json.loads(args.params))
        _run_sql(
            spark, sql, workspace=args.workspace,
            allow_writes=args.allow_writes,
        ).show(100, truncate=False)
    return 0


def _run_sql(spark, sql: str, workspace: str | None = None, allow_writes: bool = False):
    """Spark SQL first, ArcadeDB dialect on PARSE failure only — the
    same routing the embedded server uses, so the REPL and `query`
    accept Studio-style statements (SELECT FROM Type, TRAVERSE,
    MATCH). A query that parses as Spark SQL but fails (a misspelled
    column, say) still tries the dialect — `SELECT out('E') FROM
    Customer` parses as Spark SQL yet only analyzes through the
    dialect — but when the dialect path ALSO fails, the user sees the
    REAL Spark error, not an unrelated dialect parse error
    (ADVICE r4). Catches the broad PySparkException base (not just
    Parse/Analysis) because some dialect-only statements surface from
    spark.sql as Py4J-wrapped runtime errors, and the fallback must
    still attempt the dialect for those (ADVICE r5)."""
    from pyspark.errors import PySparkException

    from biodwh2_arcadedb_server_spark import arcadesql

    if arcadesql.claims_statement(sql):
        # Dialect DML/DDL routes straight to the dialect so the user
        # sees ITS error (e.g. the clear writes-disabled message);
        # Spark-only heads like CREATE TEMPORARY VIEW stay Spark SQL
        # (ADVICE r6).
        return arcadesql.execute(
            spark, sql, workspace_dir=workspace, allow_writes=allow_writes
        )
    if not allow_writes:
        # Spark-shaped writes (CTAS, INSERT INTO … SELECT, WITH …
        # INSERT) don't match claims_statement() and would execute
        # with no gate (round-7 ADVICE, high — same fall-through as
        # the server's /query branch).
        from biodwh2_arcadedb_server_spark.sqlgate import (
            statement_is_read_only,
        )

        if not statement_is_read_only(spark, sql):
            raise PermissionError(
                "write statement without --allow-writes"
            )
    try:
        return spark.sql(sql)
    except PySparkException as orig:
        try:
            return arcadesql.execute(
                spark, sql, workspace_dir=workspace, allow_writes=allow_writes
            )
        except Exception:
            raise orig


if __name__ == "__main__":
    raise SystemExit(main())
