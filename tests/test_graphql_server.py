"""B20 over the wire: the embedded server's /graphql endpoint answers
an authenticated GraphQL document against the loaded workspace."""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request

import pytest

from biodwh2_arcadedb_server_spark.server import QueryServer
from biodwh2_arcadedb_server_spark.workspace import build_workspace, load_workspace


@pytest.fixture(scope="module")
def ws(spark, sf_small, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gqlsrv"))
    build_workspace(spark, sf_small, d)
    load_workspace(spark, d)
    return d


def test_graphql_endpoint(spark, ws):
    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(payload, path="/graphql"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    try:
        out = post({"query": "{ Region { r_name in_region_rev { n_name } } }"})
        assert out["columns"] == ["r_name", "in_region_rev"]
        assert len(out["rows"]) == 5
        # malformed document → 400, server stays up
        try:
            post({"query": "{ Region"})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        out2 = post({"sql": "SELECT 1 AS one"}, path="/query")
        assert out2["rows"] == [["1"]]
    finally:
        srv.stop()


def test_graphql_endpoint_variables(spark, ws):
    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/graphql",
        data=json.dumps(
            {
                "query": "query ($k: Int!) { Nation(natural_key: $k) "
                "{ n_name in_region { r_name } } }",
                "variables": {"k": 3},
            }
        ).encode(),
        headers={"Authorization": f"Basic {auth}"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["columns"] == ["n_name", "in_region"]
        assert len(out["rows"]) == 1
    finally:
        srv.stop()


def test_graphql_endpoint_inline_fragment_type_and_update(spark, sf_small, tmp_path_factory):
    """Round-7 surface over the wire: inline fragments, __type
    introspection, and the update<Label> mutation (writes-enabled
    server)."""
    ws_dir = str(tmp_path_factory.mktemp("gqlsrv7") / "ws")
    build_workspace(spark, sf_small, ws_dir, force=True)
    load_workspace(spark, ws_dir)
    srv = QueryServer(spark, workspace_dir=ws_dir, allow_writes=True)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/graphql",
            data=json.dumps(payload).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    try:
        out = post(
            {"query": "{ Nation(natural_key: 3) { n_name ... on Nation "
                      "{ in_region { r_name } } ... on Region { r_name } } }"}
        )
        assert out["columns"] == ["n_name", "in_region"]
        assert len(out["rows"]) == 1

        out2 = post({"query": '{ __type(name: "Nation") { name fields } }'})
        assert out2["columns"] == ["name", "fields", "relationships"]
        assert len(out2["rows"]) == 1 and "Nation" in out2["rows"][0][0]

        out3 = post(
            {"query": 'mutation { updateNation(natural_key: 3, '
                      '_set: {n_name: "WIRED"}) }'}
        )
        assert out3["rows"][0][:2] == ["update", "Nation"]
        out4 = post({"query": "{ Nation(natural_key: 3) { n_name } }"})
        assert out4["rows"] == [["WIRED"]]
    finally:
        srv.stop()


def test_graphql_endpoint_aliases_and_directives(spark, ws):
    """Round 8: field aliases (spec §2.7) and variable-driven
    @skip/@include (spec §5.5) over the wire — the same document
    returns different shapes as the variables flip."""
    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()
    doc = (
        "query ($k: Int!, $withRegion: Boolean!) { "
        "Nation(natural_key: $k) { name: n_name "
        "region: in_region @include(if: $withRegion) { r_name } } }"
    )

    def post(variables):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/graphql",
            data=json.dumps({"query": doc, "variables": variables}).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    try:
        out = post({"k": 3, "withRegion": True})
        assert out["columns"] == ["name", "region"]
        assert len(out["rows"]) == 1
        out2 = post({"k": 3, "withRegion": False})
        assert out2["columns"] == ["name"]
    finally:
        srv.stop()


def test_graphql_endpoint_real_introspection_document(spark, ws):
    """A stock client-opening introspection document (the GraphiQL
    shape: operation name, queryType/mutationType, per-type field
    type refs with a 3-deep ofType chain, plus metadata this engine
    doesn't model) must round-trip over the wire — spec-shaped
    single row, unmodeled fields as nulls, no 400."""
    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()
    doc = """
    query IntrospectionQuery {
      __schema {
        queryType { name }
        mutationType { name }
        types {
          kind
          name
          description
          fields {
            name
            isDeprecated
            args { kind name }
            type { kind name ofType { kind name ofType { kind name } } }
          }
        }
      }
    }
    """
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/graphql",
        data=json.dumps({"query": doc}).encode(),
        headers={"Authorization": f"Basic {auth}"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["columns"] == ["queryType", "mutationType", "types"]
        assert len(out["rows"]) == 1
        qt, mt, types = out["rows"][0]
        assert "Query" in str(qt) and "Mutation" in str(mt)
        s = str(types)
        # object types, scalars, LIST refs and null descriptions all
        # serialized through the wire format
        for frag in ("Customer", "Nation", "MutationResult", "SCALAR", "LIST"):
            assert frag in s, frag
    finally:
        srv.stop()


def test_graphql_typename_meta_field(spark, ws):
    """__typename (spec §4.4) at root and nested levels — the
    meta-field every Apollo-style normalized cache adds."""
    from biodwh2_arcadedb_server_spark import graphql

    row = graphql.execute(
        spark,
        "{ Nation(natural_key: 3) { __typename n_name "
        "in_region { __typename r_name } } }",
    ).collect()[0]
    assert row["__typename"] == "Nation"
    assert row.in_region[0]["__typename"] == "Region"


def test_graphql_endpoint_full_getintrospectionquery(spark, ws):
    """Round 13 (VERDICT r12 #2): the FULL stock
    ``getIntrospectionQuery()`` document — subscriptionType,
    directives with args, FullType with inputFields / interfaces /
    enumValues / possibleTypes and the 7-deep TypeRef fragment —
    round-trips over the wire, and the payload honors the
    buildClientSchema shape contract (null subscriptionType, OBJECT
    interfaces as [], directive args with a NON_NULL<Boolean> if)."""
    from biodwh2_arcadedb_server_spark.operators.dialect_queries import (
        _STOCK_INTROSPECTION,
    )

    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/graphql",
        data=json.dumps({"query": _STOCK_INTROSPECTION}).encode(),
        headers={"Authorization": f"Basic {auth}"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["columns"] == [
            "queryType", "mutationType", "subscriptionType",
            "types", "directives",
        ]
        (qt, mt, st, types, directives) = out["rows"][0]
        assert "Query" in str(qt) and "Mutation" in str(mt)
        # null subscriptionType — NOT {name: null}
        assert st is None or st == "null"
        s_types = str(types)
        for frag in ("Customer", "Nation", "SCALAR", "LIST", "OBJECT"):
            assert frag in s_types, frag
        s_dir = str(directives)
        for frag in ("include", "skip", "FRAGMENT_SPREAD", "NON_NULL",
                     "Boolean", "if"):
            assert frag in s_dir, frag
    finally:
        srv.stop()


def test_graphql_sdl_export(spark, ws):
    """Round 13: SDL export — GET /graphql/schema returns the
    printSchema-style text rendered from the SAME model introspection
    answers; spot-check type blocks, wrapper syntax, custom scalars,
    the schema block, and model-parity with __schema."""
    from biodwh2_arcadedb_server_spark import graphql as gql

    text = gql.sdl(spark)
    assert "type Nation {" in text and "type Query {" in text
    assert "in_region: [Region]" in text          # LIST wrapper
    assert "createNation: MutationResult" in text
    assert "scalar Long" in text
    assert "scalar Int" not in text               # built-ins omitted
    assert text.rstrip().endswith("schema {\n  query: Query\n  mutation: Mutation\n}")
    # parity: every OBJECT type in the model has a type block
    model = gql._schema_model(spark, gql.default_relationships())
    for t in model["types"]:
        if t["kind"] == "OBJECT":
            assert f"type {t['name']} {{" in text, t["name"]

    srv = QueryServer(spark)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/graphql/schema",
        headers={"Authorization": f"Basic {auth}"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            wire = resp.read().decode()
            ctype = resp.headers["Content-Type"]
        assert wire == text and ctype.startswith("text/plain")
        # unauthorized → 401 challenge
        try:
            urllib.request.urlopen(
                urllib.request.Request(f"http://127.0.0.1:{port}/graphql/schema")
            )
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
    finally:
        srv.stop()
