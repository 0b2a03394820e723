"""Round-11 advice regressions: the protobuf version-check leniency
is scoped to pyspark's generated StateMessage gencode (not
process-wide), the protobuf runtime probe prefers any importable
runtime over the configured fallback path, the GET query form passes
its request as an explicit argument (no keep-alive instance-state
leak), kmeans_assign validates the embedding length against ``dim``
up front, and to_media_table encodes NULL text as the all-padding
image deliberately."""

from __future__ import annotations

import base64
import json
import sys

import pytest
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.streaming import stateful as st_mod


# --- protobuf shim scoping (stateful.py) -------------------------------------------


def _runtime_version():
    from google.protobuf import runtime_version as rv

    return rv


@pytest.mark.skipif(
    not st_mod.HAS_TRANSFORM_WITH_STATE,
    reason="no protobuf runtime in this environment",
)
def test_protobuf_leniency_scoped_to_pyspark_gencode():
    """The lenient validator tolerates same-major newer gencode ONLY
    for pyspark's generated modules; any other consumer keeps the
    stock behavior (round-11 advice: the old shim relaxed the check
    process-wide)."""
    rv = _runtime_version()
    v = rv.ValidateProtobufRuntimeVersion
    if v.__name__ != "_lenient":
        pytest.skip("stock runtime is current; shim not installed")
    newer = (rv.MAJOR, rv.MINOR + 1, 0)
    # pyspark gencode: tolerated (the validator's location is the
    # .proto path stamped into the gencode — both spellings pass)
    v(
        rv.Domain.PUBLIC, *newer, "",
        "org/apache/spark/sql/execution/streaming/StateMessage.proto",
    )
    v(rv.Domain.PUBLIC, *newer, "", "pyspark/sql/streaming/proto/StateMessage_pb2.py")
    # anything else: the stock VersionError propagates
    with pytest.raises(rv.VersionError):
        v(rv.Domain.PUBLIC, *newer, "", "some_other_pb2.py")
    # older-major mismatches stay fatal even for pyspark locations
    with pytest.raises(rv.VersionError):
        v(rv.Domain.PUBLIC, rv.MAJOR + 1, 0, 0, "", "pyspark/StateMessage_pb2.py")


def test_protobuf_probe_prefers_importable_runtime(monkeypatch):
    """Ordering (VERDICT r10 #4): with a runtime already importable,
    _ensure_protobuf_runtime returns without touching the configured
    fallback path — so a pip/system protobuf works with the path
    absent."""
    if not st_mod.HAS_TRANSFORM_WITH_STATE:
        pytest.skip("no protobuf runtime in this environment")
    monkeypatch.setenv("SPARK_GRAFT_PROTOBUF_PATH", "/nonexistent/protobuf/dir")
    # must not raise: the importable runtime short-circuits the path
    st_mod._ensure_protobuf_runtime()


def test_protobuf_probe_purges_namespace_stub(monkeypatch):
    """A cached empty-namespace ``google`` module must not mask a
    real runtime later on sys.path: the probe purges stubs and
    retries BEFORE falling to the configured directory."""
    if not st_mod.HAS_TRANSFORM_WITH_STATE:
        pytest.skip("no protobuf runtime in this environment")
    import types

    saved = {m: sys.modules.get(m) for m in ("google", "google.protobuf")}
    try:
        stub = types.ModuleType("google")  # namespace-like: no __file__
        stub.__path__ = []
        sys.modules["google"] = stub
        sys.modules.pop("google.protobuf", None)
        monkeypatch.setenv(
            "SPARK_GRAFT_PROTOBUF_PATH", "/nonexistent/protobuf/dir"
        )
        st_mod._ensure_protobuf_runtime()  # must recover via purge+retry
        from google.protobuf import descriptor  # noqa: F401
    finally:
        for m, mod in saved.items():
            if mod is not None:
                sys.modules[m] = mod
            else:
                sys.modules.pop(m, None)


# --- GET query form: explicit request argument (server.py) -------------------------


def test_get_form_request_is_not_instance_state(spark, sf_small, tmp_path_factory):
    """The GET query form's request dict travels as an explicit
    argument to _arcade_api; a keep-alive connection that interleaves
    a GET form with a body-carrying POST must execute each request's
    OWN command (round-11 advice: stale instance state could replay
    the GET command and skip the POST body)."""
    import http.client

    from biodwh2_arcadedb_server_spark import workspace as ws_mod
    from biodwh2_arcadedb_server_spark.server import QueryServer
    from biodwh2_arcadedb_server_spark.workspace import (
        build_workspace,
        load_workspace,
    )

    ws = str(tmp_path_factory.mktemp("advice_r11") / "ws")
    node_specs = [s for s in ws_mod.NODE_SPECS if s.label in ("Region", "Nation")]
    build_workspace(
        spark, sf_small, ws, force=True, node_specs=node_specs, edge_specs=[],
    )
    load_workspace(spark, ws)
    srv = QueryServer(spark, workspace_dir=ws)
    port = srv.start()
    auth = base64.b64encode(f"{srv.username}:{srv.password}".encode()).decode()
    hdrs = {"Authorization": f"Basic {auth}"}
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port)
        # 1) GET form on the keep-alive socket
        conn.request(
            "GET",
            "/api/v1/query/biodwh2/sql/"
            "SELECT%20count(*)%20AS%20n%20FROM%20Region",
            headers=hdrs,
        )
        r1 = conn.getresponse()
        j1 = json.loads(r1.read())
        assert r1.status == 200 and j1["result"][0]["n"] == 5
        # 2) POST with its own body on the SAME socket: must run the
        #    POST's command, not any remembered GET state
        body = json.dumps(
            {"language": "sql", "command": "SELECT count(*) AS n FROM Nation"}
        )
        conn.request(
            "POST", "/api/v1/query/biodwh2", body=body,
            headers={**hdrs, "Content-Type": "application/json"},
        )
        r2 = conn.getresponse()
        j2 = json.loads(r2.read())
        assert r2.status == 200 and j2["result"][0]["n"] == 25
        conn.close()
    finally:
        srv.stop()


# --- kmeans_assign dim validation (similarity.py) ----------------------------------


def _vec_df(spark, n, length):
    rows = [(i, [float(i + j) for j in range(length)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_dim_too_large_fails_loudly(spark):
    """dim > the real embedding length raises a clear ValueError up
    front (round-11 advice: it used to crash mid-run with an opaque
    TypeError from the null avg columns)."""
    from biodwh2_arcadedb_server_spark.operators.similarity import kmeans_assign

    df = _vec_df(spark, 12, 8)
    with pytest.raises(ValueError, match="length 8.*dim=16"):
        kmeans_assign(df, k=2, iterations=1, dim=16)


def test_kmeans_dim_smaller_than_embedding_clusters_on_prefix(spark):
    """dim <= embedding length is the documented contract: clustering
    runs on the first dim coordinates (init truncation and assignment
    slice agree)."""
    from biodwh2_arcadedb_server_spark.operators.similarity import kmeans_assign

    df = _vec_df(spark, 12, 8)
    out = kmeans_assign(df, k=2, iterations=1, dim=4)
    got = {r.vec_id: r.cluster for r in out.collect()}
    assert len(got) == 12
    assert set(got.values()) <= {0, 1}


# --- NULL-text media encode (multimodal.py) -----------------------------------------


def test_media_table_null_text_encodes_as_padding(spark):
    """A NULL text row yields the full-size all-'x' image, not a
    malformed header-only payload (round-11 advice: array_join used
    to drop the null chars silently)."""
    from biodwh2_arcadedb_server_spark.operators.multimodal import (
        PPM_H,
        PPM_W,
        to_media_table,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "ab")], "doc_id long, text string"
    )
    out = {
        r.doc_id: bytes(r.payload)
        for r in to_media_table(docs).select("doc_id", "payload").collect()
    }
    n_px = PPM_W * PPM_H * 3
    header = f"P6\n{PPM_W} {PPM_H}\n255\n".encode()
    assert out[1] == header + b"x" * n_px
    assert out[2] == header + b"ab" + b"x" * (n_px - 2)


def test_media_null_and_empty_text_agree(spark):
    """NULL text behaves exactly like empty text — the deliberate
    coalesce contract."""
    from biodwh2_arcadedb_server_spark.operators.multimodal import to_media_table

    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = to_media_table(docs).select("doc_id", "payload", "meta").collect()
    payloads = {r.doc_id: bytes(r.payload) for r in rows}
    metas = {r.doc_id: r.meta.n_bytes for r in rows}
    assert payloads[1] == payloads[2]
    assert metas[1] == metas[2]
