"""Round-10 advice regressions: RID equality must include the bucket
(ArcadeDB RID semantics — a wrong-bucket RID never matches), the RID
bucket order is manifest-recorded and DROP-stable (tombstones, no
index shifts), managed server databases reject pre-existing
directories, and the media pixel contract is codepoint %% 256 so the
decoded-stat oracles hold for non-ASCII corpora."""

from __future__ import annotations

import json
import os

import pytest

from biodwh2_arcadedb_server_spark import workspace as ws_mod
from biodwh2_arcadedb_server_spark.arcadesql import ArcadeSQLError, execute
from biodwh2_arcadedb_server_spark.workspace import (
    build_workspace,
    load_workspace,
)


@pytest.fixture()
def rid_ws(spark, sf_small, tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("advice_r10") / "ws")
    node_specs = [
        s for s in ws_mod.NODE_SPECS if s.label in ("Region", "Nation")
    ]
    edge_specs = [s for s in ws_mod.EDGE_SPECS if s.label == "IN_REGION"]
    build_workspace(
        spark, sf_small, ws, force=True,
        node_specs=node_specs, edge_specs=edge_specs,
    )
    load_workspace(spark, ws)
    return ws


def test_rid_equality_includes_bucket(spark, rid_ws):
    """`@rid = #b:p` must constrain the bucket's TYPE as well as the
    position, matching the FROM-position path — previously the bucket
    was range-checked but never matched, so Region's bucket index with
    a Nation node_id still matched (round-10 advice, medium)."""
    nb = ws_mod.RID_BUCKET_LABELS.index("Nation")
    rb = ws_mod.RID_BUCKET_LABELS.index("Region")
    rid = execute(
        spark, "SELECT @rid AS rid FROM Nation WHERE natural_key = 3"
    ).collect()[0].rid
    # right bucket matches
    got = execute(
        spark, f"SELECT natural_key FROM Nation WHERE @rid = #{nb}:{rid}"
    ).collect()
    assert [r.natural_key for r in got] == [3]
    # wrong bucket (Region's index, Nation's node_id) must NOT match
    assert execute(
        spark, f"SELECT FROM Nation WHERE @rid = #{rb}:{rid}"
    ).count() == 0
    # <> is the negation of the bucket-aware equality
    n = execute(
        spark, f"SELECT count(*) AS n FROM Nation WHERE @rid <> #{nb}:{rid}"
    ).collect()[0].n
    assert n == 24
    n = execute(
        spark, f"SELECT count(*) AS n FROM Nation WHERE @rid <> #{rb}:{rid}"
    ).collect()[0].n
    assert n == 25
    # reversed operand order gets the same treatment
    got = execute(
        spark, f"SELECT natural_key FROM Nation WHERE #{nb}:{rid} = @rid"
    ).collect()
    assert [r.natural_key for r in got] == [3]


def test_rid_buckets_manifest_recorded_and_drop_stable(
    spark, rid_ws
):
    """Bucket order lives in the manifest (round-10 advice): CREATE
    appends, DROP tombstones its slot (later indices never shift),
    RENAME keeps the slot, and addressing a dropped slot errors
    loudly in both FROM and expression position."""
    man = json.load(open(os.path.join(rid_ws, "manifest.json")))
    assert man["rid_buckets"] == ["Region", "Nation"]

    run = lambda s: execute(
        spark, s, workspace_dir=rid_ws, allow_writes=True
    ).collect()
    run("CREATE VERTEX TYPE Probe")
    assert ws_mod.RID_BUCKET_LABELS == ["Region", "Nation", "Probe"]
    run("DROP TYPE Probe")
    assert ws_mod.RID_BUCKET_LABELS == ["Region", "Nation", None]
    # the tombstone is persisted, and a NEW type appends after it —
    # the dropped slot is never reused
    run("CREATE VERTEX TYPE Probe2")
    man = json.load(open(os.path.join(rid_ws, "manifest.json")))
    assert man["rid_buckets"] == ["Region", "Nation", None, "Probe2"]
    with pytest.raises(ArcadeSQLError, match="dropped type"):
        execute(spark, "SELECT FROM #2:42")
    with pytest.raises(ArcadeSQLError, match="dropped type"):
        execute(spark, "SELECT FROM Region WHERE @rid = #2:42")
    # rename keeps the slot index
    run("ALTER TYPE Probe2 NAME Probe3")
    assert ws_mod.RID_BUCKET_LABELS == ["Region", "Nation", None, "Probe3"]


def test_media_pixel_contract_non_ascii(spark):
    """Pixel/sample contract byte[i] = codepoint(char[i]) %% 256 on
    BOTH the PPM (JVM expressions) and PNG/WAV (Python) encode paths —
    identical to UTF-8 bytes on ASCII, and oracle-exact (ord %% 256)
    on non-ASCII corpora too (round-10 advice)."""
    from biodwh2_arcadedb_server_spark.operators.multimodal import (
        extract_features,
        to_audio_table,
        to_media_table,
        to_png_table,
    )

    texts = {
        1: "plain ascii body",
        2: "héllo wörld ünïcode ÿ€☃",  # Latin-1 + >255 codepoints
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )

    def expected_codes(text, n):
        padded = (text[:n] + "x" * n)[:n]
        return [ord(c) % 256 for c in padded]

    # PPM: raw trailing 192 payload bytes ARE the codepoint bytes
    for r in to_media_table(docs).collect():
        assert list(bytes(r.payload)[-192:]) == expected_codes(
            texts[r.doc_id], 192
        )
    # PNG: decoded feature stats equal the codepoint-fold recompute
    feats = {
        r.doc_id: r
        for r in extract_features(
            to_png_table(docs), decode_stub=False
        ).collect()
    }
    for did, text in texts.items():
        cs = expected_codes(text, 192)
        assert feats[did].n_bytes == 192
        assert feats[did].byte_mean == pytest.approx(sum(cs) / 192)
    # WAV: 16-bit samples are (codepoint %% 256 - 97) * 256
    import io
    import struct
    import wave

    for r in to_audio_table(docs).collect():
        with wave.open(io.BytesIO(bytes(r.payload))) as w:
            frames = w.readframes(w.getnframes())
        samples = list(struct.unpack(f"<{len(frames) // 2}h", frames))
        assert samples == [
            ((c - 97) * 256 + 32768) % 65536 - 32768
            for c in expected_codes(texts[r.doc_id], 64)
        ]


def test_managed_database_dir_rejects_preexisting(spark, tmp_path):
    """POST /api/v1/server 'create database' places the directory
    next to the serving workspace and REJECTS a pre-existing one
    instead of silently adopting stale content (round-10 advice)."""
    import base64
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer

    ws_dir = tmp_path / "serving_ws"
    ws_dir.mkdir()
    stale = tmp_path / "biodwh2_db_mydb"
    stale.mkdir()
    (stale / "leftover.txt").write_text("stale")

    srv = QueryServer(
        spark, workspace_dir=str(ws_dir), allow_writes=True
    )
    port = srv.start()
    auth = base64.b64encode(
        f"{srv.username}:{srv.password}".encode()
    ).decode()

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/server",
            data=json.dumps(payload).encode(),
            headers={"Authorization": f"Basic {auth}"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    try:
        # stale directory from a "prior run" → clean 400, content kept
        with pytest.raises(urllib.error.HTTPError) as exc:
            post({"command": "create database mydb"})
        assert exc.value.code == 400
        assert (stale / "leftover.txt").exists()
        # a fresh name lands NEXT TO the workspace, not in the shared
        # tmpdir, and starts from an empty manifest
        assert post({"command": "create database fresh"}) == {
            "result": "ok"
        }
        dbdir = tmp_path / "biodwh2_db_fresh"
        assert dbdir.is_dir()
        man = json.loads((dbdir / "manifest.json").read_text())
        assert man == {"nodes": {}, "edges": {}, "rid_buckets": []}
    finally:
        srv.stop()


def test_neighborhood_endpoint(spark, rid_ws):
    """GET /api/v1/neighborhood/{rid} (round-10: the Studio
    explore-workflow analog): returns the record plus capped 1-hop
    in/out edge lists with clickable neighbor RIDs; bad / unknown /
    dropped-bucket RIDs are clean 400/404s; the console page carries
    the explore panel."""
    import base64
    import urllib.error
    import urllib.request

    from biodwh2_arcadedb_server_spark.arcadesql import execute
    from biodwh2_arcadedb_server_spark.server import QueryServer

    srv = QueryServer(spark, workspace_dir=rid_ws)
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
            return body.decode() if raw else json.loads(body)

    try:
        nb = ws_mod.RID_BUCKET_LABELS.index("Nation")
        rb = ws_mod.RID_BUCKET_LABELS.index("Region")
        rid = execute(
            spark, "SELECT @rid AS rid FROM Nation WHERE natural_key = 3"
        ).collect()[0].rid
        j = get(f"/api/v1/neighborhood/%23{nb}:{rid}")
        assert j["type"] == "Nation"
        assert j["record"]["natural_key"] == 3
        # Nation 3 -IN_REGION-> its region: one outgoing edge whose
        # neighbor rid points into Region's bucket
        assert len(j["out"]) == 1
        assert j["out"][0]["edge"] == "IN_REGION"
        assert j["out"][0]["type"] == "Region"
        assert j["out"][0]["rid"].startswith(f"#{rb}:")
        assert j["in"] == []
        assert j["truncated"] == {"out": False, "in": False}
        # follow the neighbor rid like the console's click-through
        region = get(
            "/api/v1/neighborhood/"
            + j["out"][0]["rid"].replace("#", "%23")
        )
        assert region["type"] == "Region"
        # incoming side lists nations, capped flag off at this SF
        assert any(e["edge"] == "IN_REGION" for e in region["in"])
        # errors: malformed, unknown position, out-of-range bucket
        for path, code in (
            ("/api/v1/neighborhood/xyz", 400),
            (f"/api/v1/neighborhood/%23{nb}:999999", 404),
            ("/api/v1/neighborhood/%2399:1", 400),
        ):
            with pytest.raises(urllib.error.HTTPError) as exc:
                get(path)
            assert exc.value.code == code
        # the BARE id `SELECT @rid` echoes works too (the console
        # panel's advertised paste workflow — round-10 self-review):
        # label resolves from the unified view, echo carries a full
        # #bucket:pos RID
        bare = get(f"/api/v1/neighborhood/{rid}")
        assert bare["type"] == "Nation"
        assert bare["rid"] == f"#{nb}:{rid}"
        with pytest.raises(urllib.error.HTTPError) as exc:
            get("/api/v1/neighborhood/12345")  # unknown bare id
        assert exc.value.code == 404
        # console page carries the explore panel
        page = get("/", raw=True)
        assert "neighborhood" in page and "Explore" in page
    finally:
        srv.stop()


def test_get_form_query_route(spark, rid_ws):
    """ArcadeDB's idempotent GET query form (round 10):
    GET /api/v1/query/{db}/{language}/{command} with a URL-encoded
    command — same routing and response shape as the POST twin, DML
    rejected, statement failures are clean 400s that don't kill the
    connection, auth required."""
    import base64
    import urllib.error
    import urllib.parse
    import urllib.request

    from biodwh2_arcadedb_server_spark.server import QueryServer

    srv = QueryServer(spark, workspace_dir=rid_ws)
    port = srv.start()
    auth = base64.b64encode(
        f"{srv.username}:{srv.password}".encode()
    ).decode()

    def get(path, authed=True):
        headers = {"Authorization": f"Basic {auth}"} if authed else {}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", headers=headers
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    q = lambda s: "/api/v1/query/biodwh2/sql/" + urllib.parse.quote(
        s, safe=""
    )
    try:
        j = get(q("SELECT count(*) AS n FROM Region"))
        assert j == {"result": [{"n": 5}]}
        # dialect MATCH routes the same way
        j = get(q(
            "SELECT natural_key FROM Nation WHERE natural_key = 3"
        ))
        assert j == {"result": [{"natural_key": 3}]}
        # non-idempotent statements are rejected on /query
        with pytest.raises(urllib.error.HTTPError) as exc:
            get(q("DELETE FROM Nation"))
        assert exc.value.code == 400
        # a failing statement is a 400, and the server stays up
        with pytest.raises(urllib.error.HTTPError) as exc:
            get(q("SELECT FROM NoSuchType"))
        assert exc.value.code == 400
        assert get(q("SELECT count(*) AS n FROM Region"))["result"][0]["n"] == 5
        # auth required
        with pytest.raises(urllib.error.HTTPError) as exc:
            get(q("SELECT count(*) AS n FROM Region"), authed=False)
        assert exc.value.code == 401
    finally:
        srv.stop()
