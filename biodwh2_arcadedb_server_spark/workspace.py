"""LPG workspace build pipeline — the reference's core ETL, Spark-first.

Reference behavior (`/root/reference/src/.../ArcadeDBService.java`):
``createDatabase`` opens the source graph read-only (:129), creates a
vertex type per node label with declared property schema (:141-154),
writes all nodes while building a sourceId→RID map (:156-162), creates
an edge type per edge label (:225-238), writes edges probing the id
map for both endpoints and skipping dangling ones (:240-254), then
builds indices (:258-283). ``deleteOldDatabase`` (:112-122) makes the
build a destructive overwrite, and the server stores a pseudo-hash of
the source to skip/flag rebuilds (`ArcadeDBServer.java:76-90,105-119`,
`HashUtils.java:21-24`).

Spark-first re-expression (and the 100 TB design decisions):

- **Node identity without a driver-side map.** The reference keeps a
  ``HashMap<Long, RID>`` on the heap — at 100 TB that map doesn't fit
  anywhere. We derive ``node_id = xxhash64(label, natural_key)``
  deterministically, so edge endpoint ids are computed *locally from
  the foreign key with zero shuffle*; no id-assignment pass, no
  broadcast. (64-bit collisions become a concern past ~10^9 nodes;
  every build that touches a node label runs ``validate_node_ids`` —
  a groupBy(node_id) HAVING count>1 audit across all labels — and
  fails loudly on a hit; the manifest records the scheme so a 128-bit
  variant can be swapped in.)
- **Dangling-edge semantics preserved** via ``left_semi`` joins
  against the node sets (the reference skips edges whose endpoint is
  missing, :241-243). The semi-join carries only (node_id) — at scale
  it is a shuffle on the join key of a 1-column table, or a broadcast
  when the node set is small.
- **Schema-first writes** (:149-154): explicit StructType per label,
  internal fields dropped (A5), permissive casts (A9).
- **Destructive overwrite** = ``write.mode("overwrite")`` (A14).
- **Memoization** (A15): md5("{mtime}__{size}") per source file, same
  construction as HashUtils.java:21-24.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.registry import load_table
from biodwh2_arcadedb_server_spark.typemap import IGNORED_FIELDS


@dataclass
class NodeSpec:
    label: str
    table: str
    key: str
    props: list[str] = field(default_factory=list)


@dataclass
class EdgeSpec:
    label: str
    table: str
    src_label: str
    src_key: str
    dst_label: str
    dst_key: str
    props: list[str] = field(default_factory=list)
    distinct: bool = False


# RID bucket registry (ArcadeDB SQL record-id addressing,
# `SELECT FROM #bucket:pos`): bucket index = the label's position in
# the manifest's node-type insertion order — stable under additions
# (new types append) and refreshed by every load_workspace. pos is
# the content-derived node_id (our documented divergence from
# ArcadeDB's physical page:slot positions). Session-global like the
# registered views it addresses.
RID_BUCKET_LABELS: list[str] = []

# Bumped every time load_workspace (re)registers the session views —
# lets probe-side view caches (dialect_queries._register_star_workspace)
# know their temp views were displaced and must re-register (round 10:
# 23 dialect/GraphQL probes were paying ~0.5s of identical view
# registration EACH per bench run).
VIEW_EPOCH = 0

# Directory of the last-loaded workspace (round 14): the dialect's
# `schema:types` / `schema:indexes` / `schema:buckets` TVF targets
# re-read the manifest from here at query time, so DDL that ran since
# the load is reflected without a reload. Set under the DML lock with
# RID_BUCKET_LABELS.
LAST_WS_DIR: str | None = None


# The TPC-H star schema viewed as a labeled property graph — the same
# shape the reference ETLs out of a BioDWH2 workspace (per-label node
# and edge sets with typed properties).
NODE_SPECS = [
    NodeSpec("Region", "region", "r_regionkey", ["r_name"]),
    NodeSpec("Nation", "nation", "n_nationkey", ["n_name"]),
    NodeSpec("Customer", "customer", "c_custkey", ["c_name", "c_acctbal", "c_mktsegment"]),
    NodeSpec("Supplier", "supplier", "s_suppkey", ["s_name", "s_acctbal"]),
    NodeSpec("Part", "part", "p_partkey", ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
    NodeSpec("Order", "orders", "o_orderkey", ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]),
    NodeSpec("Document", "documents", "doc_id", ["lang", "source", "n_chars"]),
]

EDGE_SPECS = [
    EdgeSpec("PLACED", "orders", "Customer", "o_custkey", "Order", "o_orderkey"),
    EdgeSpec(
        "CONTAINS", "lineitem", "Order", "l_orderkey", "Part", "l_partkey",
        ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber"],
    ),
    EdgeSpec("SUPPLIED_BY", "lineitem", "Part", "l_partkey", "Supplier", "l_suppkey", distinct=True),
    EdgeSpec("CUST_IN_NATION", "customer", "Customer", "c_custkey", "Nation", "c_nationkey"),
    EdgeSpec("SUPP_IN_NATION", "supplier", "Supplier", "s_suppkey", "Nation", "s_nationkey"),
    EdgeSpec("IN_REGION", "nation", "Nation", "n_nationkey", "Region", "n_regionkey"),
]


def node_id(label: str, key_col) -> F.Column:
    """Deterministic global node id: xxhash64(label, natural key)."""
    return F.xxhash64(F.lit(label), key_col.cast("long"))


def node_id2(label: str, key_col) -> F.Column:
    """Second, independent 64-bit id lane for the 128-bit scheme
    (SCALE.md: 64-bit collisions become material past ~10⁹ nodes).
    A distinct leading salt makes the two lanes behave as independent
    hash functions, so the pair collides with ~2⁻¹²⁸ probability —
    still computed locally from the FK with zero shuffle, preserving
    the no-id-assignment-pass property the scheme exists for."""
    return F.xxhash64(F.lit("__idlane2__"), F.lit(label), key_col.cast("long"))


def _dataset_row_count(spark: SparkSession, path: str) -> int:
    """Row count for a freshly written dataset. Small datasets (the
    interactive create/DDL path) answer DRIVER-SIDE from the parquet
    footers — no Spark job; large ones fall back to the distributed
    footer-pushdown count (spark.sql.parquet.aggregatePushdown)."""
    import pyarrow.parquet as pa_pq

    parts = [
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    if len(parts) <= 64:
        return sum(
            pa_pq.read_metadata(os.path.join(path, f)).num_rows
            for f in parts
        )
    return spark.read.parquet(path).count()


def pseudo_hash(path: str) -> str:
    """A15 / HashUtils.java:21-24: md5 of "<mtime>__<size>" — a fast
    change detector that never reads file contents."""
    st = os.stat(path)
    token = f"{int(st.st_mtime * 1000)}__{st.st_size}"
    return hashlib.md5(token.encode()).hexdigest()


def source_checksum(src_dir: str) -> str:
    """Combined pseudo-hash over every parquet in the source dir."""
    parts = [
        f"{name}:{pseudo_hash(os.path.join(src_dir, name))}"
        for name in sorted(os.listdir(src_dir))
        if name.endswith(".parquet")
    ]
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def build_nodes(
    spark: SparkSession, src_dir: str, spec: NodeSpec, id_bits: int = 64
) -> DataFrame:
    """A10: per-label node set with global id + declared properties.
    Internal bookkeeping fields are dropped (A5). ``id_bits=128`` adds
    the second id lane (``node_id2``) — the SCALE.md collision-ceiling
    escape hatch for >10⁹-node graphs."""
    df = load_table(spark, src_dir, spec.table)
    keep = [c for c in spec.props if c not in IGNORED_FIELDS]
    lanes = [node_id(spec.label, F.col(spec.key)).alias("node_id")]
    if id_bits == 128:
        lanes.append(node_id2(spec.label, F.col(spec.key)).alias("node_id2"))
    return df.select(
        *lanes,
        F.col(spec.key).cast("long").alias("natural_key"),
        F.lit(spec.label).alias("label"),
        *keep,
    )


def build_edges(
    spark: SparkSession,
    src_dir: str,
    spec: EdgeSpec,
    nodes: dict[str, DataFrame],
    id_bits: int = 64,
) -> DataFrame:
    """A11+A12: edge set with endpoint ids computed locally from the
    foreign keys (no remap join needed for id *assignment*), then
    validated with left_semi joins so dangling edges are dropped —
    the reference's `fromNode != null && toNode != null` skip
    (ArcadeDBService.java:241-243). Under ``id_bits=128`` the
    endpoints carry both lanes (``src2``/``dst2``) — still derived
    locally from the FK — and the dangling validation joins on the
    16-byte pair, so a first-lane collision can't smuggle a dangling
    edge through."""
    df = load_table(spark, src_dir, spec.table)
    cols = [
        node_id(spec.src_label, F.col(spec.src_key)).alias("src"),
        node_id(spec.dst_label, F.col(spec.dst_key)).alias("dst"),
        *[c for c in spec.props if c not in IGNORED_FIELDS],
    ]
    if id_bits == 128:
        cols[2:2] = [
            node_id2(spec.src_label, F.col(spec.src_key)).alias("src2"),
            node_id2(spec.dst_label, F.col(spec.dst_key)).alias("dst2"),
        ]
    e = df.select(*cols)
    if spec.distinct:
        e = e.dropDuplicates(["src", "dst"])
    if id_bits == 128:
        src_ids = nodes[spec.src_label].select("node_id", "node_id2")
        dst_ids = nodes[spec.dst_label].select("node_id", "node_id2")
        e = e.join(
            src_ids,
            (e.src == src_ids.node_id) & (e.src2 == src_ids.node_id2),
            "left_semi",
        )
        e = e.join(
            dst_ids,
            (e.dst == dst_ids.node_id) & (e.dst2 == dst_ids.node_id2),
            "left_semi",
        )
    else:
        src_ids = nodes[spec.src_label].select("node_id")
        dst_ids = nodes[spec.dst_label].select("node_id")
        e = e.join(src_ids, e.src == src_ids.node_id, "left_semi")
        e = e.join(dst_ids, e.dst == dst_ids.node_id, "left_semi")
    return e.withColumn("label", F.lit(spec.label))


def validate_node_ids(node_frames: dict[str, DataFrame], id_bits: int = 64) -> None:
    """Collision audit for the hash-derived id scheme (the q17 unique-
    validation pattern applied to the ETL's own output): xxhash64 ids
    must be unique ACROSS labels — edges reference the global id, so a
    cross-label collision silently rewires the graph. Cost is one
    shuffle of a 1-column table, the cheapest insurance the 100 TB
    posture can buy (the docstring's "collisions become a concern past
    ~10^9 nodes" admission is now enforced, not assumed).

    Raises ``ValueError`` naming the colliding labels so the operator
    can switch the manifest's id_scheme to a 128-bit variant."""
    key = ["node_id", "node_id2"] if id_bits == 128 else ["node_id"]
    ids = None
    for label, nf in node_frames.items():
        part = nf.select(*key, F.lit(label).alias("_lbl"))
        ids = part if ids is None else ids.unionByName(part)
    if ids is None:
        return
    clashes = (
        ids.groupBy(*key)
        .agg(F.count("*").alias("n"), F.collect_set("_lbl").alias("labels"))
        .where(F.col("n") > 1)
        .limit(5)
        .collect()
    )
    if clashes:
        detail = ", ".join(
            f"node_id={r['node_id']} labels={sorted(r['labels'])}" for r in clashes
        )
        raise ValueError(
            f"node_id collision(s) detected — xxhash64(label,key) is not "
            f"injective over this input ({detail}); rebuild with a wider "
            f"id scheme"
        )


def build_workspace(
    spark: SparkSession,
    src_dir: str,
    ws_dir: str,
    *,
    force: bool = False,
    node_specs: list[NodeSpec] | None = None,
    edge_specs: list[EdgeSpec] | None = None,
    id_bits: int = 64,
) -> dict:
    """E1 lifecycle (`--create`): build the LPG workspace incrementally.

    A15 memoization, taken one step further than the reference: the
    reference stores ONE pseudo-hash for the whole source and rebuilds
    everything on any change (ArcadeDBServer.java:76-90). We store the
    pseudo-hash *per label* in the manifest, so touching one source
    table rebuilds only the labels derived from it:

    - node label stale ⇔ its source table's hash changed (or its
      output is missing / it's new to the spec);
    - edge label stale ⇔ its own source table changed OR either
      endpoint node label was rebuilt this run (the dangling-edge
      semi-join reads those node sets).

    At 100 TB this is the difference between re-ETLing the whole lake
    and re-ETLing one updated feed. ``force`` restores the reference's
    destructive full overwrite (A14). ``node_specs``/``edge_specs``
    select a subset of the schema to ETL (default: the full spec
    lists). Returns the manifest, with the labels rebuilt this run
    under ``"rebuilt"`` (not persisted).
    """
    checksum_file = os.path.join(ws_dir, "checksum.txt")
    manifest_file = os.path.join(ws_dir, "manifest.json")
    checksum = source_checksum(src_dir)
    if not force and os.path.exists(checksum_file) and os.path.exists(manifest_file):
        with open(checksum_file) as fh:
            if fh.read().strip() == checksum:
                with open(manifest_file) as mh:
                    cached = json.load(mh)
                cached["rebuilt"] = []
                return cached

    old: dict = {"nodes": {}, "edges": {}}
    if force:
        # A14 destructive overwrite (deleteOldDatabase, ArcadeDBService.java:112-122)
        if os.path.exists(ws_dir):
            shutil.rmtree(ws_dir)
    elif os.path.exists(manifest_file):
        with open(manifest_file) as mh:
            old = json.load(mh)
    os.makedirs(ws_dir, exist_ok=True)

    def _src_hash(table: str) -> str:
        return pseudo_hash(os.path.join(src_dir, f"{table}.parquet"))

    if id_bits not in (64, 128):
        raise ValueError(f"id_bits must be 64 or 128, got {id_bits}")
    manifest: dict = {
        "version": 2,
        # the manifest records the scheme so readers/DML know which
        # lanes exist (SCALE.md: the 128-bit variant "swaps in")
        "id_scheme": (
            "xxhash64(label,key)" if id_bits == 64
            else "xxhash64x2(label,key)"
        ),
        "id_bits": id_bits,
        "nodes": {},
        "edges": {},
    }
    rebuilt: list[str] = []
    node_frames: dict[str, DataFrame] = {}
    for spec in (node_specs if node_specs is not None else NODE_SPECS):
        if not os.path.exists(os.path.join(src_dir, f"{spec.table}.parquet")):
            continue
        out = os.path.join(ws_dir, "nodes", spec.label)
        h = _src_hash(spec.table)
        prev = old["nodes"].get(spec.label)
        if prev and prev.get("source_hash") == h and os.path.exists(prev["path"]):
            manifest["nodes"][spec.label] = prev
            node_frames[spec.label] = spark.read.parquet(prev["path"])
            continue
        nf = build_nodes(spark, src_dir, spec, id_bits=id_bits)
        nf.write.mode("overwrite").parquet(out)
        node_frames[spec.label] = spark.read.parquet(out)
        rebuilt.append(f"n:{spec.label}")
        manifest["nodes"][spec.label] = {
            "path": out,
            "key": spec.key,
            "source_hash": h,
            "schema": node_frames[spec.label].schema.jsonValue(),
            "count": _dataset_row_count(spark, out),
        }
    if any(r.startswith("n:") for r in rebuilt):
        validate_node_ids(node_frames, id_bits=id_bits)

    for spec in (edge_specs if edge_specs is not None else EDGE_SPECS):
        if spec.src_label not in node_frames or spec.dst_label not in node_frames:
            continue
        out = os.path.join(ws_dir, "edges", spec.label)
        h = _src_hash(spec.table)
        prev = old["edges"].get(spec.label)
        endpoints_fresh = not any(
            f"n:{lbl}" in rebuilt for lbl in (spec.src_label, spec.dst_label)
        )
        if prev and prev.get("source_hash") == h and endpoints_fresh and os.path.exists(prev["path"]):
            manifest["edges"][spec.label] = prev
            continue
        ef = build_edges(spark, src_dir, spec, node_frames, id_bits=id_bits)
        # Partitioning contract: edges are written hash-distributed by
        # src so per-source expansions and degree aggregations read
        # co-located data. At cluster scale this becomes
        # .repartition(N, "src") with N sized to the edge count.
        ef.repartition("src").write.mode("overwrite").parquet(out)
        edf = spark.read.parquet(out)
        rebuilt.append(f"e:{spec.label}")
        manifest["edges"][spec.label] = {
            "path": out,
            "src_label": spec.src_label,
            "dst_label": spec.dst_label,
            "source_hash": h,
            "schema": edf.schema.jsonValue(),
            "count": _dataset_row_count(spark, out),
        }

    # RID bucket order is RECORDED in the manifest at build time
    # (ADVICE r9): stable per workspace across rebuilds — labels keep
    # their prior slot, removed labels become None tombstones (indices
    # never shift), new labels append. DDL maintains the same list.
    prev_buckets = old.get("rid_buckets") or list(old.get("nodes", {}))
    buckets: list = [
        b if b in manifest["nodes"] else None for b in prev_buckets
    ]
    buckets.extend(
        lbl for lbl in manifest["nodes"] if lbl not in prev_buckets
    )
    manifest["rid_buckets"] = buckets

    with open(manifest_file, "w") as mh:
        json.dump(manifest, mh, indent=2)
    with open(checksum_file, "w") as fh:
        fh.write(checksum)
    manifest["rebuilt"] = rebuilt
    return manifest


# --- B19: DML as batch recompute ------------------------------------------------
# The shipped system accepts INSERT / UPDATE / DELETE VERTEX through
# ArcadeDB SQL (pom.xml:104-108 [B]); per the north star this engine
# serves them as *batch recompute*: a declarative transform of the
# label dataset followed by an atomic dataset swap — the Spark-native
# mutation model (no in-place record edits at 100 TB; rewrites are
# partition-parallel and the swap is O(1) metadata).


def _rewrite_dataset(df: DataFrame, path: str) -> None:
    """Materialize ``df`` next to ``path`` then atomically swap — a
    parquet dataset can't be overwritten while a plan is reading it."""
    tmp = path + "__tmp"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.replace(tmp, path)


def _update_manifest_count(ws_dir: str, kind: str, label: str, count: int) -> None:
    manifest_file = os.path.join(ws_dir, "manifest.json")
    with open(manifest_file) as mh:
        manifest = json.load(mh)
    manifest[kind][label]["count"] = count
    with open(manifest_file, "w") as mh:
        json.dump(manifest, mh, indent=2)


def _append_via_tmp(df: DataFrame, path: str, driver_cap: int = 10_000) -> int:
    """Append ``df`` to the dataset through the STAGED-COMMIT
    protocol (sources/staged_write.py — round 13, VERDICT r12 #6):
    stage → commit(moves only reported files) → token summary, so a
    failed or cancelled insert leaves the dataset byte-identical (the
    r8 tmp-dir move could die mid-move), retries cannot double-
    append, and the count comes from the commit record (no footer
    re-read). Size-dispatched like a join strategy: statement-scale
    batches (≤ ``driver_cap`` rows after the validation joins —
    every dialect INSERT/CREATE EDGE) collect once and the DRIVER is
    the single write task (``driver_staged_append``; the distributed
    Python-DataSource writer pays a measured ~0.3s worker launch per
    write job, which at 2-row statements was 2× the whole old path);
    anything larger re-runs through the distributed
    ``workspace_append`` writer, whose tasks stage in parallel.
    Returns rows appended."""
    import uuid as _uuid

    from biodwh2_arcadedb_server_spark.sources.staged_write import (
        driver_staged_append,
        ensure_registered,
        read_last_append,
    )

    spark = df.sparkSession
    # Persist BEFORE the size probe (ADVICE r13): the probe plan and
    # the >cap distributed write must see the same data exactly once.
    # Caching is partition-granular — partitions the limit() touched
    # are reused by the write, the rest compute once there — so a
    # nondeterministic upstream expression (rand-derived ids) cannot
    # diverge between "rows probed" and "rows appended", and the
    # at-threshold case no longer pays the validation joins twice.
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # ONE parallel count materializes the persist and sizes the
        # dispatch (optimization r15, VERDICT r14 next #3): the former
        # ``limit(cap+1).collect()`` probe ran through executeTake's
        # incremental partition escalation — 3-5 tiny sequential jobs
        # per statement, each paying the ~50-80 ms scheduling gap the
        # q158 profile attributed most of the probe's wall to. The
        # ≤cap path then collects from the cache (cheap second job);
        # the >cap path no longer collects cap+1 rows at all.
        n = df.count()
        if n <= driver_cap:
            return driver_staged_append(path, df.schema, df.collect())
        ensure_registered(spark)
        token = _uuid.uuid4().hex
        (
            df.write.format("workspace_append")
            .option("path", path)
            .option("token", token)
            .mode("append")
            .save()
        )
        return read_last_append(path, token)
    finally:
        df.unpersist()


def insert_nodes(spark: SparkSession, ws_dir: str, label: str, rows: DataFrame) -> int:
    """CREATE VERTEX: append rows (node_id derived from natural_key;
    existing ids are rejected rows — duplicates silently skipped, the
    reference's error-tolerant ingest posture, A9). Returns new count.

    Scale: inserts are mode("append") — new parquet files land next
    to the dataset, O(inserted) IO with no rewrite of existing data
    (at 100 TB an insert must never touch the other 100 TB). The
    anti-join against existing ids shuffles only the 8-byte id
    column."""
    path = os.path.join(ws_dir, "nodes", label)
    cur = spark.read.parquet(path)
    new = rows.withColumn("node_id", node_id(label, F.col("natural_key"))).withColumn(
        "label", F.lit(label)
    )
    if "node_id2" in cur.columns:  # 128-bit scheme: derive both lanes
        new = new.withColumn("node_id2", node_id2(label, F.col("natural_key")))
    new = (
        new.select(*cur.columns)
        # within-batch duplicates (a multi-row VALUES repeating a
        # natural_key) would append two rows with the same node_id —
        # the anti-join only guards against EXISTING ids (ADVICE r6).
        # NOTE: the surviving row is partition-arbitrary; the dialect
        # executor dedupes deterministically (first literal wins)
        # BEFORE this call — this is the id-level safety net for
        # callers feeding raw DataFrames
        .dropDuplicates(["node_id"])
        .join(cur.select("node_id"), "node_id", "left_anti")
    )
    n_ins = _append_via_tmp(new, path)
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        n = json.load(mh)["nodes"][label]["count"] + n_ins
    _update_manifest_count(ws_dir, "nodes", label, n)
    return n


def update_nodes(
    spark: SparkSession, ws_dir: str, label: str, predicate: F.Column, assignments: dict[str, F.Column]
) -> int:
    """UPDATE ... SET ... WHERE: rewrite the label dataset with the
    assignments applied to matching rows. Returns rows touched.
    Identity columns are immutable — ids DERIVE from (label,
    natural_key), so rewriting the key without recomputing node_id
    (and every referencing edge) would silently break the invariant
    (round-7 review finding); use DELETE + INSERT, or ALTER TYPE for
    label renames."""
    frozen = {"node_id", "node_id2", "label", "natural_key"}
    bad = sorted(frozen & set(assignments))
    if bad:
        raise ValueError(
            f"cannot UPDATE identity column(s) {bad} — node ids derive "
            "from (label, natural_key); DELETE + INSERT instead"
        )
    path = os.path.join(ws_dir, "nodes", label)
    cur = spark.read.parquet(path)
    unknown = sorted(set(assignments) - set(cur.columns))
    if unknown:
        raise ValueError(
            f"unknown propert{'ies' if len(unknown) > 1 else 'y'} "
            f"{unknown} on vertex type {label!r} — declare with "
            "CREATE PROPERTY first"
        )
    # touched-count FOLDED into the rewrite via CollectMetrics
    # (optimization r15, VERDICT r14 next #3): the former
    # ``cur.where(predicate).count()`` was a separate scan + job per
    # UPDATE statement; observing sum(predicate) on the pre-update
    # rows during the write job computes the identical number (nulls
    # count 0 either way) in the same pass.
    obs = Observation()
    out = cur.observe(
        obs,
        F.coalesce(
            F.sum(F.when(predicate, 1).otherwise(0)), F.lit(0)
        ).alias("touched"),
    )
    for col_name, expr in assignments.items():
        # cast the assignment to the column's DECLARED type: the
        # schema is the contract (manifest-registered views read with
        # it), and an uncast when/otherwise would silently coerce the
        # whole column — e.g. SET age = 'x' turning long into string
        # parquet that the stale manifest schema can no longer scan
        # (round-8 review finding)
        out = out.withColumn(
            col_name,
            F.when(
                predicate, expr.cast(cur.schema[col_name].dataType)
            ).otherwise(F.col(col_name)),
        )
    _rewrite_dataset(out, path)
    return int(obs.get["touched"])


def delete_nodes(spark: SparkSession, ws_dir: str, label: str, predicate: F.Column) -> int:
    """DELETE VERTEX ... WHERE: drop matching nodes AND every edge
    touching them (ArcadeDB's DELETE VERTEX cascades to connected
    edges [B]). The cascade is a left_anti join per edge dataset on a
    1-column id set — broadcast when small, shuffle on the edge key
    otherwise. Returns nodes deleted."""
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    path = manifest["nodes"][label]["path"]
    cur = spark.read.parquet(path)
    doomed = cur.where(predicate).select("node_id").localCheckpoint(eager=True)
    n_del = doomed.count()
    if n_del == 0:
        return 0
    _rewrite_dataset(cur.join(doomed, "node_id", "left_anti"), path)
    _update_manifest_count(
        ws_dir, "nodes", label, manifest["nodes"][label]["count"] - n_del
    )
    for e_label, info in manifest["edges"].items():
        if label not in (info["src_label"], info["dst_label"]):
            continue
        e = spark.read.parquet(info["path"])
        kept = e
        if info["src_label"] == label:
            kept = kept.join(doomed.withColumnRenamed("node_id", "src"), "src", "left_anti")
        if info["dst_label"] == label:
            kept = kept.join(doomed.withColumnRenamed("node_id", "dst"), "dst", "left_anti")
        # surviving-edge count observed DURING the rewrite
        # (optimization r15): the former post-swap
        # ``spark.read.parquet(path).count()`` re-read the dataset a
        # second time for a number the write job already knows.
        obs = Observation()
        _rewrite_dataset(
            kept.observe(obs, F.count(F.lit(1)).alias("n")), info["path"]
        )
        _update_manifest_count(ws_dir, "edges", e_label, int(obs.get["n"]))
    return n_del


def insert_edges(spark: SparkSession, ws_dir: str, label: str, rows: DataFrame) -> int:
    """CREATE EDGE: append edge rows (``src``/``dst`` node ids +
    declared props). Endpoint existence is validated with left_semi
    joins against the endpoint node sets — dangling edges are
    silently skipped, the reference's `fromNode != null && toNode !=
    null` posture (ArcadeDBService.java:241-243). Duplicates are NOT
    collapsed: ArcadeDB materializes one edge per statement. Returns
    edges appended."""
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    info = manifest["edges"][label]
    path = info["path"]
    cur = spark.read.parquet(path)
    new = rows.withColumn("label", F.lit(label))
    src_nodes = spark.read.parquet(manifest["nodes"][info["src_label"]]["path"])
    dst_nodes = spark.read.parquet(manifest["nodes"][info["dst_label"]]["path"])
    if "src2" in cur.columns and "src2" not in new.columns:
        # 128-bit workspace fed first-lane-only rows (the dialect
        # CREATE EDGE path): the second lane cannot be derived from
        # the first (both are independent xxhash64 lanes of the
        # natural key), so pull it from the endpoint node tables —
        # the same join that validates existence
        new = new.join(
            src_nodes.select(
                F.col("node_id").alias("src"), F.col("node_id2").alias("src2")
            ),
            "src",
        ).join(
            dst_nodes.select(
                F.col("node_id").alias("dst"), F.col("node_id2").alias("dst2")
            ),
            "dst",
        )
        new = new.select(*cur.columns)
    else:
        new = new.select(*cur.columns)
        src_ids = src_nodes.select("node_id")
        dst_ids = dst_nodes.select("node_id")
        new = new.join(src_ids, new.src == src_ids.node_id, "left_semi")
        new = new.join(dst_ids, new.dst == dst_ids.node_id, "left_semi")
    # append, not rewrite: O(inserted) IO (100 TB posture)
    n_new = _append_via_tmp(new, path)
    if n_new:
        _update_manifest_count(ws_dir, "edges", label, info["count"] + n_new)
    return n_new


def update_edges(
    spark: SparkSession, ws_dir: str, label: str, predicate: F.Column, assignments: dict[str, F.Column]
) -> int:
    """UPDATE EDGE ... SET ... WHERE: rewrite the edge dataset with
    the assignments applied to matching rows. Returns rows touched.
    Endpoints and the label are immutable (same identity posture as
    update_nodes) — DELETE EDGE + CREATE EDGE instead."""
    frozen = {"src", "src2", "dst", "dst2", "label"}
    bad = sorted(frozen & set(assignments))
    if bad:
        raise ValueError(
            f"cannot UPDATE EDGE structural column(s) {bad} — "
            "DELETE EDGE + CREATE EDGE instead"
        )
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    path = manifest["edges"][label]["path"]
    cur = spark.read.parquet(path)
    unknown = sorted(set(assignments) - set(cur.columns))
    if unknown:
        raise ValueError(
            f"unknown propert{'ies' if len(unknown) > 1 else 'y'} "
            f"{unknown} on edge type {label!r} — declare with "
            "CREATE PROPERTY first"
        )
    # same CollectMetrics fold as update_nodes (optimization r15):
    # touched-count computed inside the rewrite job, no separate scan
    obs = Observation()
    out = cur.observe(
        obs,
        F.coalesce(
            F.sum(F.when(predicate, 1).otherwise(0)), F.lit(0)
        ).alias("touched"),
    )
    for col_name, expr in assignments.items():
        # cast the assignment to the column's DECLARED type: the
        # schema is the contract (manifest-registered views read with
        # it), and an uncast when/otherwise would silently coerce the
        # whole column — e.g. SET age = 'x' turning long into string
        # parquet that the stale manifest schema can no longer scan
        # (round-8 review finding)
        out = out.withColumn(
            col_name,
            F.when(
                predicate, expr.cast(cur.schema[col_name].dataType)
            ).otherwise(F.col(col_name)),
        )
    _rewrite_dataset(out, path)
    return int(obs.get["touched"])


def delete_edges_between(
    spark: SparkSession,
    ws_dir: str,
    label: str,
    src_ids: DataFrame,
    dst_ids: DataFrame,
    predicate: F.Column,
    info: dict | None = None,
) -> int:
    """DELETE EDGE <T> FROM <x> TO <y> [WHERE …]: drop every edge
    whose src is in ``src_ids`` AND dst is in ``dst_ids`` (1-column
    node-id frames named src/dst) and that matches ``predicate``.
    The doomed set is identified by two semi-joins on the 8-byte
    endpoint columns (broadcast for interactive endpoint sets) and
    removed with exceptAll — full-row multiset semantics, so
    duplicate edges between the same endpoints all go, matching
    ArcadeDB. Returns edges deleted."""
    if info is None:
        # callers that already resolved the manifest entry (the
        # dialect executor reads it for the endpoint labels) pass it
        # in — no second read/parse per statement (round-8 review)
        with open(os.path.join(ws_dir, "manifest.json")) as mh:
            info = json.load(mh)["edges"][label]
    cur = spark.read.parquet(info["path"])
    doomed = (
        cur.join(F.broadcast(src_ids), "src", "left_semi")
        .join(F.broadcast(dst_ids), "dst", "left_semi")
        .where(predicate)
        # the USING-joins move the join keys to the FRONT of the
        # schema and exceptAll matches POSITIONALLY — restore cur's
        # column order or nothing ever matches
        .select(*cur.columns)
    )
    n_del = doomed.count()
    if n_del:
        _rewrite_dataset(cur.exceptAll(doomed), info["path"])
        _update_manifest_count(ws_dir, "edges", label, info["count"] - n_del)
    return n_del


def delete_edges(spark: SparkSession, ws_dir: str, label: str, predicate: F.Column) -> int:
    """DELETE EDGE ... WHERE: drop matching edge rows (no cascade —
    edges have no dependents). Returns edges deleted."""
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    path = manifest["edges"][label]["path"]
    cur = spark.read.parquet(path)
    doomed = cur.where(predicate).count()
    if doomed:
        _rewrite_dataset(cur.where(~predicate), path)
        _update_manifest_count(
            ws_dir, "edges", label,
            manifest["edges"][label]["count"] - doomed,
        )
    return doomed


# --- DDL as manifest + dataset operations (B19 companion) ----------------------
# ArcadeDB Studio users type CREATE VERTEX TYPE / CREATE PROPERTY /
# CREATE INDEX (the reference's ETL issues the same calls
# programmatically, ArcadeDBService.java:143-154, 258-283). Here each
# is a manifest + parquet-dataset operation: types are empty datasets
# with declared schemas, properties are typed null columns, and a
# UNIQUE index is a validation query (the A13 re-expression — at
# 100 TB the "index" is layout + footer stats, uniqueness is a
# groupBy audit).


def _write_empty_dataset(schema, path: str) -> None:
    """Write an empty parquet dataset DRIVER-SIDE (pyarrow): creating
    a type is a metadata operation and must not launch a distributed
    job for zero rows (round-8 q158 trim — each empty Spark write was
    a ~0.5s job in an interactive DDL sequence)."""
    import pyarrow as pa
    import pyarrow.parquet as pa_pq
    from pyspark.sql.pandas.types import to_arrow_schema

    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    pa_pq.write_table(
        pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in to_arrow_schema(schema)],
            schema=to_arrow_schema(schema),
        ),
        os.path.join(path, "part-00000-empty.parquet"),
    )


def create_node_type(spark: SparkSession, ws_dir: str, label: str) -> None:
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    if label in manifest["nodes"]:
        raise ValueError(f"node type {label!r} already exists")
    # new types APPEND to the recorded bucket order (never reuse a
    # tombstoned slot — previously-echoed RIDs must stay stable)
    buckets = manifest.get("rid_buckets") or list(manifest["nodes"])
    buckets.append(label)
    manifest["rid_buckets"] = buckets
    path = os.path.join(ws_dir, "nodes", label)
    empty = spark.createDataFrame(
        [], "node_id long, natural_key long, label string"
    )
    _write_empty_dataset(empty.schema, path)
    manifest["nodes"][label] = {
        "path": path,
        "key": "natural_key",
        "source_hash": "ddl",
        "schema": empty.schema.jsonValue(),
        "count": 0,
    }
    with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
        json.dump(manifest, mh, indent=2)


def create_edge_type(
    spark: SparkSession, ws_dir: str, label: str, src_label: str, dst_label: str
) -> None:
    """Engine extension vs plain ArcadeDB: endpoint labels are
    REQUIRED (``FROM <SrcType> TO <DstType>``) because edge appends
    validate endpoints against the typed node sets (A11)."""
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    if label in manifest["edges"]:
        raise ValueError(f"edge type {label!r} already exists")
    for lbl in (src_label, dst_label):
        if lbl not in manifest["nodes"]:
            raise ValueError(f"unknown endpoint node type {lbl!r}")
    path = os.path.join(ws_dir, "edges", label)
    empty = spark.createDataFrame([], "src long, dst long, label string")
    _write_empty_dataset(empty.schema, path)
    manifest["edges"][label] = {
        "path": path,
        "src_label": src_label,
        "dst_label": dst_label,
        "source_hash": "ddl",
        "schema": empty.schema.jsonValue(),
        "count": 0,
    }
    with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
        json.dump(manifest, mh, indent=2)


def add_property(
    spark: SparkSession, ws_dir: str, label: str, prop: str, type_name: str
) -> None:
    """CREATE PROPERTY <T>.<prop> <TYPE>: a typed null column added
    to the label dataset (`definition.createProperty`,
    ArcadeDBService.java:152-154 parity). One partition-parallel
    rewrite; existing rows carry NULL (the reference's null-dropping
    posture in reverse)."""
    from biodwh2_arcadedb_server_spark.typemap import resolve_type

    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    kind = "nodes" if label in manifest["nodes"] else "edges"
    if label not in manifest[kind]:
        raise ValueError(f"unknown type {label!r}")
    path = manifest[kind][label]["path"]
    cur = spark.read.parquet(path)
    if prop in cur.columns:
        raise ValueError(f"property {label}.{prop} already exists")
    dtype = resolve_type({"datetime": "timestamp"}.get(type_name.lower(), type_name))
    out = cur.withColumn(prop, F.lit(None).cast(dtype))
    if manifest[kind][label].get("count") == 0:
        # empty type: pure schema change, no rows to rewrite —
        # driver-side (round-8 q158 trim)
        _write_empty_dataset(out.schema, path)
    else:
        _rewrite_dataset(out, path)
    manifest[kind][label]["schema"] = out.schema.jsonValue()
    with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
        json.dump(manifest, mh, indent=2)


def create_index(
    spark: SparkSession, ws_dir: str, label: str, cols: list[str], unique: bool
) -> None:
    """CREATE INDEX ON <T> (cols) [UNIQUE]: UNIQUE runs the A13
    uniqueness validation (groupBy(cols) HAVING count>1 — fails loud
    naming the violation count); both flavors are recorded in the
    manifest so layout tooling (sources/layout.py Z-order, bucketing)
    can pick the clustering columns — the 100 TB analog of an index."""
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    kind = "nodes" if label in manifest["nodes"] else "edges"
    if label not in manifest[kind]:
        raise ValueError(f"unknown type {label!r}")
    df = spark.read.parquet(manifest[kind][label]["path"])
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown column(s) {missing} on {label!r}")
    if unique and manifest[kind][label].get("count", 1) != 0:
        # (an empty type is trivially unique — no audit job)
        dups = df.groupBy(*cols).count().where(F.col("count") > 1).count()
        if dups:
            raise ValueError(
                f"UNIQUE index on {label}({', '.join(cols)}) violated: "
                f"{dups} duplicated key value(s)"
            )
    manifest[kind][label].setdefault("indexes", []).append(
        {"columns": cols, "unique": unique}
    )
    with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
        json.dump(manifest, mh, indent=2)


def drop_type(spark: SparkSession, ws_dir: str, label: str, unsafe: bool = False) -> int:
    """DROP TYPE <T> [UNSAFE]: remove the label dataset + manifest
    entry (round-7 DDL completion — the inverse of create_node_type/
    create_edge_type). A POPULATED type requires UNSAFE (ArcadeDB's
    posture: dropping live records must be explicit), and a node type
    referenced by a declared edge type cannot be dropped until those
    edge types are — otherwise the schema would dangle. Returns
    records dropped. O(1) IO: directory removal, no rewrite."""
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    if label in manifest["edges"]:
        info = manifest["edges"][label]
        # manifest counts are maintained by every mutation — a DDL
        # statement must not pay a dataset re-scan for bookkeeping
        # (round-7 VERDICT #8)
        n = info["count"]
        if n and not unsafe:
            raise ValueError(
                f"edge type {label!r} holds {n} edge(s) — "
                "use DROP TYPE ... UNSAFE to drop it with its records"
            )
        shutil.rmtree(info["path"])
        del manifest["edges"][label]
    elif label in manifest["nodes"]:
        refs = sorted(
            e for e, i in manifest["edges"].items()
            if label in (i["src_label"], i["dst_label"])
        )
        if refs:
            raise ValueError(
                f"node type {label!r} is referenced by edge type(s) "
                f"{refs} — DROP those first"
            )
        info = manifest["nodes"][label]
        n = info["count"]
        if n and not unsafe:
            raise ValueError(
                f"node type {label!r} holds {n} record(s) — "
                "use DROP TYPE ... UNSAFE to drop it with its records"
            )
        shutil.rmtree(info["path"])
        # tombstone the bucket slot (None) instead of shifting later
        # buckets — RID indices recorded in the manifest stay stable
        # after DROP TYPE (ADVICE r9)
        buckets = manifest.get("rid_buckets") or list(manifest["nodes"])
        if label in buckets:
            buckets[buckets.index(label)] = None
        manifest["rid_buckets"] = buckets
        del manifest["nodes"][label]
    else:
        raise ValueError(f"unknown type {label!r}")
    with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
        json.dump(manifest, mh, indent=2)
    return n


def drop_property(spark: SparkSession, ws_dir: str, label: str, prop: str) -> None:
    """DROP PROPERTY <T>.<p>: one partition-parallel rewrite without
    the column (the inverse of add_property). Structural columns
    (node_id/label/natural_key, src/dst) are protected; manifest
    index records referencing the property are removed with it."""
    core = {
        "node_id", "node_id2", "label", "natural_key",
        "src", "src2", "dst", "dst2",
    }
    if prop in core:
        raise ValueError(f"cannot drop structural column {prop!r}")
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    kind = "nodes" if label in manifest["nodes"] else "edges"
    if label not in manifest[kind]:
        raise ValueError(f"unknown type {label!r}")
    path = manifest[kind][label]["path"]
    cur = spark.read.parquet(path)
    if prop not in cur.columns:
        raise ValueError(f"unknown property {label}.{prop}")
    out = cur.drop(prop)
    _rewrite_dataset(out, path)
    manifest[kind][label]["schema"] = out.schema.jsonValue()
    idx = manifest[kind][label].get("indexes")
    if idx:
        manifest[kind][label]["indexes"] = [
            i for i in idx if prop not in i["columns"]
        ]
    with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
        json.dump(manifest, mh, indent=2)


def drop_index(spark: SparkSession, ws_dir: str, label: str, cols: list[str]) -> None:
    """DROP INDEX ON <T> (cols): remove the manifest index record
    (the clustering hint create_index recorded)."""
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    kind = "nodes" if label in manifest["nodes"] else "edges"
    if label not in manifest[kind]:
        raise ValueError(f"unknown type {label!r}")
    idx = manifest[kind][label].get("indexes", [])
    kept = [i for i in idx if i["columns"] != cols]
    if len(kept) == len(idx):
        raise ValueError(
            f"no index on {label}({', '.join(cols)}) "
            f"(declared: {[i['columns'] for i in idx]})"
        )
    manifest[kind][label]["indexes"] = kept
    with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
        json.dump(manifest, mh, indent=2)


def rename_type(spark: SparkSession, ws_dir: str, label: str, new_label: str) -> int:
    """ALTER TYPE <T> NAME <New>: rename a type, cascading the
    DERIVED identity. Node ids are xxhash64(label, natural_key) — a
    content-derived scheme with no driver-side map (A10) — so a node
    rename RECOMPUTES every id and remaps src/dst in every touching
    edge dataset via an (old_id, new_id) join: two hash joins per
    edge type on 8-byte keys, the Spark-shaped cascade (at 100 TB the
    remap shuffles only ids, and only for edge types declared against
    the renamed label). Edge renames rewrite just their own label
    column. Returns rows rewritten in the renamed dataset."""
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    for side in ("nodes", "edges"):
        if new_label in manifest[side]:
            raise ValueError(f"type {new_label!r} already exists")
    if label in manifest["edges"]:
        info = manifest["edges"][label]
        cur = spark.read.parquet(info["path"])
        n = info["count"]  # maintained invariant — no re-scan
        new_path = os.path.join(ws_dir, "edges", new_label)
        cur.withColumn("label", F.lit(new_label)).write.mode("overwrite").parquet(new_path)
        shutil.rmtree(info["path"])
        info["path"] = new_path
        manifest["edges"][new_label] = info
        del manifest["edges"][label]
        with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
            json.dump(manifest, mh, indent=2)
        return n
    if label not in manifest["nodes"]:
        raise ValueError(f"unknown type {label!r}")
    info = manifest["nodes"][label]
    cur = spark.read.parquet(info["path"])
    # 128-bit workspaces (SCALE.md collision-ceiling escape hatch)
    # rename the SAME way with both lanes recomputed and the edge
    # remap joined on the 16-byte pair — a first-lane collision can't
    # cross-wire the remap (round-8: closes the ROADMAP "128-bit DML
    # completion" seam that previously raised here).
    two_lane = "node_id2" in cur.columns
    n = info["count"]  # maintained invariant — no re-scan
    lanes = [
        F.col("node_id").alias("_old"),
        node_id(new_label, F.col("natural_key")).alias("_new"),
    ]
    if two_lane:
        lanes += [
            F.col("node_id2").alias("_old2"),
            node_id2(new_label, F.col("natural_key")).alias("_new2"),
        ]
    mapping = cur.select(*lanes).localCheckpoint(eager=True)
    # re-run the cross-label collision audit BEFORE committing: the
    # recomputed xxhash64(new_label, key) ids face the same hazard
    # build_workspace refuses to ship (round-7 review finding) —
    # a silent collision would cross-wire traversals
    id_cols = ["node_id", "node_id2"] if two_lane else ["node_id"]
    others = None
    for other, o_info in manifest["nodes"].items():
        if other == label:
            continue
        part = spark.read.parquet(o_info["path"]).select(*id_cols)
        others = part if others is None else others.unionByName(part)
    if others is not None:
        new_ids = mapping.select(F.col("_new").alias("node_id"))
        if two_lane:
            # a clash means BOTH lanes collide — the pair is the id
            new_ids = mapping.select(
                F.col("_new").alias("node_id"),
                F.col("_new2").alias("node_id2"),
            )
        clashes = new_ids.join(others, id_cols, "left_semi").count()
        if clashes:
            raise ValueError(
                f"renaming {label!r} to {new_label!r} would collide "
                f"{clashes} recomputed node id(s) with other labels — "
                "rebuild with a wider id scheme first"
            )
    new_path = os.path.join(ws_dir, "nodes", new_label)
    renamed = cur.withColumn(
        "node_id", node_id(new_label, F.col("natural_key"))
    ).withColumn("label", F.lit(new_label))
    if two_lane:
        renamed = renamed.withColumn(
            "node_id2", node_id2(new_label, F.col("natural_key"))
        )
    renamed.write.mode("overwrite").parquet(new_path)
    shutil.rmtree(info["path"])
    info["path"] = new_path
    # a rename keeps its bucket slot — RID indices stay stable
    buckets = manifest.get("rid_buckets") or list(manifest["nodes"])
    if label in buckets:
        buckets[buckets.index(label)] = new_label
    manifest["rid_buckets"] = buckets
    manifest["nodes"][new_label] = info
    del manifest["nodes"][label]
    drop_cols = ["_old", "_new"] + (["_old2", "_new2"] if two_lane else [])
    for e_label, e_info in manifest["edges"].items():
        touches = False
        e = spark.read.parquet(e_info["path"])
        if e_info["src_label"] == label:
            cond = e.src == mapping._old
            if two_lane:
                cond = cond & (e.src2 == mapping._old2)
            e = e.join(mapping, cond, "left").withColumn(
                "src", F.coalesce("_new", "src")
            )
            if two_lane:
                e = e.withColumn("src2", F.coalesce("_new2", "src2"))
            e = e.drop(*drop_cols)
            e_info["src_label"] = new_label
            touches = True
        if e_info["dst_label"] == label:
            cond = e.dst == mapping._old
            if two_lane:
                cond = cond & (e.dst2 == mapping._old2)
            e = e.join(mapping, cond, "left").withColumn(
                "dst", F.coalesce("_new", "dst")
            )
            if two_lane:
                e = e.withColumn("dst2", F.coalesce("_new2", "dst2"))
            e = e.drop(*drop_cols)
            e_info["dst_label"] = new_label
            touches = True
        if touches:
            _rewrite_dataset(e, e_info["path"])
    with open(os.path.join(ws_dir, "manifest.json"), "w") as mh:
        json.dump(manifest, mh, indent=2)
    return n


def is_stale(src_dir: str, ws_dir: str) -> bool:
    """E2 staleness check (ArcadeDBServer.java:105-119) — warn-only."""
    checksum_file = os.path.join(ws_dir, "checksum.txt")
    if not os.path.exists(checksum_file):
        return True
    with open(checksum_file) as fh:
        return fh.read().strip() != source_checksum(src_dir)


def _label_view_key(info: dict) -> tuple:
    """Freshness fingerprint for one label's registered view: the
    manifest entry (path, schema, count) plus the dataset directory's
    mtime. EVERY mutation lane replaces files under the dataset path
    (staged write + atomic swap), which bumps the directory mtime —
    the same mtime-parity contract the incremental builder (A15)
    already relies on — so an unchanged key ⟺ unchanged files AND
    unchanged declared schema, and the previously registered view
    (whose plan captured the file listing at creation) is still
    exact."""
    try:
        st = os.stat(info["path"])
        mt = (st.st_mtime_ns, st.st_ino)
    except OSError:
        mt = None
    return (
        info.get("path"),
        json.dumps(info.get("schema"), sort_keys=True) if info.get("schema") else None,
        info.get("count"),
        mt,
    )


# (applicationId, ws_dir) -> {"nodes"|"edges": {label: (key, slim_df)}}
# — driver-side memo of registered per-label views (optimization r14,
# guide §5: the DML floor was py4j round-trip volume — ~0.28s of
# Column-building chatter per refresh × one refresh per statement).
# Guarded by the engine DML lock like every other view-registry
# global.
_VIEW_REG: dict = {}


def load_workspace(spark: SparkSession, ws_dir: str) -> dict:
    """E2 lifecycle (`--start`): register per-label views plus unified
    ``nodes``/``edges`` views for graph-wide analytics.

    Heterogeneous per-label schemas meet in the unified view through
    the SURVEY §1.3 escape hatch: per-label columns stay exactly typed
    in ``n_<Label>`` (the source of truth), and the unified ``nodes``
    view carries them as a ``props map<string,string>`` so label-
    agnostic queries (`WHERE props['name'] LIKE …`) stay expressible
    without widening every label to a common schema.

    Optimization r14: per-label registration is MEMOIZED on a
    freshness key (manifest entry + dataset dir mtime, see
    `_label_view_key`). An interactive DML sequence refreshes views
    after every statement, but each statement touches one label —
    unchanged labels skip the re-read/re-register py4j chatter
    entirely, and the unified views are rebuilt from the cached
    per-label projections (the label that DID change is re-read, so
    the unified plan never references replaced files)."""
    global VIEW_EPOCH
    with open(os.path.join(ws_dir, "manifest.json")) as mh:
        manifest = json.load(mh)
    # bucket order comes from the manifest (recorded at build time,
    # maintained by DDL: drops tombstone, renames keep their slot,
    # creates append — ADVICE r9), not from dict insertion order.
    # Mutation is guarded by the engine DML lock so concurrent server
    # threads never race a compile against a half-swapped list; the
    # slice assignment itself is a single atomic CPython op, so
    # lock-free readers see either the old or the new list whole.
    from biodwh2_arcadedb_server_spark import arcadesql as _asql

    global LAST_WS_DIR
    with _asql._DML_LOCK:
        # the epoch bump lives INSIDE the lock — an unguarded
        # read-modify-write here races _register_star_workspace's
        # locked bump and a lost increment would let a stale view
        # memo pass as current (round-10 second review pass)
        VIEW_EPOCH += 1
        RID_BUCKET_LABELS[:] = manifest.get("rid_buckets") or list(
            manifest["nodes"]
        )
        LAST_WS_DIR = ws_dir

    def _read(info):
        # The manifest carries the authoritative schema (written at
        # build time and kept current by every schema-changing DDL),
        # so view registration needs NO parquet footer read — at 14
        # statements per interactive DDL sequence the per-statement
        # re-registration was paying a footer read per label
        # (round-8 q158 trim; ~40% of the sequence wall time).
        schema_json = info.get("schema")
        if schema_json:
            from pyspark.sql.types import StructType

            return spark.read.schema(
                StructType.fromJson(schema_json)
            ).parquet(info["path"])
        return spark.read.parquet(info["path"])

    # single-slot memo: valid only for (this session, this ws_dir) —
    # switching workspaces re-registers everything, because temp-view
    # NAMES are session-global and now point elsewhere
    owner = (spark.sparkContext.applicationId, ws_dir)
    with _asql._DML_LOCK:
        if _VIEW_REG.get("owner") != owner:
            _VIEW_REG.clear()
            _VIEW_REG.update({"owner": owner, "nodes": {}, "edges": {}})
        node_reg, edge_reg = _VIEW_REG["nodes"], _VIEW_REG["edges"]

    def _node_slim(df):
        prop_cols = [c for c in df.columns if c not in ("node_id", "node_id2", "label", "natural_key")]
        if prop_cols:
            entries: list = []
            for c in prop_cols:
                entries.extend([F.lit(c), F.col(c).cast("string")])
            props = F.map_from_arrays(
                F.array(*entries[0::2]), F.array(*entries[1::2])
            )
        else:
            props = F.create_map()
        return df.select("node_id", "label", "natural_key", props.alias("props"))

    def _edge_slim(df):
        return df.select("src", "dst", "label")

    def _refresh(kind, prefix, reg, slim_fn):
        changed = False
        slims = []
        for label, info in manifest[kind].items():
            key = _label_view_key(info)
            got = reg.get(label)
            if got is not None and got[0] == key:
                slims.append(got[1])
                continue
            df = _read(info)
            df.createOrReplaceTempView(f"{prefix}{label}")
            slim = slim_fn(df)
            reg[label] = (key, slim)
            slims.append(slim)
            changed = True
        for stale in [lbl for lbl in reg if lbl not in manifest[kind]]:
            del reg[stale]
            changed = True
        return changed, slims

    n_changed, node_slims = _refresh("nodes", "n_", node_reg, _node_slim)
    e_changed, edge_slims = _refresh("edges", "e_", edge_reg, _edge_slim)

    if n_changed or "_nodes_done" not in _VIEW_REG:
        unified_nodes = None
        for slim in node_slims:
            unified_nodes = slim if unified_nodes is None else unified_nodes.unionByName(slim)
        if unified_nodes is None:
            # dropping the LAST type must not leave a stale unified view
            # whose plan reads a deleted dataset (round-7 review finding)
            # natural_key is LONG to match the populated path (build_nodes
            # casts the key to long) — a string here made the unified-view
            # schema depend on whether any node type exists (round-7
            # ADVICE).
            unified_nodes = spark.createDataFrame(
                [], "node_id long, label string, natural_key long, "
                    "props map<string,string>"
            )
        unified_nodes.createOrReplaceTempView("nodes")
        _VIEW_REG["_nodes_done"] = True
    if e_changed or "_edges_done" not in _VIEW_REG:
        unified_edges = None
        for slim in edge_slims:
            unified_edges = slim if unified_edges is None else unified_edges.unionByName(slim)
        if unified_edges is None:
            unified_edges = spark.createDataFrame(
                [], "src long, dst long, label string"
            )
        unified_edges.createOrReplaceTempView("edges")
        _VIEW_REG["_edges_done"] = True
    return manifest
