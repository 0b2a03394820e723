"""Round-12 advice regressions: kmeans++ draws a FRESH per-round
uniform (Efraimidis–Spirakis with round-varying D² weights), the TWS
timer/expiry math is datetime-resolution-independent, and the
first-seen MapState shards each user's fingerprint space into
``(user, fp >> shard_shift)`` blocks with unchanged semantics."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.registry import load_table
from biodwh2_arcadedb_server_spark.streaming import stateful as st_mod


# --- kmeans++ per-round uniforms (similarity.py) -----------------------------


def test_kmpp_uniform_is_rekeyed_per_round(spark, sf_small):
    """The selection chain must consume u_r(id) = md5('kmpp:{seed}:
    {round}:{id}'), not one fixed u(id): with a fixed uniform the
    SAME high-u row family is favored in every round (ADVICE r11).
    Checked structurally — the chain Spark picks must equal a replay
    that draws fresh uniforms per round, and must DIFFER from the
    fixed-u replay whenever the two replays disagree on this corpus."""
    import math

    import numpy as np

    from biodwh2_arcadedb_server_spark.operators import similarity

    SEED, K, DIM = 0, 4, 16
    e = load_table(spark, sf_small, "embeddings")
    got = {
        r.vec_id: r.cluster
        for r in similarity.kmeans_assign(
            e, k=K, iterations=0, dim=DIM, init="kmeans++", seed=SEED
        ).collect()
    }

    rows = sorted(
        e.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )
    ids = [r.vec_id for r in rows]
    X = np.array([[float(v) for v in r.embedding[:DIM]] for r in rows])

    def u(rnd):
        return np.array([
            (
                int(
                    hashlib.md5(
                        f"kmpp:{SEED}:{rnd}:{i}".encode()
                    ).hexdigest()[:8],
                    16,
                )
                + 1
            )
            / 4294967296.0
            for i in ids
        ])

    def chain(uniform_of_round):
        cents = [X[int(uniform_of_round(0).argmax())]]
        picked = [ids[int(uniform_of_round(0).argmax())]]
        while len(cents) < 4:
            d2 = (
                ((X[:, None, :] - np.stack(cents)[None, :, :]) ** 2)
                .sum(2)
                .min(1)
            )
            ur = uniform_of_round(len(cents))
            key = np.where(
                d2 > 0, np.log(ur) / np.where(d2 > 0, d2, 1.0), -math.inf
            )
            j = int(key.argmax())
            cents.append(X[j])
            picked.append(ids[j])
        return picked

    fresh = chain(u)
    fixed = chain(lambda _r: u(0))
    assert fresh != fixed, "corpus too small to distinguish the schemes"
    # iterations=0 assignment is the Voronoi partition of the seeds:
    # recompute it from the fresh-uniform chain (8dp rounding is a
    # no-op here because float32 embeddings round-trip)
    from decimal import ROUND_HALF_UP, Decimal

    C = np.array([
        [
            float(
                Decimal(repr(float(v))).quantize(
                    Decimal("1e-8"), rounding=ROUND_HALF_UP
                )
            )
            for v in X[ids.index(p)]
        ]
        for p in fresh
    ])
    want = dict(
        zip(ids, ((X[:, None, :] - C[None, :, :]) ** 2).sum(2).argmin(1).tolist())
    )
    assert got == want


# --- resolution-independent timer math (stateful.py) -------------------------


@pytest.mark.skipif(
    not st_mod.HAS_TRANSFORM_WITH_STATE,
    reason="TWS classes unavailable without a protobuf runtime",
)
@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_session_close_timer_math_is_unit_independent(unit):
    """_store_and_rearm / handleExpiredTimer must compute the same
    epoch-ms instants whether pandas hands them datetime64[ns] (the
    arrow bridge today) or a coarser native resolution (pandas-2
    default without coerce_temporal_nanoseconds) — ADVICE r11: the
    old astype('int64') assumed ns and would misfire by 1000× on us."""
    proc = st_mod._SessionCloseProcessor(gap_ms=5_000)

    class _Timers:
        def __init__(self):
            self.registered = []

        def listTimers(self):
            return []

        def registerTimer(self, t):
            self.registered.append(t)

        def deleteTimer(self, t):  # pragma: no cover - not hit here
            raise AssertionError("unexpected deleteTimer")

    class _ListState:
        def __init__(self):
            self.rows = None

        def put(self, rows):
            self.rows = rows

        def clear(self):
            self.rows = []

        def exists(self):
            return self.rows is not None

        def get(self):
            return iter(self.rows)

    proc._handle = _Timers()
    proc._sessions = _ListState()
    end = pd.Timestamp("2024-01-01 00:00:01.250")
    pending = pd.DataFrame(
        {
            "user_id": pd.array([7], dtype="int64"),
            "start": pd.Series([end - pd.Timedelta(seconds=1)]).astype(
                f"datetime64[{unit}]"
            ),
            "end": pd.Series([end]).astype(f"datetime64[{unit}]"),
            "n": pd.array([2], dtype="int64"),
            "s": pd.array([1.5], dtype="float64"),
        }
    )
    proc._store_and_rearm(pending)
    want_ms = int(end.value // 1_000_000) + 5_000
    assert proc._handle.registered == [want_ms]

    # expiry check: a watermark 1ms short of end+gap keeps the
    # session pending; at end+gap it finalizes — in every unit
    class _TimerValues:
        def __init__(self, wm):
            self._wm = wm

        def getCurrentWatermarkInMs(self):
            return self._wm

    class _Expired:
        def getExpiryTimeInMs(self):
            return 0

    held = list(
        proc.handleExpiredTimer(
            (0,), _TimerValues(want_ms - 1), _Expired()
        )
    )
    assert held == []
    proc._sessions.rows = [
        (7, pending["start"].iloc[0], pending["end"].iloc[0], 2, 1.5)
    ]
    fired = list(
        proc.handleExpiredTimer((0,), _TimerValues(want_ms), _Expired())
    )
    assert len(fired) == 1 and fired[0]["user_id"].iloc[0] == 7


# --- first-seen fp-block sharding (stateful.py) ------------------------------


def test_first_seen_sharded_blocks_match_batch(spark, sf_small):
    """shard_shift=4 spreads the modulus-97 fingerprints over blocks
    0..6 (multiple MapState sub-keys per user) — the emitted set must
    still equal the batch GROUP BY / MIN(ts) oracle, proving the
    sharded layout changes write amplification, not semantics."""
    if not st_mod.HAS_TRANSFORM_WITH_STATE:
        pytest.skip("no TWS runtime")
    rows = st_mod.run_finite_first_seen(
        spark, sf_small, modulus=97, n_chunks=3, name="fs_sharded",
        shard_shift=4,
    ).collect()
    got = {(r.user_id, r.fp): r.first_ts for r in rows}
    assert len(got) == len(rows), "a (user, fp) pair emitted twice"
    batch = {
        (r.user_id, r.fp): r.first_ts
        for r in (
            load_table(spark, sf_small, "events")
            .select(
                "user_id", "ts",
                (F.floor(F.col("value") * 10).cast("long") % 97).alias("fp"),
            )
            .groupBy("user_id", "fp")
            .agg(F.min("ts").alias("first_ts"))
            .collect()
        )
    }
    assert got == batch
