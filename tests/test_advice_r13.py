"""Round-13 advice regressions: exact-substring run islands bridge
single capped-gram gaps (a df/postings-capped stop-gram can no longer
split an otherwise-qualifying duplicated run), the spec-shaped
__schema path rejects bare leaf selections on its object-typed fields
(`types` previously projected a typed NULL while `fields` raised),
the console depth-2 hop keeps genuine parallel edges (dedup key was
(src, dst, label)), and the first-seen MapState layout bump is
recorded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.operators import dedup


# --- exact-substring bounded-gap islanding (dedup.py) ------------------------


def test_capped_stop_gram_cannot_split_a_run(spark):
    """Two docs share one verbatim 24-token run whose MIDDLE k-gram is
    boilerplate (planted verbatim in max_df+1 other docs, so the
    df-cap drops it from the index). Strict-consecutive islanding
    splits the run into two ~15-token fragments, both under
    min_len=20 → the duplicate is silently missed (ADVICE r12).
    Bounded-gap islanding (gap ≤ k−1 anchors, exact under the
    gram-coverage argument) must keep the full span."""
    k, min_len, max_df = 8, 20, 4
    run = [f"r{i}" for i in range(24)]  # shared 24-token run
    # the gram starting at run position 9 covers run[8:16]; plant it
    # in max_df+1 filler docs so count_distinct(_id) > max_df
    stop_gram = run[8:16]
    rows = [
        (0, " ".join(["a%d" % i for i in range(5)] + run)),
        (1, " ".join(["b%d" % i for i in range(3)] + run)),
    ]
    for j in range(max_df + 1):
        rows.append((10 + j, " ".join([f"f{j}x{i}" for i in range(4)] + stop_gram)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dedup.exact_substring_spans(
        df, "doc_id", "text", k=k, min_len=min_len, max_df=max_df
    ).collect()
    mine = [r for r in spans if r.doc_id == 1]
    assert mine, "run containing a capped stop-gram was dropped entirely"
    assert max(r.span_tokens for r in mine) >= min_len, (
        "stop-gram split the run below min_len: %s" % mine
    )
    # and the span is the WHOLE run (both fragments bridged into one)
    assert any(r.span_tokens == len(run) for r in mine)


def test_genuine_mismatch_still_splits_runs(spark):
    """The bridge must NOT merge two runs separated by a real token
    mismatch: a differing token kills k consecutive anchors, which is
    beyond the k−1 bridge bound. Two 20-token shared runs separated
    by one differing token must stay two spans (each ≥ min_len, so
    both are reported; a false bridge would return one 41-token
    span)."""
    k, min_len = 8, 20
    run_a = [f"x{i}" for i in range(20)]
    run_b = [f"y{i}" for i in range(20)]
    doc0 = run_a + ["SEP0"] + run_b
    doc1 = run_a + ["SEP1"] + run_b
    df = spark.createDataFrame(
        [(0, " ".join(doc0)), (1, " ".join(doc1))],
        "doc_id long, text string",
    )
    spans = dedup.exact_substring_spans(
        df, "doc_id", "text", k=k, min_len=min_len, max_df=16
    ).collect()
    mine = sorted((r.span_start, r.span_end) for r in spans if r.doc_id == 1)
    assert mine == [(1, 20), (22, 41)], mine


# --- __schema bare-object-leaf selections raise (graphql.py) -----------------


@pytest.mark.parametrize(
    "doc",
    [
        # a sibling selection forces the spec-shaped path; `types`
        # bare must then raise like a bare `fields` does, not project
        # a typed NULL (a LONE bare `{ __schema { types } }` keeps
        # the legacy compact one-row-per-type shape by design)
        "{ __schema { queryType { name } types } }",
        "{ __schema { queryType } }",
        "{ __schema { mutationType } }",
        "{ __schema { queryType { name } directives } }",
    ],
)
def test_schema_bare_object_leaf_raises(spark, doc):
    from biodwh2_arcadedb_server_spark import graphql as gql

    spark.createDataFrame([(1, "a")], "node_id long, name string").createOrReplaceTempView(
        "n_Thing"
    )
    with pytest.raises(gql.GraphQLError, match="selection set"):
        gql.execute(spark, doc, relationships={})


# --- first-seen state layout version recorded (stateful.py) ------------------


def test_first_seen_state_layout_version():
    from biodwh2_arcadedb_server_spark.streaming import stateful as st_mod

    if not st_mod.HAS_TRANSFORM_WITH_STATE:  # pragma: no cover
        pytest.skip(st_mod.TWS_UNAVAILABLE_REASON)
    assert st_mod._FirstSeenProcessor.STATE_LAYOUT_VERSION == 2
