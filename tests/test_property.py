"""Property-based tests (SURVEY.md §5): random typed property bags
round-trip through the ingest path unchanged (mirrors the reference's
per-property tolerance, setPropertySafe), and the type-mapping surface
is total over arbitrary type names."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from biodwh2_arcadedb_server_spark.typemap import resolve_type

# one property value per supported primitive (A6/A7's 8 types)
SCALARS = {
    "string": st.text(max_size=40),
    "boolean": st.booleans(),
    "integer": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "double": st.floats(allow_infinity=False, width=64),
}


def _row_strategy():
    return st.fixed_dictionaries(
        {
            "s": st.one_of(st.none(), SCALARS["string"]),
            "b": st.one_of(st.none(), SCALARS["boolean"]),
            "i": st.one_of(st.none(), SCALARS["integer"]),
            "l": st.one_of(st.none(), SCALARS["long"]),
            "d": st.one_of(st.none(), SCALARS["double"]),
            "arr_s": st.one_of(st.none(), st.lists(SCALARS["string"], max_size=5)),
            "arr_l": st.one_of(st.none(), st.lists(SCALARS["long"], max_size=5)),
        }
    )


SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("l", T.LongType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("arr_s", T.ArrayType(T.StringType())),
        T.StructField("arr_l", T.ArrayType(T.LongType())),
    ]
)


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row_strategy(), min_size=1, max_size=8))
def test_property_bag_roundtrip(spark, tmp_path_factory, rows):
    """Arbitrary typed property bags survive write->read unchanged
    (nulls preserved as nulls — the relational analog of the
    reference's dropped-null semantics)."""
    path = str(tmp_path_factory.mktemp("prop") / "t.parquet")
    df = spark.createDataFrame([tuple(r[k] for k in SCHEMA.fieldNames()) for r in rows], SCHEMA)
    df.write.mode("overwrite").parquet(path)
    got = [r.asDict(recursive=True) for r in spark.read.schema(SCHEMA).parquet(path).collect()]

    def key(r):
        return str(sorted((k, str(v)) for k, v in r.items()))

    got_sorted = sorted(got, key=key)
    want_sorted = sorted(rows, key=key)
    assert len(got_sorted) == len(want_sorted)
    for g, w in zip(got_sorted, want_sorted):
        for k in SCHEMA.fieldNames():
            assert _eq(g[k], w[k]), (k, g[k], w[k])


@given(name=st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_resolve_type_total(name):
    """resolve_type never raises and always returns a DataType — the
    unknown->String fallback is total (A6 semantics)."""
    dt = resolve_type(name)
    assert isinstance(dt, T.DataType)


@given(
    inner=st.sampled_from(["string", "integer", "long", "double", "boolean", "nonsense"]),
    depth=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=50, deadline=None)
def test_resolve_type_nested_lists(inner, depth):
    name = inner
    for _ in range(depth):
        name = f"list<{name}>"
    dt = resolve_type(name)
    for _ in range(depth):
        assert isinstance(dt, T.ArrayType)
        dt = dt.elementType
    assert isinstance(dt, T.DataType)


def test_jaccard_operator_matches_python_sets(spark):
    """Exact n-gram Jaccard operator vs a pure-python set computation
    on adversarial doc shapes (short docs, full dups, disjoint)."""
    from biodwh2_arcadedb_server_spark.operators.dedup import ngram_jaccard_pairs

    docs = [
        (0, "a b c d e f"),
        (1, "a b c d e f"),          # identical to 0
        (2, "a b c d e g"),          # near dup of 0
        (3, "x y z w q r"),          # disjoint
        (4, "a b c"),                # single shingle
        (5, "a b c"),                # dup of 4
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.jaccard for r in
           ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.3).collect()}

    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1 :]:
            A, B = sh(ta), sh(tb)
            j = len(A & B) / len(A | B)
            if j >= 0.3:
                want[(ia, ib)] = round(j, 4)
    assert got == pytest.approx(want)