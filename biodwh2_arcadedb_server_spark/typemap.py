"""Type mapping: source property types → Spark DataTypes (A6, A7).

The reference maps biodwh2 property types to ArcadeDB types via
`Type.getTypeByClass` and converts list properties to typed Java
arrays, dispatching on the first non-null element's class with a
``toString()`` → String[] fallback
(`/root/reference/src/.../ArcadeDBService.java:166-176,196-223`).

Here the same WHAT becomes: a declarative dict of type names →
``pyspark.sql.types`` instances, ``ArrayType(element)`` for lists,
``ArrayType(StringType)`` when the component type is unknown, and a
``try_cast``-style permissive cast for bad records (A9) instead of
per-row exception handling — order-independent and fully columnar
(the reference's first-non-null dispatch is order-dependent; we
standardize on declared schemas, a documented divergence, SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The 8 primitive component types the reference's array converter
# enumerates (ArcadeDBService.java:196-223), plus the String fallback.
PRIMITIVE_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
}

# Extended types our engine supports beyond the reference's ETL output
# (the reference's *dependency* supports these; SURVEY.md §1.2).
EXTENDED_TYPES: dict[str, T.DataType] = {
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "decimal": T.DecimalType(38, 18),
    "binary": T.BinaryType(),
}


def resolve_type(name: str) -> T.DataType:
    """Map a source type name to a Spark DataType.

    ``list<X>`` → ArrayType(X); unknown names (and ``list`` with no
    component) fall back to String, mirroring the reference's
    unknown-component → String[] fallback (ArcadeDBService.java:172-175).
    """
    n = name.strip().lower()
    if n.startswith("list<") and n.endswith(">"):
        return T.ArrayType(resolve_type(n[5:-1]))
    if n == "list" or n == "array":
        return T.ArrayType(T.StringType())
    if n in PRIMITIVE_TYPES:
        return PRIMITIVE_TYPES[n]
    if n in EXTENDED_TYPES:
        return EXTENDED_TYPES[n]
    return T.StringType()


def permissive_cast(col: Column, dtype: T.DataType) -> Column:
    """A9 'setPropertySafe' analog: cast that yields NULL instead of
    failing the job on a bad record (`try_cast` semantics). For arrays
    the element cast is applied via ``transform`` (JVM-side)."""
    if isinstance(dtype, T.ArrayType):
        elem = dtype.elementType
        return F.transform(col, lambda x: x.try_cast(elem))
    return col.try_cast(dtype)


IGNORED_FIELDS = ("__id", "__label", "__from_id", "__to_id")
"""Internal bookkeeping fields excluded from user schemas (A5); the
reference filters these via Node/Edge.IGNORED_FIELDS
(ArcadeDBService.java:153,180,237,246)."""
