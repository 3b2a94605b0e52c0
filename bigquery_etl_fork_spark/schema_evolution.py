"""Schema algebra: merge, write-compatibility, and compat-select generation.

Re-expresses the reference's schema subsystem on Spark ``StructType``:

- ``merge_schemas``       ≈ ``Schema.merge`` / ``_traverse``
  (reference ``bigquery_etl/schema/__init__.py:101-278``): recursive field
  union, new fields appended, numeric widening allowed, conflicts raise.
- ``is_write_compatible`` ≈ ``Schema.compatible``
  (``schema/__init__.py:139-167``): asymmetric — the source may be missing
  fields the target has, never the reverse (unless evolution is applied).
- ``compat_select``       ≈ ``generate_compatible_select_expression``
  (``schema/__init__.py:303-440``): a column-level projection coercing a
  source DataFrame to a target schema — missing fields become
  ``CAST(NULL AS type)``, arrays-of-structs are rebuilt with ``transform``.
  Always column-vectorized; never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Widening lattice: src type -> set of wider types it may be promoted to.
# int32→int64 is the north-rule case; the rest mirror BigQuery's
# ALLOW_FIELD_RELAXATION semantics (safe numeric/date promotions).
_WIDENINGS: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType, T.DoubleType, T.DecimalType),
    T.ShortType: (T.IntegerType, T.LongType, T.DoubleType, T.DecimalType),
    T.IntegerType: (T.LongType, T.DoubleType, T.DecimalType),
    T.LongType: (T.DoubleType, T.DecimalType),
    T.FloatType: (T.DoubleType,),
    T.DateType: (T.TimestampType,),
}


class SchemaEvolutionError(ValueError):
    """Incompatible schema change (type narrowing, struct/scalar conflict)."""


def can_widen(src: T.DataType, dst: T.DataType) -> bool:
    """True if src may be losslessly promoted to dst. NullType (a column
    that is entirely NULL — e.g. payload fields of an all-delete epoch) is
    the bottom type: compatible with everything."""
    if src == dst or isinstance(src, T.NullType):
        return True
    allowed = _WIDENINGS.get(type(src), ())
    return isinstance(dst, allowed)


def _merge_types(src: T.DataType, dst: T.DataType, path: str) -> T.DataType:
    if src == dst:
        return dst
    if isinstance(src, T.NullType):
        return dst
    if isinstance(dst, T.NullType):
        return src
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        return merge_schemas(dst, src, _path=path)
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        elem = _merge_types(src.elementType, dst.elementType, path + "[]")
        return T.ArrayType(elem, src.containsNull or dst.containsNull)
    if isinstance(src, T.MapType) and isinstance(dst, T.MapType):
        return T.MapType(
            _merge_types(src.keyType, dst.keyType, path + ".key"),
            _merge_types(src.valueType, dst.valueType, path + ".value"),
            src.valueContainsNull or dst.valueContainsNull,
        )
    if can_widen(dst, src):  # incoming data is wider -> evolve target up
        return src
    if can_widen(src, dst):  # target already wider -> keep
        return dst
    raise SchemaEvolutionError(
        f"incompatible type change at {path!r}: {dst.simpleString()} -> {src.simpleString()}"
    )


def merge_schemas(target: T.StructType, source: T.StructType, _path: str = "") -> T.StructType:
    """Union of target and source schemas; target field order kept, new
    source fields appended (reference ``schema/__init__.py:266-273``)."""
    out: list[T.StructField] = []
    src_by_name = {f.name.lower(): f for f in source.fields}
    for f in target.fields:
        s = src_by_name.pop(f.name.lower(), None)
        if s is None:
            out.append(f)
        else:
            out.append(
                T.StructField(
                    f.name,
                    _merge_types(s.dataType, f.dataType, f"{_path}.{f.name}"),
                    f.nullable or s.nullable,
                )
            )
    for f in source.fields:  # preserve source ordering for appended fields
        if f.name.lower() in src_by_name:
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)


def is_write_compatible(source: T.StructType, target: T.StructType) -> bool:
    """Asymmetric write-compat: every source field must exist in target with
    an equal-or-wider type; source may omit target fields."""
    tgt = {f.name.lower(): f for f in target.fields}
    for f in source.fields:
        t = tgt.get(f.name.lower())
        if t is None:
            return False
        if isinstance(f.dataType, T.StructType) and isinstance(t.dataType, T.StructType):
            if not is_write_compatible(f.dataType, t.dataType):
                return False
        elif isinstance(f.dataType, T.ArrayType) and isinstance(t.dataType, T.ArrayType):
            if isinstance(f.dataType.elementType, T.StructType):
                if not isinstance(t.dataType.elementType, T.StructType):
                    return False
                if not is_write_compatible(f.dataType.elementType, t.dataType.elementType):
                    return False
            elif not can_widen(f.dataType.elementType, t.dataType.elementType):
                return False
        elif not can_widen(f.dataType, t.dataType):
            return False
    return True


def _coerce_col(col: F.Column, src: T.DataType | None, dst: T.DataType) -> F.Column:
    """Column expression coercing src-typed col to dst (vectorized)."""
    if src is None:
        return F.lit(None).cast(dst)
    if src == dst:
        return col
    if isinstance(dst, T.StructType) and isinstance(src, T.StructType):
        src_by = {f.name.lower(): f for f in src.fields}
        parts = []
        for f in dst.fields:
            sf = src_by.get(f.name.lower())
            inner = col.getField(sf.name) if sf is not None else None
            parts.append(_coerce_col(inner, sf.dataType if sf else None, f.dataType).alias(f.name))
        return F.when(col.isNotNull(), F.struct(*parts))
    if isinstance(dst, T.ArrayType) and isinstance(src, T.ArrayType):
        if src.elementType == dst.elementType:
            return col
        # rebuild via transform — the ARRAY(SELECT STRUCT(...) FROM UNNEST)
        # analog (reference schema/__init__.py:398-413)
        return F.transform(col, lambda x: _coerce_col(x, src.elementType, dst.elementType))
    return col.cast(dst)


def compat_select(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df onto target schema: reorder, null-fill missing columns,
    widen types. Pure Catalyst expressions (Arrow/codegen vectorized)."""
    src_by = {f.name.lower(): f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        sf = src_by.get(f.name.lower())
        base = F.col(sf.name) if sf is not None else None
        cols.append(_coerce_col(base, sf.dataType if sf else None, f.dataType).alias(f.name))
    return df.select(*cols)
