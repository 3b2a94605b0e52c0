"""Scalar/aggregate "UDF" library as zero-cost Column builders.

The reference ships ~300 SQL UDFs that are all expression macros
(``CREATE OR REPLACE FUNCTION … AS (expr)``, e.g. ``sql/mozfun/*/*/udf.sql``).
On Spark the same surface is plain Python functions returning ``Column`` —
compiled into the Catalyst plan, fully codegen'd, zero runtime cost.

Cited per function: the reference UDF whose semantics it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------- bits28 activity calculus ----------------
# reference: sql/moz-fx-data-shared-prod/udf/shift_28_bits_one_day/udf.sql:5-7,
# udf/combine_adjacent_days_28_bits/udf.sql:9-11,
# sql/mozfun/bits28/days_since_seen/udf.sql:14-16


def shift_28_bits_one_day(bits: Column) -> Column:
    """(bits << 1) & 0x0FFFFFFF — drop the oldest day, make room for today."""
    return F.shiftleft(bits, 1).bitwiseAND(F.lit((1 << 28) - 1))


def combine_adjacent_days_28_bits(prev: Column, curr: Column) -> Column:
    """Daily fold: shift yesterday's bitmap and OR in today's bit 0."""
    return shift_28_bits_one_day(prev).bitwiseOR(F.coalesce(curr, F.lit(0)))


def days_since_seen(bits: Column) -> Column:
    """Position of the rightmost set bit: LOG2(bits & -bits); null if 0."""
    return F.when(bits > 0, F.log2(bits.bitwiseAND(-bits)).cast("int"))


def bits_from_offset(offset: Column) -> Column:
    """BIT_OR-ready one-hot: 1 << day_offset
    (reference baseline_clients_daily_v1.query.sql:146-151).

    ``F.shiftleft`` takes a Python-int shift amount, so the column-shift is
    expressed as an exact power of two (exact in double up to 2^53).
    """
    return F.pow(F.lit(2.0), offset.cast("int")).cast("long")


def active_n_weeks_ago(bits: Column, n: int) -> Column:
    """bits28.active_in_range(bits, -7*(n+1)+1, 7) analog."""
    week = bits.bitwiseAND(F.lit(((1 << 7) - 1) << (7 * n)))
    return week > 0


# ---------------- stats ----------------


def mode_last(values: Column) -> Column:
    """Most frequent element of an array; ties broken by LATEST position.

    Semantics of ``sql/mozfun/stats/mode_last/udf.sql:10-24`` (GROUP BY value
    ORDER BY COUNT(*) DESC, MAX(offset) DESC LIMIT 1), as a pure expression:
    aggregate over the distinct values, scoring (count, last_index).
    """
    distinct = F.array_distinct(values)
    scored = F.transform(
        distinct,
        lambda v: F.struct(
            F.size(F.filter(values, lambda x: x.eqNullSafe(v))).alias("cnt"),
            F.array_position(F.reverse(values), v).alias("rev_pos"),
            v.alias("val"),
        ),
    )
    # max by (cnt asc? no: max struct = max cnt, then min rev_pos means latest)
    # rev_pos is 1-based position in reversed array: smaller = later original
    # position, so invert it for max-compare.
    rescored = F.transform(
        scored,
        lambda s: F.struct(
            s["cnt"].alias("cnt"), (-s["rev_pos"]).alias("neg_rev"), s["val"].alias("val")
        ),
    )
    return F.array_max(rescored)["val"]


def safe_divide(num: Column, den: Column) -> Column:
    """SAFE_DIVIDE: null on zero denominator (reference udf/safe_divide)."""
    return F.try_divide(num, den)


# ---------------- map-as-array-of-struct (mozfun map.*) ----------------
# reference convention: maps are ARRAY<STRUCT<key, value>>
# (sql/mozfun/map/sum/udf.sql:1-12)


def map_get_key(m: Column, k: Column | str) -> Column:
    """map.get_key: value of the entry with the given key."""
    kcol = F.lit(k) if isinstance(k, str) else k
    hit = F.filter(m, lambda e: e["key"] == kcol)
    return F.element_at(hit, 1)["value"]


def map_from_lists(keys: Column, vals: Column) -> Column:
    """map.from_lists: zip two arrays into ARRAY<STRUCT<key,value>>."""
    return F.zip_with(keys, vals, lambda k, v: F.struct(k.alias("key"), v.alias("value")))


def map_mode_last(entries: Column) -> Column:
    """map.mode_last: per-key mode_last over concatenated map entries.

    Reference ``sql/mozfun/map/mode_last/udf.sql:7-17``: given an
    ARRAY<STRUCT<key,value>> (typically ARRAY_CONCAT_AGG of many maps),
    return one entry per distinct key whose value is the most frequent value
    for that key, ties broken by latest position — ``stats.mode_last``
    applied per key. Pure higher-order functions, zero runtime cost."""
    keys = F.array_distinct(F.transform(entries, lambda e: e["key"]))
    return F.transform(
        keys,
        lambda k: F.struct(
            k.alias("key"),
            mode_last(
                F.transform(
                    F.filter(entries, lambda e: e["key"].eqNullSafe(k)),
                    lambda e: e["value"],
                )
            ).alias("value"),
        ),
    )


def extract_keyed_scalar_sum(entries: Column) -> Column:
    """Per-key sum over concatenated keyed-scalar map entries.

    Reference ``sql/moz-fx-data-shared-prod/udf/aggregate_search_map`` (the
    keyed-scalar/search-count aggregation): given ARRAY<STRUCT<key,value>>
    entries pooled across rows, return one entry per distinct key with the
    summed value (nulls count as 0)."""
    keys = F.array_distinct(F.transform(entries, lambda e: e["key"]))
    return F.transform(
        keys,
        lambda k: F.struct(
            k.alias("key"),
            F.aggregate(
                F.filter(entries, lambda e: e["key"].eqNullSafe(k)),
                F.lit(0).cast("long"),
                lambda acc, e: acc + F.coalesce(e["value"].cast("long"), F.lit(0)),
            ).alias("value"),
        ),
    )


# ---------------- array utilities (reference udf/array_*) ----------------


def array_drop_first_and_append(arr: Column, elem: Column) -> Column:
    """12-month rolling array update (udf/array_drop_first_and_append)."""
    return F.concat(F.slice(arr, 2, F.size(arr) - 1), F.array(elem))


def array_slice(arr: Column, start: int, length: int) -> Column:
    return F.slice(arr, start, length)


def dedupe_array(arr: Column) -> Column:
    return F.array_distinct(arr)


def event_code_points_to_string(code_points: Column) -> Column:
    """Pack an array of Unicode code points into a string — the events_daily
    sequence encoding (reference sql/moz-fx-data-shared-prod/udf/
    event_code_points_to_string/udf.sql). Full Unicode, pure expressions:
    ``F.char`` would truncate to chr(n % 256), so each code point is encoded
    as UTF-16BE hex (surrogate pairs above U+FFFF) and the concatenation is
    unhex'd + decoded JVM-side — round-trips with ``string_to_code_points``
    for the whole code space."""

    def cp_hex(cp: Column) -> Column:
        cp = cp.cast("long")
        over = cp - F.lit(0x10000)
        hi = F.shiftright(over, 10) + F.lit(0xD800)
        lo = over.bitwiseAND(F.lit(0x3FF)) + F.lit(0xDC00)
        return F.when(cp < 0x10000, F.lpad(F.hex(cp), 4, "0")).otherwise(
            F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))
        )

    packed = F.array_join(F.transform(code_points, cp_hex), "")
    return F.decode(F.unhex(packed), "UTF-16BE")


def string_to_code_points(s: Column) -> Column:
    """Inverse: string -> array of code points (reference udf/
    event_code_points_from_string analog)."""
    return F.transform(F.split(s, ""), lambda ch: F.ascii(ch))


# ---------------- sampling / bucketing ----------------


def sample_id(key: Column, buckets: int = 100) -> Column:
    """Stable 0..buckets-1 hash of a key — the udf_js/sample_id analog
    (CRC32-based there; xxhash64 here, same distributional role)."""
    return F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int")


def stratified_keep(key: Column, group: Column, fractions: dict, default: float = 1.0) -> Column:
    """Deterministic per-group sampling predicate: keep a stable
    ``fractions[group]`` share of keys in each group (down-sample
    over-represented sources, keep the rest whole — the standard corpus
    re-balancing move). Membership is content-addressed via
    ``md5_uniform32``: adding rows never flips existing keys, and the
    integer thresholds make the predicate exactly reproducible in SQL."""
    expr = F.lit(int(default * 2**32))
    for g, frac in sorted(fractions.items()):
        expr = F.when(group == g, F.lit(int(frac * 2**32))).otherwise(expr)
    return md5_uniform32(key) < expr


def md5_uniform32(key: Column) -> Column:
    """Uniform value in [0, 2^32) from the first 8 md5-hex chars of the key
    — the CROSS-ENGINE-reproducible sibling of ``sample_id`` (md5 is
    identical everywhere; xxhash64 is JVM-only). Use for deterministic
    splits/sampling that must survive an engine change or be auditable in
    SQL: ``md5_uniform32(k) < int(frac * 2**32)`` selects a stable
    fraction with pure integer comparison (no double thresholds)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
