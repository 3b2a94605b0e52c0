import pyarrow.parquet as pq
import pyspark.sql.types as T
import pytest

from bigquery_etl_fork_spark import datagen
from bigquery_etl_fork_spark.engine import CDCEngine
from bigquery_etl_fork_spark.lake import LakeTable
from bigquery_etl_fork_spark.schema_evolution import (
    SchemaEvolutionError,
    compat_select,
    is_write_compatible,
    merge_schemas,
)

from .oracle import assert_states_equal, replay_oracle

S = T.StructType
F_ = T.StructField


def test_merge_appends_new_fields():
    a = S([F_("x", T.IntegerType()), F_("y", T.StringType())])
    b = S([F_("x", T.IntegerType()), F_("z", T.DoubleType())])
    m = merge_schemas(a, b)
    assert [f.name for f in m.fields] == ["x", "y", "z"]


def test_merge_widens_int_to_long():
    a = S([F_("n", T.IntegerType())])
    b = S([F_("n", T.LongType())])
    assert merge_schemas(a, b)["n"].dataType == T.LongType()
    assert merge_schemas(b, a)["n"].dataType == T.LongType()


def test_merge_rejects_incompatible():
    a = S([F_("n", T.StringType())])
    b = S([F_("n", T.LongType())])
    with pytest.raises(SchemaEvolutionError):
        merge_schemas(a, b)


def test_merge_nested_array_struct():
    a = S([F_("arr", T.ArrayType(S([F_("i", T.IntegerType())])))])
    b = S([F_("arr", T.ArrayType(S([F_("i", T.LongType()), F_("s", T.StringType())])))])
    m = merge_schemas(a, b)
    elem = m["arr"].dataType.elementType
    assert elem["i"].dataType == T.LongType()
    assert "s" in elem.fieldNames()


def test_write_compat_asymmetric():
    tgt = S([F_("a", T.LongType()), F_("b", T.StringType())])
    src_missing = S([F_("a", T.IntegerType())])
    src_extra = S([F_("a", T.LongType()), F_("c", T.StringType())])
    assert is_write_compatible(src_missing, tgt)  # missing + narrower ok
    assert not is_write_compatible(src_extra, tgt)  # extra field not ok
    assert not is_write_compatible(tgt, src_missing)  # long->int narrowing not ok


def test_compat_select_nullfill_widen_reorder(spark):
    df = spark.createDataFrame([(1, "x")], S([F_("n", T.IntegerType()), F_("s", T.StringType())]))
    target = S([F_("s", T.StringType()), F_("n", T.LongType()), F_("lang", T.StringType())])
    out = compat_select(df, target)
    assert out.schema == target
    row = out.collect()[0]
    assert (row.s, row.n, row.lang) == ("x", 1, None)


def test_compat_select_array_elem_widening(spark):
    df = spark.createDataFrame(
        [([1, 2],)], S([F_("tokens", T.ArrayType(T.IntegerType()))])
    )
    target = S([F_("tokens", T.ArrayType(T.LongType()))])
    out = compat_select(df, target)
    assert out.schema["tokens"].dataType.elementType == T.LongType()
    assert list(out.collect()[0].tokens) == [1, 2]


def test_cdc_replay_with_evolution(spark, tmp_path):
    """FIXTURES.md §3: lang column added + n_tok int32→int64 mid-stream."""
    base = datagen.base_table(n_docs=200, seed=5)
    pre = datagen.change_log(n_docs=200, n_events=600, n_epochs=2, seed=6)
    post = datagen.change_log(n_docs=200, n_events=600, n_epochs=2, seed=7, evolve_at_epoch=1)
    import pyarrow as pa
    import pyarrow.compute as pc

    post = post.set_column(
        post.schema.get_field_index("epoch"),
        "epoch",
        pc.add(post["epoch"], pa.scalar(2, type=pa.int32())),
    )
    post = post.set_column(
        post.schema.get_field_index("lsn"),
        "lsn",
        pc.add(post["lsn"], pa.scalar(1000, type=pa.int64())),
    )
    d = tmp_path / "evo"
    d.mkdir()
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(pre, str(d / "pre.parquet"))
    pq.write_table(post, str(d / "post.parquet"))

    base_df = spark.read.parquet(str(d / "base.parquet"))
    t = LakeTable.create(spark, str(tmp_path / "tbl"), base_df.schema, num_buckets=4)
    t.overwrite_all(base_df, key_col="doc_id")
    eng = CDCEngine(spark, t)
    eng.replay(spark.read.parquet(str(d / "pre.parquet")))
    assert t.schema["n_tok"].dataType == T.IntegerType()
    eng.replay(spark.read.parquet(str(d / "post.parquet")))
    # table schema evolved: lang added, n_tok widened
    assert t.schema["n_tok"].dataType == T.LongType()
    assert "lang" in t.schema.fieldNames()

    full_log = pa.concat_tables(
        [
            pre.append_column("lang", pa.nulls(len(pre), pa.string())).set_column(
                pre.schema.get_field_index("n_tok"), "n_tok", pre["n_tok"].cast(pa.int64())
            ),
            post,
        ],
        promote_options="default",
    )
    expected = replay_oracle(base, full_log)
    got = t.read().toPandas()
    assert_states_equal(got[expected.columns.tolist()], expected)
