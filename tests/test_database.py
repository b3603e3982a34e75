"""Database tests (mirrors ref tests/test_duckdb/test_database.py)."""

from typing import Optional

import pytest

import patito_spark as pt


@pytest.fixture()
def db(spark):
    return pt.Database(spark)


def test_query(db):
    rel = db.query("select 1 as a union all select 2 as a")
    assert rel.count() == 2


def test_to_relation_from_sql(db):
    rel = db.to_relation("select 1 as a, 'x' as b")
    assert rel.columns == ["a", "b"]


def test_empty_relation(db):
    class M(pt.Model):
        a: int
        b: Optional[str] = None

    rel = db.empty_relation(M)
    assert rel.count() == 0
    assert rel.columns == ["a", "b"]
    assert rel.model is M


def test_create_table_and_contains(db, spark):
    class M(pt.Model):
        a: int

    assert "test_tbl_x" not in db
    db.create_table("test_tbl_x", model=M)
    assert "test_tbl_x" in db
    assert db.table("test_tbl_x").count() == 0


def test_insert_into(db, spark):
    class M(pt.Model):
        a: int

    db.create_table("test_tbl_ins", model=M)
    data = db.to_relation(spark.createDataFrame([(1,), (2,)], "a long"))
    data.insert_into("test_tbl_ins")
    assert db.table("test_tbl_ins").count() == 2
    data.insert_into("test_tbl_ins")
    assert db.table("test_tbl_ins").count() == 4
    with pytest.raises(KeyError):
        data.insert_into("never_created")


def test_create_view(db, spark):
    rel = db.to_relation(spark.createDataFrame([(1,)], "a long"))
    db.create_view("test_view_x", rel)
    assert db.view("test_view_x").count() == 1


def test_relation_create_table(db, spark):
    rel = db.to_relation(spark.createDataFrame([(5,)], "a long"))
    rel.create_table("test_tbl_from_rel")
    assert "test_tbl_from_rel" in db
    assert db.table("test_tbl_from_rel").count() == 1


def test_default_database_shared():
    assert pt.Database.default() is pt.Database.default()


def test_from_connection(spark):
    db = pt.Database.from_connection(spark)
    assert db.spark is spark
    assert db.query("select 1 as a").count() == 1


# --- model inference (ref duckdb.py:101-110 create_pydantic_model) ------- #


def test_infer_model_annotations(spark, db):
    rel = db.to_relation(
        spark.createDataFrame(
            [(1, "a", 2.5, None)],
            "k long, s string, v double, maybe string",
        )
    ).set_alias("inferred_products")
    model = rel.infer_model()
    assert model.__name__ == "inferred_products"
    assert model.columns == ["k", "s", "v", "maybe"]
    assert model.dtypes["k"].simpleString() == "bigint"
    assert model.dtypes["s"].simpleString() == "string"
    assert model.dtypes["v"].simpleString() == "double"
    assert model.nullable_columns == {"k", "s", "v", "maybe"}


def test_infer_model_round_trips_validation(spark, db):
    """An inferred model must validate the relation it came from."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int not null, name string"
    )
    rel = db.to_relation(df)
    model = rel.infer_model()
    # IntegerType (not the int-default LongType) must round-trip via the
    # dtype override.
    model.validate_df(df)
    assert model.dtypes["id"].simpleString() == "int"


def test_infer_model_nested_types(spark, db):
    df = spark.createDataFrame(
        [([1, 2], {"k": 1.0})],
        "arr array<bigint>, m map<string, double>",
    )
    model = db.to_relation(df).infer_model()
    model.validate_df(df)


def test_get_on_untyped_relation_uses_inferred_model(spark, db):
    """get() on a model-less relation returns typed inferred-model rows."""
    rel = db.to_relation(
        spark.createDataFrame([(1, "a"), (2, "b")], "column_1 long, column_2 string")
    )
    row = rel.get(column_1=1)
    assert row.column_1 == 1
    assert row.column_2 == "a"
    from typing import Optional

    assert type(row).model_fields["column_1"].annotation == Optional[int]
    assert "column_1" in type(row).columns


class TestCreateEnumTypes:
    def test_creates_domain_views_with_reference_names(self, spark):
        import hashlib
        from typing import Literal, Optional

        import patito_spark as pt

        class EnumModel(pt.Model):
            zone: Literal["dry", "cold", "frozen"]
            other: Optional[int] = None

        db = pt.Database(spark)
        db.create_enum_types(EnumModel)
        joined = ", ".join(repr(v) for v in sorted(["dry", "cold", "frozen"]))
        expected = f"enum__{hashlib.md5(joined.encode()).hexdigest()}"
        assert db.enum_types == {expected}
        vals = {r["value"] for r in spark.table(expected).collect()}
        assert vals == {"dry", "cold", "frozen"}

    def test_same_values_same_name_and_idempotent(self, spark):
        from typing import Literal

        import patito_spark as pt

        class A(pt.Model):
            c: Literal["x", "y"]

        class B(pt.Model):
            d: Literal["y", "x"]  # same value set, different order

        db = pt.Database(spark)
        db.create_enum_types(A)
        db.create_enum_types(B)
        db.create_enum_types(A)
        assert len(db.enum_types) == 1

    def test_domain_check_via_anti_join(self, spark):
        """The views serve the enum-type role: domain violations surface
        with one anti join against the enum view."""
        from typing import Literal

        import patito_spark as pt
        from pyspark.sql import functions as F

        class M(pt.Model):
            zone: Literal["a", "b"]

        db = pt.Database(spark)
        db.create_enum_types(M)
        (name,) = db.enum_types
        data = spark.createDataFrame([("a",), ("zzz",)], "zone string")
        bad = data.join(
            spark.table(name), data["zone"] == F.col("value"), "left_anti"
        )
        assert [r["zone"] for r in bad.collect()] == ["zzz"]

    def test_create_table_registers_enum_views(self, spark):
        from typing import Literal

        import patito_spark as pt

        class M(pt.Model):
            k: int
            zone: Literal["a", "b"]

        db = pt.Database(spark)
        db.create_table("enum_backed", model=M)
        assert len(db.enum_types) == 1
        (name,) = db.enum_types
        assert {r["value"] for r in spark.table(name).collect()} == {"a", "b"}
