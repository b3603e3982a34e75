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
