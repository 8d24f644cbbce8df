import pytest
from pyspark.sql import types as T

from mysql_ch_replicator_spark.schema.ddl_parser import parse_create_table
from mysql_ch_replicator_spark.schema.table_structure import TableField
from mysql_ch_replicator_spark.schema.type_mapping import (
    spark_type_for, to_struct_type,
)


def f(base, params="", unsigned=False, nullable=True):
    return TableField(name="c", base_type=base, params=params,
                      unsigned=unsigned, nullable=nullable)


@pytest.mark.parametrize("field,expected", [
    (f("int"), T.IntegerType()),
    (f("int", unsigned=True), T.LongType()),
    (f("bigint"), T.LongType()),
    (f("bigint", unsigned=True), T.DecimalType(20, 0)),
    (f("smallint"), T.ShortType()),
    (f("smallint", unsigned=True), T.IntegerType()),
    (f("tinyint"), T.ByteType()),
    (f("tinyint", unsigned=True), T.ShortType()),
    (f("tinyint", params="1"), T.BooleanType()),
    (f("bit", params="1"), T.BooleanType()),
    (f("mediumint"), T.IntegerType()),
    (f("float"), T.FloatType()),
    (f("double"), T.DoubleType()),
    (f("real"), T.DoubleType()),
    (f("decimal", params="10,2"), T.DecimalType(10, 2)),
    (f("numeric", params="5, 2"), T.DecimalType(5, 2)),
    (f("date"), T.DateType()),
    (f("datetime"), T.TimestampNTZType()),
    (f("datetime", params="3"), T.TimestampNTZType()),
    (f("timestamp"), T.TimestampType()),
    (f("time"), T.StringType()),
    (f("year"), T.ShortType()),
    (f("char", params="36"), T.StringType()),
    (f("varchar", params="255"), T.StringType()),
    (f("longtext"), T.StringType()),
    (f("enum", params="'a','b'"), T.StringType()),
    (f("set", params="'a','b'"), T.StringType()),
    (f("json"), T.StringType()),
    (f("binary", params="16"), T.BinaryType()),
    (f("blob"), T.BinaryType()),
    (f("bit", params="5"), T.LongType()),
])
def test_type_matrix(field, expected):
    assert spark_type_for(field) == expected


def test_point_polygon_types():
    assert spark_type_for(f("point")).simpleString() == \
        "struct<x:double,y:double>"
    assert spark_type_for(f("polygon")).simpleString() == \
        "array<struct<x:double,y:double>>"
    assert spark_type_for(f("multipolygon")).simpleString() == \
        "array<array<struct<x:double,y:double>>>"


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        spark_type_for(f("whatisthis"))


def test_types_mapping_override():
    # reference config: char(36) → UUID (converter.py:387–389)
    assert spark_type_for(f("char", params="36"),
                          {"char(36)": "uuid"}) == T.StringType()


def test_struct_type_includes_version_f01():
    st = parse_create_table(
        "CREATE TABLE users (id int NOT NULL, name varchar(255), age int, "
        "PRIMARY KEY (id))")
    spark_schema = to_struct_type(st)
    assert spark_schema.simpleString() == \
        "struct<id:int,name:string,age:int,_version:bigint>"
    assert spark_schema["id"].nullable is False
    assert spark_schema["name"].nullable is True
    assert spark_schema["_version"].nullable is False
