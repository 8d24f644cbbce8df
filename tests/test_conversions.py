"""Value-conversion semantics (C1–C14) — cases from the reference data-type
tests (FIXTURES F02/F03/F06/F10/F11; reference tests/test_data_types.py and
tests/test_null_value_handling.py)."""

import datetime

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.functions.conversions import convert_payload
from mysql_ch_replicator_spark.schema.ddl_parser import parse_create_table


def _payload_df(spark, rows):
    return spark.createDataFrame(
        [(list(r),) for r in rows], "payload array<string>")


def test_unsigned_extremes_f02(spark):
    st = parse_create_table("""
    CREATE TABLE numeric_limits (
      id    int unsigned NOT NULL AUTO_INCREMENT,
      test2 smallint unsigned,
      test4 tinyint unsigned,
      test6 int unsigned,
      test7 bigint unsigned,
      PRIMARY KEY (id))""")
    # binlog delivers unsigned as signed two's complement: 60000 → -5536,
    # 250 → -6, 4294967290 → -6, 18446744073709551586 → -30
    df = _payload_df(spark, [["1", "-5536", "-6", "-6", "-30"]])
    out = convert_payload(df, st).collect()[0]
    assert out.test2 == 60000
    assert out.test4 == 250
    assert out.test6 == 4294967290
    assert int(out.test7) == 18446744073709551586
    # already-positive values pass through
    df2 = _payload_df(spark, [["1", "50000", "100", "100", "12"]])
    out2 = convert_payload(df2, st).collect()[0]
    assert out2.test2 == 50000 and out2.test4 == 100 and int(out2.test7) == 12


def test_enum_semantics_f11(spark):
    st = parse_create_table("""
    CREATE TABLE enums (
      id int NOT NULL,
      status_mixed_case enum('Purchase','Sell','Transfer') NOT NULL,
      status_empty enum('Yes','No','Maybe'),
      PRIMARY KEY (id))""")
    df = _payload_df(spark, [
        ["1", "Purchase", None],   # text in → lowercased
        ["2", "2", "3"],           # index in → label (1-based)
        ["3", "0", None],          # index 0 kept as '0'
    ])
    rows = {r.id: r for r in convert_payload(df, st).collect()}
    assert rows[1].status_mixed_case == "purchase"
    assert rows[1].status_empty is None
    assert rows[2].status_mixed_case == "sell"
    assert rows[2].status_empty == "maybe"
    assert rows[3].status_mixed_case == "0"


def test_set_bitmask_f03(spark):
    st = parse_create_table("""
    CREATE TABLE t (
      id int NOT NULL,
      test4 set('1','2','3','4','5','6','7'),
      PRIMARY KEY (id))""")
    # bitmask 0b0010101 = bits 0,2,4 → '1,3,5'
    df = _payload_df(spark, [["1", "21"], ["2", "1,3,5"], ["3", None]])
    rows = {r.id: r for r in convert_payload(df, st).collect()}
    assert rows[1].test4 == "1,3,5"
    assert rows[2].test4 == "1,3,5"   # csv text passes through
    assert rows[3].test4 is None


def test_year_clamp_f06(spark):
    st = parse_create_table("""
    CREATE TABLE years (
      id int NOT NULL,
      year_field year NOT NULL,
      nullable_year year,
      PRIMARY KEY (id))""")
    df = _payload_df(spark, [
        ["1", "1901", "2000"], ["2", "2155", None],
        ["3", "1800", "2200"],  # clamped
    ])
    rows = {r.id: r for r in convert_payload(df, st).collect()}
    assert (rows[1].year_field, rows[1].nullable_year) == (1901, 2000)
    assert (rows[2].year_field, rows[2].nullable_year) == (2155, None)
    assert (rows[3].year_field, rows[3].nullable_year) == (1901, 2155)


def test_null_into_not_null_f10(spark):
    st = parse_create_table("""
    CREATE TABLE nullables (
      id int NOT NULL,
      int_val int NOT NULL,
      str_val varchar(50) NOT NULL,
      opt_int int,
      PRIMARY KEY (id))""")
    df = _payload_df(spark, [["1", None, None, None]])
    out = convert_payload(df, st).collect()[0]
    assert out.int_val == 0        # NOT NULL int → 0
    assert out.str_val == ""       # NOT NULL string → ''
    assert out.opt_int is None     # nullable stays NULL


def test_zero_date_sanitize_f09(spark):
    st = parse_create_table("""
    CREATE TABLE t (
      id int NOT NULL,
      effective_date date NOT NULL,
      created_date datetime NOT NULL,
      PRIMARY KEY (id))""")
    df = _payload_df(spark, [
        ["1", "0000-00-00", "0000-00-00 00:00:00"],
        ["2", "2023-05-01", "2023-05-01 10:30:00"],
    ])
    rows = {r.id: r for r in convert_payload(df, st).collect()}
    assert rows[1].effective_date == datetime.date(1970, 1, 1)
    assert rows[1].created_date == datetime.datetime(1970, 1, 1, 0, 0)
    assert rows[2].effective_date == datetime.date(2023, 5, 1)


def test_timestamp_timezone_f05(spark):
    st = parse_create_table("""
    CREATE TABLE timestamps_tz (
      id int NOT NULL,
      created_at timestamp NULL,
      PRIMARY KEY (id))""")
    df = _payload_df(spark, [["1", "2023-08-15 14:30:00"]])
    out = convert_payload(df, st, mysql_timezone="America/New_York") \
        .select(F.date_format(
            F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"),
                               "created_at"),
            "yyyy-MM-dd HH:mm:ss").alias("local")).collect()[0]
    # wall-clock in America/New_York must round-trip (FIXTURES F05)
    assert out.local == "2023-08-15 14:30:00"


def test_boolean_and_decimal(spark):
    st = parse_create_table("""
    CREATE TABLE t (
      id int NOT NULL,
      flag tinyint(1),
      price decimal(10,2),
      PRIMARY KEY (id))""")
    df = _payload_df(spark, [["1", "1", "123.45"], ["2", "0", None]])
    rows = {r.id: r for r in convert_payload(df, st).collect()}
    assert rows[1].flag is True and str(rows[1].price) == "123.45"
    assert rows[2].flag is False and rows[2].price is None


def test_only_primary_projection_f05(spark):
    st = parse_create_table(
        "CREATE TABLE t (id int NOT NULL, v varchar(10), PRIMARY KEY (id))")
    df = _payload_df(spark, [["7", "x"]])
    out = convert_payload(df, st, only_primary=True)
    assert out.columns == ["id"]
    assert out.collect()[0].id == 7
