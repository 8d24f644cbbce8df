"""DDL parser unit tests — cases modeled on the reference suite
(tests/test_mysql_ch_replicator.py:413–456, 533–569; FIXTURES.md F01–F13)."""

import pytest

from mysql_ch_replicator_spark.schema.ddl_parser import (
    db_name_from_query,
    parse_alter_table,
    parse_create_table,
    parse_drop_table,
    parse_rename_table,
    parse_truncate_table,
    split_top_level,
    strip_sql_comments,
    strip_column_comments,
)


def test_create_basic_f01():
    st = parse_create_table("""
    CREATE TABLE users (
      id   int NOT NULL AUTO_INCREMENT,
      name varchar(255),
      age  int,
      PRIMARY KEY (id)
    );""")
    assert st.table_name == "users"
    assert st.field_names == ["id", "name", "age"]
    assert st.primary_keys == ["id"]
    assert not st.field("id").nullable
    assert st.field("name").base_type == "varchar"
    assert st.field("name").params == "255"
    assert st.field("age").nullable


def test_create_composite_pk_f08():
    st = parse_create_table("""
    CREATE TABLE composite_pk (
      departments int NOT NULL,
      termine     int NOT NULL,
      PRIMARY KEY (departments, termine)
    )""")
    assert st.primary_keys == ["departments", "termine"]


def test_create_column_level_pk_and_unsigned():
    st = parse_create_table(
        "CREATE TABLE t (uid bigint unsigned PRIMARY KEY, v decimal(10,2))")
    assert st.primary_keys == ["uid"]
    assert st.field("uid").unsigned
    assert st.field("v").params == "10,2"


def test_create_pk_fallback_to_id():
    st = parse_create_table("CREATE TABLE t (id int, v text)")
    assert st.primary_keys == ["id"]


def test_create_no_pk_raises():
    with pytest.raises(ValueError):
        parse_create_table("CREATE TABLE t (a int, b int)")


def test_create_skips_keys_constraints_f09():
    st = parse_create_table("""
    CREATE TABLE t (
      `id` int unsigned NOT NULL AUTO_INCREMENT,
      `note` text CHARACTER SET utf8mb3 NOT NULL,
      `effective_date` date NOT NULL DEFAULT '0000-00-00',
      PRIMARY KEY (`id`),
      KEY `idx_note` (`note`(10)),
      UNIQUE KEY uq (effective_date),
      CONSTRAINT fk FOREIGN KEY (id) REFERENCES o(id),
      FULLTEXT KEY ft (note),
      SPATIAL KEY sp (note)
    ) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4""")
    assert st.field_names == ["id", "note", "effective_date"]
    assert st.field("note").charset == "utf8mb3"
    assert st.field("effective_date").default == "0000-00-00"
    assert st.charset == "utf8mb4"


def test_create_enum_set_f03():
    st = parse_create_table("""
    CREATE TABLE exotic (
      id int unsigned NOT NULL AUTO_INCREMENT,
      test4 set('1','2','3','4','5','6','7'),
      test7 enum('point','qwe','def','azaza kokoko'),
      PRIMARY KEY (id))""")
    assert st.field("test4").enum_values() == ["1", "2", "3", "4", "5", "6", "7"]
    assert st.field("test7").enum_values() == ["point", "qwe", "def",
                                               "azaza kokoko"]


def test_create_comment_with_quotes_f08():
    st = parse_create_table("""
    CREATE TABLE t (
      id int NOT NULL COMMENT 'the "id", don''t break',
      v varchar(10) COMMENT 'x',
      PRIMARY KEY (id))""")
    assert st.field_names == ["id", "v"]


def test_create_if_not_exists_and_db_qualified():
    st = parse_create_table(
        "CREATE TABLE IF NOT EXISTS mydb.`users2` (id int, PRIMARY KEY (id))")
    assert st.table_name == "users2"


def test_create_like():
    st = parse_create_table("CREATE TABLE users3 LIKE users2")
    assert st.table_name == "users3"
    assert st.like_table == "users2"


# --- ALTER (FIXTURES F13 script) -------------------------------------------

def test_alter_add_simple():
    t, ops = parse_alter_table("ALTER TABLE users ADD last_name varchar(255)")
    assert t == "users"
    assert ops == [{"op": "add_column", "field": ops[0]["field"],
                    "first": False, "after": None}]
    assert ops[0]["field"].name == "last_name"
    assert ops[0]["field"].base_type == "varchar"


def test_alter_add_default_null():
    _, ops = parse_alter_table(
        "ALTER TABLE users ADD price decimal(10,2) DEFAULT NULL")
    f = ops[0]["field"]
    assert f.base_type == "decimal" and f.params == "10,2"


def test_alter_add_index_ignored():
    _, ops = parse_alter_table(
        "ALTER TABLE users ADD UNIQUE INDEX prise_idx (price)")
    assert ops == []


def test_alter_add_after():
    _, ops = parse_alter_table(
        "ALTER TABLE users ADD COLUMN country varchar(25) DEFAULT '' "
        "NOT NULL AFTER name")
    assert ops[0]["after"] == "name"
    assert not ops[0]["field"].nullable
    assert ops[0]["field"].default == ""


def test_alter_add_first():
    _, ops = parse_alter_table("ALTER TABLE t ADD c0 int FIRST")
    assert ops[0]["first"] is True


def test_alter_change():
    _, ops = parse_alter_table(
        "ALTER TABLE users CHANGE COLUMN country origin varchar(24) "
        "DEFAULT '' NOT NULL")
    assert ops[0]["op"] == "change_column"
    assert ops[0]["old_name"] == "country"
    assert ops[0]["field"].name == "origin"
    assert ops[0]["field"].params == "24"


def test_alter_drop():
    _, ops = parse_alter_table("ALTER TABLE users DROP COLUMN country")
    assert ops == [{"op": "drop_column", "name": "country"}]


def test_alter_modify():
    _, ops = parse_alter_table(
        "ALTER TABLE users MODIFY last_name varchar(1024) NOT NULL")
    assert ops[0]["op"] == "modify_column"
    assert ops[0]["field"].name == "last_name"
    assert not ops[0]["field"].nullable


def test_alter_multi_op():
    _, ops = parse_alter_table(
        "ALTER TABLE users ADD last_name2 varchar(255), "
        "ADD COLUMN city varchar(255)")
    assert [o["op"] for o in ops] == ["add_column", "add_column"]
    assert [o["field"].name for o in ops] == ["last_name2", "city"]


def test_alter_multi_drop():
    _, ops = parse_alter_table(
        "ALTER TABLE users DROP COLUMN last_name2, DROP COLUMN city")
    assert [o["name"] for o in ops] == ["last_name2", "city"]


def test_alter_rename_column():
    _, ops = parse_alter_table("ALTER TABLE t RENAME COLUMN a TO b")
    assert ops == [{"op": "rename_column", "old_name": "a", "new_name": "b"}]


def test_alter_rename_table():
    _, ops = parse_alter_table("ALTER TABLE t RENAME TO t2")
    assert ops == [{"op": "rename_table", "new_name": "t2"}]


def test_alter_numeric_params_with_space():
    _, ops = parse_alter_table("ALTER TABLE t ADD v NUMERIC(5, 2) NULL")
    f = ops[0]["field"]
    assert f.base_type == "numeric"
    assert f.params.replace(" ", "") == "5,2"


def test_alter_int_unsigned():
    _, ops = parse_alter_table("ALTER TABLE t MODIFY c INT UNSIGNED NOT NULL")
    f = ops[0]["field"]
    assert f.base_type == "int" and f.unsigned and not f.nullable


# --- other statements -------------------------------------------------------

def test_drop_table():
    assert parse_drop_table("DROP TABLE users3") == (["users3"], False)
    assert parse_drop_table("DROP TABLE IF EXISTS a, db.b") == (["a", "b"], True)


def test_rename_table():
    assert parse_rename_table("RENAME TABLE users2 TO users2_renamed") == \
        [("users2", "users2_renamed")]
    assert parse_rename_table("RENAME TABLE a TO b, c TO d") == \
        [("a", "b"), ("c", "d")]


def test_rename_table_cross_db_rejected():
    with pytest.raises(ValueError):
        parse_rename_table("RENAME TABLE db1.a TO db2.b")


def test_truncate():
    assert parse_truncate_table("TRUNCATE TABLE users3") == "users3"
    assert parse_truncate_table("TRUNCATE users3") == "users3"


def test_db_name_from_query():
    # parameterized cases mirroring reference tests (:533–569)
    assert db_name_from_query("CREATE TABLE mydb.t (id int)") == "mydb"
    assert db_name_from_query("CREATE TABLE `mydb`.`t` (id int)") == "mydb"
    assert db_name_from_query("ALTER TABLE mydb.t ADD c int") == "mydb"
    assert db_name_from_query("DROP TABLE IF EXISTS mydb.t") == "mydb"
    assert db_name_from_query("TRUNCATE TABLE mydb.t") == "mydb"
    assert db_name_from_query("CREATE TABLE t (id int)") is None
    assert db_name_from_query("CREATE INDEX i ON mydb.t (c)") == "mydb"


# --- helpers ----------------------------------------------------------------

def test_split_top_level():
    assert split_top_level("a int, b decimal(5, 2), c enum('x,y','z')") == \
        ["a int", "b decimal(5, 2)", "c enum('x,y','z')"]


def test_strip_sql_comments():
    sql = "CREATE TABLE t (\n  a int, -- trailing\n  b int # other\n, /* block */ c int)"
    out = strip_sql_comments(sql)
    assert "trailing" not in out and "other" not in out and "block" not in out
    assert "'-- not a comment'" in strip_sql_comments("SELECT '-- not a comment'")


def test_strip_column_comments_quote_aware():
    out = strip_column_comments("id int COMMENT 'it''s \"quoted\"' NOT NULL")
    assert out.replace("  ", " ").strip() == "id int NOT NULL"
