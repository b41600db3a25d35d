"""Schema registry + DDL replay tests.

Scenarios ported from the reference's live-MySQL suite (SURVEY.md §5):
ALTER-mid-stream (canal/canal_test.go:129), statement normalization
(canal/canal_test.go:155-169), idempotent replay
(schema/tracker.go:116-119).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dolphinbeat_spark.schema.registry import (
    DdlError,
    SchemaRegistry,
    is_ddl,
    is_ddl_or_dcl,
    mysql_type_to_spark,
    normalize_statement,
)

CANAL_TEST_DDL = """CREATE TABLE test.canal_test (
  id INT AUTO_INCREMENT,
  content BLOB DEFAULT NULL,
  name VARCHAR(100),
  PRIMARY KEY (id)
) ENGINE=innodb"""


def test_create_table():
    reg = SchemaRegistry()
    reg.apply_ddl(CANAL_TEST_DDL)
    td = reg.get("test", "canal_test")
    assert td.column_names() == ["id", "content", "name"]
    assert td.primary_key() == ["id"]
    assert td.spark_schema() == T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("name", T.StringType(), True),
        ]
    )


def test_alter_add_after_preserves_position():
    """The F1 fixture: binlog rows are positional, so AFTER matters."""
    reg = SchemaRegistry()
    reg.apply_ddl(CANAL_TEST_DDL)
    v1 = reg.version
    reg.apply_ddl("ALTER TABLE test.canal_test ADD age INT(5) NOT NULL AFTER name")
    td = reg.get("test", "canal_test")
    assert td.column_names() == ["id", "content", "name", "age"]
    assert not td.columns[3].nullable
    # the pre-ALTER version is still resolvable (versioned, no barrier)
    old = reg.get("test", "canal_test", version=v1)
    assert old.column_names() == ["id", "content", "name"]


def test_alter_drop_modify_change():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (a INT, b VARCHAR(10), c DOUBLE)")
    reg.apply_ddl("ALTER TABLE d.t DROP COLUMN b")
    assert reg.get("d", "t").column_names() == ["a", "c"]
    reg.apply_ddl("ALTER TABLE d.t MODIFY a BIGINT NOT NULL")
    assert reg.get("d", "t").columns[0].type.startswith("bigint")
    reg.apply_ddl("ALTER TABLE d.t CHANGE c c2 FLOAT")
    assert reg.get("d", "t").column_names() == ["a", "c2"]


def test_multi_action_alter_and_first():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (a INT)")
    reg.apply_ddl("ALTER TABLE d.t ADD b INT FIRST, ADD c DECIMAL(18,4)")
    assert reg.get("d", "t").column_names() == ["b", "a", "c"]
    assert reg.get("d", "t").columns[2].spark_field().dataType == T.DecimalType(18, 4)


def test_rename_and_drop():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (a INT)")
    reg.apply_ddl("RENAME TABLE d.t TO d.t2")
    assert reg.get("d", "t") is None
    assert reg.get("d", "t2").column_names() == ["a"]
    reg.apply_ddl("DROP TABLE d.t2")
    assert reg.get("d", "t2") is None
    assert reg.tables() == []


def test_alter_rename_to_tombstones_old_name():
    """ALTER ... RENAME TO must NOT resurrect the old name (a later
    re-created table under the old name must resolve its own def)."""
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (a INT)")
    reg.apply_ddl("ALTER TABLE d.t RENAME TO t2")
    assert reg.get("d", "t") is None
    assert reg.get("d", "t2").column_names() == ["a"]
    assert reg.tables() == [("d", "t2")]
    # re-create under the old name: fresh def, not the stale one
    reg.apply_ddl("CREATE TABLE d.t (x BIGINT, y INT)")
    assert reg.get("d", "t").column_names() == ["x", "y"]
    # RENAME AS variant + rename with a second action in the same ALTER
    reg.apply_ddl("ALTER TABLE d.t2 ADD b INT, RENAME AS d.t3, ADD c INT")
    assert reg.get("d", "t2") is None
    assert reg.get("d", "t3").column_names() == ["a", "b", "c"]


def test_rename_column_and_pk_actions():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (a INT NOT NULL, b VARCHAR(10))")
    reg.apply_ddl("ALTER TABLE d.t RENAME COLUMN b TO b2")
    assert reg.get("d", "t").column_names() == ["a", "b2"]
    reg.apply_ddl("ALTER TABLE d.t ADD PRIMARY KEY (a)")
    td = reg.get("d", "t")
    assert td.primary_key() == ["a"] and not td.columns[0].nullable
    reg.apply_ddl("ALTER TABLE d.t DROP PRIMARY KEY")
    td = reg.get("d", "t")
    assert td.primary_key() == [] and not td.columns[0].nullable  # NOT NULL kept
    with pytest.raises(DdlError):
        reg.apply_ddl("ALTER TABLE d.t RENAME COLUMN nope TO x")


def test_multi_add_parenthesized_and_if_exists():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (a INT)")
    reg.apply_ddl("ALTER TABLE d.t ADD (b DECIMAL(18,4), c VARCHAR(20) NOT NULL)")
    td = reg.get("d", "t")
    assert td.column_names() == ["a", "b", "c"]
    assert td.columns[1].spark_field().dataType == T.DecimalType(18, 4)
    assert not td.columns[2].nullable
    reg.apply_ddl("ALTER TABLE d.t ADD COLUMN IF NOT EXISTS d INT")
    reg.apply_ddl("ALTER TABLE d.t DROP COLUMN IF EXISTS b")
    assert reg.get("d", "t").column_names() == ["a", "c", "d"]
    # shape-neutral breadth: index renames, fulltext, constraint drops
    v = reg.version
    reg.apply_ddl("ALTER TABLE d.t RENAME INDEX i1 TO i2, ADD FULLTEXT KEY ft (c)")
    assert reg.get("d", "t").column_names() == ["a", "c", "d"]
    assert reg.version > v  # still versioned (a DDL happened)


def test_inline_primary_key_not_null():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (id INT PRIMARY KEY, v VARCHAR(5))")
    td = reg.get("d", "t")
    assert td.primary_key() == ["id"]
    assert td.spark_schema()[0] == T.StructField("id", T.IntegerType(), False)


def test_idempotent_replay_by_position():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE d.t (a INT)", position=("binlog.1", 100))
    v = reg.version
    reg.apply_ddl("CREATE TABLE d.t (a INT)", position=("binlog.1", 100))
    assert reg.version == v  # skipped, not re-applied


def test_unknown_alter_raises_ddl_error():
    reg = SchemaRegistry()
    with pytest.raises(DdlError):
        reg.apply_ddl("ALTER TABLE nodb.missing ADD x INT")


def test_statement_normalizer():
    """Reference TrimStatement cases (canal/canal_test.go:155-169)."""
    forms = [
        "/* comment */ DROP TABLE TEST1",
        "  DROP   TABLE \n TEST1  ",
        "-- c\nDROP TABLE TEST1",
        "# c\nDROP TABLE TEST1",
    ]
    for f in forms:
        assert normalize_statement(f) == "DROP TABLE TEST1"
    assert is_ddl("  /*x*/ ALTER TABLE t ADD c INT")
    assert not is_ddl("INSERT INTO t VALUES (1)")
    assert is_ddl_or_dcl("GRANT ALL ON *.* TO x")


def test_type_mapping_unsigned_rewiden():
    """Reference D4 (canal/rows.go:58-91): unsigned widens one step."""
    assert mysql_type_to_spark("int", unsigned=False) == T.IntegerType()
    assert mysql_type_to_spark("int", unsigned=True) == T.LongType()
    assert mysql_type_to_spark("bigint", unsigned=True) == T.DecimalType(20, 0)
    assert mysql_type_to_spark("tinyint(1)") == T.BooleanType()
    assert mysql_type_to_spark("enum('a','b')") == T.StringType()
    assert mysql_type_to_spark("mediumblob") == T.BinaryType()


def test_save_load_roundtrip(tmp_path):
    reg = SchemaRegistry()
    reg.apply_ddl(CANAL_TEST_DDL, position=("b.1", 1))
    reg.apply_ddl("ALTER TABLE test.canal_test ADD age INT AFTER name", position=("b.1", 2))
    p = tmp_path / "registry.json"
    reg.save(p)
    reg2 = SchemaRegistry.load(p)
    assert reg2.version == reg.version
    assert reg2.get("test", "canal_test").column_names() == ["id", "content", "name", "age"]
    # idempotence info survives persistence
    v = reg2.version
    reg2.apply_ddl("ALTER TABLE test.canal_test ADD age INT AFTER name", position=("b.1", 2))
    assert reg2.version == v


# -- MySQL-8 grammar long tail (reference replays anything its embedded
# -- TiDB parser accepts, schema/tracker.go:153-172; these are the forms
# -- real mysqldump / MySQL 8 emit daily) -------------------------------


def test_create_with_partition_by_tail():
    reg = SchemaRegistry()
    reg.apply_ddl(
        """CREATE TABLE test.metrics (
  id BIGINT NOT NULL,
  day DATE NOT NULL,
  v DOUBLE,
  PRIMARY KEY (id, day)
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_ai_ci
PARTITION BY RANGE (YEAR(day)) (
  PARTITION p2023 VALUES LESS THAN (2024),
  PARTITION p2024 VALUES LESS THAN (2025),
  PARTITION pmax VALUES LESS THAN MAXVALUE
)"""
    )
    td = reg.get("test", "metrics")
    assert td.column_names() == ["id", "day", "v"]
    assert td.primary_key() == ["id", "day"]
    assert td.charset == "utf8mb4"


def test_create_with_comment_containing_parens():
    reg = SchemaRegistry()
    reg.apply_ddl(
        "CREATE TABLE test.t (id INT PRIMARY KEY) COMMENT='totals (daily)'"
    )
    assert reg.get("test", "t").column_names() == ["id"]


def test_generated_columns_stored_and_virtual():
    reg = SchemaRegistry()
    reg.apply_ddl(
        """CREATE TABLE test.gen (
  a INT NOT NULL,
  b INT NOT NULL,
  s INT GENERATED ALWAYS AS (a + b) STORED,
  v VARCHAR(20) AS (CONCAT(a, '-', b)) VIRTUAL,
  PRIMARY KEY (a)
)"""
    )
    td = reg.get("test", "gen")
    assert td.column_names() == ["a", "b", "s", "v"]
    assert td.columns[2].type == "int"
    # ALTER ADD of a generated column
    reg.apply_ddl(
        "ALTER TABLE test.gen ADD COLUMN s2 BIGINT GENERATED ALWAYS AS (a * b) STORED AFTER b"
    )
    assert reg.get("test", "gen").column_names() == ["a", "b", "s2", "s", "v"]


def test_charset_collate_column_options():
    reg = SchemaRegistry()
    reg.apply_ddl(
        """CREATE TABLE test.cs (
  id INT PRIMARY KEY,
  name VARCHAR(100) CHARACTER SET utf8mb4 COLLATE utf8mb4_bin NOT NULL,
  note TEXT CHARSET latin1
) DEFAULT CHARACTER SET = utf8mb4"""
    )
    td = reg.get("test", "cs")
    assert td.columns[1].charset == "utf8mb4"
    assert not td.columns[1].nullable
    assert td.columns[2].charset == "latin1"
    assert td.charset == "utf8mb4"
    # MODIFY with charset options keeps parsing
    reg.apply_ddl(
        "ALTER TABLE test.cs MODIFY name VARCHAR(200) CHARACTER SET utf8mb4 COLLATE utf8mb4_general_ci"
    )
    assert reg.get("test", "cs").columns[1].type == "varchar(200)"


def test_add_index_key_and_check_are_shape_neutral():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE test.t (id INT PRIMARY KEY, a INT, b INT)")
    v = reg.version
    reg.apply_ddl("ALTER TABLE test.t ADD INDEX idx_a (a)")
    reg.apply_ddl("ALTER TABLE test.t ADD KEY idx_b (b), ADD FULLTEXT INDEX ft (a)")
    reg.apply_ddl("ALTER TABLE test.t ADD CHECK (a > 0)")
    reg.apply_ddl("ALTER TABLE test.t ADD CONSTRAINT c1 CHECK (b < 100)")
    td = reg.get("test", "t")
    assert td.column_names() == ["id", "a", "b"]
    assert reg.version > v  # versions advance; shape unchanged


def test_partition_maintenance_alters():
    reg = SchemaRegistry()
    reg.apply_ddl("CREATE TABLE test.p (id INT PRIMARY KEY, day DATE)")
    reg.apply_ddl("ALTER TABLE test.p PARTITION BY HASH(id) PARTITIONS 4")
    reg.apply_ddl(
        "ALTER TABLE test.p ADD PARTITION (PARTITION p4 VALUES LESS THAN (50))"
    )
    reg.apply_ddl("ALTER TABLE test.p DROP PARTITION p4")
    reg.apply_ddl("ALTER TABLE test.p TRUNCATE PARTITION p0")
    td = reg.get("test", "p")
    # none of these touch the column shape — and DROP PARTITION must NOT
    # be parsed as DROP COLUMN
    assert td.column_names() == ["id", "day"]


def test_auto_increment_and_engine_options():
    reg = SchemaRegistry()
    reg.apply_ddl(
        "CREATE TABLE test.ai (id INT PRIMARY KEY) ENGINE=InnoDB AUTO_INCREMENT=1000"
    )
    reg.apply_ddl("ALTER TABLE test.ai AUTO_INCREMENT = 5000, ENGINE=InnoDB")
    assert reg.get("test", "ai").column_names() == ["id"]


def test_create_table_like_copies_shape():
    reg = SchemaRegistry()
    reg.apply_ddl(CANAL_TEST_DDL)
    reg.apply_ddl("CREATE TABLE test.canal_copy LIKE test.canal_test")
    td = reg.get("test", "canal_copy")
    assert td.column_names() == ["id", "content", "name"]
    assert td.primary_key() == ["id"]
    # the copy is independent of the source
    reg.apply_ddl("ALTER TABLE test.canal_copy DROP COLUMN content")
    assert reg.get("test", "canal_test").column_names() == ["id", "content", "name"]


def test_create_as_select_dead_letters():
    reg = SchemaRegistry()
    with pytest.raises(DdlError):
        reg.apply_ddl("CREATE TABLE test.snap AS SELECT * FROM test.canal_test")


def test_property_create_roundtrip():
    """Property: any generated column list survives CREATE → registry
    shape (names, order, nullability, PK) exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    types = st.sampled_from(
        ["INT", "BIGINT", "VARCHAR(50)", "TEXT", "DECIMAL(10,2)",
         "DATETIME", "TINYINT UNSIGNED", "BLOB", "JSON", "DOUBLE"]
    )
    names = st.lists(
        st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True),
        min_size=1, max_size=8, unique=True,
    )

    @settings(max_examples=60, deadline=None)
    @given(cols=names, data=st.data())
    def run(cols, data):
        defs, nullables = [], {}
        pk = data.draw(st.sampled_from([None] + cols))
        for c in cols:
            t = data.draw(types)
            nn = data.draw(st.booleans())
            nullables[c] = not nn and c != pk
            defs.append(f"`{c}` {t}{' NOT NULL' if nn else ''}")
        stmt = f"CREATE TABLE db1.t1 ({', '.join(defs)}"
        if pk is not None:
            stmt += f", PRIMARY KEY (`{pk}`)"
        stmt += ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
        reg = SchemaRegistry()
        reg.apply_ddl(stmt)
        td = reg.get("db1", "t1")
        assert td.column_names() == cols
        assert td.primary_key() == ([pk] if pk is not None else [])
        for c in td.columns:
            assert c.nullable == nullables[c.name], c.name

    run()


def test_ddl_replay_model_based_property():
    """Model-based property test for D9: a random sequence of
    ADD/DROP/MODIFY/CHANGE/RENAME-COLUMN ALTERs replayed through the
    registry must leave exactly the column list a trivial Python model
    predicts — and every historical version must stay resolvable with
    the column list it had when stamped (the versioned-registry
    contract that replaces the reference's DDL barrier)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dolphinbeat_spark.schema.registry import SchemaRegistry

    name = st.sampled_from([f"c{i}" for i in range(8)])
    action = st.one_of(
        st.tuples(st.just("add"), name),
        st.tuples(st.just("drop"), name),
        st.tuples(st.just("modify"), name),
        st.tuples(st.just("change"), name, name),
    )

    @settings(max_examples=120, deadline=None)
    @given(st.lists(action, max_size=12))
    def run(actions):
        reg = SchemaRegistry()
        reg.apply_ddl("CREATE TABLE d.t (id INT PRIMARY KEY, c0 VARCHAR(10))")
        model = ["id", "c0"]
        history = [(reg.version, list(model))]
        for act in actions:
            kind = act[0]
            if kind == "add":
                c = act[1]
                if c in model:
                    continue  # duplicate add is a MySQL error; skip
                reg.apply_ddl(f"ALTER TABLE d.t ADD COLUMN {c} INT")
                model.append(c)
            elif kind == "drop":
                c = act[1]
                if c not in model or c == "id":
                    continue
                reg.apply_ddl(f"ALTER TABLE d.t DROP COLUMN {c}")
                model.remove(c)
            elif kind == "modify":
                c = act[1]
                if c not in model:
                    continue
                reg.apply_ddl(f"ALTER TABLE d.t MODIFY COLUMN {c} BIGINT")
            else:  # change (rename, keeps position)
                old, new = act[1], act[2]
                if old not in model or (new != old and new in model) or old == "id":
                    continue
                reg.apply_ddl(f"ALTER TABLE d.t CHANGE COLUMN {old} {new} TEXT")
                model[model.index(old)] = new
            history.append((reg.version, list(model)))
        td = reg.get("d", "t")
        assert td is not None and td.column_names() == model
        # version pinning: every stamped version resolves to the column
        # list the table had AT that version
        for v, cols in history:
            got = reg.get("d", "t", version=v)
            assert got is not None and got.column_names() == cols, (v, cols)

    run()
