package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-parser edge cases for the DDL pre-parser — the shapes where a
  * lazy/greedy regex boundary or a clause interaction could silently
  * mis-split (no SparkSession needed; the statement ROUTES are covered
  * in TableEnvSpec).
  */
class DdlParseSpec extends AnyFunSuite {

  test("PARTITIONED BY parses with parenthesized types in the column block") {
    // DECIMAL(10,2) must not confuse the cols/partition boundary
    val td = DdlSql.parseCreateTable(
      """CREATE TABLE t (a BIGINT, p DECIMAL(10,2), s STRING)
        |PARTITIONED BY (s, a)
        |WITH ('path'='/tmp/x', 'format'='parquet')""".stripMargin)
    assert(td.cols.map(_._1) === Seq("a", "p", "s"))
    assert(td.cols(1)._2 === "decimal(10,2)")
    assert(td.partitions === Seq("s", "a"))
  }

  test("computed + watermark + PARTITIONED BY coexist in one statement") {
    val td = DdlSql.parseCreateTable(
      """CREATE TABLE t (id BIGINT, ts TIMESTAMP(3), region STRING,
        |  rt AS ts - INTERVAL 1 SECOND,
        |  WATERMARK FOR rt AS rt - INTERVAL '5' MINUTE)
        |PARTITIONED BY (region)
        |WITH ('path'='/tmp/x')""".stripMargin)
    assert(td.cols.map(_._1) === Seq("id", "ts", "region"))
    assert(td.computed === Seq("rt" -> "ts - INTERVAL 1 SECOND"))
    assert(td.watermark === Some(("rt", "5 minutes")))
    assert(td.partitions === Seq("region"))
  }

  test("PROCTIME lowers; computed-column subqueries and duplicate names are loud") {
    val td = DdlSql.parseCreateTable(
      "CREATE TABLE t (a BIGINT, p AS PROCTIME()) WITH ('path'='/tmp/x')")
    assert(td.computed === Seq("p" -> "current_timestamp()"))
    val e1 = intercept[IllegalArgumentException](DdlSql.parseCreateTable(
      "CREATE TABLE t (a BIGINT, b AS (SELECT 1)) WITH ('path'='/tmp/x')"))
    assert(e1.getMessage.contains("subqueries"))
    val e2 = intercept[IllegalArgumentException](DdlSql.parseCreateTable(
      "CREATE TABLE t (a BIGINT, A AS a + 1) WITH ('path'='/tmp/x')"))
    assert(e2.getMessage.contains("duplicate columns"))
  }

  test("INSERT column list parses; bare INSERT keeps the positional contract") {
    val i1 = DdlSql.parseInsert("INSERT INTO t (b, a) SELECT 1, 2")
    assert(i1.cols === Seq("b", "a") && !i1.overwrite)
    val i2 = DdlSql.parseInsert("INSERT OVERWRITE t SELECT * FROM s")
    assert(i2.cols.isEmpty && i2.overwrite)
    // a SELECT with parens right after the table name still routes
    val i3 = DdlSql.parseInsert("INSERT INTO t SELECT (a + 1) FROM s")
    assert(i3.cols.isEmpty && i3.select.startsWith("SELECT"))
    val e = intercept[IllegalArgumentException](
      DdlSql.parseInsert("INSERT INTO t (a, a) SELECT 1, 2"))
    assert(e.getMessage.contains("duplicate columns"))
  }

  test("CREATE TABLE LIKE parses with and without WITH; plain CREATE TABLE is untouched") {
    assert(DdlSql.isCreateTableLike("CREATE TABLE b WITH ('path'='/p') LIKE a"))
    assert(DdlSql.isCreateTableLike("CREATE TABLE b LIKE a"))
    val (n1, o1, s1) = DdlSql.parseCreateTableLike("CREATE TABLE b WITH ('path'='/p') LIKE a")
    assert((n1, s1) === ("b", "a") && o1 === Map("path" -> "/p"))
    val (n2, o2, s2) = DdlSql.parseCreateTableLike("CREATE TABLE b LIKE a")
    assert((n2, s2) === ("b", "a") && o2.isEmpty)
    // the classic column-block form must NOT match the LIKE route
    assert(!DdlSql.isCreateTableLike(
      "CREATE TABLE t (a BIGINT) WITH ('path'='/tmp/x')"))
    assert(DdlSql.isCreateTable(
      "CREATE TABLE t (a BIGINT) WITH ('path'='/tmp/x')"))
  }

  test("DROP / ALTER / CREATE FUNCTION / DESCRIBE shape predicates stay disjoint and loud") {
    assert(DdlSql.parseDrop("DROP TABLE IF EXISTS t") === (("TABLE", true, "t")))
    assert(DdlSql.parseDrop("drop view v") === (("VIEW", false, "v")))
    intercept[IllegalArgumentException](DdlSql.parseDrop("DROP TABLE a.b"))
    assert(DdlSql.parseAlterRename("ALTER TABLE a RENAME TO b") === (("a", "b")))
    intercept[IllegalArgumentException](
      DdlSql.parseAlterRename("ALTER TABLE a SET ('k'='v')"))
    assert(DdlSql.parseCreateFunction("CREATE TEMPORARY FUNCTION f AS 'upper'") ===
      (("f", "upper")))
    intercept[IllegalArgumentException](
      DdlSql.parseCreateFunction("CREATE FUNCTION f AS com.example.C"))
    assert(DdlSql.parseDescribe("DESCRIBE t") === "t")
    assert(DdlSql.parseDescribe("DESC TABLE t") === "t")
    // Spark's own EXPLAIN/DESCRIBE EXTENDED must fall through untouched
    assert(!DdlSql.isDescribe("DESCRIBE EXTENDED t"))
  }

  test("statement-tail shapes: USE compound, DROP FUNCTION, database DDL, ALTER TABLE SET") {
    // USE [catalog.]database — ref SqlUseDatabase.fullDatabaseName() is
    // compound; USE CATALOG stays a simple name (ref SqlUseCatalog)
    assert(DdlSql.parseUse("USE db1") === ((false, None, "db1")))
    assert(DdlSql.parseUse("USE cat1.db1") === ((false, Some("cat1"), "db1")))
    assert(DdlSql.parseUse("USE CATALOG cat1") === ((true, None, "cat1")))
    intercept[IllegalArgumentException](DdlSql.parseUse("USE CATALOG a.b"))
    intercept[IllegalArgumentException](DdlSql.parseUse("USE a.b.c"))
    // DROP FUNCTION (ref ddl/SqlDropFunction.java): keyword tiers fold
    assert(DdlSql.parseDropFunction("DROP FUNCTION f") === ((false, "f")))
    assert(DdlSql.parseDropFunction("DROP TEMPORARY SYSTEM FUNCTION IF EXISTS f")
      === ((true, "f")))
    assert(!DdlSql.isDrop("DROP FUNCTION f"), "DROP FUNCTION must not route as DROP TABLE/VIEW")
    intercept[IllegalArgumentException](DdlSql.parseDropFunction("DROP FUNCTION a.b"))
    // CREATE DATABASE (ref ddl/SqlCreateDatabase.java): comment + props
    assert(DdlSql.parseCreateDatabase("CREATE DATABASE d") === ((false, "d", None, Map.empty)))
    assert(DdlSql.parseCreateDatabase(
      "CREATE DATABASE IF NOT EXISTS d COMMENT 'c' WITH ('k'='v')")
      === ((true, "d", Some("c"), Map("k" -> "v"))))
    intercept[IllegalArgumentException](DdlSql.parseCreateDatabase("CREATE DATABASE d WITH (k=v)"))
    // DROP DATABASE (ref ddl/SqlDropDatabase.java): RESTRICT|CASCADE tail
    assert(DdlSql.parseDropDatabase("DROP DATABASE d") === ((false, "d", false)))
    assert(DdlSql.parseDropDatabase("DROP DATABASE IF EXISTS d CASCADE") === ((true, "d", true)))
    assert(!DdlSql.isDrop("DROP DATABASE d"))
    // ALTER DATABASE / ALTER TABLE SET (ref SqlAlterDatabase /
    // SqlAlterTableProperties): property lists parse quote-aware
    assert(DdlSql.parseAlterDatabase("ALTER DATABASE d SET ('a'='1', 'b'='x,y')")
      === (("d", Map("a" -> "1", "b" -> "x,y"))))
    intercept[IllegalArgumentException](DdlSql.parseAlterDatabase("ALTER DATABASE d RENAME TO e"))
    assert(DdlSql.isAlterTableSet("ALTER TABLE t SET ('path'='/p')"))
    assert(!DdlSql.isAlterTableSet("ALTER TABLE t RENAME TO u"))
    assert(DdlSql.parseAlterTableSet("ALTER TABLE t SET ('path'='/p', 'format'='json')")
      === (("t", Map("path" -> "/p", "format" -> "json"))))
    // DESCRIBE CATALOG / DATABASE (ref dql/SqlDescribeCatalog.java,
    // SqlDescribeDatabase.java): disjoint from the plain-table DESCRIBE
    assert(DdlSql.parseDescribeCatalog("DESCRIBE CATALOG c") === "c")
    assert(DdlSql.parseDescribeDatabase("DESCRIBE DATABASE d") === ((false, None, "d")))
    assert(DdlSql.parseDescribeDatabase("DESC DATABASE EXTENDED cat.d")
      === ((true, Some("cat"), "d")))
    assert(!DdlSql.isDescribe("DESCRIBE DATABASE d"))
    assert(!DdlSql.isDescribe("DESCRIBE CATALOG c"))
    assert(DdlSql.isShowCatalogs("SHOW CATALOGS") && !DdlSql.isShowCatalogs("SHOW CATALOG"))
  }
}
