package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.etl.{JdbcSink, ReferenceEtl}

/** S6 JDBC parity: the six star tables round-trip through a real JDBC
  * database (embedded Derby — the driver available offline; the writer
  * surface is identical for the reference's PostgreSQL), and the
  * dialect-parameterized DDL surface emits the reference schema's
  * PostgreSQL types (populate_db_ru_v1.py:160-169) for a postgresql URL
  * — no PostgreSQL server is reachable offline, but the dialect mapping
  * is the only part of the path that differs by engine, and the SAME
  * DDL generator is executed live against Derby below.
  */
class JdbcSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val corpus = "/root/reference/diplom"
  private lazy val spark = Sessions.build("jdbc-sink-spec")
  private lazy val t = ReferenceEtl.run(spark, corpus)
  override def afterAll(): Unit = spark.stop()

  private val counts = Map(
    "Assignments" -> 4127L, "Inspectors" -> 734L, "Locations" -> 399L,
    "Ranks" -> 46L, "Professions" -> 26L, "Educations" -> 19L)

  test("ETL tables round-trip through df.write.jdbc (embedded Derby)") {
    assume(new java.io.File(corpus).isDirectory, "reference corpus not present")
    val url = "jdbc:derby:memory:graftdb;create=true"
    JdbcSink.writeAll(t, url)

    counts.foreach { case (name, n) =>
      assert(JdbcSink.readTable(spark, url, name).count() == n, name)
    }

    // content check on a full dim: set-equal with the in-memory table,
    // including Cyrillic text surviving the JDBC round trip
    import spark.implicits._
    val written = JdbcSink.readTable(spark, url, "Ranks")
      .select($"RankID".cast("long"), $"Abbreviation", $"FullName_RU")
      .as[(Long, String, String)].collect().toSet
    val expected = t.ranks
      .select($"RankID", $"Abbreviation", $"FullName_RU")
      .as[(Long, String, String)].collect().toSet
    assert(written == expected)

    // and on the fact table: every column of every row survives (CLOB
    // text, booleans, nullable ints) — keyed compare on AssignmentID
    def canon(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.collect().map { r =>
        val m = r.getValuesMap[Any](df.columns.toSeq)
        m("AssignmentID").toString.toLong ->
          df.columns.sorted.map(c => s"$c=${Option(m(c)).map(_.toString).getOrElse("<NULL>")}").mkString("|")
      }.toMap
    val factBack = canon(JdbcSink.readTable(spark, url, "Assignments")
      .withColumn("AssignmentID", $"AssignmentID".cast("long")))
    val factRef = canon(t.assignments)
    assert(factBack.size == factRef.size)
    val diff = factRef.keys.filter(k => factBack(k) != factRef(k)).take(3)
    assert(diff.isEmpty, s"fact rows differ after JDBC round trip: ${diff.toList}")
  }

  test("PostgreSQL dialect emits the reference DDL's type mappings") {
    assume(new java.io.File(corpus).isDirectory, "reference corpus not present")
    val pg = "jdbc:postgresql://host/db"
    val ddl = JdbcSink.starSchemaDdl(t, pg)
    val byTable = ddl.map(s => s.split(" ")(2) -> s).toMap
    def colDef(tbl: String, c: String): String =
      byTable(tbl).split(", ").find(_.contains(s""""$c" """))
        .getOrElse(fail(s"no column $c in ${byTable(tbl)}"))

    // TEXT for the reference's TEXT columns (populate_db_ru_v1.py:162,166)
    assert(colDef("Inspectors", "Notes").contains(""""Notes" TEXT"""))
    assert(colDef("Assignments", "PersonnelRawString").contains("TEXT"))
    assert(colDef("Assignments", "AssignmentNotes").contains("TEXT"))
    // BOOLEAN for the flag columns (:166 IsActing/IsVacancy BOOLEAN)
    assert(colDef("Assignments", "IsActing").contains("BOOLEAN"))
    assert(colDef("Assignments", "IsVacancy").contains("BOOLEAN"))
    // every dim id is a PRIMARY KEY; every fact FK column REFERENCES its
    // dim and stays NULLable (:166 "InspectorID INT NULL REFERENCES …")
    assert(byTable("Ranks").contains("""PRIMARY KEY ("RankID")"""))
    assert(byTable("Assignments").contains("""PRIMARY KEY ("AssignmentID")"""))
    Seq("InspectorID" -> "Inspectors", "InspectorLocationID" -> "Locations",
      "RankID" -> "Ranks", "ProfessionID" -> "Professions",
      "EducationID" -> "Educations").foreach { case (c, dim) =>
      assert(byTable("Assignments").contains(s"""FOREIGN KEY ("$c") REFERENCES $dim"""),
        s"missing FK $c -> $dim")
      assert(!colDef("Assignments", c).contains("NOT NULL"),
        s"FK column $c must stay nullable: ${colDef("Assignments", c)}")
    }
    // Derby maps the same logical schema to its own types — the dialect
    // is the ONLY thing the URL changes
    val derbyDdl = JdbcSink.starSchemaDdl(t, "jdbc:derby:memory:x").head
    assert(derbyDdl.contains(""""Notes" CLOB"""))
  }

  test("pre-created constrained schema (starSchemaDdl) accepts an append load on Derby") {
    assume(new java.io.File(corpus).isDirectory, "reference corpus not present")
    val url = "jdbc:derby:memory:graftddl;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      JdbcSink.starSchemaDdl(t, url).foreach(st.execute)
      // the FK constraints are real: a fact row pointing at a
      // nonexistent rank must be rejected by the engine
      // provide every NOT NULL column so the ONLY violation is the FK
      val bogus =
        """INSERT INTO Assignments ("AssignmentID", "Year", "SourceFile",
          |"OkrugName", "GuberniaName", "PositionRole", "IsActing",
          |"IsVacancy", "RankID")
          |VALUES (999999, 1901, 'f', 'o', 'g', 'r', FALSE, FALSE, 999999)""".stripMargin
      val e = intercept[java.sql.SQLException](st.execute(bogus))
      assert(e.getSQLState == "23503", s"expected FK violation, got: $e")
      st.close()
    } finally conn.close()
    // dims-first append order satisfies the FKs; every table lands whole
    JdbcSink.writeAll(t, url, mode = "append")
    counts.foreach { case (name, n) =>
      assert(JdbcSink.readTable(spark, url, name).count() == n, name)
    }
  }
}
