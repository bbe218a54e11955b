package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.etl.{JdbcSink, ReferenceEtl}

/** S6 JDBC parity: the six star tables round-trip through a real JDBC
  * database (embedded Derby — the driver available offline; the writer
  * surface is identical for the reference's PostgreSQL).
  */
class JdbcSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val corpus = "/root/reference/diplom"
  private lazy val spark = Sessions.build("jdbc-sink-spec")
  override def afterAll(): Unit = spark.stop()

  test("ETL tables round-trip through df.write.jdbc (embedded Derby)") {
    assume(new java.io.File(corpus).isDirectory, "reference corpus not present")
    val url = "jdbc:derby:memory:graftdb;create=true"
    val t = ReferenceEtl.run(spark, corpus)
    JdbcSink.writeAll(t, url)

    val counts = Map(
      "Assignments" -> 4127L, "Inspectors" -> 734L, "Locations" -> 399L,
      "Ranks" -> 46L, "Professions" -> 26L, "Educations" -> 19L)
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
  }
}
