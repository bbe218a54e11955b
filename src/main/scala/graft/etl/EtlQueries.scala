package graft.etl

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import graft.ops.Q

/** The §2A ingestion ETL surfaced through the driver contract: one entry
  * per star-schema output table, computed by the full Spark pipeline over
  * the reference corpus. The input is the HTML corpus, not the driver's
  * TPC-H-ish parquet — so the oracle SQL reads the golden tables (the
  * unmodified reference implementation's output, dumped to parquet with
  * engine-matching schemas by tools/golden_to_parquet.py) via DuckDB
  * read_parquet: the driver's independent hash gate now covers the
  * engine's flagship capability, on top of the repo's own row-for-row
  * GoldenEtlSpec / GoldenCheck.
  */
object EtlQueries {

  private val Corpus = "/root/reference/diplom"
  private val Golden = "/root/repo/tools/golden"

  private def goldenSql(table: String): String =
    s"SELECT * FROM read_parquet('$Golden/$table.parquet')"
  private val cache = new ConcurrentHashMap[SparkSession, EtlTables]()

  private def tables(s: SparkSession): EtlTables =
    cache.computeIfAbsent(s, sess => {
      // evict when the session stops — a long-lived multi-session process
      // must not pin stopped sessions' cached DataFrames forever
      graft.Sessions.onStop(sess)(() => cache.remove(sess))
      val t = ReferenceEtl.run(sess, Corpus)
      EtlTables(
        t.assignments.cache(), t.inspectors.cache(), t.locations.cache(),
        t.ranks.cache(), t.professions.cache(), t.educations.cache())
    })

  def queries: Seq[Q] = Seq(
    Q("e01_etl_assignments", (s, _) => tables(s).assignments, Some(goldenSql("assignments"))),
    Q("e02_etl_inspectors", (s, _) => tables(s).inspectors, Some(goldenSql("inspectors"))),
    Q("e03_etl_locations", (s, _) => tables(s).locations, Some(goldenSql("locations"))),
    Q("e04_etl_ranks", (s, _) => tables(s).ranks, Some(goldenSql("ranks"))),
    Q("e05_etl_professions", (s, _) => tables(s).professions, Some(goldenSql("professions"))),
    Q("e06_etl_educations", (s, _) => tables(s).educations, Some(goldenSql("educations"))))
}
