package graft.etl

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import graft.ops.Q

/** The §2A ingestion ETL surfaced through the driver contract: one entry
  * per star-schema output table, computed by the full Spark pipeline over
  * the reference corpus. Not SQL-expressible over the driver's TPC-H-ish
  * parquet (the input is the HTML corpus), so the driver records the
  * rows-only check; exact correctness is gated row-for-row against
  * tools/golden by GoldenEtlSpec / GoldenCheck.
  */
object EtlQueries {

  private val Corpus = "/root/reference/diplom"
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
    Q("e01_etl_assignments", (s, _) => tables(s).assignments, None),
    Q("e02_etl_inspectors", (s, _) => tables(s).inspectors, None),
    Q("e03_etl_locations", (s, _) => tables(s).locations, None),
    Q("e04_etl_ranks", (s, _) => tables(s).ranks, None),
    Q("e05_etl_professions", (s, _) => tables(s).professions, None),
    Q("e06_etl_educations", (s, _) => tables(s).educations, None))
}
