package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6 JDBC sink parity: the reference's actual sink is a PostgreSQL
  * database written table-by-table (populate_db_ru_v1.py:160-179 DDL,
  * :764-768 inserts). The Spark-native equivalent is `df.write.jdbc` per
  * star-schema table — the same six-table contract as the parquet sink
  * (ReferenceEtl.writeAll), pointed at any JDBC URL.
  *
  * Scale note: `jdbc` writes partition-parallel (one connection per
  * partition); the tiny dims coalesce to 1 to avoid 32 one-row
  * connections, while the fact table keeps its partitioning. A relational
  * sink is inherently a small-output endpoint (the reference's use case —
  * a few thousand curated rows), not the 100 TB path; that is what the
  * parquet sink is for.
  *
  * JdbcSinkSpec exercises it against embedded Derby (the JDBC driver
  * available in the sandbox); the URL/properties surface is identical for
  * PostgreSQL et al.
  */
object JdbcSink {

  def writeAll(t: EtlTables, url: String, props: Properties = new Properties): Unit = {
    def dim(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").jdbc(url, name, props)
    // dims first, fact last — the reference's FK insert order (:771-787)
    dim(t.inspectors, "Inspectors")
    dim(t.locations, "Locations")
    dim(t.ranks, "Ranks")
    dim(t.professions, "Professions")
    dim(t.educations, "Educations")
    t.assignments.write.mode("overwrite").jdbc(url, "Assignments", props)
  }

  def readTable(spark: SparkSession, url: String, name: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, name, props)
}
