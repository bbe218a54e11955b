package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

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
  * DIALECTS: type mapping is delegated to Spark's `JdbcDialects` registry
  * keyed by URL, so the same call emits PostgreSQL types (TEXT, BOOLEAN —
  * the reference DDL's choices) for a `jdbc:postgresql:` URL and Derby
  * types (CLOB, BOOLEAN) for `jdbc:derby:`. [[starSchemaDdl]] exposes the
  * CREATE TABLE statements — with the reference's primary/foreign keys,
  * which `df.write.jdbc`'s auto-created tables cannot carry — for
  * pre-creating a constrained schema and appending into it.
  *
  * JdbcSinkSpec exercises the full write path against embedded Derby (the
  * JDBC driver available in the sandbox), both auto-created and
  * pre-created-with-FKs, and pins the PostgreSQL dialect's emitted DDL
  * against the reference's schema (no PostgreSQL server is reachable
  * here, but the dialect mapping — the only thing that differs — is).
  */
object JdbcSink {

  def writeAll(t: EtlTables, url: String, props: Properties = new Properties,
      mode: String = "overwrite"): Unit = {
    def dim(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode(mode).jdbc(url, name, props)
    // dims first, fact last — the reference's FK insert order (:771-787)
    dim(t.inspectors, "Inspectors")
    dim(t.locations, "Locations")
    dim(t.ranks, "Ranks")
    dim(t.professions, "Professions")
    dim(t.educations, "Educations")
    t.assignments.write.mode(mode).jdbc(url, "Assignments", props)
  }

  def readTable(spark: SparkSession, url: String, name: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, name, props)

  /** The JDBC column type `df.write.jdbc` would use for `dt` against
    * `url`'s dialect: the dialect's override when it has one (PostgreSQL:
    * StringType → TEXT, BooleanType → BOOLEAN; Derby: StringType → CLOB),
    * else Spark's common fallback (mirrored here for the star schema's
    * types — the Spark-internal table lives in a private[sql] object). */
  private def jdbcType(url: String, dt: DataType): String =
    JdbcDialects.get(url).getJDBCType(dt).map(_.databaseTypeDefinition)
      .getOrElse(dt match {
        case IntegerType => "INTEGER"
        case LongType    => "BIGINT"
        case DoubleType  => "DOUBLE PRECISION"
        case StringType  => "TEXT"
        case BooleanType => "BIT(1)"
        case other => throw new IllegalArgumentException(
          s"no JDBC mapping for $other under $url")
      })

  /** CREATE TABLE DDL for `df`'s schema under `url`'s dialect, with
    * optional PRIMARY KEY / FOREIGN KEY constraints (`foreignKeys` =
    * (column, refTable, refColumn)). Column nullability follows the
    * schema; a primary-key column is forced NOT NULL (every engine
    * requires it — PostgreSQL implies it, Derby demands it spelled
    * out). COLUMN identifiers are dialect-quoted, so mixed-case column
    * names survive engines that fold unquoted identifiers; TABLE names
    * stay unquoted ON PURPOSE — Spark's `df.write.jdbc`/`read.jdbc`
    * interpolate the table name unquoted into their own SQL, so quoting
    * it here would create `"Inspectors"` while Spark reads `inspectors`
    * (folded) and the append/read path would miss the table. */
  def createTableDdl(df: DataFrame, url: String, table: String,
      primaryKey: Option[String] = None,
      foreignKeys: Seq[(String, String, String)] = Nil): String = {
    val dialect = JdbcDialects.get(url)
    def q(id: String) = dialect.quoteIdentifier(id)
    val cols = df.schema.fields.map { f =>
      val notNull =
        if (!f.nullable || primaryKey.contains(f.name)) " NOT NULL" else ""
      s"${q(f.name)} ${jdbcType(url, f.dataType)}$notNull"
    }
    val pk = primaryKey.map(k => s"PRIMARY KEY (${q(k)})")
    val fks = foreignKeys.map { case (c, rt, rc) =>
      s"FOREIGN KEY (${q(c)}) REFERENCES $rt (${q(rc)})"
    }
    s"CREATE TABLE $table (${(cols ++ pk ++ fks).mkString(", ")})"
  }

  /** The six star-schema CREATE TABLEs in FK-safe order (dims first),
    * carrying the reference DDL's key structure
    * (populate_db_ru_v1.py:160-169): each dim's surrogate id is a
    * PRIMARY KEY and every fact FK column REFERENCES its dim — the
    * constraints `df.write.jdbc` auto-creation cannot express. Execute
    * these over a plain JDBC connection, then `writeAll(mode =
    * "append")` loads into the constrained schema. */
  def starSchemaDdl(t: EtlTables, url: String): Seq[String] = Seq(
    createTableDdl(t.inspectors, url, "Inspectors", Some("InspectorID")),
    createTableDdl(t.locations, url, "Locations", Some("LocationID")),
    createTableDdl(t.ranks, url, "Ranks", Some("RankID")),
    createTableDdl(t.professions, url, "Professions", Some("ProfessionID")),
    createTableDdl(t.educations, url, "Educations", Some("EducationID")),
    createTableDdl(t.assignments, url, "Assignments", Some("AssignmentID"),
      Seq(
        ("InspectorID", "Inspectors", "InspectorID"),
        ("InspectorLocationID", "Locations", "LocationID"),
        ("RankID", "Ranks", "RankID"),
        ("ProfessionID", "Professions", "ProfessionID"),
        ("EducationID", "Educations", "EducationID"))))
}
