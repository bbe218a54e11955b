package graft.etl

/** Dev harness: write the six ETL tables as single-file JSON for ad-hoc
  * diffing against tools/golden (driver-side python).
  */
object EtlDump {
  def main(args: Array[String]): Unit = {
    val corpus = if (args.length > 0) args(0) else "/root/reference/diplom"
    val out = if (args.length > 1) args(1) else "/tmp/etl_dump"
    val spark = graft.Sessions.build("etl-dump")
    val t = ReferenceEtl.run(spark, corpus)
    for ((name, df) <- Seq(
        "assignments" -> t.assignments, "inspectors" -> t.inspectors,
        "locations" -> t.locations, "ranks" -> t.ranks,
        "professions" -> t.professions, "educations" -> t.educations))
      df.coalesce(1).write.mode("overwrite").json(s"$out/$name")
    spark.stop()
  }
}
