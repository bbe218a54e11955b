package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Text-analysis / training-data-pipeline operators over the `documents`
  * table: exact dedup, token statistics, corpus word frequencies, quality
  * scoring. These are the oracle-testable (SQL-expressible) half; the
  * hash-sketch family (MinHash/SimHash/LSH) lives in Similarity.scala.
  */
object TextOps {

  def queries: Seq[Q] = Seq(

    // Exact deduplication: content-hash → group; keeper = min doc_id.
    // At 100 TB this is the standard first dedup pass: one shuffle on a
    // 128-bit hash, never on the document text itself.
    Q("d01_dedup_exact",
      (s, d) =>
        documents(s, d)
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(
            count(lit(1)).as("n_copies"),
            min(col("doc_id")).as("keeper_doc_id"),
            max(col("n_chars")).as("n_chars")),
      Some("""SELECT md5(text) AS content_hash, count(*) AS n_copies,
             |min(doc_id) AS keeper_doc_id, max(n_chars) AS n_chars
             |FROM documents GROUP BY 1""".stripMargin)),

    // Token counting (whitespace tokenizer) + punctuation counts.
    Q("d02_token_stats",
      (s, d) =>
        documents(s, d).select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"),
          col("n_chars"),
          (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
            .cast(LongType).as("n_punct")),
      Some("""SELECT doc_id,
             |len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             |n_chars,
             |length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
             |FROM documents""".stripMargin)),

    // Corpus word frequency — explode + heavy groupBy shuffle + top-k.
    Q("d03_word_freq",
      (s, d) =>
        documents(s, d)
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(100),
      Some("""SELECT word, count(*) AS cnt FROM (
             |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
             |  FROM documents)
             |GROUP BY word ORDER BY cnt DESC, word LIMIT 100""".stripMargin)),

    // Quality scoring: token count, mean token length, stopword ratio.
    // All ratios are double divisions of identical integers → exact parity.
    Q("d04_quality_score",
      (s, d) =>
        documents(s, d)
          .withColumn("n_tokens", size(split(lower(trim(col("text"))), "\\s+")).cast(LongType))
          .withColumn("n_stop",
            expr("size(filter(split(lower(trim(text)), '\\\\s+'), w -> w IN ('the','a','of','and','to','in')))")
              .cast(LongType))
          .select(
            col("doc_id"),
            col("n_tokens"),
            (length(regexp_replace(col("text"), "\\s", "")).cast(DoubleType) / col("n_tokens"))
              .as("avg_token_len"),
            (col("n_stop").cast(DoubleType) / col("n_tokens")).as("stopword_ratio")),
      Some("""SELECT doc_id,
             |len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens,
             |CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
             |  / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS avg_token_len,
             |CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |         w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
             |  / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS stopword_ratio
             |FROM documents""".stripMargin)),

    // Corpus composition by language × source.
    Q("d05_lang_source",
      (s, d) =>
        documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars")),
      Some("""SELECT lang, source, count(*) AS n_docs,
             |CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang, source""".stripMargin))
  )
}
