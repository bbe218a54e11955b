package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding storage quantization — the path that makes a 100 TB
  * float32 embedding corpus a 25 TB int8 one. Affine per-vector
  * quantization (the faiss `ScalarQuantizer`/ONNX-style uint8 scheme):
  * each vector carries its own (lo, hi) range and 8-bit codes
  * `round((x - lo) * 255 / (hi - lo))`; reconstruction is
  * `lo + c * (hi - lo) / 255`, so the worst-case per-element error is
  * half a step, (hi - lo) / 510.
  *
  * Everything is built from codegen'd `transform`/`array_min`/
  * `array_max` collection expressions — a narrow map with no UDF, no
  * shuffle, streaming-safe. The per-VECTOR range (vs a global one)
  * keeps the scheme embarrassingly parallel and robust to outlier
  * vectors: no corpus-wide min/max pass, no stale global scale as the
  * corpus drifts, each vector reconstructs independently of every
  * other — at the cost of 16 bytes of range metadata per vector,
  * negligible against the 4x code shrink at realistic widths.
  *
  * d40 hash-gates the codes against a DuckDB oracle computing the
  * identical expression; d41 runs the exact top-k ([[Similarity
  * .cosineTopK]]) over RECONSTRUCTED vectors, hash-gated end-to-end —
  * proving quantized storage plugs into the whole neighbor family
  * (exact, LSH, IVF all consume the dequantized frame unchanged).
  */
object Quantize {

  /** Quantize (vec_id, embedding ARRAY<numeric>) to int8 codes:
    * (vec_id, lo DOUBLE, hi DOUBLE, codes ARRAY<INT> in 0..255).
    * A constant vector (hi = lo) quantizes to all-zero codes and
    * reconstructs exactly to `lo`. */
  def quantizeInt8(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .select(col("vec_id"), array_min(col("v")).as("lo"), array_max(col("v")).as("hi"),
        col("v"))
      .select(col("vec_id"), col("lo"), col("hi"),
        when(col("hi") === col("lo"), expr("transform(v, x -> cast(0 AS INT))"))
          .otherwise(
            expr("transform(v, x -> cast(round(((x - lo) * 255.0) / (hi - lo)) AS INT))"))
          .as("codes"))

  /** Reconstruct double vectors from [[quantizeInt8]] output:
    * (vec_id, embedding ARRAY<DOUBLE>) — named `embedding` so the
    * frame drops into every neighbor operator unchanged. */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized.select(col("vec_id"),
      expr("transform(codes, c -> lo + (cast(c AS DOUBLE) * (hi - lo)) / 255.0)")
        .as("embedding"))

  /** Johnson–Lindenstrauss sign random projection (d70) — reduce
    * `embedding` to `outDim` dimensions with a deterministic ±1 matrix
    * (Achlioptas 2003's database-friendly projection, signs drawn from
    * md5 of the (row, column) pair instead of a seeded RNG so the
    * matrix is reproducible across runs AND engines — the d21/d29 coin
    * convention): y_j = Σ_i sign(i,j)·x_i / √outDim, each component
    * rounded at 4 decimals (the per-component sum is the one
    * order-sensitive float op, the d44 convention). Out: (vec_id,
    * embedding ARRAY<DOUBLE>) — named `embedding` so the projected
    * frame drops into the whole neighbor family unchanged (d71 gates
    * exactly that composition).
    *
    * Scale: a narrow per-row chain of codegen'd collection expressions
    * — no UDF, no shuffle, no broadcast matrix, streaming-safe; at
    * 100 TB the projection IS the scan. The 4x-64x width reduction it
    * buys turns every downstream shuffle/index of the neighbor family
    * into one over short vectors. */
  def randomProject(vectors: DataFrame, outDim: Int = 16, dim: Int = 0): DataFrame = {
    require(outDim >= 1, "need outDim >= 1")
    // The ±1 matrix is constant in (i, j) — hashing it per ROW was pure
    // waste (measured 3.5 s at 2000x64 sf0.1: 2M interpreted md5/conv
    // chains for 1024 distinct values). Precompute the signs driver-side
    // from the SAME md5 coin the oracle evaluates in SQL — values are
    // identical, so the hash gate is untouched — and project with
    // native vec_dot against the literal rows (same ascending
    // summation order as the previous per-element fold). `dim = 0`
    // derives the width from the first row (batch); streaming callers
    // pass it explicitly (a take(1) probe cannot run on a stream).
    val d = if (dim > 0) dim else {
      val row = vectors.select(size(col("embedding"))).take(1)
      require(row.nonEmpty && !row(0).isNullAt(0),
        "need at least one vector (or pass dim explicitly)")
      row(0).getInt(0)
    }
    val signs: Seq[Seq[Double]] = (0 until outDim).map { j =>
      (0 until d).map(i => if (md5Coin(s"${i}_$j")) 1.0 else -1.0)
    }
    val signLit = typedLit(signs)
    val ys = (0 until outDim).map { j =>
      round(call_function("vec_dot", col("v"), element_at(signLit, lit(j + 1)))
        / sqrt(lit(outDim.toDouble)), 4)
    }
    vectors
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .select(col("vec_id"), array(ys: _*).as("embedding"))
  }

  /** The d21/d29/d70 md5 coin for key `s`: true iff
    * conv(substring(md5(s), 1, 8), 16, 10) is even — i.e. the low bit
    * of md5's 4th byte is 0. */
  private def md5Coin(s: String): Boolean = {
    val dg = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (dg(3) & 1) == 0
  }

  /** [[randomProject]] in long form — (vec_id, j, y), one row per
    * projected component — the driver/oracle binding (the typed compare
    * has no canonical cross-engine arrow list type, the d40 note). */
  def randomProjectLong(vectors: DataFrame, outDim: Int = 16): DataFrame =
    randomProject(vectors, outDim)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("long").as("j"),
        col("col").as("y"))

  def queries: Seq[Q] = Seq(

    // d40: the quantization arithmetic itself, hash-gated — codes are
    // joined to a string because the driver's typed compare has no
    // canonical cross-engine arrow list type. The LIBRARY form keeps
    // the real ARRAY<INT> column.
    Q("d40_quantize_int8",
      (s, d) => quantizeInt8(Tables.embeddings(s, d))
        .select(col("vec_id"), col("lo"), col("hi"),
          array_join(col("codes"), ",").as("codes")),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |b AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM e)
             |SELECT vec_id, lo, hi,
             |       array_to_string(
             |         CASE WHEN hi = lo THEN list_transform(v, x -> CAST(0 AS INTEGER))
             |              ELSE list_transform(v,
             |                x -> CAST(round(((x - lo) * 255.0) / (hi - lo)) AS INTEGER))
             |         END, ',') AS codes
             |FROM b""".stripMargin)),

    // d41: exact cosine top-3 over the quantize -> dequantize round
    // trip. Both engines reconstruct with the identical expression and
    // rank with d07's (sim DESC, neighbor ASC) total order, so the
    // whole storage-quantized retrieval path is hash-adjudicated —
    // including the extra sim ties coarse codes introduce.
    Q("d41_topk_quantized",
      (s, d) => Similarity.cosineTopK(dequantize(quantizeInt8(Tables.embeddings(s, d)))),
      Some("""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |b AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM e0),
             |qz AS (
             |  SELECT vec_id, lo, hi,
             |         CASE WHEN hi = lo THEN list_transform(v, x -> CAST(0 AS INTEGER))
             |              ELSE list_transform(v,
             |                x -> CAST(round(((x - lo) * 255.0) / (hi - lo)) AS INTEGER))
             |         END AS codes
             |  FROM b),
             |e AS (
             |  SELECT vec_id,
             |         list_transform(codes, c -> lo + (CAST(c AS DOUBLE) * (hi - lo)) / 255.0) AS v
             |  FROM qz),
             |sim AS (
             |  SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
             |         list_dot_product(q.v, c.v)
             |           / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
             |  FROM e q JOIN e c ON q.vec_id <> c.vec_id)
             |SELECT vec_id, rank, neighbor_id FROM (
             |  SELECT vec_id, neighbor_id,
             |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank
             |  FROM sim)
             |WHERE rank <= 3""".stripMargin)),

    // d70: the projection arithmetic itself, hash-gated in long form
    // (one row per projected component; see the d40 arrow-list note).
    Q("d70_random_project",
      (s, d) => randomProjectLong(Tables.embeddings(s, d)),
      Some("""WITH x AS (
             |  SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS v
             |  FROM embeddings, UNNEST(range(len(embedding))) AS t(i))
             |SELECT vec_id, j,
             |       round(sum(v * CASE WHEN CAST('0x' || substr(md5(i || '_' || j), 1, 8)
             |                               AS BIGINT) % 2 = 0
             |                     THEN 1.0 ELSE -1.0 END)
             |             / sqrt(16.0), 4) AS y
             |FROM x, UNNEST(range(16)) AS tj(j)
             |GROUP BY vec_id, j""".stripMargin)),

    // d71: exact cosine top-3 over the PROJECTED vectors — the whole
    // reduced-width retrieval path hash-adjudicated end-to-end (the
    // d41 pattern applied to dimensionality reduction; both engines
    // replay the deterministic projection, so ranks compare exactly,
    // including the extra sim ties a 16-wide space introduces).
    Q("d71_topk_projected",
      (s, d) => Similarity.cosineTopK(randomProject(Tables.embeddings(s, d))),
      Some("""WITH x AS (
             |  SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS v
             |  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
             |p AS (
             |  SELECT vec_id, j,
             |       round(sum(v * CASE WHEN CAST('0x' || substr(md5(i || '_' || j), 1, 8)
             |                               AS BIGINT) % 2 = 0
             |                     THEN 1.0 ELSE -1.0 END)
             |             / sqrt(16.0), 4) AS y
             |  FROM x, UNNEST(range(16)) AS tj(j)
             |  GROUP BY vec_id, j),
             |e AS (SELECT vec_id, list(y ORDER BY j) AS v FROM p GROUP BY vec_id),
             |sim AS (
             |  SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
             |         list_dot_product(q.v, c.v)
             |           / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
             |  FROM e q JOIN e c ON q.vec_id <> c.vec_id)
             |SELECT vec_id, rank, neighbor_id FROM (
             |  SELECT vec_id, neighbor_id,
             |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank
             |  FROM sim)
             |WHERE rank <= 3""".stripMargin)))
}
