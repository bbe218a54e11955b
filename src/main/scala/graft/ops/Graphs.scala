package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Distributed graph analytics over relationship data the warehouse
  * already holds — the co-occurrence graph build, fixed-point PageRank,
  * and degree-oriented triangle counting that power "related items",
  * influence ranking, and community-density diagnostics at corpus scale.
  *
  * All three are expressed as joins + aggregations on edge lists (no
  * driver-side graph object, no collect): the natural Spark shape, where
  * every step shuffles on a node or edge key and therefore scales
  * horizontally. Ranks use scaled integer arithmetic (fixed-point longs)
  * so results are bit-exact and engine-independent — the d124/d125
  * convention: keep the iterated arithmetic in integers, never let two
  * engines disagree on a float reduction order.
  */
object Graphs {

  /** Fixed-point scale for PageRank: ranks are longs in units of
    * 1e-6 "probability mass per node" (initial rank = Scale). */
  val Scale = 1000000L

  /** Item co-occurrence graph (d127): undirected weighted edges between
    * items that appear in the same basket — the input graph for
    * "related items", item clustering, and the triangle census. In:
    * baskets (basket_id, item_id), any dup multiplicity. Out:
    * (src, dst, weight) with src < dst, weight = #distinct baskets
    * containing both, pruned to weight >= minSupport.
    *
    * Scale: the classic market-basket shape — pair generation is the
    * per-basket self-join, bounded by basket size squared (baskets are
    * small by domain; a runaway basket would be capped upstream by a
    * Gopher-style gate), then one pair-keyed count. Never an item×item
    * cartesian: pairs only materialize where a basket witnesses them.
    * The distinct() first collapses multiplicity (lineitem can repeat a
    * part within an order) so the self-join fans out on the smallest
    * possible frame. */
  def copurchaseEdges(baskets: DataFrame, minSupport: Long = 2L): DataFrame = {
    val bi = baskets.toDF("basket_id", "item_id").distinct()
    val a = bi.toDF("basket_id", "src")
    val b = bi.toDF("basket_id", "dst")
    a.join(b, Seq("basket_id"))
      .where(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
      .where(col("weight") >= minSupport)
  }

  /** PageRank (d128), fixed iteration count, fixed-point integer
    * arithmetic. In: directed edges (src, dst) — pass both directions
    * for an undirected graph. Out: (node, rank) for every node incident
    * to an edge; rank is a long in units of 1e-6 (initial = 1e6), so
    * ranks are comparable across nodes and the total mass is ~1e6 ×
    * #nodes minus documented truncation.
    *
    * Semantics (bit-exact in any engine): r0(n) = Scale;
    * r_{t+1}(n) = (15·Scale) div 100
    *            + (85 · (Σ_{m→n} (r_t(m) div outdeg(m)) + dangling div N)) div 100
    * where dangling = Σ r_t(m) over nodes with no out-edges (their mass
    * is redistributed uniformly; the div-remainders are dropped — a
    * deterministic truncation of at most N·1e-6 mass per iteration).
    * Division is integer floor-div throughout, so the iteration is pure
    * long arithmetic: no float reduction order to disagree on, and the
    * oracle replays it exactly.
    *
    * Scale: each iteration is one edge-keyed equi-join (edges × a
    * #nodes-row rank frame — AQE broadcasts the rank side only if tiny;
    * at 1e9 nodes it's a shuffle join partitioned on the node key, the
    * shape you want), one dst-keyed partial-aggregated sum, and a 1-row
    * dangling total broadcast. The plan unrolls `iterations` times;
    * beyond ~10 iterations a production caller should localCheckpoint
    * the rank frame per iteration to cut lineage — at the default 3 the
    * unrolled plan is the cheaper choice (no materialization barrier).
    * Long-overflow headroom: Σ inbound ≤ N·Scale·85 ≈ 8.5e16 at N=1e9,
    * well inside Long. */
  def pageRank(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.toDF("src", "dst").distinct()
    // node universe + out-degree (0 for dst-only nodes = dangling)
    val outdeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(outdeg, Seq("node"), "left")
      .na.fill(0L, Seq("outdeg"))
    val nNodes = nodes.select(count(lit(1)).as("n_nodes"))

    var ranks = nodes.select(col("node"), col("outdeg"), lit(Scale).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = ranks.where(col("outdeg") > 0)
        .select(col("node").as("src"), expr("rank div outdeg").as("contrib"))
      val inbound = e.join(contrib, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("inbound"))
      val dangling = ranks.select(
        sum(when(col("outdeg") === 0, col("rank")).otherwise(lit(0L))).as("dangling"))
      ranks = ranks.select(col("node"), col("outdeg"))
        .join(inbound, Seq("node"), "left")
        .na.fill(0L, Seq("inbound"))
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nNodes))
        .select(col("node"), col("outdeg"),
          (lit(15L * Scale / 100L) +
            expr("85 * (inbound + dangling div n_nodes) div 100")).as("rank"))
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Triangle census (d129): the number of triangles in an undirected
    * graph, plus node/edge counts — the standard clustering-density
    * diagnostic. In: undirected distinct edges (src, dst), src < dst.
    * Out: one row (n_nodes, n_edges, n_triangles), exact longs.
    *
    * Algorithm: degree orientation (Schank & Wagner / the MapReduce
    * node-iterator) — orient every edge from the lower (degree, id)
    * endpoint to the higher, enumerate wedges at the low vertex, and
    * close them against the oriented edge set. Each triangle is counted
    * exactly once (its vertices totally ordered by (degree, id)), and
    * the oriented out-degree is bounded by O(√m), so wedge fan-out is
    * O(m^1.5) worst-case instead of Σ deg² — the hub-safe formulation:
    * a celebrity node with 1e7 neighbors produces no wedges at itself,
    * because all its edges orient inward.
    *
    * Scale: two edge-keyed joins and one count — no adjacency lists in
    * memory, no driver state. Wedge volume is the only superlinear term
    * and the orientation bounds it. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.toDF("src", "dst").distinct()
    val sym = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // orient: (deg, id)-lexicographic low -> high; carry the high end's
    // order key so the wedge join can order its two far endpoints
    val ed = e
      .join(deg.select(col("u").as("src"), col("d").as("ds")), Seq("src"))
      .join(deg.select(col("u").as("dst"), col("d").as("dd")), Seq("dst"))
    val oriented = ed.select(
      when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")), col("src"))
        .otherwise(col("dst")).as("a"),
      when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")), col("dst"))
        .otherwise(col("src")).as("b"),
      when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")),
        struct(col("dd"), col("dst"))).otherwise(struct(col("ds"), col("src"))).as("bk"))
    // wedges at the low vertex: unordered far-endpoint pairs via the
    // (degree, id) order, closed against the undirected edge set keyed
    // by (min, max) id — the closing edge's stored orientation
    val w1 = oriented.select(col("a"), col("b").as("x"), col("bk").as("xk"))
    val w2 = oriented.select(col("a"), col("b").as("y"), col("bk").as("yk"))
    val wedges = w1.join(w2, Seq("a")).where(col("xk") < col("yk"))
      .select(least(col("x"), col("y")).as("src"), greatest(col("x"), col("y")).as("dst"))
    val nTri = wedges.join(e, Seq("src", "dst")).select(count(lit(1)).as("n_triangles"))
    val nNodes = deg.select(count(lit(1)).as("n_nodes"))
    val nEdges = e.select(count(lit(1)).as("n_edges"))
    broadcast(nNodes).crossJoin(broadcast(nEdges)).crossJoin(broadcast(nTri))
  }

  // ---- registered queries --------------------------------------------------

  /** Distinct (order, part) pairs — the basket frame for d127/d129. */
  private def orderBaskets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))

  /** Customer–supplier interaction graph, symmetrized, with the two key
    * spaces disambiguated by even/odd node ids (cust → 2k, supp → 2k+1)
    * — the d128 input. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val l = lineitem(s, d).select(col("l_orderkey").as("o_orderkey"), col("l_suppkey"))
    val directed = o.join(l, Seq("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    directed.union(directed.select(col("dst").as("src"), col("src").as("dst")))
  }

  private val copurchaseSql =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS basket_id, l_partkey AS item_id FROM lineitem)
      |SELECT a.item_id AS src, b.item_id AS dst, CAST(count(*) AS BIGINT) AS weight
      |FROM op a JOIN op b ON a.basket_id = b.basket_id AND a.item_id < b.item_id
      |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  def queries: Seq[Q] = Seq(

    // d127: the basket co-occurrence graph — integer weights, exact.
    Q("d127_copurchase_edges",
      (s, d) => copurchaseEdges(orderBaskets(s, d)),
      Some(copurchaseSql)),

    // d128: 3-iteration fixed-point PageRank over the symmetrized
    // customer–supplier graph — pure long arithmetic, the oracle
    // replays the identical truncating iteration.
    Q("d128_pagerank",
      (s, d) => pageRank(tradeEdges(s, d), iterations = 3),
      Some("""WITH el AS (
             |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
             |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
             |e AS (SELECT src, dst FROM el UNION SELECT dst, src FROM el),
             |od AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
             |nodes AS (
             |  SELECT node, coalesce(outdeg, 0) AS outdeg
             |  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)
             |  LEFT JOIN od USING (node)),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
             |r0 AS (SELECT node, outdeg, CAST(1000000 AS BIGINT) AS rank FROM nodes),
             |i1 AS (SELECT e.dst AS node, CAST(sum(r.rank // r.outdeg) AS BIGINT) AS inbound
             |       FROM e JOIN r0 r ON r.node = e.src AND r.outdeg > 0 GROUP BY 1),
             |g1 AS (SELECT CAST(coalesce(sum(CASE WHEN outdeg = 0 THEN rank ELSE 0 END), 0) AS BIGINT) AS dangling FROM r0),
             |r1 AS (SELECT n.node, n.outdeg,
             |         150000 + 85 * (coalesce(i.inbound, 0) + g.dangling // nn.n_nodes) // 100 AS rank
             |       FROM nodes n LEFT JOIN i1 i USING (node) CROSS JOIN g1 g CROSS JOIN nn),
             |i2 AS (SELECT e.dst AS node, CAST(sum(r.rank // r.outdeg) AS BIGINT) AS inbound
             |       FROM e JOIN r1 r ON r.node = e.src AND r.outdeg > 0 GROUP BY 1),
             |g2 AS (SELECT CAST(coalesce(sum(CASE WHEN outdeg = 0 THEN rank ELSE 0 END), 0) AS BIGINT) AS dangling FROM r1),
             |r2 AS (SELECT n.node, n.outdeg,
             |         150000 + 85 * (coalesce(i.inbound, 0) + g.dangling // nn.n_nodes) // 100 AS rank
             |       FROM nodes n LEFT JOIN i2 i USING (node) CROSS JOIN g2 g CROSS JOIN nn),
             |i3 AS (SELECT e.dst AS node, CAST(sum(r.rank // r.outdeg) AS BIGINT) AS inbound
             |       FROM e JOIN r2 r ON r.node = e.src AND r.outdeg > 0 GROUP BY 1),
             |g3 AS (SELECT CAST(coalesce(sum(CASE WHEN outdeg = 0 THEN rank ELSE 0 END), 0) AS BIGINT) AS dangling FROM r2),
             |r3 AS (SELECT n.node, n.outdeg,
             |         150000 + 85 * (coalesce(i.inbound, 0) + g.dangling // nn.n_nodes) // 100 AS rank
             |       FROM nodes n LEFT JOIN i3 i USING (node) CROSS JOIN g3 g CROSS JOIN nn)
             |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3""".stripMargin)),

    // d129: triangle census of the support->=2 co-purchase graph —
    // one exact-integer summary row.
    Q("d129_triangles",
      (s, d) => triangleStats(
        copurchaseEdges(orderBaskets(s, d)).select(col("src"), col("dst"))),
      Some(s"""WITH e AS ($copurchaseSql),
              |sym AS (SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e),
              |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
              |o AS (SELECT CASE WHEN (d1.d, e.src) < (d2.d, e.dst) THEN e.src ELSE e.dst END AS a,
              |             CASE WHEN (d1.d, e.src) < (d2.d, e.dst) THEN e.dst ELSE e.src END AS b,
              |             CASE WHEN (d1.d, e.src) < (d2.d, e.dst) THEN d2.d ELSE d1.d END AS bd
              |      FROM e JOIN deg d1 ON d1.u = e.src JOIN deg d2 ON d2.u = e.dst)
              |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
              |       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
              |       (SELECT CAST(count(*) AS BIGINT)
              |        FROM o e1 JOIN o e2 ON e1.a = e2.a AND (e1.bd, e1.b) < (e2.bd, e2.b)
              |        JOIN e ON e.src = least(e1.b, e2.b) AND e.dst = greatest(e1.b, e2.b))
              |         AS n_triangles""".stripMargin)))
}
