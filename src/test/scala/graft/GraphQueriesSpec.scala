package graft

import graft.ops.GraphQueries
import graft.tables.Tables

/** Exact integer recompute of the fixed-point PageRank (sf0.001) — the
  * whole point of the fixed-point formulation is that a driver-side Long
  * loop must reproduce the distributed result BIT-identically, not
  * approximately. */
class GraphQueriesSpec extends SparkSpec {

  private def recompute(iters: Int): (Map[Long, Long], Map[Long, Long]) = {
    val t = Tables(spark, sf)
    val custOfOrder = t.orders.select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = t.lineitem.select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => custOfOrder.get(r.getLong(0)).map(c => (c * 2, r.getLong(1) * 2 + 1)))
      .distinct
    val edges = pairs ++ pairs.map { case (u, v) => (v, u) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr: Map[Long, Long] = deg.map { case (n, _) => n -> GraphQueries.PrScale }
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = in.map { case (n, m) =>
        n -> (GraphQueries.PrTeleport +
          GraphQueries.PrDampNum * m / GraphQueries.PrDampDen)
      }
    }
    (pr, deg)
  }

  test("fixed-point pagerank = exact driver-side integer recompute") {
    val (pr, deg) = recompute(GraphQueries.PrIters)
    val got = GraphQueries.pagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got.map(g => g._1 -> g._3).toMap shouldBe pr // bit-exact, no tolerance
    got.foreach { case (node, kind, rank) =>
      kind shouldBe (if (node % 2 == 0) "cust" else "supp")
      assert(rank >= GraphQueries.PrTeleport, s"node $node rank $rank below teleport floor")
    }
    // every graph node is ranked (undirected edges → no dangling nodes)
    got.map(_._1).toSet shouldBe deg.keySet
  }

  test("pagerank honors the iters argument (1 round, still bit-exact)") {
    val (pr, _) = recompute(1)
    GraphQueries.pagerank(spark, sf, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap shouldBe pr
    assert(pr.values.toSet.size > 1, "one round must already differentiate ranks")
  }
}
