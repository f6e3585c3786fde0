package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("pagerank: mass conserved within quantization, hubs outrank leaves") {
    val rows = Graph.qPagerank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0.0), "every rank strictly positive (teleport floor)")
    // per-node round-6 quantization drifts total mass by at most
    // n * 5e-7 * (1 + d + d^2) per the 3 rounds
    val mass = rows.map(_._2).sum
    val tol = rows.length * 5e-7 * 3 + 1e-6
    assert(math.abs(mass - 1.0) <= tol, s"rank mass $mass outside 1 +- $tol")
    // suppliers are hubs (every supplier serves many customers): the top
    // rank must be a supplier node and the mean supplier rank must exceed
    // the mean customer rank
    val (supp, cust) = rows.partition(_._1.startsWith("s"))
    assert(supp.nonEmpty && cust.nonEmpty)
    assert(rows.maxBy(_._2)._1.startsWith("s"), "top-ranked node must be a supplier hub")
    assert(supp.map(_._2).sum / supp.length > cust.map(_._2).sum / cust.length,
      "mean supplier rank must exceed mean customer rank")
  }
}
