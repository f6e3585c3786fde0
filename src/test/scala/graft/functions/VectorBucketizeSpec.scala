package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

class VectorBucketizeSpec extends SparkSpec {

  private def thr(rows: (Double, Double)*): Seq[Array[Double]] =
    rows.map { case (a, b) => Array(a, b) }

  test("search counts thresholds lexicographically <= key") {
    val t = Array(1.0, 5.0, /**/ 2.0, 1.0, /**/ 2.0, 3.0, /**/ 4.0, 0.0)
    def s(k: Double*): Int = VectorBucketizeExpr.search(t, 2, k.toArray)
    assert(s(0.0, 0.0) == 0)
    assert(s(1.0, 5.0) == 1) // equal to first threshold -> counted
    assert(s(1.0, 4.9) == 0) // below on the tiebreak field
    assert(s(2.0, 2.0) == 2) // between (2,1) and (2,3)
    assert(s(2.0, 3.0) == 3)
    assert(s(9.0, -1.0) == 4)
  }

  test("codegen agrees with interpreted eval on random keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(2000)((rnd.nextInt(8).toDouble, rnd.nextInt(8).toDouble))
    val ts = thr((1.0, 6.0), (2.0, 2.0), (2.0, 5.0), (5.0, 0.0), (6.0, 7.0))
    val df = rows.toDF("a", "b")
    val out = df.select(col("a"), col("b"),
      VectorBucketizeExpr.vbucketize(Seq(col("a"), col("b")), ts).as("t")).collect()
    val flat = ts.flatten.toArray
    out.foreach { r =>
      val expected = VectorBucketizeExpr.search(flat, 2, Array(r.getDouble(0), r.getDouble(1)))
      assert(r.getInt(2) == expected, r.toString)
    }
  }

  test("null in any key field yields null") {
    import spark.implicits._
    val df = Seq((Some(1.0), Option.empty[Double]), (Some(1.0), Some(2.0)))
      .toDF("a", "b")
    val out = df.select(
      VectorBucketizeExpr.vbucketize(Seq(col("a"), col("b")), thr((0.0, 0.0)))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getInt(0) == 1)
  }

  test("token = count of NTILE bucket-start keys at or below the row key") {
    // 10 rows keyed (v, id), 4 buckets: starts at positions 3, 6, 8 for
    // n=10 (sizes 3,3,2,2). Tokens must be 0,0,0,1,1,1,2,2,3,3 in order.
    import spark.implicits._
    val rows = (0 until 10).map(i => ((i / 3).toDouble, i.toDouble)) // ties in v
    val sorted = rows.sorted
    val starts = Seq(3, 6, 8).map(p => Array(sorted(p)._1, sorted(p)._2))
    val df = rows.toDF("v", "id")
    val out = df.select(col("id"),
        VectorBucketizeExpr.vbucketize(Seq(col("v"), col("id")), starts).as("t"))
      .orderBy("id").collect()
    val expected = Seq(0, 0, 0, 1, 1, 1, 2, 2, 3, 3)
    assert(out.map(_.getInt(1)).toSeq == expected)
  }
}
