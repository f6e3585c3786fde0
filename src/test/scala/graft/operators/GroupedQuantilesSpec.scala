package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GroupedQuantilesSpec extends SparkSpec {

  test("per-group rank selection equals driver-side sorted groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // skewed group sizes + heavy value ties to stress bucket degeneracy
    val rows = (0 until 20000).map { i =>
      val grp = if (i % 7 == 0) "a" else if (i % 3 == 0) "b" else "c"
      (grp, math.floor(rnd.nextGaussian() * 50) / 10.0, i)
    }
    val df = rows.toDF("g", "v", "id")
    def ranks(n: Long): Seq[Long] =
      Seq(0L, (n + 1) / 2 - 1, math.ceil(0.9 * n).toLong - 1, n - 1)
    for (maxCollect <- Seq(64000000L, 4L)) {
      val res = GroupedQuantiles.selectByRank(df, "g", "v", ranks,
        numBuckets = 32, sampleSize = 1000, maxCollect = maxCollect)
      val byGroup = rows.groupBy(_._1)
      assert(res.keySet == byGroup.keySet)
      byGroup.foreach { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        val (n, byRank) = res(g)
        assert(n == rs.size.toLong)
        ranks(n).foreach { r =>
          assert(byRank(r) == sorted(r.toInt), s"group $g rank $r (maxCollect=$maxCollect)")
        }
      }
    }
  }

  test("null values get no rank; counts are non-null counts") {
    import spark.implicits._
    val df = Seq(("a", Some(3.0)), ("a", None), ("a", Some(1.0)), ("b", Some(5.0)))
      .toDF("g", "v")
    val res = GroupedQuantiles.selectByRank(df, "g", "v", n => Seq(0L, n - 1))
    assert(res("a")._1 == 2 && res("a")._2(0L) == 1.0 && res("a")._2(1L) == 3.0)
    assert(res("b")._1 == 1 && res("b")._2(0L) == 5.0)
  }
}
