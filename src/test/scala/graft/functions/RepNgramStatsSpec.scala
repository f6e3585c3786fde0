package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** `q_rep_ngram_filters`' ground truth is the unnest/GROUP BY formulation
  * the DuckDB oracle runs; the Spark plan executes the row-local
  * [[RepNgramStatsExpr]] walk. This spec holds the two together: on
  * generated word lists (skewed toward repetition — small vocabularies,
  * duplicated runs) the walk's four counters must equal a plain Scala
  * re-derivation of the n-gram lists, including the short-document rule
  * (fewer than n words → ONE short gram) and empty-string words from
  * double spaces. */
class RepNgramStatsSpec extends AnyFunSuite {

  /** Reference: materialize the gram list exactly as ngrams()/ngramsSql()
    * define it, then count. */
  private def refGrams(ws: Seq[String], n: Int): Seq[String] = {
    val total = math.max(ws.length - (n - 1), 1)
    (0 until total).map(i => ws.slice(i, i + n).mkString(" "))
  }

  private def refStats(ws: Seq[String]): Seq[Int] = {
    val g3 = refGrams(ws, 3)
    val g2 = refGrams(ws, 2)
    val max2 = g2.groupBy(identity).values.map(_.size).max
    Seq(g3.size, g3.distinct.size, g2.size, max2)
  }

  private def walkStats(ws: Seq[String]): Seq[Int] = {
    val arr = new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])
    RepNgramStatsExpr.stats(arr).toIntArray().toSeq
  }

  private val genWords: Gen[List[String]] = for {
    vocabSize <- Gen.choose(1, 8)
    vocab <- Gen.listOfN(vocabSize, Gen.oneOf("a", "bb", "ccc", "d1", "", "x y"))
    len <- Gen.choose(0, 40)
    ws <- Gen.listOfN(len, Gen.oneOf(vocab))
  } yield ws

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), p)
    assert(res.passed, s"$name: $res")
  }

  test("walk counters == materialized gram lists on repetitive word lists") {
    check("rep-ngram-vs-ref")(Prop.forAll(genWords) { ws =>
      ws.isEmpty || walkStats(ws) == refStats(ws)
    })
  }

  test("hand edge list: short docs, empty words, total repetition") {
    val edges = Seq(
      Seq(""), Seq("a"), Seq("a", "b"), Seq("a", "b", "c"),
      Seq("a", "a", "a", "a"), Seq("", "", ""), Seq("a", "", "b"),
      Seq("spam", "spam", "ham", "spam", "spam"),
      (1 to 30).map(i => s"w${i % 3}"))
    for (ws <- edges)
      assert(walkStats(ws) == refStats(ws), s"input $ws")
  }
}
