package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SchemaInfer

/** The schema-inference ladder's semantic ground truth is the regex
  * grammar in `SchemaInfer` (`LongPattern`/`DecimalPattern`/
  * `DoublePattern`/`DatePattern` + the bool IN-list) — the DuckDB oracle
  * runs those verbatim. The Spark plan, however, executes the single-pass
  * byte-walk `TypeProbeExpr` (round 7: the regex stack was 8.6 s at
  * sf0.1, the walk is at the scan+cast floor). This spec holds the two
  * formulations together: on adversarial generated strings and a hand
  * edge list, every rung bit of the walk must equal the regex verdict,
  * and the packed decimal widths must match the regex-extraction widths
  * whenever the decimal rung passes (the only state SchemaInfer reads
  * them in).
  *
  * One DELIBERATE divergence, asserted below rather than papered over:
  * Java regex `$` also matches before a trailing '\n', so the old
  * regexp_like formulation accepted "123\n" as long — but DuckDB's RE2
  * anchors `$` at end-of-text and rejected it. The byte-walk sides with
  * RE2/the oracle (strict end-of-string), closing a latent cross-engine
  * divergence the fixtures never exposed. The reference reference for
  * rung semantics: /root/reference/etl_benchmark.py:27 (parquet
  * self-description; the ladder is our schemaless generalization). */
class TypeProbeSpec extends AnyFunSuite {

  // ---- reference implementation: the oracle's regex semantics ---------
  // String.matches == whole-string match == RE2's anchored behavior
  // (strict end-of-text, no trailing-newline allowance).

  private val boolSet = SchemaInfer.BoolStrings.toSet

  private def refFlags(raw: String): (Boolean, Boolean, Boolean, Boolean, Boolean, Int, Int) = {
    val t = raw.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val longShape = t.matches(SchemaInfer.LongPattern)
    val digits = t.replaceFirst("^[+-]?0*", "")
    val longOk = longShape && (digits.length < 19 ||
      (digits.length == 19 &&
        (if (t.startsWith("-")) digits <= "9223372036854775808"
         else digits <= "9223372036854775807")))
    val decShape = t.matches(SchemaInfer.DecimalPattern)
    val body = t.replaceFirst("^[+-]", "")
    val ipRun = body.takeWhile(_.isDigit)
    val dip = ipRun.dropWhile(_ == '0').length
    val dsc = {
      val m = java.util.regex.Pattern.compile("\\.([0-9]+)$").matcher(body)
      if (m.find()) m.group(1).length else 0
    }
    val decOk = decShape && dip + dsc <= 38
    val dblOk = t.matches(SchemaInfer.DoublePattern)
    val boolOk = boolSet.contains(t.toLowerCase)
    val dateShape = t.matches(SchemaInfer.DatePattern)
    (longOk, decOk, dblOk, boolOk, dateShape, dip, dsc)
  }

  private def agree(raw: String): Boolean = {
    val p = TypeProbeExpr.probe(UTF8String.fromString(raw))
    val (longOk, decOk, dblOk, boolOk, dateShape, dip, dsc) = refFlags(raw)
    val bitsOk =
      ((p & TypeProbeExpr.LongOk) != 0) == longOk &&
      ((p & TypeProbeExpr.DecOk) != 0) == decOk &&
      ((p & TypeProbeExpr.DblOk) != 0) == dblOk &&
      ((p & TypeProbeExpr.BoolOk) != 0) == boolOk &&
      ((p & TypeProbeExpr.DateShape) != 0) == dateShape
    // widths are only contractual when the decimal rung passes
    val widthsOk = !decOk ||
      (((p >> TypeProbeExpr.DipShift) & TypeProbeExpr.WidthMask) == dip &&
       ((p >> TypeProbeExpr.DscShift) & TypeProbeExpr.WidthMask) == dsc)
    bitsOk && widthsOk
  }

  // ---- generators: adversarial numeric-ish strings --------------------

  private val genNumericish: Gen[String] = for {
    pad1 <- Gen.stringOf(Gen.const(' ')).map(_.take(2))
    sign <- Gen.oneOf("", "+", "-", "--", "+-")
    zeros <- Gen.oneOf("", "0", "000")
    digits <- Gen.oneOf(
      Gen.numStr.map(_.take(25)),
      // around the int64 boundary: 18-20 digit strings near max
      Gen.chooseNum(0L, Long.MaxValue).map(_.toString),
      Gen.oneOf("9223372036854775806", "9223372036854775807",
        "9223372036854775808", "9223372036854775809",
        "9999999999999999999", "1" + "0" * 19))
    dot <- Gen.oneOf("", ".", ".5", ".50", ".000001", "." + "9" * 35, "..")
    exp <- Gen.oneOf("", "e5", "E+10", "e-0", "e", "E+", "e5.5")
    junk <- Gen.oneOf("", " ", "x", "\n", "\t", " 1", "-")
    pad2 <- Gen.stringOf(Gen.const(' ')).map(_.take(2))
  } yield pad1 + sign + zeros + digits + dot + exp + junk + pad2

  private val genWordish: Gen[String] = for {
    w <- Gen.oneOf("t", "T", "true", "TRUE", "True", "y", "yes", "YES", "1",
      "0", "f", "F", "false", "FALSE", "n", "no", "NO", "tru", "truee",
      "ja", "on", "off", "")
    pad <- Gen.oneOf("", " ", "  ", "\n")
  } yield pad + w + pad.reverse

  private val genDateish: Gen[String] = for {
    y <- Gen.oneOf("2020", "0001", "999", "20200")
    m <- Gen.oneOf("01", "12", "13", "00", "1")
    d <- Gen.oneOf("01", "31", "99", "007", "7")
    sep <- Gen.oneOf("-", "/", "")
    extra <- Gen.oneOf("", " 12:34:56", "T00:00:00", "\n")
  } yield s"$y$sep$m$sep$d$extra"

  private val genAny: Gen[String] =
    Gen.oneOf(genNumericish, genWordish, genDateish,
      Gen.asciiPrintableStr.map(_.take(30)),
      // non-ASCII: full-width digits, nbsp padding, accents — regex [0-9]
      // is ASCII-only and so is the byte-walk
      Gen.oneOf("１２３", " 1", "1 ", "٣٤٥", "über", "3·5"))

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), p)
    assert(res.passed, s"$name: $res")
  }

  test("probe bits == oracle regex semantics on generated strings") {
    check("probe-vs-regex")(Prop.forAll(genAny) { s => agree(s) })
  }

  test("hand edge list: boundaries, widths, shapes, unicode") {
    val edges = Seq(
      "", " ", "  ", "+", "-", ".", "+.", "-.", "..", "0", "00", "+0", "-0",
      "1", "-1", "+1", " 42 ", "042", "  -0042  ",
      "9223372036854775807", "9223372036854775808", "-9223372036854775808",
      "-9223372036854775809", "+9223372036854775807", "0009223372036854775807",
      "99999999999999999999", "9" * 38, "9" * 39, "0" * 40,
      "17.0", "17.50", "0017.50", "0.5", ".5", "1.", "1..2", "1.2.3",
      "1" + "0" * 37 + ".5", "1." + "9" * 37, "0." + "0" * 37 + "1",
      "1e5", "1E5", "1e+5", "1e-5", "1.5e10", ".5e3", "1.e3", "1e", "1e+",
      "1e5.5", "e5", "E", "NaN", "Infinity", "-Infinity", "nan", "inf",
      "t", "T", "true", "TRUE", "tRuE", "yes", "y", "n", "no", "f", "false",
      "FALSE", "0", "1", "on", "off", "truth", " true ", "true\n",
      "2020-01-01", "2020-13-45", "0000-00-00", "999-01-01", "02020-01-01",
      "2020/01/01", "2020-1-1", "2020-01-01 12:34:56", "2020-01-01\n",
      "123\n", "123\t", "\n123", " 123\n ",
      "１２３", " 1", "1 ", "٣٤٥", "über", "3·5", "🙂", "1🙂")
    edges.foreach { s =>
      assert(agree(s), s"disagreement on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("null flows through the expression as null") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val e = TypeProbeExpr(Literal(null, StringType))
    assert(e.eval(null) == null)
    val e2 = TypeProbeExpr(Literal(UTF8String.fromString("17.50"), StringType))
    val p = e2.eval(null).asInstanceOf[Long]
    assert((p & TypeProbeExpr.DecOk) != 0 &&
      ((p >> TypeProbeExpr.DipShift) & TypeProbeExpr.WidthMask) == 2 &&
      ((p >> TypeProbeExpr.DscShift) & TypeProbeExpr.WidthMask) == 2)
  }
}
