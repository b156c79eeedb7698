package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two boundary guards exist to turn silent wrong answers into loud
  * errors — so prove they actually raise. decimalBoundaryToLong must error
  * (not NULL, not wrap) when the working decimal exceeds BIGINT;
  * overflowGuard must error when a stat column arrives NULL (the shape a
  * non-ANSI decimal overflow produces mid-plan).
  */
class BoundaryGuardSpec extends SparkSpec {
  import spark.implicits._

  private def expectRaise(body: => Unit, needle: String): Unit = {
    val e = intercept[Exception](body)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains(needle)),
      s"expected an error mentioning '$needle', got: ${e.getMessage}")
  }

  test("decimalBoundaryToLong passes exact in-range values through") {
    // accepted domain is the symmetric ±(2^63−1); exactly −2^63 raises
    // too (documented one-value conservatism at the negative edge)
    val df = Seq("9223372036854775807", "-9223372036854775807", "0")
      .toDF("s")
      .selectExpr("CAST(s AS DECIMAL(38,0)) AS x")
      .selectExpr(Fixtures.decimalBoundaryToLong("x"))
    assert(df.as[Long].collect().toSet ==
      Set(Long.MaxValue, -Long.MaxValue, 0L))
  }

  test("decimalBoundaryToLong raises past 2^63-1 instead of NULLing") {
    expectRaise(
      Seq("9223372036854775808").toDF("s") // Long.MaxValue + 1
        .selectExpr("CAST(s AS DECIMAL(38,0)) AS x")
        .selectExpr(Fixtures.decimalBoundaryToLong("x"))
        .collect(),
      "overflows the BIGINT query boundary")
  }

  test("decimalBoundaryToLong raises on NULL (upstream decimal overflow)") {
    // abs(NULL) > lit is NULL → a bare comparison would take the false
    // branch and publish the NULL silently; the guard must trap it.
    expectRaise(
      Seq(Option.empty[java.math.BigDecimal]).toDF("s")
        .selectExpr("CAST(s AS DECIMAL(38,0)) AS x")
        .selectExpr(Fixtures.decimalBoundaryToLong("x"))
        .collect(),
      "overflows the BIGINT query boundary")
  }

  test("overflowGuard raises on a NULL stat column (the overflow shape)") {
    val ok = Seq(Some(5L)).toDF("z2_e6")
    assert(Fixtures.overflowGuard(ok, "z2_e6").as[Long].collect()
      .toSeq == Seq(5L))
    expectRaise(
      Fixtures.overflowGuard(Seq(Option.empty[Long]).toDF("z2_e6"), "z2_e6")
        .collect(),
      "cross-product overflowed")
  }
}
