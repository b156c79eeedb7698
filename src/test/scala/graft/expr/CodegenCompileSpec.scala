package graft.expr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Transform

/** Regression gate: every custom expression's generated Java must COMPILE —
  * in round 6 `AddressParts.doGenCode` emitted an uncast `compute($c)` call;
  * when the child is a NullType column (untyped NULL literal) its codegen
  * java type is Object, so janino failed and Spark silently fell back to
  * interpreted eval on the transform chain's hottest expression (results
  * right, codegen defeated). The CSE double-use shapes below are kept as a
  * second net for slot-typing regressions from that direction.
  *
  * The suite re-runs the shapes that eval the expressions with
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` (projection/predicate
  * codegen failures throw instead of falling back to interpreted) and
  * `spark.sql.codegen.fallback=false` (whole-stage compile failures throw
  * instead of reverting to the non-fused plan). Under these configs the
  * round-6 bug fails the suite; with the explicit casts it passes.
  */
class CodegenCompileSpec extends SparkSpec {
  import spark.implicits._

  private def withCodegenOnly[A](body: => A): A = {
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      oldMode.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      oldFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("golden transform chain compiles under CODEGEN_ONLY (r6 AddressParts repro)") {
    withCodegenOnly {
      val raw = Seq(
        (1L, "Prodej bytu", "Vinohradská 12, Praha", "80 m2", "3+1", "5 000 000 Kč", "/a"),
        (2L, "Prodej pozemku", "Krátká 2, Olomouc, Olomoucký kraj", "", "", "90 000 Kč", "/i"),
        (3L, "Pronájem bytu", "Náměstí Svobody 5, Brno, Jihomoravský kraj", "100 m2", "2+kk", "900 Kč", "/k")
      ).toDF("id", "purpose", "address", "size_m2", "design", "price_czk", "link")
      val out = Transform(raw, "2026_08_12_080000", Some("raw_x.csv"),
        dedupOrder = Some(col("id"))).as[graft.schema.Property].collect()
      assert(out.length == 3)
    }
  }

  test("NULL-address chain compiles under CODEGEN_ONLY (the exact r6 failing shape)") {
    withCodegenOnly {
      // the untyped null is the point: the address column comes out as
      // NullType, whose codegen java type is Object — the shape that made
      // the uncast `compute($c)` call fail janino in round 6 (the slot is
      // Object even without subexpression elimination)
      val raw = Seq((1L, "Prodej bytu", null, "80 m2", "3+1", "5 000 000 Kc", "/n1"))
        .toDF("id", "purpose", "address", "size_m2", "design", "price_czk", "link")
      val out = Transform(raw, "2026_08_12_080000", Some("raw_x.csv"),
        dedupOrder = Some(col("id"))).collect()
      assert(out.length == 1 && out(0).getAs[String]("region") == "Praha")
    }
  }

  private def strDf: DataFrame =
    Seq("Vinohradská 12, Olomouc, Olomoucký kraj", "malý byt 5 000 Kč the and",
      "aaabbbcccdddeee fff ggg hhh").toDF("s")

  test("string expressions compile under CODEGEN_ONLY (incl. CSE double-use)") {
    withCodegenOnly {
      // each expression's result is referenced twice so common-subexpression
      // elimination kicks in — the shape that produced the Object-typed slot
      val ap = AddressParts(col("s"))
      val rows = strDf.select(
        ap.getField("region").as("r1"),
        ap.getField("address").as("a1"),
        DigitsOnly(col("s")).as("d1"), length(DigitsOnly(col("s"))).as("d2"),
        Transliterate(col("s")).as("t1"), length(Transliterate(col("s"))).as("t2"),
        MinHashSig(col("s"), 3, 8).as("mh1"), size(MinHashSig(col("s"), 3, 8)).as("mh2"),
        NgramHashes(col("s"), 3).as("ng1"), size(NgramHashes(col("s"), 3)).as("ng2"),
        NgramHashSeq(col("s"), 3).as("ns1"), size(NgramHashSeq(col("s"), 3)).as("ns2"),
        SimHashBits(col("s"), md5Base = false).as("sh1"),
        (SimHashBits(col("s"), md5Base = false) + 0L).as("sh2"),
        WinnowSig(col("s")).as("w1"), size(WinnowSig(col("s"))).as("w2"),
        WordShingles(col("s"), 2).as("ws1"), size(WordShingles(col("s"), 2)).as("ws2"),
        VocabHits(col("s"), Seq("the", "and")).as("v1"),
        TextCounts(col("s"), Seq("the"), Seq("the", "and"), Seq("der"), Seq("el"), Seq("le"))
          .getField("n_tokens").as("tc1")
      ).collect()
      assert(rows.length == 3)
    }
  }

  test("array expressions compile under CODEGEN_ONLY (incl. CSE double-use)") {
    withCodegenOnly {
      val df = Seq(
        (Array(1.0f, 2.0f, 3.0f), Array(1L, 2L, 3L), Array(1, 5, 9), Array(1, 9))
      ).toDF("vf", "vl", "set", "probes")
      val rows = df.select(
        CosineSimE6(col("vf"), col("vf")).as("c1"),
        (CosineSimE6(col("vf"), col("vf")) + 0L).as("c2"),
        HyperplaneSig(col("vf"), 16).as("h1"),
        (HyperplaneSig(col("vf"), 16) + 0L).as("h2"),
        LongDot(col("vl"), col("vl")).as("l1"),
        (LongDot(col("vl"), col("vl")) + 0L).as("l2"),
        SigAgreement(col("vl"), col("vl")).as("sa1"),
        (SigAgreement(col("vl"), col("vl")) + 0).as("sa2"),
        SortedSetContainsAll(col("set"), col("probes")).as("ss1"),
        (!SortedSetContainsAll(col("set"), col("probes"))).as("ss2")
      ).collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("c1") == 1000000L)
      assert(rows(0).getAs[Long]("l1") == 14L)
      assert(rows(0).getAs[Int]("sa1") == 3)
      assert(rows(0).getAs[Boolean]("ss1"))
    }
  }
}
