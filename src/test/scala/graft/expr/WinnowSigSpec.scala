package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WinnowSigSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String, k: Int = 5, w: Int = 4): Seq[Long] =
    Seq(text).toDF("t").select(WinnowSig(col("t"), k, w).as("s"))
      .collect()(0).getSeq[Long](0)

  test("deterministic, normalization-invariant under reflow") {
    val a = sig("The quick brown fox jumps over the lazy dog")
    assert(a.nonEmpty && a == sig("The quick brown fox jumps over the lazy dog"))
    // whitespace/punct/case reflow does not change the signature
    assert(a == sig("the QUICK, brown...   fox-jumps over THE lazy dog!!"))
  }

  test("short and empty texts yield an empty signature") {
    assert(sig("") == Seq.empty)
    assert(sig("ab") == Seq.empty)     // < k normalized chars
    assert(sig("a b !") == Seq.empty)  // 2 normalized chars < k=5
  }

  test("winnowing guarantee: shared run of >= w+k-1 chars overlaps") {
    val shared = "identicalboilerplatelicenseheadertextsharedacrossdocs"
    val d1 = s"unique prefix one $shared"
    val d2 = s"$shared completely different tail material here"
    val s1 = sig(d1).toSet
    val s2 = sig(d2).toSet
    assert(s1.intersect(s2).nonEmpty, "shared substring must share a fingerprint")
    // and unrelated documents (no shared >= w+k-1 run) need not overlap
    val s3 = sig("zebra quokka wombat capable of entirely unrelated prose").toSet
    assert(s1.intersect(s3).isEmpty)
  }

  test("matches an independent reference implementation") {
    def reference(text: String, k: Int, w: Int): Seq[Long] = {
      val norm = text.toLowerCase(java.util.Locale.ROOT)
        .filter(c => c.isDigit || (c >= 'a' && c <= 'z'))
      if (norm.length < k) return Seq.empty
      val grams = norm.sliding(k).toVector
      val hs = grams.map(g => g.foldLeft(0L)((acc, c) => acc * 31 + c))
      val picked = (0 to math.max(hs.length - w, 0)).map { i =>
        val window = hs.slice(i, math.min(i + w, hs.length))
        // rightmost minimum
        val mn = window.min
        window.lastIndexOf(mn) + i
      }.distinct.map(hs)
      picked.distinct.sorted
    }
    for (t <- Seq("The quick brown fox jumps over the lazy dog",
        "aaaaa aaaaa aaaaa", "abcdefghij", "Hello, World! 12345 end")) {
      assert(sig(t) == reference(t, 5, 4), s"mismatch for: $t")
    }
  }

  test("codegen and interpreted paths agree") {
    val df = Seq("some document text for parity checking of the paths").toDF("t")
    val viaExpr = df.select(WinnowSig(col("t")).as("s")).collect()(0).getSeq[Long](0)
    val direct = WinnowSig(
      org.apache.spark.sql.GraftBridge.expression(col("t")), 5, 4)
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(
        "some document text for parity checking of the paths"))
      .toLongArray().toSeq
    assert(viaExpr == direct)
  }
}
