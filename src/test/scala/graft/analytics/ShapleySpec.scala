package graft.analytics

import graft.SparkSpec

/** The lattice-computed Shapley attribution must equal the DEFINITION —
  * the average over all n! channel orderings of each channel's marginal
  * contribution — and satisfy the axioms that make it "the fair split".
  */
class ShapleySpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force φᵢ·n! from the permutation definition, for
    * v(S) = #{masks m : m ⊆ S}.
    */
  private def bruteForce(masks: Seq[Int], n: Int): Map[Int, Long] = {
    def v(s: Int): Long = masks.count(m => (m & ~s) == 0).toLong
    val phi = Array.fill(n)(0L)
    (0 until n).permutations.foreach { perm =>
      var s = 0
      perm.foreach { i =>
        phi(i) += v(s | (1 << i)) - v(s)
        s |= 1 << i
      }
    }
    (0 until n).map(i => i -> phi(i)).toMap
  }

  private def run(masks: Seq[Int], channels: Seq[String]): Map[String, Long] =
    Shapley.attribution(masks.toDF("mask"), channels)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("matches the permutation definition on random mask multisets") {
    val rnd = new scala.util.Random(13)
    val channels = Seq("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val masks = Seq.fill(30 + trial)(rnd.nextInt(16))
      val expected = bruteForce(masks, 4)
      val got = run(masks, channels)
      channels.zipWithIndex.foreach { case (ch, i) =>
        assert(got(ch) == expected(i),
          s"trial $trial channel $ch: ${got(ch)} != ${expected(i)}")
      }
    }
  }

  test("efficiency: shares sum to v(full) - v(empty), scaled by n!") {
    val masks = Seq(0, 1, 1, 3, 5, 7, 8, 15, 15, 2)
    val out = Shapley.attribution(masks.toDF("mask"), Seq("a", "b", "c", "d"))
      .collect()
    val sumPhi = out.map(_.getLong(2)).sum
    val vFull = masks.size.toLong       // every mask ⊆ full
    val vEmpty = masks.count(_ == 0).toLong
    assert(sumPhi == 24L * (vFull - vEmpty))
  }

  test("null player gets zero; symmetric players get equal credit") {
    // channel 3 (bit 3) is touched by nobody → null player, φ = 0;
    // bits 0 and 1 always co-occur → symmetric, equal φ
    val masks = Seq(3, 3, 7, 4, 0)
    val got = run(masks, Seq("a", "b", "c", "d"))
    assert(got("d") == 0L)
    assert(got("a") == got("b"))
  }

  test("rejects more than 8 channels") {
    intercept[IllegalArgumentException] {
      Shapley.attribution(Seq(0).toDF("mask"), (1 to 9).map("c" + _))
    }
  }
}
