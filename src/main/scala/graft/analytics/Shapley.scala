package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shapley-value attribution over channel coalitions (Shapley 1953; the
  * marketing-attribution use is Dalessandro et al., "Causally motivated
  * attribution for online advertising", ADKDD'12).
  *
  * Input: one row per converting unit carrying `mask`, the bitset of
  * channels it touched (bit i = `channels(i)`). The characteristic
  * function v(S) counts units whose mask ⊆ S; it is monotone, so every
  * marginal v(S∪{i}) − v(S) is ≥ 0. The Shapley value
  *   φᵢ = Σ_{S ∌ i} |S|!·(n−1−|S|)!/n! · [v(S∪{i}) − v(S)]
  * is kept EXACT by scaling with n!: `phi_xnf = φᵢ·n!` is a sum of
  * integer-weighted integer marginals. Σᵢ φᵢ·n! = n!·[v(full) − v(∅)]
  * (the efficiency axiom), which funds the exact `share_ppm`.
  *
  * Scale shape: the caller pays one groupBy to produce `userMask`; from
  * there everything runs on the 2ⁿ-row subset lattice joined against the
  * ≤2ⁿ-row mask census — literal-bounded broadcast frames, nothing that
  * grows with the corpus. n is capped at 8 (a 256-row lattice); real
  * attribution setups bucket channels long before that.
  */
object Shapley {

  private def factorial(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)

  /** @param userMask one row per converting unit, column `mask` in
    *                 [0, 2^n) — enforced structurally with an isin filter
    *                 so plan lints can prove the census aggregate bounded
    * @param channels channel names, bit i of `mask` = channels(i)
    * @return (channel, n_users, phi_xnf, share_ppm) — n_users = units
    *         touching the channel, phi_xnf = Shapley value × n!
    */
  def attribution(userMask: DataFrame, channels: Seq[String]): DataFrame = {
    val n = channels.length
    require(n >= 1 && n <= 8, s"1 to 8 channels supported, got $n")
    val spark = userMask.sparkSession
    val full = (1 << n) - 1
    // |S|!·(n−1−|S|)! spelled as a CASE over the popcount
    val wCase = (0 until n).map(s =>
      s"WHEN $s THEN ${factorial(s) * factorial(n - 1 - s)}")
      .mkString("CASE s_size ", " ", " ELSE 0 END")
    val popcount = (0 until n)
      .map(b => s"((s_mask >> $b) & 1)").mkString(" + ")

    val masked = userMask
      .select(col("mask"))
      // no-op domain statement: an n-bit OR lands in [0, 2^n)
      .filter(col("mask").isin(0 to full: _*))
    val cnts = masked.groupBy("mask").agg(count(lit(1)).as("cnt"))
    val sFrame = spark.range(full + 1).select(col("id").cast("int").as("s_mask"))
    val v = sFrame.join(broadcast(cnts),
        expr(s"(mask & ($full - s_mask)) = 0"), "left")
      .groupBy("s_mask").agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
    val chFrame = spark.range(n).select(col("id").cast("int").as("ci"),
      element_at(array(channels.map(lit): _*), col("id").cast("int") + 1)
        .as("channel"))
    val pairs = sFrame.crossJoin(broadcast(chFrame))
      .filter(expr("(s_mask & shiftleft(1, ci)) = 0"))
      .withColumn("s_size", expr(popcount))
      .withColumn("w", expr(wCase))
    val phi = pairs
      .join(broadcast(v.select(col("s_mask").as("sm1"), col("v").as("v_s"))),
        col("s_mask") === col("sm1"))
      .join(broadcast(v.select(col("s_mask").as("sm2"), col("v").as("v_si"))),
        expr("sm2 = s_mask + shiftleft(1, ci)"))
      .groupBy("channel", "ci")
      .agg(sum(expr("w * (v_si - v_s)")).as("phi_xnf"))
    val touchedN = chFrame.join(broadcast(cnts),
        expr("(mask & shiftleft(1, ci)) != 0"), "left")
      .groupBy("channel", "ci")
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_users"))
    val tot = phi.agg(sum(col("phi_xnf")).as("tot_phi"))
    phi.join(touchedN, Seq("channel", "ci")).crossJoin(broadcast(tot))
      .selectExpr("channel", "n_users", "phi_xnf",
        "phi_xnf * 1000000 DIV greatest(tot_phi, 1) AS share_ppm")
  }
}
