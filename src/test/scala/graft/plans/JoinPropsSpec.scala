package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property checks: the composed as-of and range joins must agree with a
  * brute-force Scala computation on randomized inputs (seeded —
  * deterministic runs).
  */
class JoinPropsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(47)

  test("property: asofJoin equals the brute-force latest-at-or-before per left row") {
    val keys = 5
    val left = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt(keys).toLong, rnd.nextInt(1000).toLong))
    val right = (0 until 80).map(i =>
      (1000L + i, rnd.nextInt(keys).toLong, rnd.nextInt(1000).toLong))
    // make right (key, t) unique so the expected pick is well-defined
    val rightU = right.groupBy(r => (r._2, r._3)).map(_._2.maxBy(_._1)).toSeq

    val expected = left.map { case (lid, k, lt) =>
      val candidates = rightU.filter(r => r._2 == k && r._3 <= lt)
      val pick = if (candidates.isEmpty) None
        else Some(candidates.maxBy(r => (r._3, r._1))._1)
      lid -> pick
    }.toMap

    val got = AsOf.asofJoin(
        left.toDF("lid", "k", "t"),
        rightU.toDF("rid", "k", "t"), "k", "t", Seq("rid"))
      .select("lid", "asof_rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == expected)
  }

  test("property: asofJoinNearest equals brute-force closest-with-backward-ties") {
    val keys = 5
    def ts(t: Long) = new java.sql.Timestamp(t * 1000L)
    val left = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt(keys).toLong, rnd.nextInt(1000).toLong))
    val right = (0 until 80).map(i =>
      (1000L + i, rnd.nextInt(keys).toLong, rnd.nextInt(1000).toLong))
    val rightU = right.groupBy(r => (r._2, r._3)).map(_._2.maxBy(_._1)).toSeq

    val expected = left.map { case (lid, k, lt) =>
      val back = rightU.filter(r => r._2 == k && r._3 <= lt)
        .sortBy(r => (r._3, r._1)).lastOption
      val fwd = rightU.filter(r => r._2 == k && r._3 > lt)
        .sortBy(_._3).headOption
      val pick = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (lt - b._3 <= f._3 - lt) Some(b._1) else Some(f._1)
        case (Some(b), None) => Some(b._1)
        case (None, Some(f)) => Some(f._1)
        case _ => None
      }
      lid -> pick
    }.toMap

    val got = AsOf.asofJoinNearest(
        left.map { case (l, k, t) => (l, k, ts(t)) }.toDF("lid", "k", "t"),
        rightU.map { case (r, k, t) => (r, k, ts(t)) }.toDF("rid", "k", "t"),
        "k", "t", Seq("rid"))
      .select("lid", "asof_rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == expected)
  }

  test("property: bandPairs equals the brute-force band predicate") {
    val keys = 4
    val width = 50L
    val left = (0 until 60).map(i =>
      (i.toLong, rnd.nextInt(keys).toLong, rnd.nextInt(500).toLong))
    val right = (0 until 60).map(i =>
      (100L + i, rnd.nextInt(keys).toLong, rnd.nextInt(500).toLong))
    val expected = (for {
      (lid, lk, lt) <- left
      (rid, rk, rt) <- right
      if lk == rk && math.abs(lt - rt) <= width
    } yield (lid, rid)).toSet

    val got = RangeJoin.bandPairs(
        left.toDF("lid", "k", "t"), right.toDF("rid", "k", "t"), "k", "t", width)
      .select(col("l.lid"), col("r.rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }
}
