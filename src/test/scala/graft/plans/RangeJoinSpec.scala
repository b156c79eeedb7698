package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bandPairs finds exactly the in-band pairs, including bucket-boundary ones") {
    // width 100: buckets [0,100), [100,200), ...
    val left = Seq(
      (1L, 7L, 95L),    // pairs with right at 105 (Δ10, cross-boundary) and 5 (Δ90)
      (2L, 7L, 350L),   // pairs with right at 260 (Δ90, cross-boundary)
      (3L, 9L, 95L)     // same time as id=1 but other key → no pairs
    ).toDF("lid", "k", "t")
    val right = Seq(
      (10L, 7L, 5L),
      (11L, 7L, 105L),
      (12L, 7L, 260L),
      (13L, 7L, 500L)   // out of band for every left row
    ).toDF("rid", "k", "t")
    val got = RangeJoin.bandPairs(left, right, "k", "t", width = 100L)
      .select(col("l.lid"), col("r.rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("bandPairs produces no duplicate pairs despite neighbor-bucket probing") {
    val left = Seq((1L, 7L, 100L)).toDF("lid", "k", "t")
    val right = Seq((10L, 7L, 100L)).toDF("rid", "k", "t")
    assert(RangeJoin.bandPairs(left, right, "k", "t", 50L).count() == 1)
  }

  test("bandPairs boundary: |delta| exactly equal to width is kept") {
    val left = Seq((1L, 7L, 0L)).toDF("lid", "k", "t")
    val right = Seq((10L, 7L, 100L), (11L, 7L, 101L)).toDF("rid", "k", "t")
    val got = RangeJoin.bandPairs(left, right, "k", "t", 100L)
      .select(col("r.rid")).collect().map(_.getLong(0)).toSet
    assert(got == Set(10L))
  }
}
