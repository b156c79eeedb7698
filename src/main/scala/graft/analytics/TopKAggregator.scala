package graft.analytics

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k aggregation (SURVEY §7.4's custom-aggregate machinery):
  * keeps the k largest (measure, tiebreak) pairs per group in a bounded
  * buffer.
  *
  * Scale shape vs the ranking-window form (Dashboard.topKPerGroup): the
  * window must shuffle EVERY row to its group's partition and sort there
  * (WindowGroupLimit prunes some, but partial state is still per-partition
  * row batches); this aggregator's partial buffers are ≤ k entries per
  * group per map task, so the exchange carries at most
  * (k × groups × partitions) rows regardless of input size. For
  * top-5-of-billions per a handful of groups, that is the difference
  * between shuffling gigabytes and kilobytes.
  *
  * Ordering: measure DESC, tiebreak ASC — identical to
  * `row_number() OVER (ORDER BY measure DESC, tiebreak)`, so the window
  * form and the DuckDB oracle produce the same rows.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(String, Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def ord: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (m, t) => (-m, t) }

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], row: (String, Long, Long)): Seq[(Long, Long)] =
    ((row._2, row._3) +: buf).sorted(ord).take(k)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]
}

object TopKAggregator {

  /** Top-k lineitem rows per return flag by extended price — the typed
    * Aggregator form of Dashboard.topKPerGroup, same output contract as the
    * dash_topk_per_group oracle: (l_returnflag, rnk, l_orderkey,
    * l_linenumber, price_c). The tiebreak packs (orderkey, linenumber) as
    * orderkey*10+linenumber (linenumber < 10 in TPC-H-shaped data).
    */
  def topLineitems(lineitem: DataFrame, k: Int): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val ds = lineitem.select(
      col("l_returnflag"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("tb"))
      .as[(String, Long, Long)]
    ds.groupByKey(_._1)
      .agg(new TopKAggregator(k).toColumn.name("top"))
      .flatMap { case (flag, top) =>
        top.zipWithIndex.map { case ((m, t), i) =>
          // rnk as long — matches the BIGINT row_number of the shared oracle
          (flag, (i + 1).toLong, t / 10, (t % 10).toInt, m)
        }
      }
      .toDF("l_returnflag", "rnk", "l_orderkey", "l_linenumber", "price_c")
      .orderBy("l_returnflag", "rnk")
  }
}
