package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's paginated crawl loop (scripts/extract.py:57-64: pages
  * 1..149, 2 s sleep between fetches, accumulate rows) re-expressed as a
  * distributed fetch: page ids are partitioned across executors and each
  * partition fetches its pages sequentially with the rate limit applied
  * per executor — N executors sustain N× the single-thread crawl rate
  * while honoring the per-connection politeness delay.
  *
  * The fetcher itself is INJECTED (a serializable Int => String): network
  * connectors live outside the engine core (SURVEY §7.4), and the test
  * environment has no egress — specs pass a deterministic fake page
  * builder, production passes an HTTP client closure.
  */
object Crawl {

  /** @param pages          page-id range to crawl (reference: 1 until 150)
    * @param fetch          page id → page body (serializable closure)
    * @param perPageDelayMs politeness delay between fetches WITHIN a
    *                       partition (reference: 2000 ms)
    * @param parallelism    concurrent fetch partitions (= polite
    *                       connections); defaults to the range size capped
    *                       at the session's default parallelism
    */
  def crawlPages(spark: SparkSession, pages: Range, fetch: Int => String,
      perPageDelayMs: Long = 0, parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    require(pages.nonEmpty, "pages range is empty")
    val np = math.max(1,
      if (parallelism > 0) parallelism
      else math.min(pages.size, spark.sparkContext.defaultParallelism))
    // honor Range inclusivity AND step: head/last are inclusive bounds, so
    // the exclusive end is one step past last. (A bare spark.range(start,
    // end) would drop the last page of `1 to n` and ignore `by k`.)
    // Partition count set here — no extra repartition shuffle.
    spark.range(pages.head, pages.last + math.signum(pages.step),
        pages.step, np)
      .as[Long]
      .mapPartitions { it =>
        var first = true
        it.map { p =>
          if (!first && perPageDelayMs > 0) Thread.sleep(perPageDelayMs)
          first = false
          (p, fetch(p.toInt))
        }
      }
      .toDF("page", "body")
  }
}
