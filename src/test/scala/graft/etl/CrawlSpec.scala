package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Serializable fixture — a fetcher defined on the spec class would drag
  * the whole (non-serializable) suite into the task closure.
  */
object CrawlFixtures extends Serializable {
  def fakePage(p: Int): String =
    (0 until 3).map(i => s"<article><h2>ad_${p}_$i</h2></article>").mkString
}

class CrawlSpec extends SparkSpec {
  import CrawlFixtures.fakePage

  test("crawlPages fetches every page exactly once, in parallel partitions") {
    val out = Crawl.crawlPages(spark, 1 until 11, fakePage _)
    val rows = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == (1L until 11L).toSet)
    (1 until 11).foreach(p => assert(rows(p.toLong) == fakePage(p)))
  }

  test("crawlPages honors Range inclusivity and step") {
    val inclusive = Crawl.crawlPages(spark, 1 to 10, fakePage _)
      .select("page").collect().map(_.getLong(0)).toSet
    assert(inclusive == (1L to 10L).toSet, "inclusive range lost its last page")
    val stepped = Crawl.crawlPages(spark, 1 until 10 by 2, fakePage _)
      .select("page").collect().map(_.getLong(0)).toSet
    assert(stepped == Set(1L, 3L, 5L, 7L, 9L))
  }

  test("crawl output feeds the page-parse generator (extract.py crawl→parse chain)") {
    val pages = Crawl.crawlPages(spark, 1 until 4, fakePage _)
    val ads = pages.select(col("page"),
        explode(regexp_extract_all(col("body"),
          lit("<h2>(.*?)</h2>"), lit(1))).as("ad"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ads.length == 9) // 3 pages × 3 ads
    assert(ads.contains((2L, "ad_2_1")))
  }

  test("per-partition rate limit: single partition crawls sequentially with delay") {
    val t0 = System.nanoTime()
    Crawl.crawlPages(spark, 1 until 5, fakePage _, perPageDelayMs = 50,
      parallelism = 1).count()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 4 pages, 3 inter-fetch delays of 50 ms in one partition
    assert(elapsedMs >= 150, s"rate limit not applied: $elapsedMs ms")
  }
}
