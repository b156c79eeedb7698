package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-level scale-discipline lint: every driver-side materialization
  * in main source (`collect`/`head`/`first`/`toLocalIterator`) and every
  * explicit parallelism-1 coalesce/repartition must be on the documented
  * whitelist below — each entry is a site whose result is provably
  * bounded independent of the scale factor (an O(partitions × groups)
  * offset map, a 1-row aggregate probe, a single-file sink contract).
  * A new `.collect()` anywhere else fails this spec, with the burden of
  * proof on the author to document the bound here. (Previous rounds
  * verified this property by hand; a reviewed-by-grep invariant is not
  * an invariant.)
  */
class SourceDisciplineSpec extends AnyFunSuite {

  private val root = Paths.get("src/main/scala/graft")

  /** file-basename → max allowed occurrences across ALL patterns, with
    * the documented bound for each site.
    */
  private val whitelist: Map[String, Int] = Map(
    // Ids.groupedRunningSum / contiguousIds two-pass offsets: the
    // collected frame is one row per (partition, group) — O(partitions ×
    // groups), both factors configuration-bounded at any SF
    "Ids.scala" -> 2,
    // Dashboard scalar probe: collect()(0) of a no-grouping (1-row)
    // aggregate
    "Dashboard.scala" -> 1,
    // Dedup alternating-star convergence probe: head() of a 1-row
    // aggregate, one per fixed round
    "Dedup.scala" -> 1,
    // Verify dumps each query result as ONE parquet file for the
    // driver's DuckDB compare — test harness, not an operator; results
    // are already query outputs (bounded by the queries' own contracts)
    "Verify.scala" -> 1,
    // Pipeline CSV sink: the reference's contract is a single output
    // object per dump (SURVEY §2.2); coalesce(1) only under the explicit
    // singleFile flag
    "Pipeline.scala" -> 1)

  private val patterns = Seq(
    "\\.collect\\(\\)", "\\.collectAsList\\(", "\\.toLocalIterator",
    "\\.head\\(\\)", "\\.first\\(\\)",
    "repartition\\(1\\)", "coalesce\\(1\\)").map(_.r)

  test("driver-side materializations appear only at documented bounded sites") {
    val hits = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val lines = Files.readAllLines(p).asScala
        lines.zipWithIndex.collect {
          case (l, i) if !l.trim.startsWith("//") && !l.trim.startsWith("*") &&
              patterns.exists(_.findFirstIn(l).isDefined) =>
            (p.getFileName.toString, s"${p.getFileName}:${i + 1}: ${l.trim.take(80)}")
        }
      }.toSeq

    val byFile = hits.groupBy(_._1)
    val violations = byFile.flatMap { case (f, sites) =>
      val allowed = whitelist.getOrElse(f, 0)
      if (sites.size > allowed)
        Some(s"$f: ${sites.size} materialization site(s), $allowed whitelisted:\n" +
          sites.map("    " + _._2).mkString("\n"))
      else None
    }
    assert(violations.isEmpty,
      "undocumented driver-side materialization(s):\n" + violations.mkString("\n"))

    // the whitelist may not silently rot: every entry must still match
    // at least one real site (a stale entry would mask a future add)
    val stale = whitelist.keys.filterNot(byFile.contains)
    assert(stale.isEmpty, s"stale whitelist entries (no sites remain): $stale")
  }
}
