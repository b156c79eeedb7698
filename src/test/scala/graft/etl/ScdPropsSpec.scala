package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the SCD2 merge invariants — random dimension/update
  * pairs (house style: ScalaCheck Gens sampled with fixed seeds, a small
  * number of Spark jobs rather than one per forAll sample).
  */
class ScdPropsSpec extends SparkSpec {
  import spark.implicits._

  private val keyAttr: Gen[(Long, String)] = for {
    k <- Gen.choose(1L, 12L) // small keyspace forces collisions
    v <- Gen.oneOf("a", "b", "c", "d")
  } yield (k, v)

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(10, keyAttr).map(_.distinctBy(_._1)) // one row per key

  private def sample(seed: Long): (List[(Long, String)], List[(Long, String)]) = {
    val a = rowsGen.apply(Gen.Parameters.default, Seed(seed)).get
    val b = rowsGen.apply(Gen.Parameters.default, Seed(seed + 1000)).get
    (a, b)
  }

  test("property: merge preserves key coverage, uniqueness of current rows, and history") {
    (0 until 6).foreach { i =>
      val (dimRows, updRows) = sample(i.toLong)
      val dim = dimRows.toDF("key", "attr")
        .select(col("key"), col("attr"), lit("2020-01-01").as("valid_from"),
          lit(null).cast("string").as("valid_to"), lit(true).as("is_current"))
      val out = Scd.mergeType2(dim, updRows.toDF("key", "attr"),
        Seq("key"), Seq("attr"), "2024-01-01")
      val rows = out.select("key", "attr", "valid_from", "valid_to", "is_current")
        .as[(Long, String, String, Option[String], Boolean)].collect()

      // every key from either side appears, with EXACTLY one current row
      val expectKeys = (dimRows.map(_._1) ++ updRows.map(_._1)).toSet
      val currents = rows.filter(_._5)
      assert(currents.map(_._1).toSet == expectKeys, s"seed $i key coverage")
      assert(currents.groupBy(_._1).forall(_._2.length == 1), s"seed $i current dup")

      // the current attr is the update's where one exists, else the dim's
      val updMap = updRows.toMap
      val dimMap = dimRows.toMap
      currents.foreach { case (k, a, _, _, _) =>
        assert(a == updMap.getOrElse(k, dimMap(k)), s"seed $i key $k current attr")
      }

      // closed rows exist exactly for keys whose update CHANGED the attr
      val closed = rows.filter(r => !r._5)
      val changedKeys = updRows.collect {
        case (k, v) if dimMap.contains(k) && dimMap(k) != v => k
      }.toSet
      assert(closed.map(_._1).toSet == changedKeys, s"seed $i closed set")
      closed.foreach { case (k, a, vf, vt, _) =>
        assert(a == dimMap(k) && vf == "2020-01-01" && vt.contains("2024-01-01"),
          s"seed $i key $k closed row")
      }
    }
  }

  test("property: snapshotDiff statuses partition the key space consistently") {
    (10 until 16).foreach { i =>
      val (oldRows, newRows) = sample(i.toLong)
      val out = Scd.snapshotDiff(oldRows.toDF("key", "attr"),
          newRows.toDF("key", "attr"), Seq("key"), Seq("attr"),
          includeUnchanged = true)
        .select("key", "status").as[(Long, String)].collect().toMap
      val om = oldRows.toMap; val nm = newRows.toMap
      assert(out.keySet == om.keySet ++ nm.keySet, s"seed $i keys")
      out.foreach { case (k, st) =>
        val expect =
          if (!om.contains(k)) "added"
          else if (!nm.contains(k)) "removed"
          else if (om(k) == nm(k)) "unchanged"
          else "changed"
        assert(st == expect, s"seed $i key $k")
      }
    }
  }
}
