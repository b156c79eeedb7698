package graft.llm

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property test pinning chunkDocuments bit-for-bit to an independent
  * Scala reference layout across random document lengths and random
  * (width, overlap) configurations (house style: fixed-seed Gens, one
  * Spark job per configuration).
  */
class CorpusPropsSpec extends SparkSpec {
  import spark.implicits._

  private def lengths(seed: Long, n: Int): List[Int] =
    Gen.listOfN(n, Gen.frequency(
        (1, Gen.const(0)),
        (3, Gen.choose(1, 8)),
        (6, Gen.choose(9, 200))))
      .apply(Gen.Parameters.default, Seed(seed)).get

  /** Independent reference: materialize every chunk's token slice. */
  private def refChunks(toks: Array[String], width: Int, step: Int)
      : Seq[(Long, Seq[String])] = {
    val nc = 1 + math.max(0, (math.max(0, toks.length - width) + step - 1) / step)
    (0 until nc).map(c => (c.toLong, toks.slice(c * step, c * step + width).toSeq))
  }

  test("property: chunk layout equals the reference for random lengths and configs") {
    val configs = Seq((1, 0), (2, 1), (5, 2), (8, 3), (16, 15), (64, 16))
    configs.zipWithIndex.foreach { case ((width, overlap), ci) =>
      val step = width - overlap
      val lens = lengths(ci * 31L + 7, 40)
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(t => s"d${i}t$t").mkString(" "))
      }
      val got = Corpus.chunkDocuments(docs.toDF("doc_id", "text"),
          "text", "doc_id", width, overlap)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq).toMap
      docs.foreach { case (id, text) =>
        if (text.isEmpty) {
          assert(!got.contains(id), s"cfg ($width,$overlap) doc $id: empty doc chunked")
        } else {
          val exp = refChunks(text.split(" "), width, step)
          val act = got.getOrElse(id, Seq.empty)
          assert(act.map(_._1) == exp.map(_._1),
            s"cfg ($width,$overlap) doc $id chunk ids")
          exp.zip(act).foreach { case ((cid, etoks), (_, nTok, ctext)) =>
            assert(nTok == etoks.length && ctext == etoks.mkString(" "),
              s"cfg ($width,$overlap) doc $id chunk $cid")
          }
        }
      }
    }
  }
}
