package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-checkable pins for the late round-7 operators: power iteration
  * finds a planted dominant axis, binary sign quantization ranks by the
  * constructed Hamming distances, the matryoshka rerank degenerates to
  * brute force at full prefix, the kNN graph is self-edge-free and
  * rank-ordered, and Kneser-Ney probabilities stay inside [0, 1] with
  * the most frequent bigram on top.
  */
class NewOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("powerIterationE6 recovers a planted dominant axis") {
    // 8 vectors hugging the x-axis, tiny y jitter, one orthogonal runt:
    // the top principal direction is x, so |v(0)| must dominate |v(1)|
    // and the renormalized component must sit at full e6 scale.
    val rows = (1L to 8L).map(i =>
      i -> Seq(1.0f, (if (i % 2 == 0) 0.02f else -0.02f))) :+
      (9L -> Seq(0.0f, 0.3f))
    val v = Similarity.powerIterationE6(vecDf(rows), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(v(0L)) > 10 * math.abs(v(1L)),
      s"x-axis must dominate: $v")
    assert(math.abs(v(0L)) >= 900000L && math.abs(v(0L)) <= 2000000L,
      s"renormalized component off e6 scale: $v")
  }

  test("pca2E6 deflation finds the planted SECOND axis, near-orthogonal") {
    // strong x-axis cluster, weaker y-axis cluster, trace z jitter: v1
    // must be x-dominant, v2 y-dominant (deflation removed x), and the
    // two directions must be near-orthogonal (|cos| within truncation
    // slack of 0).
    val rows =
      (1L to 8L).map(i => i -> Seq(1.0f,
        (if (i % 2 == 0) 0.02f else -0.02f), 0.01f)) ++
      (11L to 16L).map(i => i -> Seq(
        (if (i % 2 == 0) 0.02f else -0.02f), 0.6f, -0.01f))
    val out = Similarity.pca2E6(vecDf(rows), rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val v1 = Array(0L, 1L, 2L).map(d => out(d)._1.toDouble)
    val v2 = Array(0L, 1L, 2L).map(d => out(d)._2.toDouble)
    assert(math.abs(v1(0)) > 5 * math.abs(v1(1)), s"v1 must be x-dominant: $out")
    assert(math.abs(v2(1)) > 5 * math.abs(v2(0)), s"v2 must be y-dominant: $out")
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val cos = v1.zip(v2).map { case (a, b) => a * b }.sum /
      math.max(norm(v1) * norm(v2), 1e-9)
    assert(math.abs(cos) < 0.05, s"v1 and v2 must be near-orthogonal, cos=$cos")
  }

  test("binarySignTopK ranks by constructed Hamming distance") {
    // query = 64 positives; candidates flip the first 0 / 8 / 40 dims →
    // Hamming 0, 8, 40 in that rank order.
    val plus = Seq.fill(64)(1.0f)
    def flip(n: Int): Seq[Float] = Seq.tabulate(64)(i => if (i < n) -1.0f else 1.0f)
    val df = vecDf(Seq(100L -> plus, 1L -> flip(0), 2L -> flip(8), 3L -> flip(40)))
    val got = Similarity.binarySignTopK(df, df.filter(col("vec_id") === 100L), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 0L), (2L, 2L, 8L), (3L, 3L, 40L)),
      s"wrong ranking: ${got.toSeq}")
  }

  test("prefixTopKReranked at full prefix with wide shortlist = brute force") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 30L).map(i => i -> Seq.fill(8)(rng.nextFloat() - 0.5f))
    val df = vecDf(rows)
    val q = df.filter(col("vec_id") <= 3)
    val full = Similarity.prefixTopKReranked(df, q, k = 4, shortlist = 29, prefixDims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(df, q, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == brute)
  }

  test("knnGraph: no self edges, ranks descend per query") {
    val rng = new scala.util.Random(11)
    val rows = (1L to 40L).map(i => i -> Seq.fill(8)(rng.nextFloat() - 0.5f))
    val g = Similarity.knnGraph(vecDf(rows), k = 3, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g.nonEmpty)
    assert(g.forall { case (q, _, n, _) => q != n }, "self edge found")
    g.groupBy(_._1).values.foreach { rs =>
      val sims = rs.sortBy(_._2).map(_._4)
      assert(sims.sameElements(sims.sortBy(-_)), s"sims not descending: ${rs.toSeq}")
    }
  }

  test("knBigramTop: probabilities bounded, dominant bigram first") {
    val docs = Seq(
      (1L, "spark beats pandas spark beats pandas spark beats pandas"),
      (2L, "spark beats everything else entirely"),
      (3L, "ducks beats nobody today")).toDF("doc_id", "text")
    val top = TextStats.knBigramTop(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(top.head._1 == "spark" && top.head._2 == "beats",
      s"most frequent bigram must lead: ${top.head}")
    assert(top.forall { case (_, _, _, p) => p >= 0L && p <= 1000000L },
      s"probability out of [0, 1e6]: ${top.toSeq}")
    // high-count bigram outranks a hapax continuation of the same context
    val pSparkBeats = top.find(t => t._1 == "spark" && t._2 == "beats").get._4
    val pDucksBeats = top.find(t => t._1 == "ducks" && t._2 == "beats").get._4
    assert(pSparkBeats > pDucksBeats)
  }
}
