package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK ranks by cosine with deterministic tiebreak") {
    // query 0 = (1,0); neighbors: 1=(1,0.1) cos≈0.995, 2=(1,1) cos≈0.707,
    // 3=(0,1) cos=0, 4=(-1,0) cos=-1
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(1.0f, 1.0f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(top == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("cosineE6 matches a hand-computed value") {
    val df = Seq((Array(1.0f, 1.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosineE6(col("a"), col("b"))).collect()(0).getLong(0)
    assert(got == math.floor(1.0 / math.sqrt(2.0) * 1e6).toLong) // 707106
  }

  test("probeMasks: flips<=0 gives the exact bucket; counts match C(bits,k)") {
    assert(Similarity.probeMasks(12, 0) == Seq(0L))
    assert(Similarity.probeMasks(12, -1) == Seq(0L))
    assert(Similarity.probeMasks(12, 1).length == 13)
    assert(Similarity.probeMasks(12, 2).length == 1 + 12 + 66)
    assert(Similarity.probeMasks(12, 1).distinct.length == 13)
  }

  test("HyperplaneSig expression is bit-identical to the Column form") {
    val rnd = new scala.util.Random(43)
    val vecs = (0 until 100).map(_ => Tuple1(Array.fill(32)(rnd.nextGaussian().toFloat)))
      .toDF("v")
    val mismatches = vecs.select(
        Similarity.hyperplaneSignature(col("v"), 12).as("fast"),
        Similarity.hyperplaneSignatureColumns(col("v"), 12).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("CosineSimE6 expression is bit-identical to the aggregate-fold form") {
    val rnd = new scala.util.Random(41)
    val vecs = (0 until 200).map { i =>
      (Array.fill(64)(rnd.nextGaussian().toFloat), Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("a", "b")
    val mismatches = vecs.select(
        Similarity.cosineE6(col("a"), col("b")).as("fast"),
        Similarity.cosineE6Columns(col("a"), col("b")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("lshTopK achieves high recall on near-duplicate clusters") {
    // 40 base vectors (dim 16), each with one tiny-perturbation twin
    // (cos ≈ 0.9999): single-probe LSH must find most twins as rank-1.
    val rnd = new scala.util.Random(11)
    def v(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, v()))
    val twins = base.map { case (i, a) =>
      (100L + i, a.map(x => x + 0.005f * rnd.nextGaussian().toFloat))
    }
    val corpus = (base ++ twins).toDF("vec_id", "embedding")
    val queries = base.toDF("vec_id", "embedding")
    val got = Similarity.lshTopK(corpus, queries, k = 1, bits = 12)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = base.count { case (i, _) => got.get(i).contains(100L + i) }
    assert(hits >= 32, s"recall ${hits}/40 below 0.8") // deterministic: seeded
  }

  test("ivfTopK: twin recall stays high when the twin shares the probed cell") {
    val rnd = new scala.util.Random(17)
    def v(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, v()))
    val twins = base.map { case (i, a) =>
      (100L + i, a.map(x => x + 0.005f * rnd.nextGaussian().toFloat))
    }
    val corpus = (base ++ twins).toDF("vec_id", "embedding")
    val queries = base.toDF("vec_id", "embedding")
    // centStep 20 → centroid ids {0,20,100,120}: 4 cells, probe 2
    val got = Similarity.ivfTopK(corpus, queries, k = 1, centStep = 20, nProbe = 2)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = base.count { case (i, _) => got.get(i).contains(100L + i) }
    assert(hits >= 32, s"recall ${hits}/40 below 0.8")
  }

  test("ivfTopK with full probing reproduces brute force exactly") {
    val rnd = new scala.util.Random(23)
    def v(): Array[Float] = Array.fill(12)(rnd.nextGaussian().toFloat)
    val corpus = (0 until 60).map(i => (i.toLong, v())).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 10 === 0)
    // centStep 15 → 4 cells; nProbe 4 probes all of them → exact search
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3, centStep = 15, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(ivf == bf)
  }

  test("LSH near-dup pairs are a subset of exact pairs with identical cosines") {
    val rnd = new scala.util.Random(13)
    def v(): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
    val base = (0 until 20).map(i => (i.toLong, v()))
    val twins = (0 until 5).map { i =>
      (50L + i, base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val vecs = (base ++ twins).toDF("vec_id", "embedding")
    val exact = Similarity.exactNearDupPairs(vecs, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lsh = Similarity.embeddingNearDupPairs(vecs, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.foreach { case (k, c) => assert(exact(k) == c) }
    // the twins are cos≈0.999+; LSH at 8 bits should surface most of them
    assert(lsh.size >= 3, s"LSH found only ${lsh.size} of ${exact.size} pairs")
  }

  test("kMeans separates well-separated clusters and is deterministic") {
    val rnd = new scala.util.Random(7)
    // three tight direction clusters in 8-d (cosine clustering is about
    // direction, not magnitude)
    def around(center: Array[Float]): Array[Float] =
      center.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val c1 = Array.fill(8)(0f).updated(0, 1f)
    val c2 = Array.fill(8)(0f).updated(3, 1f)
    val c3 = Array.fill(8)(0f).updated(6, -1f)
    val vecs = (0 until 30).map { i =>
      (i.toLong, around(Seq(c1, c2, c3)(i % 3)))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kMeansCentroidsE6(vecs, k = 3, iters = 2)
    val cells = Similarity.kMeansAssign(vecs, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member of a true cluster must land in the same learned cell
    for (m <- 0 until 3) {
      val assigned = (0 until 30).filter(_ % 3 == m).map(i => cells(i.toLong)).distinct
      assert(assigned.size == 1, s"true cluster $m split across cells $assigned")
    }
    // and the three true clusters land in three DIFFERENT cells
    assert((0 until 3).map(m => cells(m.toLong)).distinct.size == 3)
    // bit-determinism: a reshuffled input trains the identical model
    val cents2 = Similarity.kMeansCentroidsE6(
      vecs.orderBy(org.apache.spark.sql.functions.rand(99)), k = 3, iters = 2)
    val a = cents.orderBy("cell").collect().map(_.toSeq).toSeq
    val b = cents2.orderBy("cell").collect().map(_.toSeq).toSeq
    assert(a == b, "training must be order-independent")
  }

  test("trained IVF with enough probes matches brute force on a clustered corpus") {
    val rnd = new scala.util.Random(21)
    def around(center: Array[Float]): Array[Float] =
      center.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val c1 = Array.fill(8)(0f).updated(0, 1f)
    val c2 = Array.fill(8)(0f).updated(4, 1f)
    val corpus = (0 until 40).map { i =>
      (i.toLong, around(if (i % 2 == 0) c1 else c2))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 4)
    val ivf = Similarity.ivfTopKTrained(corpus, queries, k = 3,
        numCells = 2, trainIters = 2, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(ivf == bf)
  }

  test("radiusSearch: exactly the pairs at or above the cosine floor") {
    // axis-aligned vectors with known cosines: (1,0)·(1,1)/norms = 0.7071,
    // (1,0)·(0,1) = 0, (1,1)·(1,0.2) ≈ 0.832 — a 0.5 floor keeps exactly
    // the two high pairs and drops the orthogonal one.
    val vecs = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(1f, 1f)),
      (2L, Seq(0f, 1f)),
      (3L, Seq(1f, 0.2f))).toDF("vec_id", "embedding")
    val out = Similarity.radiusSearch(vecs, vecs.filter(col("vec_id") === 0L),
        tauE6 = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._2)
    assert(out.map(t => (t._1, t._2)) == Seq((0L, 1L), (0L, 3L)))
    assert(out.forall(_._3 >= 500000L))
    // the floor is inclusive and self-pairs are excluded
    assert(!out.exists(_._2 == 0L))
  }

  test("LongDot matches the declarative zip_with/aggregate form and null rules") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)),
      (Seq(0L, 0L), Seq(0L, 0L)),
      (Seq(2000000L, -2000000L), Seq(2000000L, 2000000L))
    ).toDF("a", "b")
    val got = df.select(graft.expr.LongDot(col("a"), col("b")).as("d"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // null element -> null; top-level null -> null
    val nulls = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L)))).toDF("a", "b")
    assert(nulls.select(graft.expr.LongDot(col("a"), col("b"))).collect()(0).isNullAt(0))
    assert(df.limit(1).select(graft.expr.LongDot(lit(null).cast("array<bigint>"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("PQ: codebook shapes, exact self-match on codeword vectors, ADC finds cluster kin") {
    val rnd = new scala.util.Random(7)
    def around(center: Array[Float]): Array[Float] =
      center.map(x => x + 0.03f * rnd.nextGaussian().toFloat)
    val c1 = Array.fill(16)(0f).updated(0, 1f).updated(8, 1f)
    val c2 = Array.fill(16)(0f).updated(4, 1f).updated(12, -1f)
    val corpus = (0 until 60).map { i =>
      (i.toLong, around(if (i % 2 == 0) c1 else c2))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooksE6(corpus, numSub = 4, kSub = 4, iters = 2)
    val rows = cb.collect()
    // every surviving (sub, code) codeword spans its full subspace width
    assert(rows.nonEmpty && rows.forall(_.getSeq[Long](2).length == 4))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
    // ADC ranks same-cluster vectors above cross-cluster ones
    val queries = corpus.filter(col("vec_id") < 2)
    val top = Similarity.pqTopK(corpus, queries, k = 5, numSub = 4, kSub = 4,
        trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    top.foreach { case (q, n) =>
      assert((q - n) % 2 == 0, s"query $q got cross-cluster neighbor $n")
    }
    // determinism: reshuffled corpus -> identical codes
    val codes1 = Similarity.pqEncode(corpus, cb, numSub = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val codes2 = Similarity.pqEncode(
        corpus.orderBy(org.apache.spark.sql.functions.rand(3)), cb, numSub = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(codes1 == codes2)
  }

  test("PQ rerank with a full-corpus shortlist equals brute force; recallAtK is exact") {
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 30).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
    // shortlist = whole corpus -> the exact rerank IS brute force
    val rr = Similarity.pqTopKReranked(corpus, queries, k = 4, shortlist = 29,
        numSub = 4, kSub = 4, trainIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rr == bf)
    // and recallAtK reports exactly 1.0 for identical result sets
    val rec = Similarity.recallAtK(
        Similarity.bruteForceTopK(corpus, queries, k = 4),
        Similarity.bruteForceTopK(corpus, queries, k = 4))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(rec.length == 3 && rec.forall(_._2 == 1000000L))
    intercept[IllegalArgumentException] {
      Similarity.pqTopKReranked(corpus, queries, k = 5, shortlist = 4,
        numSub = 4, kSub = 4)
    }
  }

  test("hashSample is a deterministic bounded subset and seeds are its prefix") {
    val rnd = new scala.util.Random(17)
    val corpus = (0 until 80).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val s1 = Similarity.hashSample(corpus, 20).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Similarity.hashSample(corpus.orderBy(rand(5)), 20).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2 && s1.length == 20, "sample must be deterministic and bounded")
    // the seed bottom-k is a PREFIX of the sample bottom-n under the same
    // hash order: with iters=0 the centroids ARE the seeds, so sampled and
    // full-corpus training must produce identical frames
    val full = Similarity.kMeansCentroidsE6(corpus, k = 4, iters = 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    val sampled = Similarity.kMeansCentroidsE6(corpus, k = 4, iters = 0,
        trainSample = 20)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    assert(full == sampled)
    intercept[IllegalArgumentException] {
      Similarity.kMeansCentroidsE6(corpus, k = 8, iters = 1, trainSample = 4)
    }
  }

  test("ivfPqTopK probing every cell equals the flat ADC scan") {
    val rnd = new scala.util.Random(23)
    val corpus = (0 until 60).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 20 === 0)
    val cb = Similarity.pqCodebooksE6(corpus, numSub = 4, kSub = 8, iters = 1,
      trainSample = 24)
    val cents = Similarity.kMeansCentroidsE6(corpus, k = 4, iters = 1,
      trainSample = 24)
    // nProbe = numCells → routing covers the whole corpus, so the routed
    // ADC ranking must equal the flat scan's on the same codebooks
    val routed = Similarity.ivfPqTopK(corpus, queries, k = 5, numCells = 4,
        nProbe = 4, numSub = 4, kSub = 8,
        centroids = Some(cents), codebooks = Some(cb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val flat = Similarity.pqTopK(corpus, queries, k = 5, numSub = 4, kSub = 8,
        codebooks = Some(cb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(routed == flat)
    // tight probing returns a subset of per-query candidates with <= k rows
    val tight = Similarity.ivfPqTopK(corpus, queries, k = 5, numCells = 4,
      nProbe = 1, numSub = 4, kSub = 8,
      centroids = Some(cents), codebooks = Some(cb))
    tight.collect().foreach(r => assert(r.getLong(1) <= 5, "rank within k"))
    assert(tight.count() <= flat.size)
  }

  test("ivfPqResidualTopK retrieves within-cluster neighbors deterministically") {
    // two orthogonal tight clusters (cos across ~0, within ~1): the
    // reconstruction q·(c_cell + r̂) must rank same-cluster vectors first
    // regardless of how the coarse seeds landed
    val rnd = new scala.util.Random(29)
    def pt(center: Array[Float]) =
      center.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val cA = Array.fill(16)(1f)
    val cB = Array.tabulate(16)(i => if (i % 2 == 0) 1f else -1f)
    val corpus = ((0 until 30 by 2).map(i => (i.toLong, pt(cA))) ++
      (1 until 30 by 2).map(i => (i.toLong, pt(cB)))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 2)
    val top = Similarity.ivfPqResidualTopK(corpus, queries, k = 5,
      numCells = 2, nProbe = 2, numSub = 4, kSub = 8, trainIters = 1)
    val rows = top.collect()
    assert(rows.nonEmpty)
    rows.map(r => (r.getLong(0), r.getLong(2))).foreach { case (q, n) =>
      assert((q - n) % 2 == 0, s"query $q got cross-cluster neighbor $n")
    }
    // bit-determinism under corpus reshuffle (training included)
    val again = Similarity.ivfPqResidualTopK(corpus.orderBy(rand(7)), queries,
      k = 5, numCells = 2, nProbe = 2, numSub = 4, kSub = 8, trainIters = 1)
    assert(rows.toSeq == again.collect().toSeq)
  }

  test("sq8Encode: codes bounded in [-127,127], self-dot ≈ 127², zero-norm dropped") {
    val vecs = Seq(
      (0L, Array(3.0f, 4.0f)),
      (1L, Array(-1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f)) // zero norm: must be excluded
    ).toDF("vec_id", "embedding")
    val enc = Similarity.sq8Encode(vecs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(!enc.contains(2L), "zero-norm vector must be dropped")
    assert(enc.values.flatten.forall(c => c >= -127 && c <= 127))
    // (3,4)/5 = (0.6, 0.8) → codes (76, 102); self-dot near 127² = 16129
    assert(enc(0L) == Seq(76L, 102L))
    val selfDot = enc(0L).map(c => c * c).sum
    assert(math.abs(selfDot - 16129L) < 300, s"self-dot drifted: $selfDot")
  }

  test("sq8TopK preserves the exact cosine ranking on well-separated vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(1.0f, 1.0f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.sq8TopK(vecs, vecs.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(top == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("mmrRerank: redundant near-twin is skipped for the diverse candidate") {
    // b duplicates a's vector: once a is picked, b's penalty 3·1e6 sinks
    // it below the orthogonal c despite higher relevance. First pick is
    // pure relevance (penalty 0).
    val pool = Seq(
      (1L, 10L, 1000L, Array(1.0f, 0.0f)), // a
      (1L, 20L, 999L, Array(1.0f, 0.0f)), // b: near-twin of a
      (1L, 30L, 100L, Array(0.0f, 1.0f))) // c: orthogonal
      .toDF("query_id", "id", "rel_e6", "v")
    val out = Similarity.mmrRerank(pool, k = 2).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("id"), r.getAs[Long]("mmr_e7")))
    assert(out.toSeq == Seq((1L, 10L, 7000L), (2L, 30L, 700L)))
  }

  test("rrfFuse: exact e6 scores, both-list docs win, absent ranks are 0") {
    // list A: 10 then 20; list B: 20 then 30. Doc 20 (both lists) must
    // fuse first: 1e6 DIV 62 + 1e6 DIV 61 = 16129 + 16393 = 32522;
    // 10 gets 16393 (rank_b = 0), 30 gets 16129 (rank_a = 0).
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "id", "rnk")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "id", "rnk")
    val out = Similarity.rrfFuse(a, b, k = 10).orderBy("rnk").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rrf_e6"),
        r.getAs[Long]("rank_a"), r.getAs[Long]("rank_b"),
        r.getAs[Long]("rnk"))).toSeq
    assert(out == Seq(
      (20L, 32522L, 2L, 1L, 1L),
      (10L, 16393L, 1L, 0L, 2L),
      (30L, 16129L, 0L, 2L, 3L)))
  }
}
