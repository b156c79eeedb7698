package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedupByKey keeps the min-id row per key and is idempotent") {
    val df = Seq((3L, "a"), (1L, "a"), (2L, "b"), (5L, "b"), (4L, "c"))
      .toDF("id", "k")
    val once = Dedup.exactDedupByKey(df, col("k"), "id")
    assert(once.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (2L, "b"), (4L, "c")))
    assert(Dedup.exactDedupByKey(once, col("k"), "id").count() == 3)
  }

  test("simhash: identical text → identical hash; near text → small hamming; unrelated → large") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet green field"
    val near = base + " today"
    val far = "completely unrelated corpus text about databases indexes partitions shuffles executors memory spill"
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("doc_id", "text")
    val h = Dedup.simhash(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(hamming(h(1L), h(3L)) <= 8)
    assert(hamming(h(1L), h(4L)) > hamming(h(1L), h(3L)))
  }

  test("minhash-LSH finds every high-jaccard pair in a mixed corpus") {
    // 5 near-dup pairs (one word changed in ~20) + 10 distinct docs.
    val rnd = new scala.util.Random(7)
    def doc(seed: Int): String =
      (0 until 20).map(i => s"w${seed}_${rnd.nextInt(50) + i}").mkString(" ")
    val pairs = (0 until 5).map { i =>
      val d = doc(i)
      (2L * i, d, 2L * i + 1, d.replaceFirst("\\S+$", "CHANGED"))
    }
    val docs = pairs.flatMap { case (ia, da, ib, db) => Seq((ia, da), (ib, db)) } ++
      (0 until 10).map(i => (100L + i, doc(1000 + i)))
    val found = Dedup.minhashNearDupPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", minJaccard = 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs.map { case (ia, _, ib, _) => (ia, ib) }.toSet
    assert(truth.subsetOf(found), s"missed: ${truth -- found}")
  }

  test("jaccard blocking is symmetric across adjacent length buckets (r1 ADVICE bug)") {
    // Two near-identical docs straddling a 64-char bucket boundary; the
    // HIGHER-bucket doc gets the SMALLER id — the case round 1 missed.
    val short = ("word " * 12).trim            // 59 chars → bucket 0
    val long = short + " extraword padpad"     // 76 chars → bucket 1
    val df1 = Seq((1L, long, "en"), (2L, short, "en")).toDF("doc_id", "text", "lang")
    val r1 = Dedup.jaccardNearDupPairs(df1, "text", "doc_id", "lang", minJaccard = 0.3)
      .collect()
    assert(r1.length == 1 && r1(0).getLong(0) == 1L && r1(0).getLong(1) == 2L)
    // and the mirrored id assignment must find the same pair
    val df2 = Seq((2L, long, "en"), (1L, short, "en")).toDF("doc_id", "text", "lang")
    assert(Dedup.jaccardNearDupPairs(df2, "text", "doc_id", "lang", minJaccard = 0.3)
      .count() == 1)
  }

  test("jaccard pairs agree with exact wordJaccard values") {
    val a = "alpha beta gamma delta epsilon"
    val b = "alpha beta gamma delta zeta"     // |∩|=4, |∪|=6 → 4/6
    val df = Seq((1L, a, "en"), (2L, b, "en")).toDF("doc_id", "text", "lang")
    val j = Dedup.jaccardNearDupPairs(df, "text", "doc_id", "lang", minJaccard = 0.5)
      .collect()(0).getDouble(2)
    assert(math.abs(j - 4.0 / 6.0) < 1e-12)
  }

  test("simhashNearDupPairs finds every pair within the Hamming ball (banding guarantee)") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet field"
    val docs = Seq(
      (1L, base), (2L, base + " today"), (3L, base + " now then"),
      (4L, "completely different corpus text about spark shuffles executors partitions memory"),
      (5L, base)).toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground truth: all pairs within hamming <= 3
    val truth = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if hamming(sigs(a), sigs(b)) <= 3
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "fixture must contain at least one near pair")
    val found = Dedup.simhashNearDupPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == truth, s"banding must be lossless within the ball: $found vs $truth")
  }

  test("simhash pair mega-bucket cap suppresses degenerate boilerplate corpora") {
    val d = "identical boilerplate text shared by every document here"
    val docs = (0 until 8).map(i => (i.toLong, d)).toDF("doc_id", "text")
    assert(Dedup.simhashNearDupPairs(docs, "text", "doc_id",
      maxHamming = 3, maxBucketSize = 4).count() == 0)
    assert(Dedup.simhashNearDupPairs(docs, "text", "doc_id",
      maxHamming = 3, maxBucketSize = 100).count() == 28)
  }

  test("MinHashSig expression matches the declarative Column formulation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "x y"),
      (4L, "single"),
      (5L, "  spaced   out\ttabs\nand newlines  "),
      (6L, "Diakritická čeština v textu"),
      // tab/newline-EDGED text: Spark trim strips spaces only and Spark
      // split keeps trailing empties — java.lang.String defaults differ
      (7L, "\ttab led words here"),
      (8L, "trailing newline words\n")).toDF("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"), graft.expr.MinHashSig(col("text"), 3, 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCols = docs
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr.keySet == viaCols.keySet)
    viaCols.foreach { case (id, sig) =>
      assert(viaExpr(id) == sig, s"doc $id signature mismatch")
    }
    // blank text → empty signature (callers filter on size > 0)
    val blank = Seq((9L, "   ")).toDF("doc_id", "text")
      .select(graft.expr.MinHashSig(col("text"), 3, 64).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(blank.isEmpty)
  }

  test("minhash mega-bucket cap suppresses over-full buckets") {
    val d = "identical text shared by every document in this degenerate corpus"
    val docs = (0 until 8).map(i => (i.toLong, d)).toDF("doc_id", "text")
    // all 8 docs share every bucket; cap=4 → every bucket suppressed → 0 pairs
    assert(Dedup.minhashNearDupPairs(docs, "text", "doc_id",
      minJaccard = 0.1, maxBucketSize = 4).count() == 0)
    // with the cap above the corpus size all 28 pairs surface
    assert(Dedup.minhashNearDupPairs(docs, "text", "doc_id",
      minJaccard = 0.1, maxBucketSize = 100).count() == 28)
  }

  test("MinHashSig md5Base matches the declarative md5 Column formulation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "x y"),
      (4L, "single"),
      (5L, "  spaced   out\ttabs\nand newlines  ")).toDF("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"), graft.expr.MinHashSig(col("text"), 3, 64, md5Base = true).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCols = docs
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), Dedup.minhashSignatureMd5(col("sh"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr.keySet == viaCols.keySet)
    viaCols.foreach { case (id, sig) =>
      assert(viaExpr(id) == sig, s"doc $id md5-base signature mismatch")
    }
  }

  test("md5Head32 equals the first 8 md5 hex chars as a base-16 integer") {
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592 → head32 = 0x5d41402a
    assert(graft.expr.MinHashSig.md5Head32(
      "hello".getBytes(java.nio.charset.StandardCharsets.UTF_8)) == 0x5d41402aL)
    // high-bit case stays unsigned: md5("") = d41d8cd9... → 0xd41d8cd9 > Int.MaxValue
    assert(graft.expr.MinHashSig.md5Head32(Array.emptyByteArray) == 0xd41d8cd9L)
  }

  test("simhashMd5 shares the sums/sign machinery: dup/near/far behavior and hex form") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet green field"
    val df = Seq((1L, base), (2L, base), (3L, base + " today"),
      (4L, "completely unrelated corpus text about databases indexes partitions shuffles")).toDF("doc_id", "text")
    val sigs = Dedup.simhashMd5(df, "text", "doc_id")
    val h = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 8)
    // hex rendering: digit c carries bits 4c..4c+3, bit k of digit = bit 4c+k
    val hex = sigs.select(col("id"), Dedup.simhashHex(col("simhash")).as("x"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def expectedHex(v: Long): String = (0 until 16).map { c =>
      val digit = (0 until 4).map(k => (((v >>> (4 * c + k)) & 1L) << k).toInt).sum
      "0123456789abcdef"(digit)
    }.mkString
    h.foreach { case (id, v) => assert(hex(id) == expectedHex(v), s"doc $id hex") }
    // md5-sig pairs flow through the same banded join
    val pairs = Dedup.simhashNearDupPairsFromSigs(sigs, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
  }

  test("SimHashBits expression matches the declarative forms in both hash modes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "x y"),
      (4L, "single"),
      (5L, "  spaced   out\ttabs\nand newlines  "),
      (6L, "repeated words repeated words repeated"),
      (7L, "\ttab led words here"),
      (8L, "trailing newline words\n")).toDF("doc_id", "text")
    def collectMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(collectMap(Dedup.simhash(docs, "text", "doc_id")) ==
      collectMap(Dedup.simhashColumns(docs, "text", "doc_id")))
    assert(collectMap(Dedup.simhashMd5(docs, "text", "doc_id")) ==
      collectMap(Dedup.simhashMd5Columns(docs, "text", "doc_id")))
    // whitespace-only text → no tokens → NULL → row filtered, like the
    // declarative form where there is nothing to aggregate
    val blank = Seq((9L, "   ")).toDF("doc_id", "text")
    assert(Dedup.simhash(blank, "text", "doc_id").count() == 0)
    assert(Dedup.simhashColumns(blank, "text", "doc_id").count() == 0)
  }

  test("property: SimHashBits == declarative form on random noisy text (both modes)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    val word: Gen[String] = Gen.oneOf(
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)),
      Gen.oneOf("Č", "ß", "ÿ", "déjà", "3x", "§"))
    val text: Gen[String] = for {
      n <- Gen.chooseNum(0, 12)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.oneOf(" ", "  ", "\t", "\n")
      edge <- Gen.oneOf("", " ", "\t")
    } yield edge + ws.mkString(sep) + edge
    val docs = samples(text, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (md5Mode <- Seq(false, true)) {
      val expr =
        if (md5Mode) Dedup.simhashMd5(docs, "text", "doc_id")
        else Dedup.simhash(docs, "text", "doc_id")
      val cols =
        if (md5Mode) Dedup.simhashMd5Columns(docs, "text", "doc_id")
        else Dedup.simhashColumns(docs, "text", "doc_id")
      val e = expr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val c = cols.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(e == c, s"md5Mode=$md5Mode: expression and declarative forms diverge")
    }
  }

  test("connectedComponents: chains merge, clusters stay separate, isolated nodes self-label") {
    val nodes = (1L to 8L).toDF("id")
    // component {1,2,3,4} via a chain, component {6,7}, isolated 5 and 8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L), cc.toString)
    // a long chain needs multiple propagation rounds (diameter > 2)
    val chainN = 20L
    val chain = (1L until chainN).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ccChain = Dedup.connectedComponents((1L to chainN).toDF("id"), chain)
      .collect().map(r => r.getLong(1)).distinct
    assert(ccChain.toSeq == Seq(1L))
  }

  test("keepClusterCanonical keeps one doc per cluster, unlike greater-id-drop") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("doc_id", "txt")
    // chain 1~2, 2~3 (1 and 3 NOT directly similar), isolated 4
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs)
    val kept = Dedup.keepClusterCanonical(docs, "doc_id", labels)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L), kept.toSeq.toString)
  }

  test("connectedComponentsAltStar matches label propagation on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 120L
    val pairs = (1 to 150).map(_ =>
      (rnd.nextLong(n), rnd.nextLong(n))).toDF("id_a", "id_b")
    val nodes = (0L until n).toDF("id")
    val byProp = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byStar = Dedup.connectedComponentsAltStar(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byStar == byProp)
  }

  test("connectedComponentsAltStar collapses a high-diameter chain in few rounds") {
    // a 400-node chain has diameter 399: label propagation's O(diameter)
    // rounds would blow its iteration budget, the star alternation's
    // O(log² n) must not — this is exactly the graph shape the variant
    // exists for
    val chainN = 400L
    val chain = (1L until chainN).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponentsAltStar(
        (1L to chainN).toDF("id"), chain, maxIterations = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.forall(_._2 == 1L), cc.filter(_._2 != 1L).take(5).toSeq.toString)
  }

  test("connectedComponentsAltStar handles empty edges and self-loops") {
    val nodes = (1L to 4L).toDF("id")
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponentsAltStar(nodes, none)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    val loops = Seq((2L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    assert(Dedup.connectedComponentsAltStar(nodes, loops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
  }

  test("winnowContainmentPairs finds a planted shared paragraph, filters boilerplate") {
    val boiler = "standard license header text identical across every single document in the corpus"
    val planted = "a very distinctive shared paragraph about zygomorphic quasar harmonics"
    // 12 docs all carry the boilerplate (df = 12 > maxDf=10 → filtered);
    // only docs 3 and 9 also share the planted paragraph
    val docs = (0 until 12).map { i =>
      val body = s"document number $i with its own distinct body content variant $i"
      val extra = if (i == 3 || i == 9) s" $planted" else ""
      (i.toLong, s"$boiler $body$extra")
    }.toDF("doc_id", "text")
    val pairs = Dedup.winnowContainmentPairs(docs, "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 9L)), s"planted pair missing: $pairs")
    // the boilerplate alone must not pair up unrelated docs
    assert(!pairs.exists { case (a, b) => !(a == 3L && b == 9L) } ||
      pairs == Set((3L, 9L)), s"boilerplate-only pairs leaked: $pairs")
  }

  test("sharedSpanPairs finds exact span boundaries and merges diagonals") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    // doc 1: 10 unique + 20 shared + 10 unique; doc 2: 5 unique + the same
    // 20 shared + 5 unique. Shared block starts at token 11 in doc 1 and
    // token 6 in doc 2. A SECOND shared block of 18 tokens further out.
    val blockA = words("shared", 20)
    val blockB = words("other", 18)
    val docs = Seq(
      (1L, s"${words("u", 10)} $blockA ${words("v", 10)} $blockB"),
      (2L, s"${words("x", 5)} $blockA ${words("y", 7)} $blockB ${words("z", 3)}"),
      (3L, words("w", 40))
    ).toDF("doc_id", "text")
    val spans = Dedup.sharedSpanPairs(docs, n = 8, minTokens = 12, maxDf = 10)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._3, r._4)).toList
    // two maximal spans between docs 1 and 2, none touching doc 3
    assert(spans.map(r => (r._1, r._2)).forall(_ == (1L, 2L)), spans.toString)
    assert(spans == List(
      (1L, 2L, 11L, 6L, 20L),   // blockA: starts tok 11 (doc1) / tok 6 (doc2)
      (1L, 2L, 41L, 33L, 18L))) // blockB: after 10+20+10 / 5+20+7 tokens
  }

  test("sharedSpanPairs df-cap suppresses boilerplate-seeded spans") {
    val boiler = (0 until 30).map(i => s"b$i").mkString(" ")
    // the same 30-token block in 12 documents: df of every gram is 12 > maxDf
    val docs = (0 until 12).map(i => (i.toLong, s"head$i $boiler tail$i"))
      .toDF("doc_id", "text")
    val spans = Dedup.sharedSpanPairs(docs, n = 8, minTokens = 12, maxDf = 10)
    assert(spans.count() == 0, "template block must be df-capped out")
    // ...but with a permissive cap the spans ARE found
    val loose = Dedup.sharedSpanPairs(docs, n = 8, minTokens = 12, maxDf = 50)
    assert(loose.count() == 12L * 11 / 2, "every pair shares the block")
  }

  test("sharedSpanPairs skips docs shorter than n tokens (r5 ADVICE)") {
    // two identical 3-token docs under n=8: NgramHashSeq's whole-list gram
    // would have fabricated an 8-token "span" extending past the doc end
    val docs = Seq((1L, "a b c"), (2L, "a b c"),
      (3L, (0 until 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.sharedSpanPairs(docs, n = 8, minTokens = 8, maxDf = 10).count() == 0)
    // and coverage can never exceed the document's own token count
    val cov = Dedup.spanCoverage(docs, n = 8, minTokens = 8, maxDf = 10)
      .as[(Long, Long, Long, Long)].collect()
    cov.foreach { case (id, nTok, dup, ratio) =>
      assert(dup <= nTok, s"doc $id: dup_tokens $dup > n_tokens $nTok")
      assert(ratio <= 1000000L, s"doc $id: dup_ratio_e6 $ratio > 1e6")
    }
  }

  test("semanticDedup keeps one representative per embedding cluster") {
    // two tight clusters around (1,0,0,0) and (0,1,0,0) plus one isolated
    // vector: within-cluster cosine ~1, across ~0
    def jig(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, d) => x + 0.01f * ((i + d) % 3) }
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f)
    val vecs = (Seq(
      (0L, jig(a, 0)), (1L, jig(a, 1)), (2L, jig(a, 2)),
      (10L, jig(b, 0)), (11L, jig(b, 1)),
      (20L, Array(0f, 0f, 1f, 0f)))).toDF("vec_id", "embedding")
    val cents = Similarity.kMeansCentroidsE6(vecs, k = 3, iters = 2)
    val out = Dedup.semanticDedup(vecs, cents, minCosine = 0.9)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toList
    assert(out.map(_._1) == List(0L, 1L, 2L, 10L, 11L, 20L))
    // min-id survivors: 0 for the a-cluster, 10 for the b-cluster, the
    // isolated 20 keeps itself
    assert(out.filter(_._3).map(_._1) == List(0L, 10L, 20L))
    assert(out.filter(t => Set(1L, 2L).contains(t._1)).forall(_._2 == 0L))
    assert(out.find(_._1 == 11L).get._2 == 10L)
  }

  test("removeSharedSpans keeps the min-id copy; re-detection finds nothing") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val blockA = words("shared", 20)
    val d1 = s"${words("u", 10)} $blockA ${words("v", 10)}"
    val d2 = s"${words("x", 5)} $blockA ${words("y", 7)}"
    val docs = Seq((1L, d1), (2L, d2), (3L, words("w", 40))).toDF("doc_id", "text")
    val cleaned = Dedup.removeSharedSpans(docs, n = 8, minTokens = 12, maxDf = 10)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList
    // lower id keeps its passage verbatim; greater id loses exactly the span
    assert(cleaned(0) == (1L, d1, 40L, 0L))
    assert(cleaned(1) == (2L, s"${words("x", 5)} ${words("y", 7)}", 32L, 20L))
    assert(cleaned(2) == (3L, words("w", 40), 40L, 0L))
    // the defining property of a scrub pass: detection on the cleaned
    // corpus reports zero spans at the same threshold
    val again = Seq(cleaned(0), cleaned(1), cleaned(2))
      .map(r => (r._1, r._2)).toDF("doc_id", "text")
    assert(Dedup.sharedSpanPairs(again, n = 8, minTokens = 12, maxDf = 10).count() == 0)
  }

  test("ppjoinPairs is lossless: equals the brute-force pair set on a randomized corpus") {
    // 80 docs from a small vocabulary with heavy mutation + 10 planted
    // near-identical pairs — high-overlap AND borderline pairs both occur
    val rnd = new scala.util.Random(1234)
    val vocab = ('a' to 'z').map(_.toString)
    def doc(): String = Seq.fill(12 + rnd.nextInt(8))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 70).map(i => (i.toLong, doc()))
    val dups = (0 until 10).map { i =>
      val (id, t) = base(i * 5)
      val ws = t.split(" ").toBuffer
      ws(rnd.nextInt(ws.size)) = vocab(rnd.nextInt(vocab.size)) // 1 mutation
      (1000L + id, ws.mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")

    val got = Dedup.ppjoinPairs(docs, tauNum = 1, tauDen = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // independent quadratic reference on the same shingle sets
    val sh = docs.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("s"))
      .filter(size(col("s")) >= 1)
    val ref = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("i", size(array_intersect(col("a.s"), col("b.s"))))
      .withColumn("u", size(col("a.s")) + size(col("b.s")) - col("i"))
      .filter(col("i") * 2 >= col("u") * 1)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ref.nonEmpty, "reference found no pairs — corpus too sparse to test")
    assert(got == ref, s"missing=${ref -- got} extra=${got -- ref}")
  }

  test("cluster-level split assignment can never leak a near-dup pair across splits") {
    import spark.implicits._
    // any edge set: docs in one component share the component label, and
    // the split is a pure function of that label — zero leaky clusters
    // by construction. Verified on a chain that per-doc splitting DOES
    // split (ids chosen so doc-id coins disagree within the chain).
    val ids = (1L to 40L)
    val docs = ids.map(i => (i, s"doc $i")).toDF("id", "text")
    val pairs = ids.sliding(2).map(w => (w.head, w.last)).toSeq
      .toDF("id_a", "id_b") // one 40-doc chain
    val cc = Dedup.connectedComponents(docs.select(col("id")), pairs)
    val clustered = cc.select(col("id"), col("component"),
      Corpus.splitAssign(col("component")).as("split"))
    assert(clustered.select("split").distinct().count() == 1L)
    val perDoc = cc.select(col("id"), col("component"),
      Corpus.splitAssign(col("id")).as("split"))
    assert(perDoc.select("split").distinct().count() > 1L,
      "fixture too small to show the per-doc splitter leaking")
  }

  test("incrementalDedup classifies exact, near, and new against the base only") {
    import spark.implicits._
    val base = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different text about something else entirely"),
      (6L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val batch = Seq(
      (5L, "the quick brown fox jumps over the lazy dog"), // exact (min base id 2)
      (10L, "the quick brown fox jumps over the sleepy dog"), // near of 2
      (15L, "unrelated content sharing no phrases with anyone here"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(base, batch, minJaccard = 0.2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    assert(out(5L) == (("exact_dup", Some(2L))))
    assert(out(10L) == (("near_dup", Some(2L))))
    assert(out(15L) == (("new", None)))
    assert(out.size == 3)
  }

  test("keepClusterBest: max-quality survivor, min-id ties, singletons kept") {
    // cluster {1,2,3}: 3 has the best quality → survives (not min id 1);
    // cluster {4,5}: tied quality → min id 4 survives; 6 is a singleton
    // absent from labels → survives as its own cluster.
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 50L),
      (4L, 20L), (5L, 20L),
      (6L, 5L)).toDF("doc_id", "q")
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L)).toDF("id", "component")
    val kept = Dedup.keepClusterBest(docs, "doc_id", col("q"), labels)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L, 6L))
  }
}
