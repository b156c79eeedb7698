package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("mixturePlan: sqrt temperature up-weights the small source, exact e6 values") {
    // 90 "big" docs vs 10 "small", 4 tokens each: raw shares 90/10 but
    // sqrt-temperature shares w=18 vs w=6 → 750000/250000 e6. The small
    // source's 250000 > its raw 100000 — the up-weighting the recipe
    // exists for — and every e6 value is exact integer arithmetic.
    val docs = ((1 to 90).map(i => (i.toLong, "big", "a b c d")) ++
      (91 to 100).map(i => (i.toLong, "small", "a b c d")))
      .toDF("doc_id", "lang", "text")
    val plan = Corpus.mixturePlan(docs, col("text"), col("lang"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(plan("big") == ((360L, 750000L, 833333L)))
    assert(plan("small") == ((40L, 250000L, 2500000L)))
  }

  test("mixtureApply: copy counts replay the md5 coin exactly") {
    // same 90/10 corpus: big repeat_e6 = 833333 (Bernoulli 0.833333),
    // small = 2500000 (2 whole copies + Bernoulli 0.5). Expected counts
    // recomputed here with an independent JVM md5 — engine must match.
    val docs = ((1 to 90).map(i => (i.toLong, "big", "a b c d")) ++
      (91 to 100).map(i => (i.toLong, "small", "a b c d")))
      .toDF("doc_id", "lang", "text")
    def coin(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#mix".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expBig = (1 to 90).map(i => if (coin(i) < 833333L) 1L else 0L).sum
    val expSmall = (91 to 100).map(i => 2L + (if (coin(i) < 500000L) 1L else 0L)).sum
    val out = Corpus.mixtureApply(docs, col("text"), col("lang"), col("doc_id"))
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("realized_docs"),
        r.getAs[Long]("realized_tokens")))).toMap
    assert(out("big") == ((expBig, expBig * 4)))
    assert(out("small") == ((expSmall, expSmall * 4)))
  }

  test("splitAssign is deterministic and stable under corpus growth") {
    val small = spark.range(0, 100).toDF("id")
      .select(col("id"), Corpus.splitAssign(col("id")).as("s"))
    val large = spark.range(0, 1000).toDF("id")
      .select(col("id"), Corpus.splitAssign(col("id")).as("s"))
    val smallMap = small.as[(Long, String)].collect().toMap
    val largeMap = large.as[(Long, String)].collect().toMap
    // growing the corpus never reassigns an existing id
    smallMap.foreach { case (id, s) => assert(largeMap(id) == s, s"id $id moved") }
    // rerun = same assignment
    assert(small.as[(Long, String)].collect().toMap == smallMap)
  }

  test("splitAssign fractions are approximately honored") {
    val counts = spark.range(0, 10000).toDF("id")
      .select(Corpus.splitAssign(col("id")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 9000L) < 300, counts)
    assert(math.abs(counts.getOrElse("val", 0L) - 500L) < 150, counts)
    assert(math.abs(counts.getOrElse("test", 0L) - 500L) < 150, counts)
  }

  test("splitAssign respects a custom salt and fraction list") {
    val df = spark.range(0, 1000).toDF("id")
    val a = df.select(Corpus.splitAssign(col("id"), salt = "a").as("s"))
      .as[String].collect()
    val b = df.select(Corpus.splitAssign(col("id"), salt = "b").as("s"))
      .as[String].collect()
    assert(a.toSeq != b.toSeq) // different salt → different assignment
    val two = df.select(Corpus.splitAssign(col("id"),
        Seq("x" -> 0.5, "y" -> 0.5), "a").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(two("x") - 500L) < 100, two)
  }

  test("splitAssign routes correctly when a cumulative bound reaches 1.0") {
    // a trailing zero-fraction bucket makes the non-final cumulative bound
    // hit 1.0 exactly; un-clamped that formats as 9-char "100000000" and
    // the 8-char lexicographic compare misroutes nearly everything to "y"
    val counts = spark.range(0, 1000).toDF("id")
      .select(Corpus.splitAssign(col("id"),
        Seq("x" -> 1.0, "y" -> 0.0), "a").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("x", 0L) >= 999L, counts) // ≤1-in-2^32 'ffffffff' flukes
  }

  test("packSequences assigns chunk by the doc's first token (golden)") {
    // lang a: tokens 4,4,4 with capacity 10 → starts 0,4,8 → packs 0,0,0
    // lang b: tokens 9,9   with capacity 10 → starts 0,9   → packs 0,0
    //   then 5 → start 18 → pack 1, offset 8
    val df = Seq(
      (1L, "a", 4), (2L, "a", 4), (3L, "a", 4),
      (4L, "b", 9), (5L, "b", 9), (6L, "b", 5)
    ).toDF("id", "lang", "n")
    val got = Corpus.packSequences(df, col("n"), col("lang"), col("id"), 10)
      .select("id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(got(1L) == (0L, 0L) && got(2L) == (0L, 4L) && got(3L) == (0L, 8L), got)
    assert(got(4L) == (0L, 0L) && got(5L) == (0L, 9L) && got(6L) == (1L, 8L), got)
  }

  test("packSequences offsets are always within capacity") {
    val df = spark.range(0, 500).toDF("id")
      .withColumn("lang", (col("id") % 3).cast("string"))
      .withColumn("n", (col("id") % 97 + 1).cast("int"))
    val bad = Corpus.packSequences(df, col("n"), col("lang"), col("id"), 64)
      .filter(col("pack_offset") < 0 || col("pack_offset") >= 64)
    assert(bad.count() == 0)
  }

  test("tokenCount matches TextCounts semantics incl. empty and edges") {
    val df = Seq("", "   ", "one", "a b  c", " x\ty ").toDF("t")
      .select(Corpus.tokenCount(col("t")).as("n"))
    // "   " trims to empty → 0; " x\ty " spark-trims 0x20 only → "x\ty"
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 1, 3, 2))
  }

  test("tokenQuantiles golden: known distribution per group") {
    val docs = (1 to 5).map(i => ("g1", ("w " * i).trim))
      .toDF("lang", "text") // token counts 1..5
    val r = Corpus.tokenQuantiles(docs, col("text"), col("lang"),
        Seq(0.5, 1.0)).collect()(0)
    assert(r.getAs[Long]("n_docs") == 5L)
    assert(r.getAs[Double]("q0") == 3.0) // median of 1..5
    assert(r.getAs[Double]("q1") == 5.0) // max
  }

  test("curate: each stage filters — lang, quality, exact dup, near dup — and min id survives") {
    val english = "the quick brown fox and the lazy dog walk with a friend " +
      "over the green field while they watch the morning light together"
    val docs = Seq(
      (1L, english),                       // survivor (canonical)
      (2L, english),                       // exact dup of 1 → dropped
      // " the" adds no NEW distinct token → identical simhash (hamming 0)
      // but a different md5 fingerprint: exactly the case near-dup removal
      // catches and exact dedup misses
      (3L, english + " the"),
      (4L, "der schnelle braune fuchs und der faule hund gehen mit einem " +
        "freund im feld und sie sehen das licht zusammen dort"), // German → lang drop
      (5L, "x1 9$ @@ ## !! 77 %% ^^"),     // junk → quality drop
      (6L, "a completely different english story where people read books " +
        "and walk along the river with their friends every day")) // survivor
      .toDF("doc_id", "text")
    val out = Corpus.curate(docs, keepLangs = Seq("en"), minQualityE6 = 650000L)
      .orderBy("doc_id").collect()
    // the persist knob changes execution (cache the twice-consumed survivor
    // frame), never results
    assert(Corpus.curate(docs, keepLangs = Seq("en"), minQualityE6 = 650000L,
      persistIntermediate = true).orderBy("doc_id").collect().toSeq == out.toSeq)
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 6L), s"expected canonical survivors, got $ids")
    out.foreach { r =>
      assert(Seq("train", "val", "test").contains(r.getAs[String]("split")))
      assert(r.getAs[String]("lang_guess") == "en")
      assert(r.getAs[Long]("quality_e6") >= 650000L)
    }
  }

  test("contaminationReport counts eval-set n-gram overlap and flags by threshold") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // exact eval copy
      (2L, "the quick brown fox sat still today and watched the river"), // partial
      (3L, "completely different words entirely here now again friends"), // disjoint
      (4L, "")) // empty
      .toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val rep = Corpus.contaminationReport(corpus, eval, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("contam_ppm"), r.getAs[Boolean]("contaminated")))).toMap
    // doc 1 is the eval doc verbatim: every 3-gram hits
    assert(rep(1L) == ((7L, 7L, 1000000L, true)), rep(1L))
    // doc 2 shares exactly the "the quick brown"/"quick brown fox" prefix grams
    assert(rep(2L)._2 == 2L && rep(2L)._4 == (rep(2L)._2 * 100 >= rep(2L)._1 * 10), rep(2L))
    // doc 3: zero hits, not contaminated
    assert(rep(3L) == ((6L, 0L, 0L, false)), rep(3L))
    // empty doc: no grams, ppm 0, never flagged (no division by zero)
    assert(rep(4L) == ((0L, 0L, 0L, false)), rep(4L))
  }

  test("NgramHashes matches the declarative shingle-then-md5 Column form") {
    val texts = Seq("the quick brown fox jumps", "one two", "solo", "",
      "  padded   whitespace  text here ", "Tabs\tand\nnewlines mixed in",
      "repeat repeat repeat repeat repeat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val declarative = transform(Dedup.shingles(col("text"), 3),
      s => conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long"))
    val got = texts.select(col("id"),
        graft.expr.NgramHashes(col("text"), 3).as("fast"),
        array_distinct(declarative).as("slow"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    got.foreach { case (id, fast, slow) =>
      assert(fast.sorted == slow.sorted, s"id $id: $fast vs $slow")
    }
  }

  test("contaminationReport broadcasts the eval gram set (no corpus shuffle for the probe)") {
    val corpus = spark.range(0, 50).selectExpr("id AS doc_id",
      "concat('alpha beta gamma delta ', CAST(id AS STRING)) AS text")
    val eval = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val plan = Corpus.contaminationReport(corpus, eval, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval gram set must broadcast, got:\n$plan")
  }

  test("chunkDocuments covers every token, overlaps exactly, and replays the closed form") {
    // doc lengths straddle the interesting boundaries for width=8 step=5:
    // 0 (dropped), 1..8 (one chunk), 9 (two), 13 (two, full), 14 (three)
    val docs = Seq(0, 1, 7, 8, 9, 13, 14, 40).zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(t => s"w$t").mkString(" "))
    }.toDF("doc_id", "text")
    val got = Corpus.chunkDocuments(docs, "text", "doc_id", width = 8, overlap = 3)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(!got.contains(0L), "empty doc must emit no chunks")
    docs.as[(Long, String)].collect().filter(_._2.nonEmpty).foreach { case (id, text) =>
      val toks = text.split("\\s+")
      val chunks = got(id)
      val expNc = 1 + math.max(0, (toks.length - 8 + 4) / 5)
      assert(chunks.length == expNc, s"doc $id: ${chunks.length} vs $expNc")
      chunks.foreach { case (_, cid, nTok, ctext) =>
        val exp = toks.slice((cid * 5).toInt, (cid * 5).toInt + 8)
        assert(ctext == exp.mkString(" "), s"doc $id chunk $cid")
        assert(nTok == exp.length)
      }
      // every token index covered: last chunk reaches the end
      val (_, lastCid, lastN, _) = chunks.last
      assert(lastCid * 5 + lastN == toks.length, s"doc $id tail uncovered")
      // consecutive full-width chunks share exactly `overlap` tokens
      chunks.sliding(2).foreach {
        case Array(a, b) if a._3 == 8 =>
          val aToks = a._4.split(" ").takeRight(3)
          assert(b._4.split(" ").take(aToks.length).sameElements(aToks),
            s"doc $id chunks ${a._2}/${b._2} overlap broken")
        case _ => ()
      }
    }
  }

  test("dsirScores: target-like docs outscore off-domain docs") {
    // target = lang 'en' docs built from {alpha beta gamma}; off-domain
    // docs from {delta epsilon zeta}. DSIR must rank every target-
    // vocabulary doc above every off-domain doc, including the UNLABELED
    // doc written in target vocabulary (the selection use case: find
    // target-like docs in the raw pool).
    val docs = Seq(
      (1L, "en", "alpha beta gamma alpha beta"),
      (2L, "en", "beta gamma alpha gamma"),
      (3L, "xx", "delta epsilon zeta delta"),
      (4L, "xx", "epsilon zeta delta zeta"),
      (5L, "xx", "alpha beta gamma beta")) // target-like, unlabeled
      .toDF("doc_id", "lang", "text")
    val out = Corpus.dsirScores(docs, col("lang") === "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    val tgtLike = Seq(1L, 2L, 5L).map(out)
    val offDom = Seq(3L, 4L).map(out)
    assert(tgtLike.min > offDom.max,
      s"target-like docs must outscore off-domain: $out")
  }

  test("dsirScores: per-doc score is Σ tf·lam with whole-bit log-ratios") {
    // one-bucket-per-token corpus small enough to replay by hand
    val docs = Seq(
      (1L, true, "a a b"),
      (2L, false, "b c c c"))
      .toDF("doc_id", "tgt", "text")
    val byId = Corpus.dsirScores(docs, col("tgt"), buckets = 1024,
        textCol = "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def h(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    // raw totals: 7 tokens, target totals: 3
    def l2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val raw = Map(h("a") -> 2L, h("b") -> 2L, h("c") -> 3L)
    val tgt = Map(h("a") -> 2L, h("b") -> 1L, h("c") -> 0L)
    def lam(b: Long): Long =
      l2((tgt(b) + 1) * (7 + 1024)) - l2((raw(b) + 1) * (3 + 1024))
    val exp1 = 2 * lam(h("a")) + 1 * lam(h("b"))
    val exp2 = 1 * lam(h("b")) + 3 * lam(h("c"))
    assert(byId(1L) == exp1 && byId(2L) == exp2,
      s"expected ($exp1, $exp2), got $byId")
  }

  test("chunkDocuments plans no exchange and rejects bad parameters") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Corpus.chunkDocuments(docs, "text", "doc_id", 8, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must stay narrow:\n$plan")
    intercept[IllegalArgumentException] {
      Corpus.chunkDocuments(docs, "text", "doc_id", 0, 0)
    }
    intercept[IllegalArgumentException] {
      Corpus.chunkDocuments(docs, "text", "doc_id", 8, 8)
    }
  }
}
