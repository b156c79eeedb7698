package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def evalOn[T](text: String, f: Column => Column): T =
    Seq(text).toDF("t").select(f(col("t")).as("r")).collect()(0).getAs[T]("r")

  test("tokenCount: empty and blank → 0; words counted on any whitespace") {
    assert(evalOn[Int]("", TextStats.tokenCount) == 0)
    assert(evalOn[Int]("   ", TextStats.tokenCount) == 0)
    assert(evalOn[Int]("a b\tc\nd", TextStats.tokenCount) == 4)
  }

  test("subwordCount: letter runs, digit runs, single punct each count once") {
    // hello | , | world | 42 | !
    assert(evalOn[Int]("hello, world42!", TextStats.subwordCount) == 5)
    assert(evalOn[Int]("", TextStats.subwordCount) == 0)
  }

  test("stopwordRatio and meanWordLength") {
    assert(evalOn[Double]("the cat", TextStats.stopwordRatio) == 0.5)
    assert(evalOn[Double]("", TextStats.stopwordRatio) == 0.0)
    assert(evalOn[Double]("ab cdef", TextStats.meanWordLength) == 3.0)
  }

  test("langId picks the right function-word profile; und for no signal") {
    assert(evalOn[String]("the cat sat on the mat and it was happy", TextStats.langId) == "en")
    assert(evalOn[String]("der hund ist nicht mit der katze", TextStats.langId) == "de")
    assert(evalOn[String]("le chat est dans la maison pour une heure", TextStats.langId) == "fr")
    assert(evalOn[String]("el perro es una mascota en la casa", TextStats.langId) == "es")
    assert(evalOn[String]("xyzzy qwerty", TextStats.langId) == "und")
  }

  test("fingerprint is invariant to case and whitespace collapse") {
    val fp1 = evalOn[String]("Hello   World", TextStats.fingerprint)
    val fp2 = evalOn[String]("  hello world ", TextStats.fingerprint)
    val fp3 = evalOn[String]("hello worlds", TextStats.fingerprint)
    assert(fp1 == fp2 && fp1 != fp3)
  }

  test("documentStats (TextCounts one-pass) matches the reference formulations") {
    val texts = Seq(
      "the cat sat on the mat and it was happy.",
      "", "   ", "a", "hello, world42! 3.14",
      "der hund ist nicht mit der katze 12345",
      "Viele Sätze enthalten Umlaute, ähnlich čeština überall",
      "punct;soup:everywhere!?!?.,", "\tleading tab", "word " + "trail  ",
      // trailing non-space whitespace: Spark split keeps the trailing empty
      // token ("abc\n" = 2 tokens) and Spark trim strips spaces only —
      // these distinguish java.lang.String defaults from Spark semantics
      "abc\n", "tab end\t", "\t", "a\n\nb", " \tmixed edge \t ")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = TextStats.documentStats(docs).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    // reference assembly from the original per-op Column functions
    val t = col("text")
    val ref = docs.select(
        col("doc_id"),
        TextStats.tokenCount(t).cast("long").as("n_tokens"),
        TextStats.subwordCount(t).cast("long").as("n_subwords"),
        length(t).cast("long").as("n_chars_computed"),
        TextStats.punctCount(t).cast("long").as("n_punct"),
        TextStats.digitCount(t).cast("long").as("n_digits"),
        graft.util.Num.e6(TextStats.stopwordRatio(t)).as("stopword_ratio_e6"),
        graft.util.Num.e6(TextStats.meanWordLength(t)).as("mean_word_len_e6"),
        graft.util.Num.e6(TextStats.qualityScore(t)).as("quality_e6"),
        TextStats.langId(t).as("lang_guess"),
        TextStats.fingerprint(t).as("fp"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(fast == ref)
  }

  test("tfIdf golden: exact rational idf, rarer token scores higher") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextStats.tfIdf(docs)
      .select("doc_id", "tok", "tf", "df", "score_e6")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // N=2; df: a=1, b=2, c=1 → idf_e6: a=2e6, b=1e6, c=2e6
    assert(got((1L, "a")) == ((2L, 1L, 4000000L)), got.toString)
    assert(got((1L, "b")) == ((1L, 2L, 1000000L)), got.toString)
    assert(got((2L, "b")) == ((1L, 2L, 1000000L)), got.toString)
    assert(got((2L, "c")) == ((1L, 1L, 2000000L)), got.toString)
  }

  test("qualityScore stays in [0,1] across pathological inputs") {
    val inputs = Seq("", "a", "!!!!!!!!", "1234567890" * 50,
      "the and of to is in that it was for " * 20, "word " * 1000)
    val scores = inputs.toDF("t")
      .select(TextStats.qualityScore(col("t")).as("q")).collect().map(_.getDouble(0))
    scores.foreach(q => assert(q >= 0.0 && q <= 1.0, s"q=$q out of range"))
    // prose with stopwords beats punctuation soup
    assert(scores(4) > scores(2))
  }

  test("repetitionStats: looping text flags, varied text doesn't, empty/single-token are safe") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),       // all-dup + dominant bigram
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")), // all distinct, long enough
                                                      // that one bigram < 20% of chars
      (3L, ""),                                    // empty
      (4L, "single")                               // one token, no bigram
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 6 tokens 1 distinct → dup ratio 5/6; top bigram "spam spam" x5
    assert(out(1L).getLong(1) == 6L && out(1L).getLong(2) == 1L)
    assert(out(1L).getLong(3) == 833333L) // floor(5/6 * 1e6)
    assert(out(1L).getString(4) == "spam spam" && out(1L).getLong(5) == 5L)
    assert(out(1L).getBoolean(7), "looping doc must flag")
    // doc 2: zero dup ratio, every bigram count 1 → no flag
    assert(out(2L).getLong(3) == 0L && !out(2L).getBoolean(7))
    // max-struct tie-break: all counts 1 → lexicographically greatest bigram
    assert(out(2L).getString(4) == "w9 w10")
    // empty + single-token: zeros, empty bigram, no flag, no crash
    for (id <- Seq(3L, 4L)) {
      assert(out(id).getLong(5) == 0L && out(id).getString(4) == "")
      assert(!out(id).getBoolean(7))
    }
  }

  test("redactPii: urls, emails, digit runs; staged counts match; benign text untouched") {
    val docs = Seq(
      (1L, "mail me at a.b+c@x-corp.example.org or see https://ex.org/p?id=1234567890 ref 99887766"),
      (2L, "no pii here, just words and the number 42"),
      (3L, "https://u:p@host.example/a b@c.de 1234567")
    ).toDF("doc_id", "text")
    val (u, e, n) = TextStats.redactionCounts(col("text"))
    val out = docs.select(col("doc_id"),
        TextStats.redactPii(col("text")).as("r"),
        u.as("u"), e.as("e"), n.as("n"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) ==
      "mail me at <EMAIL> or see <URL> ref <NUM>")
    assert((out(1L).getLong(2), out(1L).getLong(3), out(1L).getLong(4)) == ((1L, 1L, 1L)))
    assert(out(2L).getString(1) == "no pii here, just words and the number 42")
    assert((out(2L).getLong(2), out(2L).getLong(3), out(2L).getLong(4)) == ((0L, 0L, 0L)))
    // order contract: the URL (with @userinfo) is consumed by the URL pass,
    // so the email pass only sees the standalone address
    assert(out(3L).getString(1) == "<URL> <EMAIL> <NUM>")
    assert((out(3L).getLong(2), out(3L).getLong(3), out(3L).getLong(4)) == ((1L, 1L, 1L)))
  }

  test("lmSurprisal: hand-computed add-one bigram bits") {
    import spark.implicits._
    // corpus: "a b", "a b", "a c" → c(a,b)=2, c(a,c)=1, c1(a)=3, V=|{b,c}|=2
    // p(b|a)=3/5 → ⌊log2(5/3)⌋=0 bits; p(c|a)=2/5 → ⌊log2(5/2)⌋=1 bit
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextStats.lmSurprisal(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("surprisal_bits"))).toMap
    assert(out(1L) == ((1L, 0L)))
    assert(out(2L) == ((1L, 0L)))
    assert(out(3L) == ((1L, 1L)))
  }

  test("moreLikeThis: ranks by shared tokens, excludes self and disjoint docs") {
    import spark.implicits._
    // query doc 1 shares "alpha" with 2 and nothing with 3; "beta" is
    // unique to the query so it scores nobody. Exactly one result row.
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma"),
      (3L, "delta epsilon")).toDF("doc_id", "text")
    val out = TextStats.moreLikeThis(docs, Seq(1L).toDF("doc_id"), k = 5)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("query_id") == 1L)
    assert(r.getAs[Long]("doc_id") == 2L)
    assert(r.getAs[Long]("rnk") == 1L)
    assert(r.getAs[Long]("score_e6") > 0L)
  }

  test("moreLikeThis: matches bm25's scoring when the query bag is the same") {
    import spark.implicits._
    // a single-token query doc makes the MLT bag equal a fixed bm25
    // query, so per-candidate scores must agree exactly
    val docs = Seq((1L, "zeta"), (2L, "zeta zeta other"), (3L, "zeta x"),
      (4L, "y z")).toDF("doc_id", "text")
    val mlt = TextStats.moreLikeThis(docs, Seq(1L).toDF("doc_id"), k = 10)
      .select("doc_id", "score_e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fix = TextStats.bm25(docs, Seq("zeta"), k = 10)
      .select("doc_id", "score_e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bm25 includes the query doc itself; MLT excludes it
    assert(mlt == (fix - 1L))
  }

  test("clusterKeywords: c-TF-IDF favors cluster-exclusive tokens, drops stopwords") {
    import spark.implicits._
    // cell 0 is about fruit, cell 1 about transit; "shared" appears in
    // both cells (idf 1e6), exclusive tokens get idf 2e6. "the" is a
    // stopword and must never label a cluster.
    val docs = Seq(
      (1L, "the apple banana shared"), (2L, "the apple shared"),
      (3L, "the train car shared"), (4L, "the train shared"))
      .toDF("doc_id", "text")
    val cells = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("doc_id", "cell")
    val out = TextStats.clusterKeywords(docs, cells, k = 2).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("rnk")) ->
        ((r.getString(1), r.getAs[Long]("score_e6")))).toMap
    // cell 0: apple tf=2 cf=1 → 2·2e6 = 4e6; banana (1·2e6) ties shared
    // (2·1e6) at 2e6 and the tok-asc tie-break ranks banana first
    assert(out((0, 1L)) == (("apple", 4000000L)))
    assert(out((0, 2L)) == (("banana", 2000000L)))
    // cell 1: train tf=2 cf=1 → 4e6; car (1·2e6) ties shared, car first
    assert(out((1, 1L)) == (("train", 4000000L)))
    assert(out((1, 2L)) == (("car", 2000000L)))
  }

  test("prfExpandedSearch: feedback expansion reaches docs the raw query cannot") {
    import spark.implicits._
    // query bag {alpha} only reaches doc 2; doc 2's top new token "beta"
    // expands the bag, and the re-score now also retrieves doc 3, which
    // shares no token with the ORIGINAL query.
    val docs = Seq((1L, "alpha"), (2L, "alpha beta"), (3L, "beta gamma"),
      (4L, "delta epsilon")).toDF("doc_id", "text")
    val bag = Seq((1L, "alpha")).toDF("query_id", "tok")
    val plain = TextStats.bm25PerQuery(docs, bag, k = 10)
      .select("doc_id").as[Long].collect().toSet
    val prf = TextStats.prfExpandedSearch(docs, bag, k = 10, fb = 1, m = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(2L))
    assert(prf.contains(3L) && prf.contains(2L) && !prf.contains(4L))
  }

  test("lmSurprisal: single-token and empty docs are excluded") {
    import spark.implicits._
    val docs = Seq((1L, "only"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = TextStats.lmSurprisal(docs).select("doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(3L))
  }
}
