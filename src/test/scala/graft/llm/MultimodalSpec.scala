package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The multimodal plumbing — schema, binary columns, batch shapes — plus
  * the two decode kernels: the REAL javax.imageio codec (pixel-level
  * assertions on generated PNGs, including non-solid images the oracled
  * queries can't express) and the deterministic byte profiler used for
  * payloads no in-container codec parses.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ImageCodec: decode recovers dims and exact channel means of a real PNG") {
    val png = Multimodal.ImageCodec.encodePng(6, 4, 200, 100, 50)
    // a real PNG signature, not a profiler fallback
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val Some((w, h, nf, f)) = Multimodal.ImageCodec.tryDecode(png)
    assert(w == 6 && h == 4 && nf == 1)
    assert(math.round(f(0) * 255) == 200 && math.round(f(1) * 255) == 100 &&
      math.round(f(2) * 255) == 50 && math.round(f(3) * 765) == 350)
  }

  test("ImageCodec: quadrant slots see spatial structure a global mean hides") {
    // left half black, right half white: global mean 127.5ish, top-left
    // quadrant pure black — the two slot groups MUST differ
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, _, f)) = Multimodal.ImageCodec.tryDecode(bos.toByteArray)
    assert(w == 8 && h == 8)
    assert(math.round(f(0) * 255 * 2) == 255, "global mean should be exactly half")
    assert(f(4) == 0.0, "top-left quadrant is pure black")
  }

  test("ImageCodec: real resample halves a gradient and stays a decodable PNG") {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, (x * 16) << 16 | (y * 16) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some(out) = Multimodal.ImageCodec.resizePng(bos.toByteArray, 8, 8)
    val Some((w, h, _, f)) = Multimodal.ImageCodec.tryDecode(out)
    assert(w == 8 && h == 8)
    // bilinear of a linear gradient preserves the mean within rounding
    assert(math.abs(f(0) * 255 - 120.0) < 16, s"red mean drifted: ${f(0) * 255}")
  }

  test("ImageCodec: non-image bytes fall back to the byte profiler") {
    assert(Multimodal.ImageCodec.tryDecode("not an image".getBytes).isEmpty)
    val row = Multimodal.decodeFeatures(Multimodal.synthesizeAssets(
        Seq((1L, "not an image")).toDF("doc_id", "text"), "doc_id", "text"))
      .collect().head
    val (bw, bh, _, bf) =
      Multimodal.ByteProfiler.decode("not an image".getBytes, "image/jpeg")
    assert(row.width == bw && row.height == bh)
    assert(row.features.toSeq == bf.toSeq)
  }

  test("decodeFeatures takes the REAL path for genuine PNG payloads") {
    val ids = Seq(5L, 9L).toDF("doc_id")
    val rows = Multimodal.decodeFeatures(
        Multimodal.synthesizePngAssets(ids, "doc_id"))
      .collect().sortBy(_.asset_id)
    // closed-form fixture params: w = 4 + id%13, r = (id*37)%256
    assert(rows(0).width == 9 && rows(0).height == 9)
    assert(math.round(rows(0).features(0) * 255) == (5 * 37) % 256)
    assert(rows(1).width == 13 && rows(1).height == 13)
    assert(math.round(rows(1).features(2) * 255) == (9 * 83) % 256)
  }

  private def assets = Multimodal.synthesizeAssets(
    Seq((1L, "tiny"), (2L, "a longer payload body for the fake decoder"),
      (3L, "video-ish payload"), (6L, "another"))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("synthesizeAssets: schema, deterministic mime/checksum") {
    val a = assets
    assert(a.schema.fieldNames.toSeq ==
      Seq("asset_id", "mime", "payload", "n_bytes", "checksum"))
    val byId = a.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // mime = id % 4 into [png, jpeg, wav, mp4]
    assert(byId(1L) == "image/jpeg" && byId(2L) == "audio/wav" &&
      byId(3L) == "video/mp4" && byId(6L) == "audio/wav")
    // payload round-trips the source bytes
    val p = a.filter(col("asset_id") === 1).select("payload")
      .collect()(0).getAs[Array[Byte]](0)
    assert(new String(p, "UTF-8") == "tiny")
  }

  test("decodeFeatures: one row per asset, fixed feature dim, deterministic") {
    val f1 = Multimodal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    assert(f1.length == 4)
    f1.foreach(f => assert(f.features.length == Multimodal.ByteProfiler.featureDim))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("resizeAssets: dims never exceed the target box, payload shrinks") {
    val r = Multimodal.resizeAssets(assets, maxW = 20, maxH = 20).collect()
    r.foreach { a =>
      assert(a.width <= 20 && a.height <= 20 && a.width >= 1 && a.height >= 1)
      assert(a.payload.length >= 1)
    }
  }

  test("sampleFrames: videos fan out by stride, non-videos yield one frame") {
    val frames = Multimodal.sampleFrames(assets, stride = 5).collect()
      .groupBy(_.asset_id).view.mapValues(_.length).toMap
    val nFrames = Multimodal.decodeFeatures(assets).collect()
      .map(f => f.asset_id -> f.n_frames).toMap
    frames.foreach { case (id, n) =>
      val expected = (nFrames(id) + 4) / 5 // ceil(n_frames / stride)
      assert(n == expected, s"asset $id: $n frames, expected $expected")
    }
    // non-video assets have exactly one frame
    assert(frames(1L) == 1 && frames(2L) == 1 && frames(6L) == 1)
  }

  test("phashNearDupPairs pairs identical payloads, rejects same-size different profiles") {
    val docs = Seq(
      (1L, "abcabcabc"), // identical twins → must pair
      (2L, "abcabcabc"),
      (3L, "zzzzzzzzz"), // same length (same w/h bucket) but different byte profile
      (4L, "a completely different longer text payload")
    ).toDF("doc_id", "text")
    val pairs = Multimodal.phashNearDupPairs(
        Multimodal.decodeFeatures(Multimodal.synthesizeAssets(docs, "doc_id", "text")).toDF())
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("text payloads with GIF/BM prefixes never reach ImageIO (tight sniff)") {
    // GIF/BMP signatures are printable ASCII: plausible English prefixes
    // must stay on the byte-profile path — the version/size-field checks
    // reject them before any reader discovery
    for (text <- Seq("GIF is a format, not a promise",
        "GIF87 looked different", "BM25 ranking beats raw TF",
        "BMW sold more cars this quarter"))
      assert(Multimodal.ImageCodec.tryDecode(text.getBytes("UTF-8")).isEmpty,
        s"'$text' sniffed as an image")
    // and the decoder column records the byte-profile dispatch
    val rows = Multimodal.decodeFeatures(Multimodal.synthesizeAssets(
        Seq((1L, "GIF89a almost, but prose"), (2L, "BM header lookalike"))
          .toDF("doc_id", "text"), "doc_id", "text"))
      .collect()
    assert(rows.forall(_.decoder == "bytes"))
  }

  test("ImageIO-written GIF and BMP still pass the tightened sniff") {
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, 0x336699)
    for (fmt <- Seq("gif", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val Some((w, h, _, _)) = Multimodal.ImageCodec.tryDecode(bos.toByteArray)
      assert(w == 5 && h == 3, s"real $fmt payload rejected by the sniff")
    }
  }

  test("perceptualHash REJECTS image-decoded rows at run time (decoder guard)") {
    val df = Seq((1L, "doc")).toDF("doc_id", "text")
    val pngAssets = Multimodal.synthesizePngAssets(df, "doc_id")
    val imageFeats = Multimodal.decodeFeatures(pngAssets.select(
      col("asset_id"), col("mime"), col("payload"),
      octet_length(col("payload")).cast("long").as("n_bytes"))).toDF()
    assert(imageFeats.collect().forall(_.getAs[String]("decoder") == "image"))
    val ex = intercept[Exception] {
      Multimodal.perceptualHash(imageFeats).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("ByteProfiler-path")),
      s"wrong failure: ${messages(ex)}")
    // byte-profile rows sail through the same guard
    val byteFeats = Multimodal.decodeFeatures(Multimodal.synthesizeAssets(
      df, "doc_id", "text")).toDF()
    assert(Multimodal.perceptualHash(byteFeats).collect().nonEmpty)
  }

  test("WavCodec: PCM16 round-trip recovers rate, channels, every sample") {
    val samples = Array.tabulate(777)(i => ((i * 131) % 30000 - 15000).toShort)
    val wav = Multimodal.WavCodec.encodePcm16(samples, sampleRate = 16000)
    val pcm = Multimodal.WavCodec.tryDecodePcm16(wav)
      .getOrElse(fail("own encoding did not decode"))
    assert(pcm.sampleRate == 16000)
    assert(pcm.channels == 1)
    assert(pcm.samples.toSeq == samples.toSeq)
  }

  test("WavCodec: rejects garbage, truncation, and non-PCM formats") {
    val W = Multimodal.WavCodec
    assert(W.tryDecodePcm16(null).isEmpty)
    assert(W.tryDecodePcm16("not a wav at all, just text padding...!!".getBytes).isEmpty)
    val good = W.encodePcm16(Array.tabulate(100)(_.toShort))
    assert(W.tryDecodePcm16(good.take(40)).isEmpty) // under minimum header
    // flip the format tag to 3 (IEEE float) — parser must refuse
    val float32 = good.clone(); float32(20) = 3
    assert(W.tryDecodePcm16(float32).isEmpty)
    // oversized declared data chunk (runs past the payload) must refuse
    val lying = good.clone(); lying(43) = 0x7f
    assert(W.tryDecodePcm16(lying).isEmpty)
  }

  test("WavCodec: chunk walk skips unknown chunks (LIST before data)") {
    // splice a LIST chunk between fmt and data: still a valid WAV, and a
    // header-offset-44 shortcut would misread it
    val samples = Array.tabulate(64)(i => (i * 100).toShort)
    val plain = Multimodal.WavCodec.encodePcm16(samples)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = plain.take(36) ++ extra ++ plain.drop(36)
    // patch the RIFF size field (bytes 4-7, LE)
    val riffLen = spliced.length - 8
    for (j <- 0 until 4) spliced(4 + j) = ((riffLen >> (8 * j)) & 0xff).toByte
    val pcm = Multimodal.WavCodec.tryDecodePcm16(spliced)
      .getOrElse(fail("LIST-spliced WAV did not decode"))
    assert(pcm.samples.toSeq == samples.toSeq)
  }

  test("real WAV decode and byte kernel share the frame contract (VAD-swappable)") {
    val df = Seq(1L, 2L, 3L).toDF("doc_id")
    val wavAssets = Multimodal.synthesizeWavAssets(df, "doc_id")
    val real = Multimodal.audioSampleFrameEnergies(wavAssets).toDF()
    // closed-form check: id=1 has n = 50 + 1%200 = 51 samples, so frame 0
    // is Σ over ALL 51 of |(7 + 13i) % 2001 − 1000| — a partial frame,
    // which also witnesses the data-chunk length parse
    val expected = (0 until 51).map(i => math.abs((7 + 13 * i) % 2001 - 1000).toLong).sum
    val got = real.filter(col("asset_id") === 1 && col("frame") === 0)
      .select("energy").as[Long].head()
    assert(got == expected, s"frame-0 energy $got != closed form $expected")
    // vadSummary runs unchanged on REAL-decoded frames (the byte-kernel
    // path through the same helper is pinned by mm_audio_vad's oracle)
    val summary = Multimodal.vadSummary(real).orderBy("asset_id").collect()
    assert(summary.length == 3)
    assert(summary.forall(r => r.getLong(1) > 0)) // n_frames
  }

  test("resampleWav decimates 2:1 and re-encodes a decodable half-rate WAV") {
    val samples = Array.tabulate(101)(i => ((i * 313) % 20000 - 10000).toShort)
    val wav = Multimodal.WavCodec.encodePcm16(samples, sampleRate = 8000)
    val assets = Seq((5L, wav)).toDF("asset_id", "payload")
    val out = Multimodal.resampleWav(assets, factor = 2)
      .select("payload").as[Array[Byte]].head()
    val pcm = Multimodal.WavCodec.tryDecodePcm16(out)
      .getOrElse(fail("resampled payload did not decode"))
    assert(pcm.sampleRate == 4000)
    assert(pcm.samples.toSeq == (0 until 51).map(j => samples(2 * j)))
    // non-WAV payloads yield no row
    val none = Multimodal.resampleWav(
      Seq((6L, "definitely not audio".getBytes)).toDF("asset_id", "payload"))
    assert(none.count() == 0)
  }

  test("vadSegments splits voiced runs into per-island rows") {
    // asset 1: energies (10,10,100,100,10,100) over 6 frames, mean 55 —
    // voiced frames {2,3,5} → islands [2,3] and [5]
    val frames = Seq(
      (1L, 0, 10L), (1L, 1, 10L), (1L, 2, 100L),
      (1L, 3, 100L), (1L, 4, 10L), (1L, 5, 100L)
    ).toDF("asset_id", "frame", "energy")
    val segs = Multimodal.vadSegments(frames)
      .orderBy("asset_id", "seg_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(segs.toSeq == Seq(
      (1L, 1L, 2L, 3L, 2L, 200L),
      (1L, 2L, 5L, 5L, 1L, 100L)))
  }

  test("audioMeta reports fmt/data chunk facts for decodable assets only") {
    val df = Seq(10L, 11L).toDF("doc_id")
    val meta = Multimodal.audioMeta(Multimodal.synthesizeWavAssets(df, "doc_id"))
      .toDF().orderBy("asset_id").collect()
    assert(meta.length == 2)
    assert(meta.forall(_.getInt(1) == 8000))
    assert(meta.forall(_.getInt(2) == 1))
    assert(meta.map(_.getLong(3)).toSeq == Seq(50 + 10 % 200, 50 + 11 % 200).map(_.toLong))
    // non-WAV payloads yield no row
    val none = Multimodal.audioMeta(
      Multimodal.synthesizeAssets(
        df.withColumn("txt", lit("plain text, certainly not RIFF")),
        "doc_id", "txt"))
      .collect()
    assert(none.isEmpty)
  }

  test("shotSummary splits frames into shots at signature jumps") {
    // asset 1: sigs (100,110,400,410,405,100) — cuts at |Δ|>96: frames
    // 1→2 (290) and 4→5 (305) → 3 shots of lengths 2, 3, 1
    val frames = Seq(
      (1L, 0, 100L), (1L, 1, 110L), (1L, 2, 400L),
      (1L, 3, 410L), (1L, 4, 405L), (1L, 5, 100L),
      // asset 2: one frame — no transitions, one shot, ratio denominator
      // must clamp (n_frames - 1 = 0)
      (2L, 0, 7L)
    ).toDF("asset_id", "frame", "sig")
    val out = Multimodal.shotSummary(frames, threshold = 96L)
      .orderBy("asset_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 6L, 2L, 3L, 3L, 400000L), // 2 cuts / 5 transitions = 0.4
      (2L, 1L, 0L, 1L, 1L, 0L)))
  }

  test("videoFrameSignatures: video-only fan-out, exact byte-sample sums") {
    val df = Seq(3L, 4L).toDF("doc_id") // 3 → video/mp4, 4 → image/png
      .withColumn("txt", lit("abcdefghij")) // n=10 → video has 1+10%30=11 frames
    val sigs = Multimodal.videoFrameSignatures(
        Multimodal.synthesizeAssets(df, "doc_id", "txt"))
      .toDF().orderBy("asset_id", "frame").collect()
    assert(sigs.forall(_.getLong(0) == 3L), "only the video asset fans out")
    assert(sigs.length == 11)
    val p = "abcdefghij".getBytes("UTF-8")
    def expected(f: Int): Long =
      (0 until 8).map(j => (p((f * 131 + j * 7) % 10) & 0xff).toLong).sum
    sigs.foreach { r =>
      assert(r.getLong(2) == expected(r.getInt(1)),
        s"frame ${r.getInt(1)} signature mismatch")
    }
  }
}
