package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus distributed decode / feature-extraction over
  * batches.
  *
  * Two decode kernels share one contract (bytes in → dims + feature
  * vector out):
  *   - [[ImageCodec]] — a REAL image codec on the stock JDK
  *     (`javax.imageio`, PNG/JPEG/GIF/BMP): pixel decode, channel-mean
  *     features, Graphics2D resample + PNG re-encode. No external
  *     dependency.
  *   - [[ByteProfiler]] — a deterministic byte-profile extractor for
  *     payloads with no in-container codec (audio/video mimes, or bytes
  *     that do not parse as an image): slot-wise byte sums, integral and
  *     oracle-replayable. Swapping it for a JNI/ffmpeg/javacv call
  *     changes nothing in the plan.
  * [[decodeFeatures]] dispatches per row: payloads that genuinely decode
  * as images take the real path; everything else takes the profiler.
  */
object Multimodal {

  /** Canonical asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)
  ))

  /** Build an assets frame from any table with an id and a string column —
    * the string bytes stand in for media payloads so the binary plumbing is
    * exercised with real (deterministic) data.
    */
  def synthesizeAssets(df: DataFrame, idCol: String, payloadFrom: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      // deterministic fake mime from the id
      // array(lit…), not typedlit: TypeTag reflection under foreign
      // classloaders (REPL, some test harnesses) rejects typedlit literals
      element_at(array(Seq("image/png", "image/jpeg", "audio/wav", "video/mp4").map(lit): _*),
        (pmod(col(idCol), lit(4)) + 1).cast("int")).as("mime"),
      col(payloadFrom).cast("binary").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", md5(col("payload")))

  /** Decoded-feature row contract. */
  final case class AssetFeatures(
      asset_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Double],
      // which kernel produced `features`: "image" (ImageCodec — per-PIXEL
      // channel means) or "bytes" (ByteProfiler — per-BYTE slot means).
      // The two normalize by different denominators, so any consumer that
      // re-derives integral sums from the features (perceptualHash) is
      // only exact on one kernel's rows — this column makes that
      // dispatch auditable instead of implicit.
      decoder: String)

  /** Byte-profile decode kernel: a deterministic feature extractor over
    * the RAW bytes, used for payloads no in-container codec can parse
    * (audio/video mimes — ffmpeg/javacv would slot in here — and
    * non-image bytes). Not a stub: slot-wise byte statistics are a real
    * (if crude) content fingerprint, every output is integral, and the
    * cross-engine oracles replay it bit-for-bit; [[perceptualHash]] and
    * the near-dup blocking run unchanged on either kernel's features.
    */
  object ByteProfiler {
    val featureDim = 8
    def decode(payload: Array[Byte], mime: String): (Int, Int, Int, Array[Double]) = {
      val n = payload.length
      val width = 16 + (n % 64)
      val height = 16 + ((n / 64) % 64)
      val nFrames = if (mime.startsWith("video")) 1 + (n % 30) else 1
      // Integer byte-sums first, one double division at the end: no
      // accumulated rounding, so round(feats(j) * 255 * n) recovers the
      // exact integer sum (the cross-engine check the oracle runs) for any
      // payload a 53-bit mantissa can hold — i.e. petabyte-scale payloads;
      // the former float32 form bounded the per-slot sum at 2^23 (~100 KB
      // payloads), a limit a larger test corpus would eventually hit.
      val sums = new Array[Long](featureDim)
      var i = 0
      while (i < n) { sums(i % featureDim) += (payload(i) & 0xff); i += 1 }
      val feats = new Array[Double](featureDim)
      var j = 0
      while (j < featureDim) {
        feats(j) = sums(j).toDouble / 255.0 / math.max(1, n); j += 1
      }
      (width, height, nFrames, feats)
    }
  }

  /** REAL image codec on the stock JDK — `javax.imageio` decodes PNG /
    * JPEG / GIF / BMP with zero external dependencies. Features are exact
    * channel statistics: slots 0-3 = whole-image mean R, G, B, luma
    * (each a rational sum/(255·n_px)); slots 4-7 = the same over the
    * top-left quadrant (spatial signal: a gradient and its mirror differ
    * here while their global means agree). For generated solid-color
    * fixtures every slot collapses to channel/255 exactly, which is what
    * lets a SQL oracle predict REAL decode output in closed form from
    * the generative parameters (see SimQueries' mm_real_* family).
    */
  object ImageCodec {
    val featureDim = 8

    // ImageIO defaults to a DISK-backed cache stream: every read creates
    // and deletes a temp file — pure filesystem overhead per row for
    // in-memory byte payloads, and temp-dir churn under 32-way partitions.
    // Decode from memory. (Runs once per executor JVM at first codec use.)
    javax.imageio.ImageIO.setUseCache(false)

    /** Cheap magic-byte sniff: only payloads that START like a supported
      * image format are handed to ImageIO — reader discovery costs a
      * stream spin per row, and the text-derived payloads that dominate
      * the corpora can never match a signature.
      */
    private def looksLikeImage(p: Array[Byte]): Boolean = {
      // GIF/BMP signatures are printable ASCII, so plausible TEXT prefixes
      // ("GIF is...", "BMW...") would otherwise reach ImageIO and bet
      // correctness on it rejecting garbage; check past the 2-3 magic
      // bytes — the GIF version field must be 87a/89a, and the BMP header
      // size field (LE u32 at offset 2) must equal the payload length OR
      // be zero: ImageIO and in-repo writers record the exact length,
      // but writers outside that scope commonly zero bfSize (the field is
      // informational per the BMP spec), and a zeroed u32 can never occur
      // in a printable-text prefix, so accepting it keeps external
      // corpora decodable without re-opening the text-collision hole. A
      // BMP whose writer MISrecords a nonzero bfSize (≠ length, ≠ 0) is
      // still routed to the ByteProfiler kernel — callers feeding such
      // corpora should normalize the header upstream.
      def gifVersioned: Boolean =
        p.length >= 6 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
          p(2) == 'F'.toByte && p(3) == '8'.toByte &&
          (p(4) == '7'.toByte || p(4) == '9'.toByte) && p(5) == 'a'.toByte
      def bmpSized: Boolean =
        p.length >= 14 && p(0) == 'B'.toByte && p(1) == 'M'.toByte && {
          val declared = (p(2) & 0xffL) | ((p(3) & 0xffL) << 8) |
            ((p(4) & 0xffL) << 16) | ((p(5) & 0xffL) << 24)
          declared == p.length || declared == 0L
        }
      p.length >= 4 && (
        (p(0) == 0x89.toByte && p(1) == 0x50.toByte &&
          p(2) == 0x4e.toByte && p(3) == 0x47.toByte) || // PNG
        (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||  // JPEG
        gifVersioned || bmpSized)
    }

    /** Deterministic PNG encoder for fixtures: a solid-color w×h image.
      * PNG is lossless, so decode(encodePng(w, h, r, g, b)) recovers
      * exactly (w, h, r/255, g/255, b/255, …).
      */
    def encodePng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Try the real decode; None when the bytes are not a parseable image
      * (ImageIO sniffs magic bytes — arbitrary text can never match).
      */
    def tryDecode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Double])] =
      if (!looksLikeImage(payload)) None
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val qw = math.max(1, w / 2)
          val qh = math.max(1, h / 2)
          // integer channel sums first, one division at the end — same
          // no-accumulated-rounding discipline as ByteProfiler
          val sums = new Array[Long](8) // r,g,b,luma3x globals; quadrant
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
              sums(0) += r; sums(1) += g; sums(2) += b; sums(3) += r + g + b
              if (x < qw && y < qh) {
                sums(4) += r; sums(5) += g; sums(6) += b; sums(7) += r + g + b
              }
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val nq = qw.toLong * qh
          val f = Array(
            sums(0).toDouble / 255.0 / n, sums(1).toDouble / 255.0 / n,
            sums(2).toDouble / 255.0 / n, sums(3).toDouble / 765.0 / n,
            sums(4).toDouble / 255.0 / nq, sums(5).toDouble / 255.0 / nq,
            sums(6).toDouble / 255.0 / nq, sums(7).toDouble / 765.0 / nq)
          Some((w, h, 1, f))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Real resample: Graphics2D bilinear scale + lossless PNG re-encode.
      * Solid-color inputs stay bit-exact through interpolation (every
      * sample is the same pixel), so resized fixtures remain
      * closed-form-predictable.
      */
    def resizePng(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      try {
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (src == null) None
        else {
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val gfx = dst.createGraphics()
          gfx.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          gfx.drawImage(src, 0, 0, w, h, null)
          gfx.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed decode: mapPartitions over the assets frame, one decoder
    * instance per partition (the codec-init cost is amortized across the
    * partition's batch — the Scala analogue of a Pandas-UDF `mapInPandas`
    * batch). Narrow op: no shuffle; partition sizing is inherited from the
    * scan, so `spark.sql.files.maxPartitionBytes` bounds decode memory.
    */
  def decodeFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "mime", "payload", "n_bytes").as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition decoder init would happen here (once per batch);
        // dispatch per row: a payload that parses as a real image takes
        // the ImageIO path, anything else the byte profiler
        it.map { case (id, mime, payload, nBytes) =>
          ImageCodec.tryDecode(payload) match {
            case Some((w, h, f, feats)) =>
              AssetFeatures(id, mime, nBytes, w, h, f, feats, "image")
            case None =>
              val (w, h, f, feats) = ByteProfiler.decode(payload, mime)
              AssetFeatures(id, mime, nBytes, w, h, f, feats, "bytes")
          }
        }
      }
  }

  /** Deterministic REAL-image fixture: one solid-color PNG per id, the
    * color/dims closed-form functions of the id — so a SQL oracle can
    * predict the OUTPUT of a genuine ImageIO decode without parsing a
    * byte (PNG is lossless; solid color survives any resample). The
    * encode runs distributed in the same mapPartitions batch shape as the
    * decode kernels.
    */
  def synthesizePngAssets(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 4 + (id % 13).toInt
          val h = 4 + (id % 11).toInt
          val r = ((id * 37) % 256).toInt
          val g = ((id * 59) % 256).toInt
          val b = ((id * 83) % 256).toInt
          (id, ImageCodec.encodePng(w, h, r, g, b))
        }
      }
      .toDF("asset_id", "payload")
      .select(col("asset_id"), lit("image/png").as("mime"), col("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", md5(col("payload")))
  }

  /** Metadata-only scan: everything computable without decoding — stays in
    * whole-stage codegen, pushes column pruning down so `payload` bytes are
    * read but never shipped past the projection.
    */
  def assetMetadata(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("mime"), col("n_bytes"), col("checksum"),
      substring(col("checksum"), 1, 8).as("shard_key"),
      (col("n_bytes") > 1024 * 1024).as("is_large"))

  /** Resized-asset row contract: payload out, new dims recorded. */
  final case class ResizedAsset(
      asset_id: Long,
      mime: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Distributed resize: same mapPartitions batch shape as
    * [[decodeFeatures]] (codec init amortized per partition, no shuffle).
    * Real images take the REAL path — Graphics2D bilinear resample +
    * lossless PNG re-encode via [[ImageCodec.resizePng]]; non-image
    * payloads take the declared deterministic stand-in (payload truncated
    * proportionally to the target area so output sizes behave like a
    * resampler's — swscale/ffmpeg would slot in for audio/video).
    */
  def resizeAssets(assets: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "mime", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mime, payload) =>
          ImageCodec.tryDecode(payload) match {
            case Some((w0, h0, _, _)) =>
              val scale = math.min(1.0,
                math.min(maxW.toDouble / w0, maxH.toDouble / h0))
              val w = math.max(1, (w0 * scale).toInt)
              val h = math.max(1, (h0 * scale).toInt)
              ImageCodec.resizePng(payload, w, h) match {
                case Some(out) => ResizedAsset(id, mime, out, w, h)
                // re-encode failed: keep the ORIGINAL payload with its
                // real dims — recorded dims must never contradict the
                // bytes they describe
                case None => ResizedAsset(id, mime, payload, w0, h0)
              }
            case None =>
              val (w0, h0, _, _) = ByteProfiler.decode(payload, mime)
              val scale = math.min(1.0,
                math.min(maxW.toDouble / w0, maxH.toDouble / h0))
              val w = math.max(1, (w0 * scale).toInt)
              val h = math.max(1, (h0 * scale).toInt)
              val outLen = math.max(1, (payload.length * scale * scale).toInt)
              val out = java.util.Arrays.copyOf(payload, outLen)
              ResizedAsset(id, mime, out, w, h)
          }
        }
      }
  }

  /** Perceptual (average) hash over decoded features: bit j is set when
    * feature slot j exceeds the mean slot — aHash's "cell vs mean"
    * structure over the decode output, so visually-identical assets land
    * on the same hash even when their byte streams differ in length-
    * preserving ways. The comparison is cleared to integers (8·sum_j >
    * total ⟺ feat_j > mean) via the exact integer slot sums
    * round(feat·255·n) recovers, so the hash — and the oracle — never
    * touch float comparisons. Appends (s0..s7, phash) to the frame.
    */
  def perceptualHash(featRows: DataFrame): DataFrame = {
    val dim = ByteProfiler.featureDim
    // Input contract: features must be ByteProfiler-path (slot sums are
    // exact integers under the ×255×n_bytes recovery below). ImageCodec
    // features normalize per PIXEL, so the recovery is not integral for
    // them and the MM_PHASH oracle doesn't model that path. When the
    // frame carries the decoder column, the contract is ENFORCED at run
    // time (assert_true inside a filter so Catalyst can't prune it);
    // legacy frames without the column keep working on the caller's word.
    val guarded =
      if (featRows.columns.contains("decoder"))
        featRows.filter(assert_true(col("decoder") === lit("bytes"),
          lit("perceptualHash requires ByteProfiler-path features " +
            "(integral slot sums); got an image-decoded row")).isNull)
      else featRows
    val n = greatest(col("n_bytes"), lit(1L))
    val sums = (0 until dim).map(j =>
      round(element_at(col("features"), j + 1) * 255.0 * n).cast("long").as(s"s$j"))
    val withSums = guarded.select(Seq(col("asset_id"), col("mime"),
      col("n_bytes"), col("width"), col("height")) ++ sums: _*)
    val total = (0 until dim).map(j => col(s"s$j")).reduce(_ + _)
    val bits = (0 until dim).map(j =>
      when(col(s"s$j") * dim > col("__total"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    withSums.withColumn("__total", total)
      .withColumn("phash", bits).drop("__total")
  }

  /** Perceptual near-duplicate pairs: block on (phash, width, height) —
    * a bucketed equi-join, never all-pairs — then VERIFY inside each
    * bucket with a scale-invariant byte-profile tolerance: for every slot,
    * |sum_a·n_b − sum_b·n_a| · 100 ≤ 255 · tolPct · n_a · n_b
    * (the integer cross-multiplied form of |feat_a − feat_b| ≤
    * tolPct/100 · 255-normalized). The same propose-then-verify shape as
    * MinHash-LSH dedup, applied to media: the blocking key is cheap and
    * collision-dense only for genuinely similar assets, and the verify
    * work is bounded by bucket sizes. All-integer arithmetic end to end.
    */
  def phashNearDupPairs(featRows: DataFrame, tolPct: Int = 1): DataFrame = {
    require(tolPct >= 0 && tolPct <= 100, s"tolPct in [0,100], got $tolPct")
    val dim = ByteProfiler.featureDim
    val h = perceptualHash(featRows)
    def side(tag: String) = h.select(
      Seq(col("asset_id").as(s"id_$tag"), col("phash"),
        col("width").as(s"w_$tag"), col("height").as(s"h_$tag"),
        col("n_bytes").as(s"n_$tag")) ++
        (0 until dim).map(j => col(s"s$j").as(s"s${j}_$tag")): _*)
    val cond = (0 until dim).map { j =>
      abs(col(s"s${j}_a") * col("n_b") - col(s"s${j}_b") * col("n_a")) * 100 <=
        lit(255L * tolPct) * col("n_a") * col("n_b")
    }.reduce(_ && _)
    side("a").join(side("b").withColumnRenamed("phash", "phash_b"),
        col("phash") === col("phash_b") &&
          col("w_a") === col("w_b") && col("h_a") === col("h_b") &&
          col("id_a") < col("id_b") && cond)
      .select(col("id_a"), col("id_b"), col("phash"))
  }

  /** Per-frame feature row: one output row per sampled frame (row
    * explosion happens inside the partition iterator — the Generator
    * shape, no shuffle).
    */
  /** One fixed-width audio frame's energy. */
  final case class AudioFrame(asset_id: Long, frame: Int, energy: Long)

  /** Frame-energy profile of the audio assets: the payload chopped into
    * fixed `frameBytes` windows, each reduced to its byte-value sum — the
    * deterministic stand-in for a PCM frame-energy pass (an ffmpeg/javacv
    * decoder slots in at exactly this boundary; the schema, the per-asset
    * fan-out shape, and everything downstream are unchanged). Integral by
    * construction, so VAD-style consumers compare energies exactly and the
    * oracle replays the frames bit-for-bit from the payload hex. One input
    * row streams out ceil(n_bytes / frameBytes) frame rows.
    */
  def audioFrameEnergies(assets: DataFrame, frameBytes: Int = 64): Dataset[AudioFrame] = {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("mime") === "audio/wav")
      .select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val n = if (p == null) 0 else p.length
        (0 until (n + frameBytes - 1) / frameBytes).iterator.map { f =>
          var s = 0L
          var i = f * frameBytes
          val end = math.min(i + frameBytes, n)
          while (i < end) { s += p(i) & 0xff; i += 1 }
          AudioFrame(id, f, s)
        }
      }
  }

  /** REAL audio codec on the stock JDK: a RIFF/WAVE chunk-walking parser
    * for PCM16 mono/stereo — the audio sibling of [[ImageCodec]]. No
    * external dependency: WAV headers are 44 bytes of little-endian
    * structure and PCM16 samples are raw shorts, so the full decode
    * (header validation, fmt chunk, data chunk, LE sample extraction) is
    * ~60 lines of plain JVM code. [[audioSampleFrameEnergies]] feeds its
    * samples into the SAME AudioFrame contract [[audioFrameEnergies]]
    * emits — the r13 scaladoc promise ("a real PCM decoder slots in at
    * exactly that boundary with nothing downstream changing") made real:
    * VAD and every other frame consumer runs unchanged on either kernel.
    */
  object WavCodec {

    /** Encode PCM16 mono samples as a canonical 44-byte-header WAV. */
    def encodePcm16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
      buf.putInt(36 + dataLen)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII"))
      buf.putInt(16)               // PCM fmt chunk size
      buf.putShort(1)              // audioFormat = 1 (PCM)
      buf.putShort(1)              // channels = 1
      buf.putInt(sampleRate)
      buf.putInt(sampleRate * 2)   // byte rate = rate * channels * 2
      buf.putShort(2)              // block align
      buf.putShort(16)             // bits per sample
      buf.put("data".getBytes("US-ASCII"))
      buf.putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** Decoded WAV: sample rate, channel count, interleaved PCM16 samples. */
    final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

    /** Real chunk-walking decode. None when the bytes are not a
      * PCM16 RIFF/WAVE stream (wrong magic, non-PCM format tag, other
      * bit depths, truncated chunks) — callers fall back to the byte
      * profiler, mirroring [[ImageCodec.tryDecode]]'s contract.
      */
    def tryDecodePcm16(payload: Array[Byte]): Option[Pcm] =
      try {
        if (payload == null || payload.length < 44) return None
        val buf = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        if (tag() != "RIFF") return None
        buf.getInt // declared riff size — informational, many writers lie
        if (tag() != "WAVE") return None
        // walk chunks: fmt must precede data per spec, but tolerate any
        // order by scanning; unknown chunks (LIST, fact, …) are skipped
        var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
        var data: Option[(Int, Int)] = None          // offset, length
        while (buf.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
          val id = tag()
          val size = buf.getInt
          if (size < 0 || size > buf.remaining()) return None
          val at = buf.position()
          id match {
            case "fmt " if size >= 16 =>
              val audioFormat = buf.getShort.toInt
              val channels = buf.getShort.toInt
              val rate = buf.getInt
              buf.getInt   // byte rate
              buf.getShort // block align
              val bits = buf.getShort.toInt
              fmt = Some((audioFormat, channels, rate, bits))
            case "data" =>
              data = Some((at, size))
            case _ => ()
          }
          // chunks are word-aligned: odd sizes carry a pad byte
          buf.position(at + size + (size & 1))
        }
        (fmt, data) match {
          case (Some((1, ch, rate, 16)), Some((off, len)))
              if ch >= 1 && rate > 0 =>
            val n = len / 2
            val out = new Array[Short](n)
            val sb = java.nio.ByteBuffer.wrap(payload, off, n * 2)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
            sb.get(out)
            Some(Pcm(rate, ch, out))
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic REAL-audio fixture: one PCM16 mono WAV per id, the
    * sample stream a closed-form function of the id —
    * s(i) = ((id·7 + i·13) mod 2001) − 1000, n = 50 + id mod 200 samples
    * — so a SQL oracle predicts the output of a genuine WAV decode
    * (per-frame Σ|s| energies, sample counts, rate) without parsing a
    * byte, exactly the [[synthesizePngAssets]] discipline. Encoding runs
    * distributed in the same mapPartitions batch shape.
    */
  def synthesizeWavAssets(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (50 + id % 200).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 7 + i.toLong * 13) % 2001) - 1000).toShort)
          (id, WavCodec.encodePcm16(samples))
        }
      }
      .toDF("asset_id", "payload")
      .select(col("asset_id"), lit("audio/wav").as("mime"), col("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", md5(col("payload")))
  }

  /** Frame energies from a REAL WAV decode: payloads that parse as PCM16
    * are chopped into `frameSamples`-sample windows, each reduced to its
    * Σ|sample| energy — integral, so VAD comparisons and the oracle replay
    * stay exact. Payloads that do NOT parse fall back to
    * [[audioFrameEnergies]]'s byte-window kernel (same dispatch contract
    * as [[decodeFeatures]]'s image/bytes split). Output rows are the SAME
    * AudioFrame shape either way — everything downstream of the frame
    * boundary (VAD, segment stats) is kernel-agnostic by construction.
    */
  def audioSampleFrameEnergies(assets: DataFrame,
      frameSamples: Int = 64): Dataset[AudioFrame] = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("mime") === "audio/wav")
      .select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        WavCodec.tryDecodePcm16(p) match {
          case Some(pcm) =>
            val s = pcm.samples
            val n = s.length
            (0 until (n + frameSamples - 1) / frameSamples).iterator.map { f =>
              var e = 0L
              var i = f * frameSamples
              val end = math.min(i + frameSamples, n)
              while (i < end) { e += math.abs(s(i).toLong); i += 1 }
              AudioFrame(id, f, e)
            }
          case None =>
            // non-WAV payloads: byte-window kernel, same frame contract
            val n = if (p == null) 0 else p.length
            (0 until (n + frameSamples - 1) / frameSamples).iterator.map { f =>
              var e = 0L
              var i = f * frameSamples
              val end = math.min(i + frameSamples, n)
              while (i < end) { e += p(i) & 0xff; i += 1 }
              AudioFrame(id, f, e)
            }
        }
      }
  }

  /** Real audio resample (decimation): decode PCM16 through [[WavCodec]],
    * keep every `factor`-th sample, re-encode at rate/factor — the audio
    * face of [[resizeAssets]]'s decode→transform→re-encode discipline.
    * Plain decimation (no anti-alias filter) is the documented semantic:
    * it is exactly replayable in SQL, and a polyphase filter would slot in
    * at the same sample-array boundary. Mono only (interleaved stereo
    * would need per-channel stride); non-decodable or multi-channel
    * payloads yield no row. Output payloads are themselves valid WAVs —
    * [[audioMeta]]/[[audioSampleFrameEnergies]] re-decode them, which is
    * the round-trip witness the oracled query hashes.
    */
  def resampleWav(assets: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        WavCodec.tryDecodePcm16(p).collect {
          case pcm if pcm.channels == 1 =>
            val n = pcm.samples.length
            val out = Array.tabulate((n + factor - 1) / factor)(j =>
              pcm.samples(j * factor))
            (id, WavCodec.encodePcm16(out,
              math.max(1, pcm.sampleRate / factor)))
        }
      }
      .toDF("asset_id", "payload")
      .select(col("asset_id"), lit("audio/wav").as("mime"), col("payload"))
  }

  /** One decoded WAV's header facts. */
  final case class AudioMeta(
      asset_id: Long, sample_rate: Int, n_channels: Int, n_samples: Long)

  /** Header metadata of every asset that REALLY decodes as PCM16 WAV —
    * the witness that [[WavCodec]] parsed the RIFF structure (rate and
    * channel count come from the fmt chunk, the sample count from the
    * data chunk length), not a byte-length shortcut. Assets that don't
    * decode yield no row.
    */
  def audioMeta(assets: DataFrame): Dataset[AudioMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        WavCodec.tryDecodePcm16(p).map(pcm =>
          AudioMeta(id, pcm.sampleRate, pcm.channels,
            pcm.samples.length.toLong / pcm.channels))
      }
  }

  /** Voiced SEGMENTS over any (asset_id, frame, energy) frame table — the
    * rows [[vadSummary]] summarizes, emitted individually: each maximal
    * run of voiced frames becomes (asset_id, seg_idx, start_frame,
    * end_frame, n_frames, seg_energy). This is the actual deliverable of
    * a speech-corpus VAD pass — the segment list an ASR/transcription
    * stage consumes — using the same cross-multiplied voiced test and
    * gaps-and-islands machinery (windows PARTITIONED BY asset; group
    * size = one asset's frames, never global).
    */
  def vadSegments(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.util.Lineage._
    val fr = frames.truncateLineage() // totals + voiced both read it
    val tot = fr.groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames_tot"), sum(col("energy")).as("total_energy"))
    val voiced = fr.join(tot, "asset_id")
      .filter(col("energy") * col("n_frames_tot") > col("total_energy"))
      .select(col("asset_id"), col("frame"), col("energy"))
    val byAsset = Window.partitionBy("asset_id").orderBy("frame")
    val byStart = Window.partitionBy("asset_id").orderBy("start_frame")
    voiced
      .withColumn("isl", col("frame") - row_number().over(byAsset))
      .groupBy("asset_id", "isl")
      .agg(min(col("frame")).cast("long").as("start_frame"),
        max(col("frame")).cast("long").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("seg_energy"))
      .withColumn("seg_idx", row_number().over(byStart).cast("long"))
      .select(col("asset_id"), col("seg_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("seg_energy"))
  }

  /** Voice-activity summary over ANY (asset_id, frame, energy) frame
    * table: a frame is "voiced" when its energy exceeds the asset's own
    * mean, cross-multiplied (energy·n_frames > Σenergy) so the mean never
    * materializes as a fraction; the longest voiced run is
    * gaps-and-islands on the frame index — island key = frame −
    * row_number, windows PARTITIONED BY asset (group size = one asset's
    * frames, never global). Shared verbatim by the byte-kernel and
    * real-WAV-decode queries — the factored proof that the decode kernel
    * swaps under an unchanged downstream.
    */
  def vadSummary(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.util.Lineage._
    val fr = frames.truncateLineage() // totals + voiced + runs all read it
    val tot = fr.groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"), sum(col("energy")).as("total_energy"))
    val voiced = fr.join(tot, "asset_id")
      .filter(col("energy") * col("n_frames") > col("total_energy"))
      .select(col("asset_id"), col("frame"))
    val byAsset = Window.partitionBy("asset_id").orderBy("frame")
    val runs = voiced
      .withColumn("isl", col("frame") - row_number().over(byAsset))
      .groupBy("asset_id", "isl").agg(count(lit(1)).as("len"))
      .groupBy("asset_id").agg(max(col("len")).as("longest_voiced"))
    val nv = voiced.groupBy("asset_id").agg(count(lit(1)).as("n_voiced"))
    tot.join(nv, Seq("asset_id"), "left")
      .join(runs, Seq("asset_id"), "left")
      .select(col("asset_id"), col("n_frames"), col("total_energy"),
        coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
        coalesce(col("longest_voiced"), lit(0L)).as("longest_voiced"))
      .withColumn("voiced_ratio_e6",
        expr("n_voiced * 1000000 DIV n_frames"))
  }

  final case class FrameFeatures(
      asset_id: Long,
      frame_idx: Int,
      features: Array[Double])

  /** Frame sampling for video assets: every `stride`-th frame decoded to a
    * feature vector; non-video assets yield their single frame. One input
    * row fans out to n_frames/stride rows — flatMap inside mapPartitions,
    * so the fan-out streams without materializing a per-asset frame list.
    */
  def sampleFrames(assets: DataFrame, stride: Int = 10): Dataset[FrameFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "mime", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, mime, payload) =>
          val (_, _, nFrames, feats) = ImageCodec.tryDecode(payload)
            .getOrElse(ByteProfiler.decode(payload, mime))
          (0 until nFrames by stride).iterator.map { f =>
            // stub per-frame features: rotate the asset features by the
            // frame index so frames are distinct but deterministic
            val fv = new Array[Double](feats.length)
            var i = 0
            while (i < feats.length) {
              fv(i) = feats((i + f) % feats.length)
              i += 1
            }
            FrameFeatures(id, f, fv)
          }
        }
      }
  }

  final case class VideoFrameSig(asset_id: Long, frame: Int, sig: Long)

  /** Per-frame content signature of the VIDEO assets: each of the
    * n_frames (= ByteProfiler's byte-deterministic frame count) reduces to
    * the sum of `samplesPerFrame` payload bytes at frame-keyed offsets
    * ((frame·131 + j·7) mod n — coprime strides so consecutive frames read
    * different byte neighborhoods). The deterministic stand-in for a
    * decoded frame's luma histogram: a real video decoder (ffmpeg/javacv)
    * slots in at exactly this (asset, frame) → integer-signature boundary
    * with the shot-boundary pass downstream unchanged. Integral by
    * construction, so the oracle replays every signature bit-for-bit from
    * the payload hex. One input row streams out n_frames signature rows.
    */
  def videoFrameSignatures(assets: DataFrame,
      samplesPerFrame: Int = 8): Dataset[VideoFrameSig] = {
    require(samplesPerFrame >= 1,
      s"samplesPerFrame must be >= 1, got $samplesPerFrame")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("mime").startsWith("video"))
      .select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val n = if (p == null) 0 else p.length
        if (n == 0) Iterator.empty
        else {
          val nFrames = 1 + (n % 30) // ByteProfiler's video frame count
          (0 until nFrames).iterator.map { f =>
            var s = 0L
            var j = 0
            while (j < samplesPerFrame) {
              s += p((f * 131 + j * 7) % n) & 0xff
              j += 1
            }
            VideoFrameSig(id, f, s)
          }
        }
      }
  }

  /** Shot-boundary detection over ANY (asset_id, frame, sig) signature
    * table: a CUT falls between consecutive frames whose signatures differ
    * by more than `threshold` (the classic frame-difference detector); the
    * shots are the runs between cuts. lag + running-sum windows are
    * PARTITIONED BY asset (group size = one asset's frames, never global),
    * so the pass scales with per-asset frame counts, not corpus size.
    * Output per asset: frame/cut/shot counts, the longest shot, and the
    * cut rate in ppm of frame transitions — the sampling report a video
    * curation pipeline keys on (static slideshow vs rapid-cut content).
    */
  def shotSummary(frames: DataFrame, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byAsset = Window.partitionBy("asset_id").orderBy("frame")
    val run = Window.partitionBy("asset_id").orderBy("frame")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frames
      .withColumn("prev", lag(col("sig"), 1).over(byAsset))
      .withColumn("is_cut",
        col("prev").isNotNull && abs(col("sig") - col("prev")) > threshold)
      .withColumn("shot", sum(col("is_cut").cast("long")).over(run))
      .groupBy("asset_id", "shot").agg(count(lit(1)).as("len"))
      .groupBy("asset_id")
      .agg(sum(col("len")).as("n_frames"),
        (count(lit(1)) - 1).cast("long").as("n_cuts"),
        count(lit(1)).as("n_shots"),
        max(col("len")).as("longest_shot"))
      .withColumn("cut_rate_ppm",
        expr("n_cuts * 1000000 DIV greatest(n_frames - 1, 1)"))
  }
}
