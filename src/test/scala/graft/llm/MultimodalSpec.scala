package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The multimodal plumbing — schema, binary columns, batch shapes — is
  * real; the decode kernel is the declared deterministic stub, so tests
  * pin the CONTRACTS (schemas, determinism, fan-out arithmetic), not
  * codec output.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

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
    f1.foreach(f => assert(f.features.length == Multimodal.FakeDecoder.featureDim))
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
}
