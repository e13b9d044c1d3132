package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: typed schema, partition-wise stub decode, frame
  * sampling — the Spark-side shape a real codec would plug into. */
class MultimodalSpec extends SparkSpec {

  test("media corpus: typed payload + metadata for every document") {
    val files = Multimodal.mediaFiles(spark, sfDir).collect()
    assert(files.nonEmpty)
    assert(files.forall(f => Set("image", "audio", "video").contains(f.mediaType)))
    assert(files.forall(f => f.payload.nonEmpty))
    assert(files.forall(f => f.meta.widthPx >= 1 && f.meta.heightPx >= 1 &&
      f.meta.nFrames >= 1))
  }

  test("stub decoder: deterministic features with the declared batch shape") {
    val feats = Multimodal.decodeFeaturesStub(Multimodal.mediaFiles(spark, sfDir))
      .collect()
    assert(feats.forall(_.features.length == 4))
    assert(feats.forall(_.features.forall(v => v >= 0.0 && v < 1.0)))
    // determinism: a second run yields identical vectors
    val again = Multimodal.decodeFeaturesStub(Multimodal.mediaFiles(spark, sfDir))
      .collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.mediaId) == f.features.toSeq))
  }

  test("frame sampling: chunk count follows payload size and stride") {
    val sampled = Multimodal.sampleFrames(Multimodal.mediaFiles(spark, sfDir),
      frameBytes = 16, stride = 4).collect()
    val sizes = Multimodal.mediaFiles(spark, sfDir).collect()
      .map(f => f.mediaId -> f.payload.length).toMap
    sampled.foreach { r =>
      val expected = (sizes(r.getLong(0)) - 1) / 64 + 1
      assert(r.getInt(2) == expected)
    }
  }

  test("resize: exact payload bytes (truncate/pad) and rewritten metadata, no shuffle") {
    val files = Multimodal.mediaFiles(spark, sfDir)
    val resized = Multimodal.resizeStub(files, w = 4, h = 3) // 12 bytes
    val r = resized.head()
    assert(r.meta.widthPx == 4 && r.meta.heightPx == 3)
    assert(r.payload.length == 12)
    val orig = files.filter(_.mediaId == r.mediaId).head().payload
    if (orig.length >= 12) assert(r.payload.toSeq == orig.take(12).toSeq)
    else assert(r.payload.toSeq ==
      (orig.toSeq ++ Seq.fill(12 - orig.length)(0.toByte)))
    // resize must stay map-side: a Project over the scan, no exchange
    assert(!Layout.hasShuffle(resized.toDF()), "resize must not shuffle")
  }

  test("q33 rollup covers all media types with plausible stats") {
    val rows = Multimodal.q33MultimodalStats(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.documents(spark, sfDir).count())
    assert(rows.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }
}
