package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries opaque binary + typed metadata") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val schema = m.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_type").dataType.typeName == "string")
    val types = m.toDF().select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and total") {
    val n = Multimodal.mediaTable(spark, sfDir).count()
    val f1 = Multimodal.multimodalFeatures(spark, sfDir).collect().toSeq
    val f2 = Multimodal.multimodalFeatures(spark, sfDir).collect().toSeq
    assert(f1 == f2)
    assert(f1.size == n)
  }

  test("resize fits the box and preserves aspect ratio") {
    val rows = Multimodal.multimodalResize(spark, sfDir).collect()
    rows.filter(_.getString(1) != "audio").foreach { r =>
      val (w, h) = (r.getInt(2), r.getInt(3))
      val (ow, oh) = (r.getInt(4), r.getInt(5))
      assert(ow <= Multimodal.BoxSize && oh <= Multimodal.BoxSize, r)
      assert(math.max(ow, oh) == Multimodal.BoxSize, r) // long side fills
      // exact letterbox arithmetic (scale by BoxSize/max, floor)
      val mx = math.max(w, h)
      assert(ow == w * Multimodal.BoxSize / mx, r)
      assert(oh == h * Multimodal.BoxSize / mx, r)
    }
    rows.filter(_.getString(1) == "audio").foreach(r =>
      assert(r.isNullAt(4) && r.isNullAt(5)))
  }

  test("frame sampling emits at most MaxFrames evenly-strided frames") {
    val rows = Multimodal.multimodalFrames(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= Multimodal.MaxFrames + 1)
      val n = rs.head.getInt(1)
      val frames = rs.map(_.getInt(2)).sorted
      assert(frames.head == 0 && frames.last < n)
      val strides = frames.sliding(2).filter(_.size == 2)
        .map(p => p(1) - p(0)).toSet
      assert(strides.size <= 1, s"stride not uniform: $strides")
    }
  }

  test("payload bytes round-trip the text (UTF-8)") {
    import spark.implicits._
    val row = Multimodal.mediaTable(spark, sfDir)
      .filter($"doc_id" === 0L).head()
    val text = Tables.documents(spark, sfDir)
      .filter($"doc_id" === 0L).select("text").as[String].head()
    assert(new String(row.payload, "UTF-8") == text)
  }
}
