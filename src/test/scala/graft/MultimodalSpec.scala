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

  test("payload bytes round-trip the text (UTF-8)") {
    import spark.implicits._
    val row = Multimodal.mediaTable(spark, sfDir)
      .filter($"doc_id" === 0L).head()
    val text = Tables.documents(spark, sfDir)
      .filter($"doc_id" === 0L).select("text").as[String].head()
    assert(new String(row.payload, "UTF-8") == text)
  }
}
