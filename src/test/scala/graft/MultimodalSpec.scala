package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary content + typed metadata") {
    val m = Multimodal.mediaTable(table("documents"))
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.filter(col("content").isNull).count() == 0)
    assert(m.select("kind").distinct().count() == 3)
  }

  test("stub feature extraction is deterministic and batch-shaped") {
    val m = Multimodal.mediaTable(table("documents"))
    val f1 = Multimodal.extractFeatures(m).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(m, batchSize = 7).orderBy("doc_id").collect()
    assert(f1.sameElements(f2)) // batch size must not change results
    assert(f1.forall(r => (0 to 3).forall(i => {
      val v = r.getDouble(3 + i); v >= 0.0 && v < 1.0
    })))
  }

  test("frame sampling explodes video rows only") {
    val m = Multimodal.mediaTable(table("documents"))
    val frames = Multimodal.sampleFrames(m)
    val videoIds = m.filter(col("kind") === "video").select("doc_id").distinct().count()
    assert(frames.select("doc_id").distinct().count() == videoIds)
    assert(frames.filter(col("frame_bytes").isNull).count() == 0)
  }
}
