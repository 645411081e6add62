package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("mapPartitions decode path equals the columnar twin row-for-row") {
    val ds = Multimodal.mediaDataset(spark, sfDir)
      .toDF().orderBy("doc_id").collect().toSeq
    val cols = Multimodal.mediaFeatures(spark, sfDir).collect().toSeq
    assert(ds.size == cols.size)
    ds.zip(cols).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0), "doc_id")
      assert(a.getInt(1) == b.getInt(1), s"width for doc ${a.getLong(0)}")
      assert(a.getInt(2) == b.getInt(2), s"height for doc ${a.getLong(0)}")
      assert(a.getInt(3) == b.getInt(3), "n_bytes")
      assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-9, "mean_byte")
    }
  }

  test("batch size does not change the decode result") {
    val a = Multimodal.mediaDataset(spark, sfDir, batchSize = 7)
      .toDF().orderBy("doc_id").collect().toSeq
    val b = Multimodal.mediaDataset(spark, sfDir, batchSize = 256)
      .toDF().orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
