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

  test("typed frame-sampler equals the columnar frame-sample twin row-for-row") {
    val typed = Multimodal.frameDataset(spark, sfDir)
      .toDF().orderBy("doc_id", "frame_idx").collect().toSeq
    val cols = Multimodal.mediaFrameSample(spark, sfDir).collect().toSeq
    assert(typed.size == cols.size && typed.nonEmpty)
    typed.zip(cols).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1),
        s"(doc, frame) ${a.getLong(0)}/${a.getLong(1)}")
      assert(a.getString(2) == b.getString(2),
        s"frame_hex for doc ${a.getLong(0)} frame ${a.getLong(1)}")
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-9, "mean_resized")
    }
  }

  test("typed audio decoder equals the columnar audio twin row-for-row") {
    val typed = Multimodal.audioDataset(spark, sfDir)
      .toDF().orderBy("doc_id").collect().toSeq
    val cols = Multimodal.audioFeatures(spark, sfDir).collect().toSeq
    assert(typed.size == cols.size && typed.nonEmpty)
    typed.zip(cols).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0), "doc_id")
      assert(a.getInt(1) == b.getInt(1), s"sample_rate for doc ${a.getLong(0)}")
      assert(a.getInt(2) == b.getInt(2), "n_samples")
      assert(a.getDouble(3) == b.getDouble(3), s"duration_ms for doc ${a.getLong(0)}")
      assert(a.getInt(4) == b.getInt(4), s"peak for doc ${a.getLong(0)}")
      assert(math.abs(a.getDouble(5) - b.getDouble(5)) < 1e-9,
        s"rms for doc ${a.getLong(0)}")
    }
  }

  test("audio batch size does not change the decode result") {
    val a = Multimodal.audioDataset(spark, sfDir, batchSize = 7)
      .toDF().orderBy("doc_id").collect().toSeq
    val b = Multimodal.audioDataset(spark, sfDir, batchSize = 256)
      .toDF().orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("frame sampling keeps every FrameStep-th frame, one output row each") {
    val fs = Multimodal.mediaFrameSample(spark, sfDir).cache()
    import org.apache.spark.sql.functions._
    // frames 0,2,4,6 per doc
    val perDoc = fs.groupBy("doc_id")
      .agg(sort_array(collect_list("frame_idx")).as("frames"))
    assert(perDoc.filter(col("frames") =!=
      typedLit(Seq(0L, 2L, 4L, 6L))).isEmpty)
  }

  test("media exact dedup: digest groups equal text-identity groups, keep-first") {
    import org.apache.spark.sql.functions._
    val md = Multimodal.mediaExactDedup(spark, sfDir).cache()
    // payloads derive deterministically from text, so digest groups must
    // be exactly the text-identity groups — same count, same keepers,
    // same copy totals
    val byText = graft.Tables.documents(spark, sfDir)
      .groupBy("text").agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
    assert(md.count() == byText.count())
    assert(md.agg(sum("n_copies")).head().getLong(0) ==
      graft.Tables.documents(spark, sfDir).count())
    assert(md.select(col("canonical_id"), col("n_copies"))
      .except(byText.select(col("keeper"), col("n"))).isEmpty)
    // planted byte-identical payloads collapse to one group, keep-first
    import spark.implicits._
    val planted = Seq((10L, "same words here"), (20L, "same words here"),
      (30L, "different words"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), md5(md5(col("text"))).as("digest"))
      .groupBy("digest")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(planted == Set((10L, 2L), (30L, 1L)))
    md.unpersist()
  }
}
