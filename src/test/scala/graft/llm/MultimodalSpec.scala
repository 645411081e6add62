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

  test("perceptual near-dup pairs a perturbed payload that exact digest dedup misses") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a deterministic 64-byte grid, its "re-encode" (clipped brightness
    // shift — the registered library's transform), and an unrelated grid
    val base = (0 until 64).map(i => (i * 37 + 11) % 256)
    val reenc = base.map(b => math.min(b + Multimodal.BrightnessDelta, 255))
    val other = (0 until 64).map(i => (i * 101 + 5) % 251)
    val lib = Seq((1L, base), (2L, reenc), (9L, other))
      .toDF("media_id", "grid")
    // exact digest dedup misses the pair: the byte payloads differ
    val digests = lib.select(md5(to_json(col("grid")))).as[String].collect()
    assert(digests.distinct.length == 3,
      "perturbed payload must have a different digest — exact dedup cannot pair it")
    val pairs = Multimodal.mediaNearDedupFrom(lib)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"exactly the perceptual pair, got $pairs")
    assert(pairs.head._3 <= 7, "within the banded-Hamming threshold")
  }

  test("dHash is invariant to a uniform brightness shift below the clip ceiling") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // all cells ≤ 251: +4 shifts every cell without clipping, so every
    // adjacent gradient keeps its sign and the fingerprint is identical
    val g = (0 until 64).map(i => (i * 53 + 7) % 251)
    val shifted = g.map(_ + Multimodal.BrightnessDelta)
    val fps = Seq((1L, g), (2L, shifted)).toDF("media_id", "grid")
      .select(Multimodal.dhashCol(col("grid"))).as[Long].collect()
    assert(fps(0) == fps(1), "gradient signs are brightness-invariant")
  }

  test("corpus invariant: doc ids sit below the re-encode id offset") {
    import org.apache.spark.sql.functions._
    // ReencodeIdOffset's precondition (Multimodal scaladoc): a doc_id at
    // or above the offset would collide with a re-encode's media_id and
    // mislabel `kind`. Pin it on the oracle-gate corpus so testdata
    // regeneration that violates it fails loudly here.
    val maxId = spark.read.parquet(s"${graft.SparkSpec.gateDir}/documents.parquet")
      .agg(max("doc_id")).head().getLong(0)
    assert(maxId < Multimodal.ReencodeIdOffset,
      s"doc_id $maxId collides with the re-encode media_id range")
  }

  test("media library scan is spread to full parallelism") {
    // the 25× rehearsal caught the whole banded join serializing on a
    // single-split scan (r18, SCALE.md) — pin the spread so it cannot
    // silently regress; partition counts are invisible to the plan lint
    assert(Multimodal.mediaLibrary(spark, sfDir).rdd.getNumPartitions >=
      spark.sparkContext.defaultParallelism)
  }

  test("media near apply: keep-first drops exactly the clustered non-canonicals") {
    import org.apache.spark.sql.functions._
    val kept = Multimodal.mediaNearApply(spark, sfDir).cache()
    val lib = Multimodal.mediaLibrary(spark, sfDir).select("media_id")
    val pairs = Multimodal.mediaNearDedup(spark, sfDir)
    // every re-encode paired with its original must be gone; every
    // unpaired member must survive; kinds label the id ranges
    val pairedB = pairs.select(col("media_b").as("media_id"))
    assert(kept.join(pairedB, Seq("media_id"), "left_semi").isEmpty,
      "no pair's larger member (the re-encode / later copy) may survive keep-first")
    val unpaired = lib
      .join(pairs.select(col("media_a").as("media_id"))
        .union(pairedB).distinct(), Seq("media_id"), "left_anti")
    assert(unpaired.join(kept, Seq("media_id"), "left_anti").isEmpty,
      "every unpaired library member must survive")
    assert(kept.filter(col("kind") === "reencode")
      .filter(col("media_id") < Multimodal.ReencodeIdOffset).isEmpty)
    kept.unpersist()
  }

  test("audio near-dup pairs a requantized clip that exact digest dedup misses") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a deterministic 64-sample PCM clip, its "re-encode" (the registered
    // library's requantization — every sample snaps down to the 64-wide
    // level grid), and an unrelated clip
    val base = (0 until 64).map(i => ((i * 9973 + 123) % 65536) - 32768)
    val reenc = base.map(s => s - (((s % 64) + 64) % 64))
    val other = (0 until 64).map(i => ((i * 31337 + 7) % 65536) - 32768)
    val lib = Seq((1L, base), (2L, reenc), (9L, other)).toDF("media_id", "sm")
    // the re-encode shares not one byte pattern with the original at the
    // digest level: exact content dedup cannot pair them
    assert(base != reenc, "requantization must actually change the payload")
    val digests = lib.select(md5(to_json(col("sm")))).as[String].collect()
    assert(digests.distinct.length == 3,
      "requantized payload must have a different digest — exact dedup cannot pair it")
    val pairs = Multimodal.audioNearDedupFrom(lib)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"exactly the perceptual pair, got $pairs")
    assert(pairs.head._3 <= 7, "within the banded-Hamming threshold")
  }

  test("audio envelope fingerprint is polarity-invariant (energy, not phase)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // energies are squares, so inverting the waveform's polarity keeps
    // the envelope — the fingerprint hears the level contour, not phase
    val clip = (0 until 64).map(i => ((i * 7919 + 55) % 65536) - 32768)
    val fps = Seq((1L, clip), (2L, clip.map(-_)))
      .toDF("media_id", "sm")
      .select(Multimodal.dhashCol(Multimodal.audioEnvelope(col("sm"))))
      .as[Long].collect()
    assert(fps(0) == fps(1), "polarity inversion must not move the fingerprint")
  }

  test("audio library scan is spread to full parallelism") {
    // same single-split-serialization guard as the media library (the
    // class of defect the plan lint cannot see — partition counts are
    // data, not plan shape)
    assert(Multimodal.audioLibrary(spark, sfDir).rdd.getNumPartitions >=
      spark.sparkContext.defaultParallelism)
  }

  test("registered audio near-dup pairs every re-encode within the Hamming budget") {
    import org.apache.spark.sql.functions._
    val pairs = Multimodal.audioNearDedup(spark, sfDir).cache()
    val expected = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % Multimodal.ReencodeEvery === 0)
      .select(col("doc_id").as("media_a"),
        (col("doc_id") + Multimodal.ReencodeIdOffset).as("media_b"))
    assert(expected.join(pairs, Seq("media_a", "media_b"), "left_anti").isEmpty,
      "every requantized copy must be paired with its original")
    assert(pairs.filter(col("hamming") > 7).isEmpty)
    pairs.unpersist()
  }

  test("audio requantization flips near-tie gradients: nonzero Hamming, still paired") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a clip engineered so one envelope gradient sits inside the quant
    // step: E(0)−E(1) = s0²−s4² = 63²−32² > 0, but both samples snap to
    // the SAME level (0) under the 64-wide grid, so the re-encode's
    // gradient is a tie (63² > 32² before, 0 > 0 after → bit flips).
    // The pair must still land within the Hamming budget — the tolerance
    // band is doing real work, not just matching identical fingerprints.
    val clip = Seq(63, 0, 0, 0, 32) ++
      (5 until 64).map(i => ((i * 9973 + 123) % 65536) - 32768)
    val reenc = clip.map(s => s - (((s % Multimodal.AfpQuant) +
      Multimodal.AfpQuant) % Multimodal.AfpQuant))
    val pairs = Multimodal.audioNearDedupFrom(
      Seq((1L, clip), (2L, reenc)).toDF("media_id", "sm"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"got $pairs")
    assert(pairs.head._3 >= 1, "the planted near-tie gradient must flip")
    assert(pairs.head._3 <= 7, "and the pair must stay inside the budget")
  }

  test("registered media near-dup pairs every library re-encode with its original") {
    import org.apache.spark.sql.functions._
    val pairs = Multimodal.mediaNearDedup(spark, sfDir).cache()
    val expected = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % Multimodal.ReencodeEvery === 0)
      .select(col("doc_id").as("media_a"),
        (col("doc_id") + Multimodal.ReencodeIdOffset).as("media_b"))
    assert(expected.join(pairs, Seq("media_a", "media_b"), "left_anti").isEmpty,
      "every re-encoded copy must be paired with its original")
    assert(pairs.filter(col("hamming") > 7).isEmpty)
    pairs.unpersist()
  }
}
