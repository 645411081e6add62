package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batched partition passes
  * (builder brief). The container ships no image/audio codecs, so the
  * decode kernel is a clearly-marked deterministic STUB — what is real and
  * tested is everything Spark-side: the binary column shape, the typed
  * Dataset schema, the mapPartitions batch iteration (the Scala analogue
  * of mapInPandas batches: decode amortizes per-batch setup), and the
  * columnar feature projection.
  *
  * The synthetic payload is unhex(md5(text)) — 16 opaque bytes per
  * document — so the pipeline runs end-to-end on the driver corpus. The
  * registered `media_features` entry computes the SAME features with pure
  * columnar expressions (hex arithmetic on both engines), giving the
  * mapPartitions path an exact equivalence check (spec) and the entry a
  * DuckDB oracle.
  */
object Multimodal {

  /** A document's opaque media payload. */
  final case class MediaRecord(doc_id: Long, content: Array[Byte])

  /** Extracted features: fake-decoded dimensions + mean byte intensity. */
  final case class MediaFeature(doc_id: Long, width: Int, height: Int,
                                n_bytes: Int, mean_byte: Double)

  /** STUB decoder — stands in for an image codec. Deterministic pure
    * function of the payload bytes: "width/height" from the first two
    * bytes, "intensity" as the mean byte value. A real deployment swaps
    * this body for the codec call; the signature and batch shape stay. */
  private def decodeStub(r: MediaRecord): MediaFeature = {
    val b = r.content
    val width = (b(0) & 0xff) % 16 + 1
    val height = (b(1) & 0xff) % 16 + 1
    val mean = b.map(_ & 0xff).sum.toDouble / b.length
    MediaFeature(r.doc_id, width, height, b.length,
      math.rint(mean * 1e6) / 1e6)
  }

  /** The binary-column source: documents with an opaque 16-byte payload. */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), unhex(md5(col("text"))).as("content"))
      .as[MediaRecord]
  }

  /** The batched decode pass: mapPartitions with fixed-size batches — the
    * batch boundary is where a real codec amortizes model/library setup
    * (the mapInPandas batch analogue). Purely partition-local: no shuffle,
    * scales with input splits. */
  def mediaDataset(spark: SparkSession, dir: String,
                   batchSize: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    mediaRecords(spark, dir).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init, model load)
        batch.map(decodeStub)
      }
    }
  }

  /** Registered columnar twin of the mapPartitions path: identical
    * features from hex arithmetic (byte i = hex pair 2i+1..2i+2 of the
    * md5), expressible on both engines. The spec asserts it equals
    * `mediaDataset` row-for-row. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).withColumn("h", md5(col("text")))
    def byteAt(i: Int) =
      expr(s"CAST(conv(substring(h, ${2 * i + 1}, 2), 16, 10) AS INT)")
    val sumBytes = (0 until 16).map(byteAt).reduce(_ + _)
    d.select(
      col("doc_id"),
      (byteAt(0) % 16 + 1).as("width"),
      (byteAt(1) % 16 + 1).as("height"),
      lit(16).as("n_bytes"),
      round(sumBytes.cast("double") / 16d, 6).as("mean_byte"))
      .orderBy("doc_id")
  }

  val mediaFeaturesSql: String = {
    def byteAt(i: Int) = s"('0x' || substr(h, ${2 * i + 1}, 2))::INT"
    val sumBytes = (0 until 16).map(byteAt).mkString(" + ")
    s"""WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
       |SELECT doc_id,
       |       ${byteAt(0)} % 16 + 1 AS width,
       |       ${byteAt(1)} % 16 + 1 AS height,
       |       16 AS n_bytes,
       |       round(($sumBytes) / 16.0, 6) AS mean_byte
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Video shape: frame sampling + resize. A "video" is a longer opaque
  // payload; frame-sampling emits one row per kept frame (the explode-
  // heavy shape video pipelines put through Spark: frame extraction fans
  // a row out to its sampled frames, then per-frame work is
  // embarrassingly parallel). Resize is the per-frame byte-stride
  // subsample of the stub codec. Synthetic payload: 4 chained md5s = 64
  // bytes = 8 frames of 8 bytes; sample every 2nd frame; resize keeps
  // every 2nd byte of a kept frame.
  // ---------------------------------------------------------------------

  private val FrameBytes = 8
  private val FrameStep = 2
  private val NumFrames = 4 * 16 / FrameBytes // 4 md5 payloads of 16 bytes
  private val ResizeStride = 2

  /** A document's synthetic 64-byte "video" payload. */
  final case class VideoRecord(doc_id: Long, content: Array[Byte])

  /** One sampled, resized frame. */
  final case class FrameFeature(doc_id: Long, frame_idx: Long,
                                frame_hex: String, mean_resized: Double)

  /** The 64-byte payload: md5(text) ++ md5(text+x) ++ md5(text+y) ++
    * md5(text+z) — deterministic and reproducible on both engines. */
  private def videoHex = concat(
    md5(col("text")), md5(concat(col("text"), lit("x"))),
    md5(concat(col("text"), lit("y"))), md5(concat(col("text"), lit("z"))))

  def videoRecords(spark: SparkSession, dir: String): Dataset[VideoRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), unhex(videoHex).as("content"))
      .as[VideoRecord]
  }

  /** STUB frame-sample + resize over the typed Dataset — partition-local
    * batches like [[mediaDataset]]; a real deployment swaps the byte
    * slicing for codec frame extraction + scaling, batch shape unchanged. */
  def frameDataset(spark: SparkSession, dir: String,
                   batchSize: Int = 64): Dataset[FrameFeature] = {
    import spark.implicits._
    videoRecords(spark, dir).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (decoder init)
        batch.iterator.flatMap { v =>
          (0 until NumFrames by FrameStep).iterator.map { f =>
            val frame = v.content.slice(f * FrameBytes, (f + 1) * FrameBytes)
            val resized = frame.indices.collect {
              case i if i % ResizeStride == 0 => frame(i) & 0xff
            }
            FrameFeature(v.doc_id, f.toLong,
              frame.map(b => f"${b & 0xff}%02x").mkString,
              math.rint(resized.sum.toDouble / resized.size * 1e6) / 1e6)
          }
        }
      }
    }
  }

  /** Registered columnar twin: explode the sampled frame indices, slice
    * each frame out of the hex payload, and average the stride-kept
    * bytes — pure codegen'd expressions, one output row per kept frame.
    * The spec asserts it equals [[frameDataset]] row-for-row. */
  def mediaFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).withColumn("h", videoHex)
    val sampled = d.withColumn("frame_idx",
      explode(sequence(lit(0L), lit((NumFrames - 1).toLong), lit(FrameStep.toLong))))
    val frameHex = expr(s"substring(h, CAST(frame_idx * ${2 * FrameBytes} + 1 AS INT), ${2 * FrameBytes})")
    val resizedBytes = (0 until FrameBytes by ResizeStride).map(i =>
      expr(s"CAST(conv(substring(h, CAST(frame_idx * ${2 * FrameBytes} + ${2 * i + 1} AS INT), 2), 16, 10) AS INT)"))
    val nKept = resizedBytes.size
    sampled.select(
      col("doc_id"), col("frame_idx"),
      lower(frameHex).as("frame_hex"),
      round(resizedBytes.reduce(_ + _).cast("double") / nKept, 6).as("mean_resized"))
      .orderBy("doc_id", "frame_idx")
  }

  val mediaFrameSampleSql: String = {
    def byteAt(off: Int) =
      s"('0x' || substr(h, (frame_idx * ${2 * FrameBytes} + $off)::INT, 2))::INT"
    val resized = (0 until FrameBytes by ResizeStride).map(i => byteAt(2 * i + 1))
    s"""WITH v AS (
       |  SELECT doc_id,
       |         md5(text) || md5(text || 'x') || md5(text || 'y') || md5(text || 'z') AS h
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, h, unnest(generate_series(0, ${NumFrames - 1}, $FrameStep)) AS frame_idx
       |  FROM v
       |)
       |SELECT doc_id, frame_idx,
       |       lower(substr(h, (frame_idx * ${2 * FrameBytes} + 1)::INT, ${2 * FrameBytes})) AS frame_hex,
       |       round((${resized.mkString(" + ")}) / ${resized.size}.0, 6) AS mean_resized
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  }
}
