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
}
