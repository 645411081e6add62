package graft.sources

import scala.reflect.io.Directory

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZorderSpec extends SparkSpec {

  /** Reference Morton interleave: bit i of a → bit 2i, bit i of b → 2i+1. */
  private def morton(a: Long, b: Long): Long =
    (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
      .reduce(_ | _)

  test("zval is the exact bit interleave of the quantized dims") {
    val rows = Layout.zorderLayout(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qd, qp, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(qd >= 0 && qd <= 65535 && qp >= 0 && qp <= 65535)
      assert(z == morton(qd, qp), s"qd=$qd qp=$qp z=$z want=${morton(qd, qp)}")
    }
  }

  test("z-ordered files bound BOTH dims; single-column sort does not") {
    val q = Layout.zorderLayout(spark, sfDir).cache()
    def spans(df: DataFrame, sortCol: String, dir: String): (Double, Double) = {
      val path = s"target/zorder-spec/$dir"
      new Directory(new java.io.File(path)).deleteRecursively()
      df.repartitionByRange(8, col(sortCol), col("o_orderkey"))
        .sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(path)
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max("qd") - min("qd")) / 65535.0).as("sd"),
          ((max("qp") - min("qp")) / 65535.0).as("sp"))
        .agg(avg("sd"), avg("sp")).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val (zd, zp) = spans(q, "zval", "byz")
    val (dd, dp) = spans(q, "qd", "bydate")
    // z-order: every file covers a bounded slice of BOTH dimensions
    assert(zd < 0.6 && zp < 0.6, s"z spans: date=$zd price=$zp")
    // date sort: tight on date, but each file spans ~the whole price range
    assert(dd < zd, s"date-sorted date span $dd should beat z's $zd")
    assert(dp > 0.8, s"date-sorted price span $dp should be near 1")
    // the pruning figure of merit: the WORST dimension's span — what a
    // selective predicate on an arbitrary (unknown-at-layout-time) column
    // cannot skip. Single-dim sort leaves one dim unbounded (~1.0); z-order
    // bounds both, so its worst dim beats the single-sort worst dim by far.
    assert(zd.max(zp) < 0.7 * dp.max(dd), s"worst-dim z=${zd.max(zp)} date=${dp.max(dd)}")
    new Directory(new java.io.File("target/zorder-spec")).deleteRecursively()
  }

  test("codes are deterministic across runs") {
    val a = Layout.zorderLayout(spark, sfDir).collect().toSeq
    val b = Layout.zorderLayout(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
