package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.Tables

/** CSV source path (S1 — the reference ingests complaints as CSV,
  * python.py:13). The corpus ships parquet, so the entry materializes a
  * CSV copy once per run (into the build's scratch dir) and then reads it
  * back the way the reference would: header row, explicit schema (no
  * inference pass — at 100 TB, schema inference means reading the data
  * twice), then aggregates joined against the region dimension. */
object Csv {

  private val NationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = "target/csv_stage/nation"
    Tables.nation(spark, dir)
      .write.mode("overwrite").option("header", "true").csv(path)
    val nation = spark.read
      .option("header", "true")
      .schema(NationSchema) // explicit schema: no inference scan
      .csv(path)
    nation
      .join(broadcast(Tables.region(spark, dir)),
        nation("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_nation"))
      .orderBy("region")
  }

  val csvRoundtripSql: String =
    """SELECT r_name AS region, count(*) AS n_nations, min(n_name) AS first_nation
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1 ORDER BY region""".stripMargin

  /** JSON-lines source path (S1/S3 sibling: the semi-structured file
    * format an ingest layer actually receives). Same shape as the CSV
    * roundtrip: materialize supplier as JSONL once, read it back with an
    * explicit schema (no inference pass — inference reads the data twice,
    * a non-starter at 100 TB), aggregate per nation. Numeric values
    * survive the roundtrip exactly: s_acctbal serializes as a JSON number
    * from DOUBLE and parses back to the same double (shortest-roundtrip
    * printing on both ends), and the oracle aggregates the ORIGINAL
    * parquet — so any lossy step would hash-mismatch. */
  private val SupplierSchema = StructType(Seq(
    StructField("s_suppkey", org.apache.spark.sql.types.LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", org.apache.spark.sql.types.LongType),
    StructField("s_acctbal", org.apache.spark.sql.types.DoubleType)))

  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = "target/jsonl_stage/supplier"
    Tables.supplier(spark, dir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").json(path)
    val sup = spark.read
      .schema(SupplierSchema) // explicit schema: no inference scan
      .json(path)
    sup
      .join(broadcast(Tables.nation(spark, dir)),
        sup("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal").cast("decimal(18,2)")), 2)
          .cast("double").as("acctbal_sum"))
      .orderBy("nation")
  }

  val jsonlRoundtripSql: String =
    """SELECT n_name AS nation, count(*) AS n_suppliers,
      |       CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS acctbal_sum
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY nation""".stripMargin

  /** ORC source/sink path — the third columnar-capable format the source
    * family covers (CSV row-text, JSONL semi-structured, ORC columnar).
    * ORC is the interchange format a warehouse migration actually meets
    * (Hive/Trino estates), and unlike the text formats it keeps types,
    * predicate-pushdown stats, and compression — so the roundtrip proves
    * the engine can sit on an ORC lake without a parquet conversion pass.
    * Same discipline as the siblings: materialize part once, read back
    * (ORC carries its schema — no inference scan to avoid), filtered
    * aggregate per brand. The filter reaches the ORC reader as a pushed
    * predicate the same way parquet scans get PushedFilters. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = "target/orc_stage/part"
    Tables.part(spark, dir)
      .select("p_partkey", "p_brand", "p_type", "p_retailprice")
      .write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .filter(col("p_retailprice") > 905d)
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("p_retailprice").cast("decimal(18,2)")), 2)
          .cast("double").as("price_sum"))
      .orderBy("brand")
  }

  val orcRoundtripSql: String =
    """SELECT p_brand AS brand, count(*) AS n_parts,
      |       CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS price_sum
      |FROM part WHERE p_retailprice > 905
      |GROUP BY 1 ORDER BY brand""".stripMargin

  /** Every [[CorruptEveryNth]]-th JSONL line is corrupted by the stage
    * writer — the deterministic stand-in for the malformed records any
    * real feed carries. */
  private val CorruptEveryNth = 10

  /** Malformed-input quarantine — PERMISSIVE JSONL ingestion with a
    * `_corrupt_record` column: the ingest robustness pattern a feed
    * pipeline runs so one bad line quarantines ONE ROW instead of
    * failing the job (FAILFAST) or silently vanishing (DROPMALFORMED).
    * The entry stages the documents table as JSONL, deterministically
    * truncating every [[CorruptEveryNth]]-th line mid-record, reads it
    * back in PERMISSIVE mode, and reports the audit: clean rows,
    * quarantined rows, and the surviving id/char accounting. The oracle
    * re-derives the same counts from the source table and the
    * corruption rule — an ingest that dropped or double-counted a
    * quarantined line hash-mismatches.
    *
    * Shape at 100 TB: corruption handling is per-line map work inside
    * the scan (no shuffle); the audit is one aggregate. The text stage
    * is written via the DataFrame text sink (distributed), one line per
    * row, corruption applied as a codegen'd projection. */
  def jsonlCorruptAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val path = "target/jsonl_stage/documents_corrupt"
    val line = to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), line.as("line"))
      .select(when(col("doc_id") % CorruptEveryNth === 0,
        // cut mid-record: unparseable, but still one line
        substring(col("line"), 1, 11)).otherwise(col("line")).as("value"))
      .write.mode("overwrite").text(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_corrupt_record", StringType)))
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    read.agg(
      count(lit(1)).as("n_lines"),
      sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_clean"),
      sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
        .as("n_quarantined"),
      sum(when(col("_corrupt_record").isNull, col("n_chars"))).as("chars_clean"),
      max(when(col("_corrupt_record").isNull, col("doc_id"))).as("max_clean_id"))
  }

  val jsonlCorruptAuditSql: String =
    s"""SELECT count(*) AS n_lines,
       |       CAST(sum(CASE WHEN doc_id % $CorruptEveryNth <> 0 THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_clean,
       |       CAST(sum(CASE WHEN doc_id % $CorruptEveryNth = 0 THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_quarantined,
       |       CAST(sum(CASE WHEN doc_id % $CorruptEveryNth <> 0 THEN n_chars END)
       |            AS BIGINT) AS chars_clean,
       |       max(CASE WHEN doc_id % $CorruptEveryNth <> 0 THEN doc_id END)
       |         AS max_clean_id
       |FROM documents""".stripMargin
}
