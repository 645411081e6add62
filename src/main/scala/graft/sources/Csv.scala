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
}
