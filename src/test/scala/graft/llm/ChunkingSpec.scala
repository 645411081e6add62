package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ChunkingSpec extends SparkSpec {

  test("chunks tile every document: dense ids, full token coverage") {
    val ch = Chunking.docChunks(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
    val per = ch.groupBy("doc_id").agg(
      count(lit(1)).as("k"),
      max(col("chunk_id")).as("max_id"),
      max(col("start_tok") + col("n_tokens")).as("covered"),
      min(col("n_tokens")).as("min_len"))
    val j = per.join(docs, "doc_id")
    // chunk ids are 0..k-1; the last-covered token is the doc's last token;
    // every chunk is non-empty
    assert(j.filter(col("max_id") =!= col("k") - 1 ||
      col("covered") =!= col("n") || col("min_len") <= 0).isEmpty)
    // stride tiling: k == ceil(n / 48)
    assert(j.filter(col("k") =!= ceil(col("n") / lit(48.0)).cast("long")).isEmpty)
  }

  test("chunk census reconciles with the chunk frame and reports only cross-doc repeats") {
    val census = Chunking.chunkDedup(spark, sfDir).cache()
    assert(census.count() > 0, "the corpus's near-dup families must share full windows")
    assert(census.filter(col("n_docs") < 2 ||
      col("n_occurrences") < col("n_docs")).isEmpty,
      "every reported chunk spans >= 2 docs and occurs at least once per doc")
    // independent recount from the public chunk surface
    val recount = Chunking.docChunks(spark, sfDir)
      .filter(col("n_tokens") === 64)
      .groupBy(md5(col("chunk_text")).as("chunk_key"))
      .agg(countDistinct(col("doc_id")).as("nd"), count(lit(1)).as("no"),
        min(col("doc_id")).as("fd"))
      .filter(col("nd") >= 2)
    assert(census.count() == recount.count())
    assert(census.join(recount,
        census("chunk_key") === recount("chunk_key") &&
          census("n_docs") === recount("nd") &&
          census("n_occurrences") === recount("no") &&
          census("first_doc") === recount("fd"), "left_anti").isEmpty,
      "census rows must match an independent recount exactly")
  }

  test("apply strips exactly the tokens under over-spread full windows") {
    val applied = Chunking.chunkDedupApply(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
    // row-complete: one output row per document, before-count = token count
    assert(applied.count() ==
      docs.count(), "every document keeps a row, stripped or not")
    assert(applied.join(
      docs.select(col("doc_id"), size(col("toks")).cast("long").as("n")),
      "doc_id").filter(col("n_tokens_before") =!= col("n")).isEmpty)
    // independent token-level recount: rebuild the kept-token count from
    // the census's flagged keys and the public chunk surface, at the
    // kernel's real window width (no duplicated constant)
    val W = Chunking.ChunkTokens
    val flaggedKeys = Chunking.chunkDedup(spark, sfDir).select("chunk_key")
    val spans = Chunking.docChunks(spark, sfDir)
      .filter(col("n_tokens") === W)
      .withColumn("chunk_key", md5(col("chunk_text")))
      .join(flaggedKeys, Seq("chunk_key"), "left_semi")
      .select(col("doc_id"), col("start_tok"))
    val removedPerDoc = spans
      .groupBy("doc_id").agg(collect_set(col("start_tok")).as("ss"))
      .join(docs, "doc_id")
      .select(col("doc_id"), expr(
        s"size(filter(toks, (t, i) -> exists(ss, s -> i >= s AND i < s + $W)))")
        .cast("long").as("removed"))
    val got = applied
      .join(removedPerDoc, Seq("doc_id"), "left")
      .withColumn("expect",
        col("n_tokens_before") - coalesce(col("removed"), lit(0L)))
    assert(got.filter(col("n_tokens_after") =!= col("expect")).isEmpty,
      "after-count must equal before minus independently recounted covered tokens")
    // at least one document actually got stripped on this corpus (the
    // census is non-empty, so some full window repeats across docs)
    assert(applied.filter(col("n_tokens_after") < col("n_tokens_before"))
      .count() > 0)
    // the clean text is exactly the kept tokens re-joined
    assert(applied.filter(
      size(split(col("clean_text"), " ")).cast("long") =!= col("n_tokens_after")
        && !(col("clean_text") === "" && col("n_tokens_after") === 0)).isEmpty)
    applied.unpersist()
  }

  test("adjacent chunks overlap by window - stride tokens") {
    val ch = Chunking.docChunks(spark, sfDir)
    val gaps = ch.groupBy("doc_id").agg(
      collect_list(struct(col("chunk_id"), col("start_tok"))).as("cs"))
      .select(explode(expr(
        "transform(array_sort(cs), (c, i) -> c.start_tok - i * 48)")).as("resid"))
    assert(gaps.filter(col("resid") =!= 0).isEmpty)
  }
}
