package graft.etl

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** ETL transform invariants: melt↔pivot inversion, imputation completeness,
  * deterministic random-choice reproducibility. */
class TransformsSpec extends SparkSpec {

  test("melt(pivot(x)) restores the long shape") {
    val long = Transforms.meltPivot(spark, sfDir).cache()
    // the round-tripped long table must equal the direct per-(grp,type) agg
    val direct = Tables.events(spark, sfDir)
      .groupBy((col("user_id") % 50).as("grp"), col("event_type"))
      .agg(round(sum(col("value")), 6).as("total"),
        min_by(col("value"), col("event_id")).as("first_val"))
    assert(long.count() == direct.count())
    assert(long.except(direct).isEmpty && direct.except(long).isEmpty)
  }

  test("full pipeline: every (grp, type) cell present, imputed cells carry the type median") {
    val out = Transforms.etlFullPipeline(spark, sfDir).cache()
    // stage composition invariant: the load sees the COMPLETE pivot grid —
    // one row per (grp ∈ observed grps, type ∈ 5-value domain), none null
    val grps = out.select("grp").distinct().count()
    assert(out.count() == grps * 5, s"grid incomplete: ${out.count()} rows for $grps grps")
    assert(out.filter(col("total_filled").isNull).isEmpty)
    // the deterministic holes exist ((grp + len(type)) % 9 == 0 hits ~1/9
    // of cells) and every imputed cell equals its type's median of the
    // SURVIVING cells — i.e. the impute stage ran after melt, on the
    // holed frame, exactly the python.py:170-175 order
    val imputed = out.filter(col("was_imputed"))
    assert(imputed.count() > 0, "no imputation holes — the impute stage had no work")
    val med = out.filter(!col("was_imputed"))
      .groupBy("event_type")
      .agg(round(expr("median(total_filled)"), 6).as("m"))
    assert(imputed.join(med, Seq("event_type"))
      .filter(col("total_filled") =!= col("m")).isEmpty,
      "an imputed cell does not carry its type median")
  }

  test("group imputation leaves no nulls and only fills the masked rows") {
    val out = Transforms.groupImpute(spark, sfDir).cache()
    assert(out.filter(
      col("value_filled").isNull || col("type_filled").isNull || col("type_random").isNull)
      .isEmpty)
    // unmasked rows keep their original value
    val orig = Tables.events(spark, sfDir)
      .filter(col("event_id") % 7 =!= 0)
      .select(col("event_id"), round(col("value"), 6).as("v"))
    val changed = out.join(orig, "event_id")
      .filter(col("value_filled") =!= col("v"))
    assert(changed.isEmpty)
  }

  test("deterministic random-choice imputation is reproducible") {
    val a = Transforms.groupImpute(spark, sfDir).select("event_id", "type_random").collect()
    val b = Transforms.groupImpute(spark, sfDir).select("event_id", "type_random").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("clean chain drops masked columns and pushes the ts range filter") {
    val out = Transforms.cleanEvents(spark, sfDir)
    assert(!out.columns.contains("props") && !out.columns.contains("user_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("Filter"))
  }

  test("json flatten parses every row (no corrupt-record nulls)") {
    val ev = Tables.events(spark, sfDir)
    val flat = Transforms.jsonFlatten(spark, sfDir)
    val n = flat.agg(sum("n")).head().getLong(0)
    assert(n == ev.count())
  }

  test("schema-drift union aligns by name and null-fills exactly the drifted columns") {
    val out = Transforms.unionSchemaDrift(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    assert(out.count() == docs.count()) // every doc lands in exactly one snapshot
    // the missing column is null IFF the row came from the snapshot lacking it
    assert(out.filter(col("snapshot") === "s1" &&
      (col("lang").isNotNull || col("n_chars").isNull)).isEmpty)
    assert(out.filter(col("snapshot") === "s2" &&
      (col("n_chars").isNotNull || col("lang").isNull)).isEmpty)
    // alignment is by NAME: surviving values match the base table's
    val backJoin = out.filter(col("snapshot") === "s1")
      .join(docs.select(col("doc_id"), col("n_chars").as("want")), "doc_id")
      .filter(col("n_chars") =!= col("want"))
    assert(backJoin.isEmpty)
  }
}
