package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r17 #8 (stretch): every registry entry must plan under a BARE
  * session whose only wiring is `spark.sql.extensions=graft.GraftExtensions`
  * — the shared-cluster deployment shape (one config line, every job gets
  * the native functions). The kernels' embedded `register(spark)` calls
  * are idempotent today; this pin prevents a future kernel from silently
  * depending on a manual register call that an extensions-configured
  * production session would never make, or on registration order across
  * entries. Physical planning (sparkPlan) is forced so function
  * resolution, optimizer rules (NativeVectorRewrite rides the same
  * extensions class), and strategy selection all run.
  *
  * Session mechanics: `spark.sql.extensions` is a STATIC conf read from
  * the SparkContext at session construction, so a second in-JVM session
  * over the shared test context cannot pick it up from builder options.
  * The spec therefore wires the fresh session through
  * [[GraftFunctions.registerAll]] — the SAME (identifier, info, builder)
  * tuples `GraftExtensions.apply` injects (single-sourced in
  * [[GraftFunctions.all]]), registered into a brand-new function
  * registry, so the session is functionally the extensions-configured
  * one.
  */
class ExtensionsSmokeSpec extends AnyFunSuite {

  test("every registry entry plans under an extensions-only session") {
    val base = SparkSpec.session // materialize the shared SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // a genuinely NEW SparkSession over the same context — its function
      // registry starts fresh (built-ins only), so nothing registered by
      // earlier suites or kernel register() calls leaks in
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", 4)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(ext ne base, "must be a fresh session, not the shared fixture")
      GraftFunctions.registerAll(ext)
      GraftFunctions.all.foreach { case (id, _, _) =>
        assert(ext.sessionState.functionRegistry.functionExists(id),
          s"extensions list must have registered $id")
      }
      val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        try {
          SparkEntry.queries(name)(ext, "/root/testdata/sf0.001")
            .queryExecution.sparkPlan
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getMessage}")
        }
      }
      assert(failures.isEmpty,
        s"${failures.size} entries failed to plan under extensions-only:\n" +
          failures.mkString("\n"))
    } finally {
      RunScope.releaseAll(blocking = true)
      // restore the shared fixture for any suite that runs after us
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
