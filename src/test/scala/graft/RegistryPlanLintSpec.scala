package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, GlobalLimit, LocalRelation, LogicalPlan, OneRowRelation, Sort, Window => LWindow}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Registry-WIDE physical-plan lint (VERDICT r14 #1): every entry in
  * `SparkEntry.queries` is planned and screened for the scale-killer
  * shapes the per-round manual plan audit used to hunt by hand —
  *
  *  1. `CartesianProductExec` / `BroadcastNestedLoopJoinExec` in the
  *     physical plan: at 100 TB an un-keyed join is quadratic unless one
  *     side is a bounded reduction (a global aggregate's 1 row, a
  *     LIMIT-capped frame, a k-row model artifact). Structurally-bounded
  *     cases pass automatically; everything else must be named in
  *     [[UnkeyedJoinWhitelist]] with its justification.
  *  2. Unpartitioned logical Windows over unreduced input: a window with
  *     an empty partitionSpec funnels its whole input through ONE task.
  *     Fine above an Aggregate (domain-bounded frame, e.g. the global
  *     RANK over HAVING-shrunk companies in q1) — a killer straight over
  *     a fact scan.
  *  3. Unbounded global Sorts: `ORDER BY` over input that reaches the
  *     sort unreduced (no Aggregate/Deduplicate/LIMIT below, no LIMIT
  *     above turning it into top-k). Presentation sorts over aggregates
  *     and `TakeOrderedAndProject` shapes pass automatically.
  *
  * The whitelists are EXACT: an entry that stops triggering its listed
  * shape fails the suite too, so the lists cannot rot into blanket
  * exemptions. PlanSpec keeps the deeper per-entry shape pins (pushdown,
  * exchange counts, cache reuse); this spec is the broad net that
  * guarantees a NEW registry entry cannot merge with a quadratic join or
  * a single-task sort nobody looked at.
  */
class RegistryPlanLintSpec extends SparkSpec {

  /** Entries allowed to plan an un-keyed join (CartesianProduct /
    * BroadcastNestedLoopJoin) even after the structural bounded-side
    * screen. Each carries the documented reason; all are the exact
    * all-pairs truth baselines whose sketch alternatives are separate
    * green entries (SCALE.md "exact baselines"). */
  private val UnkeyedJoinWhitelist: Map[String, String] = Map(
    "embedding_topk" -> "documented O(n²) exact-cosine truth baseline (Similarity.scala embeddingTopk); scale path = embedding_ann_lsh/ivf",
    "embedding_knn_native" -> "documented O(n²) exact kNN baseline on the native cosine kernel; scale path = embedding_ann_lsh / ivf_index_search",
    "embedding_cosine_dedup" -> "documented O(n²) exact near-dup baseline; scale path = embedding_lsh_dedup",
    "knn_label_vote" -> "documented exact kNN vote baseline over the bounded labeled set",
    "ivf_index_search" -> "broadcast of the persisted K-row centroid table (K=8 by construction) — bounded by the index contract but read back from parquet, so not structurally visible to the lint"
  )

  /** Entries allowed an unpartitioned Window over unreduced input. */
  private val GlobalWindowWhitelist: Map[String, String] = Map.empty

  /** Entries allowed an unbounded global Sort. */
  private val GlobalSortWhitelist: Map[String, String] = Map.empty

  /** A subtree counts as bounded when some node below provably collapses
    * cardinality to a domain/artifact size: a global or grouped Aggregate
    * (this repo's group-bys reduce to dimension/bucket cardinality — the
    * per-entry PlanSpec pins guard the ones where that matters),
    * Deduplicate over dimension keys, an explicit LIMIT, or a local/1-row
    * relation (broadcast literals, collected k-row model artifacts). */
  private def bounded(p: LogicalPlan): Boolean =
    p.collectFirst {
      case a: Aggregate => a
      case d: Deduplicate => d
      case l: GlobalLimit => l
      case lr: LocalRelation => lr
      case o: OneRowRelation => o
    }.isDefined

  /** Physical twin of [[bounded]]: an Aggregate / LIMIT / top-k /
    * local-relation node anywhere below caps the side's cardinality at a
    * domain/artifact size, so an un-keyed join against it ships a bounded
    * inner, not a quadratic blow-up. */
  private def boundedPhys(p: SparkPlan): Boolean =
    p.collectFirst {
      case a: HashAggregateExec => a
      case a: SortAggregateExec => a
      case a: ObjectHashAggregateExec => a
      case l: GlobalLimitExec => l
      case t: TakeOrderedAndProjectExec => t
      case s: LocalTableScanExec => s
    }.isDefined

  private def unkeyedJoins(phys: SparkPlan): Seq[String] =
    phys.collect {
      case c: CartesianProductExec
          if !boundedPhys(c.left) && !boundedPhys(c.right) =>
        "CartesianProduct"
      case b: BroadcastNestedLoopJoinExec
          if !boundedPhys(b.left) && !boundedPhys(b.right) =>
        "BroadcastNestedLoopJoin"
    }

  /** Windows with an empty partitionSpec whose input is not already
    * reduced — the single-task funnel. */
  private def globalWindows(opt: LogicalPlan): Seq[String] =
    opt.collect {
      case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) =>
        s"global Window(${w.windowExpressions.map(_.name).mkString(",")})"
    }

  /** INTERIOR global Sorts over unreduced input: a global sort is a
    * parallel range-partitioned shuffle+sort (not a single-task funnel),
    * so a ROOT presentation `ORDER BY` — which most entries carry for
    * deterministic oracle comparison — is legitimate. What this flags is
    * an unbounded global sort feeding FURTHER computation: an algorithm
    * leaning on a total order mid-plan is the shape that should have been
    * a window/partition-local sort/top-k instead. Sorts under a LIMIT
    * (planned as top-k) pass automatically. */
  private def unboundedSorts(opt: LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, Project}
    def walk(p: LogicalPlan, limited: Boolean, atRoot: Boolean): Seq[String] = p match {
      case g: GlobalLimit => g.children.flatMap(walk(_, limited = true, atRoot = false))
      // GlobalLimit(LocalLimit(Project(Sort))) is Spark's top-k shape
      // (TakeOrderedAndProject) — the flag must survive the LocalLimit
      // and any Project between the limit and its sort
      case l: LocalLimit => l.children.flatMap(walk(_, limited, atRoot = false))
      case pr: Project if limited =>
        pr.children.flatMap(walk(_, limited = true, atRoot = false))
      // the presentation sort survives Project/column-prune wrappers
      case pr: Project if atRoot => pr.children.flatMap(walk(_, limited, atRoot = true))
      case s: Sort if s.global && !limited && !atRoot && !bounded(s.child) =>
        s"interior unbounded global Sort(${s.order.map(_.child.sql).mkString(",")})" +:
          s.children.flatMap(walk(_, limited = false, atRoot = false))
      case s: Sort if atRoot =>
        s.children.flatMap(walk(_, limited = false, atRoot = false))
      case other => other.children.flatMap(walk(_, limited = false, atRoot = false))
    }
    walk(opt, limited = false, atRoot = true)
  }

  test("every registered plan is free of unwhitelisted scale-killer shapes") {
    val hits = scala.collection.mutable.Map.empty[String, Seq[String]]
    val failures = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val df = q(spark, sfDir)
      val found =
        unkeyedJoins(df.queryExecution.sparkPlan).map(j => s"join:$j") ++
          globalWindows(df.queryExecution.optimizedPlan).map(w => s"window:$w") ++
          unboundedSorts(df.queryExecution.optimizedPlan).map(s => s"sort:$s")
      if (found.nonEmpty) hits(name) = found
      val joinsHit = found.exists(_.startsWith("join:"))
      val winsHit = found.exists(_.startsWith("window:"))
      val sortsHit = found.exists(_.startsWith("sort:"))
      if (joinsHit && !UnkeyedJoinWhitelist.contains(name))
        failures += s"$name: ${found.filter(_.startsWith("join:")).mkString(", ")}"
      if (winsHit && !GlobalWindowWhitelist.contains(name))
        failures += s"$name: ${found.filter(_.startsWith("window:")).mkString(", ")}"
      if (sortsHit && !GlobalSortWhitelist.contains(name))
        failures += s"$name: ${found.filter(_.startsWith("sort:")).mkString(", ")}"
    }
    spark.catalog.clearCache() // some entries cache intermediates at build time
    val bad = failures.result()
    assert(bad.isEmpty,
      s"scale-killer plan shapes outside the whitelist:\n${bad.mkString("\n")}")
    // the whitelists are exact — a listed entry that no longer plans the
    // shape is stale and must be removed, not silently kept as a blanket
    // pass for future regressions
    val staleJoin = UnkeyedJoinWhitelist.keys.filterNot(n =>
      hits.get(n).exists(_.exists(_.startsWith("join:"))))
    val staleWin = GlobalWindowWhitelist.keys.filterNot(n =>
      hits.get(n).exists(_.exists(_.startsWith("window:"))))
    val staleSort = GlobalSortWhitelist.keys.filterNot(n =>
      hits.get(n).exists(_.exists(_.startsWith("sort:"))))
    assert(staleJoin.isEmpty && staleWin.isEmpty && staleSort.isEmpty,
      s"stale whitelist entries (shape no longer planned): " +
        s"join=${staleJoin.mkString(",")} window=${staleWin.mkString(",")} sort=${staleSort.mkString(",")}")
    // and every whitelisted name must still be a registry entry
    val unknown = (UnkeyedJoinWhitelist.keys ++ GlobalWindowWhitelist.keys ++
      GlobalSortWhitelist.keys).filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"whitelisted names not in registry: ${unknown.mkString(",")}")
  }
}
