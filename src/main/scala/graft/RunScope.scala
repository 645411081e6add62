package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Run-scoped cache registry — the unpersist discipline for kernel
  * scratch frames (VERDICT r16 #2).
  *
  * Many kernels `.cache()` an intermediate that two or three downstream
  * branches of the SAME entry re-read (a shingle frame feeding bands plus
  * confirm joins; the corpus-prep stage survivors feeding both the next
  * stage and the funnel counts). That reuse is correct — but a plain
  * `.cache()` is never unpersisted, so across a 229-entry bench pass the
  * leaked blocks accumulate, evict each other, and make per-entry numbers
  * ORDER-DEPENDENT (SCALE.md round-16 cache-coupling study: at 25× the
  * effect dominated; the r16 driver bench showed it at sf0.1 too —
  * `corpus_prep_funnel` 13.6 s multi-entry vs 7.1 s solo-cold on
  * identical code).
  *
  * Contract: kernels mark run-scoped scratch with `.scratchCache()`
  * instead of `.cache()` — identical semantics (registers the plan in the
  * SQL cache manager, lazily materialized, plan-lint-visible as
  * InMemoryRelation) plus registration here; the HARNESS (Bench/Verify)
  * calls [[releaseAll]] after each entry's action completes, so the
  * blocks live exactly as long as the entry that built them. Laziness is
  * preserved end-to-end — entries still return unexecuted DataFrames, so
  * plan specs and the registry lint see the same plans as before.
  *
  * Unreleased registrations (plan-only consumers like the lint spec,
  * which never execute) hold only DataFrame references — the cache
  * manager holds no data until an action runs, so draining is an
  * optimization there, not a correctness need.
  */
object RunScope {
  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Registers `df` as run-scoped cached scratch; returns `df` (cached). */
  def cached(df: DataFrame): DataFrame = {
    df.cache()
    live.add(df)
    df
  }

  /** Unpersists every frame registered since the last release. Safe to
    * call with nothing registered.
    *
    * `blocking = true` (the Bench call site) waits for the block drops
    * so the asynchronous removal work cannot overlap the NEXT entry's
    * timed region — the release runs outside the timing, so pinning the
    * isolation there costs nothing measured. The default stays
    * non-blocking for callers with no timing invariant (Verify, specs).
    *
    * Scope caveat: this registry is process-global and the harness is
    * single-threaded by design (Bench/Verify run entries sequentially).
    * A concurrent caller's releaseAll would drop another entry's
    * still-in-use scratch — correctness survives (unpersist falls back
    * to lineage recompute) but cache reuse and timing isolation do not;
    * a multi-threaded harness would need a scoped registry per run. */
  def releaseAll(blocking: Boolean = false): Unit = {
    var df = live.poll()
    while (df != null) {
      try df.unpersist(blocking)
      catch { case scala.util.control.NonFatal(_) => () }
      df = live.poll()
    }
  }

  /** Chain-friendly marker: `frame.scratchCache()` reads like `.cache()`
    * at the call site while routing through [[cached]]. */
  implicit class ScratchCacheOps(private val df: DataFrame) extends AnyVal {
    def scratchCache(): DataFrame = cached(df)
  }
}
