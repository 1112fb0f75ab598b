package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** QUERY-SCOPED PERSIST — caching whose lifetime is the consuming action,
  * not the session.
  *
  * A dozen registered queries persist a shared intermediate (one tokenize
  * pass feeding three aggregates, a feature table feeding every training
  * round) because the returned plan genuinely reads it more than once. A
  * bare `.persist()` has no release point: the query function returns a
  * LAZY frame, so unpersisting before the caller acts would defeat the
  * cache, and after returning there is no callback — the entry outlives
  * the query. The harness happens to `clearCache()` between queries, but a
  * library consumer composing two such queries in one session would
  * accumulate cached tables indefinitely.
  *
  * `scoped(s) { keep => ... }` closes that hole: each frame passed through
  * `keep` is persisted immediately, and ALL of the scope's entries are
  * released when the first ACTION whose plan contains the scope's returned
  * frame completes (success or failure) — detected with a
  * [[QueryExecutionListener]] that canonicalized-compares (`sameResult`)
  * the scope's analyzed plan against each finishing execution's subtrees,
  * then unregisters itself. The cache therefore lives exactly as long as
  * the computation it serves:
  *
  *   - `df.count()` / `df.collect()` / `df.write...` → intermediates are
  *     materialized, reused across the plan's branches, and released as
  *     the action completes;
  *   - a SECOND action over the same frame recomputes the intermediates
  *     un-cached (correct, just not re-deduplicated) — callers that act
  *     repeatedly should persist the RESULT themselves, which is their
  *     lifetime to manage;
  *   - a frame that is never acted on normally never materializes the
  *     cache, so the (unreachable-but-registered) entries hold no
  *     storage; the listener costs one cheap plan compare per session
  *     action until then. A scope whose BUILD runs an eager action
  *     internally (q151/q152's per-round localCheckpoint) materializes
  *     entries at construction — those are released AT BUILD END when the
  *     returned plan no longer references them (their only consumers were
  *     the build's own actions, which have completed), so an ABANDONED
  *     frame holds no cache either; only entries the returned plan still
  *     reads stay registered for the consuming-action release;
  *   - two LIVE frames built from the same query function have
  *     canonically identical plans, so the first frame's action releases
  *     both scopes (CacheManager entries are shared by canonical plan
  *     anyway); the second frame stays correct and recomputes uncached —
  *     callers wanting independent cache lifetimes for identical plans
  *     should persist the results themselves.
  *
  * The listener fires on the listener-bus thread shortly AFTER the action
  * returns, so "empty cache" assertions must poll briefly
  * (CacheHygieneSpec does).
  */
object CacheScope {

  /** Build a frame with query-scoped persists: `build` receives a `keep`
    * function — `keep(df)` persists `df` and registers it for release when
    * the first action over the returned frame completes. If `build`
    * registers nothing, no listener is installed.
    */
  def scoped(s: SparkSession)(build: (DataFrame => DataFrame) => DataFrame): DataFrame = {
    val held = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val keep: DataFrame => DataFrame = { df => df.persist(); held += df; df }
    val out = build(keep)
    if (held.nonEmpty) {
      val target = out.queryExecution.analyzed
      // Entries the returned plan no longer references were consumed only by
      // the build's own internal eager actions (now complete) — release them
      // HERE so an abandoned frame holds no cache. The reference check is a
      // fixpoint: an entry feeding a RETAINED entry's (possibly not yet
      // materialized) plan must itself stay, or the consuming action would
      // recompute it uncached.
      def references(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          h: DataFrame): Boolean = {
        val t = h.queryExecution.analyzed
        (plan +: plan.subqueriesAll).exists(_.exists(_.sameResult(t)))
      }
      val retained = {
        var keep = held.filter(h => references(target, h))
        var grew = true
        while (grew) {
          val next = held.filter(h =>
            keep.contains(h) || keep.exists(k => references(k.queryExecution.analyzed, h)))
          grew = next.size != keep.size
          keep = next
        }
        keep
      }
      held.filterNot(retained.contains).foreach(_.unpersist(blocking = false))
      if (retained.isEmpty) return out
      val listener = new QueryExecutionListener {
        // `exists` walks the plan tree but not plans nested inside
        // expressions — a consumer embedding the scoped frame in a
        // scalar/IN subquery would otherwise never trigger the release,
        // so subqueriesAll joins the scan
        private def contains(qe: QueryExecution): Boolean = {
          val root = qe.analyzed
          (root +: root.subqueriesAll).exists(_.exists(_.sameResult(target)))
        }
        private def release(qe: QueryExecution): Unit =
          if (contains(qe)) {
            retained.foreach(_.unpersist(blocking = false))
            s.listenerManager.unregister(this)
          }
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          release(qe)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          release(qe)
      }
      s.listenerManager.register(listener)
    }
    out
  }
}
