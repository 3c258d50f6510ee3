package graft.core

import org.apache.spark.sql.DataFrame

/** dbt `retry`: resume a failed run from its point of failure instead
  * of rebuilding the whole DAG. A RUN JOURNAL (warehouse artifact,
  * committed after EACH model completes — so a crash at any point
  * leaves an accurate record) maps model name → checksum; the retry
  * skips every journaled model whose checksum still matches and whose
  * materialization survives on disk, resolves its refs from the
  * warehouse, and executes everything else in topological order.
  *
  * Semantics matched to dbt:
  *  - a model EDITED between failure and retry re-runs (checksum
  *    mismatch — dbt re-runs modified nodes rather than trusting a
  *    stale success);
  *  - views are never journaled or skipped: they materialize nothing
  *    and recompose lazily into downstream plans at zero cost;
  *  - the journal clears when the whole run succeeds, so the next
  *    invocation is a fresh run — retry only ever resumes the LAST
  *    failed invocation.
  *
  * At scale this is the difference between re-paying a day of
  * upstream build and re-running only the node that died plus its
  * downstream cone.
  */
object Retry {

  val artifactName = "run_journal.json"

  /** Pre-write intent marker: committed BEFORE a persisted model
    * materializes, cleared by the journal commit that follows it. A
    * hard crash BETWEEN the table write and the journal commit leaves
    * the model un-journaled but possibly written — idempotent
    * materializations (table, merge, insert-overwrite) just redo the
    * work on retry, but an APPEND-strategy incremental would
    * duplicate the batch. The intent record makes that ambiguous
    * state detectable: on retry, an intent-without-journal for an
    * append model whose target exists forces a full refresh of that
    * one model instead of a blind re-append.
    */
  val intentArtifact = "run_intent.json"

  private def toJson(j: Map[String, String]): String =
    j.toSeq.sorted.map { case (n, cs) => s""""$n":"$cs"""" }
      .mkString("{", ",", "}")

  private def fromJson(s: String): Map[String, String] =
    """"([^"]+)"\s*:\s*"([0-9a-f]+)"""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2)).toMap

  def loadJournal(wh: Warehouse): Map[String, String] =
    wh.loadArtifact(artifactName).map(fromJson).getOrElse(Map.empty)

  /** Commit a journal (or intent) map — public so the CLI's threaded
    * `run` can journal each completed model through the same artifact
    * the `retry` subcommand resumes from.
    */
  def commit(wh: Warehouse, journal: Map[String, String],
      artifact: String = artifactName): Unit =
    wh.saveArtifact(artifact, toJson(journal))

  /** Journaled run. Returns (ran, skipped) in topological order; the
    * journal is committed after each persisted model and cleared on
    * full success. Throws the failing model's error after the journal
    * reflects everything completed before it.
    */
  private def isAppend(m: Model): Boolean = m.materialization match {
    case Materialization.Incremental(IncrementalStrategy.Append(_)) => true
    case _ => false
  }

  /** Journal key for a lifecycle hook — namespaced so a hook can
    * never collide with a model of the same name.
    */
  private def hookKey(h: Hook): String = s"hook:${h.name}"

  def run(graph: ModelGraph, mat: Materializer,
      sources: String => DataFrame, wh: Warehouse,
      fullRefresh: Boolean = false,
      hooks: RunHooks = RunHooks()): (Seq[String], Seq[String]) = {
    var journal = loadJournal(wh)
    // CUMULATIVE: the failed run's intents must survive this retry's
    // own intent commits — if the retry itself crashes before reaching
    // a later append model, the next retry still needs to know that
    // model may hold an unjournaled batch
    var intents = wh.loadArtifact(intentArtifact)
      .map(fromJson).getOrElse(Map.empty)
    val priorIntents = intents
    var acc = Map.empty[String, DataFrame]
    val ran = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    // on-run-start hooks precede the first model and journal like
    // models: a retried run skips a completed hook whose body is
    // unchanged (its side effect — fixture DDL — already exists) and
    // re-fires an edited one, dbt's own hook-on-retry behavior
    for (h <- hooks.onRunStart) {
      if (journal.get(hookKey(h)).contains(h.checksum)) skipped += h.name
      else {
        h.action()
        journal += hookKey(h) -> h.checksum
        wh.saveArtifact(artifactName, toJson(journal))
        ran += h.name
      }
    }
    for (name <- graph.topoOrder) {
      val m = graph.byName(name)
      val resolve: String => DataFrame = n => acc.getOrElse(n, sources(n))
      val isView = m.materialization == Materialization.View
      val completedBefore = !isView &&
        journal.get(name).contains(m.checksum) &&
        wh.exists(m.targetSchema, name)
      // per-model hooks (dbt pre_hook/post_hook) journal like models,
      // with each hook's journal identity BOUND to its model's
      // checksum: editing the model invalidates its hooks' completed
      // entries automatically (dbt re-runs the full node), while a
      // pure crash-resume skips hook side effects that already
      // applied (grants granted, fixture DDL created).
      def modelHookKey(h: Hook): String = s"hook:$name:${h.name}"
      def modelHookCs(h: Hook): String =
        Checksum.md5(h.checksum + "|" + m.checksum)
      def fireModelHook(h: Hook): Unit =
        if (journal.get(modelHookKey(h)).contains(modelHookCs(h)))
          skipped += s"$name.${h.name}"
        else {
          h.action()
          journal += modelHookKey(h) -> modelHookCs(h)
          wh.saveArtifact(artifactName, toJson(journal))
          ran += s"$name.${h.name}"
        }
      if (completedBefore) {
        acc += name -> wh.read(m.targetSchema, name)
        skipped += name
        // crash window: model journaled, post-hook not yet fired —
        // a skipped model's remaining post-hooks still run
        m.postHooks.foreach(fireModelHook)
      } else {
        m.preHooks.foreach(fireModelHook)
        // the crash window: target written, journal not yet committed.
        // An intent with NO journal entry means this append target may
        // already hold the batch — rebuild it from scratch rather than
        // double-append. Matched by NAME, not checksum: the
        // fix-then-retry flow edits the model between crash and retry,
        // and an edited model's target is just as ambiguous as an
        // unedited one's. A journal entry at ANY checksum excludes the
        // model: its last write committed, so the crash window never
        // applied — an edited-but-completed append model re-runs as a
        // normal incremental instead of wiping its accumulated
        // history.
        val ambiguousAppend = isAppend(m) &&
          priorIntents.contains(name) && !journal.contains(name) &&
          wh.exists(m.targetSchema, name)
        if (!isView) {
          intents += name -> m.checksum
          wh.saveArtifact(intentArtifact, toJson(intents))
        }
        val out = mat.run(m, resolve, fullRefresh || ambiguousAppend)
        acc += name -> out
        if (!isView) {
          journal += name -> m.checksum
          wh.saveArtifact(artifactName, toJson(journal))
        }
        m.postHooks.foreach(fireModelHook)
        ran += name
      }
    }
    // on-run-end hooks fire once the whole DAG has completed — a
    // failed run never reached them, so the resuming retry runs them
    // unconditionally (they see the finished warehouse state)
    for (h <- hooks.onRunEnd) { h.action(); ran += h.name }
    wh.saveArtifact(artifactName, "{}")
    wh.saveArtifact(intentArtifact, "{}")
    (ran.result(), skipped.result())
  }
}
