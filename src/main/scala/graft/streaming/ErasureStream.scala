package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** GDPR ERASURE inside a running stream (the continuous twin of
  * core/Erasure's batch purge): tombstone records arrive interleaved
  * with events, and the contract is ORDER-FREE — once a subject is
  * tombstoned, every event for that subject disappears, whether it
  * arrived before the tombstone (already folded into state and the
  * sink — undone by the emitted purge command), in the same
  * micro-batch (dropped regardless of intra-batch order), or after
  * (suppressed by the persisted flag). This is what makes the result
  * deterministic and batch-reproducible: final output ≡ a batch
  * aggregate over events with the tombstoned subjects removed.
  *
  * Mechanics: `flatMapGroupsWithState` keyed by subject. Per-subject
  * state is (erased?, count, value-sum); an erased subject keeps ONLY
  * the suppression flag — counts are zeroed the moment the tombstone
  * lands, so no erased aggregate outlives the request inside the
  * state store either. Value sums accumulate as SCALED-INTEGER micros
  * (x21's order-free exactness trick) because micro-batch fold order
  * must not perturb a cross-engine-gated total.
  *
  * Emissions drive an idempotent sink protocol (the e17 entry):
  * `erased=true` rows are purge COMMANDS (the sink anti-joins them
  * away — core/Erasure.purge's broadcast rewrite); `erased=false`
  * rows are per-subject snapshots upserted by key. A suppressed
  * subject emits nothing after its purge batch, so nothing ever
  * reinserts it.
  *
  * Scale: state is O(live subjects); the suppression flag is the
  * per-key minimum a production system keeps (a salted-hash
  * suppression list; evicted via state TTL once upstream re-delivery
  * windows close — NoTimeout here because the test streams are
  * finite).
  */
object ErasureStream {

  /** Unified stream record: kind = "event" | "erase". */
  final case class Rec(user_id: Long, kind: String, vmicros: Long)

  final case class UState(erased: Boolean, n: Long, vmicros: Long)

  /** erased=true → purge command; erased=false → snapshot upsert. */
  final case class Out(user_id: Long, erased: Boolean, n_events: Long,
      total_micros: Long)

  def update(uid: Long, recs: Iterator[Rec],
      state: GroupState[UState]): Iterator[Out] = {
    val s0 = state.getOption.getOrElse(UState(erased = false, 0L, 0L))
    val rs = recs.toSeq
    if (s0.erased || rs.exists(_.kind == "erase")) {
      state.update(UState(erased = true, 0L, 0L))
      // one purge command per batch that still mentions the subject —
      // idempotent downstream, and silent once traffic stops
      Iterator.single(Out(uid, erased = true, 0L, 0L))
    } else {
      val evs = rs.filter(_.kind == "event")
      val s1 = UState(erased = false, s0.n + evs.size,
        s0.vmicros + evs.iterator.map(_.vmicros).sum)
      state.update(s1)
      Iterator.single(Out(uid, erased = false, s1.n, s1.vmicros))
    }
  }

  /** The streaming per-subject aggregate with erasure applied. */
  def apply(ds: Dataset[Rec]): Dataset[Out] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
