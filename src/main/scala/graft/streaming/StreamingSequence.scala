package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the batch Validator's FUSED sequence pass
  * (MaxSessionGap / AllowedTransitions / Monotonic / NoConsecutiveRepeats):
  * all four adjacency checks evaluate in ONE `flatMapGroupsWithState` pass
  * with O(1) state per conversation — just the previous turn's
  * (turn_idx, role, ts, text-digest, value). At 10^12 turns that is the
  * cheapest possible stateful operator: a mega-thread of any length holds
  * one tuple, and idle conversations expire via processing-time timeout so
  * total state is O(active conversations).
  *
  * Parity with the batch pass (gated by StreamingSequenceSpec) holds when
  * the stream is turn-ordered per conversation (the transcript-append
  * contract, as in [[StreamingValidator]]) AND ts is monotone in turn
  * order — the batch gap check sorts by (ts, turn_idx) while a stream can
  * only see arrival order, so a conversation whose timestamps run
  * backwards is exactly the case to route to the batch path (and is
  * itself a `Monotonic(ts)` violation).
  *
  * State-expiry trade (idleTimeoutMs > 0): a conversation resuming AFTER
  * its state expired has no previous turn on record, so the adjacency
  * checks across that one boundary are SKIPPED — never fabricated: the
  * resuming turn is not mistaken for a conversation opener (firstIn
  * applies only at turn_idx 0), and a gap longer than the timeout is not
  * flagged in-stream (the batch pass owns it — size idleTimeoutMs well
  * above maxGapSeconds, as the defaults are). Duplicate redelivery of an
  * already-processed turn_idx (at-least-once sources) is skipped via the
  * state's turnIdx watermark instead of being compared against itself.
  *
  * Violation rows carry the batch Validator's shape (constraint / conv_id
  * / turn_idx / column / observed / bound / severity), byte-compatible
  * with [[StreamingValidator.Violation]].
  */
object StreamingSequence {

  /** Input row contract; optional fields are only read by the checks that
    * use them (a suite without repeats never looks at `text`).
    */
  final case class SeqTurn(conv_id: String, turn_idx: Int,
      role: Option[String], ts: Option[java.sql.Timestamp],
      text: Option[String], v: Option[Double])

  /** Previous-turn state: everything the four checks need, nothing more.
    * `textMd5` (not text): the digest is 32 chars, the payload unbounded.
    */
  final case class SeqState(turnIdx: Int, role: Option[String],
      tsMicros: Option[Long], textMd5: Option[String], v: Option[Double])

  /** The four checks, each optional — mirror the batch constraint types. */
  final case class SeqChecks(
      maxGapSeconds: Option[Long] = None,
      transitions: Option[(Seq[(String, String)], Option[Seq[String]])] = None,
      monotonicStrict: Option[Boolean] = None, // Some(false)=non-strict
      noRepeats: Boolean = false)

  private def md5hex(s: String): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  /** Evaluate all configured sequence checks on a turn stream. Within a
    * micro-batch, events process in turn_idx order; across batches,
    * arrival must be turn-ordered per conversation. `idleTimeoutMs <= 0`
    * disables state expiry (REQUIRED for finite test streams, see
    * [[StreamingValidator.rollingZViolations]]).
    */
  def sequenceViolations(turns: Dataset[SeqTurn], checks: SeqChecks,
      idleTimeoutMs: Long = 3600 * 1000L)
      : Dataset[StreamingValidator.Violation] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val timeoutConf = if (idleTimeoutMs > 0)
      GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

    val transBound = checks.transitions.map { case (allowed, firstIn) =>
      s"in {${allowed.map { case (a, b) => s"$a->$b" }.mkString(",")}}" +
        firstIn.map(o => s" first in {${o.mkString(",")}}").getOrElse("")
    }

    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (convId: String, events: Iterator[SeqTurn],
         state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            var prev = state.getOption
            val out = Seq.newBuilder[StreamingValidator.Violation]
            // redelivery guard: a turn at or below the state's turn_idx
            // watermark was already processed in an earlier batch — an
            // at-least-once duplicate must not be compared against itself
            // (false no_repeats / strict-monotonic violations). distinctBy
            // extends the same guard WITHIN a batch: two copies of one
            // turn_idx delivered together must not compare against each
            // other either (r5 ADVICE) — the first in sorted order wins,
            // exactly as if the copies had arrived in separate batches.
            events.toSeq.sortBy(_.turn_idx)
              .distinctBy(_.turn_idx)
              .filter(e => prev.forall(_.turnIdx < e.turn_idx))
              .foreach { e =>
              val tsUs = e.ts.map(t => java.util.concurrent.TimeUnit
                .MILLISECONDS.toMicros(t.getTime) + (t.getNanos / 1000) % 1000)
              // the digest is only ever read by no_repeats — a suite
              // without it must not hash every unbounded payload
              val textMd5 =
                if (checks.noRepeats) e.text.map(md5hex) else None

              // gap: (prev ts, curr ts) both present and over the bound
              for (maxGap <- checks.maxGapSeconds; p <- prev;
                   pUs <- p.tsMicros; cUs <- tsUs
                   if cUs - pUs > maxGap * 1000000L)
                out += StreamingValidator.Violation(
                  s"session_gap(${maxGap}s)", convId, e.turn_idx, "ts",
                  ((cUs - pUs) / 1e6).toString, s"gap<=${maxGap}s", "medium")

              // transitions: first turn vs firstIn; later turns vs pairs
              for ((allowed, firstIn) <- checks.transitions) {
                val name = "transitions(role)"
                prev match {
                  case None =>
                    // firstIn applies only to a conversation's ACTUAL
                    // opener: empty state at a nonzero turn_idx means the
                    // state expired (or the stream started mid-thread) —
                    // fabricating an opener violation there is the one
                    // divergence from batch this kernel must never have
                    if (e.turn_idx == 0)
                      for (opening <- firstIn; r <- e.role
                           if !opening.contains(r))
                        out += StreamingValidator.Violation(name, convId,
                          e.turn_idx, "role", r, transBound.get, "medium")
                  case Some(p) =>
                    for (pr <- p.role; r <- e.role
                         if !allowed.contains((pr, r)))
                      out += StreamingValidator.Violation(name, convId,
                        e.turn_idx, "role", s"$pr->$r", transBound.get,
                        "medium")
                }
              }

              // monotonic over v: both sides non-null
              for (strict <- checks.monotonicStrict; p <- prev;
                   pv <- p.v; cv <- e.v
                   if (strict && cv <= pv) || (!strict && cv < pv))
                out += StreamingValidator.Violation("monotonic(v)", convId,
                  e.turn_idx, "v", cv.toString,
                  if (strict) "increasing" else "non-decreasing", "medium")

              // repeats over the text digest
              if (checks.noRepeats)
                for (p <- prev; ph <- p.textMd5; h <- textMd5 if h == ph)
                  out += StreamingValidator.Violation("no_repeats(text)",
                    convId, e.turn_idx, "text", h, "differs from previous",
                    "medium")

              prev = Some(SeqState(e.turn_idx, e.role, tsUs, textMd5, e.v))
            }
            prev.foreach(state.update)
            out.result().iterator
          }
      }
  }
}
