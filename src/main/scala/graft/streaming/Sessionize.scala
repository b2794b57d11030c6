package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/**
 * True streaming sessionization via flatMapGroupsWithState — the
 * stateful mirror of `EventStreams.sessionize` (whose window-function
 * form is the batch/oracle path). State per user is one open session
 * (bounded); sessions emit when the inactivity gap passes or the
 * watermark times the group out.
 *
 * The reference's streaming mode (`ExtractStreaming.py`) keeps
 * per-slot accumulations in process memory; here the state store is
 * checkpointed and partitioned by key, so a 1000-executor job holds
 * 1/1000th of the users each.
 */
object Sessionize {

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(startUs: Long, endUs: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, total_value: Double)

  def gapUs(minutes: Int): Long = minutes * 60L * 1000000L

  /**
   * Pure per-group transition: fold sorted events into closed sessions
   * + open tail. Shared by the streaming operator and its batch spec.
   */
  def fold(events: Seq[Ev], gap: Long, open: Option[SessionState]):
      (Seq[SessionState], Option[SessionState]) = {
    val sorted = events.sortBy(_.ts_us)
    sorted.foldLeft((Vector.empty[SessionState], open)) { case ((closed, cur), e) =>
      cur match {
        case Some(s) if e.ts_us - s.endUs <= gap =>
          (closed, Some(SessionState(s.startUs, e.ts_us, s.n + 1, s.total + e.value)))
        case Some(s) =>
          (closed :+ s, Some(SessionState(e.ts_us, e.ts_us, 1, e.value)))
        case None =>
          (closed, Some(SessionState(e.ts_us, e.ts_us, 1, e.value)))
      }
    }
  }

  def update(gap: Long, withTimeout: Boolean)(userId: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, s.startUs, s.endUs, s.n, s.total))
    } else {
      val (closed, open) = fold(events.toSeq, gap, state.getOption)
      open.foreach { s =>
        state.update(s)
        if (withTimeout) state.setTimeoutDuration(gap / 1000L)
      }
      closed.iterator.map(s => Session(userId, s.startUs, s.endUs, s.n, s.total))
    }
  }

  /**
   * Attach to a streaming Dataset[Ev] grouped by user. Default is
   * NoTimeout: a session closes when the user's next event arrives
   * past the gap. `withTimeout=true` also closes idle sessions on a
   * processing-time timer — correct for production, but it makes the
   * engine trigger continuous empty micro-batches, so synchronous
   * drivers (processAllAvailable) never see the stream go idle.
   */
  def sessions(spark: SparkSession, events: Dataset[Ev], gapMinutes: Int = 30,
      withTimeout: Boolean = false): Dataset[Session] = {
    import spark.implicits._
    val timeout =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        update(gapUs(gapMinutes), withTimeout))
  }

  /**
   * The same sessionizer on the arbitrary-state API that supersedes
   * flatMapGroupsWithState (`transformWithState`, Spark 4): typed
   * named state through a [[StatefulProcessorHandle]] instead of one
   * opaque GroupState blob — the deployment-facing differences are
   * schema-evolvable state, per-state TTL, and the RocksDB state
   * store (transformWithState requires it; changelog-checkpointed,
   * so 100 TB-scale key counts don't rewrite full snapshots per
   * batch). The PER-GROUP TRANSITION IS THE SHARED [[fold]] — both
   * operators are thin shells around it, so SessionizeStreamSpec can
   * assert the two emit identical sessions on identical input
   * without duplicating session semantics in the test.
   */
  class SessionProcessor(gap: Long)
      extends StatefulProcessor[Long, Ev, Session] {
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Session] = {
      val prior = if (open.exists()) Some(open.get()) else None
      val (closed, tail) = fold(rows.toSeq, gap, prior)
      tail match {
        case Some(s) => open.update(s)
        case None => open.clear()
      }
      closed.iterator.map(s => Session(userId, s.startUs, s.endUs, s.n, s.total))
    }
  }

  /**
   * [[sessions]] on `transformWithState`. Sessions close when a later
   * event passes the gap (TimeMode.None — the NoTimeout analogue);
   * the session running the query must use the RocksDB state store
   * provider (`spark.sql.streaming.stateStore.providerClass`), which
   * transformWithState requires.
   */
  def sessionsTws(spark: SparkSession, events: Dataset[Ev],
      gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs(gapMinutes)),
        TimeMode.None(), OutputMode.Append())
  }
}
