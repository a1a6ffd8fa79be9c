package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Stateful-streaming sessionization (SURVEY.md §2.9 `events` surface):
  * gap-based sessions over a keyed event stream via
  * `mapGroupsWithState` — the custom-state primitive a 100 TB streaming
  * pipeline builds on (state lives in the state store, partitioned by
  * user key; each micro-batch touches only keys with new events).
  *
  * The batch analog is the `events_sessionize` declared query (lag +
  * running sum) and the `events_session_window` query
  * (`session_window`); `ExtSpec`/`StreamingSpec` assert all three agree.
  */
object EventSessions {

  case class Ev(userId: Long, tsMicros: Long)
  case class SessState(lastTs: Long, nSessions: Long, nEvents: Long)
  case class SessionSummary(userId: Long, nSessions: Long, nEvents: Long)

  /** Merge a micro-batch of events (any order) into per-user session
    * state; emits the updated running summary for the key. Gap rule
    * matches the batch query: a gap STRICTLY greater than `gapSec` starts
    * a new session. */
  def streamingSummaries(spark: SparkSession, events: Dataset[Ev],
                         gapSec: Long): Dataset[SessionSummary] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .mapGroupsWithState[SessState, SessionSummary](GroupStateTimeout.NoTimeout) {
        (userId, it, state) =>
          val sorted = it.toArray.sortBy(_.tsMicros)
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession =
              st.nEvents == 0L || e.tsMicros - st.lastTs > gapSec * 1000000L
            st = SessState(e.tsMicros,
              st.nSessions + (if (newSession) 1L else 0L), st.nEvents + 1L)
          }
          state.update(st)
          SessionSummary(userId, st.nSessions, st.nEvents)
      }
  }
}
