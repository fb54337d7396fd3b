package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization of an event stream — the standard first
 * aggregation over behavioral/event data (and the reference's per-file
 * grouping semantics lifted to the time axis: events group by actor
 * until a silence gap, like nodes group by file until a file boundary).
 *
 * Two forms, same session definition (a new session starts when the
 * time since the actor's previous event exceeds `gapSeconds`):
 *
 *  - [[label]]: per-event `session_seq` (1-based per actor) via one
 *    keyed window — use when downstream needs the event rows.
 *  - [[stats]]: per-session aggregates via Spark's native
 *    `session_window` aggregate — no window function, plain partial
 *    aggregation with mergeable session state, and the SAME code is
 *    Structured-Streaming-ready (watermark + session_window is Spark's
 *    canonical streaming sessionization).
 *
 * Scale shape: both forms shuffle once on the actor key. `stats`
 * partial-aggregates map-side (sessions merge associatively), so a hot
 * actor costs the exchange only its merged session summaries, not its
 * raw events; `label` must materialize per-event output, so the hot
 * actor's events meet in one partition — inherent to the output shape.
 * Determinism under ts ties: orderings include the event id.
 *
 * Portability: comparisons run on integer epoch MICROSECONDS
 * (`unix_micros` here, `epoch_us` in DuckDB) — no float time, no tz
 * arithmetic; window frames are explicit ROWS (engine defaults differ
 * on RANGE-vs-ROWS for tied orderings).
 */
object Sessionize {

  /** Epoch micros for TIMESTAMP or TIMESTAMP_NTZ columns (parquet event
   * ts is NTZ; the session tz is pinned to UTC in the mains, so the cast
   * is the identity wall-clock mapping DuckDB's epoch_us also uses). */
  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Per-event session labels: input columns + `session_seq` (BIGINT,
   * 1-based per `actorCol` in (ts, id) order). */
  def label(df: DataFrame, actorCol: String, tsCol: String, idCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive (got $gapSeconds)")
    val w = Window.partitionBy(actorCol).orderBy(col(tsCol), col(idCol))
    val prevUs = lag(micros(col(tsCol)), 1).over(w)
    val isNew = when(
      prevUs.isNull || micros(col(tsCol)) - prevUs > gapSeconds * 1000000L,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /**
   * Per-session aggregates via the native session_window aggregate:
   * `(actorCol, session_start_us, session_end_us, n_events,
   * value_cents)` where end = last event + gap (Spark's session_window
   * contract) and value_cents sums `round(valueCol·100)` as BIGINT
   * (integer cents: portable, no float-sum order sensitivity).
   */
  def stats(df: DataFrame, actorCol: String, tsCol: String,
      valueCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive (got $gapSeconds)")
    df.groupBy(col(actorCol), session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * 100).cast("long")).as("value_cents"))
      .select(col(actorCol),
        micros(col("session_window.start")).as("session_start_us"),
        micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("value_cents"))
  }
}
