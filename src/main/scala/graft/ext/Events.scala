package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch; the
  * Structured Streaming twin lives in [[graft.streaming.Sessionize]]).
  *
  * Timestamps: events.parquet carries TIMESTAMP(NANOS), which the
  * engine reads as nanos-since-epoch longs (see
  * [[graft.sources.Tables]]). All time math here uses integer
  * microseconds via `div` — long nanos MUST NOT round-trip through
  * double (`col/1000` promotes to double and loses precision above
  * 2^53 ns ≈ 104 days).
  *
  * Scale: sessionization is one shuffle on user_id (the window
  * partition key) followed by one aggregation on (user_id, session_id) —
  * partial-aggregated map-side. Value sums use exact integer cents.
  */
object Events {

  private def tsUs = expr("ts div 1000")

  /** Gap-based sessionization: a session breaks after `gapMinutes` of
    * user inactivity. Classic lag + cumulative-sum-of-breaks; the
    * in-partition order (ts, event_id) is total, so session ids are
    * deterministic.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .withColumn("is_new_session",
        when(col("ts_us") - lag("ts_us", 1).over(byUser) > gapUs, 1)
          .when(lag("ts_us", 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum("is_new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"),
        sum("value_cents").as("value_cents"))
  }

  /** Tumbling-window aggregation: fixed windows of `windowMinutes` by
    * event type. Integer bucket arithmetic (`div`) so any engine agrees
    * on window assignment exactly.
    */
  def windowAgg(events: DataFrame, windowMinutes: Int = 5): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    events
      .select(col("event_type"), tsUs.as("ts_us"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .withColumn("window_start_us", (col("ts_us") - (col("ts_us") % winUs)))
      .groupBy("window_start_us", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("value_cents").as("value_cents"))
  }
}
