package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators. The batch forms double as the semantic spec for
  * the Structured Streaming versions in [[EventStreams]] (identical
  * aggregation logic; the streaming path adds watermark + state). */
object EventOps {

  /** Tumbling 1-hour windows per event type: (hour, event_type, n, total).
    * `total` rounded to 4 decimals — cross-engine sum order differs. */
  def hourlyWindow(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))

  /** Gap-based sessionization: a new session starts after `gapSec` of
    * inactivity. (user_id, n_sessions, n_events) */
  def sessionCounts(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev", lag(unix_micros(col("ts").cast("timestamp")), 1).over(byUser))
      .withColumn("newSess",
        when(col("prev").isNull ||
          unix_micros(col("ts").cast("timestamp")) - col("prev") > gapSec * 1000000L, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("newSess").as("n_sessions"), count(lit(1)).as("n_events"))
  }
}
