package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation over a stream (Structured Streaming
 * surface beyond the reference, which has no event-time semantics —
 * its "streaming" is PartialFit accretion). Works identically on a
 * batch or streaming DataFrame; with a streaming source add
 * `withWatermark` upstream (late data beyond the watermark is dropped
 * and state is bounded — the scale requirement for infinite streams).
 */
object EventWindows {

  /** Tumbling-window counts/extrema per event type.
    * @param df (streaming) frame with ts: timestamp, event_type, value */
  def tumbling(df: DataFrame, every: String = "1 hour",
               watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(df)(w => df.withWatermark("ts", w))
    in.groupBy(window(col("ts"), every), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 6).as("min_v"),
        round(max(col("value")), 6).as("max_v"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("min_v"), col("max_v"))
  }
}
