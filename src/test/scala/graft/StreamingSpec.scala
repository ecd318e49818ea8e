package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming smoke: the windowed agg must produce the same totals as its
  * batch twin over the same rows (streams driven synchronously from a
  * parquet drop of converted events).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)

  lazy val stagingDir = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts_ts").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly agg matches batch over the same data") {
    val stream = EventStream.hourlyAgg(EventStream.readEvents(spark, stagingDir))
    EventStream.runToMemory(stream, "hourly", OutputMode.Append())
    val streamed = spark.table("hourly")
      .agg(sum("cnt")).head().getLong(0)
    // append-mode emits only watermark-closed windows; all windows close
    // because AvailableNow drains the source then advances the watermark
    val batch = spark.read.parquet(stagingDir).count()
    assert(streamed <= batch)
    assert(streamed > 0)
  }

  test("mapGroupsWithState user totals match batch groupBy") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, stagingDir).as[EventStream.Event]
    val q = EventStream.userTotals(events).writeStream
      .outputMode(OutputMode.Update()).format("memory").queryName("usertotals")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("usertotals")
      .groupBy("user_id").agg(max("n_events").as("n"))
    val expected = spark.read.parquet(stagingDir).groupBy("user_id").count()
    val joined = got.join(expected, "user_id")
      .filter(col("n") =!= col("count")).count()
    assert(joined == 0, "streaming per-user counts diverge from batch")
  }
}
