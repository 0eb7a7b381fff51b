package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

import graft.streaming.Sessionize
import graft.streaming.Sessionize.Event

/** Throwaway driver: exercises the streaming session/window operators
  * through the public API over a file-backed stream (verification aid;
  * not part of the library surface).
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val s = spark

    // events as a JSON file stream: three events for user 1 with a 40-min
    // gap after the first two, one event for user 7
    val dir = java.nio.file.Files.createTempDirectory("stream_demo").toString
    val src = s"$dir/in"
    new java.io.File(src).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/batch.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00.000Z","user_id":1,"event_type":"click","value":1.25}
        |{"event_id":2,"ts":"2024-01-01T00:10:00.000Z","user_id":1,"event_type":"view","value":2.50}
        |{"event_id":2,"ts":"2024-01-01T00:10:00.000Z","user_id":1,"event_type":"view","value":2.50}
        |{"event_id":3,"ts":"2024-01-01T00:50:00.000Z","user_id":1,"event_type":"click","value":4.00}
        |{"event_id":4,"ts":"2024-01-01T00:03:00.000Z","user_id":7,"event_type":"view","value":9.99}
        |""".stripMargin)

    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    val stream = spark.readStream.schema(schema).json(src)

    val dedup = Sessionize.dedupStream(stream)
    val q0 = dedup.writeStream.format("memory").queryName("demo_dedup")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q0.awaitTermination(120000)

    val sessions = Sessionize.sessions(stream.as[Event], gapMinutes = 30,
      timeout = GroupStateTimeout.NoTimeout())
    val q1 = sessions.writeStream.format("memory").queryName("demo_sessions")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)

    val windows = Sessionize.windowedCounts(stream, windowMinutes = 15)
    val q2 = windows.writeStream.format("memory").queryName("demo_windows")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)

    val sessWin = Sessionize.sessionWindows(stream, gapMinutes = 30)
    val q3 = sessWin.writeStream.format("memory").queryName("demo_session_windows")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(120000)

    println("=== streaming dedup (event_id 2 duplicated at source) ===")
    spark.table("demo_dedup").orderBy("event_id").select("event_id", "event_type").show(false)
    println("=== closed sessions (append mode; open sessions stay in state) ===")
    spark.table("demo_sessions").orderBy("user_id").show(false)
    println("=== windowed counts ===")
    spark.table("demo_windows").orderBy("window").show(false)
    println("=== session_window sessions ===")
    spark.table("demo_session_windows").orderBy("user_id", "session_start").show(false)
    spark.stop()
  }
}
