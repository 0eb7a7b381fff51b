package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the testdata layout (`<dir>/<name>.parquet`).
  *
  * `events.parquet` carries TIMESTAMP(NANOS) which Spark 4 rejects
  * unless `spark.sql.legacy.parquet.nanosAsLong` is set; we set it at
  * the read site (runtime-settable SQL conf) so the engine works under
  * ANY caller-provided session, and expose [[eventTs]] to convert the
  * resulting nanos-long back to a proper timestamp column.
  */
object Tables {

  def parquet(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    parquet(spark, s"$dir/$name.parquet")

  /** events.ts (nanos since epoch as long) → TimestampType (micros).
    * Integer `div`, NOT the Column `/` operator: `/` divides through
    * DOUBLE, and at ~1.7e18 nanos doubles are spaced 256 apart — the
    * truncated micros could land ±1 off the exact quotient.
    */
  def eventTs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_micros(call_function("div", c, lit(1000L)))
  }
}
