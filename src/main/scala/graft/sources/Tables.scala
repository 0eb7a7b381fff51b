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

  /** Inferred-schema cache, keyed by path (r16 optimization). Schema
    * inference reads a parquet footer through a 1-task Spark job; the
    * 354-key bench paid that job ~1000 times for the same few
    * immutable table files. This caches METADATA ONLY — every read
    * still lists and scans the parquet files at action time, so no
    * result or data is ever reused across invocations (a table's
    * CONTENT can change freely between reads; only a mid-process
    * schema change at the same path would be stale, which no flow
    * does: the generators write to fresh target dirs).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def parquet(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    tsToNanosLong(spark.read.schema(schema).parquet(path))
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    parquet(spark, s"$dir/$name.parquet")

  /** Restore the engine-wide `ts` contract: nanos-since-epoch as LONG.
    *
    * The generator historically wrote `events.ts` as TIMESTAMP(NANOS),
    * which Spark can only read via `nanosAsLong` — a long of nanos —
    * and every downstream consumer (`ts div 1000` → micros) is written
    * against that. Newer generations write TIMESTAMP(MICROS), which
    * Spark reads as a timestamp column instead; convert it back so both
    * generations are indistinguishable downstream. The NTZ branch casts
    * through a Cast pinned to UTC — NOT the session zone — so the
    * stored micros value round-trips bit-exactly under any session.
    */
  private def tsToNanosLong(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.graft.Bridge
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        val utc = Bridge.column(
          Cast(Bridge.expression(col("ts")), TimestampType, Some("UTC")))
        df.withColumn("ts", unix_micros(utc) * lit(1000L))
      case _ => df
    }
  }

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
