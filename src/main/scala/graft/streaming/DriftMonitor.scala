package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import graft.diff.{Diff, DiffOptions}
import graft.schema.SchemaSnapshot

/** Continuous schema-drift monitoring — the `Trigger`-driven
  * snapshot-watch mode SURVEY.md §1.4 reserves as an extension of the
  * reference's one-shot `magiceye run` (reference
  * `src/action/run/background.rs:8-66` runs once and exits).
  *
  * Contract: snapshot drops land as parquet files under `watchDir`,
  * each row one column of one table tagged with a `snapshot_id`
  * ([[dropSchema]] — the `columns` entity frame any catalog crawler can
  * export). Every micro-batch diffs each arriving snapshot against the
  * fixed base with the SAME engine as the batch path ([[Diff.diff]])
  * and appends the findings, tagged by snapshot, to `outDir`.
  *
  * Only the columns entity streams, so index/FK frames are emptied on
  * BOTH sides — a columns-only drop must never report spurious
  * index/FK drift. The per-batch `snapshot_id` collect is catalog
  * metadata (a few distinct ids), not data.
  *
  * Scale: each drop is KB-MB of metadata even for huge catalogs; the
  * diff DAG broadcasts the drop side against the cached base, so a
  * monitor watching thousands of databases is bounded by base-snapshot
  * size, not drop count. `foreachBatch` is at-least-once, so each
  * snapshot's findings are written by OVERWRITING its own
  * `snapshot_id=` partition directory — a replayed batch rewrites the
  * same bytes instead of appending duplicates, making the sink
  * effectively exactly-once per drop across restarts.
  */
object DriftMonitor {

  /** One streamed row = one column of one table in one snapshot:
    * [[graft.schema.ColumnMeta]] plus the `snapshot_id` tag.
    */
  val dropSchema: StructType = StructType(Seq(
    StructField("snapshot_id", StringType),
    StructField("table_name", StringType),
    StructField("column_name", StringType),
    StructField("ordinal", IntegerType),
    StructField("data_type", StringType),
    StructField("default_value", StringType),
    StructField("is_nullable", BooleanType),
    StructField("comment", StringType),
    StructField("is_auto_increment", BooleanType)))

  private def columnsOnly(s: SchemaSnapshot): SchemaSnapshot =
    s.copy(indexes = s.indexes.filter(lit(false)),
      foreignKeys = s.foreignKeys.filter(lit(false)))

  def watch(
      base: SchemaSnapshot,
      watchDir: String,
      outDir: String,
      checkpoint: String,
      opts: DiffOptions = DiffOptions())(
      implicit spark: SparkSession): StreamingQuery = {
    val fixedBase = columnsOnly(base).cached()
    spark.readStream.schema(dropSchema).parquet(watchDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // persisted: the batch feeds one distinct-id pass plus one
        // filtered pass per snapshot — without it each pass re-reads
        // the drop files (N+1 scans)
        val pinned = batch.persist()
        val ids = pinned.select("snapshot_id").distinct()
          .collect().map(_.getString(0)).sorted
        ids.foreach { id =>
          val cols = pinned.filter(col("snapshot_id") === id).drop("snapshot_id")
          val target = SchemaSnapshot(
            tables = cols.select(col("table_name")).distinct()
              .withColumn("table_comment", lit("")),
            columns = cols,
            indexes = fixedBase.indexes,
            foreignKeys = fixedBase.foreignKeys)
          // overwrite THIS snapshot's partition dir: idempotent under
          // foreachBatch's at-least-once replay (read the root with
          // partition discovery — snapshot_id comes from the dir name)
          Diff.diff(fixedBase, target, opts)
            .write.mode("overwrite").parquet(s"$outDir/snapshot_id=$id")
        }
        pinned.unpersist()
        ()
      }
      .start()
  }
}
