package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Corpus ingest/egress beyond parquet: JSON-lines and CSV readers with
  * EXPLICIT schemas, and a partition-laid-out writer.
  *
  * Explicit schemas are non-negotiable at scale: schema inference runs
  * an extra full scan of the input before the real job, and drifts
  * silently when a late file adds a field. With a `StructType` the read
  * is single-pass; under PERMISSIVE (the default) a corrupt line
  * becomes an ALL-NULL row rather than failing the pipeline — filter
  * on a required column (`isNotNull`) to drop them, or add a
  * `_corrupt_record` StringType field to the schema to capture the
  * raw line for quarantine routing.
  */
object Corpus {

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** Hive-style partitioned parquet layout (`col=value/` directories):
    * downstream reads filtering on the partition column prune entire
    * directories before any IO (partition pruning, visible as
    * `PartitionFilters` in the scan). Choose low-cardinality columns —
    * at 100 TB a (lang, source) layout gives thousands of partitions,
    * not millions of tiny files.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
