package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Corpus

/** Source/sink breadth: JSONL + CSV schema-explicit reads, partitioned
  * parquet layout with pruning visible in the scan.
  */
class SourcesSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  test("jsonl read with explicit schema; corrupt lines quarantine, not crash") {
    val f = Files.createTempFile("graft_docs", ".jsonl").toFile
    Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr"}
        |this line is not json
        |{"doc_id": 3, "text": "ciao", "lang": "it"}
        |""".stripMargin)
    val df = Corpus.readJsonl(spark, f.getPath, docSchema)
    val rows = df.where(col("doc_id").isNotNull).collect()
    assert(rows.length == 3) // corrupt line -> all-null row, filtered
    assert(df.schema == docSchema)
  }

  test("csv read with explicit schema and header") {
    val f = Files.createTempFile("graft_docs", ".csv").toFile
    Files.writeString(f.toPath,
      "doc_id,text,lang\n1,hello world,en\n2,bonjour,fr\n")
    val rows = Corpus.readCsv(spark, f.getPath, docSchema).orderBy("doc_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "en"), (2L, "fr")))
  }

  test("partitioned write prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toFile
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    Corpus.writePartitioned(docs, dir.getPath, Seq("lang"))
    // layout: lang=<value> directories
    assert(dir.listFiles().exists(_.getName.startsWith("lang=")))
    val read = spark.read.parquet(dir.getPath).where(col("lang") === "en")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    val full = docs.where(col("lang") === "en").count()
    assert(read.count() == full && full > 0)
  }
}
