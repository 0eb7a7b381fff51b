package graft.tools

import org.apache.spark.sql.SparkSession

/** Size the production-depth BPE run: how many merges does the
  * batched trainer actually select per pass at (kBatch, window), how
  * long does a pass cost, and where does ≥1024 total merges land?
  * Usage: `runMain graft.tools.BpeDeepProbe [sfDir] [passes] [kBatch]
  * [window] [checkpointEvery]`.
  */
object BpeDeepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val passes = if (args.length > 1) args(1).toInt else 40
    val kBatch = if (args.length > 2) args(2).toInt else 32
    val window = if (args.length > 3) args(3).toInt else 128
    val ckpt = if (args.length > 4) args(4).toInt else 8
    val cc = if (args.length > 5) args(5).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val merges = graft.ext.TextAnalysis
      .bpeTrainMergesChunked(docs, passes, kBatch, window,
        chunkChars = cc, checkpointEvery = ckpt)
      .collect()
    val dt = (System.nanoTime() - t0) / 1e9
    val perPass = merges.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    val mn = if (perPass.nonEmpty) perPass.values.min else 0
    val mx = if (perPass.nonEmpty) perPass.values.max else 0
    println(f"""{"probe":"bpe_deep","sf":"$sfDir","passes":$passes,"kBatch":$kBatch,"window":$window,"ckptEvery":$ckpt,"chunkChars":$cc,"n_merges":${merges.length},"passes_run":${perPass.size},"sel_min":$mn,"sel_max":$mx,"sec":$dt%.1f,"merges_per_sec":${merges.length / dt}%.1f}""")
    spark.stop()
  }
}
