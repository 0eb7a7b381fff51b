package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `explain("formatted")` for registry keys to files — the
  * judge-facing plan evidence of the optimization rounds
  * (`plans/r16/<key>_{before,after}.txt`). Keys whose builder performs
  * eager work (index writes, Lloyd collects) pay it here too; the dump
  * is the UNEXECUTED plan of the returned frame (AQE initial), which
  * is what the plan-shape claims reference (Exchange count, join
  * strategy, expression forms).
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <keys,csv|all>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <keys,csv|all>")
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val keep: String => Boolean =
      if (args(3) == "all") _ => true
      else args(3).split(',').map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.filter(kv => keep(kv._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plan] $name ok")
        } catch { case e: Throwable =>
          println(s"[plan] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
