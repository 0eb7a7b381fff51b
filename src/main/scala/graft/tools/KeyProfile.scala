package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-JOB wall-clock profiler for a registry key (optimization-round
  * instrumentation, guide §1): runs `graft.SparkEntry.queries(key)`
  * under the bench's own session config and noop sink, with a
  * SparkListener recording every job's duration and call site. The
  * output answers "where do a multi-job key's seconds actually go" —
  * driver gaps (time between jobs: plan/codegen/driver math) fall out
  * as total − Σjob.
  *
  * Usage: KeyProfile <sfDir> <key> [reps]
  */
object KeyProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: KeyProfile <sfDir> <key> [reps]")
    val (sfDir, key) = (args(0), args(1))
    val reps = if (args.length >= 3) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.ArrayBuffer[(Int, String, Long)]()
    val starts = mutable.Map[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(si =>
          si.name.take(60) + s" [${js.stageInfos.size}st/" +
            js.stageInfos.map(_.numTasks).sum + "tk]").getOrElse("?")
        starts.synchronized { starts(js.jobId) = (site, js.time) }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(je.jobId).foreach { case (site, t0) =>
            jobs += ((je.jobId, site, je.time - t0))
          }
        }
    })
    val fn = graft.SparkEntry.queries(key)
    for (r <- 1 to reps) {
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(200) // let listener events drain
      val snap = jobs.synchronized(jobs.toList)
      val jobSum = snap.map(_._3).sum / 1e3
      println(f"== rep $r: total $dt%.3f s, ${snap.size} jobs, job-sum $jobSum%.3f s, driver-gap ${dt - jobSum}%.3f s")
      snap.groupBy(_._2).map { case (site, js) =>
        (site, js.size, js.map(_._3).sum / 1e3)
      }.toSeq.sortBy(-_._3).take(25).foreach { case (site, n, s) =>
        println(f"   $s%8.3f s  n=$n%-4d $site")
      }
    }
    spark.stop()
  }
}
