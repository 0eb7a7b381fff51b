package graft.diff

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress accounting (reference D20: the mpsc-event + TUI pipeline,
  * run/background.rs + tui.rs). In a cluster engine the execution
  * progress signal is the SparkListener stream, not hand-counted loop
  * iterations — this adapter reports the reference's 5-step shape
  * (connect → base snapshot → target snapshot → check → report) as log
  * lines with per-step wall time and the Spark task/stage counts that
  * ran inside the step.
  */
/** Common surface of the progress reporters (plain listener logging
  * here, the interactive in-place view in [[graft.cli.TuiProgress]]).
  */
trait ProgressLike {
  def step[T](name: String)(body: => T): T
  def close(): Unit
}

class Progress(spark: SparkSession, out: String => Unit = Console.err.println)
    extends ProgressLike {

  private val tasks = new AtomicLong(0)
  private val stages = new AtomicInteger(0)
  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
  }
  spark.sparkContext.addSparkListener(listener)

  private var stepNo = 0

  /** Run `body` as one named pipeline step, logging reference-style
    * progress (background.rs sends a step event before/after each
    * phase).
    */
  def step[T](name: String)(body: => T): T = {
    stepNo += 1
    val t0 = System.nanoTime()
    val (tasks0, stages0) = (tasks.get(), stages.get())
    out(f"[graft] step $stepNo ($name) ...")
    val result = body
    out(f"[graft] step $stepNo ($name) done in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"(${stages.get() - stages0} stages, ${tasks.get() - tasks0} tasks)")
    result
  }

  def close(): Unit = spark.sparkContext.removeSparkListener(listener)
}
