package graft.cli

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.diff.ProgressLike

/** Thrown when the user aborts an interactive run with `q`. */
class AbortRequested extends RuntimeException("aborted by user (q)")

/** Interactive progress view — the experiential half of the reference's
  * `magiceye run` (tui.rs:61-252: a 16 ms ratatui frame loop over a
  * 5-step progress model, `q` to quit). Same 5-step model, terminal
  * semantics re-expressed for a Spark engine:
  *
  *   - one IN-PLACE line (`\r` + ANSI erase) redrawn by a ticker
  *     thread: spinner, step k/n, name, live Spark stage/task counts
  *     from the listener stream, elapsed time;
  *   - a reader thread watching stdin for `q` — on abort it cancels
  *     all running Spark jobs (the cluster analog of tui.rs dropping
  *     the runner) and the current step throws [[AbortRequested]];
  *   - frame period 100 ms, not 16 — a terminal redraw of one line
  *     needs no game-loop cadence, and each frame is a syscall.
  *
  * I/O is injected so specs can drive it headlessly; [[Tui.auto]]
  * picks this view only when stderr is a real console.
  */
class TuiProgress(
    spark: SparkSession,
    totalSteps: Int = 5,
    write: String => Unit = Console.err.print,
    input: () => Int = () => if (System.in.available() > 0) System.in.read() else -2,
    framePeriodMs: Long = 100L) extends ProgressLike {

  private val tasks = new AtomicLong(0)
  private val stages = new AtomicInteger(0)
  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
  }
  spark.sparkContext.addSparkListener(listener)

  private val aborted = new AtomicBoolean(false)
  private val closed = new AtomicBoolean(false)
  @volatile private var stepNo = 0
  @volatile private var stepName = ""
  @volatile private var stepStartNs = System.nanoTime()
  private val spinner = Array('|', '/', '-', '\\')
  private val frameNo = new AtomicLong(0)

  private def frame(): String = {
    val spin = spinner((frameNo.getAndIncrement() % 4).toInt)
    val secs = (System.nanoTime() - stepStartNs) / 1e9
    val done = "█" * math.min(stepNo, totalSteps)
    val todo = "░" * math.max(0, totalSteps - stepNo)
    f"\r[2K$spin [$stepNo/$totalSteps] $done$todo $stepName%-16s " +
      f"${stages.get()}%d stages ${tasks.get()}%d tasks ${secs}%.1f s  (q to abort)"
  }

  // a closed/broken stdin (e.g. `< /dev/null` then EOF, or a detached
  // pty) throws from available()/read(); that must not kill the ticker
  // — degrade to repaint-only (no q-abort) instead of silently freezing
  @volatile private var inputBroken = false
  private val ticker = new Thread(() => {
    while (!closed.get()) {
      try {
        if (stepNo > 0) write(frame())
        if (!inputBroken) input() match {
          case 'q' | 'Q' =>
            aborted.set(true)
            spark.sparkContext.cancelAllJobs()
          case _ => ()
        }
      } catch {
        case _: java.io.IOException => inputBroken = true
        case _: InterruptedException => () // spurious wake; keep ticking
      }
      Thread.sleep(framePeriodMs)
    }
  }, "graft-tui")
  ticker.setDaemon(true)
  ticker.start()

  override def step[T](name: String)(body: => T): T = {
    if (aborted.get()) throw new AbortRequested
    stepNo += 1
    stepName = name
    stepStartNs = System.nanoTime()
    write(frame())
    val result =
      try body
      catch {
        // a job cancelled by the q-handler surfaces as a SparkException;
        // report the abort, not the cancellation internals
        case _: Throwable if aborted.get() => throw new AbortRequested
      }
    if (aborted.get()) throw new AbortRequested
    result
  }

  override def close(): Unit = {
    if (closed.compareAndSet(false, true)) {
      write(frame())
      write("\n")
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}

object Tui {
  /** Plain log lines when not attached to a terminal (CI, pipes, the
    * driver), the in-place view when stderr is a console. `steps` is
    * the flow's actual step count (local diff runs 4, diff-jdbc 5) so
    * the bar ends full, never at [4/5] or past [n/n].
    */
  def auto(spark: SparkSession, interactive: Option[Boolean], steps: Int = 5): ProgressLike =
    if (interactive.getOrElse(System.console() != null)) new TuiProgress(spark, totalSteps = steps)
    else new graft.diff.Progress(spark)
}
