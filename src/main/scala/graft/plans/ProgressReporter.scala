package graft.plans

import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** CLI progress parity with the reference's dask `ProgressBar()`
  * (upscale.py:23, upscale_streaming.py:125, recorded in the transcript
  * screenshots): a SparkListener that emits `[progress] ...%` lines as
  * stages complete tasks, throttled to one line per `stepPct` percent per
  * stage so an hours-long execute phase stays observable without flooding.
  *
  * Lines go through `onLine` (stderr for the CLI; a buffer in tests).
  * Listener events post asynchronously — callers that need the final
  * lines should detach via [[finish]] AFTER their action returns.
  */
final class ProgressReporter(onLine: String => Unit, stepPct: Int = 10) extends SparkListener {

  private final case class StageProgress(total: Int, done: AtomicLong, lastStep: AtomicLong)
  private val stages = new ConcurrentHashMap[Int, StageProgress]()
  private val totalDone = new AtomicLong(0)

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    val id = e.stageInfo.stageId
    stages.putIfAbsent(id, StageProgress(e.stageInfo.numTasks, new AtomicLong(0), new AtomicLong(-1)))
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val sp = stages.get(e.stageId)
    if (sp == null) return
    val done = sp.done.incrementAndGet()
    totalDone.incrementAndGet()
    val pct = (done * 100 / math.max(sp.total, 1)).toInt
    val step = pct / stepPct
    // one line per crossed step; racing tasks collapse via the CAS
    val prev = sp.lastStep.get()
    if (step > prev && sp.lastStep.compareAndSet(prev, step)) {
      onLine(f"[progress] stage ${e.stageId}%d: $done%d/${sp.total}%d tasks ($pct%d%%)")
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val sp = stages.get(e.stageInfo.stageId)
    if (sp != null) {
      onLine(s"[progress] stage ${e.stageInfo.stageId} completed " +
        s"(${sp.done.get()}/${sp.total} tasks, ${totalDone.get()} total)")
    }
  }
}

object ProgressReporter {

  /** Run `body` with a ProgressReporter attached; returns (result,
    * progress lines observed so far). Detaches the listener afterwards.
    */
  def withProgress[A](sc: org.apache.spark.SparkContext, onLine: String => Unit = null)(
      body: => A): (A, Seq[String]) = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sink: String => Unit = line => {
      buf.add(line)
      if (onLine != null) onLine(line)
    }
    val rep = new ProgressReporter(sink)
    sc.addSparkListener(rep)
    try {
      val result = body
      // listener events post asynchronously; give the bus a moment to
      // drain the final stage-completed lines before detaching
      val deadline = System.nanoTime() + 2_000_000_000L
      while (buf.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(100)
      (result, scala.jdk.CollectionConverters.IteratorHasAsScala(buf.iterator()).asScala.toSeq)
    } finally sc.removeSparkListener(rep)
  }
}
