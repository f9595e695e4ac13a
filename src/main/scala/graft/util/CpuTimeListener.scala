package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Accumulates executor CPU nanoseconds across all completed tasks.
  *
  * Wall-clock medians on a contended host can hide (or fake) a 2x plan
  * regression — the round-5 local artifact showed 14 s spreads on 1.7 s-median
  * queries from CPU-neighbor noise alone. Executor CPU time is immune to that:
  * a query that does the same work reports the same CPU nanos whether or not
  * the host was busy. Bench snapshots `totalNanos` around each query (after
  * draining the listener bus, see GraftSparkAccess) to attribute CPU per query.
  */
final class CpuTimeListener extends SparkListener {
  private val nanos = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) nanos.addAndGet(m.executorCpuTime)
  }

  def totalNanos: Long = nanos.get()
}
