package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Sums shuffle WRITE bytes/records across all tasks between `reset()`
  * and `snapshot()` — the bench-side plan-shape signal. Wall time on a
  * multi-tenant box is noisy; the bytes a query shuffles are a pure
  * function of (data, plan) and reproduce to the byte run over run, so a
  * regression in them means the PLAN changed (new exchange, lost
  * broadcast, wider row), never "the box was busy".
  *
  * Write side only: every exchange is written exactly once but may be
  * read by several downstream stages (or re-read under AQE stage retry),
  * so the write side is the stable one-number-per-exchange measure.
  *
  * Task-end events arrive on the async listener bus; both `reset` and
  * `snapshot` first drain the bus (`LiveListenerBus.waitUntilEmpty`, via
  * reflection — public in bytecode but `private[spark]` to scalac) so the
  * window is exact: whatever ran strictly between the two calls.
  */
final class ShuffleMeter private (spark: SparkSession) extends SparkListener {
  private val writeBytes = new AtomicLong
  private val writeRecords = new AtomicLong

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      writeRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
    }
  }

  def reset(): Unit = {
    drain()
    writeBytes.set(0L)
    writeRecords.set(0L)
  }

  /** (shuffle bytes written, shuffle records written) since `reset()`. */
  def snapshot(): (Long, Long) = {
    drain()
    (writeBytes.get, writeRecords.get)
  }

  def detach(): Unit = spark.sparkContext.removeSparkListener(this)

  private def drain(): Unit = {
    val sc = spark.sparkContext
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch {
      // a saturated bus times out after 10 s — proceed with whatever has
      // been delivered rather than failing the measurement run
      case _: ReflectiveOperationException =>
    }
  }
}

object ShuffleMeter {
  def attach(spark: SparkSession): ShuffleMeter = {
    val m = new ShuffleMeter(spark)
    spark.sparkContext.addSparkListener(m)
    m
  }
}
