package graft

/** JVM-wide one-shot trigger for the injected task failure. A top-level
  * object (not a spec field) so the task closure serializes without
  * dragging the suite instance along; local mode shares the JVM, so the
  * executor thread flips the same AtomicBoolean the test reads. */
object RetryInjector {
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
}

/** The bench's plan-shape fingerprint must be retry-immune (r13 verdict
  * #5): r13's tfidf_top_terms shuffle flag was a transient task-retry
  * double-count that needed a manual isolated re-run to adjudicate. */
class ShuffleMeterSpec extends SparkSpec {

  test("injected task retry does not inflate the shuffle-record " +
    "fingerprint — only successful attempts count") {
    val sc = spark.sparkContext
    val meter = ShuffleMeter.attach(spark)
    try {
      // repartition (no map-side combine, <=200 partitions) takes the
      // bypass shuffle writer, which increments recordsWritten per record
      // STREAMING — so a mid-iterator failure leaves a partial
      // recordsWritten in the failed attempt's reported metrics, the
      // exact shape that double-counted in r13. Injection fires once, on
      // the first attempt of the partition holding 1..2000, ~1998 records
      // into the write.
      def job(inject: Boolean): Unit = {
        sc.parallelize(1 to 8000, 4).map { x =>
          if (inject && x == 1999 &&
              RetryInjector.fired.compareAndSet(false, true))
            throw new RuntimeException("injected task failure (retried)")
          x
        }.repartition(4).count(): Unit
      }
      meter.reset()
      job(inject = false)
      val (_, clean) = meter.snapshot()
      assert(clean == 8000L,
        s"clean run must write each record exactly once, got $clean")

      RetryInjector.fired.set(false)
      meter.reset()
      job(inject = true)
      val (_, withRetry) = meter.snapshot()
      assert(RetryInjector.fired.get, "injection never fired")
      assert(withRetry == clean,
        s"retry inflated the fingerprint: $withRetry != $clean (the " +
          "failed attempt's partial write leaked into the window)")
    } finally meter.detach()
  }
}
