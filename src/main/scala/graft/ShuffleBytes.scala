package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Runtime shuffle-VOLUME accounting: runs each selected query to
  * completion (noop sink) and reports measured input vs shuffle bytes
  * from stage metrics — the number the static shuffle COUNT snapshot
  * (ExplainSpec / ShuffleCounts) cannot see. The design claims in
  * SURVEY/PERF_NOTES are mostly of the form "the corpus crosses an
  * exchange at most once" / "only digests shuffle, never documents";
  * this main turns them into a measurable ratio:
  *
  *   shuffle_write / input < 1   ⇒ the shuffled representation is
  *                                 SMALLER than the scan (digests,
  *                                 partial aggregates) — the shape that
  *                                 survives a 1000x scale-up;
  *   shuffle_write ≈ k · input   ⇒ the corpus itself crosses k
  *                                 exchanges — worth a design review.
  *
  * Usage: SPARK_GRAFT_QUERIES=q_a,q_b runMain graft.ShuffleBytes
  * (defaults to SparkEntry.headline; SPARK_GRAFT_SF_DIR selects data).
  * Per query prints one line:
  *   BYTES <name> input=<b> shuffle_write=<b> shuffle_read=<b> ratio=<w/in>
  * AQE stays ON (production config) — runtime-coalesced exchanges are
  * exactly what a cluster would execute.
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Stage metrics accumulate across the query's jobs; reset per query.
    val agg = new java.util.concurrent.atomic.AtomicReference((0L, 0L, 0L))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) agg.updateAndGet { case (in, w, r) =>
          (in + m.inputMetrics.bytesRead,
            w + m.shuffleWriteMetrics.bytesWritten,
            r + m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    val selected = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.headline)
    selected.filter(SparkEntry.queries.contains).foreach { name =>
      agg.set((0L, 0L, 0L))
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        // listener events are posted async (the bus itself is
        // private[spark]); settle-poll until the counters stop moving
        var prev = agg.get()
        var settled = false
        while (!settled) {
          Thread.sleep(300)
          val cur = agg.get()
          if (cur == prev) settled = true else prev = cur
        }
        val (in, w, r) = agg.get()
        val ratio = if (in == 0) 0.0 else w.toDouble / in
        println(f"BYTES $name input=$in shuffle_write=$w shuffle_read=$r ratio=$ratio%.4f")
      } catch {
        case e: Throwable => println(s"BYTES $name FAILED ${e.getClass.getSimpleName}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
