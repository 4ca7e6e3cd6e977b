package graft

import org.apache.spark.sql.functions._

/** Micro-bench for the Aho-Corasick kernel vs the portable
  * replace-length spelling at production dictionary sizes. The
  * registered q_blocklist runs a 10-phrase demo dictionary where both
  * spellings are cheap; real blocklists are hundreds-to-thousands of
  * phrases, where the replace chain's per-phrase rescan is the cost.
  * Prints one JSON line with wall seconds for both spellings at
  * |dict| = SPARK_GRAFT_DICT (default 240) over SPARK_GRAFT_SF_DIR's
  * documents, min of 3 runs each, plus a row-count cross-check that
  * both spellings agree on every document.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.AcBench
  */
object AcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dictSize = sys.env.getOrElse("SPARK_GRAFT_DICT", "240").toInt
    val spark = GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // THE dictionary the registered q_blocklist_240 gates (first 240 of
    // the same generator) — shared source, so the bench can't silently
    // drift from what the oracle certifies
    val dict = graft.queries.TextQueries.blocklistDict(dictSize)
    val d = Tables(spark, sfDir, "documents").select(col("text"))
    d.write.format("noop").mode("overwrite").save() // warm the scan

    def occ(p: String) =
      ((length(col("text")) -
        length(replace(col("text"), lit(p), lit("")))) / lit(p.length))
        .cast("long")
    val replaceChain = d.select(
      aggregate(array(dict.map(occ): _*), lit(0L), _ + _).as("t"))
      .agg(sum(col("t")))
    val ac = d.select(
      aggregate(call_function("graft_multi_count", col("text"),
        lit(dict.mkString(","))), lit(0L), _ + _).as("t"))
      .agg(sum(col("t")))

    def time3(run: () => Long): (Double, Long) = {
      var best = Double.MaxValue
      var v = 0L
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        v = run()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, v)
    }
    val (tAc, vAc) = time3(() => ac.head().getLong(0))
    val (tRp, vRp) = time3(() => replaceChain.head().getLong(0))
    require(vAc == vRp, s"spellings disagree: $vAc vs $vRp")
    // per-DOCUMENT agreement (the grand total above could hide an
    // overcount on one doc cancelling an undercount on another)
    val perDocDiff = d.select(
      aggregate(array(dict.map(occ): _*), lit(0L), _ + _).as("rp"),
      aggregate(call_function("graft_multi_count", col("text"),
        lit(dict.mkString(","))), lit(0L), _ + _).as("ac"))
      .filter(col("rp") =!= col("ac")).count()
    require(perDocDiff == 0L, s"spellings disagree on $perDocDiff documents")
    println(f"""{"metric":"ac_bench","dict":$dictSize,"occurrences":$vAc,""" +
      f""""replace_chain_s":$tRp%.3f,"ac_kernel_s":$tAc%.3f,""" +
      f""""speedup":${tRp / tAc}%.2f}""")
    spark.stop()
  }
}
