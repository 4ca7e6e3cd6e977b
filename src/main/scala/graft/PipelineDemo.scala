package graft

import org.apache.spark.sql.SparkSession

/** Runs the full reference pipeline (MatchPipeline.run) with the fake
  * fetcher and prints the stage metrics + a result sample.
  * Usage: runMain graft.PipelineDemo [outDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString + "/matches")
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = MatchPipeline.run(spark, puuid = "DEMO_PLAYER",
      queues = Seq(400, 430, 450), idsPerQueue = 1000, outPath = out)
    println(s"[pipeline] fetched=${m.fetched} ok=${m.ok} " +
      s"rejected=${m.rejected} loaded=${m.loaded} -> $out")
    spark.read.parquet(out)
      .select("match_id", "game_date", "game_duration_units",
        "player_puuid", "player_champion_name")
      .show(5, truncate = false)
    spark.stop()
  }
}
