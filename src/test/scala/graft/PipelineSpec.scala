package graft

import graft.MatchPipeline
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val puuid = "THE_PLAYER_PUUID"

  test("end-to-end run: scan -> fetch -> filter -> transform -> load, with metrics") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString + "/matches"
    val m = MatchPipeline.run(spark, puuid,
      queues = Seq(400, 450), idsPerQueue = 120, outPath = out)

    assert(m.fetched == 240) // 2 queues x 120 ids, distinct
    assert(m.ok == 240)      // fake fetcher always succeeds within retries
    assert(m.rejected == 0)
    assert(m.loaded == 240)

    val df = spark.read.parquet(out)
    // flattened schema: scalar cols + player struct flattened incl. nested champion
    val cols = df.columns.toSet
    assert(cols.contains("match_id") && cols.contains("game_date") &&
      cols.contains("player_puuid") && cols.contains("player_champion_name") &&
      cols.contains("player_champion_level"))
    // every row belongs to the queried player
    assert(df.filter(col("player_puuid") =!= puuid).count() == 0)
    // units fallback: both branches exercised by the fake's even/odd hash
    val units = df.select("game_duration_units").distinct().as[String].collect().toSet
    assert(units == Set("s", "ms"))
    // 's' rows have an end timestamp, 'ms' rows do not (utils/utils.py:130-147)
    assert(df.filter(col("game_duration_units") === "s" && col("game_end").isNull).count() == 0)
    assert(df.filter(col("game_duration_units") === "ms" && col("game_end").isNotNull).count() == 0)
  }

  test("transient failures are retried; permanent failures become typed error rows") {
    val flaky = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val base = MatchPipeline.fakeFetcher(puuid)
    val fetch: MatchPipeline.Fetcher = { id =>
      if (id.endsWith("1")) {
        // fails twice, then succeeds (within maxRetries=3)
        val n = flaky.merge(id, 1, (a, b) => a + b)
        if (n <= 2) (429, "slow down") else base(id)
      } else if (id.endsWith("2")) (404, "not found") // permanent
      else base(id)
    }
    val ids = spark.createDataset(Seq(
      "NA1_400_0000001", "NA1_400_0000002", "NA1_400_0000003")).repartition(1)
    val rs = MatchPipeline.fetchDetails(ids, fetch)
      .collect().map(r => r.match_id -> r).toMap

    assert(rs("NA1_400_0000001").status == 200) // retried to success
    assert(rs("NA1_400_0000002").status == 404) // typed error row, no crash
    assert(rs("NA1_400_0000002").error)
    assert(rs("NA1_400_0000003").status == 200)
  }

  test("documents not containing the player are skipped (reference logs+skips)") {
    val fetch: MatchPipeline.Fetcher = MatchPipeline.fakeFetcher("SOMEBODY_ELSE")
    val ids = spark.createDataset(Seq("NA1_430_0000007"))
    val rs = MatchPipeline.fetchDetails(ids, fetch).toDF()
    assert(MatchPipeline.transform(rs, puuid).count() == 0)
  }

  test("truncate-reload: a second run fully replaces the first") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe2").toString + "/m"
    MatchPipeline.run(spark, puuid, Seq(400), idsPerQueue = 50, outPath = out)
    val m2 = MatchPipeline.run(spark, puuid, Seq(430), idsPerQueue = 30, outPath = out)
    assert(m2.loaded == 30)
    assert(spark.read.parquet(out).count() == 30)
  }

  test("typed cogroup merges two keyed Datasets per key (clicks vs purchases)") {
    // the typed-Dataset escape hatch for per-key multi-input merge logic
    // that joins can't express cleanly (both sides as iterators, one
    // output shape); each side shuffles once on the key, same as a join
    val clicks = Seq((1L, "c1"), (1L, "c2"), (2L, "c3")).toDS()
    val buys = Seq((1L, 9.5), (3L, 5.0)).toDS()
    val out = clicks.groupByKey(_._1)
      .cogroup(buys.groupByKey(_._1)) { (user, cs, bs) =>
        val clicked = cs.size
        val spent = bs.map(_._2).sum
        Iterator((user, clicked, spent))
      }.collect().toSet
    // users present on either side appear exactly once, absent side empty
    assert(out == Set((1L, 2, 9.5), (2L, 1, 0.0), (3L, 0, 5.0)))
  }
}
