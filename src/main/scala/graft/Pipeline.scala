package graft

import graft.ops.CoreOps
import org.apache.spark.sql.{DataFrame, Dataset, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference application, end-to-end, as one declarative Spark job
  * (zwilson999/lol_data_pipeline `pipeline.py` `main()`, SURVEY.md §3.1):
  *
  *   id scan (graft.sources.MatchIdsSource, queue pushdown)
  *     → distinct ids (matches.py:46-48 — *intended* semantics; the
  *       reference computes the set then returns the pre-dedup list)
  *     → throttled per-partition detail fetch with bounded retry and
  *       TYPED error rows (pipeline.py:49-80; the reference's non-429
  *       error path yields None rows that would crash its own filter)
  *     → status == 200 filter with observed reject count (pipeline.py:45-46)
  *     → nested-document transform (utils/utils.py:78-153): projection,
  *       conditional units fallback, participant array lookup, flatten
  *     → truncate-and-load sink (db.py:23-38) with observed row counts.
  *
  * Metrics that the reference printed as log lines are Spark
  * `Observation`s — computed inside the job, no extra pass, cluster-safe.
  *
  * The detail "fetch" is a pluggable function; the default fabricates a
  * deterministic match document per ID (zero-egress container). An HTTP
  * client slots in without touching plan shape: the fetch runs inside
  * `mapPartitions`, so concurrency = partition count, and pacing/retry
  * stay executor-side (the asyncio-semaphore analog, pipeline.py:50).
  */
object MatchPipeline {

  /** Typed fetch result (reference Response record, utils/utils.py:15-23). */
  case class Response(match_id: String, status: Int, error: Boolean, payload: String)

  /** Riot match document schema — FIXTURES.md §2, reconstructed from the
    * reference's field accesses. gameEndTimestamp nullable: its absence
    * drives the units fallback (utils/utils.py:130-147).
    */
  val matchSchema: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("matchId", StringType),
      StructField("participants", ArrayType(StringType))))),
    StructField("info", StructType(Seq(
      StructField("gameCreation", LongType),
      StructField("gameDuration", LongType),
      StructField("gameStartTimestamp", LongType),
      StructField("gameEndTimestamp", LongType),
      StructField("gameId", LongType),
      StructField("gameMode", StringType),
      StructField("gameVersion", StringType),
      StructField("mapId", IntegerType),
      StructField("participants", ArrayType(StructType(Seq(
        StructField("puuid", StringType),
        StructField("win", BooleanType),
        StructField("kills", IntegerType),
        StructField("deaths", IntegerType),
        StructField("assists", IntegerType),
        StructField("champion", StructType(Seq(
          StructField("name", StringType),
          StructField("level", IntegerType)))))))))))))

  /** One fetch attempt: deterministic fake document, or a transient/
    * permanent failure for planted IDs (tests). Replace with HTTP.
    */
  type Fetcher = String => (Int, String)

  /** Deterministic fake: 10 participants; the queried player is placed by
    * id hash; pre-2021 matches (even hash) omit gameEndTimestamp, which
    * exercises the units fallback. ~every 13th id returns 503 once.
    */
  def fakeFetcher(puuid: String): Fetcher = { id =>
    val h = math.abs(id.hashCode.toLong)
    val slot = (h % 10).toInt
    val players = (0 until 10)
      .map(i => if (i == slot) puuid else s"PUUID_${h % 997}_$i")
    val hasEnd = h % 2 == 1
    val start = 1600000000000L + (h % 100000000L)
    val endField =
      if (hasEnd) s""""gameEndTimestamp": ${start + 1800000L},""" else ""
    val parts = players.zipWithIndex.map { case (p, i) =>
      s"""{"puuid": "$p", "win": ${i % 2 == 0}, "kills": ${(h + i) % 20},
         |"deaths": ${(h + i) % 11}, "assists": ${(h + i) % 25},
         |"champion": {"name": "champ_${(h + i) % 160}", "level": ${1 + ((h + i) % 18).toInt}}}""".stripMargin
    }.mkString(",")
    val doc =
      s"""{"metadata": {"matchId": "$id", "participants": [${players.map(p => s""""$p"""").mkString(",")}]},
         |"info": {"gameCreation": $start, "gameDuration": ${if (hasEnd) 1800 else 1800000L},
         |"gameStartTimestamp": $start, $endField
         |"gameId": ${h % 10000000L}, "gameMode": "CLASSIC", "gameVersion": "12.5.1",
         |"mapId": 11, "participants": [$parts]}}""".stripMargin
    (200, doc)
  }

  /** Executor-side fetch with bounded retry + pacing — the scalable form
    * of the reference's semaphore + sleep + recursive-retry loop
    * (pipeline.py:49-80, matches.py:38-40, both retry paths buggy there;
    * here: bounded attempts, typed failure rows, no recursion).
    */
  def fetchDetails(
      ids: Dataset[String], fetch: Fetcher,
      maxRetries: Int = 3, pauseMs: Long = 0L): Dataset[Response] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { part =>
      part.map { id =>
        var attempt = 0
        var result: Response = null
        while (result == null) {
          val (status, body) =
            try fetch(id)
            catch { case e: Exception => (599, e.getMessage) }
          if (status == 200)
            result = Response(id, 200, error = false, body)
          else if (attempt >= maxRetries)
            result = Response(id, status, error = true, body)
          else {
            attempt += 1
            if (pauseMs > 0) Thread.sleep(pauseMs * attempt) // linear backoff
          }
        }
        if (pauseMs > 0) Thread.sleep(pauseMs)
        result
      }
    }
  }

  /** The per-document transform (utils/utils.py:78-153), declaratively:
    * nested projection + ms→date (F1) + units fallback (P5) + participant
    * array lookup (J1) + struct flatten (F2, intended semantics).
    */
  def transform(responses: DataFrame, puuid: String): DataFrame = {
    val parsed = responses
      .withColumn("doc", from_json(col("payload"), matchSchema))
    val pos = array_position(col("doc.metadata.participants"), puuid)
    val me = element_at(col("doc.info.participants"), pos.cast(IntegerType))
    val projected = parsed
      .filter(pos > 0) // reference logs+skips when player absent (utils/utils.py:100-102)
      .select(
        col("doc.metadata.matchId").as("match_id"),
        CoreOps.msToDate(col("doc.info.gameCreation")).as("game_date"),
        col("doc.info.gameCreation").as("game_creation"),
        col("doc.info.gameDuration").as("game_duration"),
        when(col("doc.info.gameEndTimestamp").isNotNull, lit("s"))
          .otherwise(lit("ms")).as("game_duration_units"),
        col("doc.info.gameEndTimestamp").as("game_end"),
        col("doc.info.gameId").as("game_id"),
        col("doc.info.gameMode").as("game_mode"),
        col("doc.info.gameVersion").as("game_version"),
        col("doc.info.mapId").as("map_id"),
        me.as("player"))
    CoreOps.flattenStruct(projected)
  }

  case class Metrics(fetched: Long, ok: Long, rejected: Long, loaded: Long)

  /** Full run. Returns the loaded row count metrics (the counts the
    * reference logs at pipeline.py:42,46 and db.py:34,38).
    */
  def run(
      spark: SparkSession, puuid: String, queues: Seq[Int], idsPerQueue: Int,
      outPath: String, fetch: Fetcher = null, fetchPartitions: Int = 8): Metrics = {
    import spark.implicits._
    val f = Option(fetch).getOrElse(fakeFetcher(puuid))

    val ids = spark.read.format("graft.sources.MatchIdsSource")
      .option("queues", queues.mkString(","))
      .option("idsPerQueue", idsPerQueue)
      .load()
      .filter(col("queue").isin(queues.map(Integer.valueOf): _*)) // pushed
      .select("match_id").as[String]
      .distinct() // intended A1 semantics
      .repartition(fetchPartitions) // fetch fan-out = task parallelism

    val obs = new Observation("fetch_stats")
    val responses = fetchDetails(ids, f).toDF()
      .observe(obs,
        count(lit(1)).as("fetched"),
        sum(when(col("status") === 200, 1L).otherwise(0L)).as("ok"))
    val okRows = CoreOps.statusFilter(responses)

    val flat = transform(okRows, puuid).dropDuplicates("match_id")
    CoreOps.truncateLoad(flat, outPath)

    val loaded = spark.read.parquet(outPath).count()
    val fetched = obs.get("fetched").asInstanceOf[Long]
    val ok = obs.get("ok").asInstanceOf[Long]
    Metrics(fetched, ok, fetched - ok, loaded)
  }
}
