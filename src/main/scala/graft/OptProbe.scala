package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round profiler: times named sub-pipelines of the
  * expensive headline queries (each materialized through the noop sink,
  * k runs, min reported) so optimization work is attributed to the
  * stage that actually costs, not guessed from the whole-query number.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.OptProbe [probe...]"
  * Not part of the driver contract; a measurement tool only.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // extra conf toggles for A/B runs, e.g.
    // SPARK_GRAFT_PROBE_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false;..."
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k.trim, v.trim) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t =>
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save())

    // stage-level attribution: wall span and summed task time per stage
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, String)]()
    val verbose = sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages.add((si.stageId, wall,
          si.taskMetrics.executorRunTime, si.numTasks,
          si.name.split("\n")(0).take(60)))
      }
    })

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to runs).map { i =>
        stages.clear()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (verbose && i == runs) {
          import scala.jdk.CollectionConverters._
          val ss = stages.asScala.toSeq.sortBy(-_._2)
          println(f"[stages] $name: ${ss.size} stages, wall-sum=${ss.map(_._2).sum / 1e3}%.2f task-sum=${ss.map(_._3).sum / 1e3}%.2f")
          ss.take(12).foreach { case (id, w, rt, nt, n) =>
            println(f"[stages]   id=$id%-5d wall=${w / 1e3}%6.3f taskTime=${rt / 1e3}%7.3f ntasks=$nt%-4d $n")
          }
        }
        dt
      }
      println(f"[probe] $name%-46s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val docs = Tables(spark, sfDir, "documents")

    val probes: Map[String, () => Unit] = Map(
      "jaccard" -> { () =>
        import graft.operators.DedupOps
        time("groups-probe") {
          docs.select(col("doc_id").as("id"), md5(col("text")).as("__h"))
            .groupBy(col("__h"))
            .agg(min(col("id")).as("gid"), count(lit(1)).as("__n"))
        }
        time("shingle-hash-explode") {
          docs.select(col("doc_id").as("id"),
            explode(call_function("graft_shingle_hashes",
              graft.functions.TextOps.tokens(col("text")), lit(3), lit(42L))).as("sh"))
        }
        time("plain-pairs") {
          DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 0.05, 3, None)
        }
        time("connectivity-edges(full)") {
          DedupOps.ngramJaccardConnectivityEdges(docs, "doc_id", "text", 0.05, 3)
        }
        val edges = DedupOps.ngramJaccardConnectivityEdges(
          docs, "doc_id", "text", 0.05, 3).select("id_a", "id_b").localCheckpoint()
        time("cc-on-checkpointed-edges") {
          graft.operators.GraphOps.dupClusters(edges)
        }
        time("q_dup_clusters(full)") {
          SparkEntry.queries("q_dup_clusters")(spark, sfDir)
        }
      },
      "triangle" -> { () =>
        val li = Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        time("li-distinct") { li }
        time("pair-build") {
          li.as("x").join(li.as("y"), Seq("ok"))
            .filter(col("x.pk") < col("y.pk"))
            .select(col("x.pk").as("u"), col("y.pk").as("v"))
        }
        val pairs = li.as("x").join(li.as("y"), Seq("ok"))
          .filter(col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("u"), col("y.pk").as("v"))
        time("triangle-on-pairs") {
          graft.operators.GraphOps.triangleCount(pairs)
        }
        time("q_triangle_count(full)") {
          SparkEntry.queries("q_triangle_count")(spark, sfDir)
        }
      },
      "minhash" -> { () =>
        time("q_dedup_minhash(full)") {
          SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
        }
        time("q_minhash_est(full)") {
          SparkEntry.queries("q_minhash_est")(spark, sfDir)
        }
      },
      "ccpath" -> { () =>
        // iteration count on a 256-node path graph (worst-case chain)
        val chain = spark.range(255)
          .select(col("id").as("u"), (col("id") + 1).as("v"))
        time("cc-on-256-chain") {
          graft.operators.GraphOps.connectedComponents(chain)
        }
      },
      "fanout" -> { () =>
        import org.apache.spark.sql.types.{LongType, StringType}
        println(s"[probe] docs scan partitions = ${docs.rdd.getNumPartitions}")
        val orders = Tables(spark, sfDir, "orders")
        println(s"[probe] orders scan partitions = ${orders.rdd.getNumPartitions}")
        def md5Kernel(base: DataFrame): DataFrame = base
          .select(col("doc_id"),
            explode(array_distinct(graft.functions.TextOps.shingles(col("text"), 3))).as("sh"))
          .withColumn("g", explode(sequence(lit(0), lit(3))))
          .withColumn("m", md5(concat(col("g").cast(StringType), lit(":"), col("sh"))))
          .withColumn("slot", explode(sequence(lit(0), lit(3))))
          .withColumn("h",
            conv(expr("substring(m, slot * 8 + 1, 8)"), 16, 10).cast(LongType))
          .groupBy("doc_id").agg(min("h").as("h"))
        val dp = spark.sparkContext.defaultParallelism
        time("md5-kernel 1-task scan") { md5Kernel(docs) }
        time("md5-kernel repartitioned") {
          md5Kernel(docs.repartition(col("doc_id"))) }
        time("md5-kernel repart(n,col)") {
          md5Kernel(docs.repartition(dp, col("doc_id"))) }
        def bsKernel(base: DataFrame): DataFrame = base
          .withColumn("b", explode(sequence(lit(1), lit(40))))
          .withColumn("u", call_function("graft_md5_top32",
            concat(lit("bs:"), col("b").cast(StringType),
              lit(":"), col("o_orderkey").cast(StringType))))
          .groupBy("o_orderpriority").agg(sum("u").as("s"))
        time("bootstrap-kernel 1-task") { bsKernel(orders) }
        time("bootstrap-kernel repartitioned") {
          bsKernel(orders.repartition(col("o_orderkey"))) }
        time("bootstrap-kernel repart(n,col)") {
          bsKernel(orders.repartition(dp, col("o_orderkey"))) }
      },
      // whole-query timings for an arbitrary list:
      // sbt "runMain graft.OptProbe q:q_bootstrap,q_rerank"
      "misc" -> { () =>
        Seq("q_fuzzy_decontam", "q_bootstrap", "q_rerank", "q_containment",
          "q_setsim_prefix", "q_pagerank", "q_label_prop", "q_kcore",
          "q_interval_overlap", "q_gap_fill", "q_embed_cov", "q_bm25",
          "q_bpe_encode", "q_hybrid_rrf", "q_star_join", "q_dedup_simhash")
          .foreach(q => time(q) { SparkEntry.queries(q)(spark, sfDir) })
      })

    val sel = if (args.nonEmpty) args.toSeq else probes.keys.toSeq.sorted
    sel.foreach {
      case p if p.startsWith("q:") =>
        println(s"===== probe: $p =====")
        p.drop(2).split(",").map(_.trim).filter(_.nonEmpty).foreach(q =>
          time(q) { (SparkEntry.queries ++ SparkEntry.benchOnly)(q)(spark, sfDir) })
      case p =>
        println(s"===== probe: $p =====")
        probes(p)()
    }
    spark.stop()
  }
}
