package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming contract of the SQL table-valued functions (the graft_asof
  * Merge-rejection pattern, extended to the whole TVF surface): every
  * TVF whose plan cannot run incrementally rejects a streaming input AT
  * ANALYSIS TIME with a typed message naming the streaming alternative;
  * graft_range's stream-static form (streaming left, static right)
  * actually RESOLVES and runs, because the bucket explode is stateless
  * and stream-static inner joins are supported.
  */
class TvfStreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def messages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  private def streamingDocs(): org.apache.spark.sql.DataFrame = {
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "alpha beta"), (2L, "alpha beta"))
    mem.toDF().toDF("doc_id", "text")
  }

  test("graft_dedup rejects a streaming table at analysis time") {
    streamingDocs().createOrReplaceTempView("tvf_stream_docs")
    val err = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_dedup('tvf_stream_docs', 'doc_id', 'text')")
    }
    assert(messages(err).exists(_.contains("ttlDedupStream")),
      messages(err).mkString(" | "))
  }

  test("graft_ann rejects a streaming queries or corpus table at analysis time") {
    val mem = MemoryStream[(Long, Seq[Double])]
    mem.addData((1L, Seq.fill(4)(0.5)))
    mem.toDF().toDF("vec_id", "embedding")
      .createOrReplaceTempView("tvf_stream_vecs")
    Seq((0L, Seq.fill(4)(0.25)), (1L, Seq.fill(4)(0.75)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("tvf_static_vecs")
    val errQ = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_ann('tvf_stream_vecs', 'tvf_static_vecs', '1')")
    }
    assert(messages(errQ).exists(m =>
      m.contains("lshCandidatesStream") && m.contains("queries table")),
      messages(errQ).mkString(" | "))
    val errC = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_ann('tvf_static_vecs', 'tvf_stream_vecs', '1')")
    }
    assert(messages(errC).exists(m =>
      m.contains("lshCandidatesStream") && m.contains("corpus table")),
      messages(errC).mkString(" | "))
  }

  test("graft_fuzzy rejects a streaming table at analysis time") {
    streamingDocs().createOrReplaceTempView("tvf_stream_fuzzy")
    val err = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_fuzzy('tvf_stream_fuzzy', 'doc_id', 'text', '2')")
    }
    assert(messages(err).exists(_.contains("not incrementally evaluable")),
      messages(err).mkString(" | "))
  }

  test("graft_range: streaming RIGHT rejected, streaming LEFT runs stream-static") {
    val mem = MemoryStream[(Long, Double)]
    mem.addData((1L, 10.0), (2L, 25.0), (3L, 100.0))
    val stream = mem.toDF().toDF("l_id", "l_val")
    stream.createOrReplaceTempView("tvf_stream_left")
    Seq((7L, 12.0), (8L, 95.0)).toDF("r_id", "r_val")
      .createOrReplaceTempView("tvf_static_right")

    // streaming right: unbounded replication — typed rejection
    val err = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_range('tvf_static_right', 'tvf_stream_left', 'r_val', 'l_val', '5.0')")
    }
    assert(messages(err).exists(_.contains("Swap the sides")),
      messages(err).mkString(" | "))

    // streaming left: resolves AND computes the right band matches
    val out = spark.sql(
      "SELECT l_id, r_id FROM graft_range('tvf_stream_left', 'tvf_static_right', 'l_val', 'r_val', '5.0')")
    val q = out.writeStream.format("memory").queryName("tvf_range_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tvf_range_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // |10-12|<=5 and |100-95|<=5 match; 25 matches nothing
      assert(rows == Seq((1L, 7L), (3L, 8L)))
    } finally q.stop()
  }

  test("graft_cdc rejects a streaming snapshot at analysis time") {
    streamingDocs().createOrReplaceTempView("tvf_cdc_stream")
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .createOrReplaceTempView("tvf_cdc_static")
    for ((p, c) <- Seq(("tvf_cdc_stream", "tvf_cdc_static"),
        ("tvf_cdc_static", "tvf_cdc_stream"))) {
      val err = intercept[Throwable] {
        spark.sql(s"SELECT * FROM graft_cdc('$p', '$c', 'doc_id')")
      }
      assert(messages(err).exists(_.contains("snapshot diff needs")),
        messages(err).mkString(" | "))
    }
  }

  test("graft_ann filter_sql is rejected for modes without stored attrs") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    e.filter(col("vec_id") < 3).createOrReplaceTempView("tvf_ann_fq")
    e.createOrReplaceTempView("tvf_ann_fc")
    val err = intercept[Throwable] {
      spark.sql("""SELECT * FROM graft_ann('tvf_ann_fq', 'tvf_ann_fc', '5',
        'brute', 'vec_id', 'embedding', 'label = 1')""")
    }
    assert(messages(err).exists(_.contains("no stored attrs")),
      messages(err).mkString(" | "))
  }

  test("graft_hh and graft_bloom reject streaming tables at analysis time") {
    streamingDocs().createOrReplaceTempView("tvf_stream_hh")
    val errH = intercept[Throwable] {
      spark.sql("SELECT * FROM graft_hh('tvf_stream_hh', 'text', '10')")
    }
    assert(messages(errH).exists(_.contains("heavyHittersStream")),
      messages(errH).mkString(" | "))
    val mem = MemoryStream[(Long, Long)]
    mem.addData((1L, 2L))
    mem.toDF().toDF("k", "v").createOrReplaceTempView("tvf_stream_bloom")
    Seq((1L, 2L)).toDF("k", "v").createOrReplaceTempView("tvf_static_bloom")
    Seq("('tvf_stream_bloom', 'tvf_static_bloom'",
        "('tvf_static_bloom', 'tvf_stream_bloom'").foreach { sides =>
      val err = intercept[Throwable] {
        spark.sql(s"SELECT * FROM graft_bloom$sides, 'k', 'k')")
      }
      assert(messages(err).exists(_.contains("graft_might_contain")),
        messages(err).mkString(" | "))
    }
  }

  test("graft_ann guaranteed_k: streaming queries rejected; nprobe gated to probing modes") {
    // the guaranteed-k mode ends in the same rank window + broadcast as
    // the rest of the tier — a streaming queries table must fail at
    // analysis time with the streaming alternative named
    val mem = MemoryStream[(Long, Seq[Double])]
    mem.addData((1L, Seq.fill(4)(0.5)))
    mem.toDF().toDF("vec_id", "embedding")
      .createOrReplaceTempView("tvf_stream_gk")
    val err = intercept[Throwable] {
      spark.sql("""SELECT * FROM graft_ann('tvf_stream_gk', '/nonexistent',
        '5', 'guaranteed_k')""")
    }
    assert(messages(err).exists(m =>
      m.contains("annTopKStream") && m.contains("queries table")),
      messages(err).mkString(" | "))
    // nprobe has no meaning without cells to probe
    Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 3).createOrReplaceTempView("tvf_ann_npq")
    val errN = intercept[Throwable] {
      spark.sql("""SELECT * FROM graft_ann('tvf_ann_npq', 'tvf_ann_npq',
        '5', 'brute', 'vec_id', 'embedding', '', '2')""")
    }
    assert(messages(errN).exists(_.contains("no probe width")),
      messages(errN).mkString(" | "))
  }
}
