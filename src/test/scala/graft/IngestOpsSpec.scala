package graft

import graft.ops.IngestOps
import org.apache.spark.sql.functions._

/** Permissive-JSONL ingest semantics the DuckDB oracle cannot observe:
  * the quarantine capture holds the raw bytes of exactly the corrupted
  * lines, and schema-drifted lines (unknown extra field) parse clean
  * with their content intact rather than landing in quarantine.
  */
class IngestOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_spec").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .select("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ids picked so every population is present: 37|74 corrupt (74 is NOT
  // a multiple of 11 — corrupt-over-drift precedence is covered by 407
  // being out of range here and pinned by the rule order itself), 11|22
  // drifted, the rest plain
  private val docs = Seq(
    (11L, "drifted line one", "en", "web"),
    (22L, "drifted \"quoted\" text\nwith a newline", "de", "web"),
    (37L, "this line is corrupted away", "en", "crawl"),
    (74L, "also corrupted", "fr", "crawl"),
    (1L, "plain doc", "en", "web"),
    (2L, "another plain doc", "de", "books"))

  test("quarantine captures exactly the corrupted lines, raw") {
    val dir = writeDocs(docs)
    val parsed = IngestOps.readJsonlQuarantine(spark, IngestOps.ensureJsonl(spark, dir))
    val quarantined = parsed.filter(col("_corrupt_record").isNotNull)
    // all typed fields null on quarantined rows; raw line is the 10-byte
    // truncation, which always starts with the unclosed {"doc_id": prefix
    val rows = quarantined.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.isNullAt(0)))
    assert(rows.forall(_.isNullAt(3)))
    assert(rows.forall(r => r.getString(4) == """{"doc_id":"""))
  }

  test("schema-drifted lines parse clean with content intact") {
    val dir = writeDocs(docs)
    val parsed = IngestOps.readJsonlQuarantine(spark, IngestOps.ensureJsonl(spark, dir))
    val clean = parsed.filter(col("_corrupt_record").isNull)
    // count over a typed column, not count(): a corrupt-column-only
    // reference set is rejected by the JSON scan (see readJsonlQuarantine
    // scaladoc)
    assert(clean.select("doc_id").collect().length == 4)
    // the drifted rows are clean and byte-exact, including the embedded
    // newline and quotes that JSON escaping must round-trip
    val d22 = clean.filter(col("doc_id") === 22L).collect()
    assert(d22.length == 1)
    assert(d22(0).getString(3) == "drifted \"quoted\" text\nwith a newline")
    assert(d22(0).getString(1) == "de")
  }

  test("streaming ingest quarantines in-stream, content equal to the batch read") {
    val dir = writeDocs(docs)
    val path = IngestOps.ensureJsonl(spark, dir)
    val stream = IngestOps.readJsonlQuarantineStream(spark, path, maxFilesPerTrigger = 1)
      .groupBy(when(col("_corrupt_record").isNotNull, "quarantined")
        .otherwise("ok").as("status"))
      // count a typed column too — both to prove content parses and to
      // keep the scan off the corrupt-column-only restriction (see
      // readJsonlQuarantine scaladoc)
      .agg(count(lit(1)).as("n"), count(col("doc_id")).as("n_parsed"))
    val q = stream.writeStream.format("memory").queryName("ingest_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ingest_stream").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == Map("ok" -> ((4L, 4L)), "quarantined" -> ((2L, 0L))))
    } finally q.stop()
  }

  test("JSONL round-trip is byte-exact under adversarial unicode") {
    // the escaping surface a crawl corpus actually exercises: newlines
    // and carriage returns (line-framing hazards), quotes/backslashes,
    // U+2028/U+2029 (legal in JSON strings, line separators in JS),
    // control chars, astral-plane emoji (surrogate pairs), NUL, and a
    // BOM — every clean doc must come back identical
    val texts = Seq(
      "line\nbreak\r\nand\rlone CR",
      """quotes " and \ backslash and /slash""",
      "line sep \u2028 para sep \u2029 done",
      "ctrl \u0000 \u0001 \u001f tab\t bell\u0007",
      "emoji \ud83d\ude00\ud83e\udd16 and accented \u00e9\u00fc\u00f1",
      "\ufeffBOM-prefixed doc",
      "", // empty text
      " \t \n ") // whitespace-only
    val rows = texts.zipWithIndex.map { case (t, i) =>
      // ids chosen clean of both rules (no %37, no %11 multiples)
      ((i + 1).toLong, t, "xx", "prop")
    }
    val dir = writeDocs(rows)
    val parsed = IngestOps.readJsonlQuarantine(spark, IngestOps.ensureJsonl(spark, dir))
    // collect, not count(): count would prune doc_id away and trip the
    // corrupt-column-only restriction
    assert(parsed.filter(col("_corrupt_record").isNotNull)
      .select("doc_id").collect().isEmpty)
    val got = parsed.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { case (id, t, _, _) =>
      assert(got(id) == t, s"doc $id mangled: ${got(id).getBytes("UTF-8").toSeq}")
    }
  }

  test("graft_ingest TVF: all/clean/quarantine modes and argument validation") {
    val dir = writeDocs(docs)
    val path = IngestOps.ensureJsonl(spark, dir)
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql(s"SELECT doc_id FROM graft_ingest('$path')")
      .collect().length == 6)
    val clean = spark.sql(s"SELECT * FROM graft_ingest('$path', 'clean')")
    assert(!clean.columns.contains("_corrupt_record"))
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 11L, 22L))
    // quarantine keeps the full row (typed nulls + raw line) — see the
    // sqlBuilder doc for why the corrupt column can't stand alone
    val quar = spark.sql(
      s"SELECT doc_id, _corrupt_record FROM graft_ingest('$path', 'quarantine')")
      .collect()
    assert(quar.length == 2 && quar.forall(_.isNullAt(0)))
    assert(quar.forall(_.getString(1) == """{"doc_id":"""))
    val badMode = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_ingest('$path', 'bogus')").collect()
    }
    assert(badMode.getMessage.contains("mode must be"))
    val badArity = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_ingest('$path', 'all', 'extra')").collect()
    }
    assert(badArity.getMessage.contains("graft_ingest(path"))
  }

  test("a rewrite of the source dir regenerates the derived corpus") {
    val dir = writeDocs(docs)
    val first = IngestOps.ensureJsonl(spark, dir)
    // rewrite with different contents -> new tag -> new path
    Seq((5L, "fresh", "en", "web")).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val second = IngestOps.ensureJsonl(spark, dir)
    assert(first != second)
    assert(IngestOps.readJsonlQuarantine(spark, second).count() == 1)
  }
}
