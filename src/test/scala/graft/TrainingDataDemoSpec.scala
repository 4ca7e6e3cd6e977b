package graft

import org.apache.spark.sql.functions._

class TrainingDataDemoSpec extends SparkSpec {

  test("end-to-end training pipeline: monotone attrition, valid splits, readable layout") {
    val out = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val stats = TrainingDataDemo.run(spark, "/root/testdata/sf0.001", out).toMap

    // attrition is monotone through the funnel, starting at the ingest
    // front door: every line either parses or is quarantined, and the
    // %37 corruption rule puts a known floor under the quarantine
    assert(stats("lines_in") == stats("quarantined") + stats("docs_in"))
    assert(stats("quarantined") > 0)
    assert(stats("docs_in") >= stats("admitted"))
    assert(stats("admitted") >= stats("exact_deduped"))
    assert(stats("exact_deduped") >= stats("near_deduped"))
    assert(stats("near_deduped") >= stats("decontaminated"))
    assert(stats("decontaminated") == stats("docs_out"))
    assert(stats("docs_out") > 0 && stats("chunks") >= stats("docs_out"))
    assert(stats("train_chunks") <= stats("chunks"))

    // the layout partitions by split and round-trips
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("doc_id", "split", "chunk_idx", "chunk"))
    val splits = back.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "heldout")) && splits.contains("train"))
    assert(back.count() == stats("chunks"))
    // split is deterministic: re-deriving it from doc_id matches the layout
    val mismatched = back.withColumn("expect",
      when(graft.ops.CoreOps.hashSample(col("doc_id"), lit("d")), "train")
        .otherwise("heldout"))
      .filter(col("split") =!= col("expect"))
    assert(mismatched.isEmpty)
  }
}
