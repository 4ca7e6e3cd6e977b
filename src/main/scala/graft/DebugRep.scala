package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch: decompose q_repetition cost at Nx. DELETE BEFORE COMMIT. */
object DebugRep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_nx")
    val spark = GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables(spark, dir, "documents")
    d.write.format("noop").mode("overwrite").save()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("uni_only") {
      d.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast(LongType).as("n_tokens"),
          call_function("graft_max_run", sort_array(col("toks"))).as("top_c"))
        .write.format("noop").mode("overwrite").save()
    }
    time("bi_only") {
      d.select(col("doc_id"), TextOps.bigrams(col("text")).as("bg"))
        .select(col("doc_id"), size(col("bg")).cast(LongType).as("n_bigrams"),
          size(array_distinct(col("bg"))).cast(LongType).as("n_dist"))
        .write.format("noop").mode("overwrite").save()
    }
    // bigrams built FROM a materialized token array column (extra select
    // boundary; toks referenced >1x so CollapseProject keeps it)
    time("bi_from_toks") {
      d.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1), i =>
              concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1))))
            .otherwise(array().cast(ArrayType(StringType))).as("bg"))
        .select(col("doc_id"), size(col("bg")).cast(LongType).as("n_bigrams"),
          size(array_distinct(col("bg"))).cast(LongType).as("n_dist"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
