package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access per the driver contract (TESTDATA.md).
  *
  * All engine queries read the driver-generated star schema + events +
  * LLM-extension tables from a scale-factor directory. Reads are plain
  * `spark.read.parquet` so Catalyst gets vectorized scans, column pruning
  * and filter pushdown for free; at cluster scale the same call works on
  * any hadoop-compatible FS path.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
  * ([PARQUET_TYPE_ILLEGAL]); we read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-divide to a
  * microsecond timestamp — the same truncation DuckDB's `epoch_us` applies,
  * keeping oracle comparisons aligned.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // idempotent
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Re-materialized copies (ScaleSmoke's Nx events) already carry a
    // true TIMESTAMP ts — only the driver's raw TIMESTAMP(NANOS)-as-long
    // form needs the truncating cast.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
