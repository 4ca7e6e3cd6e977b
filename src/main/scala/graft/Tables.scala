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
  * `events.ts` has shipped in three parquet encodings across generator
  * versions, all normalized here to a session-zone `TimestampType` so
  * every downstream operator sees one type:
  *   - TIMESTAMP(NANOS): Spark's reader rejects it
  *     ([PARQUET_TYPE_ILLEGAL]); read nanos as long
  *     (`spark.sql.legacy.parquet.nanosAsLong`), floor-divide to micros —
  *     the same truncation DuckDB's `epoch_us` applies;
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
  *     `TimestampNTZType`; cast to `TimestampType` — under the pinned UTC
  *     session zone the instant equals DuckDB's naive-timestamp reading
  *     bit-for-bit, keeping oracle comparisons aligned;
  *   - TIMESTAMP(MICROS, UTC-adjusted): already `TimestampType`, pass
  *     through (ScaleSmoke's re-materialized Nx copies).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize a `ts` column to `TimestampType` whatever physical form the
    * parquet writer chose (see object doc). Shared with the streaming
    * reader so batch and stream transforms stay identical.
    */
  def normalizeTs(df: DataFrame, ts: String = "ts"): DataFrame =
    df.schema(ts).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(ts, timestamp_micros(expr(s"$ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(ts, col(ts).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // idempotent
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }
}
