package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression canary for the generator's timestamp-encoding drift: the
  * driver has shipped events.ts as TIMESTAMP(NANOS) (read as long under
  * nanosAsLong), as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
  * TimestampNTZType — the round-8 breakage), and re-materialized copies
  * carry plain TimestampType. `Tables.normalizeTs` must map all three to
  * the same TimestampType instant under the pinned UTC session zone.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val epochMicros = 1723575845000000L // 2024-08-13 18:24:05 UTC

  test("normalizeTs maps nanos-as-long, NTZ, and plain timestamps to one instant") {
    val plain = Seq(Tuple1(epochMicros)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val asLongNanos = Seq(Tuple1(epochMicros * 1000L)).toDF("ts") // NANOS read as long
    val asNtz = plain.select(col("ts").cast(TimestampNTZType).as("ts"))

    for (df <- Seq(plain, asLongNanos, asNtz)) {
      val out = Tables.normalizeTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      assert(out.select(unix_micros(col("ts"))).as[Long].head() == epochMicros)
    }
  }

  test("normalizeTs truncates sub-micro nanos like DuckDB epoch_us") {
    val nanos = Seq(Tuple1(epochMicros * 1000L + 999L)).toDF("ts")
    val out = Tables.normalizeTs(nanos)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == epochMicros)
  }
}
