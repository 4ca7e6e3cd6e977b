package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: the same rows must
  * round-trip losslessly through ORC (columnar twin), JSON lines and CSV
  * (the interchange formats a 100 TB ingest actually sees). Text formats
  * get an explicit read schema — schema-on-read inference is fine for
  * exploration but nondeterministic typing has no place in a pipeline.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  // props carries raw JSON (commas, quotes, braces) — the column that
  // actually exercises CSV quoting/escaping and JSON string nesting
  private lazy val base = Tables(spark, "/root/testdata/sf0.001", "events")
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
      col("props"),
      // serialize ts up front: micros-precision string is format-neutral
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))

  private lazy val want: Set[(Long, Long, String, Double, String, String)] =
    base.as[(Long, Long, String, Double, String, String)].collect().toSet

  private val readSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("ts_str", StringType)))

  private def roundTrip(fmt: String, options: Map[String, String] = Map.empty): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
    base.write.mode("overwrite").options(options).format(fmt).save(dir)
    val back = spark.read.schema(readSchema).options(options).format(fmt).load(dir)
      .as[(Long, Long, String, Double, String, String)].collect().toSet
    assert(back == want, s"$fmt round-trip diverged")
  }

  test("orc round-trips losslessly")  { roundTrip("orc") }
  test("json round-trips losslessly") { roundTrip("json") }
  test("csv round-trips losslessly")  { roundTrip("csv", Map("header" -> "true")) }

  test("schema evolution: mergeSchema widens old partitions with nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    // day-1 write has no `quality` column; day-2 adds it
    base.select(col("event_id"), col("event_type"))
      .write.parquet(s"$dir/day=1")
    base.select(col("event_id"), col("event_type"),
        (col("value") * 2).as("quality"))
      .write.parquet(s"$dir/day=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("event_id", "event_type", "quality", "day"))
    val rows = merged.groupBy(col("day"))
      .agg(sum(col("quality").isNull.cast("long")).as("n_null"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    val m = rows.map { case (d, nNull, n) => d -> (nNull, n) }.toMap
    assert(m(1)._1 == m(1)._2, "all day-1 rows must have null quality")
    assert(m(2)._1 == 0L, "no day-2 row may have null quality")
  }

  test("malformed records: PERMISSIVE quarantines, DROPMALFORMED drops, FAILFAST throws") {
    // The ingest reality at 100 TB: some fraction of source records are
    // garbage, and the mode decides whether a job quarantines, skips, or
    // aborts. PERMISSIVE (default) must capture the raw line in the
    // _corrupt_record column so bad rows are auditable, not silently null.
    val dir = java.nio.file.Files.createTempDirectory("graft_bad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.json"),
      java.util.Arrays.asList(
        """{"id": 1, "v": "ok"}""",
        """{"id": oops not json""",
        """{"id": 3, "v": "fine"}"""))
    val schema = "id LONG, v STRING, _corrupt_record STRING"
    val perm = spark.read.schema(schema).json(dir)
      .select("id", "v", "_corrupt_record").collect()
    assert(perm.length == 3)
    val bad = perm.filter(!_.isNullAt(2))
    assert(bad.length == 1 && bad.head.getString(2).contains("oops"))
    val dropped = spark.read.schema("id LONG, v STRING")
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == 2)
    val err = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id LONG, v STRING")
        .option("mode", "FAILFAST").json(dir).collect()
    }
    assert(err.getMessage.toLowerCase.contains("malformed") ||
      Option(err.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("a format mix reads back into one union") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_mix_p").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_mix_j").toString
    val (half1, half2) =
      (base.filter(col("event_id") % 2 === 0), base.filter(col("event_id") % 2 === 1))
    half1.write.mode("overwrite").parquet(d1)
    half2.write.mode("overwrite").json(d2)
    val merged = spark.read.parquet(d1)
      .unionByName(spark.read.schema(readSchema).json(d2))
      .as[(Long, Long, String, Double, String, String)].collect().toSet
    assert(merged == want)
  }
}
