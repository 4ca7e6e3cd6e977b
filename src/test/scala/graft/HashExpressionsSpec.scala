package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Pins the value identities the md5 hash kernels (HashExpressions)
  * rely on — q_linear_quality's weight fold and q_bootstrap's uniform
  * draw were rewritten from the 8x `ascii(substring(md5(…)))` hex
  * decode to these kernels, and the DuckDB oracles still use the
  * decoded spelling, so the two forms MUST be bit-identical.
  */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def keys = Seq("", "a", "w:the", "bs:7:4242",
    "snow☃unicode", "longer key with spaces and 0123456789")
    .toDF("k")

  /** The original column-tree spelling: 16-adic integer of md5's first
    * 8 hex chars.
    */
  private def hexTop32(h: org.apache.spark.sql.Column) =
    (1 to 8).map { i =>
      val a = ascii(substring(h, i, 1))
      (a - when(a >= 97, 87).otherwise(48)).cast(LongType) *
        lit(1L << (4 * (8 - i)))
    }.reduce(_ + _)

  test("graft_md5_top32 == 16-adic decode of md5's first 8 hex chars") {
    val r = keys.select(
      call_function("graft_md5_top32", col("k")).as("nat"),
      hexTop32(md5(col("k"))).as("hex")).collect()
    r.foreach(row => assert(row.getLong(0) == row.getLong(1), row))
  }

  test("cast(top32)/2^32 is bit-identical to the 16-adic digit-sum uniform") {
    val h = md5(col("k"))
    val uSum = (1 to 8).map { i =>
      val a = ascii(substring(h, i, 1))
      (a - when(a >= 97, 87).otherwise(48)).cast(DoubleType) *
        lit(1.0 / math.pow(16.0, i))
    }.reduce(_ + _)
    val r = keys.select(
      (call_function("graft_md5_top32", col("k")).cast(DoubleType) /
        lit(4294967296.0)).as("nat"),
      uSum.as("sum")).collect()
    // exact ==, not approx: both spellings are V * 2^-32 with every
    // intermediate step exact in binary floating point
    r.foreach(row => assert(row.getDouble(0) == row.getDouble(1), row))
  }

  test("graft_weight_sum == the aggregate() HOF fold it replaced") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a", "", "x  y", // empty token between double spaces
      "repeated repeated repeated").toDF("text")
    def weight(t: org.apache.spark.sql.Column) = {
      val v = hexTop32(md5(concat(lit("w:"), t)))
      v % lit(2001L) - lit(1000L)
    }
    val toks = split(col("text"), " ")
    val r = texts.select(
      call_function("graft_weight_sum", toks).as("nat"),
      aggregate(toks, lit(0L), (acc, t) => acc + weight(t)).as("hof")).collect()
    r.foreach(row => assert(row.getLong(0) == row.getLong(1), row))
  }

  test("weight range is zero-centered: |weight| <= 1000 for a single token") {
    val r = spark.range(500)
      .select(call_function("graft_weight_sum",
        array(col("id").cast("string"))).as("w"))
      .agg(min(col("w")), max(col("w"))).head()
    assert(r.getLong(0) >= -1000L && r.getLong(1) <= 1000L, r)
  }

  test("null array -> null; null element poisons the sum (HOF acc+null parity)") {
    val df = Seq(
      (1L, Option(Seq[Option[String]](Some("a"), Some("b")))),
      (2L, Option(Seq[Option[String]](Some("a"), None))),
      (3L, Option.empty[Seq[Option[String]]]),
      (4L, Option(Seq.empty[Option[String]]))).toDF("id", "toks")
    val r = df.select(col("id"),
        call_function("graft_weight_sum", col("toks")).as("w"))
      .orderBy("id").collect()
    assert(!r(0).isNullAt(1))
    assert(r(1).isNullAt(1), "null element must null the sum")
    assert(r(2).isNullAt(1), "null array must be null")
    assert(!r(3).isNullAt(1) && r(3).getLong(1) == 0L, "empty array is 0")
  }

  test("both kernels participate in WholeStageCodegen (no fallback)") {
    val plan = spark.range(100)
      .select(array(col("id").cast("string")).as("toks"),
        col("id").cast("string").as("k"))
      .select(call_function("graft_weight_sum", col("toks")).as("w"),
        call_function("graft_md5_top32", col("k")).as("t"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[graft_weight_sum".r.findFirstIn(plan).isDefined, plan)
  }

  test("explicit prefix/mod arguments; non-literal mod rejected") {
    val r = Seq("tok").toDF("t")
      .select(call_function("graft_weight_sum", array(col("t")),
        lit("w:"), lit(2001L)).as("a"),
        call_function("graft_weight_sum", array(col("t"))).as("b")).head()
    assert(r.getLong(0) == r.getLong(1))
    val e = intercept[Exception] {
      Seq("tok").toDF("t")
        .select(call_function("graft_weight_sum", array(col("t")),
          lit("w:"), length(col("t")).cast(LongType)))
        .collect()
    }
    assert(e.getMessage.contains("constant literal"), e.getMessage)
  }
}
