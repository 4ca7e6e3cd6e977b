package graft

import graft.functions.VectorOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(-4.0, 5.0, 0.5)),
    (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1))).toDF("a", "b")

  test("native graft_dot/graft_cosine are bit-identical to the HOF fold") {
    // keep the HOF side a REAL higher-order fold: RewriteHofDot would
    // otherwise rewrite it into the very kernel under test
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteHofDot")
    try testParity()
    finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  private def testParity(): Unit = {
    val r = vecs.select(
      VectorOps.dot(col("a"), col("b")).as("dn"),
      VectorOps.dotHof(col("a"), col("b")).as("dh"),
      VectorOps.cosine(col("a"), col("b")).as("cn"),
      (VectorOps.dotHof(col("a"), col("b")) /
        (sqrt(VectorOps.dotHof(col("a"), col("a"))) *
          sqrt(VectorOps.dotHof(col("b"), col("b"))))).as("ch")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1)) // exact, not approx
      assert(row.getDouble(2) == row.getDouble(3))
    }
  }

  test("null vector yields null, not a crash") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(VectorOps.dot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("expressions participate in WholeStageCodegen (no fallback)") {
    // range source (literal frames constant-fold to LocalTableScan, which
    // shows no codegen stage at all); arrays built with codegen-able
    // CreateArray, NOT transform() — higher-order functions are
    // CodegenFallback and would evict the whole Project from codegen.
    val df = spark.range(100).select(
      array((1 to 8).map(j => col("id") * j.toDouble): _*).as("a"),
      array((1 to 8).map(j => col("id") + j.toDouble): _*).as("b"))
    val plan = df.select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .queryExecution.executedPlan.toString
    // "*(n) Project" is the WholeStageCodegen marker in the simple form
    assert("\\*\\(\\d+\\) Project \\[graft_cosine".r.findFirstIn(plan).isDefined, plan)
  }

  test("graft_shingle_hashes: same distinct count and equality classes as string shingles") {
    import graft.functions.TextOps
    val df = Seq(
      (1L, "a b c d a b c"), // repeated shingles -> dedup
      (2L, "x y"), // shorter than n -> empty
      (3L, "a b c"), // shares "a b c" with doc 1
      (4L, "c b a")) // same tokens, different order -> no share
      .toDF("id", "text")
    val got = df.select(
      col("id"),
      call_function("graft_shingle_hashes", split(col("text"), " "), lit(3), lit(42L)).as("h"),
      array_distinct(TextOps.shingles(col("text"), 3)).as("s"))
      .select(col("id"), col("h"), size(col("h")).as("nh"), size(col("s")).as("ns"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1).toSet, r.getInt(2), r.getInt(3))).toMap
    // per-doc distinct counts match the string-shingle formulation
    got.foreach { case (id, (_, nh, ns)) => assert(nh == ns, s"doc $id: $nh != $ns") }
    // docs 1 and 3 share exactly one shingle ("a b c"); 4 shares none
    assert((got(1L)._1 intersect got(3L)._1).size == 1)
    assert((got(1L)._1 intersect got(4L)._1).isEmpty)
  }

  test("graft_punct_count matches the regexp_replace formulation exactly") {
    val df = Seq(
      "hello, world! 42",
      "éàü Ⅻ ² punct: ;—…",     // unicode letters, letter-number, other-number, dashes
      "tabs\tnewlines\nvtff\fcr\r",
      "", "no punct here 123")
      .toDF("s")
    val rows = df.select(
      call_function("graft_punct_count", col("s")).as("native"),
      length(regexp_replace(col("s"), "[\\p{L}\\p{N}\\s]", "")).cast("long").as("regex"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("graft_max_run equals explode+groupBy max frequency on sorted tokens") {
    val df = Seq("a b a b a c", "x", "same same same", "", "q w e r t y")
      .toDF("t").withColumn("id", monotonically_increasing_id())
    val native = df.select(col("id"),
      call_function("graft_max_run",
        sort_array(split(col("t"), " "))).as("m"))
      .as[(Long, Long)].collect().toMap
    val viaAgg = df.select(col("id"), explode(split(col("t"), " ")).as("tok"))
      .groupBy("id", "tok").count()
      .groupBy("id").agg(max("count").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(native == viaAgg)
    // empty string splits to [""] -> run of 1; truly null input -> null
    val r = spark.sql(
      """SELECT graft_max_run(CAST(NULL AS ARRAY<STRING>)) AS a,
                graft_max_run(CAST(array() AS ARRAY<STRING>)) AS b,
                graft_max_run(array('z', CAST(NULL AS STRING), CAST(NULL AS STRING))) AS c""")
      .head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 2L) // null elements form their own run
  }

  test("graft_ws_collapse matches regexp_replace(\\s+ -> space) exactly") {
    val df = Seq(
      "a  b\t\tc", "  lead and trail  ", "\t", "one space only",
      "mixed \t\n\f\r runs", "", "héllo nbsp stays") // NBSP is not Java \s
      .toDF("s")
    val rows = df.select(
      call_function("graft_ws_collapse", col("s")).as("native"),
      regexp_replace(col("s"), "\\s+", " ").as("regex"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("graft_nfc composes decomposed Unicode; identity (same buffer) on NFC text") {
    val composed = "caf\u00e9"    // e-acute as one codepoint
    val decomposed = "cafe\u0301" // e + combining acute
    val rows = Seq((composed, decomposed)).toDF("c", "d")
      .select(
        call_function("graft_nfc", col("c")).as("nc"),
        call_function("graft_nfc", col("d")).as("nd"))
      .head()
    assert(rows.getString(0) == composed)
    assert(rows.getString(1) == composed) // decomposed -> composed
    // the full canonical pipeline: both forms share one fingerprint
    val fps = Seq(composed, decomposed).toDF("text")
      .select(graft.functions.TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
    // null-safe from SQL
    assert(spark.sql("SELECT graft_nfc(CAST(NULL AS STRING)) AS n").head().isNullAt(0))
  }

  test("new native expressions are null-safe from SQL") {
    // null array element hashes like an empty string instead of NPEing
    val h = spark.sql(
      "SELECT graft_shingle_hashes(array('a', CAST(NULL AS STRING), 'b', 'c'), 3, 42) AS h")
      .head().getSeq[Long](0)
    assert(h.nonEmpty)
    // null inputs yield null, not crashes
    val r = spark.sql(
      """SELECT graft_count_in(CAST(NULL AS ARRAY<STRING>), 'a,b') AS a,
                graft_punct_count(CAST(NULL AS STRING)) AS b,
                graft_ws_collapse(CAST(NULL AS STRING)) AS c""").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("GraftExtensions registered the functions at session build (SQL name resolution)") {
    // the shared session is built with
    // spark.sql.extensions=graft.functions.GraftExtensions and never
    // calls GraftFunctions.register — resolution proves injection.
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
    val c = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(c == 1.0)
  }
}
