package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles builds word n-grams; short docs yield empty array") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.shingles(col("t"), 3).as("s"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq.empty)
  }

  test("chunks is total: empty string yields empty array, null stays null") {
    val df = Seq(Some("abcdefgh"), Some(""), None).toDF("t")
      .select(TextOps.chunks(col("t"), 3).as("c"))
    val rows = df.as[Option[Seq[String]]].collect()
    assert(rows(0).get == Seq("abc", "def", "gh"))
    assert(rows(1).get == Seq.empty)
    assert(rows(2).isEmpty)
  }

  test("bigrams/dupBigramFrac: empty->0.0, repeats counted, null stays null") {
    val df = Seq(Some("a b a b a"), Some("x"), None).toDF("t")
      .select(TextOps.bigrams(col("t")).as("bg"),
        TextOps.dupBigramFrac(col("t")).as("f"))
    val rows = df.collect()
    // "a b","b a","a b","b a" -> 4 bigrams, 2 distinct -> 0.5
    assert(rows(0).getSeq[String](0) == Seq("a b", "b a", "a b", "b a"))
    assert(rows(0).getDouble(1) == 0.5)
    assert(rows(1).getSeq[String](0).isEmpty && rows(1).getDouble(1) == 0.0)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("normText collapses whitespace and lowercases") {
    val got = Seq("  Hello   WORLD \t x ").toDF("t")
      .select(TextOps.normText(col("t"))).as[String].head()
    assert(got == "hello world x")
  }

  test("fingerprint equals md5-prefix of normalized text and is stable") {
    val got = Seq("The  Fox", "the fox").toDF("t")
      .select(TextOps.fingerprint(col("t"))).as[String].collect()
    assert(got(0) == got(1))
    assert(got(0).length == 16)
  }

  test("winnowing: copies share fingerprints, short/distinct docs behave") {
    val original = "the quick brown fox jumps over the lazy dog near the river bank today"
    val copier = "unrelated prefix text " + original.substring(10, 50) + " unrelated suffix"
    // no 5-char run in common with `original` (shared english fragments
    // like " over" would legitimately collide — that's the operator
    // working; e.g. "jumps over" vs "no overlapping" share " over")
    val unrelated = "qwjkz xvbnm plkgh gfdsa zxcvb mnbqw ertyu poiuy qazws edcrf"
    val df = Seq((1L, original), (2L, original), (3L, copier), (4L, unrelated), (5L, "tiny"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.winnowFingerprints(col("text")).as("fps"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

    assert(fps(1L) == fps(2L))                      // identical docs, identical sets
    assert((fps(1L) intersect fps(3L)).nonEmpty)    // 40-char shared run >= w+k-1=12
    assert((fps(1L) intersect fps(4L)).isEmpty)     // no shared runs
    assert(fps(5L).isEmpty)                         // shorter than k
    assert(fps(1L).nonEmpty && fps(1L).size < original.length) // compressed sketch
  }

  test("langId picks marker-majority language, 'und' when no markers") {
    val df = Seq(
      "the cat is on the mat and the dog was here",
      "der hund und das kind ist nicht hier",
      "le chat et les chiens est une famille pas",
      "el gato los perros las casas una es como",
      "zzz qqq www").toDF("t")
      .select(TextOps.langId(col("t")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("langIdNgram classifies via char-trigram profiles, 'und' when nothing matches") {
    val df = Seq(
      "the cat is on the mat and the dog was here",
      "der hund und das kind ist nicht hier",
      "le chat et les chiens est une famille pas",
      "xq") // shorter than a trigram -> empty grams -> und
      .toDF("t")
      .select(TextOps.langIdNgram(col("t")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "fr", "und"))
  }

  test("native graft_shingles is byte-equal to the arrays_zip+transform spelling") {
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("t")).limit(300)
      .unionAll(Seq(
        "a b c d", "a b", "", "x  y  z", // double spaces -> empty tokens
        "one", "a b c").toDF("t"))
    for (n <- Seq(2, 3, 5)) {
      val r = texts.select(
        TextOps.shingles(col("t"), n).as("nat"),
        TextOps.shinglesHof(col("t"), n).as("hof")).collect()
      r.foreach(row => assert(row.getSeq[String](0) == row.getSeq[String](1),
        s"n=$n: $row"))
    }
    // null text -> empty array in both spellings
    val nr = Seq(Option.empty[String]).toDF("t").select(
      TextOps.shingles(col("t")).as("nat"),
      TextOps.shinglesHof(col("t")).as("hof")).head()
    assert(nr.getSeq[String](0).isEmpty && nr.getSeq[String](1).isEmpty)
    // codegen participation
    val plan = spark.range(10).select(col("id").cast("string").as("t"))
      .select(TextOps.shingles(col("t")).as("s"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[graft_shingles".r.findFirstIn(plan).isDefined, plan)
  }

  test("native graft_chunks is byte-equal to the transform spelling") {
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("t")).limit(200)
      .unionAll(Seq("", "abc", "abcd", "日本語のテキスト", "exact16charsxxxx")
        .toDF("t"))
    for (w <- Seq(1, 4, 16, 512)) {
      val r = texts.select(
        TextOps.chunks(col("t"), w).as("nat"),
        TextOps.chunksHof(col("t"), w).as("hof")).collect()
      r.foreach(row => assert(row.getSeq[String](0) == row.getSeq[String](1),
        s"w=$w: $row"))
    }
    val nr = Seq(Option.empty[String]).toDF("t")
      .select(TextOps.chunks(col("t"), 8).as("nat"),
        TextOps.chunksHof(col("t"), 8).as("hof")).head()
    assert(nr.isNullAt(0) && nr.isNullAt(1), "null stays null in both")
  }

  test("native graft_lang_ngram is bit-equal to the HOF spelling it replaced") {
    // real documents (every profile gram + none), mixed-language texts
    // (tie-break order), upper case (the lower() wrap), multi-byte chars
    // (char-indexed, not byte-indexed, n-gram windows), sub-trigram and
    // empty strings
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("t")).limit(300)
      .unionAll(Seq(
        "THE cat UND der hund", "le el le el", "schön größe straße",
        "ñañañaña", "xq", "", "und der ist le est el es the and")
        .toDF("t"))
    val r = texts.select(
      TextOps.langIdNgram(col("t")).as("nat"),
      TextOps.langIdNgramHof(col("t")).as("hof")).collect()
    r.foreach(row => assert(row.getString(0) == row.getString(1), row))
    // null text: the HOF form coerces to the no-score path -> "und"
    val nr = Seq(Option.empty[String]).toDF("t").select(
      TextOps.langIdNgram(col("t")).as("nat"),
      TextOps.langIdNgramHof(col("t")).as("hof")).head()
    assert(nr.getString(0) == "und" && nr.getString(1) == "und")
    // the kernel stays inside WholeStageCodegen (the point of the rewrite)
    val plan = spark.range(10).select(col("id").cast("string").as("t"))
      .select(TextOps.langIdNgram(col("t")).as("l"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[graft_lang_ngram".r.findFirstIn(plan).isDefined, plan)
  }

  test("quality score stays in [0,1] on real documents") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val mm = d.select(
      min(TextOps.qualityScore(col("text"))).as("lo"),
      max(TextOps.qualityScore(col("text"))).as("hi")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("tokenCountBpeIsh >= whitespace tokenCount on punctuated text") {
    val r = Seq("hello, world! it's a test.").toDF("t")
      .select(TextOps.tokenCount(col("t")).as("ws"),
        TextOps.tokenCountBpeIsh(col("t")).as("bpe")).head()
    assert(r.getLong(1) >= r.getLong(0))
  }
}
