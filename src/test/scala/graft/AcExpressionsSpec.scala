package graft

import graft.functions.AcKernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick kernel semantics (`graft_multi_count`): the classic
  * suffix-output cases, the overlap divergence from the replace-length
  * identity (and the borderless condition under which they agree —
  * load-bearing for q_blocklist's oracle), UTF-8 byte-matching safety,
  * and full parity with the portable spelling on the real corpus
  * through the registered SQL function (i.e. under codegen).
  */
class AcExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def count(phrases: Seq[String], text: String): Seq[Long] =
    new AcKernels.Automaton(phrases.map(_.getBytes("UTF-8")).toArray)
      .countAll(UTF8String.fromString(text)).toSeq

  test("classic AC: suffix phrases all fire (ushers)") {
    // 'she' ends at position 5, and 'he' + 'hers' fire via fail links
    assert(count(Seq("he", "she", "his", "hers"), "ushers") ==
      Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping occurrences counted; borderless phrases match replace counts") {
    // 'aa' has a proper border: AC counts every end position (2 in
    // 'aaa'), the replace identity counts non-overlapping scans (1) —
    // the documented divergence
    assert(count(Seq("aa"), "aaa") == Seq(2L))
    // a borderless phrase cannot self-overlap: counts agree by math,
    // not luck
    val occReplace = ("ab ab ab".length -
      "ab ab ab".replace("ab", "").length) / "ab".length
    assert(count(Seq("ab"), "ab ab ab") == Seq(occReplace.toLong))
  }

  test("UTF-8: multi-byte phrases match exactly; ASCII never fires inside them") {
    assert(count(Seq("héllo", "llo"), "héllo héllo") == Seq(2L, 2L))
    // 'é' is 0xC3 0xA9; a phrase equal to a continuation byte sequence
    // of another char can't occur for valid UTF-8 ASCII phrases
    assert(count(Seq("e"), "ééé") == Seq(0L))
  }

  test("empty text and no-match text yield zero vectors") {
    assert(count(Seq("x", "yz"), "") == Seq(0L, 0L))
    assert(count(Seq("x", "yz"), "abc abc") == Seq(0L, 0L))
  }

  test("registered function matches the replace-length identity on the real corpus") {
    val phrases = graft.queries.TextQueries.BlocklistPhrases
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    def occ(p: String) =
      ((length(col("text")) -
        length(replace(col("text"), lit(p), lit("")))) / lit(p.length))
        .cast("long")
    val both = d.select(
      call_function("graft_multi_count", col("text"),
        lit(phrases.mkString(","))).as("ac"),
      array(phrases.map(occ): _*).as("rp"))
    // elementwise equality over every document x phrase
    val bad = both.filter(col("ac") =!= col("rp")).count()
    assert(bad == 0L, s"$bad documents disagree")
    // and the plan stays codegen'd — the kernel is not a ScalaUDF
    val plan = both.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
