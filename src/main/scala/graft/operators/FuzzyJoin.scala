package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Edit-distance self-join with LOSSLESS pigeonhole blocking (PassJoin —
  * Li, Deng, Feng, "PASS-JOIN: a partition-based method for similarity
  * joins", 2011): partition each right-side string into d+1 contiguous
  * segments — d edit operations can touch at most d of them, so any pair
  * within edit distance d shares at least one segment VERBATIM as a
  * substring of the left side. Candidates therefore come from an
  * equi-join on segment text (the shuffle key), never an all-pairs
  * product, and the trailing Levenshtein verify makes the result EXACTLY
  * the naive cross-join answer (`FuzzyJoinSpec` property-tests the
  * equivalence on randomly edited strings).
  *
  * Strings shorter than d+1 characters can have every segment touched,
  * so the pigeonhole guarantee lapses for them; that class is provably
  * tiny relative to its match fan-out (edit distance <= d admits almost
  * anything) and is handled by a broadcast nested-loop branch instead.
  *
  * Pruning power scales with segment length ~ len/(d+1): production
  * thresholds (d << len) give long, selective segments; a loose
  * threshold (d close to len) degrades toward all-pairs through 1-2 char
  * segments — but the plan SHAPE stays the scalable equi-join either
  * way, with no CartesianProduct node (`ExplainSpec` gates this).
  */
object FuzzyJoin {

  /** Unordered pairs (id_a < id_b) of rows whose `strCol` values are
    * within Levenshtein distance `d`, with the distance. One segment
    * equi-join + one dedup + the verify — no all-pairs node.
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String, d: Int): DataFrame = {
    require(d >= 0, s"negative edit-distance threshold $d")
    val parts = d + 1
    val a = df.select(col(idCol).as("id_a"), col(strCol).as("p_a"))
    val b = df.select(col(idCol).as("id_b"), col(strCol).as("p_b"))
    // right side: the d+1 contiguous segments of each string (segment i
    // spans floor(i*len/parts)+1 .. floor((i+1)*len/parts))
    val len = length(col("p_b"))
    val segs = b.filter(len >= parts)
      .select(col("id_b"), col("p_b"),
        explode(transform(sequence(lit(0), lit(parts - 1)), i =>
          col("p_b").substr(
            floor(i * len / parts).cast(IntegerType) + 1,
            (floor((i + 1) * len / parts) - floor(i * len / parts)).cast(IntegerType))))
          .as("seg"))
    // left side: every substring of the lengths segments can take. A
    // matching right side is at most alen + d long (|len diff| <= d
    // forces dist > d otherwise), so its segments are at most
    // ceil((alen + d) / parts) chars — the data-driven upper bound on
    // the lengths worth generating (a longer segment cannot fit in p_a
    // anyway).
    val alen = length(col("p_a"))
    val subLens = sequence(lit(1),
      greatest(floor((alen + lit(d + parts - 1)) / parts).cast(IntegerType), lit(1)))
    val subs = a.select(col("id_a"), col("p_a"),
      explode(array_distinct(flatten(
        transform(subLens, l =>
          filter(
            transform(sequence(lit(1), alen), p => col("p_a").substr(p, l)),
            sub => length(sub) === l))))).as("sub"))
    val blocked = subs.join(segs, col("sub") === col("seg"))
      .select(col("id_a"), col("p_a"), col("id_b"), col("p_b"))
    // len <= d right-side strings: no pigeonhole guarantee — broadcast
    // the (tiny) class against everything
    val shortB = b.filter(len < parts)
    val shortCand = a.crossJoin(broadcast(shortB))
      .select(col("id_a"), col("p_a"), col("id_b"), col("p_b"))
    blocked.union(shortCand)
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist", levenshtein(col("p_a"), col("p_b")))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("id_b"), col("dist").cast(LongType).as("dist"))
  }

  /** SQL table-valued surface, registered as `graft_fuzzy` (same
    * injection path as `graft_asof` — see
    * [[graft.plans.NativeAsOfJoin.sqlBuilder]]):
    *
    * {{{
    * SELECT id_a, id_b, dist
    * FROM graft_fuzzy('docs_v', 'doc_id', 'prefix', '2')
    * }}}
    *
    * Unordered (id_a < id_b) within-table pairs at Levenshtein distance
    * <= d, planned as the lossless pigeonhole blocking above — SQL
    * users get the segment equi-join shape, never an all-pairs node.
    */
  def sqlBuilder(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def lit(i: Int, what: String): String =
      graft.plans.TvfArgs.strLit("graft_fuzzy", es)(i, what)
    if (es.size != 4)
      throw new IllegalArgumentException(
        "graft_fuzzy(table, id_col, str_col, max_edit_distance)")
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.table(lit(0, "table name"))
    // analysis-time rejection, same pattern as graft_dedup/graft_ann:
    // the self-join + dedup shape is not incrementally evaluable
    if (df.isStreaming)
      throw new UnsupportedOperationException(
        "graft_fuzzy: the input table is a stream — the pigeonhole " +
          "self-join is not incrementally evaluable; dedup the stream " +
          "first (StreamingOps.ttlDedupStream) and run graft_fuzzy on " +
          "the stored batch output")
    editDistancePairs(df, lit(1, "id_col"), lit(2, "str_col"),
      lit(3, "max_edit_distance").toInt).queryExecution.analyzed
  }
}
