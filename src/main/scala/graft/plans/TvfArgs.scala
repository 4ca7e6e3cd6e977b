package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared argument decoding for the SQL table-valued functions
  * (`graft_asof` / `graft_dedup` / `graft_ann` / `graft_fuzzy` /
  * `graft_range` / `graft_ingest`): every TVF takes foldable string
  * literals, evaluated at analysis time, with the TVF's own name in the
  * error. One definition so a change to literal evaluation (null
  * handling, message shape) cannot drift across the six builders.
  */
object TvfArgs {

  def strLit(fn: String, es: Seq[Expression])(i: Int, what: String): String = {
    val e = es(i)
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: $what must be a literal")
    Option(e.eval()).map(_.toString).getOrElse("")
  }
}
