package graft
import org.apache.spark.sql.functions._
object BktProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val native = graft.plans.NativeAsOfJoin.asOf(purchases, clicks, "user_id", "ts", Seq("click_id"))
      .select(col("user_id"), col("event_id"), col("value"), col("asof_click_id"))
    val composed = graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts", Seq("click_id"))
      .select(col("user_id"), col("event_id"), col("value"), col("asof_click_id"))
    println("native rows: " + native.count())
    println("composed rows: " + composed.count())
    println("sym diff: " + native.exceptAll(composed).union(composed.exceptAll(native)).count())
    native.explain("formatted")
    spark.stop()
  }
}
