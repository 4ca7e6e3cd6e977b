package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.IntegerType
object DbgIC {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val iv = Tables(spark, "/tmp/graft_scale_asof", "lineitem").select(
      col("l_suppkey"),
      to_date(col("l_shipdate")).as("st"),
      date_add(to_date(col("l_shipdate")), floor(col("l_quantity")).cast(IntegerType)).as("en"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("st"), col("en"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevMax = max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val r = iv.withColumn("new_island", when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(cum))
      .groupBy(col("l_suppkey"), col("island"))
      .agg(min(col("st")).as("ist"), max(col("en")).as("ien"), count(lit(1)).as("n"))
      .filter(col("l_suppkey") === 11)
      .orderBy("island")
    r.collect().foreach(x => println("ISL " + x))
    spark.stop()
  }
}
