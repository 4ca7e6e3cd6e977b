package graft

import org.apache.spark.sql.SparkSession

/** One-call session factory for the engine: native function registration
  * (graft_dot / graft_cosine / graft_simhash64 / graft_minhash /
  * graft_winnow via SparkSessionExtensions), UTC session time, AQE on,
  * and nanos-as-long parquet reads — the config every graft query
  * assumes. `shufflePartitions` should track cluster cores (the engine
  * never hardcodes 200).
  */
object GraftSession {
  def builder(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    // belt-and-braces: extensions only apply when this builder created the
    // context; an existing context predating it still needs the registry
    graft.functions.GraftFunctions.register(s)
    s
  }
}
