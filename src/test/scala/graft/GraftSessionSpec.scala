package graft

class GraftSessionSpec extends SparkSpec {

  test("GraftSession.local yields a session with functions + config wired") {
    spark // init shared context first (GraftSession reuses it)
    val s = GraftSession.local(2)
    try {
      assert(s.sql("SELECT graft_dot(array(2.0d), array(3.0d)) d").head().getDouble(0) == 6.0)
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    } finally {
      // don't stop: shared SparkContext belongs to the suite JVM
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
