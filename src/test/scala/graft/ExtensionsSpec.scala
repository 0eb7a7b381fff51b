package graft

import org.apache.spark.sql.SparkSession

/** GraftSparkExtensions: functions injected via spark.sql.extensions
  * are SQL-callable in a session that never touched graft code.
  */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injection makes graft_qdot available in SQL") {
    spark // force the shared session (and its SparkContext) up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions exercises the same injection path the
      // spark.sql.extensions static conf uses; the conf itself is read
      // from the SparkContext at context creation, which the shared
      // test context predates
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate() // new session over the existing SparkContext
      val r = s2.sql("SELECT graft_qdot(array(2L, 3L), array(10L, 100L)) AS d")
        .collect().head.getLong(0)
      assert(r == 320L)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
