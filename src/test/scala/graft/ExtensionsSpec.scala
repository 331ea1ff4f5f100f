package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native functions available to a FRESH
  * session with no library registration call executed first — the pure-SQL
  * user path. The test injects via `builder.withExtensions(new
  * GraftExtensions)`: the `spark.sql.extensions=graft.GraftExtensions`
  * config string invokes exactly this class through the same
  * SparkSessionExtensions hook, but the config is only read when the
  * SPARKCONTEXT is created, and the test JVM's context already exists —
  * withExtensions exercises the injector on a new session over the shared
  * context. Clears the active/default session so getOrCreate constructs a
  * new one, and restores the shared session afterwards. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injection registers every native function on a fresh session") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
      // fresh session, nothing registered imperatively: only the
      // extensions hook can resolve these
      val row = spark.sql(
        """SELECT dot_native(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                  cosine_native(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                  l2sq_native(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS l,
                  hamming_sign_native(array(1.0D, -2.0D), array(1.0D, 2.0D)) AS h,
                  char_ngrams_native('abcd', 3) AS g
        """).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 1.0)
      assert(row.getDouble(2) == 25.0)
      assert(row.getLong(3) == 1L)
      assert(row.getSeq[String](4) == Seq("abc", "bcd"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
