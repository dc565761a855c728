package graft

/** The extensions installer (`spark.sql.extensions=graft.GraftExtensions`,
  * set on the shared test session) must make `unique_words_ratio` available
  * with no explicit registration call — the cluster-deployment path. */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions installs the native function surface") {
    val r = spark.sql("SELECT unique_words_ratio('a b a') AS r").head().getDouble(0)
    assert(math.abs(r - 2.0 / 3.0) < 1e-15)
  }
}
