package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY §2 (or a
  * north-star LLM-pipeline operator); [[oracleSql]] holds the DuckDB-equivalent
  * SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private def withGraft(spark: SparkSession): SparkSession = {
    // events.parquet carries TIMESTAMP(NANOS); read as Long (ns since epoch).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Graft.install(spark); spark
  }

  private def t(s: SparkSession, dir: String, name: String): Unit = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.createOrReplaceTempView(name)
  }

  /** Register the TPC-H-ish testdata tables + graft functions, run `sql`. */
  private def q(sql: String)(s: SparkSession, dir: String): DataFrame = {
    withGraft(s)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings").foreach(t(s, dir, _))
    s.sql(sql)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_gcd")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // #1/#2 scalar eval, native codegen tier
    "q_gcd" -> q(
      """SELECT l_orderkey, l_linenumber,
        |       gcd(CAST(l_partkey AS INT), CAST(l_suppkey AS INT)) AS g
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_gcd" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(gcd(CAST(l_partkey AS INT), CAST(l_suppkey AS INT)) AS INT) AS g
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
