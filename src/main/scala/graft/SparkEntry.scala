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
    // §2.1 #1/#2: scalar eval, native codegen tier
    "q_gcd" -> q(
      """SELECT l_orderkey, l_linenumber,
        |       gcd(CAST(l_partkey AS INT), CAST(l_suppkey AS INT)) AS g
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) _,
    // §2.1 #6: error column — fallible fn yields struct<value,error> per row
    "q_div_error" -> q(
      """SELECT l_orderkey, l_linenumber, d.value AS div_value, d.error AS div_error
        |FROM (SELECT l_orderkey, l_linenumber,
        |             graft_div(CAST(l_partkey AS INT), CAST(l_suppkey % 7 AS INT)) AS d
        |      FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) _,
    // §2.1 #9: overload resolution (string vs binary length under one name)
    "q_length" -> q(
      """SELECT doc_id, graft_length(text) AS len_s, graft_length(CAST(text AS BINARY)) AS len_b
        |FROM documents ORDER BY doc_id""".stripMargin) _,
    // list return type
    "q_split" -> q(
      """SELECT doc_id, graft_split(text, ' ') AS words
        |FROM documents ORDER BY doc_id""".stripMargin) _,
    // list argument + higher-order composition with graft fns inside lambdas
    "q_array_sum" -> q(
      """SELECT doc_id, array_sum(transform(graft_split(text, ' '), x -> graft_length(x))) AS s
        |FROM documents ORDER BY doc_id""".stripMargin) _,
    // §2.1 #11: struct return (+ null struct on malformed input)
    "q_key_value" -> q(
      """SELECT l_orderkey, l_linenumber,
        |       key_value(concat(l_returnflag, '=', l_linestatus)) AS kv,
        |       key_value(l_returnflag) AS kv_null
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) _,
    // §2.1 #7: table function (setof) via LATERAL VIEW, lazy generator
    "q_range_setof" -> q(
      """SELECT l_orderkey, l_linenumber, t.value
        |FROM lineitem LATERAL VIEW range_setof(l_linenumber) t AS value
        |ORDER BY l_orderkey, l_linenumber, t.value""".stripMargin) _,
    // §2.1 #10: variadic function
    "q_variadic" -> q(
      """SELECT l_orderkey, l_linenumber,
        |       concat_sep('|', l_returnflag, l_linestatus, CAST(l_linenumber AS STRING)) AS c
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) _,
    // §2.1 #15: aggregate lifecycle (partial accumulate → merge → finish)
    "q_sum_udaf" -> q(
      """SELECT l_returnflag, sum_udaf(CAST(l_quantity AS INT)) AS s
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) _,
    "q_weighted_avg" -> q(
      """SELECT l_returnflag, weighted_avg(CAST(l_quantity AS INT), l_linenumber) AS wa
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) _,
    // §2.1 #17: opaque (pickle-analogue) aggregate state
    "q_median_udaf" -> q(
      """SELECT c_nationkey, median_udaf(c_acctbal) AS m
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_gcd" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(gcd(CAST(l_partkey AS INT), CAST(l_suppkey AS INT)) AS INT) AS g
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_div_error" ->
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_suppkey % 7 = 0 THEN NULL
        |            ELSE CAST(CAST(l_partkey AS INT) // CAST(l_suppkey % 7 AS INT) AS INT) END AS div_value,
        |       CASE WHEN l_suppkey % 7 = 0 THEN 'division by zero' END AS div_error
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_length" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS len_s, CAST(octet_length(ENCODE(text)) AS INT) AS len_b
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_split" ->
      """SELECT doc_id, str_split(text, ' ') AS words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_array_sum" ->
      """SELECT doc_id, CAST(list_sum(list_transform(str_split(text, ' '), x -> CAST(length(x) AS INT))) AS INT) AS s
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_key_value" ->
      """SELECT l_orderkey, l_linenumber,
        |       {'key': l_returnflag, 'value': l_linestatus} AS kv,
        |       CAST(NULL AS STRUCT(key VARCHAR, value VARCHAR)) AS kv_null
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_range_setof" ->
      """SELECT l_orderkey, l_linenumber, CAST(t.x AS INT) AS value
        |FROM lineitem, UNNEST(range(l_linenumber)) AS t(x)
        |ORDER BY l_orderkey, l_linenumber, value""".stripMargin,
    "q_variadic" ->
      """SELECT l_orderkey, l_linenumber,
        |       concat_ws('|', l_returnflag, l_linestatus, CAST(l_linenumber AS VARCHAR)) AS c
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_sum_udaf" ->
      """SELECT l_returnflag, CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS s
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_weighted_avg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_quantity AS INT) * l_linenumber) AS DOUBLE)
        |         / CAST(sum(l_linenumber) AS DOUBLE) AS wa
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_median_udaf" ->
      """SELECT c_nationkey, CAST(median(c_acctbal) AS DOUBLE) AS m
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
  )
}
