package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness for the r15 optimization round: executes one operator at
  * bench scale and prints the FINAL adaptive physical plan (post-execution),
  * which PlanAudit's pre-execution skeleton cannot show. Not part of any
  * gate; safe to delete. */
object OptDebug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.Graft.install(s)
    val which = if (args.isEmpty) "minhash" else args(0)
    which match {
      case "minhash" =>
        val docs = s.range(2000000L).selectExpr("id AS doc_id",
          """array_join(transform(sequence(0, 9), j -> concat('w',
            |  pmod(hash(CASE WHEN id % 20 < 2 THEN id div 20
            |            ELSE 2000000 + id END, j), 1000000000))), ' ') AS text""".stripMargin)
        val t0 = System.nanoTime()
        val pairs = graft.ops.Dedup.minhashPairs(docs, "text", "doc_id")
        val n = pairs.collect().length
        println(f"[optdebug] minhashPairs 2m: ${(System.nanoTime - t0) / 1e9}%.3f s, $n pairs")
        println(pairs.queryExecution.executedPlan.toString)
      case "spans" =>
        import org.apache.spark.sql.functions._
        val docs = s.range(2000000L).selectExpr("id AS doc_id",
          """array_join(transform(sequence(0, 15), j -> concat('w',
            |  pmod(hash(CASE WHEN id % 10 < 2 AND j < 12
            |                 THEN CAST(id div 10 * 100 + j AS BIGINT)
            |            ELSE CAST(hash(id, j) AS BIGINT) END), 1000000000))), ' ') AS text""".stripMargin)
          .localCheckpoint(true)
        // old inline-transform gram expression vs the new streamed kernel,
        // interleaved in one JVM (3 reps each, min is the signal)
        val ws = filter(split(col("text"), "\\s+"), t => t =!= "")
        val base = docs.select(col("doc_id"), ws.as("ws"))
        def timeIt(tag: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[optdebug] $tag: ${(System.nanoTime - t0) / 1e9}%.3f s")
        }
        for (rep <- 1 to 3) {
          timeIt(s"grams_old rep$rep") {
            base.where(size(col("ws")) >= 8)
              .select(col("doc_id"), posexplode(expr(
                "transform(sequence(0, size(ws) - 8), i -> doc_fingerprint(array_join(slice(ws, i + 1, 8), ' ')))"))
                .as(Seq("pos", "fp")))
              .write.format("noop").mode("overwrite").save()
          }
          timeIt(s"grams_new rep$rep") {
            base.where(size(col("ws")) >= 8)
              .select(col("doc_id"), posexplode(expr("gram_fingerprints(ws, 8)"))
                .as(Seq("pos", "fp")))
              .write.format("noop").mode("overwrite").save()
          }
          timeIt(s"dedupSpans_full rep$rep") {
            graft.ops.Curation.dedupSpans(docs, "text", "doc_id", n = 8)
              .write.format("noop").mode("overwrite").save()
          }
        }
      case "elide" =>
        import org.apache.spark.sql.functions._
        val e = s.range(100000).selectExpr("id % 1000 AS a", "id AS b")
          .repartition(col("a")).sortWithinPartitions("a").localCheckpoint()
        println("[optdebug] checkpointed outputPartitioning: " +
          e.queryExecution.executedPlan.outputPartitioning)
        val r = s.range(1000).selectExpr("id AS id", "id*2 AS v")
        val j = e.join(r.hint("merge"), e("a") === r("id"))
        j.write.format("noop").mode("overwrite").save()
        val plan = j.queryExecution.executedPlan.toString
        println("[optdebug] join plan:\n" + plan.linesIterator
          .filter(l => Seq("Exchange", "Sort", "Join", "Scan").exists(l.contains))
          .mkString("\n"))
        // NOTE (r15): an ofInternalRddPartitioned-based "Pinned" layout was
        // tried here — it DID elide the exchange+sort on the wrapped side,
        // but fixing the partition count blocked AQE coalescing for every
        // downstream stage of the iterative ops and ran 7x slower at the
        // 1M-edge CC probe. Plain localCheckpoint materialization is the
        // measured optimum for the loop invariants.
      case _ => sys.error(s"unknown probe $which")
    }
    s.stop()
  }
}
