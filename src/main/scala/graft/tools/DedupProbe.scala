package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing for the fuzzy-dedup pipeline (manual:
  * `runMain graft.tools.DedupProbe <sfDir>`). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    t("minhashPairs cold") {
      graft.ops.Dedup.minhashPairs(docs, "text", "doc_id", 16, 4, 0.3).count()
    }
    t("nearDedupCorpus") {
      graft.ops.Dedup.nearDedupCorpus(docs, "text", "doc_id", 16, 4, 0.3).count()
    }
    spark.stop()
  }
}
