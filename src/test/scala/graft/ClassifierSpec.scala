package graft

import graft.ops.Classifier
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(Long, String)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava, schema)
  }

  // label: even ids positive — used where the labels just need to exist
  private val evenLabel = "CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END"

  test("training is deterministic across runs and partitionings") {
    val d = docs((0L until 64L).map(i => (i, s"w$i doc number $i the and of")))
    val a = Classifier.trainLogit(d, "text", evenLabel, iters = 4)
    val b = Classifier.trainLogit(d.repartition(7), "text", evenLabel, iters = 4)
    assert(a.w.toSeq == b.w.toSeq)
  }

  test("learns a separable signal: long stopword-free vs short stopword-heavy") {
    // positive class: long, diverse, no stopwords; negative: short, stoppy
    val pos = (0L until 30L).map(i =>
      (i, (1 to 40).map(k => s"tok${i}x$k").mkString(" ")))
    val neg = (100L until 130L).map(i => (i, "the and of to a in"))
    val d = docs(pos ++ neg)
    val label = "CASE WHEN doc_id < 50 THEN 1.0 ELSE 0.0 END"
    val scored = Classifier.qualityClassifier(d, "text", "doc_id", label, iters = 32)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    val acc = (pos.map(_._1).count(scored(_)) + neg.map(_._1).count(!scored(_))).toDouble / 60.0
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("margin6 is the exact floor of w·f micro-units") {
    val d = docs(Seq((1L, "alpha beta gamma the")))
    val m = Classifier.trainLogit(d, "text", "1.0", iters = 2)
    val row = Classifier.scoreLogit(d, m, "text", "doc_id").head
    // recompute the margin from the same feature expressions + weights
    val f = d.selectExpr(Classifier.featureExprs("text"): _*).head
    val margin = (0 until Classifier.numFeatures)
      .map(j => m.w(j) * f.getDouble(j)).reduce(_ + _)
    assert(row.getLong(1) == math.floor(margin * 1000000.0).toLong)
    assert(row.getBoolean(2) == (margin > 0.0))
  }

  test("null and empty text score with zero-feature rows, no crash") {
    val d = docs(Seq((1L, null), (2L, ""), (3L, "real text here the")))
    val scored = Classifier.qualityClassifier(d, "text", "doc_id", evenLabel, iters = 2)
      .orderBy("doc_id").collect()
    assert(scored.length == 3)
    assert(scored.forall(r => !r.isNullAt(1)))
  }

  test("scoring is map-only: no exchange in the plan") {
    val d = docs(Seq((1L, "a b c")))
    val m = Classifier.LogitModel(Array.fill(Classifier.numFeatures)(0.1))
    val plan = Classifier.scoreLogit(d, m, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("empty corpus trains to the zero model without dividing by zero") {
    val m = Classifier.trainLogit(docs(Seq.empty), "text", "1.0", iters = 3)
    assert(m.w.forall(_ == 0.0))
  }

  test("zero iterations returns zero weights and all-negative preds") {
    val d = docs(Seq((1L, "x y z")))
    val m = Classifier.trainLogit(d, "text", evenLabel, iters = 0)
    assert(m.w.forall(_ == 0.0))
    val r = Classifier.scoreLogit(d, m, "text", "doc_id").head
    assert(r.getLong(1) == 0L && !r.getBoolean(2))
  }
}
