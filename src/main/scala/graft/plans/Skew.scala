package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation helpers. AQE's skew-join splitting
 * (`spark.sql.adaptive.skewJoin`) handles most cases at runtime; explicit
 * salting remains the tool of choice when one build-side key dominates so
 * heavily that even split partitions overwhelm a task (classic hot-key join
 * at 100 TB: one user id with 1% of all events).
 */
object Skew {

  /**
   * Salted inner equi-join: the skewed (large, hot-keyed) side gets a random
   * salt in [0, salts); the small side is replicated once per salt value.
   * Shuffle keys become (key, salt) — a hot key now spreads over `salts`
   * tasks. Replication cost: `salts ×` the small side, so keep it for
   * genuinely small dimension tables.
   */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = skewed.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
