package graft

import graft.types.GraftType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (plain ScalaCheck driven from ScalaTest — no bridge
  * artifact in the offline dependency set). */
class TypePropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val scalarNames = Gen.oneOf(
    "boolean", "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
    "uint64", "float32", "float64", "date32", "time64", "timestamp", "decimal",
    "json", "string", "binary", "interval")

  test("every scalar type parses, and [] lifts it to an array") {
    check(Prop.forAll(scalarNames) { n =>
      val t = GraftType.parse(n)
      val arr = GraftType.parse(s"$n[]")
      t.dataType != null &&
        arr.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        arr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType == t.dataType
    })
  }

  test("aliases normalize to the same type as their canonical names") {
    val pairs = Seq("int" -> "int32", "bigint" -> "int64", "varchar" -> "string",
      "numeric" -> "decimal", "jsonb" -> "json", "double" -> "float64",
      "real" -> "float32", "bool" -> "boolean", "bytea" -> "binary")
    pairs.foreach { case (alias, canon) =>
      assert(GraftType.parse(alias).dataType == GraftType.parse(canon).dataType)
      assert(GraftType.extensionOf(GraftType.parse(alias).metadata) ==
        GraftType.extensionOf(GraftType.parse(canon).metadata))
    }
  }

  test("nested struct/array/map parse round trip") {
    val t = GraftType.parse("struct<a: int[], b: struct<c: string, d: map<string, int>>>")
    val st = t.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq == Seq("a", "b"))
    assert(st("a").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))
  }

  test("signature string round trips through toString for arbitrary arities") {
    check(Prop.forAll(Gen.listOfN(3, scalarNames), Gen.oneOf(true, false)) { (args, table) =>
      val arrow = if (table) "->>" else "->"
      val s = graft.sig.Signature.parse(s"f(${args.mkString(", ")}) $arrow int")
      val reparsed = graft.sig.Signature.parse(s.toString)
      reparsed.args.map(_.dataType) == s.args.map(_.dataType) && reparsed.kind == s.kind
    })
  }

  test("script runtime arithmetic matches JVM semantics") {
    val rt = new graft.runtime.ScriptRuntime()
    rt.addFunction("f", org.apache.spark.sql.types.LongType,
      graft.sig.CallMode.ReturnNullOnNullInput, "(fn (x y) (- (* x 3) (/ y 2)))")
    check(Prop.forAll(Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(1L, 1000L)) { (x, y) =>
      rt.call("f", Seq(x, y)) == x * 3 - y / 2
    })
  }
}
