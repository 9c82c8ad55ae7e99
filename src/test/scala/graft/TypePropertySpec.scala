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

  test("re-keyed extension tags: parse + Arrow field round-trip under custom names") {
    // the reference's set_arrow_extension_key / set_json_extension_name
    // surface (pyarrow.rs:104-133): a host embedding graft next to another
    // Arrow producer re-keys the extension tags; every metadata-tagged type
    // must parse, tag, and round-trip through the Arrow wire mapping under
    // the custom names exactly as under the defaults
    import org.apache.spark.sql.types._
    try {
      GraftType.configureExtensionTags(
        extensionKey = "MYORG:ext:name", jsonName = "myorg.js0n",
        decimalName = "myorg.dec", opaqueName = "myorg.blob",
        timeName = "myorg.t64")
      // parse attaches the re-keyed tags
      val j = GraftType.parse("json")
      assert(j.metadata.contains("MYORG:ext:name"))
      assert(GraftType.extensionOf(j.metadata).contains("myorg.js0n"))
      val d = GraftType.parse("decimal")
      assert(GraftType.extensionOf(d.metadata).contains("myorg.dec"))
      val t = GraftType.parse("time64")
      assert(GraftType.extensionOf(t.metadata).contains("myorg.t64"))
      // Arrow field round-trip preserves type AND the re-keyed tag both ways
      check(Prop.forAll(Gen.oneOf("json", "decimal", "time64")) { n =>
        val g = GraftType.parse(n)
        val f = graft.remote.RemoteProtocol.toArrowField("c", g.dataType, g.metadata)
        val kv = f.getMetadata
        val (dt, md) = graft.remote.RemoteProtocol.fromArrowField(f)
        kv.get("MYORG:ext:name") == GraftType.extensionOf(g.metadata).get &&
          DataType.equalsStructurally(dt, g.dataType, ignoreNullability = true) &&
          GraftType.extensionOf(md) == GraftType.extensionOf(g.metadata)
      })
      // time64 still rides as a REAL Arrow Time64 under the custom tag
      val tf = graft.remote.RemoteProtocol.toArrowField("t", t.dataType, t.metadata)
      assert(tf.getType.isInstanceOf[org.apache.arrow.vector.types.pojo.ArrowType.Time])
      // overload-resolution equality keys on the re-keyed tag
      assert(!j.accepts(StringType, Metadata.empty))
      assert(j.accepts(StringType, j.metadata))
      // distinct-name and non-empty guards hold
      intercept[IllegalArgumentException] {
        GraftType.configureExtensionTags(jsonName = "x", decimalName = "x")
      }
      intercept[IllegalArgumentException] {
        GraftType.configureExtensionTags(extensionKey = "")
      }
    } finally GraftType.resetExtensionTags()
    // defaults restored: a fresh parse carries the stock Arrow key again
    val j2 = GraftType.parse("json")
    assert(j2.metadata.contains("ARROW:extension:name"))
    assert(GraftType.extensionOf(j2.metadata).contains("graft.json"))
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
