package graft

import graft.sig._
import graft.types.GraftType
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SignatureSpec extends AnyFunSuite {

  test("parse simple scalar signature") {
    val s = Signature.parse("gcd(int, int) -> int")
    assert(s.name == "gcd")
    assert(s.args.map(_.dataType) == Seq(IntegerType, IntegerType))
    assert(s.returns.dataType == IntegerType)
    assert(s.kind == FunctionKind.Scalar)
    assert(!s.variadic)
  }

  test("parse table function via ->> and setof") {
    assert(Signature.parse("series(int) ->> int").kind == FunctionKind.Table)
    assert(Signature.parse("series(int) -> setof int").kind == FunctionKind.Table)
  }

  test("parse variadic") {
    val s = Signature.parse("concat_sep(string, string, ...) -> string")
    assert(s.variadic && s.args.length == 2)
  }

  test("parse list, struct, aliases") {
    val s = Signature.parse("f(varchar[], struct<a: int, b: string>) -> jsonb")
    assert(s.args(0).dataType == ArrayType(StringType))
    assert(s.args(1).dataType.isInstanceOf[StructType])
    assert(s.returns.dataType == StringType)
    assert(GraftType.extensionOf(s.returns.metadata).contains(GraftType.JsonExt))
  }

  test("wildcard expansion int*") {
    val sigs = Signature.expand("neg(int*) -> int*")
    assert(sigs.length == 4)
    assert(sigs.map(_.args.head.dataType) ==
      Seq(ByteType, ShortType, IntegerType, LongType))
    // return type expands pairwise with the arg
    assert(sigs.map(_.returns.dataType) == sigs.map(_.args.head.dataType))
  }

  test("registry overload resolution by type") {
    val r = new Registry
    val f1 = FunctionDef(Signature.parse("len(string) -> int"), ScalarOpaque)
    val f2 = FunctionDef(Signature.parse("len(binary) -> int"), ScalarOpaque)
    r.register(f1); r.register(f2)
    assert(r.resolve("len", Seq((StringType, Metadata.empty))).contains(f1))
    assert(r.resolve("len", Seq((BinaryType, Metadata.empty))).contains(f2))
    assert(r.resolve("len", Seq((IntegerType, Metadata.empty))).isEmpty)
  }

  test("metadata-sensitive resolution: json != plain string") {
    val r = new Registry
    val fJson = FunctionDef(Signature.parse("f(json) -> int"), ScalarOpaque)
    r.register(fJson)
    val jsonMd = new MetadataBuilder()
      .putString(GraftType.ExtensionKey, GraftType.JsonExt).build()
    assert(r.resolve("f", Seq((StringType, jsonMd))).contains(fJson))
    assert(r.resolve("f", Seq((StringType, Metadata.empty))).isEmpty)
  }

  test("variadic matching accepts more args") {
    val r = new Registry
    val f = FunctionDef(Signature.parse("c(string, string, ...) -> string"), ScalarOpaque)
    r.register(f)
    val s = (StringType, Metadata.empty)
    assert(r.resolve("c", Seq(s, s)).isDefined)
    assert(r.resolve("c", Seq(s, s, s, s)).isDefined)
    assert(r.resolve("c", Seq(s)).isEmpty)
  }

  private val ScalarOpaque = graft.functions.ScalarImpl(_ => null)

  test("graft_functions introspection view lists every registered overload") {
    val spark = TestSpark.spark // Graft.install ran in the fixture
    val df = spark.sql("SELECT * FROM graft_functions")
    assert(df.columns.toSeq ==
      Seq("name", "signature", "kind", "deterministic", "fallible", "call_mode"))
    val names = df.select("name").collect().map(_.getString(0)).toSet
    assert(Set("gcd", "hll_distinct", "sum_udaf", "graft_div", "range_setof")
      .subsetOf(names))
    assert(df.where("name = 'gcd'").count() >= 2)            // int + bigint overloads
    assert(df.where("name = 'graft_div' AND fallible").count() >= 1)
    assert(df.where("kind = 'Aggregate'").count() >= 4)
    assert(df.where("kind = 'Table'").count() >= 1)
  }
}
