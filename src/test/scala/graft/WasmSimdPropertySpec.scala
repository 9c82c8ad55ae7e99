package graft

import graft.wasm._
import graft.wasm.Asm._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the SIMD lane math: the interpreter's packed-long lane
  * arithmetic is checked against an independent byte-array model over random
  * vectors. The module under test stores the op's v128 result to guest
  * memory and the host reads the 16 bytes back — so the full decode → exec →
  * memory path is exercised, not just the lane helpers. */
class WasmSimdPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](16, Gen.chooseNum(Int.MinValue, Int.MaxValue).map(_.toByte))

  /** Run one binary (or unary, b = None) SIMD op on const inputs; returns
    * the 16 result bytes read back from guest memory. */
  private def runOp(op: Array[Byte], a: Array[Byte], b: Option[Array[Byte]]): Array[Byte] = {
    val bld = new WasmBuilder
    bld.memory(1, Some(2))
    bld.func(Seq.empty, Seq.empty, Seq.empty, concat(
      i32Const(0),
      v128ConstBytes(a.map(_ & 0xFF).toSeq),
      b.map(x => v128ConstBytes(x.map(_ & 0xFF).toSeq)).getOrElse(Array.empty[Byte]),
      op, v128Store()), exportAs = Some("t"))
    val inst = new WasmInstance(WasmModule.decode(bld.build()), WasmConfig())
    inst.invoke("t", Array.empty)
    inst.readBytes(0, 16)
  }

  /** Run a SIMD op whose result is a SCALAR (bitmask / all_true). */
  private def runScalar(op: Array[Byte], a: Array[Byte]): Long = {
    val bld = new WasmBuilder
    bld.func(Seq.empty, Seq(i64), Seq.empty, concat(
      v128ConstBytes(a.map(_ & 0xFF).toSeq), op, i64ExtendI32U),
      exportAs = Some("t"))
    new WasmInstance(WasmModule.decode(bld.build()), WasmConfig()).invoke("t", Array.empty)
  }

  // byte-array lane model ----------------------------------------------------
  private def lanes(v: Array[Byte], bits: Int, signed: Boolean): Array[Long] = {
    val n = 128 / bits
    val w = bits / 8
    Array.tabulate(n) { i =>
      var x = 0L
      for (j <- (w - 1) to 0 by -1) x = (x << 8) | (v(i * w + j) & 0xFFL)
      if (signed && bits < 64) (x << (64 - bits)) >> (64 - bits) else x
    }
  }
  private def fromLanes(ls: Array[Long], bits: Int): Array[Byte] = {
    val w = bits / 8
    val out = new Array[Byte](16)
    for (i <- ls.indices; j <- 0 until w)
      out(i * w + j) = ((ls(i) >> (8 * j)) & 0xFF).toByte
    out
  }
  private def zipModel(a: Array[Byte], b: Array[Byte], bits: Int, signed: Boolean)(
      f: (Long, Long) => Long): Array[Byte] =
    fromLanes(lanes(a, bits, signed).zip(lanes(b, bits, signed)).map(f.tupled), bits)

  private def eqBytes(x: Array[Byte], y: Array[Byte]): Boolean =
    java.util.Arrays.equals(x, y)

  test("integer add/sub/mul match the lane model at every width") {
    for ((op, bits, f) <- Seq[(Array[Byte], Int, (Long, Long) => Long)](
      (i8x16Add, 8, _ + _), (i8x16Sub, 8, _ - _),
      (i16x8Add, 16, _ + _), (i16x8Sub, 16, _ - _), (i16x8Mul, 16, _ * _),
      (i32x4Add, 32, _ + _), (i32x4Sub, 32, _ - _), (i32x4Mul, 32, _ * _),
      (i64x2Add, 64, _ + _), (i64x2Sub, 64, _ - _), (i64x2Mul, 64, _ * _))) {
      check(Prop.forAll(vecGen, vecGen) { (a, b) =>
        eqBytes(runOp(op, a, Some(b)), zipModel(a, b, bits, signed = false)(f))
      })
    }
  }

  test("signed/unsigned min/max match the lane model") {
    for ((op, bits, signed, f) <- Seq[(Array[Byte], Int, Boolean, (Long, Long) => Long)](
      (i8x16MinS, 8, true, math.min), (i8x16MinU, 8, false, math.min),
      (i8x16MaxS, 8, true, math.max), (i8x16MaxU, 8, false, math.max),
      (i16x8MinS, 16, true, math.min), (i16x8MaxS, 16, true, math.max),
      (i32x4MinS, 32, true, math.min), (i32x4MaxS, 32, true, math.max))) {
      check(Prop.forAll(vecGen, vecGen) { (a, b) =>
        eqBytes(runOp(op, a, Some(b)), zipModel(a, b, bits, signed)(f))
      })
    }
  }

  test("compares produce all-ones/all-zeros lane masks") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      eqBytes(runOp(i8x16Eq, a, Some(b)),
        zipModel(a, b, 8, signed = true)((x, y) => if (x == y) -1L else 0L)) &&
      eqBytes(runOp(i8x16LtS, a, Some(b)),
        zipModel(a, b, 8, signed = true)((x, y) => if (x < y) -1L else 0L)) &&
      eqBytes(runOp(i8x16LtU, a, Some(b)),
        zipModel(a, b, 8, signed = false)((x, y) => if (x < y) -1L else 0L)) &&
      eqBytes(runOp(i32x4GtS, a, Some(b)),
        zipModel(a, b, 32, signed = true)((x, y) => if (x > y) -1L else 0L))
    })
  }

  test("saturating add/sub clamp exactly") {
    def satS(v: Long, bits: Int): Long = {
      val mx = (1L << (bits - 1)) - 1
      if (v > mx) mx else if (v < -mx - 1) -mx - 1 else v
    }
    def satU(v: Long, bits: Int): Long = {
      val mx = (1L << bits) - 1
      if (v > mx) mx else if (v < 0) 0 else v
    }
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      eqBytes(runOp(i8x16AddSatS, a, Some(b)),
        zipModel(a, b, 8, signed = true)((x, y) => satS(x + y, 8))) &&
      eqBytes(runOp(i8x16SubSatS, a, Some(b)),
        zipModel(a, b, 8, signed = true)((x, y) => satS(x - y, 8))) &&
      eqBytes(runOp(i8x16AddSatU, a, Some(b)),
        zipModel(a, b, 8, signed = false)((x, y) => satU(x + y, 8))) &&
      eqBytes(runOp(i8x16SubSatU, a, Some(b)),
        zipModel(a, b, 8, signed = false)((x, y) => satU(x - y, 8))) &&
      eqBytes(runOp(i16x8AddSatS, a, Some(b)),
        zipModel(a, b, 16, signed = true)((x, y) => satS(x + y, 16)))
    })
  }

  test("avgr_u rounds half up; abs/neg wrap") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      eqBytes(runOp(i8x16AvgrU, a, Some(b)),
        zipModel(a, b, 8, signed = false)((x, y) => (x + y + 1) >>> 1))
    })
    check(Prop.forAll(vecGen) { a =>
      eqBytes(runOp(i8x16Abs, a, None),
        fromLanes(lanes(a, 8, signed = true).map(x => math.abs(x)), 8)) &&
      eqBytes(runOp(i8x16Neg, a, None),
        fromLanes(lanes(a, 8, signed = true).map(x => -x), 8)) &&
      eqBytes(runOp(i64x2Neg, a, None),
        fromLanes(lanes(a, 64, signed = false).map(x => -x), 64))
    })
  }

  test("shifts match the model with count taken mod lane width") {
    // embed the shift count as a const: test counts 0..70 over random vectors
    val cntGen = Gen.chooseNum(0, 70)
    check(Prop.forAll(vecGen, cntGen) { (a, k) =>
      val shl = concat(i32Const(k), i32x4Shl)
      val shrS = concat(i32Const(k), i32x4ShrS)
      val shrU = concat(i32Const(k), i32x4ShrU)
      val kk = k % 32
      eqBytes(runOp(shl, a, None),
        fromLanes(lanes(a, 32, signed = false).map(_ << kk), 32)) &&
      eqBytes(runOp(shrS, a, None),
        fromLanes(lanes(a, 32, signed = true).map(_ >> kk), 32)) &&
      eqBytes(runOp(shrU, a, None),
        fromLanes(lanes(a, 32, signed = false).map(_ >>> kk), 32))
    })
  }

  test("narrow saturates both operands in order; extend widens low/high halves") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val narrowed = runOp(i8x16NarrowI16x8S, a, Some(b))
      val want = (lanes(a, 16, signed = true) ++ lanes(b, 16, signed = true)).map { v =>
        if (v > 127) 127L else if (v < -128) -128L else v
      }
      eqBytes(narrowed, fromLanes(want, 8))
    })
    check(Prop.forAll(vecGen) { a =>
      val lo = runOp(i16x8ExtendLowI8x16S, a, None)
      val hi = runOp(i16x8ExtendHighI8x16S, a, None)
      val src = lanes(a, 8, signed = true)
      eqBytes(lo, fromLanes(src.take(8), 16)) && eqBytes(hi, fromLanes(src.drop(8), 16))
    })
  }

  test("dot_i16x8_s sums adjacent products into i32 lanes") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val la = lanes(a, 16, signed = true); val lb = lanes(b, 16, signed = true)
      val want = fromLanes(Array.tabulate(4)(i =>
        la(2 * i) * lb(2 * i) + la(2 * i + 1) * lb(2 * i + 1)), 32)
      eqBytes(runOp(i32x4DotI16x8S, a, Some(b)), want)
    })
  }

  test("bitmask collects lane sign bits at every width") {
    check(Prop.forAll(vecGen) { a =>
      runScalar(i8x16Bitmask, a) ==
        lanes(a, 8, signed = true).zipWithIndex.collect { case (v, i) if v < 0 => 1L << i }.sum &&
      runScalar(i16x8Bitmask, a) ==
        lanes(a, 16, signed = true).zipWithIndex.collect { case (v, i) if v < 0 => 1L << i }.sum &&
      runScalar(i32x4Bitmask, a) ==
        lanes(a, 32, signed = true).zipWithIndex.collect { case (v, i) if v < 0 => 1L << i }.sum &&
      runScalar(i64x2Bitmask, a) ==
        lanes(a, 64, signed = false).zipWithIndex.collect { case (v, i) if v < 0 => 1L << i }.sum
    })
  }

  test("bitwise not/and/or/xor/andnot/bitselect match the model") {
    check(Prop.forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
      def z(x: Array[Byte], y: Array[Byte])(f: (Byte, Byte) => Int): Array[Byte] =
        x.zip(y).map { case (p, q) => f(p, q).toByte }
      eqBytes(runOp(v128And, a, Some(b)), z(a, b)(_ & _)) &&
      eqBytes(runOp(v128Or, a, Some(b)), z(a, b)(_ | _)) &&
      eqBytes(runOp(v128Xor, a, Some(b)), z(a, b)(_ ^ _)) &&
      eqBytes(runOp(v128AndNot, a, Some(b)), z(a, b)((p, q) => p & ~q)) &&
      eqBytes(runOp(v128Not, a, None), a.map(p => (~p).toByte)) && {
        // bitselect takes THREE operands: build inline
        val bld = new WasmBuilder
        bld.memory(1, Some(2))
        bld.func(Seq.empty, Seq.empty, Seq.empty, concat(
          i32Const(0),
          v128ConstBytes(a.map(_ & 0xFF).toSeq), v128ConstBytes(b.map(_ & 0xFF).toSeq),
          v128ConstBytes(c.map(_ & 0xFF).toSeq),
          v128Bitselect, v128Store()), exportAs = Some("t"))
        val inst = new WasmInstance(WasmModule.decode(bld.build()), WasmConfig())
        inst.invoke("t", Array.empty)
        eqBytes(inst.readBytes(0, 16),
          a.zip(b).zip(c).map { case ((p, q), m) => ((p & m) | (q & ~m)).toByte })
      }
    })
  }

  test("f64x2 arithmetic is IEEE-exact per lane") {
    val dGen = Gen.chooseNum(-1e12, 1e12)
    check(Prop.forAll(dGen, dGen, dGen, dGen) { (a0, a1, b0, b1) =>
      def bytes(x: Double, y: Double) = {
        val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putDouble(x).putDouble(y).array()
      }
      val got = runOp(f64x2Mul, bytes(a0, a1), Some(bytes(b0, b1)))
      val bb = java.nio.ByteBuffer.wrap(got).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.getDouble == a0 * b0 && bb.getDouble == a1 * b1
    })
  }
}
