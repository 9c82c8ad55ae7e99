package graft.wasm

import graft.sig.{CallMode, FunctionDef, FunctionKind, Registry, Signature}
import org.apache.spark.sql.types._

/**
 * Spark registration for WASM guest functions — the reference's runtime
 * surface (`arrow-udf-runtime/src/wasm/mod.rs:87-613`) re-expressed on the
 * graft registry:
 *
 *  - **discovery by export name**: functions are found via
 *    `arrowudf_<base64(signature)>` exports and the module must carry an
 *    `ARROWUDF_VERSION_` export (≤ major 3), exactly the reference's
 *    convention (`wasm/mod.rs:107-125`) including its `$_`-tailed base64
 *    alphabet (`wasm/mod.rs:619-631`);
 *  - **instance pool per executor JVM**: pop-or-create; a successful call
 *    returns the instance as-is, a trapped call restores it to its pristine
 *    post-instantiation snapshot before returning it (state-equivalent to
 *    the reference's discard-on-error, `wasm/mod.rs:263-278`, without the
 *    per-trap re-instantiation cost);
 *  - **typed-slot ABI instead of Arrow-IPC-in-guest-memory**: the reference
 *    copies whole RecordBatches through guest linear memory because its
 *    guests are compiled against the arrow crate; an interpreted guest can be
 *    handed typed scalars directly — same observable semantics, one less copy.
 *
 * Failures follow the error-column convention: a [[WasmTrap]] from a function
 * registered fallible lands in the `struct<value, error>` result, never fails
 * the task.
 */
object WasmUdf {

  /** Reference symbol alphabet: standard base64 with `+/` → `$_`, no padding. */
  def symbolEncode(s: String): String =
    java.util.Base64.getEncoder.withoutPadding
      .encodeToString(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .replace('+', '$').replace('/', '_')

  def symbolDecode(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s.replace('$', '+').replace('_', '/')),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Export name for a function signature, e.g.
    * `wasm_gcd(bigint,bigint) -> bigint` → `arrowudf_<b64>`. */
  def exportName(sig: String): String = "arrowudf_" + symbolEncode(sig)

  final val VersionExport = "ARROWUDF_VERSION_3_0"

  /** Upper bound on a table function's guest-reported row total (16M rows
    * per input row is far past any sane yield; the alloc itself would trap on
    * the memory cap first for wide rows). */
  final val MaxTableRows = 1L << 24

  /**
   * Load a module's bytes, discover every `arrowudf_`-exported function and
   * register each into [[Registry.global]]. Returns the registered names.
   *
   * `fallible` names get the error-column treatment; everything else fails
   * null-safe per `CallMode.ReturnNullOnNullInput`.
   */
  def load(binary: Array[Byte],
           fallible: Set[String] = Set.empty,
           config: WasmConfig = WasmConfig()): Seq[String] = {
    val module = WasmModule.decode(binary) // driver-side validation: fail fast
    val version = module.exports.collectFirst {
      case e if e.name.startsWith("ARROWUDF_VERSION_") => e.name.stripPrefix("ARROWUDF_VERSION_")
    }.getOrElse(throw new WasmTrap("version export not found (want ARROWUDF_VERSION_x_y)"))
    val major = version.takeWhile(_ != '_')
    if (major.toIntOption.forall(_ > 3)) throw new WasmTrap(s"unsupported abi version: $version")

    module.exports.toSeq.collect {
      case e if e.name.startsWith("arrowudf_") && e.kind == 0 =>
        val sigStr = symbolDecode(e.name.stripPrefix("arrowudf_"))
        val parsed = Signature.parse(sigStr)
        val isTable = parsed.kind == FunctionKind.Table
        require(isTable || parsed.kind == FunctionKind.Scalar,
          s"wasm tier supports scalar and table functions, got: $sigStr")
        val ft = module.funcType(e.idx)
        // string/binary args ride the reference FFI ABI (`ffi.rs:32-234`):
        // the host calls the guest's exported `alloc`, copies the bytes into
        // linear memory, and passes (ptr: i32, len: i32) — two wasm params
        // per buffer argument. Table functions (reference
        // `wasm/mod.rs:283-319`) take two extra trailing params
        // (outPtr: i32, outCap: i32 entries), write ≤ outCap 8-byte slots
        // and return the TOTAL count — the host re-calls with a larger
        // buffer when the yield overflows.
        val sparkArgs = parsed.args.map(_.dataType)
        val isBuffer = sparkArgs.map(t => t == StringType || t == BinaryType)
        val expanded = sparkArgs.zip(isBuffer).map { case (_, b) => if (b) 2 else 1 }.sum +
          (if (isTable) 2 else 0)
        require(ft.params.length == expanded,
          s"$sigStr: wasm functype has ${ft.params.length} params, expected $expanded")
        // fail fast at load on a return type fromSlot can't produce —
        // otherwise a `-> tinyint` module would surface per-row as an opaque
        // ClassCastException in the Catalyst converter
        val retDt0 = parsed.returns.dataType
        val retIsBuffer = retDt0 == StringType || retDt0 == BinaryType
        require(retIsBuffer || Set[DataType](IntegerType, LongType, ShortType,
            ByteType, BooleanType, FloatType, DoubleType).contains(retDt0),
          s"$sigStr: unsupported wasm return type $retDt0")
        // string/binary RESULTS come back as one packed i64 = (ptr << 32 | len)
        // pointing at guest-allocated bytes (the return direction of the FFI
        // alloc ABI; reference results are read back out of guest linear
        // memory, `wasm/mod.rs:409-460`)
        if (retIsBuffer)
          require(ft.results.headOption.contains(WasmModule.I64),
            s"$sigStr: string/binary returns must be a packed (ptr<<32|len) i64")
        if (isBuffer.contains(true) || isTable || retIsBuffer)
          require(module.exportedFunc("alloc").isDefined,
            s"$sigStr: string/binary args/results and table functions require an exported alloc (FFI ABI)")
        // driver-side smoke instantiation (validates globals/data/memory limits)
        new WasmInstance(module, config)

        val fname = parsed.name
        val exportNm = e.name
        val paramTypes = ft.params
        val retSlot = ft.results.headOption.getOrElse(WasmModule.I64)
        val retDt = retDt0
        val bufferArg = isBuffer.toArray
        // pool key hashed ONCE here — per-call hashing would dominate the
        // whole invoke (MessageDigest.getInstance is not cheap)
        val poolKey = WasmPool.keyOf(binary, config)
        val needsHeap = bufferArg.exists(identity) || isTable || retIsBuffer

        // marshal Spark args into the leading slots; returns slots used
        def marshal(inst: WasmInstance, args: Seq[Any], slots: Array[Long]): Int = {
          var i = 0
          var s = 0
          while (i < args.length) {
            if (bufferArg(i)) {
              val bytes = args(i) match {
                case b: Array[Byte] => b
                case v => v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              }
              val ptr = inst.invoke("alloc", Array(bytes.length.toLong)).toInt
              inst.writeBytes(ptr, bytes)
              slots(s) = ptr.toLong; slots(s + 1) = bytes.length.toLong
              s += 2
            } else {
              slots(s) = toSlot(args(i), paramTypes(s))
              s += 1
            }
            i += 1
          }
          s
        }

        // table-function result entries: 8-byte slots in the element's repr
        val elemSlot: Byte = retDt match {
          case FloatType | DoubleType => WasmModule.F64
          case _ => WasmModule.I64
        }

        val impl: AnyRef =
          if (isTable) graft.functions.TableImpl { args =>
            val inst = WasmPool.acquire(poolKey, binary, config)
            var ok = false
            try {
              if (inst.hasExport("reset_heap")) inst.invoke("reset_heap", Array.empty)
              val slots = new Array[Long](paramTypes.length)
              val used = marshal(inst, args, slots)
              var cap = 64
              var outPtr = 0
              var total = 0L
              var done = false
              var retried = false
              while (!done) {
                outPtr = inst.invoke("alloc", Array(cap.toLong * 8)).toInt
                slots(used) = outPtr.toLong
                slots(used + 1) = cap.toLong
                total = inst.invoke(exportNm, slots)
                // the guest-reported total is untrusted: reject negatives and
                // absurd sizes, and allow exactly ONE exact-size retry — a
                // guest whose total keeps growing would otherwise loop the
                // host forever (fuel only bounds each individual call)
                if (total < 0 || total > MaxTableRows)
                  throw new WasmTrap(s"table function returned invalid total $total")
                if (total <= cap) done = true
                else if (retried)
                  throw new WasmTrap("table function result grew past its reported total")
                else { retried = true; cap = total.toInt }
              }
              val out = new Array[Any](total.toInt)
              var j = 0
              while (j < out.length) {
                out(j) = fromSlot(inst.readSlot(outPtr + j * 8), elemSlot, retDt)
                j += 1
              }
              ok = true
              out.iterator
            } finally {
              WasmPool.releaseAfter(poolKey, inst, ok)
            }
          }
          else graft.functions.ScalarImpl { args =>
            val inst = WasmPool.acquire(poolKey, binary, config)
            var ok = false
            try {
              // free the previous call's buffers before placing this call's —
              // which also means a buffer RESULT stays readable until the
              // next call on this instance, so the copy-out below is safe
              if (needsHeap && inst.hasExport("reset_heap"))
                inst.invoke("reset_heap", Array.empty)
              val slots = new Array[Long](paramTypes.length)
              marshal(inst, args, slots)
              val r = inst.invoke(exportNm, slots)
              val out =
                if (retIsBuffer) {
                  val bytes = inst.readBytes((r >>> 32).toInt, r.toInt)
                  if (retDt == StringType)
                    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
                  else bytes
                } else fromSlot(r, retSlot, retDt)
              ok = true
              out
            } finally {
              WasmPool.releaseAfter(poolKey, inst, ok) // trap → pristine restore, reuse
            }
          }
        Registry.global.register(FunctionDef(parsed, impl,
          CallMode.ReturnNullOnNullInput, deterministic = true,
          fallible = fallible.contains(fname)))
        // batched dispatch for whole-batch hosts (the remote server): one
        // pool borrow + one export bind per batch instead of per row. A
        // re-registration that stops qualifying drops its stale entry.
        if (isTable || fallible.contains(fname))
          graft.functions.BatchEval.overrides.remove(fname)
        else
          graft.functions.BatchEval.overrides(fname) = (parsed.toString,
            (cols, rows) => {
              val inst = WasmPool.acquire(poolKey, binary, config)
              var okB = false
              try {
                val bound = inst.bind(exportNm)
                val hasReset = needsHeap && inst.hasExport("reset_heap")
                val resetB = if (hasReset) inst.bind("reset_heap") else null
                val colsArr = cols.toArray
                val nArgs = colsArr.length
                val out = new Array[Any](rows)
                val args = new Array[Any](nArgs)
                val slots = new Array[Long](paramTypes.length)
                var r = 0
                while (r < rows) {
                  var anyNull = false
                  var i = 0
                  while (i < nArgs) {
                    args(i) = colsArr(i)(r)
                    if (args(i) == null) anyNull = true
                    i += 1
                  }
                  if (!anyNull) {
                    if (hasReset) inst.invokeBound(resetB, Array.empty)
                    marshal(inst,
                      scala.collection.immutable.ArraySeq.unsafeWrapArray(args), slots)
                    val v = inst.invokeBound(bound, slots)
                    out(r) =
                      if (retIsBuffer) {
                        val bytes = inst.readBytes((v >>> 32).toInt, v.toInt)
                        if (retDt == StringType)
                          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
                        else bytes
                      } else fromSlot(v, retSlot, retDt)
                  }
                  r += 1
                }
                okB = true
                out
              } finally {
                WasmPool.releaseAfter(poolKey, inst, okB) // trap → pristine restore, reuse
              }
            })
        // every non-fallible scalar gets the batched columnar kernel — one
        // instance borrow + export bind per scan batch instead of per row;
        // string/binary args and results ride the same alloc ABI as the
        // per-row path, amortized (fallible scalars stay per-row: the error
        // column needs per-row trap isolation)
        val numericRet = Set[DataType](IntegerType, LongType, DoubleType,
          FloatType, BooleanType, ShortType, ByteType)
        if (!isTable && !fallible.contains(fname) &&
            (numericRet.contains(retDt) || retIsBuffer)) {
          val kernel = WasmBatchKernel(binary, poolKey, config, exportNm,
            paramTypes.toSeq, retSlot, retDt, isBuffer, retIsBuffer)
          graft.plans.ColumnarMap.kernelOverrides(fname) = (_, _) => Some(kernel)
        }
        fname
    }
  }

  /**
   * Register a five-phase AGGREGATE whose every phase runs in the wasm
   * guest — the SPI lifecycle (`create_state/accumulate/retract/merge/
   * finish`, reference `python/mod.rs:229-309`) with each phase bound to a
   * plain-named export. State is one i64 slot (numeric-state aggregates:
   * sums, counts, min/max, bit-packed pairs); it rides Spark's partial
   * aggregation and the shuffle like any other graft aggregate state.
   * `retract` is optional — append-only when absent.
   */
  def loadAggregate(binary: Array[Byte], sig: String,
                    createFn: String, accFn: String,
                    retractFn: Option[String], mergeFn: String, finishFn: String,
                    config: WasmConfig = WasmConfig()): Unit = {
    val module = WasmModule.decode(binary)
    (Seq(createFn, accFn, mergeFn, finishFn) ++ retractFn).foreach { n =>
      require(module.exportedFunc(n).isDefined, s"aggregate phase export missing: $n")
    }
    val parsed = Signature.parse(sig)
    val accFt = module.funcType(module.exportedFunc(accFn).get)
    require(accFt.params.length == parsed.args.length + 1,
      s"$accFn must take (state, ${parsed.args.length} args)")
    val argSlots = accFt.params.drop(1)
    val retSlot = module.funcType(module.exportedFunc(finishFn).get)
      .results.headOption.getOrElse(WasmModule.I64)
    val retDt = parsed.returns.dataType
    val poolKey = WasmPool.keyOf(binary, config)

    def withInst[T](f: WasmInstance => T): T = {
      val inst = WasmPool.acquire(poolKey, binary, config)
      var ok = false
      try { val r = f(inst); ok = true; r }
      finally { WasmPool.releaseAfter(poolKey, inst, ok) }
    }

    val nArgs = parsed.args.length
    def phase(name: String, state: Long, in: org.apache.spark.sql.Row): Long = {
      var i = 0
      while (i < nArgs) { if (in.isNullAt(i)) return state; i += 1 } // null-safe
      val slots = new Array[Long](nArgs + 1)
      slots(0) = state
      i = 0
      while (i < nArgs) { slots(i + 1) = toSlot(in.get(i), argSlots(i)); i += 1 }
      withInst(_.invoke(name, slots))
    }

    val agg = new graft.functions.GraftAggregate[Long, Any] {
      override def createState(): Long = withInst(_.invoke(createFn, Array.empty))
      override def accumulate(state: Long, in: org.apache.spark.sql.Row): Long =
        phase(accFn, state, in)
      override def retract(state: Long, in: org.apache.spark.sql.Row): Long =
        retractFn match {
          case None => throw new UnsupportedOperationException(s"${parsed.name} is append-only")
          case Some(r) => phase(r, state, in)
        }
      override def merge(a: Long, b: Long): Long = withInst(_.invoke(mergeFn, Array(a, b)))
      override def finish(state: Long): Any =
        fromSlot(withInst(_.invoke(finishFn, Array(state))), retSlot, retDt)
    }
    graft.functions.Udf.aggregateNative(sig)(agg)
  }

  /**
   * Like [[loadAggregate]] but with ARBITRARY byte-blob state — the
   * reference's aggregate-state contract, where state is any Arrow array
   * including pickled blobs (`arrow-udf-runtime/src/python/mod.rs:482-517`),
   * so multi-accumulator aggregates (weighted average, variance, sketches)
   * are expressible without bit-packing into one i64.
   *
   * Blob phase ABI (the FFI alloc ABI in both directions):
   *  - host → guest: the host calls the exported `alloc`, copies the state
   *    blob into linear memory, and passes (ptr: i32, len: i32);
   *  - guest → host: a phase returns its (possibly re-allocated) state as one
   *    packed i64 = (ptr << 32) | len, which the host copies out before the
   *    instance is released.
   *
   * Export shapes: `createFn() -> packed`,
   * `accFn/retractFn(statePtr, stateLen, args...) -> packed`,
   * `mergeFn(aPtr, aLen, bPtr, bLen) -> packed`,
   * `finishFn(statePtr, stateLen) -> scalar` (or packed for string results).
   * State rides Spark's partial aggregation and the shuffle as plain bytes —
   * only one blob per (group, partition) is ever serialized.
   */
  def loadAggregateBlob(binary: Array[Byte], sig: String,
                        createFn: String, accFn: String,
                        retractFn: Option[String], mergeFn: String, finishFn: String,
                        config: WasmConfig = WasmConfig()): Unit = {
    val module = WasmModule.decode(binary)
    (Seq(createFn, accFn, mergeFn, finishFn) ++ retractFn).foreach { n =>
      require(module.exportedFunc(n).isDefined, s"aggregate phase export missing: $n")
    }
    require(module.exportedFunc("alloc").isDefined,
      "blob-state aggregates require an exported alloc (FFI ABI)")
    val parsed = Signature.parse(sig)
    val accFt = module.funcType(module.exportedFunc(accFn).get)
    require(accFt.params.length == parsed.args.length + 2,
      s"$accFn must take (statePtr, stateLen, ${parsed.args.length} args)")
    val argSlots = accFt.params.drop(2)
    val retSlot = module.funcType(module.exportedFunc(finishFn).get)
      .results.headOption.getOrElse(WasmModule.I64)
    val retDt = parsed.returns.dataType
    val retIsBuffer = retDt == StringType || retDt == BinaryType
    val poolKey = WasmPool.keyOf(binary, config)

    def withInst[T](f: WasmInstance => T): T = {
      val inst = WasmPool.acquire(poolKey, binary, config)
      var ok = false
      try { val r = f(inst); ok = true; r }
      finally { WasmPool.releaseAfter(poolKey, inst, ok) }
    }
    def resetHeap(inst: WasmInstance): Unit =
      if (inst.hasExport("reset_heap")) inst.invoke("reset_heap", Array.empty)
    def readPacked(inst: WasmInstance, packed: Long): Array[Byte] =
      inst.readBytes((packed >>> 32).toInt, packed.toInt)
    def putBlob(inst: WasmInstance, blob: Array[Byte]): Long = {
      val ptr = inst.invoke("alloc", Array(blob.length.toLong)).toInt
      inst.writeBytes(ptr, blob)
      ptr.toLong
    }

    val nArgs = parsed.args.length
    def phase(name: String, state: Array[Byte],
              in: org.apache.spark.sql.Row): Array[Byte] = {
      var i = 0
      while (i < nArgs) { if (in.isNullAt(i)) return state; i += 1 } // null-safe
      withInst { inst =>
        resetHeap(inst)
        val slots = new Array[Long](nArgs + 2)
        slots(0) = putBlob(inst, state)
        slots(1) = state.length.toLong
        i = 0
        while (i < nArgs) { slots(i + 2) = toSlot(in.get(i), argSlots(i)); i += 1 }
        readPacked(inst, inst.invoke(name, slots))
      }
    }

    val agg = new graft.functions.GraftAggregate[Array[Byte], Any] {
      override def createState(): Array[Byte] = withInst { inst =>
        resetHeap(inst)
        readPacked(inst, inst.invoke(createFn, Array.empty))
      }
      override def accumulate(state: Array[Byte], in: org.apache.spark.sql.Row): Array[Byte] =
        phase(accFn, state, in)
      override def retract(state: Array[Byte], in: org.apache.spark.sql.Row): Array[Byte] =
        retractFn match {
          case None => throw new UnsupportedOperationException(s"${parsed.name} is append-only")
          case Some(r) => phase(r, state, in)
        }
      override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = withInst { inst =>
        resetHeap(inst)
        val pa = putBlob(inst, a)
        val pb = putBlob(inst, b)
        readPacked(inst, inst.invoke(mergeFn,
          Array(pa, a.length.toLong, pb, b.length.toLong)))
      }
      override def finish(state: Array[Byte]): Any = withInst { inst =>
        resetHeap(inst)
        val ptr = putBlob(inst, state)
        val r = inst.invoke(finishFn, Array(ptr, state.length.toLong))
        if (retIsBuffer) {
          val bytes = readPacked(inst, r)
          if (retDt == StringType)
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          else bytes
        } else fromSlot(r, retSlot, retDt)
      }
    }
    graft.functions.Udf.aggregateNative(sig)(agg)
  }

  private def toSlot(v: Any, vt: Byte): Long = vt match {
    case WasmModule.I32 => v match {
      case i: Int => i.toLong
      case l: java.lang.Number => l.intValue.toLong
      case b: Boolean => if (b) 1L else 0L
      case other => throw new WasmTrap(s"cannot pass $other as i32")
    }
    case WasmModule.I64 => v match {
      case l: Long => l
      case n: java.lang.Number => n.longValue
      case other => throw new WasmTrap(s"cannot pass $other as i64")
    }
    case WasmModule.F32 => v match {
      case f: Float => java.lang.Float.floatToRawIntBits(f).toLong & 0xFFFFFFFFL
      case n: java.lang.Number => java.lang.Float.floatToRawIntBits(n.floatValue).toLong & 0xFFFFFFFFL
      case other => throw new WasmTrap(s"cannot pass $other as f32")
    }
    case WasmModule.F64 => v match {
      case d: Double => java.lang.Double.doubleToRawLongBits(d)
      case n: java.lang.Number => java.lang.Double.doubleToRawLongBits(n.doubleValue)
      case other => throw new WasmTrap(s"cannot pass $other as f64")
    }
    case other => throw new WasmTrap(f"unsupported param type 0x$other%02x")
  }

  private def fromSlot(slot: Long, vt: Byte, dt: DataType): Any = {
    val raw: Any = vt match {
      case WasmModule.I32 => slot.toInt
      case WasmModule.I64 => slot
      case WasmModule.F32 => java.lang.Float.intBitsToFloat(slot.toInt)
      case WasmModule.F64 => java.lang.Double.longBitsToDouble(slot)
      case _ => slot
    }
    (dt, raw) match {
      case (IntegerType, l: Long) => l.toInt
      case (IntegerType, i: Int) => i
      case (LongType, i: Int) => i.toLong
      case (LongType, l: Long) => l
      case (ShortType, l: Long) => l.toShort
      case (ShortType, i: Int) => i.toShort
      case (ByteType, l: Long) => l.toByte
      case (ByteType, i: Int) => i.toByte
      case (BooleanType, i: Int) => i != 0
      case (BooleanType, l: Long) => l != 0
      case (FloatType, f: Float) => f
      case (DoubleType, d: Double) => d
      case (DoubleType, f: Float) => f.toDouble
      case (FloatType, d: Double) => d.toFloat
      case _ => raw
    }
  }
}

/**
 * Columnar batch kernel for a wasm scalar: ONE pooled instance borrowed per
 * scan batch (the reference's batched contract — `call(&RecordBatch)` enters
 * the guest once per batch, `wasm/mod.rs:256-279`), argument slots read
 * box-free off the scan's `ColumnVector`s. Registered in
 * [[graft.plans.ColumnarMap.kernelOverrides]] for every non-fallible scalar
 * signature: numeric args pass as typed slots; string/binary args ride the
 * FFI alloc ABI (guest `alloc` + copy-in, two slots per buffer) with a
 * `reset_heap` per row — the borrow and the export binds still amortize
 * over the whole batch, which is what made the per-row path slow.
 */
final case class WasmBatchKernel(
    binary: Array[Byte], poolKey: String, config: WasmConfig,
    exportNm: String, paramSlots: Seq[Byte], retSlot: Byte, retDt: DataType,
    bufferArg: Seq[Boolean] = Seq.empty, retIsBuffer: Boolean = false)
  extends graft.plans.ColumnarMap.BatchKernel {
  import org.apache.spark.sql.vectorized.ColumnVector
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import WasmModule.{I32, I64, F32, F64}

  override def apply(in: Seq[ColumnVector], rows: Int, out: OnHeapColumnVector): Unit = {
    val inst = WasmPool.acquire(poolKey, binary, config)
    var ok = false
    try {
      val bound = inst.bind(exportNm) // export hash lookup once per batch
      val nArgs = in.length
      val cols = in.toArray
      val bufArr = new Array[Boolean](nArgs)
      var b = 0
      while (b < bufferArg.length) { bufArr(b) = bufferArg(b); b += 1 }
      val anyBuffer = bufArr.exists(identity)
      val needsHeap = anyBuffer || retIsBuffer
      val hasReset = needsHeap && inst.hasExport("reset_heap")
      val resetB = if (hasReset) inst.bind("reset_heap") else null
      val allocB = if (anyBuffer) inst.bind("alloc") else null
      val noArgs = Array.empty[Long]
      val allocArgs = new Array[Long](1)
      val slots = new Array[Long](paramSlots.length)

      // Arena packing (r13): ALL buffer args for the whole scan batch land
      // in the guest with ONE reset + ONE alloc + ONE copy-in, and each row
      // just passes (arenaPtr + offset, len) — the per-row guest alloc +
      // per-row memory copy was the dominant cost of the buffer path
      // (per-row and batched tiers benched within noise of each other
      // before this; see x_wasm_str_batched_1m). reset_heap runs once per
      // BATCH, so guest-allocated result buffers (retIsBuffer) stack above
      // the arena until the next batch — bounded by one batch's inputs +
      // outputs, and every result is copied out before the next reset.
      var arenaOffs: Array[Int] = null
      var arenaLens: Array[Int] = null
      var arenaPtr = 0
      // buffer RETURNS with no buffer args still consume guest heap per row;
      // free the prior batch's results up front (results stack within a
      // batch, each copied out before the next reset)
      if (needsHeap && !anyBuffer && hasReset) inst.invokeBound(resetB, noArgs)
      if (anyBuffer) {
        if (hasReset) inst.invokeBound(resetB, noArgs) // free the prior batch
        // pass 1: row-null mask + lengths (strings via numBytes — no byte
        // materialization; binary columns copy once here, reused below)
        val nulRow = new Array[Boolean](rows)
        val binData = new Array[Array[Byte]](rows * nArgs)
        arenaOffs = new Array[Int](rows * nArgs)
        arenaLens = new Array[Int](rows * nArgs)
        var total = 0L
        var i0 = 0
        while (i0 < rows) {
          var nul = false
          var j0 = 0
          while (j0 < nArgs) { if (cols(j0).isNullAt(i0)) nul = true; j0 += 1 }
          nulRow(i0) = nul
          if (!nul) {
            j0 = 0
            while (j0 < nArgs) {
              if (bufArr(j0)) {
                val len = cols(j0).dataType() match {
                  case StringType => cols(j0).getUTF8String(i0).numBytes()
                  case BinaryType =>
                    val b = cols(j0).getBinary(i0)
                    binData(i0 * nArgs + j0) = b
                    b.length
                  case dt => throw new WasmTrap(s"cannot pass $dt as buffer arg")
                }
                arenaLens(i0 * nArgs + j0) = len
                total += len
              }
              j0 += 1
            }
          }
          i0 += 1
        }
        if (total > Int.MaxValue - 8) throw new WasmTrap(
          s"batch buffer args total $total bytes exceed the 32-bit guest space")
        allocArgs(0) = total
        arenaPtr = inst.invokeBound(allocB, allocArgs).toInt
        // pass 2: each value lands DIRECTLY in guest memory (one copy total)
        var off = 0
        i0 = 0
        while (i0 < rows) {
          if (!nulRow(i0)) {
            var j0 = 0
            while (j0 < nArgs) {
              if (bufArr(j0)) {
                val k = i0 * nArgs + j0
                arenaOffs(k) = off
                if (binData(k) != null) inst.writeBytes(arenaPtr + off, binData(k))
                else inst.writeUtf8(arenaPtr + off, cols(j0).getUTF8String(i0))
                off += arenaLens(k)
              }
              j0 += 1
            }
          }
          i0 += 1
        }
      }

      var i = 0
      while (i < rows) {
        var anyNull = false
        var j = 0
        while (j < nArgs) { if (cols(j).isNullAt(i)) anyNull = true; j += 1 }
        if (anyNull) out.putNull(i) // ReturnNullOnNullInput batch semantics
        else {
          j = 0
          var s = 0
          while (j < nArgs) {
            if (bufArr(j)) {
              slots(s) = (arenaPtr + arenaOffs(i * nArgs + j)).toLong
              slots(s + 1) = arenaLens(i * nArgs + j).toLong
              s += 2
            } else {
              slots(s) = slotOf(cols(j), i, paramSlots(s))
              s += 1
            }
            j += 1
          }
          val r = inst.invokeBound(bound, slots)
          if (retIsBuffer) {
            // output half of the arena discipline: the guest result buffer
            // copies STRAIGHT into the column vector — no intermediate
            // byte[] alloc per row. memRef is re-fetched after the call
            // (a guest memory.grow replaces the array).
            val p = (r >>> 32).toInt
            val l = r.toInt
            val m = inst.memRef
            if (l < 0 || p < 0 || p.toLong + l > m.length)
              throw new WasmTrap("guest returned out-of-bounds result buffer")
            out.putByteArray(i, m, p, l)
          } else write(out, i, r)
        }
        i += 1
      }
      ok = true
    } finally {
      WasmPool.releaseAfter(poolKey, inst, ok) // trap → pristine restore, reuse
    }
  }

  private def slotOf(v: ColumnVector, i: Int, vt: Byte): Long = vt match {
    case I32 | I64 => v.dataType() match {
      case IntegerType => v.getInt(i).toLong
      case LongType    => v.getLong(i)
      case ShortType   => v.getShort(i).toLong
      case ByteType    => v.getByte(i).toLong
      case BooleanType => if (v.getBoolean(i)) 1L else 0L
      case DoubleType  => v.getDouble(i).toLong
      case FloatType   => v.getFloat(i).toLong
      case dt => throw new WasmTrap(s"cannot pass $dt as integer slot")
    }
    case F64 =>
      val d = v.dataType() match {
        case DoubleType  => v.getDouble(i)
        case FloatType   => v.getFloat(i).toDouble
        case IntegerType => v.getInt(i).toDouble
        case LongType    => v.getLong(i).toDouble
        case dt => throw new WasmTrap(s"cannot pass $dt as f64")
      }
      java.lang.Double.doubleToRawLongBits(d)
    case F32 =>
      val f = v.dataType() match {
        case FloatType   => v.getFloat(i)
        case DoubleType  => v.getDouble(i).toFloat
        case IntegerType => v.getInt(i).toFloat
        case LongType    => v.getLong(i).toFloat
        case dt => throw new WasmTrap(s"cannot pass $dt as f32")
      }
      java.lang.Float.floatToRawIntBits(f).toLong & 0xFFFFFFFFL
    case other => throw new WasmTrap(f"unsupported param slot 0x$other%02x")
  }

  private def write(out: OnHeapColumnVector, i: Int, slot: Long): Unit = retDt match {
    case LongType    => out.putLong(i, if (retSlot == I32) slot.toInt.toLong else slot)
    case IntegerType => out.putInt(i, slot.toInt)
    case DoubleType  => out.putDouble(i, retSlot match {
      case F64 => java.lang.Double.longBitsToDouble(slot)
      case F32 => java.lang.Float.intBitsToFloat(slot.toInt).toDouble
      case _   => slot.toDouble
    })
    case FloatType   => out.putFloat(i, retSlot match {
      case F32 => java.lang.Float.intBitsToFloat(slot.toInt)
      case F64 => java.lang.Double.longBitsToDouble(slot).toFloat
      case _   => slot.toFloat
    })
    case BooleanType => out.putBoolean(i, slot != 0)
    case ShortType   => out.putShort(i, slot.toShort)
    case ByteType    => out.putByte(i, slot.toByte)
    case dt => throw new WasmTrap(s"unsupported batch return type $dt")
  }
}

/** Per-JVM instance pool keyed by module identity (hash of the bytes) —
  * one decoded module per executor, one instance per (task thread, module)
  * held in a ThreadLocal (reference pool semantics `wasm/mod.rs:257-319`,
  * contention-free: a shared queue's CAS traffic at millions of calls/s
  * costs more than the calls). `acquire` REMOVES the instance from the
  * thread's cache and `release` puts it back, so an instance is never
  * reachable mid-call. A TRAPPED call goes through `releaseAfter(ok=false)`:
  * the instance is restored to its pristine post-instantiation snapshot
  * (a few memcpys) and returned to the pool — state-equivalent to the
  * reference's discard-on-error (`wasm/mod.rs` drops the store) but without
  * paying a full module re-decode + re-instantiate per trapped row, which
  * made a planted-error gate (one trap per 7 rows, ~86K traps at sf0.1)
  * a 46 s query. */
object WasmPool {
  private val modules = scala.collection.concurrent.TrieMap.empty[String, WasmModule]
  private val local =
    ThreadLocal.withInitial[scala.collection.mutable.HashMap[String, WasmInstance]](
      () => scala.collection.mutable.HashMap.empty)

  /** Pool identity: module bytes AND config. Two registrations of the same
    * binary under different fuel/memory limits must never share pooled
    * instances — the instance bakes its config in at construction. Callers
    * compute this ONCE per registered function and pass the string to
    * acquire/release — hashing per call would cost more than the wasm call
    * itself. */
  def keyOf(binary: Array[Byte], config: WasmConfig): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    java.util.Base64.getEncoder.encodeToString(md.digest(binary)) +
      s"|${config.fuel}|${config.memoryLimitBytes}|${config.maxCallDepth}"
  }

  def acquire(key: String, binary: Array[Byte], config: WasmConfig): WasmInstance =
    local.get().remove(key) match {
      case Some(inst) => inst
      case None =>
        val module = modules.getOrElseUpdate(key, WasmModule.decode(binary))
        new WasmInstance(module, config)
    }

  def release(key: String, inst: WasmInstance): Unit =
    local.get().update(key, inst)

  /** The finally-block counterpart of `acquire`: a successful call (`ok`)
    * releases as-is; a trapped call restores the pristine snapshot first so
    * the instance is indistinguishable from fresh, then releases. Restore
    * never throws (pure arraycopy), so this is finally-safe. */
  def releaseAfter(key: String, inst: WasmInstance, ok: Boolean): Unit = {
    if (!ok) inst.restorePristine()
    release(key, inst)
  }
}
