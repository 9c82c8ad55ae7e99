package graft.remote

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._
import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

/**
 * JavaScript (Node/V8) guest UDF worker pool — the engine's analogue of the
 * reference's QuickJS runtime (`arrow-udf-runtime/src/javascript/mod.rs:
 * 328-456` scalar/table, `:693-935` aggregates): REAL JavaScript — arrow
 * functions, generators, closures — evaluated in V8 sidecar processes
 * (`tools/jsudf_server.js`), with the same command topology as the
 * Arrow-IPC workers (LIST/GET/CALL/CALLTABLE + the five ACC* aggregate
 * verbs) over a JSON-framed body (dependency-free Node has no Arrow
 * reader; the JSON value space covers bool/int32/float64/string/arrays,
 * int64 exact to 2^53).
 *
 * Topology mirrors [[PythonWorker]]: a pool of interpreter processes with
 * partitions round-robined across them; on a real cluster the workers run
 * as sidecars per executor host.
 */
final class JsWorker extends AutoCloseable {
  private val script: java.io.File = {
    val fromCwd = new java.io.File(sys.props("user.dir"), "tools/jsudf_server.js")
    val fromEnv = sys.env.get("GRAFT_JSUDF").map(new java.io.File(_))
    fromEnv.filter(_.isFile).orElse(Some(fromCwd).filter(_.isFile)).getOrElse(
      throw new IllegalStateException(
        s"tools/jsudf_server.js not found from ${sys.props("user.dir")} (set GRAFT_JSUDF)"))
  }

  private val proc: Process = {
    val cmd = Seq("node", script.getAbsolutePath, "--port", "0") ++
      // per-call guest deadline (worker-thread terminate-and-respawn on a
      // stuck sync loop) — the engine's SO_TIMEOUT is the outer layer
      sys.env.get("GRAFT_JSUDF_TIMEOUT_MS").toSeq.flatMap(v => Seq("--call-timeout-ms", v))
    new ProcessBuilder(cmd: _*)
      .redirectError(ProcessBuilder.Redirect.INHERIT)
      .start()
  }

  /** Ephemeral port the worker bound; lazy so a pool launches every process
    * before blocking on any port (startup overlaps). */
  lazy val boundPort: Int = {
    val br = new java.io.BufferedReader(new java.io.InputStreamReader(proc.getInputStream))
    val line = br.readLine()
    if (line == null || !line.startsWith("PORT "))
      throw new IllegalStateException(s"js udf worker failed to start (got: $line)")
    line.stripPrefix("PORT ").trim.toInt
  }

  override def close(): Unit = proc.destroy()
}

object JsWorker {
  private val poolSize: Int =
    sys.env.get("GRAFT_JSUDF_WORKERS").map(_.toInt).getOrElse(
      math.min(8, Runtime.getRuntime.availableProcessors()))

  lazy val shared: Seq[JsWorker] = {
    val ws = (1 to poolSize).map(_ => new JsWorker()) // all processes launch...
    sys.addShutdownHook(ws.foreach(_.close()))
    ws.foreach(_.boundPort)                           // ...then block on ports
    ws
  }
  /** All pool endpoints, for round-robin assignment across partitions. */
  def endpoints: Seq[(String, Int)] = shared.map(w => ("127.0.0.1", w.boundPort))
  def port: Int = shared.head.boundPort
}

/** Client for the JSON-framed JS worker protocol: one connection, sequential
  * exchanges, SO_TIMEOUT containment like [[UdfClient]]. */
class JsUdfClient(host: String, port: Int, timeoutMs: Int = 120000) extends AutoCloseable {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  sock.setSoTimeout(timeoutMs)
  private val out = new BufferedWriter(
    new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
  private val in = new BufferedReader(
    new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
  private val mapper = new ObjectMapper()

  // ---- JSON <-> engine value bridge ---------------------------------------

  private def toJson(v: Any, target: ArrayNode): Unit = v match {
    case null => target.addNull()
    case b: Boolean => target.add(b)
    case i: Int => target.add(i)
    // int64 rides the wire as a decimal STRING: a JSON number goes through
    // the guest's double parse and silently rounds above 2^53. The worker
    // coerces string args declared `bigint` to real JS BigInt, so i64
    // round-trips exactly (the reference's JS runtime does the same).
    case l: Long => target.add(l.toString)
    case f: Float => target.add(f.toDouble)
    case d: Double => target.add(d)
    case s: String => target.add(s)
    case xs: scala.collection.Seq[_] =>
      val arr = target.addArray()
      xs.foreach(x => toJson(x, arr))
    case other => throw new IllegalArgumentException(
      s"js udf: unsupported value ${other.getClass}")
  }

  private def fromJson(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case BooleanType => n.asBoolean()
      case IntegerType => n.asInt()
      // BigInt results arrive as strings; Number results as numbers
      case LongType => if (n.isTextual) n.asText().toLong else n.asLong()
      case FloatType => n.floatValue()
      case DoubleType => n.asDouble()
      case StringType => n.asText()
      case ArrayType(et, _) =>
        (0 until n.size()).map(i => fromJson(n.get(i), et))
      case other => throw new IllegalArgumentException(s"js udf: unsupported type $other")
    }

  private def colsBody(rows: Seq[Seq[Any]]): ObjectNode = {
    val body = mapper.createObjectNode()
    val nArgs = if (rows.isEmpty) 0 else rows.head.length
    val cols = body.putArray("cols")
    (0 until nArgs).foreach { j =>
      val col = cols.addArray()
      rows.foreach(r => toJson(r(j), col))
    }
    body.put("n", rows.size)
    body
  }

  // ---- exchanges -----------------------------------------------------------

  /** v4 ERR lines carry a structured `{"name":...,"message":...}` object —
    * render it as "Name: message" so a guest TimeoutError is tellable from a
    * missing function; pre-v4 plain-text ERR lines pass through unchanged. */
  private def renderErr(status: String): String = {
    if (status != null && status.startsWith("ERR {")) {
      try {
        val o = mapper.readTree(status.stripPrefix("ERR "))
        s"${o.path("name").asText("Error")}: ${o.path("message").asText(status)}"
      } catch { case _: Exception => status }
    } else String.valueOf(status)
  }

  private def exchange(cmd: String, body: Option[ObjectNode]): JsonNode = {
    out.write(cmd); out.write("\n")
    body.foreach { b => out.write(mapper.writeValueAsString(b)); out.write("\n") }
    out.flush()
    val status = in.readLine()
    if (status == null || !status.startsWith("OK"))
      throw new RuntimeException(s"js call failed: ${renderErr(status)}")
    mapper.readTree(in.readLine())
  }

  private def textExchange(cmd: String): Seq[String] = {
    out.write(cmd); out.write("\n"); out.flush()
    val status = in.readLine()
    if (status == null || !status.startsWith("OK"))
      throw new RuntimeException(s"js request failed: ${renderErr(status)}")
    Iterator.continually(in.readLine()).takeWhile(l => l != null && l.nonEmpty).toSeq
  }

  def version(): Int = textExchange("VERSION").head.toInt
  def list(): Seq[String] = textExchange("LIST")
  def get(fname: String): Seq[String] = textExchange(s"GET $fname")

  /** Scalar call: one result per input row (nulls propagate). */
  def call(fname: String, retType: DataType, rows: Seq[Seq[Any]]): Seq[Any] = {
    val vals = exchange(s"CALL $fname", Some(colsBody(rows))).get("vals")
    (0 until vals.size()).map(i => fromJson(vals.get(i), retType))
  }

  /** Dynamic registration: ship JS SOURCE to the V8 guest — the reference's
    * `Runtime::add_function` surface (`javascript/mod.rs`). `code` is a JS
    * expression: an arrow/function expression (`kind = "scalar"`), a
    * generator-function expression (`"table"`), or an object with the
    * five-phase aggregate methods (`"aggregate"`). */
  def define(kind: String, sig: String, code: String): Unit = {
    val body = mapper.createObjectNode()
    body.put("kind", kind)
    body.put("sig", sig)
    body.put("code", code)
    exchange("DEFINE", Some(body))
  }

  /** Fallible scalar call: (value, error) per row — a throwing row carries
    * (null, "ErrType: message") instead of a silent null. */
  def callWithErrors(fname: String, retType: DataType,
                     rows: Seq[Seq[Any]]): Seq[(Any, String)] = {
    val res = exchange(s"CALLERR $fname", Some(colsBody(rows)))
    val vals = res.get("vals")
    val errs = res.get("errs")
    (0 until vals.size()).map { i =>
      val e = errs.get(i)
      (fromJson(vals.get(i), retType), if (e == null || e.isNull) null else e.asText())
    }
  }

  /** Table call: (input-row index, value) pairs from the JS generator. */
  def callTable(fname: String, retType: DataType, rows: Seq[Seq[Any]]): Seq[(Int, Any)] = {
    val res = exchange(s"CALLTABLE $fname", Some(colsBody(rows)))
    val idx = res.get("rows")
    val vals = res.get("vals")
    (0 until vals.size()).map(i => (idx.get(i).asInt(), fromJson(vals.get(i), retType)))
  }

  // ---- aggregate lifecycle (state = the guest's JSON value, opaque here) ---

  def accCreate(fname: String): Array[Byte] =
    mapper.writeValueAsBytes(exchange(s"ACCCREATE $fname", None).get("state"))

  def accumulate(fname: String, state: Array[Byte], rows: Seq[Seq[Any]],
                 retract: Boolean = false): Array[Byte] = {
    val body = colsBody(rows)
    body.set[ObjectNode]("state", mapper.readTree(state))
    val verb = if (retract) "ACCRETRACT" else "ACC"
    mapper.writeValueAsBytes(exchange(s"$verb $fname", Some(body)).get("state"))
  }

  def accMerge(fname: String, a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val body = mapper.createObjectNode()
    body.set[ObjectNode]("a", mapper.readTree(a))
    body.set[ObjectNode]("b", mapper.readTree(b))
    mapper.writeValueAsBytes(exchange(s"ACCMERGE $fname", Some(body)).get("state"))
  }

  def accFinish(fname: String, state: Array[Byte], retType: DataType): Any = {
    val body = mapper.createObjectNode()
    body.set[ObjectNode]("state", mapper.readTree(state))
    fromJson(exchange(s"ACCFINISH $fname", Some(body)).get("value"), retType)
  }

  override def close(): Unit = sock.close()
}

/** Thread-pinned JS connections (same lifecycle as [[ClientCache]]). */
private[remote] object JsClientCache {
  private val tl = new ThreadLocal[scala.collection.mutable.Map[(String, Int), JsUdfClient]] {
    override def initialValue() = scala.collection.mutable.Map.empty[(String, Int), JsUdfClient]
  }
  def withClient[A](host: String, port: Int)(f: JsUdfClient => A): A = {
    val m = tl.get()
    val c = m.getOrElseUpdate((host, port), new JsUdfClient(host, port))
    try f(c)
    catch {
      case e: Throwable =>
        m.remove((host, port)).foreach(c => scala.util.Try(c.close()))
        throw e
    }
  }
}

/** Five-phase transport over the JS worker pool: state is the guest's JSON
  * value, threaded as opaque bytes. `resultType` travels with the transport
  * because the JSON body carries no type tags. */
case class JsAggTransport(endpoints: Seq[(String, Int)], resultType: DataType)
  extends graft.remote.AggTransport {
  private def withClient[A](pid: Int)(f: JsUdfClient => A): A = {
    val (h, p) = endpoints(pid % endpoints.size)
    JsClientCache.withClient(h, p)(f)
  }
  override def create(pid: Int, fname: String): Array[Byte] =
    withClient(pid)(_.accCreate(fname))
  override def accumulate(pid: Int, fname: String, state: Array[Byte],
                          dts: Seq[DataType], rows: Seq[Seq[Any]]): Array[Byte] =
    withClient(pid)(_.accumulate(fname, state, rows))
  override def merge(pid: Int, fname: String, a: Array[Byte], b: Array[Byte]): Array[Byte] =
    withClient(pid)(_.accMerge(fname, a, b))
  override def finish(pid: Int, fname: String, state: Array[Byte]): Any =
    withClient(pid)(_.accFinish(fname, state, resultType))
}

/** Spark-side integration: evaluate a JS guest function per partition —
  * the [[RemoteUdf]] shape (fan-out, pooled per-partition connections,
  * bounded chunks) over the JSON framing. */
object JsUdf {
  private def fanOut(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  def withJsColumn(df: org.apache.spark.sql.DataFrame, endpoints: Seq[(String, Int)],
                   fname: String, argCols: Seq[String],
                   retType: DataType): org.apache.spark.sql.DataFrame = {
    val argIdx = argCols.map(df.schema.fieldIndex)
    val outSchema = StructType(df.schema.fields :+ StructField("value", retType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val eps = endpoints.toIndexedSeq
    fanOut(df).mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pid = Option(org.apache.spark.TaskContext.get()).map(_.partitionId()).getOrElse(0)
        val (host, port) = eps(pid % eps.size)
        val client = new JsUdfClient(host, port)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => client.close()))
        it.grouped(RemoteProtocol.BatchSize).flatMap { chunk =>
          val rows = chunk.map(r => argIdx.map(r.get))
          val vals = client.call(fname, retType, rows)
          chunk.zip(vals).map { case (r, v) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v)
          }
        }
      }
    }(enc)
  }

  /** Define a JS guest function from source on EVERY endpoint of the pool
    * (each V8 process owns its own registry) — driver-side, once, before
    * the mapPartitions exchange runs. */
  def defineJs(endpoints: Seq[(String, Int)], kind: String, sig: String,
               code: String): Unit =
    endpoints.foreach { case (h, p) =>
      val c = new JsUdfClient(h, p)
      try c.define(kind, sig, code) finally c.close()
    }

  /** Append `value` AND `error` columns from the JS guest — the fallible
    * call surface ([[RemoteUdf.withRemoteFallibleColumn]] over JSON framing). */
  def withJsFallibleColumn(df: org.apache.spark.sql.DataFrame, endpoints: Seq[(String, Int)],
                           fname: String, argCols: Seq[String],
                           retType: DataType): org.apache.spark.sql.DataFrame = {
    val argIdx = argCols.map(df.schema.fieldIndex)
    val outSchema = StructType(df.schema.fields :+
      StructField("value", retType) :+ StructField("error", StringType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val eps = endpoints.toIndexedSeq
    fanOut(df).mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pid = Option(org.apache.spark.TaskContext.get()).map(_.partitionId()).getOrElse(0)
        val (host, port) = eps(pid % eps.size)
        val client = new JsUdfClient(host, port)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => client.close()))
        it.grouped(RemoteProtocol.BatchSize).flatMap { chunk =>
          val rows = chunk.map(r => argIdx.map(r.get))
          val vals = client.callWithErrors(fname, retType, rows)
          chunk.zip(vals).map { case (r, (v, e)) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v :+ e)
          }
        }
      }
    }(enc)
  }

  def withJsTableColumn(df: org.apache.spark.sql.DataFrame, endpoints: Seq[(String, Int)],
                        fname: String, argCols: Seq[String],
                        retType: DataType): org.apache.spark.sql.DataFrame = {
    val argIdx = argCols.map(df.schema.fieldIndex)
    val outSchema = StructType(df.schema.fields :+ StructField("value", retType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val eps = endpoints.toIndexedSeq
    fanOut(df).mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pid = Option(org.apache.spark.TaskContext.get()).map(_.partitionId()).getOrElse(0)
        val (host, port) = eps(pid % eps.size)
        val client = new JsUdfClient(host, port)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => client.close()))
        it.grouped(RemoteProtocol.BatchSize).flatMap { chunk =>
          val rows = chunk.map(r => argIdx.map(r.get))
          client.callTable(fname, retType, rows).map { case (rowIdx, v) =>
            org.apache.spark.sql.Row.fromSeq(chunk(rowIdx).toSeq :+ v)
          }
        }
      }
    }(enc)
  }

  /** Register a JS guest aggregate as a session temp function. */
  def registerAggregate(spark: org.apache.spark.sql.SparkSession, name: String,
                        endpoints: Seq[(String, Int)], fname: String,
                        resultType: DataType): Unit =
    RemoteAgg.register(spark, name, JsAggTransport(endpoints, resultType), fname, resultType)
}
