package graft.types

import org.apache.spark.sql.types._

/**
 * The engine's type matrix: canonical names, SQL-ish aliases, and the mapping
 * onto Spark [[DataType]]s plus field [[Metadata]] for Arrow extension types.
 *
 * Mirrors the reference's type system (see SURVEY.md §1.2; reference
 * `arrow-udf/arrow-udf-macros/src/types.rs:18-43` for the canonical matrix and
 * `types.rs:112-135` for alias normalization) but is an independent design:
 * Spark has no unsigned integers (we widen), no µs time-of-day type (we use
 * LongType + metadata), and extension types (`json`, unconstrained `decimal`)
 * ride on `StructField.metadata` under the standard Arrow extension key.
 */
object GraftType {

  /** Default extension-metadata tags. The standard Arrow key plus graft's
    * own value names — schemas round-trip through Arrow IPC unchanged. */
  val DefaultExtensionKey = "ARROW:extension:name"
  val DefaultJsonExt      = "graft.json"
  val DefaultDecimalExt   = "graft.decimal"
  val DefaultPickleExt    = "graft.opaque" // opaque serialized state (ref: arrowudf.pickle)
  val DefaultTimeExt      = "graft.time64" // µs-of-day carried in a LongType

  // Live tags — re-keyable for hosts embedding graft next to another Arrow
  // producer that claims the same metadata namespace (the reference's
  // set_arrow_extension_key / set_json_extension_name surface,
  // `python/pyarrow.rs:104-133`, `js/jsarrow.rs:184-203`). @volatile: set
  // once at session setup, read from executor-side encode/decode paths.
  @volatile private var extensionKeyV = DefaultExtensionKey
  @volatile private var jsonExtV      = DefaultJsonExt
  @volatile private var decimalExtV   = DefaultDecimalExt
  @volatile private var pickleExtV    = DefaultPickleExt
  @volatile private var timeExtV      = DefaultTimeExt
  // Bumped by every configureExtensionTags call: tag state is PROCESS-global,
  // so Graft.install's per-session memo must observe a re-key made through
  // ANY session (r15 only invalidated the session the re-key came through).
  private val tagsRevCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Monotonic revision of the process-global tag configuration. */
  def tagsRevision: Long = tagsRevCounter.get()

  /** Metadata key used for Arrow extension types (re-keyable). */
  def ExtensionKey: String = extensionKeyV
  def JsonExt: String      = jsonExtV
  def DecimalExt: String   = decimalExtV
  def PickleExt: String    = pickleExtV
  def TimeExt: String      = timeExtV

  /** Re-key the extension-metadata tags. Call BEFORE registering functions /
    * [[graft.Graft.install]]: signatures parsed earlier carry the tags that
    * were live at parse time (the same configure-before-build contract as the
    * reference's global setters). Affects schema encode/decode everywhere —
    * field metadata, Arrow IPC field tags on every wire, overload
    * resolution. Defaults restore via [[resetExtensionTags]]. */
  def configureExtensionTags(extensionKey: String = DefaultExtensionKey,
                             jsonName: String = DefaultJsonExt,
                             decimalName: String = DefaultDecimalExt,
                             opaqueName: String = DefaultPickleExt,
                             timeName: String = DefaultTimeExt): Unit = {
    require(extensionKey.nonEmpty && jsonName.nonEmpty && decimalName.nonEmpty &&
      opaqueName.nonEmpty && timeName.nonEmpty, "extension tags must be non-empty")
    require(Seq(jsonName, decimalName, opaqueName, timeName).distinct.size == 4,
      "extension value names must be distinct (they drive overload resolution)")
    extensionKeyV = extensionKey
    jsonExtV = jsonName
    decimalExtV = decimalName
    pickleExtV = opaqueName
    timeExtV = timeName
    tagsRevCounter.incrementAndGet()
    ()
  }

  /** Restore the default extension tags (test hygiene). */
  def resetExtensionTags(): Unit = configureExtensionTags()

  private def ext(name: String): Metadata =
    new MetadataBuilder().putString(ExtensionKey, name).build()

  /** A resolved graft type: Spark physical type + extension metadata. */
  final case class GType(name: String, dataType: DataType, metadata: Metadata = Metadata.empty) {
    def field(fieldName: String, nullable: Boolean = true): StructField =
      StructField(fieldName, dataType, nullable, metadata)
    /** Two GTypes are call-compatible when physical type and extension tag agree. */
    def accepts(dt: DataType, md: Metadata): Boolean =
      DataType.equalsStructurally(dataType, dt, ignoreNullability = true) &&
        extensionOf(metadata) == extensionOf(md)
  }

  def extensionOf(md: Metadata): Option[String] =
    if (md != null && md.contains(ExtensionKey)) Some(md.getString(ExtensionKey)) else None

  /** Alias normalization — same spirit as the reference's SQL-alias table. */
  private val aliases: Map[String, String] = Map(
    "bool" -> "boolean",
    "tinyint" -> "int8", "int1" -> "int8",
    "smallint" -> "int16", "int2" -> "int16",
    "int" -> "int32", "int4" -> "int32", "integer" -> "int32",
    "bigint" -> "int64", "int8_t" -> "int64", "long" -> "int64",
    "uint1" -> "uint8", "uint2" -> "uint16", "uint4" -> "uint32", "uint8_t" -> "uint64",
    "real" -> "float32", "float" -> "float32", "float4" -> "float32",
    "double" -> "float64", "float8" -> "float64",
    "date" -> "date32",
    "time" -> "time64",
    "datetime" -> "timestamp",
    "numeric" -> "decimal",
    "jsonb" -> "json",
    "varchar" -> "string", "text" -> "string",
    "bytea" -> "binary", "bytes" -> "binary",
  )

  def normalize(name: String): String = {
    val n = name.trim.toLowerCase
    aliases.getOrElse(n, n)
  }

  /** Parse a canonical type name (after normalization) into a GType.
    * Supports suffix `[]` for lists and `struct<a:t,...>` for structs. */
  def parse(raw: String): GType = {
    val s = raw.trim
    if (s.endsWith("[]")) {
      val inner = parse(s.dropRight(2))
      GType(inner.name + "[]", ArrayType(inner.dataType, containsNull = true), inner.metadata)
    } else if (s.toLowerCase.startsWith("struct<") && s.endsWith(">")) {
      val body = s.substring(7, s.length - 1)
      val fields = splitTop(body).map { part =>
        val i = part.indexOf(':')
        require(i > 0, s"bad struct field '$part' in '$raw'")
        val fname = part.substring(0, i).trim
        val ft = parse(part.substring(i + 1))
        ft.field(fname)
      }
      GType(s, StructType(fields))
    } else if (s.toLowerCase.startsWith("map<") && s.endsWith(">")) {
      val body = splitTop(s.substring(4, s.length - 1))
      require(body.length == 2, s"bad map type '$raw'")
      GType(s, MapType(parse(body(0)).dataType, parse(body(1)).dataType, valueContainsNull = true))
    } else scalar(normalize(s))
  }

  /** Split on top-level commas (not inside <> nesting). */
  private def splitTop(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '<' => depth += 1
        case '>' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().filter(_.trim.nonEmpty)
  }

  private def scalar(n: String): GType = n match {
    case "null"      => GType(n, NullType)
    case "boolean"   => GType(n, BooleanType)
    case "int8"      => GType(n, ByteType)
    case "int16"     => GType(n, ShortType)
    case "int32"     => GType(n, IntegerType)
    case "int64"     => GType(n, LongType)
    // Unsigned: widen to the next signed type that can hold the full range.
    case "uint8"     => GType(n, ShortType)
    case "uint16"    => GType(n, IntegerType)
    case "uint32"    => GType(n, LongType)
    case "uint64"    => GType(n, DecimalType(20, 0))
    case "float32"   => GType(n, FloatType)
    case "float64"   => GType(n, DoubleType)
    case "date32"    => GType(n, DateType)
    case "time64"    => GType(n, LongType, ext(TimeExt)) // µs since midnight
    case "timestamp" => GType(n, TimestampNTZType)
    case "timestamptz" => GType(n, TimestampType)
    case "interval"  => GType(n, CalendarIntervalType)
    // Unconstrained decimal: text-backed with extension tag (reference semantics);
    // use `decimal(p,s)` spelled as Spark SQL for bounded decimals.
    case "decimal"   => GType(n, StringType, ext(DecimalExt))
    case "json"      => GType(n, StringType, ext(JsonExt))
    case "string" | "largestring" => GType("string", StringType)
    case "binary" | "largebinary" => GType("binary", BinaryType)
    case other =>
      // Fall back to Spark's own DDL parser for e.g. decimal(18,2), array<int>.
      GType(other, DataType.fromDDL(other))
  }

  /** Wildcard expansion, mirroring the reference's `int*` / `float*` / `*`. */
  def expandWildcard(t: String): Seq[String] = normalize(t) match {
    case "int*"   => Seq("int8", "int16", "int32", "int64")
    case "uint*"  => Seq("uint8", "uint16", "uint32", "uint64")
    case "float*" => Seq("float32", "float64")
    case "*" =>
      Seq("boolean", "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
        "uint64", "float32", "float64", "decimal", "date32", "time64", "timestamp",
        "interval", "json", "string", "binary")
    case other => Seq(other)
  }
}
