package graft.sources

import graft.remote.RemoteProtocol
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{Schema => ASchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import scala.jdk.CollectionConverters._

/**
 * Arrow IPC stream files as a Spark source/sink — the interchange format of
 * the reference ecosystem (its FFI and remote layers speak Arrow IPC;
 * `arrow-udf/src/ffi.rs:32-234`). One `.arrow` file per partition on write;
 * file-parallel read back. Types ride the same Arrow matrix as the remote
 * protocol ([[RemoteProtocol.toArrowField]]): scalars incl. date/timestamp/
 * decimal/binary, numeric lists, structs of scalars, and extension metadata.
 *
 * == Scale design ==
 * Write is embarrassingly parallel (one stream per partition, batches of
 * `batchSize`, nothing driver-side); read parallelizes over files, one task
 * per file — at cluster scale point `dir` at shared storage. This is a
 * utility codec pair, not a DataSourceV2: no pushdown/pruning, suited for
 * interchange with Arrow-native tools rather than analytic scans (parquet
 * remains the analytic format).
 */
object ArrowIO {

  /** Write `df` as `dir/part-<partition>.arrow` IPC stream files. Clears any
    * previous `.arrow` files first (a re-write with fewer partitions must not
    * leave stale parts behind) and always writes a schema-only `part-empty`
    * file so an empty DataFrame round-trips. */
  def write(df: DataFrame, dir: String, batchSize: Int = RemoteProtocol.BatchSize): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".arrow")).foreach(_.delete())
    val schema = df.schema
    // schema-only file: fixes the empty-DataFrame round trip and pins the
    // schema even when every partition happens to be empty
    locally {
      val allocator = new RootAllocator()
      val aschema = new ASchema(schema.fields.map(f =>
        RemoteProtocol.toArrowField(f.name, f.dataType, f.metadata)).toSeq.asJava)
      val root = VectorSchemaRoot.create(aschema, allocator)
      val out = new BufferedOutputStream(new FileOutputStream(s"$dir/part-empty.arrow"))
      val writer = new ArrowStreamWriter(root, null, out)
      try { writer.start(); writer.end() }
      finally { root.close(); out.close(); allocator.close() }
    }
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val allocator = new RootAllocator()
        val aschema = new ASchema(schema.fields.map(f =>
          RemoteProtocol.toArrowField(f.name, f.dataType, f.metadata)).toSeq.asJava)
        val root = VectorSchemaRoot.create(aschema, allocator)
        val out = new BufferedOutputStream(
          new FileOutputStream(s"$dir/part-$pid.arrow"))
        val writer = new ArrowStreamWriter(root, null, out)
        try {
          writer.start()
          it.grouped(batchSize).foreach { chunk =>
            root.allocateNew()
            chunk.zipWithIndex.foreach { case (row, i) =>
              var j = 0
              while (j < schema.length) {
                RemoteProtocol.setCell(root.getVector(j), i, row.get(j))
                j += 1
              }
            }
            root.setRowCount(chunk.size)
            writer.writeBatch()
          }
          writer.end()
        } finally {
          root.close(); out.close(); allocator.close()
        }
      }
    }
  }

  /** Read a directory of `.arrow` IPC stream files back as a DataFrame —
    * schema from the first file, one task per file, rows streamed per batch
    * (peak memory is one Arrow batch, not one file). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".arrow")).map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"no .arrow files under $dir")
    val schema: StructType = {
      val allocator = new RootAllocator()
      val in = new BufferedInputStream(new FileInputStream(files.head))
      val reader = new ArrowStreamReader(in, allocator)
      try {
        StructType(reader.getVectorSchemaRoot.getSchema.getFields.asScala.map { f =>
          val (dt, md) = RemoteProtocol.fromArrowField(f)
          org.apache.spark.sql.types.StructField(f.getName, dt, nullable = true, md)
        }.toSeq)
      } finally { reader.close(); in.close(); allocator.close() }
    }
    val rdd = spark.sparkContext.parallelize(files.toSeq, files.length).flatMap { path =>
      val allocator = new RootAllocator()
      val in = new BufferedInputStream(new FileInputStream(path))
      val reader = new ArrowStreamReader(in, allocator)
      val root = reader.getVectorSchemaRoot
      var closed = false
      def closeAll(): Unit = if (!closed) {
        closed = true; reader.close(); in.close(); allocator.close()
      }
      // close on task end even if the iterator is not fully consumed
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
      // stream one batch at a time — peak memory is a single Arrow batch
      new Iterator[Row] {
        private var batch: Iterator[Row] = Iterator.empty
        private def advance(): Unit = {
          while (!batch.hasNext && !closed) {
            if (reader.loadNextBatch()) {
              val vecs = root.getFieldVectors.asScala.toSeq
              val n = root.getRowCount
              batch = (0 until n).iterator.map(i =>
                Row.fromSeq(vecs.map(v => RemoteProtocol.getCell(v, i))))
            } else closeAll()
          }
        }
        override def hasNext: Boolean = { advance(); batch.hasNext }
        override def next(): Row = { advance(); batch.next() }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
