package graft.sources

import graft.remote.RemoteProtocol
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{Schema => ASchema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import java.io.{BufferedInputStream, BufferedOutputStream}
import scala.jdk.CollectionConverters._

/** Hadoop `Configuration` is not `Serializable`; this minimal envelope ships
  * the driver's conf to executor tasks (the standard Spark technique). */
private final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/**
 * Arrow IPC stream files as a Spark source/sink — the interchange format of
 * the reference ecosystem (its FFI and remote layers speak Arrow IPC;
 * `arrow-udf/src/ffi.rs:32-234`). One `.arrow` file per partition on write;
 * file-parallel read back. Types ride the same Arrow matrix as the remote
 * protocol ([[RemoteProtocol.toArrowField]]): scalars incl. date/timestamp/
 * decimal/binary, numeric lists, structs of scalars, and extension metadata.
 *
 * == Scale design ==
 * All I/O goes through the Hadoop `FileSystem` API resolved from the path
 * (`file:`, `hdfs:`, `s3a:`, ...), so executors on a real cluster write to
 * shared storage the driver can list — never bare `java.io` on executor-local
 * disks. Partition files are written to a task-unique `.tmp` name and renamed
 * into place on success: a task that dies mid-write (or loses a speculative
 * race) leaves only a `.tmp` orphan that readers never see and the next write
 * clears. Write is embarrassingly parallel (one stream per partition, batches
 * of `batchSize`, nothing driver-side); read parallelizes over files, one
 * task per file, rows streamed batch-at-a-time (peak memory is one Arrow
 * batch, not one file). This is a utility codec pair, not a DataSourceV2: no
 * pushdown/pruning — suited for interchange with Arrow-native tools rather
 * than analytic scans (parquet remains the analytic format).
 */
object ArrowIO {

  private def fsFor(dir: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(conf), p)
  }

  /** Write `df` as `dir/part-<partition>.arrow` IPC stream files. Clears any
    * previous `.arrow`/`.arrow.tmp` files first (a re-write with fewer
    * partitions must not leave stale parts behind) and always writes a
    * schema-only `part-empty` file so an empty DataFrame round-trips. */
  def write(df: DataFrame, dir: String, batchSize: Int = RemoteProtocol.BatchSize): Unit = {
    val sc = df.sparkSession.sparkContext
    val confEnvelope = new SerializableHadoopConf(sc.hadoopConfiguration)
    val (fs, dirPath) = fsFor(dir, sc.hadoopConfiguration)
    fs.mkdirs(dirPath)
    fs.listStatus(dirPath).map(_.getPath)
      .filter(p => p.getName.endsWith(".arrow") || p.getName.contains(".arrow.tmp"))
      .foreach(fs.delete(_, false))
    val schema = df.schema
    // schema-only file: fixes the empty-DataFrame round trip and pins the
    // schema even when every partition happens to be empty
    locally {
      val allocator = new RootAllocator()
      val aschema = new ASchema(schema.fields.map(f =>
        RemoteProtocol.toArrowField(f.name, f.dataType, f.metadata)).toSeq.asJava)
      val root = VectorSchemaRoot.create(aschema, allocator)
      val out = new BufferedOutputStream(fs.create(new Path(dirPath, "part-empty.arrow"), true))
      val writer = new ArrowStreamWriter(root, null, out)
      try { writer.start(); writer.end() }
      finally { root.close(); out.close(); allocator.close() }
    }
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val conf = confEnvelope.value
        val (pfs, pdir) = fsFor(dir, conf)
        val finalPath = new Path(pdir, s"part-$pid.arrow")
        // attempt-unique temp name: concurrent speculative attempts cannot
        // clobber each other mid-stream; only a completed file is renamed in
        val tmpPath = new Path(pdir, s"part-$pid.arrow.tmp-${tc.taskAttemptId()}")
        val allocator = new RootAllocator()
        val aschema = new ASchema(schema.fields.map(f =>
          RemoteProtocol.toArrowField(f.name, f.dataType, f.metadata)).toSeq.asJava)
        val root = VectorSchemaRoot.create(aschema, allocator)
        val out = new BufferedOutputStream(pfs.create(tmpPath, true))
        val writer = new ArrowStreamWriter(root, null, out)
        var ok = false
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
          ok = true
        } finally {
          root.close(); out.close(); allocator.close()
          if (ok) {
            pfs.delete(finalPath, false) // lost-speculative leftovers
            if (!pfs.rename(tmpPath, finalPath))
              throw new java.io.IOException(s"rename $tmpPath -> $finalPath failed")
          } else pfs.delete(tmpPath, false)
        }
      }
    }
  }

  /** Read a directory of `.arrow` IPC stream files back as a DataFrame —
    * schema from the first file, one task per file, rows streamed per batch.
    * `.tmp` files from failed attempts are invisible (suffix filter). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val confEnvelope = new SerializableHadoopConf(hconf)
    val (fs, dirPath) = fsFor(dir, hconf)
    val files = fs.listStatus(dirPath).map(_.getPath)
      .filter(_.getName.endsWith(".arrow")).map(_.toString).sorted
    require(files.nonEmpty, s"no .arrow files under $dir")
    val schema: StructType = {
      val allocator = new RootAllocator()
      val in = new BufferedInputStream(fs.open(new Path(files.head)))
      val reader = new ArrowStreamReader(in, allocator)
      try {
        StructType(reader.getVectorSchemaRoot.getSchema.getFields.asScala.map { f =>
          val (dt, md) = RemoteProtocol.fromArrowField(f)
          org.apache.spark.sql.types.StructField(f.getName, dt, nullable = true, md)
        }.toSeq)
      } finally { reader.close(); in.close(); allocator.close() }
    }
    val rdd = spark.sparkContext.parallelize(files.toSeq, files.length).flatMap { pathStr =>
      val path = new Path(pathStr)
      val pfs = path.getFileSystem(confEnvelope.value)
      val allocator = new RootAllocator()
      val in = new BufferedInputStream(pfs.open(path))
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
