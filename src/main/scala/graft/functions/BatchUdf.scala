package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/**
 * Column-at-a-time (batched) kernel evaluation — the engine's analogue of the
 * reference's JS batched mode (`javascript/mod.rs:536-625`, SURVEY §2.1 #20):
 * the kernel sees whole argument columns for a chunk of rows instead of one
 * row at a time, amortizing call overhead and enabling columnar math.
 *
 * Chunks hold at most `batchSize` rows (reference `BATCH_SIZE = 1024`);
 * memory stays bounded at one chunk per task. This is the integration shape a
 * vectorized-library binding (BLAS, tokenizers, media codecs) plugs into.
 */
object BatchUdf {

  /**
   * Append `outName` computed by a batched kernel.
   *
   * @param kernel receives one Array per input column (length = chunk rows,
   *               null entries for SQL NULLs) and returns the result column
   *               (same length).
   */
  def withBatchColumn(df: DataFrame, outName: String, inputCols: Seq[String],
                      retType: DataType, batchSize: Int = 1024)(
                      kernel: Seq[Array[Any]] => Array[Any]): DataFrame = {
    val idx = inputCols.map(df.schema.fieldIndex)
    val outSchema = StructType(df.schema.fields :+ StructField(outName, retType))
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        val cols = idx.map { i =>
          val a = new Array[Any](chunk.size)
          var r = 0
          while (r < chunk.size) { a(r) = chunk(r).get(i); r += 1 }
          a
        }
        val out = kernel(cols)
        require(out.length == chunk.size,
          s"batched kernel returned ${out.length} values for ${chunk.size} rows")
        chunk.iterator.zipWithIndex.map { case (row, r) =>
          Row.fromSeq(row.toSeq :+ out(r))
        }
      }
    }(enc)
  }
}
