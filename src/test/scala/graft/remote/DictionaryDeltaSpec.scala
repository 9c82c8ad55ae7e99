package graft.remote

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{FieldVector, IntVector, VarCharVector, VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryEncoder, DictionaryProvider}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter, WriteChannel}
import org.apache.arrow.vector.ipc.message.{ArrowDictionaryBatch, MessageSerializer}
import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding}
import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/**
 * DELTA dictionary conformance for graft's shared Arrow decode path
 * ([[RemoteProtocol.batchCellReaders]] behind every wire read site): the
 * Arrow IPC spec lets a producer append dictionary entries mid-stream with
 * an isDelta=true DictionaryBatch instead of re-shipping the whole
 * dictionary. The stream is hand-assembled here (Arrow Java's stock writer
 * only emits replacements), so the bytes are delta-by-construction; the
 * reader must resolve batch 2's indices against the ACCUMULATED dictionary.
 * The wire-level twin (a real pyarrow producer with
 * emit_dictionary_deltas=true through graft's Flight server) lives in
 * FlightServerSpec / flight_client_probe.py --dict-delta.
 */
class DictionaryDeltaSpec extends AnyFunSuite {

  private def utf8Vec(alloc: RootAllocator, name: String, vals: Seq[String]): VarCharVector = {
    val v = new VarCharVector(name, alloc)
    v.allocateNew()
    vals.zipWithIndex.foreach { case (s, i) =>
      if (s == null) v.setNull(i) else v.setSafe(i, s.getBytes(StandardCharsets.UTF_8))
    }
    v.setValueCount(vals.size)
    v
  }

  test("an isDelta DictionaryBatch extends the dictionary for later batches") {
    val alloc = new RootAllocator()
    val enc = new DictionaryEncoding(7L, false, new ArrowType.Int(32, true))
    val dict0 = utf8Vec(alloc, "d", Seq("alpha", "bee"))
    val dictFull = utf8Vec(alloc, "d", Seq("alpha", "bee", "gamma-gamma"))
    val vals1 = utf8Vec(alloc, "s", Seq("alpha", "bee", "alpha", null))
    val vals2 = utf8Vec(alloc, "s", Seq("gamma-gamma", "alpha", "gamma-gamma"))
    val d0 = new Dictionary(dict0, enc)
    val dFull = new Dictionary(dictFull, enc)
    val enc1 = DictionaryEncoder.encode(vals1, d0).asInstanceOf[FieldVector]
    // batch 2 encoded against the FULL dictionary: index 2 only resolves if
    // the reader applied the delta (a replacement-only reader would see a
    // 1-entry dictionary and mis-decode or range-fault)
    val enc2 = DictionaryEncoder.encode(vals2, dFull).asInstanceOf[FieldVector]
    assert(enc2.asInstanceOf[IntVector].get(0) == 2)

    // schema + dict(["alpha","bee"]) + batch1 via the stock writer ...
    val root1 = new VectorSchemaRoot(Seq(enc1.getField).asJava,
      Seq(enc1: FieldVector).asJava, vals1.getValueCount)
    val provider = new DictionaryProvider.MapDictionaryProvider(d0)
    val bos = new ByteArrayOutputStream()
    val w = new ArrowStreamWriter(root1, provider, bos)
    w.start()
    w.writeBatch()
    // ... then a hand-serialized DELTA (only the appended entry) + batch2
    val ch = new WriteChannel(Channels.newChannel(bos))
    val deltaVec = utf8Vec(alloc, "d", Seq("gamma-gamma"))
    val deltaRoot = new VectorSchemaRoot(Seq(deltaVec.getField).asJava,
      Seq(deltaVec: FieldVector).asJava, 1)
    val deltaBatch = new ArrowDictionaryBatch(7L, new VectorUnloader(deltaRoot).getRecordBatch, true)
    try MessageSerializer.serialize(ch, deltaBatch) finally deltaBatch.close()
    val root2 = new VectorSchemaRoot(Seq(enc2.getField).asJava,
      Seq(enc2: FieldVector).asJava, vals2.getValueCount)
    val batch2 = new VectorUnloader(root2).getRecordBatch
    try MessageSerializer.serialize(ch, batch2) finally batch2.close()
    bos.write(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0)) // stream EOS
    val streamBytes = bos.toByteArray
    // the stock writer retains internal dictionary copies that only close()
    // releases (it appends its own EOS, but streamBytes is already captured)
    w.close()

    val reader = new ArrowStreamReader(new ByteArrayInputStream(streamBytes), alloc)
    try {
      val rroot = reader.getVectorSchemaRoot
      def drainBatch(): Seq[Any] = {
        val (readers, done) = RemoteProtocol.batchCellReaders(rroot, reader)
        val out = (0 until rroot.getRowCount).map(i => readers(0)(i))
        done()
        out
      }
      assert(reader.loadNextBatch())
      assert(drainBatch() == Seq("alpha", "bee", "alpha", null))
      assert(reader.loadNextBatch(), "second batch (after the delta) must load")
      assert(drainBatch() == Seq("gamma-gamma", "alpha", "gamma-gamma"))
      assert(!reader.loadNextBatch())
    } finally {
      reader.close()
      Seq(dict0, dictFull, vals1, vals2, enc1, enc2, deltaVec)
        .foreach(v => try v.close() catch { case _: Exception => () })
      root1.close(); root2.close(); deltaRoot.close(); alloc.close()
    }
  }
}
