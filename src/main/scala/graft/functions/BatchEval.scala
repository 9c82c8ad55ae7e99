package graft.functions

/**
 * Side registry of column-at-a-time evaluators for registered scalar
 * functions — consulted by hosts that already hold whole batches (the remote
 * [[graft.remote.UdfServer]]) so guest-SPI functions amortize per-call
 * dispatch: pool lookups, compiled-handle resolution and export hashing
 * happen once per batch instead of once per row (reference JS batched mode,
 * `arrow-udf-runtime/src/javascript/mod.rs:536-625`).
 *
 * An entry is keyed by function name and carries the signature it was built
 * for: a caller must check the resolved signature matches before using it
 * (names can be overloaded; the batch evaluator is not).
 *
 * Only `ReturnNullOnNullInput`, non-fallible scalars register here — batch
 * null semantics are null-in → null-out, and per-row error capture needs the
 * row loop.
 */
object BatchEval {
  /** fname → (signature string, (cols, rows) => results). Null inputs yield
    * null outputs; results array length == rows. */
  val overrides = scala.collection.concurrent.TrieMap
    .empty[String, (String, (Seq[Array[Any]], Int) => Array[Any])]
}
