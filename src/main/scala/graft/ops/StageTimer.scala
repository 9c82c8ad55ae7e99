package graft.ops

/** SPARK_GRAFT_STAGE_TIMES=1: stderr wall-clock marks on eager boundaries
  * inside multi-pass operators — optimization-round attribution
  * instrumentation shared by the ops that need it. Off by default: one env
  * check at class load, zero per-call overhead. */
private[graft] object StageTimer {
  val on: Boolean = sys.env.contains("SPARK_GRAFT_STAGE_TIMES")
  def mark(tag: String, t0: Long): Unit = if (on)
    System.err.println(f"[ops] $tag +${(System.nanoTime - t0) / 1e9}%.3f s")
}
