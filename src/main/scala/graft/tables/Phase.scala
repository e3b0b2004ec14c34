package graft.tables

/** Env-gated driver-side phase timer (dev tool). `GRAFT_PROFILE_COMMIT=1`
  * prints per-phase wall ms for commit-path internals; otherwise zero
  * overhead beyond a boolean check. */
private[graft] object Phase {
  private val on = sys.env.get("GRAFT_PROFILE_COMMIT").contains("1")
  private val t0 = System.nanoTime()
  @inline def apply[T](label: String)(f: => T): T =
    if (!on) f
    else {
      val s = System.nanoTime()
      try f
      finally {
        val e = System.nanoTime()
        println(f"[phase] $label start=${(s - t0) / 1e6}%.0fms took=${(e - s) / 1e6}%.1fms")
      }
    }
}
