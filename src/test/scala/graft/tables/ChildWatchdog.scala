package graft.tables

/** Self-destruct guard for forked child-JVM test mains (the Crash*Main /
  * CrossProcess*Main family).
  *
  * The SIGKILL-fuzz children are DESIGNED to be killed by their parent
  * spec — which means any path where the parent's kill never lands
  * (latch-timeout assertion thrown before `destroyForcibly`, parent
  * itself killed, a child iteration hanging inside a Spark task) leaves
  * an orphan JVM looping at full CPU forever. Two such orphans were
  * found on this box burning 2.5-3.2 cores each for 4-11.5 HOURS — load
  * that silently inflated every benchmark run sharing the machine (the
  * multi-round "official bench lands 1.2-1.4x over same-code floors"
  * signal). A child that exists to die must guarantee its own death:
  *
  *  - '''parent-death detector''': the parent holds the child's stdin
  *    pipe (ProcessBuilder default); when the parent JVM dies — even by
  *    SIGKILL — the pipe closes and `System.in.read()` returns -1. A
  *    daemon thread blocks on that read and halts the JVM the moment it
  *    fires. No polling, no PID scraping, works across SIGKILL.
  *  - '''hard deadline''': a backstop `Runtime.halt` after `maxSeconds`
  *    (default 15 min — an order of magnitude beyond any legitimate
  *    child run, which lasts seconds) for the case where stdin was
  *    re-plumbed or inherited.
  *
  * `Runtime.halt`, not `System.exit`: a hung Spark task would block
  * shutdown hooks indefinitely — the whole point is to die NOW. Exit
  * code 143 (= SIGTERM's convention) so a watchdog death reads as a
  * kill, never as a clean `XCRASH_DONE` run.
  */
object ChildWatchdog {

  def arm(maxSeconds: Long = 900L): Unit = {
    val deadline = new Thread(() => {
      Thread.sleep(maxSeconds * 1000L)
      System.err.println(s"XCRASH_WATCHDOG deadline ${maxSeconds}s — halting")
      Runtime.getRuntime.halt(143)
    }, "graft-child-deadline")
    deadline.setDaemon(true)
    deadline.start()
    val parent = new Thread(() => {
      try {
        // blocks until the parent-side pipe closes (parent death) or the
        // parent writes something (it never does)
        while (System.in.read() != -1) ()
      } catch { case _: Throwable => () }
      System.err.println("XCRASH_WATCHDOG parent gone — halting")
      Runtime.getRuntime.halt(143)
    }, "graft-child-parent-death")
    parent.setDaemon(true)
    parent.start()
  }
}
