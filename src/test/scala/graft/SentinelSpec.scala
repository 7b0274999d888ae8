package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Sentinel

/** The round-4 bench artifact was contention-contaminated yet self-reported
  * `valid: true` — the old sentinel spun only before/after the run, so a
  * load starting after the pre-spin and ending before the post-spin was
  * invisible. [[Sentinel]] closes that blind spot with a mid-run
  * other-process CPU sampler (/proc/stat minus /proc/self/stat). This spec
  * injects exactly that failure shape: external load that starts AFTER
  * start() and ends BEFORE stop(), and asserts the flag flips. */
class SentinelSpec extends AnyFunSuite {

  test("mid-run external load flips valid to false (round-4 blind spot)") {
    val s = new Sentinel(periodMs = 500)
    s.start()
    // External load: subprocesses (NOT this JVM — /proc/self excludes
    // them), mimicking a concurrent sbt/bench on the box. 8 spinners for
    // ~3 s covers several 500 ms sampler windows.
    val procs = (1 to 8).map { _ =>
      new ProcessBuilder("sh", "-c", "t=$(($(date +%s)+3)); while [ $(date +%s) -lt $t ]; do :; done")
        .start()
    }
    procs.foreach(_.waitFor())
    Thread.sleep(700) // one more clean window so load is strictly mid-run
    val rep = s.stop()
    assert(rep.windows >= 2, s"sampler took too few windows: $rep")
    assert(rep.extMax > 2.0, s"8 external spinners must exceed 2 cores in some window: $rep")
    assert(!rep.valid, s"mid-run contamination must invalidate the run: $rep")
    assert(rep.json.contains("\"valid\":false"))
  }

  test("sampler attributes this JVM's own load to self, not external") {
    val s = new Sentinel(periodMs = 500)
    s.start()
    // Heavy SELF load (in-process threads): must NOT count as external.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (1 to 8).map { _ =>
      val t = new Thread(() => { var x = 1L; while (!stop.get()) x = x * 6364136223846793005L + 1442695040888963407L; if (x == 42) println("") })
      t.setDaemon(true); t.start(); t
    }
    Thread.sleep(2500)
    stop.set(true); threads.foreach(_.join(1000))
    val rep = s.stop()
    assert(rep.windows >= 2)
    // Self-load subtraction: external estimate stays far below the 8 cores
    // this JVM just burned. (Other processes on a shared box contribute
    // noise; the bound is deliberately loose but far below 8.)
    assert(rep.extMean < 4.0, s"self load leaked into external estimate: $rep")
  }
}
