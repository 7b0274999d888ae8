package graft.util

import scala.collection.mutable.ArrayBuffer

/** Contention sentinel for benchmark runs.
  *
  * Two complementary detectors, because each alone has a blind spot:
  *
  *  1. A fixed single-thread spin (splitmix64 chain, result consumed so
  *     the JIT cannot elide it) timed once BEFORE and once AFTER the
  *     suite. On an idle box the two agree within a few percent; steady
  *     external load inflates one. (A spin cannot run DURING the suite —
  *     the benchmark's own executor threads saturate the cores, so a
  *     mid-run spin measures self-load, not contamination.)
  *  2. A background daemon thread samples /proc/stat and /proc/self/stat
  *     every `periodMs` for the WHOLE run and computes, per window, the
  *     CPU cores consumed by OTHER processes (total busy ticks minus this
  *     JVM's own utime+stime). This is immune to self-load and has no
  *     mid-run blind spot: the round-4 bench artifact (BENCH_r04.json,
  *     155 s — 3× the clean 52-64 s) was poisoned by a load that started
  *     after the pre-run spin and ended before the post-run one, so the
  *     spin-only sentinel reported drift 1.013 and `valid: true`.
  *
  * `valid` = spin drift ≤ `driftMax` AND mean external load ≤
  * `extMeanMax` cores AND the fraction of windows above `spikeCores` is
  * ≤ `spikeFracMax`. The spike threshold is a FRACTION, not a single-
  * window maximum, deliberately: the harness that launches benches (sbt
  * parent JVM, the orchestrating agent) occasionally burns a few cores
  * for one window — measured 1 window at 3.4 cores out of 193 on an
  * otherwise idle box — which steals <0.5% of machine-time and is noise,
  * while real contamination (a concurrent compile, test run, or bench
  * leg) holds cores for many consecutive windows and trips both the mean
  * and the fraction immediately.
  */
final class Sentinel(periodMs: Long = 5000, driftMax: Double = 1.25,
                     extMeanMax: Double = 0.5, spikeCores: Double = 2.0,
                     spikeFracMax: Double = 0.05) {

  private val extSamples = ArrayBuffer[Double]() // external cores per window
  @volatile private var stopped = false
  private var thread: Thread = _
  private var spinPre = 0.0

  /** One timed spin (~0.2-0.4 s on an idle core). */
  def spin(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 60000000) {
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      i += 1
    }
    if (x == 42L) println("") // consume
    (System.nanoTime() - t0) / 1e9
  }

  /** Total busy CPU ticks across all cores (user+nice+system+irq+softirq+
    * steal — idle and iowait excluded), from the /proc/stat "cpu" line. */
  private def totalBusyTicks(): Long = {
    val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
    val f = line.split("\\s+")
    // cpu user nice system idle iowait irq softirq steal ...
    f(1).toLong + f(2).toLong + f(3).toLong + f(6).toLong + f(7).toLong +
      (if (f.length > 8) f(8).toLong else 0L)
  }

  /** This process's utime+stime ticks (fields 14/15 of /proc/self/stat;
    * child processes are NOT included — a subprocess counts as external). */
  private def selfTicks(): Long = {
    val s = scala.io.Source.fromFile("/proc/self/stat").mkString
    // comm may contain spaces/parens: split after the closing paren
    val rest = s.substring(s.lastIndexOf(')') + 2).split("\\s+")
    rest(11).toLong + rest(12).toLong // utime, stime (0-based after state)
  }

  /** Warm + time the pre-run spin, start the /proc sampler. */
  def start(): Unit = synchronized {
    spin() // JIT warmup, discarded
    spinPre = spin()
    thread = new Thread(() => {
      val hz = 100.0 // USER_HZ on Linux
      var busy = totalBusyTicks(); var self = selfTicks()
      var t = System.nanoTime()
      while (!stopped) {
        val deadline = t + periodMs * 1000000L
        while (!stopped && System.nanoTime() < deadline) Thread.sleep(50)
        val t2 = System.nanoTime()
        val busy2 = totalBusyTicks(); val self2 = selfTicks()
        val windowSec = (t2 - t) / 1e9
        if (windowSec > 0.5) {
          val extCores = ((busy2 - busy) - (self2 - self)) / hz / windowSec
          extSamples.synchronized { extSamples += math.max(0.0, extCores) }
        }
        busy = busy2; self = self2; t = t2
      }
    }, "graft-sentinel")
    thread.setDaemon(true)
    thread.start()
  }

  case class Report(spinPre: Double, spinPost: Double, drift: Double,
                    extMean: Double, extMax: Double, spikeFrac: Double,
                    windows: Int, valid: Boolean) {
    /** JSON fields (no surrounding braces) for splicing into a bench line. */
    def json: String =
      f""""sentinel_pre_sec":$spinPre%.3f,"sentinel_post_sec":$spinPost%.3f,"sentinel_drift":$drift%.3f,"ext_cpu_mean_cores":$extMean%.2f,"ext_cpu_max_cores":$extMax%.2f,"ext_cpu_spike_frac":$spikeFrac%.3f,"ext_cpu_windows":$windows,"valid":$valid"""
  }

  /** Stop the sampler, take the post-run spin, report. */
  def stop(): Report = synchronized {
    stopped = true
    if (thread != null) thread.join(10000)
    val spinPost = spin()
    val drift = math.max(spinPre, spinPost) /
      math.max(1e-9, math.min(spinPre, spinPost))
    val ext = extSamples.toSeq
    val extMean = if (ext.isEmpty) 0.0 else ext.sum / ext.length
    val extMax = if (ext.isEmpty) 0.0 else ext.max
    val spikeFrac =
      if (ext.isEmpty) 0.0 else ext.count(_ > spikeCores).toDouble / ext.length
    val valid = drift <= driftMax && extMean <= extMeanMax &&
      spikeFrac <= spikeFracMax
    Report(spinPre, spinPost, drift, extMean, extMax, spikeFrac, ext.length,
      valid)
  }
}
