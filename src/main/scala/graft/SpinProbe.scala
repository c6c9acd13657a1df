package graft

/** Pure-CPU busy-loop probe (registers only — no memory traffic): measures
  * the parallel throughput the HOST actually delivers at a given thread
  * count right now. [[Bench]] runs it taskset-pinned before/after each
  * scaling pair to detect host co-tenancy bursts: when even a busy-loop
  * fails to scale N→4N, the box cannot evidence algorithmic scaling in that
  * window and the pair is discarded (instrument check, not a result filter —
  * the engine is never measured by the probe).
  *
  * stdout: `SPIN_GOPS=<double>`
  */
/** Streaming memory-bandwidth probe: each thread sums a private 64 MB long
  * array repeatedly; prints aggregate GB/s. Detects host memory-bandwidth
  * steal that a register-only busy-loop cannot see (observed: engine builds
  * slowing 25% while SpinProbe read ~1.0 scaling).
  */
object MemBwProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val words = 8 * 1024 * 1024 // 64 MB per thread
    val passes = 6
    val arrays = Array.fill(n)(Array.tabulate(words)(i => i.toLong))
    val sink = new Array[Long](n)
    val threads = Array.tabulate(n) { k =>
      new Thread(() => {
        val a = arrays(k)
        var s = 0L
        var p = 0
        while (p < passes) {
          var i = 0
          while (i < a.length) { s += a(i); i += 1 }
          p += 1
        }
        sink(k) = s
      })
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    val bytes = n.toLong * words * 8L * passes
    println(f"MEMBW_GBPS=${bytes / sec / 1e9}%.3f")
  }
}

/** Register-only busy threads that run until the process is killed — the
  * socket-load BALLAST for [[Bench]]'s scaling pairs: during the N-core
  * build it occupies the other 4N-N cores of the build's core block so the
  * same number of cores is busy in both halves of a pair. This VM's clock
  * is load-dependent (an idle socket turbo-boosts a 2-core build ~10-15%
  * over the 8-core build's clock), which deflates the measured N→4N ratio
  * with an artifact that has NO cluster analog — a cluster's per-executor
  * clock does not depend on how many executors the job uses. The ballast is
  * register-only (no memory traffic) and pinned off the build's cores, so
  * it equalizes frequency state without competing for the measured
  * resources.
  */
object BallastSpin {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val out = new Array[Long](n)
    val threads = Array.tabulate(n) { k =>
      new Thread(() => {
        var x: Long = k
        while (true) {
          var j = 0
          while (j < 1000000) { x = x * 6364136223846793005L + 1442695040888963407L; j += 1 }
          out(k) = x // visible side effect each block; loop runs until kill
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
  }
}

object SpinProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    // Three barrier-synchronized ~0.45 s windows; report the MAX window.
    // Host steal or a descheduled probe thread only ever LOWERS a busy-loop
    // reading, never raises it, so the best window is the cleanest estimate
    // of the clock the host can deliver right now — one sub-window burst no
    // longer poisons the reading (observed: a descheduled single-window
    // probe read 0.35 Gops vs the ~1.5 neighborhood, blowing the pair's
    // clock_spread to 4.4 and inflating its hw-eff ratio). Same total spin
    // work as the old single 1.3 s window, so probe wall time is unchanged;
    // per-window noise stays ~±1-2%.
    val windows = 3
    val iters = 400000000L
    val out = new Array[Long](n)
    val gate = new java.util.concurrent.CyclicBarrier(n + 1)
    val threads = Array.tabulate(n) { k =>
      new Thread(() => {
        var x: Long = k
        var w = 0
        while (w < windows) {
          gate.await()
          var j = 0L
          while (j < iters) { x = x * 6364136223846793005L + 1442695040888963407L; j += 1 }
          gate.await()
          w += 1
        }
        out(k) = x
      })
    }
    threads.foreach(_.start())
    var best = 0.0
    var w = 0
    while (w < windows) {
      gate.await()
      val t0 = System.nanoTime()
      gate.await()
      val sec = (System.nanoTime() - t0) / 1e9
      best = math.max(best, n * iters / sec / 1e9)
      w += 1
    }
    threads.foreach(_.join())
    // out is ignored; the array write defeats dead-code elimination
    println(f"SPIN_GOPS=$best%.4f")
  }
}
