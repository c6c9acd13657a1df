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
object SpinProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val iters = 600000000L
    val out = new Array[Long](n)
    val threads = Array.tabulate(n) { k =>
      new Thread(() => {
        var x: Long = k
        var j = 0L
        while (j < iters) { x = x * 6364136223846793005L + 1442695040888963407L; j += 1 }
        out(k) = x
      })
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    // out is ignored; the array write defeats dead-code elimination
    println(f"SPIN_GOPS=${n * iters / sec / 1e9}%.4f")
  }
}
