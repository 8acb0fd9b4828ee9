package graft.tools

/** Hardware scaling floor probe for the BASELINE.md protocol note —
  * no Spark involved. Measures thread-scaling of
  *   (a) a pure-register ALU loop (xorshift64) and
  *   (b) a DRAM-streaming loop (strided sum over a per-thread 256 MB
  *       Long array — defeats L2/L3 reuse)
  * at a given thread count. Run under the same `taskset` pinning as
  * the Bench scale runs; the ratio of (b) across levels is the ceiling
  * any shuffle/scan-bound Spark stage can reach on this box, because
  * every local[] thread shares one memory bus — the dimension a real
  * multi-executor cluster scales and a single host cannot.
  *
  * Usage: HwScaling <threads> [seconds-per-test]
  * Prints: HWSCALE threads=N alu_ops=X stream_bytes=Y (per second,
  * summed over threads).
  */
object HwScaling {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(4)
    val secs = args.lift(1).map(_.toInt).getOrElse(8)

    def runAll(body: () => Long): Long = {
      val totals = new java.util.concurrent.atomic.AtomicLong()
      val ts = (0 until threads).map { _ =>
        new Thread(() => { totals.addAndGet(body()); () })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      totals.get()
    }

    // (a) ALU: xorshift64 iterations, no memory traffic
    def alu(): Long = {
      val deadline = System.nanoTime() + secs * 1000000000L
      var x = Thread.currentThread().getId | 1L
      var ops = 0L
      while (System.nanoTime() < deadline) {
        var i = 0
        while (i < 1000000) { // check the clock once per M ops
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        ops += 1000000L
      }
      if (x == 42L) println("") // keep the loop observable
      ops
    }

    // (b) stream: strided sum over 256 MB per thread (32M longs)
    def stream(): Long = {
      val n = 32 * 1024 * 1024
      val a = new Array[Long](n)
      java.util.Arrays.fill(a, 3L)
      val deadline = System.nanoTime() + secs * 1000000000L
      var bytes = 0L
      var s = 0L
      while (System.nanoTime() < deadline) {
        var i = 0
        while (i < n) { s += a(i); i += 8 } // one 64B cache line per step
        bytes += n.toLong / 8 * 64
      }
      if (s == 42L) println("")
      bytes
    }

    // (c) random access: dependent pointer-chase over 256 MB per
    // thread — no prefetch, every load a likely LLC/TLB miss. This is
    // the access pattern of hash probing and sort-merge, i.e. of a
    // join/aggregation engine's hot loops.
    def randomWalk(): Long = {
      val n = 32 * 1024 * 1024
      val a = new Array[Int](n)
      // Sattolo cycle: a single permutation cycle to chase
      var i = 0
      while (i < n) { a(i) = i; i += 1 }
      var r = new java.util.Random(Thread.currentThread().getId)
      i = n - 1
      while (i > 0) {
        val j = r.nextInt(i)
        val t = a(i); a(i) = a(j); a(j) = t
        i -= 1
      }
      val deadline = System.nanoTime() + secs * 1000000000L
      var hops = 0L
      var p = 0
      while (System.nanoTime() < deadline) {
        var k = 0
        while (k < 1000000) { p = a(p); k += 1 }
        hops += 1000000L
      }
      if (p == -1) println("")
      hops
    }

    val aluOps = runAll(() => alu()) / secs
    val streamB = runAll(() => stream()) / secs
    val hops = runAll(() => randomWalk()) / secs
    println(s"HWSCALE threads=$threads alu_ops=$aluOps stream_bytes=$streamB random_hops=$hops")
  }
}
