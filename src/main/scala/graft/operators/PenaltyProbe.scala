package graft.operators

/** Dev probe: the host parallel-capacity penalty by itself — the same
  * spin calibration Bench runs (min-of-N on both axes, thread count
  * clamped to hardware threads), without paying a bench pass. The
  * floor-re-stamp discipline needs a quiet window (penalty ≤~1.4);
  * this is the cheap poll that finds one.
  *
  * sbt "runMain graft.operators.PenaltyProbe [samples]"
  */
object PenaltyProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    def spin(iters: Long): Long = {
      var i = 0L; var s = 0L
      while (i < iters) { s += i * i; i += 1 }; s
    }
    val hw = Runtime.getRuntime.availableProcessors
    val calIters = 400000000L
    spin(calIters / 10) // JIT warm
    (1 to reps).foreach { r =>
      val one = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); spin(calIters); (System.nanoTime() - t0) / 1e9
      }.min
      val many = (1 to 3).map { _ =>
        val threads = (1 to hw).map(_ => new Thread(() => { spin(calIters); () }))
        val t0 = System.nanoTime()
        threads.foreach(_.start()); threads.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[penalty] rep$r 1-way $one%.3f s  $hw-way $many%.3f s  penalty ${many / one}%.3f")
    }
  }
}
