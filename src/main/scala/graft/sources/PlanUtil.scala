package graft.sources

/** Driver-side planning helpers shared by the DSv2 raster sources. */
private[sources] object PlanUtil {

  /** Order-preserving parallel map over a bounded pool — scan planning
    * reads one header per file, and serializing that metadata I/O is the
    * classic driver stall once a table spans thousands of files. Falls
    * back to a plain map for small inputs (pool spin-up costs more than
    * it saves). */
  def parMap[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    if (xs.lengthCompare(4) <= 0) return xs.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, xs.length))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = xs.map(x =>
        new java.util.concurrent.Callable[B] { def call(): B = f(x) })
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }
}
