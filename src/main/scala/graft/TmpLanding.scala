package graft

/** Tmp landing-path scheme for built artifacts that bridge the engine
  * and the DuckDB oracle (`<tmpdir>/<prefix>_<sanitized dir>_p<pid>`),
  * shared by every dir-keyed similarity cache (ANN edges, IVF/PQ
  * indexes, cluster samples, kNN graph).
  *
  * Two hazards this closes (r14 advice):
  *   - Cross-JVM races / hashCode aliasing: the old `dir.hashCode`
  *     fingerprints were per-dir but NOT per-process, while the
  *     landed-ness latch is per-application — two concurrent JVMs on
  *     the same dir (Bench beside Verify) both missed their own latch
  *     and raced overwrite-vs-read on one directory, and distinct dirs
  *     could alias on a hashCode collision. Sanitized dir + pid gives
  *     every JVM its own artifact; the oracle side is safe because the
  *     dumped DuckDB SQL embeds the literal path at dump time, in the
  *     same JVM that builds it.
  *   - Accumulation: per-pid paths never reuse a dead JVM's directory,
  *     so repeated test/bench/verify runs would pile up parquet dirs in
  *     tmp indefinitely. The first path request per (JVM, prefix)
  *     sweeps same-prefix directories whose embedded pid is no longer
  *     alive — bounding the pile to the artifacts of LIVE processes
  *     plus at most one dead generation (swept on the next JVM's first
  *     use, which is after the driver's post-exit DuckDB compare has
  *     read them). Deleting on JVM exit instead would break exactly
  *     that compare, which reads the landed paths after Verify exits.
  */
object TmpLanding {

  private val swept = java.util.concurrent.ConcurrentHashMap
    .newKeySet[String]()

  /** The landing path for `prefix` keyed by source `dir`; sweeps stale
    * same-prefix dirs from dead JVMs once per (JVM, prefix). */
  def path(prefix: String, dir: String): String = {
    sweepStale(prefix)
    val fp = dir.replaceAll("[^A-Za-z0-9]", "_")
    val pid = ProcessHandle.current().pid()
    s"${sys.props("java.io.tmpdir")}/${prefix}_${fp}_p$pid"
  }

  private def sweepStale(prefix: String): Unit =
    if (swept.add(prefix)) scala.util.Try {
      val self = ProcessHandle.current().pid()
      val pat = java.util.regex.Pattern
        .compile(java.util.regex.Pattern.quote(prefix) + "_.+_p(\\d+)")
      val tmp = new java.io.File(sys.props("java.io.tmpdir"))
      Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach { f =>
          val m = pat.matcher(f.getName)
          if (m.matches()) {
            val pid = m.group(1).toLong
            // liveness, not age: a concurrently-running sibling JVM's
            // artifact must survive (pid reuse can spare a dead dir for
            // one more generation — bounded staleness, never a race)
            val alive = pid == self || ProcessHandle.of(pid)
              .map[java.lang.Boolean](h => h.isAlive)
              .orElse(java.lang.Boolean.FALSE)
            if (!alive) scala.util.Try(rm(f))
          }
        }
    }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
    f.delete()
  }
}
