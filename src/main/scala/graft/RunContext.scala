package graft

/** Run-scoped context for the oracle dump.
  *
  * Several oracles read parquet artifacts that their QUERY lands under
  * per-dir tmp paths (the persisted-index / landed-rotation pattern).
  * The dump-time SQL must point at the artifact for the dir THIS run
  * verified — previously each module tracked that through a
  * `@volatile var last*Path` mutated as a side effect of query
  * execution, so a consumer that fetched `oracleSql` before (or
  * without) running the producer got SQL aimed at a default or stale
  * artifact. Instead, [[Verify]] (and any other harness) sets
  * [[oracleDir]] ONCE, deterministically, before running anything, and
  * every artifact-reading oracle derives its path from it with the
  * same pure `path(dir)` function the query side uses. */
object RunContext {
  /** The sf dir the current verification run targets. Oracle SQL defs
    * are re-evaluated at dump time, so setting this before the dump is
    * sufficient; the default keeps ad-hoc REPL use pointed at the dev
    * fixture. */
  @volatile var oracleDir: String = "/root/testdata/sf0.01"
}
