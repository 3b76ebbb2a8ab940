package graft.raster

/** Driver-captured, executor-restored remote-IO session state — the
  * analog of the reference's credential plumbing: the driver computes
  * auth/session settings once (`loader/_aws.py:160-202`
  * `get_aws_settings` bakes frozen credentials into the rio config),
  * the plan CAPTURES them (`_rio.py:478-491` `capture_rio_env`), and
  * every worker task RESTORES them before its first read
  * (`_rio.py:126-176` thread-local session setup). Here the payload is
  * a scheme → request-header map (bearer tokens, signed-URL session
  * headers) and restore registers header-attaching [[HttpRangeSource]]s
  * into the JVM-local [[RasterIO]] registry.
  *
  * Transport: the payload rides a Spark BROADCAST, never plain fields
  * of a task closure — closures are written into stage metadata and
  * easily end up in logs/UIs; broadcast blocks are not. `toString` is
  * masked for the same reason.
  */
final case class IoCredentials(version: Long,
    headers: Map[String, Map[String, String]]) {
  /** Masked: credentials must never reach logs via toString. */
  override def toString: String =
    s"IoCredentials(v$version, schemes=[${headers.keys.toSeq.sorted.mkString(",")}])"
}

object IoSession {

  /** Driver-side "current session" (the `set_default_rio_config`
    * global); what [[capture]] snapshots at plan time. */
  @volatile private var current: Option[IoCredentials] = None
  /** Last payload version restored into THIS JVM's registry. */
  @volatile private var installedVersion: Long = -1L
  private val versions = new java.util.concurrent.atomic.AtomicLong(0)

  /** Configure the driver-side session: `scheme -> request headers`.
    * Returns the versioned payload (each configure bumps the version so
    * executors re-install on credential refresh — the STS-refresh
    * concern of `get_aws_settings`). */
  def configure(headers: Map[String, Map[String, String]]): IoCredentials = {
    val c = IoCredentials(versions.incrementAndGet(), headers)
    current = Some(c)
    c
  }

  /** Environment capture (the `aws_unsigned_check_env` pattern):
    * `GRAFT_IO_BEARER` becomes an `Authorization: Bearer` header for
    * http/https. Returns None when nothing is configured. */
  def configureFromEnv(env: Map[String, String] = sys.env): Option[IoCredentials] =
    env.get("GRAFT_IO_BEARER").map { tok =>
      val h = Map("Authorization" -> s"Bearer $tok")
      configure(Map("http" -> h, "https" -> h))
    }

  /** Plan-time capture (the `capture_rio_env` analog): what Load
    * broadcasts to its read tasks. None = nothing to restore. */
  def capture(): Option[IoCredentials] = current

  def clear(): Unit = current = None

  /** Executor-side restore, idempotent per payload version: register a
    * header-attaching source for every scheme in the payload. Runs at
    * the top of each read task (cheap version check after the first).
    * `mk` is the source factory — overridable for non-HTTP schemes or
    * test policies. */
  def restore(creds: IoCredentials,
              mk: Map[String, String] => RasterByteSource =
                hs => new HttpRangeSource(headers = hs)): Unit =
    synchronized {
      if (installedVersion != creds.version) {
        creds.headers.foreach { case (scheme, hs) =>
          RasterIO.register(scheme, mk(hs))
        }
        installedVersion = creds.version
      }
    }
}
