package graft.raster

/** Driver-captured, executor-restored remote-IO session state — the
  * analog of the reference's credential plumbing: the driver computes
  * auth/session settings once (`loader/_aws.py:160-202`
  * `get_aws_settings` bakes frozen credentials into the rio config),
  * the plan CAPTURES them (`_rio.py:478-491` `capture_rio_env`), and
  * every worker task RESTORES them before its first read
  * (`_rio.py:126-176` thread-local session setup). Here the payload is
  * an ORIGIN → request-header map (bearer tokens, signed-URL session
  * headers) and restore decorates the JVM-local [[RasterIO]] sources
  * with origin-matched header attachment.
  *
  * Credentials are scoped by origin (`scheme://host[:port]`), never by
  * bare scheme: a mixed-source catalog (your authed endpoint plus
  * public third-party hosts) must not broadcast the bearer token to
  * every https host it touches. [[HttpRangeSource]] attaches a header
  * set only when the request URL's normalized origin equals the
  * configured origin.
  *
  * Transport: the payload rides a Spark BROADCAST, never plain fields
  * of a task closure — closures are written into stage metadata and
  * easily end up in logs/UIs; broadcast blocks are not. `toString` is
  * masked for the same reason.
  */
final case class IoCredentials(version: Long,
    origins: Map[String, Map[String, String]]) {
  /** Masked: credentials must never reach logs via toString. */
  override def toString: String =
    s"IoCredentials(v$version, origins=[${origins.keys.toSeq.sorted.mkString(",")}])"
}

object IoSession {

  /** Driver-side "current session" (the `set_default_rio_config`
    * global); what [[capture]] snapshots at plan time. */
  @volatile private var current: Option[IoCredentials] = None
  /** Last payload version restored into THIS JVM's registry. */
  @volatile private var installedVersion: Long = -1L
  /** Schemes whose registered source THIS JVM decorated — so a newer
    * payload (including the empty clear() payload) resets them before
    * applying its own origins; stale headers never outlive a refresh. */
  private var installedSchemes: Set[String] = Set.empty
  private val versions = new java.util.concurrent.atomic.AtomicLong(0)

  /** Shared origin normalization: `Some(scheme://host[:port])`
    * (lowercase scheme+host, default ports 80/443 dropped, path/query
    * ignored), or None when no host can be parsed — ONE implementation
    * for both the config side ([[normalizeOrigin]], which throws) and
    * the request side ([[originOf]], which must not). */
  def parseOrigin(o: String): Option[String] =
    for {
      u <- scala.util.Try(java.net.URI.create(o)).toOption
      scheme <- Option(u.getScheme).map(_.toLowerCase)
      host <- Option(u.getHost).map(_.toLowerCase)
    } yield {
      val port = u.getPort match {
        case -1 => -1
        case 80 if scheme == "http" => -1
        case 443 if scheme == "https" => -1
        case p => p
      }
      if (port == -1) s"$scheme://$host" else s"$scheme://$host:$port"
    }

  /** Request-side origin: None (no match, no headers attached) instead
    * of throwing — a read of an odd-but-servable URI must not die in
    * origin parsing when it needs no credentials at all. */
  def originOf(uri: String): Option[String] = parseOrigin(uri)

  /** Normalized `scheme://host[:port]`. Throws on a bare scheme or a
    * host java.net.URI cannot parse — scheme-wide credentials are
    * exactly the cross-host leak this seam exists to prevent, and a
    * configured endpoint that silently never matches (e.g. an
    * underscore hostname URI rejects) would be a 401 with no
    * diagnostic. */
  def normalizeOrigin(o: String): String = {
    require(o.contains("://"),
      s"credential key '$o' must be an origin (scheme://host[:port]); " +
        "bare-scheme credentials would be sent to every host")
    parseOrigin(o).getOrElse(throw new IllegalArgumentException(
      s"credential origin '$o' has no parsable host (java.net.URI " +
        "rejects e.g. underscore hostnames; use the resolved address)"))
  }

  private def schemeOf(origin: String): String =
    origin.substring(0, origin.indexOf("://"))

  /** Configure the driver-side session: `origin -> request headers`.
    * Returns the versioned payload (each configure bumps the version so
    * executors re-install on credential refresh — the STS-refresh
    * concern of `get_aws_settings`). */
  def configure(origins: Map[String, Map[String, String]]): IoCredentials = {
    val c = IoCredentials(versions.incrementAndGet(),
      origins.map { case (o, h) => normalizeOrigin(o) -> h })
    current = Some(c)
    c
  }

  /** Environment capture (the `aws_unsigned_check_env` pattern):
    * `GRAFT_IO_BEARER` becomes an `Authorization: Bearer` header for
    * each origin listed in `GRAFT_IO_BEARER_ORIGINS` (comma-separated
    * `scheme://host[:port]`). Both variables are required: a bearer
    * with no origin list would have to be attached host-wide, which is
    * the leak — so it configures nothing. Returns None when not (or
    * incompletely) configured. */
  def configureFromEnv(env: Map[String, String] = sys.env): Option[IoCredentials] = {
    val out = for {
      tok <- env.get("GRAFT_IO_BEARER")
      origins <- env.get("GRAFT_IO_BEARER_ORIGINS")
      list = origins.split(',').map(_.trim).filter(_.nonEmpty)
      if list.nonEmpty
    } yield {
      val h = Map("Authorization" -> s"Bearer $tok")
      configure(list.map(_ -> h).toMap)
    }
    // a bearer with no origin list must not be silently dropped: the
    // next read against the authed endpoint would 401 with nothing
    // pointing at the missing variable
    if (out.isEmpty && env.contains("GRAFT_IO_BEARER"))
      System.err.println(
        "[graft.io] WARNING: GRAFT_IO_BEARER is set but " +
          "GRAFT_IO_BEARER_ORIGINS is missing/empty — no credentials " +
          "configured (origin scoping is required; set e.g. " +
          "GRAFT_IO_BEARER_ORIGINS=https://data.example.com)")
    out
  }

  /** Plan-time capture (the `capture_rio_env` analog): what Load
    * broadcasts to its read tasks. None = nothing was ever configured
    * in this session, so there is nothing to restore OR de-register. */
  def capture(): Option[IoCredentials] = current

  /** Drop the driver session. Produces a versioned EMPTY payload (not
    * None): subsequent loads broadcast it and [[restore]] strips the
    * previously-attached origin headers from executor registries —
    * cleared credentials stop being sent, not merely stop being
    * re-sent. */
  def clear(): Unit =
    current = Some(IoCredentials(versions.incrementAndGet(), Map.empty))

  /** Executor-side restore, idempotent per payload version. For each
    * scheme touched by the payload (or decorated by an earlier one),
    * DECORATE the currently-registered source via
    * [[RasterByteSource.withOriginHeaders]] — never replace it, so a
    * deployment's custom [[GraftIoPlugin]] source keeps its policy
    * (its default `withOriginHeaders` is a no-op). `mkDefault` supplies
    * a source only when the scheme has none registered at all. */
  def restore(creds: IoCredentials,
              mkDefault: String => RasterByteSource =
                _ => new HttpRangeSource()): Unit =
    synchronized {
      // strictly newer only: a straggler task carrying an OLDER
      // broadcast payload must not reinstall stale credentials over a
      // later refresh or clear()
      if (installedVersion < creds.version) {
        val bySch: Map[String, Map[String, Map[String, String]]] =
          creds.origins.groupBy { case (o, _) => schemeOf(o) }
        (installedSchemes ++ bySch.keySet).foreach { sch =>
          val base = RasterIO.get(sch).getOrElse(mkDefault(sch))
          RasterIO.register(sch,
            base.withOriginHeaders(bySch.getOrElse(sch, Map.empty)))
        }
        installedSchemes = bySch.keySet
        installedVersion = creds.version
      }
    }
}
