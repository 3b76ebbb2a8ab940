package graft.raster

import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}

/** Cluster deployment hook for the remote-IO seam: [[RasterIO]]'s
  * registry is JVM-local (like GDAL's per-process VSI state), so on a
  * real cluster each executor JVM must register its byte sources before
  * the first task opens a raster. This plugin is that hook — the analog
  * of the reference calling its GDAL env setup from a Dask worker
  * plugin (`_rio.py:65-69` configured per worker):
  *
  * {{{
  *   spark.plugins=graft.raster.GraftIoPlugin
  *   spark.graft.io.sources=s3:com.example.S3ByteSource,gs:com.example.GcsByteSource
  * }}}
  *
  * Each entry is `scheme:class` where the class is a no-arg-constructible
  * [[RasterByteSource]]. Driver and executor JVMs both register (the
  * driver plans headers; executors read pixels). Unknown classes fail
  * the JVM loudly at startup — a misconfigured reader should never get
  * as far as a 100 TB scan that dies on task one. */
class GraftIoPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = new DriverPlugin {
    override def init(sc: SparkContext, ctx: PluginContext)
    : java.util.Map[String, String] = {
      GraftIoPlugin.registerFromConf(sc.getConf.get(GraftIoPlugin.ConfKey, ""))
      java.util.Collections.emptyMap()
    }
  }
  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def init(ctx: PluginContext,
                      extraConf: java.util.Map[String, String]): Unit =
      GraftIoPlugin.registerFromConf(ctx.conf.get(GraftIoPlugin.ConfKey, ""))
  }
}

object GraftIoPlugin {
  val ConfKey = "spark.graft.io.sources"

  /** Parse `scheme:class[,scheme:class...]` and register each source. */
  def registerFromConf(spec: String): Unit =
    spec.split(",").map(_.trim).filter(_.nonEmpty).foreach { entry =>
      val cut = entry.indexOf(':')
      require(cut > 0, s"$ConfKey entry '$entry' is not scheme:class")
      val (scheme, cls) = (entry.substring(0, cut), entry.substring(cut + 1))
      RasterIO.register(scheme,
        Class.forName(cls).getConstructor().newInstance()
          .asInstanceOf[RasterByteSource])
    }
}
