package graft.core

import java.util.{Map => JMap}

import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}

/** A named registration bundle for the engine's per-JVM catalogs
  * (ModelRegistry, ConnectionRegistry, VectorStoreRegistry). Must have a
  * no-arg constructor — [[GraftPlugin]] instantiates it reflectively on
  * every JVM in the cluster. */
trait GraftRegistrar {
  def register(): Unit
}

/** Populates the reference catalogs (the `CREATE MODEL` /
  * `CREATE CONNECTION` DDL analogs, generate_personalized_commands
  * .sh:191-259). The default registrar a deployment can start from. */
final class ReferenceModelsRegistrar extends GraftRegistrar {
  override def register(): Unit =
    graft.providers.ModelRegistry.registerReferenceModels()
}

/** Cluster wiring for the per-JVM catalogs: the SQL `ml_predict` /
  * `vector_search` functions resolve models and stores through
  * process-local registries, which local[N] shares implicitly but a real
  * cluster does not — every executor JVM needs the same registrations.
  * This SparkPlugin runs the registrars named in
  * `spark.graft.registrars` (comma-separated [[GraftRegistrar]] class
  * names) on the driver AND on every executor at startup:
  *
  * {{{
  * spark-submit
  *   --conf spark.plugins=graft.core.GraftPlugin
  *   --conf spark.graft.registrars=graft.core.ReferenceModelsRegistrar,com.acme.ProdStores
  * }}}
  *
  * Registration failures propagate and fail the JVM's startup — a
  * half-registered executor would otherwise surface as per-task
  * "unknown model" errors deep in a job. */
class GraftPlugin extends SparkPlugin {

  override def driverPlugin(): DriverPlugin = new DriverPlugin {
    override def init(sc: SparkContext, ctx: PluginContext): JMap[String, String] = {
      GraftPlugin.runRegistrars(sc.getConf.get(GraftPlugin.RegistrarsKey, ""))
      java.util.Collections.emptyMap()
    }
  }

  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def init(ctx: PluginContext, extraConf: JMap[String, String]): Unit =
      GraftPlugin.runRegistrars(ctx.conf.get(GraftPlugin.RegistrarsKey, ""))
  }
}

object GraftPlugin {
  val RegistrarsKey = "spark.graft.registrars"

  def runRegistrars(names: String): Unit =
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { n =>
      val inst =
        try Class.forName(n).getDeclaredConstructor().newInstance()
        catch { case e: ReflectiveOperationException =>
          throw new IllegalArgumentException(
            s"$RegistrarsKey: cannot instantiate registrar '$n'", e)
        }
      inst match {
        case r: GraftRegistrar => r.register()
        case other => throw new IllegalArgumentException(
          s"$RegistrarsKey: '$n' is not a GraftRegistrar " +
            s"(got ${other.getClass.getName})")
      }
    }
}
