package graft

import java.util.Collections

import org.apache.spark.SparkConf
import org.apache.spark.api.plugin.PluginContext
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.{GraftPlugin, GraftRegistrar}
import graft.providers.ModelRegistry
import graft.store.{BroadcastBruteForceStore, VectorStoreRegistry}

/** Registrar used reflectively by the plugin tests (needs a stable
  * top-level name + no-arg constructor, like a deployment's would). */
final class PluginTestRegistrar extends GraftRegistrar {
  override def register(): Unit = {
    ModelRegistry.register(graft.providers.ModelSpec(
      "plugin_test_model", provider = "mock", task = "embedding",
      connection = "none", dim = 8))
    VectorStoreRegistry.register("plugin_test_store",
      new BroadcastBruteForceStore(Array(("d1", "c1", Array(1f, 0f)))))
  }
}

/** The cluster-deployment seam for the per-JVM catalogs: GraftPlugin must
  * run the conf-named registrars on both plugin components, so the SQL
  * ml_predict / vector_search registries exist on every executor JVM —
  * local[N] shares one JVM, a 1000-executor cluster does not. */
class GraftPluginSpec extends AnyFunSuite with Matchers {

  private def stubCtx(sparkConf: SparkConf): PluginContext = new PluginContext {
    override def conf(): SparkConf = sparkConf
    override def executorID(): String = "stub"
    override def hostname(): String = "localhost"
    override def metricRegistry(): com.codahale.metrics.MetricRegistry = null
    override def resources(): java.util.Map[String, org.apache.spark.resource.ResourceInformation] =
      Collections.emptyMap()
    override def send(message: Any): Unit = ()
    override def ask(message: Any): AnyRef = null
  }

  test("executor plugin runs conf-named registrars at init") {
    ModelRegistry.clear()
    VectorStoreRegistry.clear()
    val conf = new SparkConf()
      .set(GraftPlugin.RegistrarsKey, "graft.PluginTestRegistrar")
    new GraftPlugin().executorPlugin().init(stubCtx(conf), Collections.emptyMap())
    ModelRegistry.get("plugin_test_model").dim shouldBe 8
    VectorStoreRegistry.get("plugin_test_store").size shouldBe 1
  }

  test("reference registrar populates the reference models") {
    ModelRegistry.clear()
    GraftPlugin.runRegistrars("graft.core.ReferenceModelsRegistrar")
    ModelRegistry.get("openaiembed").task shouldBe "embedding"
    ModelRegistry.get("coaching_response_generator").task shouldBe "text_generation"
  }

  test("unknown or wrong-typed registrars fail loudly, empty conf is a no-op") {
    GraftPlugin.runRegistrars("") // no-op
    GraftPlugin.runRegistrars("  ") // no-op
    val e = intercept[IllegalArgumentException] {
      GraftPlugin.runRegistrars("com.acme.DoesNotExist")
    }
    e.getMessage should include("cannot instantiate")
    val e2 = intercept[IllegalArgumentException] {
      GraftPlugin.runRegistrars("java.lang.StringBuilder")
    }
    e2.getMessage should include("not a GraftRegistrar")
  }
}
