package graft.engine

import java.net.{URL, URLClassLoader}
import java.util.concurrent.ConcurrentHashMap

/** Per-integration classloader isolation — the Spark-native analog of the
  * reference's forked executor JVM per integration
  * (worker/src/main/scala/com/harrys/hyppo/worker/exec/ExecutorSetup.scala:63-101,
  * which builds an isolated child process so one integration's dependency
  * versions can never clash with another's, or with the worker's own).
  *
  * Here the same guarantee is a CHILD-FIRST URLClassLoader over the
  * integration's jar list: integration code and its dependencies resolve
  * from the integration's own jars before the application classpath, so
  * two integrations may ship conflicting versions of the same library and
  * both load intact. The shared contract — `graft.*` API traits, Spark,
  * Scala, and JDK classes — stays parent-first, because instances must be
  * assignable across the boundary (a child-first copy of
  * [[graft.sources.IntegrationFactory]] would make `asInstanceOf` fail on
  * an otherwise-correct factory).
  *
  * Loaders are cached per jar list (the reference's analog: one live
  * executor process per integration, reused across tasks —
  * worker/.../exec/IntegrationExecutorCache.scala). On a cluster the same
  * jars ship via `--jars`/`spark.jars` and this loader runs identically in
  * each executor JVM.
  */
object IntegrationLoader {

  /** Prefixes always delegated to the parent loader: the cross-boundary
    * contract. Everything else is child-first.
    */
  private[engine] val ParentFirstPrefixes = Seq(
    "java.", "javax.", "jdk.", "sun.", "com.sun.",
    "scala.", "org.apache.spark.", "org.apache.hadoop.", "org.apache.log4j.",
    "org.slf4j.", "graft.")

  private val cache = new ConcurrentHashMap[Seq[String], ClassLoader]()

  final class ChildFirstLoader(urls: Array[URL], parent: ClassLoader)
      extends URLClassLoader(urls, parent) {
    override def loadClass(name: String, resolve: Boolean): Class[_] =
      getClassLoadingLock(name).synchronized {
        val already = findLoadedClass(name)
        val c =
          if (already != null) already
          else if (ParentFirstPrefixes.exists(name.startsWith))
            super.loadClass(name, false)
          else
            try findClass(name)
            catch { case _: ClassNotFoundException => super.loadClass(name, false) }
        if (resolve) resolveClass(c)
        c
      }
  }

  /** The (cached) loader for an integration's jar list; an empty list is
    * the un-isolated application loader (classpath-deployed integrations,
    * the pre-round-6 behavior, still the default).
    */
  def loaderFor(jars: Seq[String]): ClassLoader =
    if (jars.isEmpty) getClass.getClassLoader
    else cache.computeIfAbsent(jars, js =>
      new ChildFirstLoader(
        js.map(p => java.nio.file.Paths.get(p).toUri.toURL).toArray,
        getClass.getClassLoader))

  /** Instantiate `className` (no-arg constructor) inside the isolation
    * boundary for `jars`, typed as the parent-visible contract `T`.
    */
  def instantiate[T](className: String, jars: Seq[String]): T =
    Class.forName(className, true, loaderFor(jars))
      .getDeclaredConstructor().newInstance().asInstanceOf[T]
}
