package graft.engine

import graft.SparkSpec
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Per-integration classloader isolation: compiles throwaway Java sources
  * into jars AT TEST TIME (javax.tools — no fixtures checked in), then
  * asserts the three guarantees the reference gets from forking one
  * executor JVM per integration (ExecutorSetup.scala:63-101):
  * conflicting dependency versions coexist, the graft/Spark contract
  * stays shared, and a jar-deployed factory drives the DSv2 read path
  * end to end.
  */
class IntegrationLoaderSpec extends SparkSpec {

  private def compileToJar(sources: Map[String, String], jarName: String): Path = {
    val work = Files.createTempDirectory("graft-ijar")
    val files = sources.map { case (fqcn, src) =>
      val f = work.resolve(fqcn.replace('.', '/') + ".java")
      Files.createDirectories(f.getParent)
      Files.writeString(f, src).toFile
    }.toSeq
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    val fm = javac.getStandardFileManager(null, null, null)
    val units = fm.getJavaFileObjectsFromFiles(files.asJava)
    val args = java.util.Arrays.asList(
      "-classpath", System.getProperty("java.class.path"), "-d", work.toString)
    assert(javac.getTask(null, fm, null, args, null, units).call(),
      "test-jar compilation failed")
    fm.close()
    val jar = work.resolve(jarName)
    val jos = new java.util.jar.JarOutputStream(Files.newOutputStream(jar))
    Files.walk(work).filter(_.toString.endsWith(".class")).forEach { p =>
      jos.putNextEntry(new java.util.zip.ZipEntry(
        work.relativize(p).toString.replace('\\', '/')))
      jos.write(Files.readAllBytes(p))
      jos.closeEntry()
    }
    jos.close()
    jar
  }

  private def depJar(version: String): Path = compileToJar(Map(
    "graftdemo.Dep" ->
      s"""package graftdemo;
         |public class Dep { public static String value() { return "$version"; } }
         |""".stripMargin), s"dep-$version.jar")

  test("conflicting versions of the same class coexist across loaders") {
    val (v1, v2) = (depJar("V1"), depJar("V2"))
    def value(jar: Path): String =
      Class.forName("graftdemo.Dep", true, IntegrationLoader.loaderFor(Seq(jar.toString)))
        .getMethod("value").invoke(null).asInstanceOf[String]
    value(v1) shouldBe "V1"
    value(v2) shouldBe "V2" // same FQCN, different bytes, both live
  }

  test("the graft/Spark contract is parent-first (instances cross the boundary)") {
    val loader = IntegrationLoader.loaderFor(Seq(depJar("V1").toString))
    val contract = loader.loadClass("graft.sources.IntegrationFactory")
    contract should be theSameInstanceAs
      getClass.getClassLoader.loadClass("graft.sources.IntegrationFactory")
    val sparkCls = loader.loadClass("org.apache.spark.sql.SparkSession")
    sparkCls should be theSameInstanceAs classOf[org.apache.spark.sql.SparkSession]
  }

  test("loaders are cached per jar list; empty list is the app loader") {
    val jar = depJar("V1").toString
    IntegrationLoader.loaderFor(Seq(jar)) should be theSameInstanceAs
      IntegrationLoader.loaderFor(Seq(jar))
    IntegrationLoader.loaderFor(Nil) should be theSameInstanceAs getClass.getClassLoader
  }

  test("a jar-deployed factory drives the DSv2 read end to end via the jars option") {
    val jar = compileToJar(Map(
      "graftdemo.JarredFactory" ->
        """package graftdemo;
          |public class JarredFactory implements graft.sources.IntegrationFactory {
          |  public graft.api.Integration build(
          |      scala.collection.immutable.Map<String, String> options) {
          |    // marker: this class must have loaded CHILD-FIRST from the jar
          |    if (!JarredFactory.class.getClassLoader().getClass().getName()
          |        .contains("ChildFirstLoader")) throw new IllegalStateException(
          |          "factory not isolated: " + JarredFactory.class.getClassLoader());
          |    return new graft.sources.DocumentsStructuredFactory().build(options);
          |  }
          |}
          |""".stripMargin), "factory.jar")
    val df = spark.read.format("graft.sources.GraftIntegrationSource")
      .option("factory", "graftdemo.JarredFactory")
      .option("jars", jar.toString)
      .option("dir", sfDir)
      .load()
    df.count() shouldBe graft.Tables.documents(spark, sfDir).count()
  }
}
