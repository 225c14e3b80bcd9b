package graft

import org.scalatest.funsuite.AnyFunSuite

/** Two REAL JVMs hammering one warehouse (VERDICT r10 #9): a writer
  * (merge upserts + compacts) races a churner (full reads + vacuums
  * under the default cross-process grace). Proves the O_EXCL + max+1
  * manifest protocol beyond this JVM's locks: all publishes commit,
  * snapshots never tear or go backwards, vacuum never reclaims a
  * member a commit still needs. See `WarehouseHammer` for the
  * per-actor invariants.
  */
class WarehouseStressSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar")
    .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")

  private def launch(args: String*): Process = {
    val cp = "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
    val cmd = Seq("java") ++ addOpens ++ Seq("-Xmx3g", "-cp", cp,
      "graft.WarehouseHammer") ++ args
    new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
  }

  private def drain(p: Process): Seq[String] = {
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    out.linesIterator.toSeq
  }

  test("two racing JVMs: all publishes commit, reads never tear, " +
      "vacuum never drops a needed member") {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val wh = java.nio.file.Files.createTempDirectory(base, "hammer")
      .toString
    val iters = 24
    val writer = launch(wh, "ht", "writer", iters.toString)
    val churner = launch(wh, "ht", "churner", iters.toString)
    assert(writer.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
      "writer JVM timed out")
    assert(churner.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
      "churner JVM timed out")
    val (wOut, cOut) = (drain(writer), drain(churner))
    assert(writer.exitValue == 0,
      s"writer failed:\n${wOut.takeRight(12).mkString("\n")}")
    assert(churner.exitValue == 0,
      s"churner failed:\n${cOut.takeRight(12).mkString("\n")}")
    assert(wOut.exists(_.startsWith(s"HAMMER-DONE writer rows=$iters")),
      s"writer lost upserts:\n${wOut.takeRight(5).mkString("\n")}")
    assert(cOut.exists(_.startsWith("HAMMER-DONE churner")),
      cOut.takeRight(5).mkString("\n"))

    // post-mortem from THIS JVM: the final snapshot holds every
    // writer key, and every member of every retained generation
    // exists on disk (nothing vacuumed out from under a manifest)
    val spark = SparkTestBase.spark
    val r = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    assert(r.readTable("ht").count() == iters.toLong)
    r.generations("ht").foreach { g =>
      r.readTableAt("ht", g).count() // throws if a member was dropped
    }
  }
}
