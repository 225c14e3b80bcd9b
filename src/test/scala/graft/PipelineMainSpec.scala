package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.PipelineMain — the reference operator's process contract
  * (`dbtoperator.py:121-178,387-434,454-461`): packaged project in,
  * ordered fail-fast commands, cleanup always, exit code out.
  */
class PipelineMainSpec extends AnyFunSuite with SparkTestBase {

  private def scratch(prefix: String): java.nio.file.Path = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, prefix)
  }

  private def writeProject(): String = {
    val proj = scratch("pm_proj")
    java.nio.file.Files.createDirectories(proj.resolve("models"))
    java.nio.file.Files.writeString(proj.resolve("sources.conf"),
      s"raw_nation=$sf/nation.parquet\n")
    java.nio.file.Files.writeString(proj.resolve("models/pm_top.sql"),
      """{{ config(materialized='table') }}
        |SELECT n_regionkey, count(*) AS n
        |FROM {{ source('raw_nation') }} GROUP BY n_regionkey""".stripMargin)
    proj.toString
  }

  test("runs a project dir end-to-end and exits 0; results land in " +
      "the warehouse") {
    val wh = scratch("pm_wh").toString
    val rc = PipelineMain.run(Seq(
      "--project", writeProject(), "--warehouse", wh,
      "--log-level", "ERROR", "run"), existing = Some(spark))
    assert(rc == 0)
    val r = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    assert(r.readTable("pm_top").count() == 5)
  }

  test("a zip package loads like the reference's packaged project; " +
      "a failing command exits 1 and skips the rest") {
    val proj = writeProject()
    val zip = s"${scratch("pm_zip")}/p.zip"
    graft.pipeline.PipelineProject.pack(proj, zip)
    val wh = scratch("pm_wh2").toString
    // "test" fails (no tests defined is fine — use a bogus select to
    // force a failure) → the later run must be SKIPPED (fail-fast)
    val rc = PipelineMain.run(Seq(
      "--project", zip, "--warehouse", wh, "--log-level", "ERROR",
      "run --select no_such_model", "run"), existing = Some(spark))
    assert(rc == 1)
    // and a clean invocation over the same zip succeeds
    assert(PipelineMain.run(Seq(
      "--project", zip, "--warehouse", wh, "--log-level", "ERROR",
      "run"), existing = Some(spark)) == 0)
  }

  test("argument hygiene: missing flags and unknown levels exit 2") {
    assert(PipelineMain.run(Seq("--warehouse", "/tmp/x", "run"),
      existing = Some(spark)) == 2)
    assert(PipelineMain.run(Seq(
      "--project", "/tmp/x", "--warehouse", "/tmp/y",
      "--log-level", "NOISY", "run"), existing = Some(spark)) == 2)
    assert(PipelineMain.run(Seq(
      "--project", "/tmp/x", "--warehouse", "/tmp/y", "--bogus", "z"),
      existing = Some(spark)) == 2)
  }
}
