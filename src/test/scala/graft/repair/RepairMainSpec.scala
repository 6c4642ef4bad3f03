package graft.repair

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.avro.AvroFixtures

/** Smoke test for the CLI entry (the reference-shaped `app.ts` mirror):
  * args parse, the pipeline runs over a corrupt-fixture directory, the
  * JSON report and summary print, and the session shuts down cleanly.
  * Runs in its own suite because RepairMain stops the shared session
  * (suites execute sequentially; the next getOrCreate starts fresh). */
class RepairMainSpec extends AnyFunSuite {

  test("s3a readiness: local paths pass, s3a fails fast without the connector") {
    val conf = new org.apache.hadoop.conf.Configuration()
    S3ACheck.validate(conf, "/data/plain/path") // no scheme
    S3ACheck.validate(conf, "file:///tmp/avro") // non-s3a scheme
    // this sandbox ships no hadoop-aws jar, so the connector check is the
    // one that fires — same fail-fast point the reference has at app.ts:6
    val e = intercept[IllegalStateException] {
      S3ACheck.validate(conf, "s3a://bucket/prefix")
    }
    assert(e.getMessage.contains("hadoop-aws"), e.getMessage)
  }

  test("RepairMain end-to-end over fixtures with quarantine") {
    val dir = Files.createTempDirectory("graft-repairmain").toString
    val qdir = Files.createTempDirectory("graft-repairmain-q").toString
    AvroFixtures.writeAll(dir)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      RepairMain.main(Array(dir, "--quarantine", qdir))
    }
    val text = out.toString("UTF-8")
    assert(text.contains("\"status\":\"valid\""), s"no valid rows:\n$text")
    assert(text.contains("\"status\":\"repaired\""), s"no repaired rows:\n$text")
    assert(text.contains("\"summary\":"), s"no summary lines:\n$text")
    assert(text.contains("\"progress\":\"valid\""),
      s"no live-progress lines:\n$text")
    // quarantined copies of the repaired files exist
    assert(new java.io.File(qdir).listFiles().nonEmpty,
      "quarantine dir is empty")
  }
}
