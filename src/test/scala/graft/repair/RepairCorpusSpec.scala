package graft.repair

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.avro.AvroFixtures

/** Corpus-scale repair run (VERDICT r13 #4): the per-file property
  * tests prove each taxonomy class repairs; this proves the PIPELINE
  * holds at fleet width — a single end-to-end run over a 1,000-file
  * corpus mixing every codec × every corruption class plus poison
  * files, asserting (a) exactly one report row per file (a poisoned
  * file NEVER aborts the run — the reference's A18 abort-all defect
  * under load), (b) per-status counts match the taxonomy manifest's
  * expectations exactly, and (c) throughput is recorded (files/sec —
  * the SCALE.md row; the pipeline is embarrassingly parallel, so
  * cluster scale-out multiplies this number by executor count). */
class RepairCorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-corpus-$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("1,000-file mixed-codec corpus: one row per file, per-status " +
      "counts match the manifest, poison never aborts (A18 at scale)") {
    val dir = tmpDir("corpus")
    val codecs =
      Seq("null", "deflate", "snappy", "bzip2", "xz", "zstandard")
    // 48 shapes: 6 codecs x 8 taxonomy classes, generated once
    val shapes = codecs.flatMap(c => AvroFixtures.taxonomy(c))
    assert(shapes.size === 48)
    // 996 round-robin replicas + 4 poison files = 1,000
    val nReplicas = 996
    var expectValid = 0L; var expectRepaired = 0L; var expectBad = 0L
    (0 until nReplicas).foreach { i =>
      val (name, bytes, valid, repairable) = shapes(i % shapes.size)
      Files.write(Paths.get(dir, f"rep$i%04d_$name.avro"), bytes)
      if (valid) expectValid += 1
      else if (repairable) expectRepaired += 1
      else expectBad += 1
    }
    Files.write(Paths.get(dir, "poison_junk.avro"),
      "not avro at all, but insists on the extension".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "poison_zero.avro"), Array.emptyByteArray)
    // a header-only prefix (valid magic, truncated mid-schema)
    val okBytes = shapes.find(_._1 == "ok_null").get._2
    Files.write(Paths.get(dir, "poison_header_prefix.avro"),
      okBytes.take(20))
    // random bytes that contain no avro structure at all
    val rng = new java.util.Random(7L)
    val noise = new Array[Byte](4096); rng.nextBytes(noise)
    Files.write(Paths.get(dir, "poison_noise.avro"), noise)
    expectBad += 4

    val qdir = tmpDir("quarantine")
    val t0 = System.nanoTime()
    val report = RepairPipeline.run(spark, dir, replace = false,
      quarantineDir = Some(qdir), samplerate = 1.0).collect()
    val sec = (System.nanoTime() - t0) / 1e9

    // (a) one row per file — nothing dropped, nothing aborted
    assert(report.length === 1000, s"rows=${report.length}")
    assert(report.map(_.path).distinct.length === 1000)

    // (b) statuses match the manifest exactly: valid files report
    // valid, repairable corruptions repair, structurally-dead files
    // (bad header/schema, empty, poison) are unrepairable rows
    val byStatus = report.groupBy(_.status)
      .view.mapValues(_.length.toLong).toMap
    assert(byStatus.getOrElse("valid", 0L) === expectValid, s"$byStatus")
    assert(byStatus.getOrElse("repaired", 0L) === expectRepaired,
      s"$byStatus")
    assert(byStatus.getOrElse("unrepairable", 0L) + byStatus.getOrElse(
      "error", 0L) === expectBad, s"$byStatus")
    // every poison file is present as a non-aborting row
    Seq("poison_junk", "poison_zero", "poison_header_prefix",
      "poison_noise").foreach { p =>
      val row = report.find(_.path.contains(p))
      assert(row.isDefined && (row.get.status == "unrepairable" ||
        row.get.status == "error"), s"$p -> $row")
    }
    // every repaired original got its quarantine copy (spot-check 10)
    report.filter(_.status == "repaired").take(10).foreach { r =>
      val rel = r.path.split('/').last
      assert(new java.io.File(s"$qdir/$rel").isFile, s"missing $rel")
    }
    // (c) throughput for the SCALE.md row
    val fps = 1000.0 / sec
    info(f"corpus: 1000 files in $sec%.1f s = $fps%.1f files/sec " +
      f"(valid=$expectValid repaired=$expectRepaired dead=$expectBad)")
    assert(fps > 1.0, f"pathologically slow: $fps%.2f files/sec")
  }
}
