package graft.avro

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based salvage invariants (SURVEY §5.B): for random corruption
  * position × run length × codec,
  *   (1) recovered records ⊆ originally written records,
  *   (2) repaired output always passes full validation,
  *   (3) valid inputs are fixed points of repair.
  * (ScalaCheck generators driven directly with deterministic seeds — the
  * scalatest bridge artifact isn't in the offline cache.)
  */
class SalvagePropertySpec extends AnyFunSuite {

  private val conf = new org.apache.hadoop.conf.Configuration()

  private case class Case(codec: String, seed: Long, n: Int,
      corruptAt: Double, runLen: Int)

  private val genCase: Gen[Case] = for {
    codec <- Gen.oneOf("null", "deflate", "snappy")
    seed <- Gen.choose(1L, 1000L)
    n <- Gen.choose(200, 1500)
    at <- Gen.choose(0.05, 0.95) // fraction of file length
    runLen <- Gen.choose(1, 64)
  } yield Case(codec, seed, n, at, runLen)

  test("salvage invariants hold under random corruption") {
    val cases = (1 to 25).map(i =>
      genCase.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    cases.foreach { c =>
      val dir = Files.createTempDirectory("prop").toString
      val fs = new Path(dir).getFileSystem(conf)
      val base = AvroFixtures.containerBytes(c.n, c.codec, c.seed)
      val bytes = base.clone()
      val pos = math.max(5, (bytes.length * c.corruptAt).toInt)
      val rng = new java.util.Random(c.seed)
      (0 until c.runLen).foreach { k =>
        val i = pos + k
        if (i < bytes.length) bytes(i) = (rng.nextInt(256) - 128).toByte
      }
      val p = Paths.get(dir, "f.avro"); Files.write(p, bytes)
      val hp = new Path(p.toString)
      val out = new Path(dir, "f.repaired.avro")

      val res = Salvage.salvage(fs, hp, Some(out))
      if (res.status != "unrepairable") {
        // (2) repaired output passes full validation
        val rv = Salvage.validate(fs, out, samplerate = 1.0)
        assert(rv.valid, s"$c: repaired output invalid: ${rv.error}")
        // (1) recovered ⊆ written (ids and count)
        assert(res.recordsRecovered <= c.n, s"$c: recovered > written")
        val in2 = new HadoopSeekableInput(fs, out)
        val r2 = new org.apache.avro.file.DataFileReader[
          org.apache.avro.generic.GenericRecord](in2,
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        val ids = scala.collection.mutable.Set.empty[Long]
        while (r2.hasNext) ids += r2.next().get("id").asInstanceOf[Long]
        r2.close(); in2.close()
        assert(ids.subsetOf((0L until c.n.toLong).toSet), s"$c: foreign ids")
      }

      // (3) valid input is a fixed point
      val cleanP = Paths.get(dir, "clean.avro"); Files.write(cleanP, base)
      val cleanOut = new Path(dir, "clean.repaired.avro")
      val cres = Salvage.salvage(fs, new Path(cleanP.toString), Some(cleanOut))
      assert(cres.status == "valid" && cres.recordsRecovered == c.n.toLong,
        s"$c: clean file not a fixed point: $cres")
    }
  }

  test("DSv2 read handles enum, fixed, and [null, record] union") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"exotic","fields":[
        | {"name":"id","type":"long"},
        | {"name":"color","type":{"type":"enum","name":"Color",
        |   "symbols":["RED","GREEN","BLUE"]}},
        | {"name":"token","type":{"type":"fixed","name":"Tok","size":8}},
        | {"name":"sub","type":["null",{"type":"record","name":"Sub",
        |   "fields":[{"name":"x","type":"double"}]}],"default":null}
        |]}""".stripMargin)
    val dir = Files.createTempDirectory("exotic").toString
    val bytes = AvroFixtures.containerBytes(100, "null", 7L,
      recordFn = Some { (i, rng) =>
        val r = new org.apache.avro.generic.GenericData.Record(schema)
        r.put("id", i)
        r.put("color", new org.apache.avro.generic.GenericData.EnumSymbol(
          schema.getField("color").schema(),
          Seq("RED", "GREEN", "BLUE")(rng.nextInt(3))))
        val tok = new Array[Byte](8); rng.nextBytes(tok)
        r.put("token", new org.apache.avro.generic.GenericData.Fixed(
          schema.getField("token").schema(), tok))
        r.put("sub", if (i % 3 == 0) null else {
          val s = new org.apache.avro.generic.GenericData.Record(
            SchemaConverter.resolve(schema.getField("sub").schema()))
          s.put("x", rng.nextDouble()); s
        })
        r
      }, schema = schema)
    Files.write(Paths.get(dir, "x.avro"), bytes)

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val df = spark.read.format("graft-avro").load(dir)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 100)
    assert(Set("RED", "GREEN", "BLUE").contains(rows.head.getString(1)))
    assert(rows.head.getAs[Array[Byte]]("token").length == 8)
    assert(rows.count(_.isNullAt(3)) == 34) // ids 0,3,...,99
    assert(!rows(1).isNullAt(3) &&
      rows(1).getStruct(3).schema.fieldNames.sameElements(Array("x")))
  }
}
