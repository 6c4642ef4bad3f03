package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.functions.AudioHeader

/** Third LLM-pipeline wave: decontamination funnel, repetition signals,
  * boilerplate vocabulary bound, URL parsing, WAV chunk-walk parser. */
class LlmText3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------- AudioHeader

  test("wav round-trip recovers rate/channels/bits/frames/duration") {
    val b = AudioHeader.wav(channels = 2, sampleRate = 16000,
      bitsPerSample = 16, nFrames = 1234)
    val m = AudioHeader.parse(b).get
    assert(m == AudioHeader.Meta(2, 16000, 16, 1234L, 1234L * 1000 / 16000))
  }

  test("parser walks past unknown odd-sized chunks (word alignment)") {
    // wav() already embeds an odd-length LIST/INFO chunk before fmt;
    // a parser that forgets the pad byte lands misaligned and fails
    val b = AudioHeader.wav(1, 8000, 16, 10)
    assert(AudioHeader.parse(b).exists(_.nFrames == 10L))
    // and the LIST payload really is odd-sized in the byte stream
    assert(b.slice(12, 16).map(_.toChar).mkString == "LIST")
    val listSize = (b(16) & 0xff) | ((b(17) & 0xff) << 8)
    assert(listSize % 2 == 1)
  }

  test("parser rejects malformed payloads instead of misreading them") {
    assert(AudioHeader.parse("RIFFxxxxWAVE".getBytes).isEmpty) // no chunks
    assert(AudioHeader.parse("notawavfileatall".getBytes).isEmpty)
    assert(AudioHeader.parse(Array[Byte]()).isEmpty)
    // non-PCM format code is refused, not misinterpreted
    val b = AudioHeader.wav(1, 8000, 16, 4)
    val fmtOff = b.indexOfSlice("fmt ".getBytes)
    b(fmtOff + 8) = 3 // IEEE float, not PCM
    assert(AudioHeader.parse(b).isEmpty)
    // truncated mid-chunk: parser stops cleanly without fmt+data
    val t = AudioHeader.wav(1, 8000, 16, 4).take(20)
    assert(AudioHeader.parse(t).isEmpty)
    // corrupt chunk size (0xFFFFFFFF) must terminate, not loop or
    // walk the offset backwards
    val c = AudioHeader.wav(1, 8000, 16, 4)
    val listOff = c.indexOfSlice("LIST".getBytes)
    for (i <- 0 until 4) c(listOff + 4 + i) = 0xff.toByte
    assert(AudioHeader.parse(c).isEmpty)
    // truncated data payload still reports the declared frame count
    val d = AudioHeader.wav(1, 8000, 16, 100)
    assert(AudioHeader.parse(d.take(d.length - 50)).exists(_.nFrames == 100L))
  }

  // ------------------------------------------------------- query surface

  test("decontaminate flags only docs sharing an 8-gram with the eval set") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_text_decontaminate")(spark, sf)
      .as[(Long, Long)].collect()
    // no eval doc ids in the output, every overlap count positive
    assert(rows.forall { case (id, n) => id % 97 != 0 && n > 0 })
    assert(rows.nonEmpty) // word-soup corpus: overlap certainly exists
  }

  test("repetition signals are in-range and shuffle-free") {
    import spark.implicits._
    val df = SparkEntry.queries("q_text_repetition")(spark, sf)
    val rows = df.collect()
    rows.foreach { r =>
      val dup = r.getDouble(2); val top = r.getDouble(3)
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
      // share is rounded to 6 dp, so compare with matching slack
      assert(top >= 1.0 / r.getLong(1) - 5e-7)
    }
    // per-row op: no Exchange anywhere except the final presentation sort
    // (AQE's toString repeats the plan under "== Initial Plan ==" — count
    // only the final section)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.split("Exchange").length - 1 <= 1,
      s"expected at most the ORDER BY exchange, got:\n$plan")
  }

  test("boilerplate removes exactly the >50%-df tokens, keeps order") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "split(text, ' ') AS ws")
    val n = docs.count()
    val hot = docs.selectExpr("explode(array_distinct(ws)) AS tok")
      .groupBy("tok").count().filter($"count" * 2 > n)
      .as[(String, Long)].collect().map(_._1).toSet
    val out = SparkEntry.queries("q_text_boilerplate")(spark, sf)
      .as[(Long, String, Int)].collect()
    val orig = docs.as[(Long, Seq[String])].collect().toMap
    out.foreach { case (id, kept, removed) =>
      val expect = orig(id).filterNot(hot)
      assert(kept == expect.mkString(" "), s"doc $id")
      assert(removed == orig(id).size - expect.size)
    }
  }

  // ----------------------------------------------------- BMP / dHash

  test("BMP pixel codec round-trips odd widths (row stride padding)") {
    import graft.functions.ImageHeader
    // w=5 → raw row 15 bytes, padded stride 16: a decoder that ignores
    // padding reads shifted pixels from row 1 on
    def pat(x: Int, y: Int): Int = (x * 7 + y * 31) % 256
    val img = ImageHeader.bmpPixels(5, 4, pat)
    val g = ImageHeader.bmpGray(img).get
    assert(g.length == 4 && g(0).length == 5)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(g(y)(x) == pat(x, y), s"pixel ($x,$y)")
    // header-only BMP (no pixel array) must be rejected, not misread
    assert(ImageHeader.bmpGray(ImageHeader.bmp(5, 4)).isEmpty)
  }

  test("dHash is brightness-shift invariant and flips on real edits") {
    import graft.functions.ImageHeader
    def base(x: Int, y: Int): Int =
      (math.sin(0.3 * x) * 50 + math.cos(0.2 * y) * 50 + 128).toInt
    val h0 = ImageHeader.dhash64(
      ImageHeader.bmpGray(ImageHeader.bmpPixels(32, 32, base)).get)
    val hBright = ImageHeader.dhash64(ImageHeader.bmpGray(
      ImageHeader.bmpPixels(32, 32, (x, y) => base(x, y) + 30)).get)
    assert(h0 == hBright, "uniform brightness shift must not change dHash")
    val hOther = ImageHeader.dhash64(ImageHeader.bmpGray(
      ImageHeader.bmpPixels(32, 32, (x, y) => base(y, x) + x)).get)
    assert(java.lang.Long.bitCount(h0 ^ hOther) > 8,
      "a structurally different image must be far in hamming space")
  }

  test("phash near-dup blocking finds every within-group pair") {
    // groups of 5 consecutive doc_ids share a base pattern with ≤2-pixel
    // edits → each edit flips ≤2 bits in each of the two 64-bit words,
    // so within-group pairs sit at 128-bit hamming ≤8 by construction;
    // the 9-block pigeonhole guarantees full recall at that threshold
    val pairs = SparkEntry.queries("q_mm_phash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 <= 8), "pair over the hamming threshold")
    val found = pairs.map(p => (p._1, p._2)).toSet
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = (for {
      a <- ids; b <- ids
      if a < b && a / 5 == b / 5
    } yield (a, b)).toSet
    assert((expected -- found).isEmpty,
      s"missed within-group near-dups: ${(expected -- found).take(5)}")
  }

  test("url components agree with parse_url semantics") {
    val r = SparkEntry.queries("q_fn_url")(spark, sf).limit(1).collect()(0)
    val url = r.getString(1)
    assert(url.startsWith("https://") && r.getString(2).endsWith(".example.org"))
    assert(url.contains(r.getString(3)) && url.endsWith("&v=2"))
  }

  test("incremental dedup drop set matches the full minhash pair list") {
    import spark.implicits._
    val out = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .as[(Long, String)].collect().toMap
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("a", "b").as[(Long, Long)].collect()
    val delta = out.keySet
    assert(delta.forall(_ % 5 == 0) && delta.nonEmpty)
    // the report must cover EVERY delta doc — including any too short
    // to shingle — not just the ones that entered the band index
    val allDelta = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id % 5 = 0").select("doc_id").as[Long].collect().toSet
    assert(delta == allDelta,
      s"report missing delta docs: ${allDelta -- delta}")
    // x is a dup iff it pairs with a corpus doc (either side) or a
    // lower-id delta doc — exactly the incremental acceptance rule
    val expectDup = delta.filter { x =>
      pairs.exists { case (a, b) =>
        (a == x && b % 5 != 0) || (b == x && a % 5 != 0) ||
          (b == x && a % 5 == 0)
      }
    }
    val gotDup = out.filter(_._2 == "dup").keySet
    assert(gotDup == expectDup,
      s"diff: extra=${gotDup -- expectDup} missing=${expectDup -- gotDup}")
    assert(gotDup.nonEmpty && gotDup.size < delta.size,
      "fixture should exercise both statuses")
  }

  test("variant introspection: schema_of_variant sees the built shape") {
    import org.apache.spark.sql.functions._
    val schema = spark.range(1)
      .select(schema_of_variant(parse_json(
        lit("""{"etype":"x","val":1.5,"nested":{"k":3}}"""))).as("s"))
      .collect()(0).getString(0)
    assert(schema == "OBJECT<etype: STRING, nested: OBJECT<k: BIGINT>, val: DECIMAL(2,1)>")
    // and the oracled query extracts typed paths from the same shape
    val r = SparkEntry.queries("q_fn_variant")(spark, sf).limit(1).collect()(0)
    assert(r.getLong(4) == 2L * r.getInt(3)) // arr[1] == 2*k
    assert(r.isNullAt(5)) // try_variant_get on a missing path
  }

  test("audio metadata derives from the parsed bytes, not the arithmetic") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_mm_audio_meta")(spark, sf)
      .as[(Long, Int, Int, Int, Long, Long)].collect()
    assert(rows.length > 0)
    rows.foreach { case (id, ch, rate, bits, frames, ms) =>
      assert(ch == 1 + (id % 2).toInt)
      assert(rate == (8000 << (id % 3).toInt))
      assert(bits == 16)
      assert(ms == frames * 1000 / rate)
    }
  }
}
