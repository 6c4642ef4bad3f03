package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trip invariants for the lib-free byte-format
  * codecs: any emitter-produced header parses back to exactly the
  * emitted parameters, and byte-level mutations never crash the parser
  * (they may downgrade to None — never a throw or a loop).
  * (Generators driven directly with deterministic seeds — the
  * scalatest-scalacheck bridge isn't in the offline cache.) */
class HeaderPropertySpec extends AnyFunSuite {

  private case class Wav(ch: Int, rate: Int, bits: Int, frames: Int)

  private val genWav: Gen[Wav] = for {
    ch <- Gen.oneOf(1, 2, 4)
    rate <- Gen.choose(8000, 96000)
    bits <- Gen.oneOf(8, 16, 24, 32)
    frames <- Gen.choose(0, 4000)
  } yield Wav(ch, rate, bits, frames)

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("WAV round-trip: parse(wav(p)) == p for arbitrary parameters") {
    cases(genWav, 200).foreach { w =>
      val m = AudioHeader.parse(
        AudioHeader.wav(w.ch, w.rate, w.bits, w.frames))
      assert(m.contains(AudioHeader.Meta(w.ch, w.rate, w.bits,
        w.frames.toLong, w.frames.toLong * 1000 / w.rate)), s"case $w")
    }
  }

  test("WAV parser is total under random single-byte mutations") {
    val base = AudioHeader.wav(2, 44100, 16, 64)
    val genMut = for {
      pos <- Gen.choose(0, base.length - 1)
      v <- Gen.choose(0, 255)
    } yield (pos, v.toByte)
    cases(genMut, 300).foreach { case (pos, v) =>
      val b = base.clone(); b(pos) = v
      AudioHeader.parse(b) // must terminate without throwing
    }
  }

  test("image round-trip: parse(emit(w,h)) == (w,h) across formats") {
    val genDims = for {
      w <- Gen.choose(1, 200000) // beyond u16 so the GIF clamp is real
      h <- Gen.choose(1, 200000)
    } yield (w, h)
    cases(genDims, 200).foreach { case (w, h) =>
      assert(ImageHeader.parse(ImageHeader.png(w, h))
        .contains(ImageHeader.Meta("png", w, h)))
      assert(ImageHeader.parse(ImageHeader.bmp(w, h))
        .contains(ImageHeader.Meta("bmp", w, h)))
      // GIF dims are u16le
      val (gw, gh) = (w & 0xffff, h & 0xffff)
      if (gw > 0 && gh > 0)
        assert(ImageHeader.parse(ImageHeader.gif(gw, gh))
          .contains(ImageHeader.Meta("gif", gw, gh)))
    }
  }

  test("image parser is total under random truncation") {
    val base = ImageHeader.png(640, 480) ++ ImageHeader.gif(10, 10)
    val genLen = Gen.choose(0, base.length)
    cases(genLen, 200).foreach { n =>
      ImageHeader.parse(base.take(n)) // must terminate without throwing
    }
  }

  test("BMP pixel round-trip for arbitrary dims (stride padding) " +
      "and dhash determinism") {
    val genDims = for {
      w <- Gen.choose(1, 24) // odd widths hit the 4-byte row padding
      h <- Gen.choose(1, 24)
      kx <- Gen.choose(1, 13)
      ky <- Gen.choose(1, 17)
    } yield (w, h, kx, ky)
    cases(genDims, 100).foreach { case (w, h, kx, ky) =>
      def pat(x: Int, y: Int): Int = (x * kx + y * ky) % 256
      val img = ImageHeader.bmpPixels(w, h, pat)
      val g = ImageHeader.bmpGray(img)
        .getOrElse(fail(s"decode failed for ${(w, h)}"))
      assert(g.length == h && g(0).length == w, s"dims ${(w, h)}")
      for (y <- 0 until h; x <- 0 until w)
        assert(g(y)(x) == pat(x, y), s"pixel ($x,$y) of ${(w, h, kx, ky)}")
      // dhash must be a pure function of the pixels
      assert(ImageHeader.dhash64(g) ==
        ImageHeader.dhash64(ImageHeader.bmpGray(img).get))
    }
  }

  test("BMP pixel decoder is total under random truncation and mutation") {
    val base = ImageHeader.bmpPixels(7, 5, (x, y) => x * 31 + y)
    val genCase = for {
      n <- Gen.choose(0, base.length)
      pos <- Gen.choose(0, base.length - 1)
      v <- Gen.choose(0, 255)
    } yield (n, pos, v.toByte)
    cases(genCase, 300).foreach { case (n, pos, v) =>
      ImageHeader.bmpGray(base.take(n)) // truncation: None or valid, no throw
      val b = base.clone(); b(pos) = v
      ImageHeader.bmpGray(b).foreach { g =>
        assert(g.length > 0 && g(0).length > 0)
      }
    }
  }

  test("BMP decoder rejects overflow-crafted widths without allocating") {
    // w ≈ 0x55555557: w*3 overflows Int to a tiny positive stride — the
    // single-byte-mutation generator above can never reach these widths,
    // so pin the adversarial corner explicitly. Must be None (never an
    // OOM-sized tabulate or ArrayIndexOutOfBounds).
    val base = ImageHeader.bmpPixels(7, 5, (x, y) => x * 31 + y)
    def withWidth(wv: Int, hv: Int): Array[Byte] = {
      val b = base.clone()
      ImageHeader.putLeU32(b, 18, wv)
      ImageHeader.putLeU32(b, 22, hv)
      b
    }
    for (w <- Seq(0x55555557, 0x55555556, Int.MaxValue, Int.MaxValue / 3,
                  0x40000001); h <- Seq(1, 5, Int.MaxValue))
      assert(ImageHeader.bmpGray(withWidth(w, h)).isEmpty,
        s"crafted w=$w h=$h must be rejected")
  }
}
