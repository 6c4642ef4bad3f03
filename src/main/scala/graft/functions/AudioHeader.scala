package graft.functions

/** Lib-free WAV/RIFF audio-container codec: parse (and, for fixtures,
  * emit) the self-describing RIFF chunk stream of a PCM WAV file — the
  * metadata-extraction step behind q_mm_audio_meta. The container ships
  * no audio libraries, so sample decoding stays out of scope; sample
  * rate / channels / bit depth / duration — the fields a training-data
  * pipeline filters and buckets audio by — are read from the real byte
  * layout.
  *
  * Format (public spec, RIFF/WAVE):
  *  - "RIFF" + u32le riff-size + "WAVE", then a sequence of chunks:
  *    4-byte ASCII id + u32le size + payload (word-aligned: odd sizes
  *    are followed by one pad byte).
  *  - "fmt " chunk (PCM): u16le audio format (1 = PCM), u16le channels,
  *    u32le sample rate, u32le byte rate, u16le block align, u16le bits
  *    per sample.
  *  - "data" chunk: size = n_frames * block_align.
  *
  * The parser walks the chunk stream (skipping unknown chunks such as
  * LIST/INFO) rather than assuming fixed offsets — real WAV files carry
  * metadata chunks before "data".
  */
object AudioHeader {

  /** nFrames = sample frames in the data chunk (one frame = one sample
    * per channel); durationMs = floor(nFrames * 1000 / sampleRate). */
  final case class Meta(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Long, durationMs: Long)

  /** Parse a RIFF/WAVE byte stream; None on a malformed or non-WAV
    * payload (missing signature, truncated chunk, no fmt/data). */
  def parse(b: Array[Byte]): Option[Meta] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE"))
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataSize = -1L
    while (off + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val size = leU32(b, off + 4)
      val body = off + 8
      if (ascii(b, off, "fmt ") && size >= 16 && body + 16 <= b.length) {
        val audioFormat = leU16(b, body)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((leU16(b, body + 2), leI32(b, body + 4).toInt,
          leU16(b, body + 14), leU16(b, body + 12)))
      } else if (ascii(b, off, "data")) {
        // the frame count derives from the DECLARED size, so a data
        // chunk whose payload wasn't fully buffered still reports its
        // true length (matches how a metadata pass avoids reading audio)
        dataSize = size
      }
      // chunks are word-aligned (odd sizes carry a pad byte); a corrupt
      // size that runs past the buffer — or would overflow Int and walk
      // the offset backwards — ends the walk instead of looping
      val next = body.toLong + size + (size & 1L)
      off = if (next > b.length.toLong) b.length else next.toInt
    }
    fmt.flatMap { case (ch, rate, bits, block) =>
      if (dataSize < 0 || block <= 0 || rate <= 0) None
      else {
        val frames = dataSize / block
        Some(Meta(ch, rate, bits, frames, frames * 1000L / rate))
      }
    }
  }

  /** Spec-correct PCM WAV emitter used to synthesize q_mm_audio_meta
    * payloads: RIFF header, a LIST/INFO chunk (so parsing must really
    * walk chunks), fmt, and a data chunk of silence. */
  def wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nFrames * blockAlign
    val info = "ISFTgraft".getBytes("US-ASCII") // odd-length LIST payload
    val listSize = 4 + info.length // "INFO" + payload
    val listPadded = listSize + (listSize & 1)
    val riffSize = 4 + (8 + listPadded) + (8 + 16) + (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var o = 0
    def put(s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, o); o += s.length }
    def u32(v: Long): Unit = { var i = 0; while (i < 4) { out(o) = ((v >> (8 * i)) & 0xff).toByte; o += 1; i += 1 } }
    def u16(v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte; o += 2 }
    put("RIFF"); u32(riffSize); put("WAVE")
    put("LIST"); u32(listSize); put("INFO")
    info.copyToArray(out, o); o += info.length
    if ((listSize & 1) == 1) o += 1 // pad byte
    put("fmt "); u32(16)
    u16(1); u16(channels); u32(sampleRate)
    u32(sampleRate.toLong * blockAlign); u16(blockAlign); u16(bitsPerSample)
    put("data"); u32(dataSize)
    out // silence: data bytes stay zero
  }

  private def ascii(b: Array[Byte], o: Int, s: String): Boolean = {
    if (o + s.length > b.length) return false
    var i = 0
    while (i < s.length) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
    true
  }

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def leU32(b: Array[Byte], o: Int): Long =
    (leU16(b, o) | (leU16(b, o + 2).toLong << 16)) & 0xffffffffL

  private def leI32(b: Array[Byte], o: Int): Long = leU32(b, o)
}
