package graft.ext

/** The codec tier of [[Multimodal]]: pure byte-level walkers and
  * encoders (RIFF/WAVE PCM, G.711 μ-law, BMP, and the
  * javax.imageio-backed PNG/JPEG seams). No Spark types — everything
  * here is a deterministic function of bytes and ids, mixed into
  * `object Multimodal` so every call site keeps its `Multimodal.x`
  * address. Pipeline operators (Datasets, LSH joins, staging) live in
  * the sibling traits / the object itself.
  */
trait MediaCodecs {
  /** ImageIO's default stream cache is DISK-backed: every
    * `ImageIO.read`/`write`/`createImageOutputStream` call creates
    * (and deletes) a temp file under java.io.tmpdir. The rasters at
    * this seam are ≤16×8 px, so the temp-file churn is ~100% of the
    * per-image cost (measured r16: the multimodal phash keys are
    * encode/decode-bound, not join-bound). In-memory cache streams
    * produce byte-identical output — this is pure fixed-overhead
    * removal (optimization guide §1.2 "per-task work"). Runs once at
    * object init; every codec entry point lives in this object, and
    * the flag is also re-asserted per decode batch on executors via
    * the same object-initialization path.
    */
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic sample stream: s(i) = ((id·2654435761 + i·40503)
    * mod 65536) − 32768 — pure integer arithmetic so DuckDB can
    * reproduce it with a `range()` expansion.
    */
  private[graft] def wavSample(docId: Long, i: Int): Int =
    (((docId * 2654435761L + i.toLong * 40503L) % 65536L) - 32768L).toInt

  private[graft] def wavRate(docId: Long): Int = 8000 + (docId % 4).toInt * 4000

  private[graft] def wavSampleCount(docId: Long): Int = 256 + (docId % 512).toInt

  /** Assemble a complete RIFF/WAVE file: 16-bit mono PCM. */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = wavSampleCount(docId)
    val rate = wavRate(docId)
    val dataSize = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(rate)
      .putInt(rate * 2)                  // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) { bb.putShort(wavSample(docId, i).toShort); i += 1 }
    bb.array()
  }

  /** Container parse only: (sample rate, PCM samples). The seam feature
    * extractors ([[decodeWav]], [[wavFrameEnergy]]) share it.
    */
  private[graft] def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "missing RIFF magic")
    val riffSize = bb.getInt
    require(riffSize == bytes.length - 8, s"RIFF size $riffSize != ${bytes.length - 8}")
    require(tag() == "WAVE", "missing WAVE form type")
    var rate = -1; var bits = -1; var channels = -1; var fmtCode = -1
    var samples: Array[Short] = null
    // real readers iterate chunks — `fmt `/`data` may be interleaved
    // with LIST/fact/cue chunks written by other tools
    while (bb.remaining() >= 8) {
      val id = tag(); val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(), s"chunk $id overruns: $size")
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          val audioFormat = bb.getShort
          require(audioFormat == 1 || audioFormat == 7,
            s"unsupported format: $audioFormat (PCM=1, mu-law=7)")
          fmtCode = audioFormat
          channels = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align (derived)
          bits = bb.getShort.toInt
          bb.position(fmtEnd)
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          require(samples == null, "duplicate data chunk")
          if (fmtCode == 7) {
            // G.711 μ-law: 8-bit companded samples, expanded to PCM16
            // on decode (the JDK's ULAW expander agrees byte-for-byte
            // on all 256 codes — spec-pinned)
            require(bits == 8 && channels == 1,
              s"unsupported mu-law layout: ${bits}bit x$channels")
            samples = new Array[Short](size)
            var i = 0
            while (i < samples.length) {
              samples(i) = ulawToLinear(bb.get() & 0xff).toShort; i += 1
            }
          } else {
            require(bits == 16 && channels == 1,
              s"unsupported PCM layout: ${bits}bit x$channels")
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
          }
          // odd-sized data chunks pad to even like any other chunk.
          // The 16-bit read loop consumed size/2*2 bytes, so an odd
          // size leaves 1 payload byte + 1 RIFF pad byte; the 8-bit
          // μ-law loop consumed all `size` bytes, leaving only the
          // pad byte (pad may be absent when data is the last chunk)
          if ((size & 1) == 1) {
            val skip = if (fmtCode == 7) 1 else 2
            bb.position(math.min(bb.limit(), bb.position() + skip))
          }
        case _ =>
          bb.position(bb.position() + size + (size & 1)) // chunks pad to even
      }
    }
    require(samples != null, "no data chunk")
    (rate, samples)
  }

  // ───────────────────────────────────────────────────────────────────
  // G.711 μ-law — the LOSSY audio codec the JDK can actually speak
  // (MP3/FLAC/Opus have no in-JDK codec and stay environment-blocked;
  // μ-law companding is the real 2:1 lossy telephony codec, format 7
  // in RIFF/WAVE). Unlike JPEG, the transform is pure integer
  // arithmetic (the public CCITT formula), so the ORACLE IS EXACT:
  // DuckDB re-derives every companded byte and every reconstruction
  // error — no tolerance booleans anywhere.
  // ───────────────────────────────────────────────────────────────────

  private final val UlawBias = 0x84 // 132
  private final val UlawClip = 32635

  /** CCITT G.711 linear-PCM16 → μ-law byte (the standard public
    * algorithm: clip, bias, segment = top-bit position, 4-bit
    * mantissa, ones-complement). Spec-pinned byte-identical to the
    * JDK's javax.sound ULAW codec over [-32635, 32635]. In the clip
    * regions (|pcm| ≥ 32636) the JDK's encoder WRAPS instead of
    * saturating — the biased magnitude overflows the short domain and
    * full-scale input encodes as a near-silence low-magnitude code —
    * while we follow the G.711 clip (0x00 / 0x80 = full-scale codes).
    * Both behaviors are pinned in Queries7Spec.
    */
  private[graft] def linearToUlaw(pcmIn: Int): Int = {
    var pcm = pcmIn
    val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
    if (pcm > UlawClip) pcm = UlawClip
    pcm += UlawBias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (pcm & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (pcm >> (exponent + 3)) & 0x0f
    (~(sign | (exponent << 4) | mantissa)) & 0xff
  }

  /** μ-law byte → linear PCM16 (exact inverse expansion:
    * ((mantissa·8 + 132) << exponent) − 132, signed).
    */
  private[graft] def ulawToLinear(uIn: Int): Int = {
    val u = (~uIn) & 0xff
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val magnitude = (((mantissa << 3) + UlawBias) << exponent) - UlawBias
    if ((u & 0x80) != 0) -magnitude else magnitude
  }

  /** Transcode a PCM16 WAV payload to a REAL μ-law RIFF/WAVE container
    * (format 7, 8-bit mono — what telephony archives and call-center
    * corpora actually store). Half the bytes of the PCM original.
    */
  def transcodeWavUlaw(bytes: Array[Byte]): Array[Byte] = {
    val (rate, samples) = decodeWavSamples(bytes)
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7)                       // G.711 mu-law
      .putShort(1)                       // mono
      .putInt(rate)
      .putInt(rate)                      // byte rate (1 byte/sample)
      .putShort(1)                       // block align
      .putShort(8)                       // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    var i = 0
    while (i < n) { bb.put(linearToUlaw(samples(i).toInt).toByte); i += 1 }
    bb.array()
  }

  /** REAL audio downsampling: decode the PCM, keep every `factor`-th
    * sample (decimation — the point-sampling kernel; a production
    * pipeline low-pass-filters first, which swaps into this same
    * seam), re-encode a genuine WAV at rate/factor, and report the
    * decoded stats OF THE DOWNSAMPLED clip — the audio twin of
    * [[resizeBmpBatch]]: decode → resample → encode → decode
    * round-trips through the real container both ways. Map-only;
    * payloads never shuffle.
    */
  def downsampleWav(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val (rate, samples) = decodeWavSamples(bytes)
    require(rate % factor == 0, s"rate $rate not divisible by factor $factor")
    val outN = (samples.length + factor - 1) / factor
    val outRate = rate / factor
    val dataSize = outN * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(outRate).putInt(outRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < outN) { bb.putShort(samples(i * factor)); i += 1 }
    bb.array()
  }

  /** Deterministic channel value at logical pixel i (top-down
    * row-major), channel c (0=B, 1=G, 2=R):
    * ((id·2654435761 + i·97 + c·31) mod 256).
    */
  private[graft] def bmpChannel(docId: Long, i: Int, c: Int): Int =
    ((docId * 2654435761L + i.toLong * 97L + c.toLong * 31L) % 256L).toInt

  /** Widths 8..16: width·3 mod 4 cycles through all paddings 0..3. */
  private[graft] def bmpWidth(docId: Long): Int = 8 + (docId % 9).toInt

  private[graft] def bmpHeight(docId: Long): Int = 4 + (docId % 5).toInt

  /** Assemble a complete BMP file (bottom-up, 24-bit BI_RGB). */
  def encodeBmp(docId: Long): Array[Byte] = {
    val w = bmpWidth(docId)
    val h = bmpHeight(docId)
    val stride = (w * 3 + 3) / 4 * 4
    val imgSize = stride * h
    val bb = java.nio.ByteBuffer.allocate(54 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + imgSize)  // file size
      .putInt(0)             // reserved
      .putInt(54)            // pixel data offset
    bb.putInt(40)            // BITMAPINFOHEADER size
      .putInt(w).putInt(h)   // positive height = bottom-up rows
      .putShort(1)           // planes
      .putShort(24)          // bits per pixel
      .putInt(0)             // BI_RGB (uncompressed)
      .putInt(imgSize)
      .putInt(2835).putInt(2835) // 72 DPI in pixels/metre
      .putInt(0).putInt(0)   // palette sizes (none for 24-bit)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up: first stored row is the last logical one
      var x = 0
      while (x < w) {
        val i = y * w + x
        bb.put(bmpChannel(docId, i, 0).toByte)
          .put(bmpChannel(docId, i, 1).toByte)
          .put(bmpChannel(docId, i, 2).toByte)
        x += 1
      }
      var p = w * 3
      while (p < stride) { bb.put(0.toByte); p += 1 }
      fileRow += 1
    }
    bb.array()
  }

  // ───────────────────────────────────────────────────────────────────
  // Entropy-coded formats at the same decode seam: PNG (DEFLATE) and
  // JPEG (DCT + Huffman) through the in-JDK javax.imageio codecs. The
  // BMP tier proves the seam on a trivially decodable container; these
  // prove it on the formats a real 100 TB corpus actually stores.
  // PNG is lossless, so ImageIO.read recovers the exact seeded pixel
  // field and every statistic pins to the SAME oracle formula as the
  // BMP tier — the pixel contract is format-independent. JPEG is
  // lossy, so its key emits exact dimensions plus a bounded-error QC
  // boolean (the within-tolerance pattern the sketch keys use).
  // ───────────────────────────────────────────────────────────────────

  /** Render the seeded pixel field (same [[bmpChannel]] formula and
    * [[bmpWidth]]×[[bmpHeight]] dimensions as the BMP tier) into a
    * BufferedImage. `perturb` bumps the blue channel of logical pixel
    * (0,0) by +8 mod 256 — the same near-dup planting device as
    * [[perturbBmp]], applied pre-encode.
    */
  private def seededImage(docId: Long, perturb: Boolean): java.awt.image.BufferedImage = {
    val w = bmpWidth(docId); val h = bmpHeight(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val b =
          if (perturb && i == 0) (bmpChannel(docId, 0, 0) + 8) % 256
          else bmpChannel(docId, i, 0)
        img.setRGB(x, y,
          (bmpChannel(docId, i, 2) << 16) | (bmpChannel(docId, i, 1) << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode the seeded image as a real PNG (entropy-coded: DEFLATE over
    * filtered scanlines) via the in-JDK ImageIO writer. Lossless.
    */
  def encodePng(docId: Long, perturb: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(seededImage(docId, perturb), "png", bos),
      "no PNG writer on this JVM")
    bos.toByteArray
  }

  /** Encode the seeded image as a real JPEG at the given quality via
    * the in-JDK writer (DCT, quantization, Huffman coding). Lossy.
    */
  def encodeJpeg(docId: Long, quality: Float = 0.95f): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(seededImage(docId, false), null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Encode the seeded image as a real GIF (LZW over palette indices)
    * via the in-JDK ImageIO writer — the third entropy coding at the
    * image-decode seam (DEFLATE=PNG, DCT+Huffman=JPEG, LZW=GIF). GIF
    * is palette-coded: a seeded raster holds at most
    * `bmpWidth·bmpHeight ≤ 128` distinct colors, so building an
    * EXPLICIT IndexColorModel from exactly the colors present makes
    * the encode LOSSLESS — handing the writer a TYPE_INT_RGB image
    * would invoke its own quantizer instead (lossy even under 256
    * colors) — and the decode pins to the same pixel oracle as
    * BMP/PNG. Palette construction is itself part of the codec seam:
    * a real pipeline ingesting screenshots/diagrams does exactly this.
    */
  /** Build a palette-coded image with the palette constructed from
    * EXACTLY the colors present and palette indices written straight
    * into the raster — the one safe constructor for indexed rasters.
    * The naive "render TYPE_INT_RGB, then drawImage into the indexed
    * raster" composition routes through AWT's 5-bit-per-channel
    * InverseColorMap: palette entries nearer than 8 levels share one
    * 5-bit cell and collapse to a single index (observed: +0x10 per
    * channel on colliding rasters — the round-12 GIF hazard). Per-pixel
    * `setRGB` happens to stay exact (IndexColorModel.getDataElements
    * does an exhaustive nearest search, and an exact palette hit wins)
    * but pays an O(|palette|) scan per pixel. The index write is exact
    * by construction for ANY palette — pinned by spec against a
    * 2-levels-apart palette, with the drawImage snap as the negative
    * control. The TYPE_INT_RGB paths ([[seededImage]] → PNG/JPEG) are
    * immune: a DirectColorModel has no inverse map, `setRGB` stores
    * the pixel verbatim (also spec-pinned).
    *
    * At most 256 distinct colors (GIF's palette ceiling) — the seeded
    * rasters hold ≤128; a caller exceeding that gets a loud error,
    * not quantization.
    */
  private[graft] def indexedImage(
      w: Int, h: Int, rgbAt: Int => Int): java.awt.image.BufferedImage = {
    val colors = (0 until w * h).map(rgbAt).distinct
    require(colors.length <= 256,
      s"indexed raster supports <= 256 colors, got ${colors.length}")
    val bits = math.max(1, 32 - Integer.numberOfLeadingZeros(
      math.max(colors.length - 1, 1)))
    val cmap = colors.toArray.padTo(1 << bits, 0)
    val icm = new java.awt.image.IndexColorModel(
      bits, cmap.length, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val index = colors.zipWithIndex.toMap
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, index(rgbAt(y * w + x)))
        x += 1
      }
      y += 1
    }
    img
  }

  def encodeGif(docId: Long, perturb: Boolean = false): Array[Byte] = {
    val w = bmpWidth(docId); val h = bmpHeight(docId)
    // the same near-dup planting device as [[seededImage]]: blue of
    // logical pixel 0 bumped +8 mod 256 (adds at most one palette
    // color — still far under the 256-color ceiling)
    val img = indexedImage(w, h, i => {
      val b =
        if (perturb && i == 0) (bmpChannel(docId, 0, 0) + 8) % 256
        else bmpChannel(docId, i, 0)
      (bmpChannel(docId, i, 2) << 16) | (bmpChannel(docId, i, 1) << 8) | b
    })
    // write NON-interlaced explicitly: the JDK writer's default can
    // interlace, and on rasters shorter than the 8-row pass stride the
    // encode/decode pair scrambles rows (observed: h=4 images came
    // back in pass order with the last pass dropped)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** dHash over a library-decoded raster: the same 9×8 BT.709 luma
    * grid comparison as [[dhashFromBytes]], so a losslessly-coded
    * image hashes identically to its BMP rendering and the PNG phash
    * pipeline reuses the BMP oracle derivation unchanged.
    */
  def dhashFromImage(docId: Long, bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload for doc $docId")
    val w = img.getWidth; val h = img.getHeight
    def luma(x: Int, y: Int): Long = {
      val rgb = img.getRGB(x, y)
      2126L * ((rgb >> 16) & 0xff) + 7152L * ((rgb >> 8) & 0xff) + 722L * (rgb & 0xff)
    }
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      val sy = gy * h / 8
      var gx = 0
      while (gx < 8) {
        if (luma(gx * w / 9, sy) > luma((gx + 1) * w / 9, sy))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Mean absolute per-channel reconstruction error (milli-levels) of a
    * decoded raster vs the seeded field of `fieldId` — or, with
    * `inverted`, vs the 255-complement of that field (the planted-FALSE
    * control: |x − (255−e)| averages ≈127 levels for a correct decode,
    * measured ≥103.4 over 60k docs, so it breaches any sane tolerance
    * with an ~11σ margin while the true-field error stays ≤38.5).
    */
  private[graft] def jpegErrMilli(
      img: java.awt.image.BufferedImage, fieldId: Long, inverted: Boolean): Long = {
    val w = img.getWidth; val h = img.getHeight
    def expect(i: Int, c: Int): Int = {
      val e = bmpChannel(fieldId, i, c)
      if (inverted) 255 - e else e
    }
    var errSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val i = y * w + x
        errSum += math.abs(((rgb >> 16) & 0xff) - expect(i, 2)) +
          math.abs(((rgb >> 8) & 0xff) - expect(i, 1)) +
          math.abs((rgb & 0xff) - expect(i, 0))
        x += 1
      }
      y += 1
    }
    errSum * 1000L / (w.toLong * h * 3L)
  }

  /** Bump the blue channel of logical pixel (0, 0) by +8 (mod 256) —
    * a one-byte pixel edit that leaves the container intact. The
    * near-dup planting device: visually identical, byte-level
    * different, so exact/md5 dedup misses it and perceptual hashing
    * must catch it.
    */
  def perturbBmp(bytes: Array[Byte]): Array[Byte] = {
    val out = bytes.clone()
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val w = bb.getInt(18)
    val rawH = bb.getInt(22)
    val h = math.abs(rawH)
    val stride = (w * 3 + 3) / 4 * 4
    val fileRow = if (rawH < 0) 0 else h - 1 // logical top-left row
    val base = dataOffset + fileRow * stride
    out(base) = (((out(base).toInt & 0xff) + 8) % 256).toByte
    out
  }
}
