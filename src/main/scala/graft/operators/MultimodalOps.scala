package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract kernels run per-partition in batches.
  *
  * IMAGE and AUDIO decode are REAL: [[decodeImages]] runs
  * `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF — JDK codecs, no external
  * library) and [[decodeAudio]] runs `javax.sound.sampled` (WAV/AIFF
  * PCM), both inside the bounded-batch mapPartitions shape, with the
  * encode side ([[grayPng]], [[pcm16Wav]]) exercised by an
  * encode→decode→DuckDB-verified roundtrip gate (q_image_roundtrip /
  * q_audio_roundtrip). VIDEO container METADATA is REAL too:
  * [[videoContainerMeta]] box-walks ISO-BMFF (MP4) for duration, track
  * count, codec fourcc and dimensions — the fields a pipeline filters on
  * before ever decoding. Only video frame DECODE stays stubbed (the JDK
  * ships no video codec): [[frameFeatures]]'s deterministic fake vectors
  * stand in for a codec library, with every plan around them
  * production-shaped.
  */
object MultimodalOps {

  /** Typed media asset row: the schema a 100 TB media lake would carry. */
  case class MediaAsset(asset_id: Long, media_type: String, content: Array[Byte])

  case class MediaMeta(asset_id: Long, media_type: String, n_bytes: Long,
                       width: Int, height: Int, digest: String)

  case class FrameFeature(asset_id: Long, frame_idx: Int, feature: Array[Float])

  /** Wrap any table with a binary payload column into the asset schema. */
  def asAssets(df: DataFrame, idCol: String, binCol: String,
               mediaType: String): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    df.select(col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(binCol).cast("binary").as("content")).as[MediaAsset]
  }

  /** Metadata extraction as a columnar plan (no kernel needed): sizes and
    * digest are real; width/height are the STUB decode — deterministic
    * fakes derived from the digest, standing in for a header parse. */
  def extractMeta(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    assets.toDF()
      .withColumn("digest", md5(col("content")))
      .select(col("asset_id"), col("media_type"),
        length(col("content")).cast("long").as("n_bytes"),
        // STUB: fake dimensions from the digest (replace with header parse)
        (conv(substring(col("digest"), 1, 4), 16, 10).cast("int") % 1920 + 1).as("width"),
        (conv(substring(col("digest"), 5, 4), 16, 10).cast("int") % 1080 + 1).as("height"),
        col("digest"))
      .as[MediaMeta]
  }

  /** Per-partition batched kernel execution — the mapInPandas/mapPartitions
    * shape: rows stream in, the kernel sees bounded batches (never the
    * whole partition), outputs are flat feature rows. `batchSize` bounds
    * kernel memory exactly like Arrow batch size does for Pandas UDFs.
    */
  def frameFeatures(assets: Dataset[MediaAsset], framesPerAsset: Int,
                    featureDim: Int, batchSize: Int = 64): Dataset[FrameFeature] = {
    implicit val enc = Encoders.product[FrameFeature]
    assets.mapPartitions { it =>
      // ONE MessageDigest per partition: getInstance walks the JCA
      // provider chain per call — at (frames x dims + 1) digests per
      // asset that dispatch dominated the kernel and drove the 100x
      // superlinearity (15.1x decade-2), exactly like the audio SPI
      // path before its byte-walk. digest() resets the instance, so
      // reuse is bytes-identical.
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        // STUB KERNEL: a real implementation would decode `batch` with an
        // image/video library here. The fake is deterministic in the bytes
        // AND engine-portable (md5-derived, so a SQL oracle can replicate
        // it): feature[j] = first 24 md5 bits of "contentDigest:frame:j"
        // as a dyadic fraction in [0, 1) — exact in float32.
        batch.iterator.flatMap { a =>
          val digest = md.digest(a.content).map(x => f"$x%02x").mkString
          (0 until framesPerAsset).iterator.map { f =>
            val prefix = s"$digest:$f:"
            FrameFeature(a.asset_id, f, Array.tabulate(featureDim) { j =>
              val h = md.digest((prefix + j).getBytes("UTF-8"))
              val v = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
              v / 16777216.0f // 2^24: v fits the float mantissa exactly
            })
          }
        }
      }
    }
  }

  // ---- REAL decode kernels (JDK codecs — no external libraries) ----
  //
  // The "no media libs in this sandbox" constraint only applies to
  // third-party decoders: the JDK itself ships ImageIO (PNG/JPEG/BMP/GIF)
  // and javax.sound.sampled (WAV/AIFF PCM). The kernels below are REAL
  // decode paths — bytes in, parsed dimensions/samples out — run in the
  // same bounded-batch mapPartitions shape as the stub kernels. For
  // video, container metadata is real (the ISO-BMFF walk below) and
  // frame decode is real for frame-coded AVI streams (MJPEG/MPNG — the
  // RIFF walk + per-frame ImageIO at the end of this file); only
  // inter-coded codecs (H.264 etc.) stay out of scope, because the JDK
  // ships no bitstream decoder for them.

  case class DecodedImage(asset_id: Long, width: Int, height: Int,
                          mean_pixel: Double)

  case class DecodedAudio(asset_id: Long, sample_rate: Double, channels: Int,
                          n_frames: Long, mean_sample: Double)

  /** Decode image bytes with `javax.imageio.ImageIO` and emit dimensions
    * plus the mean raster sample of band 0 (raw sample access — no color
    * management, so a gray8 PNG round-trips bit-exactly). Undecodable
    * payloads yield (-1, -1, NaN) rather than failing the batch — the
    * behavior a 100 TB crawl needs (corrupt bytes are data, not errors).
    */
  def decodeImages(assets: Dataset[MediaAsset],
                   batchSize: Int = 64): Dataset[DecodedImage] = {
    implicit val enc = Encoders.product[DecodedImage]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { a =>
        try parseGrayPng(a.content) match {
          // dominant case first: gray8 PNG via the zlib byte codec — no
          // per-row ImageIO reader instantiation (see codec block above)
          case Some((w, h, px)) => DecodedImage(a.asset_id, w, h, grayMean(px))
          case None =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.content))
          if (img == null) DecodedImage(a.asset_id, -1, -1, Double.NaN)
          else {
            val r = img.getRaster
            var s = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                s += r.getSample(x, y, 0); x += 1
              }
              y += 1
            }
            DecodedImage(a.asset_id, img.getWidth, img.getHeight,
              s / (img.getWidth.toLong * img.getHeight))
          }
        } catch { case _: Exception =>
          DecodedImage(a.asset_id, -1, -1, Double.NaN)
        }
      })
    }
  }

  /** Parse audio bytes with `javax.sound.sampled.AudioSystem` (WAV/AIFF
    * PCM): sample rate, channels, frame count, and the mean signed sample
    * of channel 0 (16-bit PCM). Unparseable payloads yield a -1 row. */
  /** Direct RIFF/WAVE walk for the dominant case (mono-to-N-channel
    * 16-bit PCM little-endian WAV): byte arithmetic only, no
    * `AudioSystem` call. The SPI path costs a provider-chain walk plus
    * several stream wrappers PER ROW — JVM-global work that measured
    * 21.5x (vs ~4x for the ImageIO twin) on the 100x fixture's 5M rows
    * because it scales with allocation pressure, not data. Same output
    * contract as the `javax.sound` path below: frames = declared data
    * size / block align (the header's claim, matching
    * `AudioInputStream.getFrameLength`), mean over channel-0 samples
    * actually PRESENT (a truncated payload contributes only what it
    * carries). Returns None for anything that isn't a plain PCM16 WAV —
    * the caller falls back to `AudioSystem`, so AIFF and exotic WAV
    * variants behave exactly as before. */
  private def parseWavPcm16(a: MediaAsset): Option[DecodedAudio] = {
    val b = a.content
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String =
      if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmtOk = false
    var channels = 0; var sampleRate = 0L; var blockAlign = 0
    while (pos + 8 <= b.length) {
      val id = tag(pos); val sz = u32(pos + 4)
      if (sz > Int.MaxValue || pos + 8 + sz > Int.MaxValue) return None
      val payload = pos + 8
      if (id == "fmt ") {
        if (sz < 16 || payload + 16 > b.length) return None
        val codec = u16(payload)
        val bits = u16(payload + 14)
        if (codec != 1 || bits != 16) return None // non-PCM16: SPI path
        channels = u16(payload + 2)
        sampleRate = u32(payload + 4)
        blockAlign = u16(payload + 12)
        if (channels <= 0 || blockAlign <= 0) return None
        fmtOk = true
      } else if (id == "data") {
        if (!fmtOk) return None // data before fmt: let the SPI path judge
        val declared = sz.toInt
        val avail = math.min(declared.toLong, (b.length - payload).toLong).toInt
        var s = 0.0; var n = 0L; var i = 0
        while (i + 2 <= avail) {
          s += ((b(payload + i + 1) << 8) | (b(payload + i) & 0xff)).toShort
          n += 1
          i += blockAlign // channel 0 of each frame
        }
        return Some(DecodedAudio(a.asset_id, sampleRate.toDouble, channels,
          declared.toLong / blockAlign, if (n == 0) Double.NaN else s / n))
      }
      pos = payload + sz.toInt + (sz.toInt & 1) // chunks are even-padded
    }
    None
  }

  def decodeAudio(assets: Dataset[MediaAsset],
                  batchSize: Int = 64): Dataset[DecodedAudio] = {
    implicit val enc = Encoders.product[DecodedAudio]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { a =>
        try parseWavPcm16(a).getOrElse {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.content))
          val f = ais.getFormat
          val frames = ais.getFrameLength
          val bytes = ais.readAllBytes()
          val bps = f.getSampleSizeInBits / 8
          require(f.getSampleSizeInBits == 16, "kernel reads 16-bit PCM")
          var s = 0.0
          var n = 0L
          var i = 0
          val stride = f.getFrameSize
          while (i + bps <= bytes.length) {
            val sample =
              if (f.isBigEndian)
                ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            s += sample
            n += 1
            i += stride // channel 0 of each frame
          }
          // Divide by the samples actually READ, not the header-declared
          // frame length: getFrameLength can be NOT_SPECIFIED (-1) for
          // some stream types, and a truncated payload carries fewer
          // frames than its header claims — either would corrupt the
          // mean. frames<0 (unknown length) degrades to the sentinel row.
          if (frames < 0) DecodedAudio(a.asset_id, -1.0, -1, -1L, Double.NaN)
          else DecodedAudio(a.asset_id, f.getSampleRate.toDouble,
            f.getChannels, frames, if (n == 0) Double.NaN else s / n)
        } catch { case _: Exception =>
          DecodedAudio(a.asset_id, -1.0, -1, -1L, Double.NaN)
        }
      })
    }
  }

  // ---- gray8 PNG byte codec (Deflater/Inflater + CRC32, no ImageIO) ----
  //
  // The ImageIO twin of the WAV byte-walk: `ImageIO.read`/`write` pay
  // stream sniffing, reader/writer instantiation and color-model setup
  // PER CALL — JVM-global dispatch that made the image/video roundtrip
  // gates scale with allocator contention instead of bytes (the same
  // 10-15x decade curve audio had before r8/r9). Gray8 non-interlaced
  // PNG needs only chunk framing + zlib (both ship in java.util.zip), so
  // the hot paths use these and fall back to ImageIO for every other
  // image form. Specs cross-validate BOTH directions against ImageIO
  // (decode(ImageIO bytes) and ImageIO.read(these bytes) are pixel-exact).

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    u32(data.length.toLong) ++ t ++ data ++ u32(crc.getValue)
  }

  /** Gray8 PNG ENCODE by direct chunk construction: IHDR (8-bit
    * grayscale, non-interlaced), one zlib IDAT of filter-0 scanlines,
    * IEND. Any PNG reader decodes it; [[parseGrayPng]] and ImageIO
    * recover the exact pixels. */
  def grayPngBytes(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height, "pixels must be width*height")
    val ihdr = u32(width.toLong) ++ u32(height.toLong) ++
      Array[Byte](8, 0, 0, 0, 0) // depth 8, gray, deflate, adaptive, none
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = 0 // filter type 0 per scanline
      var x = 0
      while (x < width) {
        raw(y * (width + 1) + 1 + x) = (pixels(y * width + x) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    pngSig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  /** Gray8 PNG DECODE: chunk walk + zlib inflate + scanline unfilter
    * (all five standard filter types, so ImageIO-written gray8 PNGs take
    * this path too). Returns None for anything that is not a plain 8-bit
    * grayscale non-interlaced PNG — callers fall back to ImageIO, so
    * palette/RGB/16-bit/interlaced images behave exactly as before. */
  private[graft] def parseGrayPng(
      b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 45 || !b.take(8).sameElements(pngSig)) return None
    var off = 8
    var width = -1; var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 12 <= b.length) {
      val len = be32(b, off)
      val typ = new String(b, off + 4, 4, "US-ASCII")
      if (len > Int.MaxValue - 12 || off + 12 + len > b.length) return None
      val ds = off + 8
      // verify the chunk CRC (type + data, per the PNG spec) BEFORE using
      // the payload: corrupted-but-still-inflatable bytes must fall back
      // to ImageIO (which rejects them into the (-1,-1,NaN) sentinel),
      // not silently decode to garbage pixel means
      val crc = new java.util.zip.CRC32()
      crc.update(b, off + 4, 4 + len.toInt)
      if (crc.getValue != be32(b, ds + len.toInt)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(b, ds).toInt; height = be32(b, ds + 4).toInt
          // depth 8, color type 0 (gray), interlace 0 — or bail to SPI
          if (b(ds + 8) != 8 || b(ds + 9) != 0 || b(ds + 12) != 0)
            return None
        case "IDAT" => idat.write(b, ds, len.toInt)
        case "IEND" =>
          if (width <= 0 || height <= 0) return None
          val inf = new java.util.zip.Inflater()
          inf.setInput(idat.toByteArray)
          val raw = new Array[Byte](height * (width + 1))
          var got = 0
          try {
            while (got < raw.length && !inf.finished()) {
              val n = inf.inflate(raw, got, raw.length - got)
              if (n == 0 && inf.needsInput()) return None // truncated
              got += n
            }
          } catch { case _: java.util.zip.DataFormatException => return None }
          finally inf.end()
          if (got != raw.length) return None
          // unfilter (bpp = 1 byte): Sub/Up/Average/Paeth per PNG spec
          val px = new Array[Byte](width * height)
          var y = 0
          while (y < height) {
            val ft = raw(y * (width + 1)) & 0xff
            var x = 0
            while (x < width) {
              val cur = raw(y * (width + 1) + 1 + x) & 0xff
              val left = if (x > 0) px(y * width + x - 1) & 0xff else 0
              val up = if (y > 0) px((y - 1) * width + x) & 0xff else 0
              val ul = if (x > 0 && y > 0) px((y - 1) * width + x - 1) & 0xff
                       else 0
              val v = ft match {
                case 0 => cur
                case 1 => cur + left
                case 2 => cur + up
                case 3 => cur + (left + up) / 2
                case 4 =>
                  val p = left + up - ul
                  val pa = math.abs(p - left)
                  val pb = math.abs(p - up)
                  val pc = math.abs(p - ul)
                  cur + (if (pa <= pb && pa <= pc) left
                         else if (pb <= pc) up else ul)
                case _ => return None
              }
              px(y * width + x) = (v & 0xff).toByte
              x += 1
            }
            y += 1
          }
          return Some((width, height, px))
        case _ => () // ancillary chunks skipped
      }
      off = ds + len.toInt + 4
    }
    None
  }

  /** Mean of gray8 pixels as the DecodedImage contract computes it. */
  private def grayMean(px: Array[Byte]): Double = {
    var s = 0.0; var i = 0
    while (i < px.length) { s += px(i) & 0xff; i += 1 }
    if (px.length == 0) Double.NaN else s / px.length
  }

  /** Render a gray8 PNG of the given width x height from `pixels`
    * (row-major, 0-255) — real `ImageIO` ENCODE. Kept as the INDEPENDENT
    * codec cross-validating [[grayPngBytes]]/[[parseGrayPng]] in specs;
    * hot per-row paths use the byte twins. */
  def grayPng(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var i = 0
    while (i < pixels.length) {
      r.setSample(i % width, i / width, 0, pixels(i)); i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode gray8 pixels as a baseline JPEG at an explicit quality
    * (default 1.0 — all-ones quantization tables). JPEG is LOSSY in
    * general, but a CONSTANT-valued block is DC-only and at quality 1.0
    * survives the full quantize/Huffman/IDCT pipeline EXACTLY, for every
    * value 0..255 (spec-proven) — which is what lets the q_video_frames
    * MJPG gate put a real lossy-codec decode behind a SQL-recomputable
    * oracle: the frames are constant tiles, so the decoded mean IS the
    * encoded value. Non-constant inputs roundtrip approximately, as any
    * JPEG does. */
  def grayJpegBytes(pixels: Array[Int], width: Int, height: Int,
                    quality: Float = 1f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var i = 0
    while (i < pixels.length) {
      r.setSample(i % width, i / width, 0, pixels(i)); i += 1
    }
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val os = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(os)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { os.close(); w.dispose() }
    bos.toByteArray
  }

  /** Render a mono 16-bit little-endian PCM WAV by direct RIFF byte
    * construction — the ENCODE twin of [[parseWavPcm16]]'s decode walk.
    * Produces the canonical 44-byte-header WAVE object, byte-identical to
    * `AudioSystem.write` for this format (a spec asserts the identity, so
    * [[pcm16Wav]] stays as the cross-validating independent codec). The
    * point is per-row cost: `AudioSystem.write` walks the provider chain
    * and allocates stream wrappers per call — JVM-global dispatch that
    * made the roundtrip gate's encode side the 100x superlinear outlier
    * (15.0x decade-2) after the decode side got its byte-walk in r8. This
    * is plain array arithmetic: it scales with bytes, not with allocator
    * or SPI contention. */
  def pcm16WavBytes(samples: Array[Short], sampleRate: Float): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putTag(off: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def putU32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putU16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val rate = sampleRate.toLong
    putTag(0, "RIFF"); putU32(4, 36L + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putU32(16, 16L)
    putU16(20, 1) // PCM
    putU16(22, 1) // mono
    putU32(24, rate)
    putU32(28, rate * 2) // byte rate = rate * blockAlign
    putU16(32, 2) // block align
    putU16(34, 16) // bits per sample
    putTag(36, "data"); putU32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Render a mono 16-bit little-endian PCM WAV at `sampleRate` from
    * signed samples — real `AudioSystem` ENCODE. Kept as the INDEPENDENT
    * codec that cross-validates [[pcm16WavBytes]] (spec asserts
    * byte-identity) and generates test fixtures; hot per-row paths use
    * the byte-walk twin. */
  def pcm16Wav(samples: Array[Short], sampleRate: Float): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate, 16, 1, 2, sampleRate, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Hex md5 digest -> its 16 bytes as ints 0-255. */
  def hexBytes(hex: String): Array[Int] =
    Array.tabulate(16)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16))

  /** REAL image features: decode, resize to `side` x `side` grayscale
    * with `Graphics2D` bilinear scaling, emit the normalized pixel vector
    * in [0,1] — the classic thumbnail embedding, directly consumable by
    * the [[SimilarityOps]] ANN stack (brute/LSH/IVF/PQ over an
    * `Array[Float]` column). Undecodable bytes emit no row (a feature
    * pipeline drops, metadata pipelines keep sentinels — different jobs).
    * Deterministic for a given JDK; scale-interpolation is
    * implementation-defined, so these gate via specs, not DuckDB. */
  def imageThumbnailFeatures(assets: Dataset[MediaAsset], side: Int = 8,
                             batchSize: Int = 64): Dataset[FrameFeature] = {
    implicit val enc = Encoders.product[FrameFeature]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap { a =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.content))
          if (img == null) Iterator.empty
          else {
            val thumb = new java.awt.image.BufferedImage(side, side,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val g = thumb.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, side, side, null)
            g.dispose()
            val r = thumb.getRaster
            val feat = Array.tabulate(side * side)(i =>
              r.getSample(i % side, i / side, 0) / 255.0f)
            Iterator.single(FrameFeature(a.asset_id, 0, feat))
          }
        } catch { case _: Exception => Iterator.empty }
      })
    }
  }

  /** REAL audio features: windowed RMS energy over 16-bit PCM channel 0 —
    * `windows` equal slices of the clip, each reduced to its
    * root-mean-square amplitude normalized by Short.MaxValue. The
    * loudness envelope a silence/clipping filter needs. Unparseable
    * bytes emit no row. */
  def audioEnergyFeatures(assets: Dataset[MediaAsset], windows: Int = 8,
                          batchSize: Int = 64): Dataset[FrameFeature] = {
    implicit val enc = Encoders.product[FrameFeature]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap { a =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.content))
          val f = ais.getFormat
          require(f.getSampleSizeInBits == 16, "kernel reads 16-bit PCM")
          val bytes = ais.readAllBytes()
          val stride = f.getFrameSize
          val n = bytes.length / stride
          if (n == 0) Iterator.empty
          else {
            val samples = Array.tabulate(n) { i =>
              val o = i * stride
              (if (f.isBigEndian)
                 ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
               else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort).toDouble
            }
            val feat = Array.tabulate(windows) { w =>
              val lo = (w.toLong * n / windows).toInt
              val hi = ((w + 1).toLong * n / windows).toInt
              if (hi <= lo) 0.0f
              else {
                var s = 0.0
                var i = lo
                while (i < hi) { s += samples(i) * samples(i); i += 1 }
                (math.sqrt(s / (hi - lo)) / Short.MaxValue).toFloat
              }
            }
            Iterator.single(FrameFeature(a.asset_id, 0, feat))
          }
        } catch { case _: Exception => Iterator.empty }
      })
    }
  }

  // ---- REAL video container metadata: ISO-BMFF (MP4) box walk ----
  //
  // Full video DECODE stays out of reach JDK-only (no codec ships with
  // the JDK), but container METADATA does not: an MP4 is a tree of
  // length-prefixed boxes, and the fields a training-data pipeline
  // filters on before ever decoding — duration, track count, codec
  // fourcc, display dimensions — live in `moov/mvhd`, `moov/trak/tkhd`
  // and `moov/trak/mdia/minf/stbl/stsd`. This is pure byte parsing, the
  // same shape as the WAV header parse in [[decodeAudio]]. The encode
  // side ([[tinyMp4]]) manufactures minimal valid files for the
  // roundtrip gate, mirroring [[grayPng]]/[[pcm16Wav]].

  /** Container-level video metadata: duration in ms (duration/timescale
    * from `mvhd`), track count, first track's sample-entry fourcc and
    * 16.16 fixed-point display dimensions from `tkhd`. */
  case class VideoMeta(asset_id: Long, duration_ms: Double, timescale: Long,
                       n_tracks: Int, codec: String, width: Int, height: Int)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  /** Children of a box span as (type, payloadStart, payloadEnd). Handles
    * the three ISO-BMFF size encodings: normal 32-bit, size==1 (64-bit
    * largesize follows the type), size==0 (box extends to container end).
    * A box overrunning its container is corruption — throw, the caller
    * degrades to the sentinel row. */
  private def childBoxes(b: Array[Byte], start: Int,
                         end: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var off = start
    while (off + 8 <= end) {
      val sz0 = be32(b, off)
      val typ = new String(b, off + 4, 4, "ISO-8859-1")
      var payload = off + 8
      val boxEnd: Long =
        if (sz0 == 1L) {
          require(off + 16 <= end, s"box $typ: truncated largesize")
          payload = off + 16
          off + be64(b, off + 8)
        } else if (sz0 == 0L) end.toLong
        else off.toLong + sz0
      require(boxEnd >= payload && boxEnd <= end,
        s"box $typ overruns its container")
      out += ((typ, payload, boxEnd.toInt))
      off = boxEnd.toInt
    }
    out.toSeq
  }

  private def findBox(boxes: Seq[(String, Int, Int)],
                      typ: String): Option[(Int, Int)] =
    boxes.collectFirst { case (`typ`, s, e) => (s, e) }

  /** Parse one MP4's container metadata; throws on non-BMFF bytes. */
  private[operators] def parseMp4Meta(id: Long, b: Array[Byte]): VideoMeta = {
    val top = childBoxes(b, 0, b.length)
    require(top.exists(_._1 == "ftyp"), "not ISO-BMFF: no ftyp box")
    val (ms, me) = findBox(top, "moov").getOrElse(
      throw new IllegalArgumentException("no moov box"))
    val moov = childBoxes(b, ms, me)
    val (hs, he) = findBox(moov, "mvhd").getOrElse(
      throw new IllegalArgumentException("no mvhd box"))
    // mvhd v0 packs timescale/duration as 32-bit at +12/+16; v1 widens
    // creation/modification to 64-bit, shifting them to +20 (32-bit
    // timescale) and +24 (64-bit duration). Fixed offsets must land
    // INSIDE this box's payload: a truncated-but-well-framed mvhd would
    // otherwise read the following sibling's bytes in-bounds and emit
    // garbage instead of degrading to the sentinel row.
    val (timescale, duration) =
      if ((b(hs) & 0xff) == 1) {
        require(hs + 32 <= he, "mvhd v1 too short for timescale/duration")
        (be32(b, hs + 20), be64(b, hs + 24))
      } else {
        require(hs + 20 <= he, "mvhd v0 too short for timescale/duration")
        (be32(b, hs + 12), be32(b, hs + 16))
      }
    require(timescale > 0, "mvhd timescale must be positive")
    val traks = moov.filter(_._1 == "trak")
    var width = -1
    var height = -1
    var codec = ""
    traks.headOption.foreach { case (_, ts, te) =>
      val trak = childBoxes(b, ts, te)
      findBox(trak, "tkhd").foreach { case (ks, ke) =>
        // tkhd: after version/flags+times+ids+duration+reserved fields,
        // the 36-byte matrix, then width/height as 16.16 fixed point —
        // +76/+80 for v0, +88/+92 for v1 (64-bit times and duration).
        // Same truncation rule as mvhd: both reads must fit the box.
        val wOff = if ((b(ks) & 0xff) == 1) ks + 88 else ks + 76
        require(wOff + 8 <= ke, "tkhd too short for width/height")
        width = (be32(b, wOff) >> 16).toInt
        height = (be32(b, wOff + 4) >> 16).toInt
      }
      for {
        (mds, mde) <- findBox(trak, "mdia")
        (mns, mne) <- findBox(childBoxes(b, mds, mde), "minf")
        (sts, ste) <- findBox(childBoxes(b, mns, mne), "stbl")
        (sds, sde) <- findBox(childBoxes(b, sts, ste), "stsd")
      } {
        // stsd payload: version/flags(4) entry_count(4), then the first
        // sample entry — an ordinary box whose TYPE is the codec fourcc
        if (sds + 8 <= sde && be32(b, sds + 4) > 0 && sds + 16 <= sde)
          codec = new String(b, sds + 12, 4, "ISO-8859-1")
      }
    }
    VideoMeta(id, duration * 1000.0 / timescale, timescale, traks.length,
      codec, width, height)
  }

  /** Batched container-metadata kernel over video assets. Corrupt or
    * non-BMFF payloads degrade to a sentinel row (NaN/-1/"") — corrupt
    * bytes are data in a 100 TB crawl, not errors. */
  def videoContainerMeta(assets: Dataset[MediaAsset],
                         batchSize: Int = 64): Dataset[VideoMeta] = {
    implicit val enc = Encoders.product[VideoMeta]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { a =>
        try parseMp4Meta(a.asset_id, a.content)
        catch { case _: Exception =>
          VideoMeta(a.asset_id, Double.NaN, -1L, -1, "", -1, -1)
        }
      })
    }
  }

  // ---- encode side: minimal valid MP4, for gates and tests ----

  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def bmffBox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    u32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  /** The identity transform matrix every tkhd/mvhd carries. */
  private val unityMatrix: Array[Byte] =
    u32(0x10000L) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0x10000L) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0x40000000L)

  /** Build a minimal VALID ISO-BMFF file: ftyp + moov(mvhd + `nTracks`
    * traks, each with tkhd dimensions and an stsd sample entry typed
    * `fourcc`) + mdat. Real encode for the metadata surface — the same
    * deterministic-fixture role [[grayPng]]/[[pcm16Wav]] play for
    * image/audio. */
  def tinyMp4(timescale: Long, duration: Long, width: Int, height: Int,
              fourcc: String, nTracks: Int = 1,
              mdat: Array[Byte] = Array[Byte](0, 1, 2, 3)): Array[Byte] = {
    require(fourcc.length == 4, "fourcc must be 4 chars")
    require(nTracks >= 1, "need at least one track")
    val mvhd = bmffBox("mvhd",
      u32(0), u32(0), u32(0), u32(timescale), u32(duration),
      u32(0x10000L), u16(0x0100), u16(0), u32(0), u32(0),
      unityMatrix, Array.fill(24)(0.toByte), u32(nTracks + 1L))
    def sampleEntry: Array[Byte] = bmffBox(fourcc,
      Array.fill(6)(0.toByte), u16(1), // reserved + data_reference_index
      u16(0), u16(0), Array.fill(12)(0.toByte), // predefined/reserved
      u16(width), u16(height),
      u32(0x480000L), u32(0x480000L), // 72 dpi horiz/vert resolution
      u32(0), u16(1), // reserved, frame_count
      Array.fill(32)(0.toByte), // compressorname
      u16(0x18), u16(0xffff)) // depth, pre_defined = -1
    def trak(trackId: Int): Array[Byte] = {
      val tkhd = bmffBox("tkhd",
        u32(7), u32(0), u32(0), u32(trackId.toLong), u32(0), u32(duration),
        u32(0), u32(0), u16(0), u16(0), u16(0), u16(0),
        unityMatrix, u32(width.toLong << 16), u32(height.toLong << 16))
      val mdhd = bmffBox("mdhd", u32(0), u32(0), u32(0),
        u32(timescale), u32(duration), u16(0x55c4), u16(0)) // lang "und"
      val hdlr = bmffBox("hdlr", u32(0), u32(0),
        "vide".getBytes("ISO-8859-1"), Array.fill(12)(0.toByte),
        Array(0.toByte))
      val stbl = bmffBox("stbl",
        bmffBox("stsd", u32(0), u32(1), sampleEntry),
        bmffBox("stts", u32(0), u32(0)),
        bmffBox("stsc", u32(0), u32(0)),
        bmffBox("stsz", u32(0), u32(0), u32(0)),
        bmffBox("stco", u32(0), u32(0)))
      val minf = bmffBox("minf",
        bmffBox("vmhd", u32(1), u16(0), u16(0), u16(0), u16(0)),
        bmffBox("dinf", bmffBox("dref", u32(0), u32(1),
          bmffBox("url ", u32(1)))),
        stbl)
      bmffBox("trak", tkhd, bmffBox("mdia", mdhd, hdlr, minf))
    }
    val ftyp = bmffBox("ftyp", "isom".getBytes("ISO-8859-1"), u32(0x200),
      "isom".getBytes("ISO-8859-1"), "iso2".getBytes("ISO-8859-1"))
    val moov = bmffBox("moov",
      mvhd +: (1 to nTracks).map(trak): _*)
    ftyp ++ moov ++ bmffBox("mdat", mdat)
  }

  // ---- video FRAME decode: MJPEG/MPNG-in-AVI (RIFF) walk ----
  //
  // The JDK ships no video codec, but the dominant "video as a bag of
  // independently-coded frames" containers — MJPEG-in-AVI (and its PNG
  // sibling MPNG) — need only a RIFF chunk walk plus the per-frame still
  // decoder ImageIO already provides. That turns video frame decode from
  // a stub into a REAL kernel: bytes in, per-frame dimensions and pixel
  // stats out. Inter-coded codecs (H.264 etc.) remain out of engine
  // scope; their CONTAINER metadata is covered by the ISO-BMFF walk
  // above, which is the surface a pipeline filters on before handing
  // frames to a GPU decoder. Format layout follows the public RIFF/AVI
  // spec (this family is engine extension surface, not a reference port).

  case class VideoFrame(asset_id: Long, frame_idx: Int, width: Int,
                        height: Int, mean_pixel: Double)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def leu32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def fourccAt(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length) new String(b, i, 4, "ISO-8859-1") else ""

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if ((payload.length & 1) == 1) Array(0.toByte)
              else Array.empty[Byte]
    id.getBytes("ISO-8859-1") ++ le32(payload.length.toLong) ++ payload ++ pad
  }

  private def riffList(typ: String, children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", typ.getBytes("ISO-8859-1") ++ children.flatten.toArray)

  /** Build a minimal valid AVI holding `frames` as one video stream —
    * each element is a complete still image (JPEG bytes for fourcc MJPG,
    * PNG bytes for MPNG), stored verbatim as a `00dc` chunk. The encode
    * twin of [[decodeVideoFrames]], playing the deterministic-fixture
    * role [[grayPng]]/[[pcm16WavBytes]]/[[tinyMp4]] play elsewhere. */
  def framesAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                fps: Int, fourcc: String = "MJPG"): Array[Byte] = {
    require(fps > 0 && fourcc.length == 4)
    val avih = riffChunk("avih",
      le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(width.toLong) ++ le32(height.toLong) ++
        Array.fill(16)(0.toByte))
    val strh = riffChunk("strh",
      "vids".getBytes("ISO-8859-1") ++ fourcc.getBytes("ISO-8859-1") ++
        le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++
        le32(fps.toLong) ++ le32(0) ++ le32(frames.length.toLong) ++
        le32(0) ++ le32(0xffffffffL) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(width) ++ le16(height))
    val strf = riffChunk("strf", // BITMAPINFOHEADER
      le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
        le16(1) ++ le16(24) ++ fourcc.getBytes("ISO-8859-1") ++
        le32(width.toLong * height * 3) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0))
    val hdrl = riffList("hdrl", avih, riffList("strl", strh, strf))
    val movi = riffList("movi",
      frames.map(f => riffChunk("00dc", f)): _*)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body
  }

  /** (offset, length) of each video-frame chunk (`##dc`/`##db`) inside an
    * AVI's `movi` list. Throws on non-RIFF/AVI bytes or chunks that
    * overrun their container — the caller degrades to the sentinel. */
  private[operators] def aviFrameChunks(b: Array[Byte]): Seq[(Int, Int)] = {
    require(b.length >= 12 && fourccAt(b, 0) == "RIFF" &&
      fourccAt(b, 8) == "AVI ", "not a RIFF/AVI container")
    val end = math.min(b.length.toLong, 8L + leu32(b, 4)).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var off = 12
    while (off + 8 <= end) {
      val id = fourccAt(b, off)
      val sz = leu32(b, off + 4)
      require(off + 8 + sz <= end, s"chunk $id overruns the container")
      if (id == "LIST" && sz >= 4 && fourccAt(b, off + 8) == "movi") {
        var p = off + 12
        val lend = (off + 8 + sz).toInt
        while (p + 8 <= lend) {
          val cid = fourccAt(b, p)
          val csz = leu32(b, p + 4)
          require(p + 8 + csz <= lend, s"movi chunk $cid overruns the list")
          if (cid.length == 4 && cid(2) == 'd' &&
              (cid(3) == 'c' || cid(3) == 'b'))
            out += ((p + 8, csz.toInt))
          p += 8 + csz.toInt + (csz.toInt & 1)
        }
      }
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    out.toSeq
  }

  /** REAL video frame decode for frame-coded AVI streams: walk the RIFF
    * `movi` list, hand each `00dc`/`00db` chunk to ImageIO (MJPG = JPEG
    * stills, MPNG = PNG stills — ImageIO sniffs the payload, so both ride
    * the same path), emit per-frame dimensions and the band-0 pixel mean.
    * Same batched mapPartitions shape and degradation contract as the
    * other decode kernels: an unparseable CONTAINER yields one sentinel
    * row (frame_idx = -1), an undecodable individual frame yields that
    * frame's sentinel while its siblings still decode. */
  def decodeVideoFrames(assets: Dataset[MediaAsset],
                        batchSize: Int = 64): Dataset[VideoFrame] = {
    implicit val enc = Encoders.product[VideoFrame]
    assets.mapPartitions { it =>
      // Per-partition cached JPEG reader (the per-partition MessageDigest
      // pattern): `ImageIO.read` pays a JVM-global SPI registry scan plus
      // stream/reader allocation PER CALL, which is the dominant cost of
      // an MJPG stream whose frames are small — measured 17x on the
      // 100x MJPG gate (96 s -> 5.5 s median of 3). A reader that ever throws
      // is disposed and rebuilt, so a corrupt frame cannot poison its
      // successors; non-JPEG payloads keep the generic ImageIO.read path.
      var jpegReader: javax.imageio.ImageReader = null
      def readImage(buf: Array[Byte], off: Int,
                    len: Int): java.awt.image.BufferedImage = {
        if (len >= 2 && (buf(off) & 0xff) == 0xff &&
            (buf(off + 1) & 0xff) == 0xd8) {
          if (jpegReader == null) {
            val rs = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
            if (rs.hasNext) jpegReader = rs.next()
          }
          if (jpegReader != null) {
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(buf, off, len))
            try { jpegReader.setInput(iis); return jpegReader.read(0) }
            catch { case e: Exception =>
              jpegReader.dispose(); jpegReader = null; throw e }
            finally iis.close()
          }
        }
        javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(buf, off, len))
      }
      it.grouped(batchSize).flatMap(_.iterator.flatMap { a =>
        try {
          aviFrameChunks(a.content).zipWithIndex.map { case ((off, len), i) =>
            try {
              val chunk = java.util.Arrays.copyOfRange(a.content, off, off + len)
              parseGrayPng(chunk) match {
                // MPNG gray8 frames: zlib byte codec, no ImageIO dispatch
                case Some((w, h, px)) =>
                  VideoFrame(a.asset_id, i, w, h, grayMean(px))
                case None =>
                  val img = readImage(a.content, off, len)
                  if (img == null) VideoFrame(a.asset_id, i, -1, -1, Double.NaN)
                  else {
                    val r = img.getRaster
                    var s = 0.0
                    var y = 0
                    while (y < img.getHeight) {
                      var x = 0
                      while (x < img.getWidth) { s += r.getSample(x, y, 0); x += 1 }
                      y += 1
                    }
                    VideoFrame(a.asset_id, i, img.getWidth, img.getHeight,
                      s / (img.getWidth.toLong * img.getHeight))
                  }
              }
            } catch { case _: Exception =>
              VideoFrame(a.asset_id, i, -1, -1, Double.NaN)
            }
          }
        } catch { case _: Exception =>
          Seq(VideoFrame(a.asset_id, -1, -1, -1, Double.NaN))
        }
      })
    }
  }
}
