package graft

import graft.operators.{MultimodalOps, TextAnalysisOps, TextOps}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies stopword-marked languages, und for gibberish") {
    val df = Seq(
      (1L, "the cat sat on the mat and it is a good day for the dog"),
      (2L, "el gato esta en la casa y el perro con los ninos en el jardin"),
      (3L, "der hund und die katze sind nicht mit den kindern zu hause"),
      (4L, "le chat et le chien dans la maison pour les enfants que nous aimons"),
      (5L, "zzz qqq xxx yyy www vvv")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysisOps.langId(TextOps.tokens(col("text"))).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "und"))
  }

  test("tokenCounts three ways on a known string") {
    val df = Seq((1L, "hello, world! it's 42")).toDF("doc_id", "text")
    val r = TextAnalysisOps.tokenCounts(df, "doc_id", "text").head()
    assert(r.getInt(1) === 4) // ws tokens: hello, world! it's 42
    // regex: hello , world ! it ' s 42 -> 8
    assert(r.getInt(2) === 8)
    assert(r.getLong(3) === math.ceil(21 / 4.0).toLong)
  }

  test("quality score is bounded and orders clean text above junk") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the hill"),
      (2L, "aa aa aa aa aa aa aa aa aa aa aa aa"),
      (3L, "")
    ).toDF("doc_id", "text")
    val q = TextAnalysisOps.qualityScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    q.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L) && q(2L) > q(3L))
  }

  test("repetitionRatio: 0 for all-distinct, high for looped boilerplate") {
    val df = Seq(
      (1L, "one two three four five six seven"),          // all trigrams distinct
      (2L, "spam ham spam ham spam ham spam ham spam ham"), // 2-period loop
      (3L, "a b")                                          // shorter than n -> 1 shingle
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.repetitionRatio(df, "doc_id", "text", shingleN = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((5L, 5L, 0.0)))
    // 8 trigrams, only 2 distinct ("spam ham spam", "ham spam ham") -> 6/8
    assert(out(2L) === ((8L, 2L, 0.75)))
    assert(out(3L) === ((1L, 1L, 0.0)))
  }

  test("winnowedPairs finds the overlapping pair and respects the df cap") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda mu"),             // heavy overlap with 1
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.TextAnalysisOps
      .winnowedPairs(docs, "doc_id", "text", shingleN = 4, window = 4,
        maxDf = 50, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"overlapping pair missing: $pairs")
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L },
      "disjoint doc must not pair")
    // with maxDf = 1 every shared fingerprint is "hot" -> no pairs survive
    val capped = graft.operators.TextAnalysisOps
      .winnowedPairs(docs, "doc_id", "text", maxDf = 1, minShared = 2)
    assert(capped.count() === 0)
  }

  test("winnowing fingerprints: identical docs match, shared content overlaps") {
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val df = Seq((1L, text), (2L, text), (3L, text + " tail1 tail2 tail3 tail4"))
      .toDF("doc_id", "text")
    val fp = TextAnalysisOps.fingerprintSketch(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L)._1 > 0)
    val sets = TextAnalysisOps.winnowingFingerprintSets(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((sets(1L) & sets(3L)).nonEmpty, "shared prefix shares fingerprints")
  }

  test("redact scrubs urls, emails, ips and ssn-shaped ids with counts") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a@b.co or visit https://x.example/u?q=a@b.co from 10.1.2.3"),
      (2L, "ssn 123-45-6789 twice 987-65-4321, phone-free"),
      (3L, "nothing sensitive here 1.2 or a@b (not an email domain)"))
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.redact(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    // the URL swallows its embedded email; the standalone one redacts
    assert(r(1L).getString(1) === "mail <EMAIL> or visit <URL> from <IPV4>")
    assert((r(1L).getInt(2), r(1L).getInt(3), r(1L).getInt(4), r(1L).getInt(5))
      === (1, 2, 1, 0), "counts on ORIGINAL text: url=1 email=2 ip=1 ssn=0")
    assert(r(2L).getString(1) === "ssn <SSN> twice <SSN>, phone-free")
    assert(r(2L).getInt(5) === 2)
    assert(r(3L).getString(1) === d.where($"doc_id" === 3).head().getString(1),
      "text without matches passes through byte-identical")
  }

  test("tokenEntropy: 0 bits for one repeated token, log2(n) for all-distinct") {
    import spark.implicits._
    val d = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b"), (4L, "  "))
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.tokenEntropy(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getDouble(3) === 0.0)
    assert(r(2L).getDouble(3) === 2.0)
    assert(r(3L).getDouble(3) === 1.0)
    assert((r(2L).getLong(1), r(2L).getLong(2)) === (4L, 4L))
    assert(!r.contains(4L), "zero-token doc emits no row, not entropy 0")
  }

  test("multimodal: real JDK decode — PNG and WAV roundtrip exactly, corrupt bytes degrade to sentinel rows") {
    import spark.implicits._
    implicit val enc =
      org.apache.spark.sql.Encoders.product[MultimodalOps.MediaAsset]
    // image: known 2x3 gray pixels survive the PNG encode/decode exactly
    val px = Array(0, 255, 7, 19, 128, 200)
    val img = MultimodalOps.MediaAsset(1L, "image/png",
      MultimodalOps.grayPng(px, 2, 3))
    val junk = MultimodalOps.MediaAsset(2L, "image/png",
      Array[Byte](1, 2, 3, 4))
    val di = MultimodalOps.decodeImages(Seq(img, junk).toDS())
      .collect().map(d => d.asset_id -> d).toMap
    assert(di(1L).width === 2 && di(1L).height === 3)
    assert(di(1L).mean_pixel === px.sum / 6.0)
    assert(di(2L).width === -1 && di(2L).mean_pixel.isNaN,
      "corrupt image bytes degrade, not fail")
    // audio: signed PCM16 samples survive the WAV encode/parse exactly
    val samples = Array[Short](100, -200, 32767, -32768, 0, 5, -5, 1000)
    val wav = MultimodalOps.MediaAsset(3L, "audio/wav",
      MultimodalOps.pcm16Wav(samples, 16000f))
    val junkA = MultimodalOps.MediaAsset(4L, "audio/wav",
      Array[Byte](9, 9, 9))
    val da = MultimodalOps.decodeAudio(Seq(wav, junkA).toDS())
      .collect().map(d => d.asset_id -> d).toMap
    assert(da(3L).sample_rate === 16000.0 && da(3L).channels === 1)
    assert(da(3L).n_frames === 8L)
    assert(da(3L).mean_sample === samples.map(_.toDouble).sum / 8.0)
    assert(da(4L).n_frames === -1L && da(4L).mean_sample.isNaN)
    // a truncated payload carries fewer frames than its header declares:
    // the mean must be over the samples actually read, not the header count
    val full = MultimodalOps.pcm16Wav(samples, 16000f)
    val cut = MultimodalOps.MediaAsset(5L, "audio/wav",
      full.take(full.length - 8)) // drop the last 4 samples
    val dc = MultimodalOps.decodeAudio(Seq(cut).toDS()).collect().head
    assert(dc.mean_sample === samples.take(4).map(_.toDouble).sum / 4.0,
      "mean divides by samples read, not header-declared frames")
  }

  test("gray8 PNG byte codec cross-validates against ImageIO in BOTH " +
      "directions and rejects non-gray forms to the SPI path") {
    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((1, 1), (4, 4), (16, 16), (31, 7))) {
      val px = Array.fill(w * h)(rnd.nextInt(256))
      // direction 1: byte-codec ENCODE -> ImageIO DECODE pixel-exact
      val mine = MultimodalOps.grayPngBytes(px, w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(mine))
      assert(img.getWidth === w && img.getHeight === h)
      val viaImageIo = for (y <- 0 until h; x <- 0 until w)
        yield img.getRaster.getSample(x, y, 0)
      assert(viaImageIo.toSeq === px.toSeq,
        s"ImageIO must read the byte-codec PNG exactly ($w x $h)")
      // direction 2: ImageIO ENCODE -> byte-codec DECODE pixel-exact
      // (ImageIO's encoder picks its own scanline filters, so this
      // exercises the unfilter path, not just filter type 0)
      val spi = MultimodalOps.grayPng(px, w, h)
      val parsed = MultimodalOps.parseGrayPng(spi)
      assert(parsed.isDefined, "byte codec must read ImageIO gray8 PNGs")
      val (pw, ph, ppx) = parsed.get
      assert(pw === w && ph === h)
      assert(ppx.map(_ & 0xff).toSeq === px.toSeq,
        s"byte codec must read ImageIO's PNG exactly ($w x $h)")
      // roundtrip through the byte codec alone
      val rt = MultimodalOps.parseGrayPng(mine).get
      assert(rt._3.map(_ & 0xff).toSeq === px.toSeq)
    }
    // an RGB PNG is NOT gray8: the byte codec must defer to ImageIO
    val rgb = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos)
    assert(MultimodalOps.parseGrayPng(bos.toByteArray).isEmpty,
      "non-gray color types fall back to the SPI path")
    assert(MultimodalOps.parseGrayPng(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("parseGrayPng verifies chunk CRCs: corrupted-but-inflatable bytes " +
      "fall back to the sentinel path instead of decoding garbage") {
    val px = Array.tabulate(16 * 16)(i => (i * 7) % 256)
    val good = MultimodalOps.grayPngBytes(px, 16, 16)
    assert(MultimodalOps.parseGrayPng(good).isDefined)
    def chunkOffset(b: Array[Byte], typ: String): Int = {
      val t = typ.getBytes("US-ASCII")
      (8 until b.length - 4).find(i => b.slice(i, i + 4).sameElements(t))
        .get - 4
    }
    // flip a bit in the stored IDAT CRC: the zlib stream still inflates
    // perfectly, so ONLY a CRC check can catch this corruption
    val badCrc = good.clone()
    val idat = chunkOffset(badCrc, "IDAT")
    val idatLen = ((badCrc(idat) & 0xff) << 24) | ((badCrc(idat + 1) & 0xff) << 16) |
      ((badCrc(idat + 2) & 0xff) << 8) | (badCrc(idat + 3) & 0xff)
    badCrc(idat + 8 + idatLen) = (badCrc(idat + 8 + idatLen) ^ 0x40).toByte
    assert(MultimodalOps.parseGrayPng(badCrc).isEmpty,
      "IDAT CRC mismatch must reject, not decode")
    // flip a bit in the IHDR width field (data corrupt, CRC stale)
    val badIhdr = good.clone()
    val ihdr = chunkOffset(badIhdr, "IHDR")
    badIhdr(ihdr + 8 + 3) = (badIhdr(ihdr + 8 + 3) ^ 0x01).toByte
    assert(MultimodalOps.parseGrayPng(badIhdr).isEmpty,
      "IHDR data corruption must be caught by its CRC")
  }

  test("pcm16WavBytes (byte-walk encode) is byte-identical to the " +
      "independent AudioSystem codec across sizes, rates and extremes") {
    val cases = Seq(
      Array[Short](100, -200, 32767, -32768, 0, 5, -5, 1000) -> 16000f,
      Array[Short]() -> 8000f,
      Array[Short](0) -> 44100f,
      Array.tabulate(1001)(i => ((i * 31 - 500) % 32768).toShort) -> 22050f)
    for ((samples, rate) <- cases) {
      val walked = MultimodalOps.pcm16WavBytes(samples, rate)
      val spi = MultimodalOps.pcm16Wav(samples, rate)
      assert(java.util.Arrays.equals(walked, spi),
        s"n=${samples.length} rate=$rate: byte-walk WAV must equal " +
          "AudioSystem's output exactly")
    }
  }

  test("multimodal: MP4 container metadata round-trips through the box walk") {
    import spark.implicits._
    implicit val enc =
      org.apache.spark.sql.Encoders.product[MultimodalOps.MediaAsset]
    val good = MultimodalOps.MediaAsset(1L, "video/mp4",
      MultimodalOps.tinyMp4(timescale = 1200L, duration = 36000L,
        width = 640, height = 360, fourcc = "avc1", nTracks = 2))
    val junk = MultimodalOps.MediaAsset(2L, "video/mp4",
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    // a WAV is valid bytes but not ISO-BMFF — must degrade, not misparse
    val wav = MultimodalOps.MediaAsset(3L, "video/mp4",
      MultimodalOps.pcm16Wav(Array[Short](1, 2, 3, 4), 8000f))
    val vm = MultimodalOps.videoContainerMeta(Seq(good, junk, wav).toDS())
      .collect().map(v => v.asset_id -> v).toMap
    assert(vm(1L).duration_ms === 30000.0) // 36000 / 1200 * 1000
    assert(vm(1L).timescale === 1200L)
    assert(vm(1L).n_tracks === 2)
    assert(vm(1L).codec === "avc1")
    assert(vm(1L).width === 640 && vm(1L).height === 360)
    assert(vm(2L).timescale === -1L && vm(2L).duration_ms.isNaN &&
      vm(2L).codec === "", "corrupt bytes degrade to the sentinel row")
    assert(vm(3L).n_tracks === -1, "non-BMFF bytes degrade too")
  }

  test("multimodal: box walk handles largesize, to-end and v1 boxes; truncation degrades") {
    import spark.implicits._
    implicit val enc =
      org.apache.spark.sql.Encoders.product[MultimodalOps.MediaAsset]
    def u16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u64(v: Long) = u32(v >>> 32) ++ u32(v & 0xffffffffL)
    def box(t: String, p: Array[Byte]*) = {
      val body = p.flatten.toArray
      u32(body.length + 8L) ++ t.getBytes("ISO-8859-1") ++ body
    }
    // version-1 mvhd (64-bit times/duration) and v1 tkhd (width at +88)
    val mvhd1 = box("mvhd", Array(1.toByte, 0, 0, 0), u64(0), u64(0),
      u32(48000L), u64(960000L), u32(0x10000L), u16(0x100), u16(0),
      u32(0), u32(0), Array.fill(36)(0.toByte), Array.fill(24)(0.toByte),
      u32(2))
    val tkhd1 = box("tkhd", Array(1.toByte, 0, 0, 7), u64(0), u64(0),
      u32(1), u32(0), u64(960000L), u32(0), u32(0),
      u16(0), u16(0), u16(0), u16(0), Array.fill(36)(0.toByte),
      u32(1920L << 16), u32(1080L << 16))
    val moov = box("moov", mvhd1, box("trak", tkhd1))
    val ftyp = box("ftyp", "isom".getBytes, u32(0), "isom".getBytes)
    // mdat #1 uses the size==1 largesize form; mdat #2 uses size==0
    // (extends to end of file)
    val mdatLarge = u32(1) ++ "mdat".getBytes ++ u64(20L) ++ u32(0xdeadL)
    val mdatToEnd = u32(0) ++ "mdat".getBytes ++ Array[Byte](1, 2, 3)
    val bytes = ftyp ++ moov ++ mdatLarge ++ mdatToEnd
    val v = MultimodalOps.videoContainerMeta(
      Seq(MultimodalOps.MediaAsset(7L, "video/mp4", bytes)).toDS())
      .collect().head
    assert(v.timescale === 48000L)
    assert(v.duration_ms === 20000.0) // 960000 / 48000 * 1000
    assert(v.n_tracks === 1)
    assert(v.width === 1920 && v.height === 1080)
    assert(v.codec === "", "no stsd -> empty codec, not a failure")
    // a box whose declared size overruns the file is corruption
    val overrun = ftyp ++ u32(1L << 30) ++ "moov".getBytes
    val bad = MultimodalOps.videoContainerMeta(
      Seq(MultimodalOps.MediaAsset(8L, "video/mp4", overrun)).toDS())
      .collect().head
    assert(bad.timescale === -1L && bad.duration_ms.isNaN)
    // a truncated-but-well-framed mvhd/tkhd (fixed offsets land past the
    // box's own end but inside the FILE) must degrade to the sentinel,
    // not read the following sibling's bytes as timescale/width
    val shortMvhd = box("mvhd", Array(1.toByte, 0, 0, 0), u64(0), u64(0))
    val shortMoov = box("moov", shortMvhd, box("free", Array.fill(64)(0.toByte)))
    val sm = MultimodalOps.videoContainerMeta(
      Seq(MultimodalOps.MediaAsset(9L, "video/mp4", ftyp ++ shortMoov)).toDS())
      .collect().head
    assert(sm.timescale === -1L && sm.duration_ms.isNaN,
      "short mvhd reads sibling bytes unless bounds-checked")
    val shortTkhd = box("tkhd", Array(1.toByte, 0, 0, 7), u64(0), u64(0))
    val moovST = box("moov", mvhd1,
      box("trak", shortTkhd, box("free", Array.fill(64)(0.toByte))))
    val st = MultimodalOps.videoContainerMeta(
      Seq(MultimodalOps.MediaAsset(10L, "video/mp4", ftyp ++ moovST)).toDS())
      .collect().head
    assert(st.width === -1 && st.height === -1 && st.timescale === -1L,
      "short tkhd degrades the row to the sentinel")
  }

  test("multimodal: AVI frame decode — MPNG frames roundtrip exactly, " +
      "MJPG rides the same walk, corruption degrades per contract") {
    import spark.implicits._
    implicit val enc =
      org.apache.spark.sql.Encoders.product[MultimodalOps.MediaAsset]
    // two lossless PNG frames with known pixels: exact means come back
    val px0 = Array(0, 255, 7, 19, 128, 200, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val px1 = px0.map(255 - _)
    val avi = MultimodalOps.framesAvi(Seq(
      MultimodalOps.grayPng(px0, 4, 4), MultimodalOps.grayPng(px1, 4, 4)),
      width = 4, height = 4, fps = 10, fourcc = "MPNG")
    val got = MultimodalOps.decodeVideoFrames(
      Seq(MultimodalOps.MediaAsset(1L, "video/x-msvideo", avi)).toDS())
      .collect().sortBy(_.frame_idx)
    assert(got.length === 2)
    assert(got(0).width === 4 && got(0).height === 4)
    assert(got(0).mean_pixel === px0.sum / 16.0)
    assert(got(1).mean_pixel === px1.sum / 16.0)
    // MJPG: JPEG stills through the identical walk — lossy, so assert
    // dimensions, frame count and a loose mean (flat frames compress well)
    def jpeg(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until 8; x <- 0 until 8) r.setSample(x, y, 0, level)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mjpeg = MultimodalOps.framesAvi(Seq(jpeg(40), jpeg(200)),
      width = 8, height = 8, fps = 25, fourcc = "MJPG")
    val gj = MultimodalOps.decodeVideoFrames(
      Seq(MultimodalOps.MediaAsset(2L, "video/x-msvideo", mjpeg)).toDS())
      .collect().sortBy(_.frame_idx)
    assert(gj.length === 2 && gj.forall(f => f.width === 8 && f.height === 8))
    assert(math.abs(gj(0).mean_pixel - 40) < 3 &&
      math.abs(gj(1).mean_pixel - 200) < 3,
      s"JPEG frames decode to ~their level: ${gj.map(_.mean_pixel).toSeq}")
    // an unparseable container is ONE sentinel row; one corrupt frame
    // inside a valid container degrades only that frame
    val notAvi = MultimodalOps.MediaAsset(3L, "video/x-msvideo",
      Array[Byte](1, 2, 3, 4))
    val mixed = MultimodalOps.framesAvi(Seq(
      MultimodalOps.grayPng(px0, 4, 4), Array[Byte](9, 9, 9)),
      width = 4, height = 4, fps = 10, fourcc = "MPNG")
    val gd = MultimodalOps.decodeVideoFrames(Seq(notAvi,
      MultimodalOps.MediaAsset(4L, "video/x-msvideo", mixed)).toDS())
      .collect().groupBy(_.asset_id)
    assert(gd(3L).toSeq.map(f => (f.frame_idx, f.width)) === Seq((-1, -1)))
    val byFrame = gd(4L).sortBy(_.frame_idx)
    assert(byFrame(0).mean_pixel === px0.sum / 16.0)
    assert(byFrame(1).width === -1 && byFrame(1).mean_pixel.isNaN)
  }

  test("grayJpegBytes at quality 1.0: constant blocks roundtrip EXACTLY " +
      "for ALL 256 gray values (the q_video_frames_mjpg gate premise), " +
      "while non-constant blocks stay genuinely lossy") {
    import spark.implicits._
    implicit val enc =
      org.apache.spark.sql.Encoders.product[MultimodalOps.MediaAsset]
    for (v <- 0 until 256) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        MultimodalOps.grayJpegBytes(Array.fill(64)(v), 8, 8)))
      val samples = for (y <- 0 until 8; x <- 0 until 8)
        yield img.getRaster.getSample(x, y, 0)
      assert(samples.forall(_ == v),
        s"constant value $v must survive the JPEG pipeline exactly")
    }
    // the exactness claim is ONLY for constant (DC-only) blocks: a busy
    // pseudorandom block must come back changed, proving the gate
    // exercises a real lossy codec rather than a disguised identity
    // (note a PURE checkerboard also survives q=1.0 — it excites a single
    // clean coefficient — so the loss witness needs broadband content)
    val busy = Array(222, 1, 47, 255, 128, 9, 200, 33, 17, 64, 91, 180, 5,
      240, 77, 150, 3, 8, 250, 99, 111, 140, 60, 20, 30, 40, 50, 60, 70,
      80, 90, 100, 101, 102, 103, 104, 105, 106, 107, 108, 210, 220, 230,
      240, 250, 2, 12, 22, 32, 42, 52, 62, 72, 82, 92, 102, 112, 122, 132,
      142, 152, 162, 172, 182)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      MultimodalOps.grayJpegBytes(busy, 8, 8)))
    val busyBack = for (y <- 0 until 8; x <- 0 until 8)
      yield back.getRaster.getSample(x, y, 0)
    assert(busyBack.toSeq !== busy.toSeq,
      "a high-frequency block must show JPEG loss")
    // end-to-end through the movi walk: 4 constant MJPG frames decode to
    // exactly their encoded values — the q_video_frames_mjpg contract
    val vals = Seq(0, 7, 128, 255)
    val avi = MultimodalOps.framesAvi(vals.map(v =>
      MultimodalOps.grayJpegBytes(Array.fill(64)(v), 8, 8)),
      width = 8, height = 8, fps = 10, fourcc = "MJPG")
    val got = MultimodalOps.decodeVideoFrames(
      Seq(MultimodalOps.MediaAsset(9L, "video/x-msvideo", avi)).toDS())
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.mean_pixel).toSeq === vals.map(_.toDouble),
      "decoded means must equal the constant frame values exactly")
  }

  test("multimodal: real feature kernels — thumbnail embedding feeds ANN, RMS envelope tracks loudness") {
    import spark.implicits._
    implicit val enc =
      org.apache.spark.sql.Encoders.product[MultimodalOps.MediaAsset]
    // two visually near-identical 16x16 gradients and one inverted one:
    // the thumbnail embeddings must rank the near-duplicate first
    def gradient(flip: Boolean, jitter: Int): Array[Int] =
      Array.tabulate(256) { i =>
        val v = (i % 16) * 16 + jitter
        math.min(255, math.max(0, if (flip) 255 - v else v))
      }
    val imgs = Seq(
      MultimodalOps.MediaAsset(1L, "image/png",
        MultimodalOps.grayPng(gradient(flip = false, 0), 16, 16)),
      MultimodalOps.MediaAsset(2L, "image/png",
        MultimodalOps.grayPng(gradient(flip = false, 3), 16, 16)),
      MultimodalOps.MediaAsset(3L, "image/png",
        MultimodalOps.grayPng(gradient(flip = true, 0), 16, 16))).toDS()
    val feats = MultimodalOps.imageThumbnailFeatures(imgs, side = 8).toDF()
      .select(col("asset_id").as("vec_id"), col("feature").as("embedding"))
    val nn = graft.operators.SimilarityOps.bruteForceTopK(feats, "vec_id", "embedding",
      feats.where(col("vec_id") === 1), "vec_id", "embedding", k = 2)
      .orderBy("rn").collect().map(_.getLong(1))
    assert(nn.head === 2L, "the jittered twin must outrank the inverted image")
    // audio: first half silence, second half loud -> RMS envelope steps up
    val samples = Array.tabulate(1600)(i =>
      if (i < 800) 0.toShort else 20000.toShort)
    val wav = Seq(MultimodalOps.MediaAsset(9L, "audio/wav",
      MultimodalOps.pcm16Wav(samples, 16000f))).toDS()
    val env = MultimodalOps.audioEnergyFeatures(wav, windows = 4)
      .collect().head.feature
    assert(env.length === 4)
    assert(env(0) === 0.0f && env(1) === 0.0f, "silent half is zero energy")
    assert(env(2) > 0.5f && env(3) > 0.5f, "loud half tracks amplitude")
  }

  test("multimodal: meta is deterministic, frame features batch-invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val assets = MultimodalOps.asAssets(docs, "doc_id", "text", "text/plain")
    val meta = MultimodalOps.extractMeta(assets).collect()
    assert(meta.length === docs.count())
    meta.foreach { m =>
      assert(m.width >= 1 && m.width <= 1920)
      assert(m.height >= 1 && m.height <= 1080)
      assert(m.digest.length === 32)
      assert(m.n_bytes > 0)
    }
    val f1 = MultimodalOps.frameFeatures(assets, framesPerAsset = 3,
      featureDim = 8, batchSize = 64)
      .collect().map(f => (f.asset_id, f.frame_idx) -> f.feature.toSeq).toMap
    val f2 = MultimodalOps.frameFeatures(assets.repartition(7), framesPerAsset = 3,
      featureDim = 8, batchSize = 2)
      .collect().map(f => (f.asset_id, f.frame_idx) -> f.feature.toSeq).toMap
    assert(f1.size === docs.count() * 3)
    assert(f1 === f2, "features independent of partitioning and batch size")
  }

  test("LM quality score: a formulaic doc outscores a one-off-token doc, " +
      "tiny docs score NULL over zero bigrams, and scoring is " +
      "partitioning-independent") {
    // corpus dominated by one repeated phrase + one doc of unique tokens
    val docs = ((1L to 20L).map(i => (i, "the cat sat on the mat")) :+
      (100L, "zq xv wk jp nb") :+ (200L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysisOps.lmQualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(1L)._1 === 5L)
    assert(got(200L) === ((0L, None)), "a 1-token doc has no bigram evidence")
    assert(got(1L)._2.get > got(100L)._2.get,
      s"formulaic ${got(1L)._2.get} must outscore unique ${got(100L)._2.get}")
    // partitioning independence (the avg is rounded to 6dp)
    val re = TextAnalysisOps.lmQualityScore(docs.repartition(7),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(re === got)
    // a separate training corpus shifts scores: unseen bigrams back off
    // to the smoothing floor
    val train = Some(docs.where(col("doc_id") <= 20))
    val vsTrain = TextAnalysisOps.lmQualityScore(docs, "doc_id", "text",
      train = train).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(vsTrain(1L).get > vsTrain(100L).get,
      "out-of-domain doc must score lower under the reference-corpus LM")
  }

  test("bounded LM score: fixed-state plan (no word-keyed join), tolerance " +
      "to the exact path on the sf0.01 corpus, bias is upward") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val bounded = TextAnalysisOps.lmQualityScoreBounded(docs, "doc_id", "text")
    // fixed state: both count relations became broadcast one-row CMS
    // matrices — the plan must contain NO shuffled word-keyed join (the
    // only shuffle left is the final per-doc aggregation)
    val plan = bounded.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"bounded variant must not join word-keyed relations:\n${plan.take(2000)}")
    val exact = TextAnalysisOps.lmQualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val got = bounded.collect().map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.keySet === exact.keySet)
    val diffs = exact.keys.toSeq.flatMap { id =>
      assert(got(id)._1 === exact(id)._1, s"bigram count drifted for doc $id")
      (got(id)._2, exact(id)._2) match {
        case (Some(b), Some(e)) => Some(b - e)
        case (None, None) => None
        case other => fail(s"null-ness drifted for doc $id: $other")
      }
    }
    // count-min never under-counts: the numerator's inflation is relative
    // to (cbg + k) while the denominator's is damped by the k*V smoothing
    // floor, so the net bias is upward — any negative drift is bounded by
    // collision_mass / (k*V), far under a thousandth per pair
    assert(diffs.forall(_ >= -0.002),
      s"bounded score under exact beyond the k*V damping: min diff ${diffs.min}")
    assert(diffs.max < 0.05, s"score tolerance blown: max diff ${diffs.max}")
    assert(diffs.sum >= 0, "aggregate bias direction must be upward")
  }

  test("vocabInduction counts substrings weighted by word frequency") {
    import spark.implicits._
    // "aa" x3, "ab" x1: pieces a=3*2+1=7, aa=3, b=1, ab=1
    val docs = Seq((1L, "aa aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val out = TextAnalysisOps.vocabInduction(docs, "text",
      maxPieceLen = 2, topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out === Map("a" -> (7L, 1), "aa" -> (3L, 2),
      "ab" -> (1L, 3), "b" -> (1L, 4)))
  }

  test("segmentWordCounts: greedy longest-match with UNK fallback") {
    import spark.implicits._
    val vocab = Seq("ab", "abc", "d").toDF("piece")
    val words = Seq("abcd", "abd", "xy", "abcabc", "d").toDF("w")
    val out = TextAnalysisOps.segmentWordCounts(words, vocab, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "abcd" -> 2L,   // abc + d (longest match wins over ab)
      "abd" -> 2L,    // ab + d
      "xy" -> 2L,     // UNK x + UNK y
      "abcabc" -> 2L, // abc + abc
      "d" -> 1L))
  }

  test("segmentWordCounts matches an in-driver greedy reference on random words") {
    import spark.implicits._
    // small alphabet so random pieces actually hit random words
    val rnd = new scala.util.Random(42)
    val words = (0 until 200).map(_ =>
      (0 until (1 + rnd.nextInt(10))).map(_ => "abc"(rnd.nextInt(3))).mkString)
      .distinct
    val pieces = (0 until 40).map(_ =>
      (0 until (1 + rnd.nextInt(4))).map(_ => "abc"(rnd.nextInt(3))).mkString)
      .distinct
    val pieceSet = pieces.toSet
    def ref(w: String): Long = {
      var pos = 0; var n = 0L
      while (pos < w.length) {
        val maxL = math.min(4, w.length - pos)
        val l = (maxL to 1 by -1)
          .find(l => pieceSet.contains(w.substring(pos, pos + l))).getOrElse(1)
        pos += l; n += 1
      }
      n
    }
    val got = TextAnalysisOps.segmentWordCounts(
      words.toDF("w"), pieces.toDF("piece"), maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === words.map(w => w -> ref(w)).toMap)
  }

  test("subwordTokenCounts sums per-word segment counts over each doc") {
    import spark.implicits._
    val vocab = Seq("ab", "abc", "d").toDF("piece")
    val docs = Seq((1L, "abcd abd"), (2L, "xy d d")).toDF("doc_id", "text")
    val out = TextAnalysisOps.subwordTokenCounts(docs, "doc_id", "text",
      vocab, maxPieceLen = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 4L, 2L -> 4L))
  }

  test("segmentWordCountsKernel equals the relational loop, including multi-byte words") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // multi-byte alphabet exercises the kernel's CHARACTER (not byte)
    // substring semantics — the loop + DuckDB oracle use SQL substring
    val alpha = "abĉ日"
    val words = ((0 until 300).map(_ =>
      (0 until (1 + rnd.nextInt(9))).map(_ => alpha(rnd.nextInt(4))).mkString)
      :+ "ĉ日ab日").distinct
    val pieces = (0 until 50).map(_ =>
      (0 until (1 + rnd.nextInt(4))).map(_ => alpha(rnd.nextInt(4))).mkString)
      .distinct
    val loop = TextAnalysisOps.segmentWordCounts(
      words.toDF("w"), pieces.toDF("piece"), maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kernel = TextAnalysisOps.segmentWordCountsKernel(
      words.toDF("w"), pieces, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kernel === loop)
  }

  test("subwordTokenCounts: kernel path and forced-loop path are row-identical") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = TextAnalysisOps.vocabInduction(docs, "text",
      maxPieceLen = 4, topK = 100)
    def rows(limit: Int) = TextAnalysisOps.subwordTokenCounts(
      docs, "doc_id", "text", vocab, maxPieceLen = 4,
      broadcastVocabLimit = limit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // limit 0 forces the relational loop; the default takes the kernel
    assert(rows(1 << 20) === rows(0))
  }

  test("vocabInduction is deterministic under repartitioning, rank breaks ties by piece") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysisOps.vocabInduction(d, "text", maxPieceLen = 3, topK = 50)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a === b)
    assert(a.map(_._3) === (1 to 50), "ranks are dense 1..topK")
    // ties ordered by piece ascending
    a.sliding(2).foreach { case Seq((p1, c1, _), (p2, c2, _)) =>
      assert(c1 > c2 || (c1 == c2 && p1 < p2)) }
  }
}
