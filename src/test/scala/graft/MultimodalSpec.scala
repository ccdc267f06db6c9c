package graft

import org.apache.spark.sql.functions._

/** E5 multimodal plumbing: binary payload column, typed metadata, and the
  * per-partition batch decode shape (stubbed codec, real pipeline). */
class MultimodalSpec extends SparkSpecBase {

  test("documents lift to a binary-payload media dataset with typed schema") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(media.count() === 500)
    // payload bytes round-trip the source text exactly
    val r = media.filter(col("doc_id") === 0).head()
    val text = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(new String(r.payload, "UTF-8") === text)
  }

  test("per-partition batch decode produces deterministic features") {
    val media = Multimodal.fromDocuments(spark, sfDir).repartition(4)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === 500)
    val f = feats.filter(col("doc_id") === 0).head()
    // stub decode is deterministic: recompute driver-side and compare
    val payload = Multimodal.fromDocuments(spark, sfDir)
      .filter(col("doc_id") === 0).head().payload
    val (w, h, mean) = Multimodal.decodeStub(payload)
    assert(f.n_bytes === payload.length)
    assert((f.width, f.height) === ((w, h)))
    assert((f.resized_w, f.resized_h) === Multimodal.resizeStub(w, h))
    assert(math.max(f.resized_w, f.resized_h) <= 224)
    assert(math.abs(f.mean_byte - mean) < 1e-12)
    assert(f.frame_offsets === Multimodal.frameOffsets(payload.length))
    assert(f.frame_offsets.length === 4 && f.frame_offsets.head === 0)
  }

  test("encodePng emits PNGs the JDK's own ImageIO reader decodes identically") {
    // cross-IMPLEMENTATION differential: our encoder vs the JDK's
    // independent PNG decoder — dims, then every pixel of a small image
    val bytes = Multimodal.encodePng(37, 23, seed = 42L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth === 37 && img.getHeight === 23)
    val raw = Multimodal.rawScanlines(37, 23, 42L)
    (0 until 23).foreach { y =>
      (0 until 37).foreach { x =>
        val base = y * (1 + 37 * 3) + 1 + x * 3
        val expected = ((raw(base) & 0xff) << 16) |
          ((raw(base + 1) & 0xff) << 8) | (raw(base + 2) & 0xff)
        assert((img.getRGB(x, y) & 0xffffff) === expected,
          s"pixel ($x,$y) mismatch vs ImageIO")
      }
    }
    // and our own pixel decoder agrees with the generator byte-for-byte
    val px = Multimodal.decodePngPixels(bytes)
    val gen = (0 until 23).flatMap(y =>
      (0 until 37 * 3).map(x => raw(y * (1 + 37 * 3) + 1 + x))).toArray
    assert(px.toSeq === gen.toSeq)
  }

  test("decodePngPixels reverses all five PNG filter types") {
    // hand-build a 4x3 truecolor PNG whose rows use filters 1-4 (and 0),
    // then check the unfiltered pixels against a reference computed here
    val w = 4; val h = 5; val stride = w * 3
    val rnd = new scala.util.Random(7)
    val px = Array.fill(h * stride)(rnd.nextInt(256).toByte) // ground truth
    def p(y: Int, x: Int): Int = if (y < 0 || x < 0) 0 else px(y * stride + x) & 0xff
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pr = a + b - c
      val (pa, pb, pc) = (math.abs(pr - a), math.abs(pr - b), math.abs(pr - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // FORWARD-filter each row with its type (the encoder side of the spec)
    val filters = Seq(0, 1, 2, 3, 4)
    val raw = new java.io.ByteArrayOutputStream()
    (0 until h).foreach { y =>
      val ft = filters(y)
      raw.write(ft)
      (0 until stride).foreach { x =>
        val cur = p(y, x)
        val left = if (x >= 3) p(y, x - 3) else 0
        val up = p(y - 1, x)
        val ul = if (x >= 3) p(y - 1, x - 3) else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw.write(enc & 0xff)
      }
    }
    // wrap the filtered stream in a real PNG container
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      out.write(tb); out.write(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)

    assert(Multimodal.decodePngPixels(out.toByteArray).toSeq === px.toSeq)
    // the JDK reader agrees too — the filtered stream is spec-legal
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.toByteArray))
    assert((img.getRGB(2, 4) & 0xffffff) ===
      ((p(4, 6) << 16) | (p(4, 7) << 8) | p(4, 8)))
  }

  test("decodePngPixels throws on truncated IDAT instead of spinning") {
    // a valid PNG with its IDAT chopped mid-stream: the inflater stalls
    // (inflate()==0, finished()==false) — must throw, never loop forever
    val full = Multimodal.encodePng(64, 48, seed = 9L)
    // find the IDAT chunk and rebuild the file with only half its payload
    def be(b: Array[Byte], off: Int, n: Int): Long =
      (0 until n).foldLeft(0L)((acc, i) => (acc << 8) | (b(off + i) & 0xffL))
    var off = 8
    var idatOff = -1; var idatLen = -1
    while (idatOff < 0) {
      val len = be(full, off, 4).toInt
      val typ = new String(full, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") { idatOff = off; idatLen = len }
      else off += 8 + len + 4
    }
    val keep = idatLen / 2
    val out = new java.io.ByteArrayOutputStream()
    out.write(full, 0, idatOff)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(keep).array())
    val tb = "IDAT".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(full, idatOff + 8, keep)
    out.write(tb)
    out.write(full, idatOff + 8, keep)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    // IEND so the chunk walk terminates normally
    val iendCrc = new java.util.zip.CRC32()
    iendCrc.update("IEND".getBytes("US-ASCII"))
    out.write(Array[Byte](0, 0, 0, 0))
    out.write("IEND".getBytes("US-ASCII"))
    out.write(java.nio.ByteBuffer.allocate(4).putInt(iendCrc.getValue.toInt).array())
    val truncated = out.toByteArray
    assert(Multimodal.isPngBytes(truncated)) // passes the gate checks...
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodePngPixels(truncated) // ...but must fail loud, fast
    }
    assert(ex.getMessage.contains("truncated IDAT") ||
      ex.getMessage.contains("short inflate"))
  }

  test("IHDR column expressions parse dims off the binary column, codegen'd") {
    import spark.implicits._
    val rows = Seq((1L, Multimodal.encodePng(640, 480, 1L)),
      (2L, Multimodal.encodePng(17, 1033, 2L)),
      (3L, "not a png".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload")
    val got = df.filter(Multimodal.isPng(col("payload")))
      .select(col("doc_id"), Multimodal.pngWidth(col("payload")).as("w"),
        Multimodal.pngHeight(col("payload")).as("h"),
        Multimodal.pngBitDepth(col("payload")).as("d"),
        Multimodal.pngColorType(col("payload")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set((1L, 640L, 480L, 8L, 2L), (2L, 17L, 1033L, 8L, 2L)))
    // extractFeatures uses the REAL decode for PNG media
    val media = df.filter(col("doc_id") === 1L)
      .select(col("doc_id"), lit("image").as("kind"), col("payload"),
        lit("en").as("lang"), lit(0L).as("n_chars")).as[Multimodal.Media]
    val f = Multimodal.extractFeatures(media).head()
    assert((f.width, f.height) === ((640, 480)))
    val px = Multimodal.decodePngPixels(rows.head._2)
    val mean = px.map(_.toInt & 0xff).foldLeft(0L)(_ + _).toDouble / px.length
    assert(math.abs(f.mean_byte - mean) < 1e-12)
  }

  test("JPEG SOF walk: column expressions and JVM twin agree with ImageIO") {
    import spark.implicits._
    val cases = Seq((33, 21, 1L), (200, 151, 2L), (16, 16, 3L))
    cases.foreach { case (w, h, seed) =>
      val bytes = Multimodal.encodeJpeg(w, h, seed)
      assert(Multimodal.isJpegBytes(bytes))
      // the walk finds the floating SOF and reads the true dimensions
      val (prec, hh, ww, ncomp) = Multimodal.jpegSofHeader(bytes)
      assert((ww, hh) === ((w, h)))
      assert(prec === 8 && ncomp === 3) // baseline truecolor
      // the JDK's own reader agrees the file is a real decodable JPEG
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert((img.getWidth, img.getHeight) === ((w, h)))
    }
    // the codegen'd column-expression twin of the same walk
    val df = cases.map { case (w, h, seed) =>
      (seed, Multimodal.encodeJpeg(w, h, seed)) }.toDF("id", "payload")
      .withColumn("sof", Multimodal.jpegSofOffset(col("payload")))
    assert(df.filter(col("sof") < 0).count() === 0, "SOF not found by the walk")
    val got = df.select(col("id"),
        Multimodal.jpegWidthAt(col("payload"), col("sof")).as("w"),
        Multimodal.jpegHeightAt(col("payload"), col("sof")).as("h"))
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got === cases.map(c => (c._1.toLong, c._2.toLong)))
  }

  test("features survive a shuffle and join back to metadata") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    val feats = Multimodal.extractFeatures(media).toDF()
    val joined = feats.join(media.toDF().select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_bytes").as("bytes"))
    val total = joined.agg(sum("n")).head().getLong(0)
    assert(total === 500)
  }

  test("encodeWav parses under the JDK's own javax.sound reader; stats are exact") {
    // cross-IMPLEMENTATION differential: our RIFF writer vs the JDK's
    // independent WAV parser — format fields and frame count
    val bytes = Multimodal.encodeWav(nSamples = 777, sampleRate = 12000, seed = 5L)
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = aff.getFormat
    assert(fmt.getSampleRate === 12000f)
    assert(fmt.getChannels === 1 && fmt.getSampleSizeInBits === 16)
    assert(aff.getFrameLength === 777)
    // our decoder's exact integer stats match the closed-form stream
    val st = Multimodal.wavPcmStats(bytes)
    val ref = (0 until 777).map(i => Multimodal.pcmSample(5L, i))
    assert(st.n === 777)
    assert(st.sum === ref.map(_.toLong).sum)
    assert(st.sumSq === ref.map(s => s.toLong * s).sum)
    assert(st.peak === ref.map(s => math.abs(s.toLong)).max)
    // and the stream really exercises both signs (the sign-extension path)
    assert(ref.exists(_ < 0) && ref.exists(_ > 0))
  }

  test("wavHeader is a chunk WALK, not fixed offsets: an extra chunk still parses") {
    val canonical = Multimodal.encodeWav(100, 8000, seed = 1L)
    // splice a LIST chunk between "fmt " and "data" (canonical offsets 36+)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = canonical.slice(0, 36) ++ extra ++ canonical.drop(36)
    // patch the RIFF chunk size (offset 4, u32le)
    val sz = spliced.length - 8
    (0 until 4).foreach(i => spliced(4 + i) = ((sz >> (8 * i)) & 0xff).toByte)
    val (sr, ch, bits, _, dlen) = Multimodal.wavHeader(spliced)
    assert((sr, ch, bits, dlen) === ((8000, 1, 16, 200)))
    assert(Multimodal.wavPcmStats(spliced) === Multimodal.wavPcmStats(canonical))
  }

  test("wavHeader rejects hostile chunk lengths instead of looping; " +
    "wavPcmStatsOpt classifies non-PCM/non-16-bit as None") {
    val canonical = Multimodal.encodeWav(100, 8000, seed = 1L)
    // hostile: fmt chunk length u32 = 0xFFFFFFFF (wraps to -1 as Int; the
    // pre-fix walk computed off += 8 + (-1) + 1 = off and spun forever)
    val hostileLen = canonical.clone()
    (0 until 4).foreach(i => hostileLen(16 + i) = 0xff.toByte)
    intercept[IllegalArgumentException](Multimodal.wavHeader(hostileLen))
    // hostile: chunk length exactly -8 after truncation (0xFFFFFFF8) would
    // make the new offset EQUAL the old one — must throw, not stall
    val stall = canonical.clone()
    stall(16) = 0xf8.toByte; stall(17) = 0xff.toByte
    stall(18) = 0xff.toByte; stall(19) = 0xff.toByte
    intercept[IllegalArgumentException](Multimodal.wavHeader(stall))
    // valid-but-unsupported: audioFormat = 3 (IEEE float) → None, no throw
    val floatFmt = canonical.clone(); floatFmt(20) = 3
    assert(Multimodal.wavPcmStatsOpt(floatFmt).isEmpty)
    // valid-but-unsupported: 24-bit PCM → None
    val deep = canonical.clone(); deep(34) = 24
    assert(Multimodal.wavPcmStatsOpt(deep).isEmpty)
    // data chunk claiming more bytes than the payload carries → None
    val truncated = canonical.slice(0, canonical.length - 10)
    assert(Multimodal.wavPcmStatsOpt(truncated).isEmpty)
    // the happy path is unchanged
    assert(Multimodal.wavPcmStatsOpt(canonical)
      === Some(Multimodal.wavPcmStats(canonical)))
  }

  test("WAV header column expressions agree with the JVM chunk walk") {
    import spark.implicits._
    val rows = Seq(0L, 3L, 9L).map(s =>
      (s, Multimodal.encodeWav((400 + s * 37).toInt, (8000 + s * 100).toInt, s)))
    val df = rows.toDF("id", "payload")
    val got = df.select(col("id"),
        Multimodal.wavSampleRate(col("payload")).as("sr"),
        Multimodal.wavChannels(col("payload")).as("ch"),
        Multimodal.wavBits(col("payload")).as("bits"),
        (Multimodal.wavDataLen(col("payload")) / 2).cast("long").as("n"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = rows.map { case (s, b) =>
      val (sr, ch, bits, _, dlen) = Multimodal.wavHeader(b)
      (s, sr.toLong, ch.toLong, bits.toLong, dlen.toLong / 2)
    }
    assert(got.toSeq === want)
  }

  test("resizeNearest: identity is exact; downsample picks the floor-grid pixel") {
    val w = 6; val h = 4
    val px = Array.tabulate(w * h * 3)(i => (i * 7 % 251).toByte)
    assert(Multimodal.resizeNearest(px, w, h, w, h).toSeq === px.toSeq)
    // 2x2 target: target (ty,tx) takes source (ty*h/2, tx*w/2)
    val rz = Multimodal.resizeNearest(px, w, h, 2, 2)
    (0 until 2).foreach { ty =>
      (0 until 2).foreach { tx =>
        val src = ((ty * h / 2) * w + tx * w / 2) * 3
        (0 until 3).foreach { c =>
          assert(rz((ty * 2 + tx) * 3 + c) === px(src + c),
            s"target ($ty,$tx) channel $c")
        }
      }
    }
    // fitBox geometry: floor math, aspect order preserved, small side >= 1
    assert(Multimodal.fitBox(20, 10, 24) === ((20, 10))) // already fits
    assert(Multimodal.fitBox(100, 30, 24) === ((24, 7))) // 30*24/100 = 7.2 -> 7
    assert(Multimodal.fitBox(30, 100, 24) === ((7, 24)))
    assert(Multimodal.fitBox(2000, 10, 24) === ((24, 1))) // clamps to 1
  }

  test("resize of a decoded PNG matches the closed-form sampled pixel sum") {
    val (w, h, seed) = (61, 33, 11L)
    val px = Multimodal.decodePngPixels(Multimodal.encodePng(w, h, seed))
    val (rw, rh) = Multimodal.fitBox(w, h, 24)
    val rz = Multimodal.resizeNearest(px, w, h, rw, rh)
    // the oracle's derivation: LCG at (ty*h//rh, (tx*w//rw)*3 + c)
    var want = 0L
    (0 until rh).foreach { ty =>
      (0 until rw).foreach { tx =>
        (0 until 3).foreach { c =>
          val y = ty * h / rh; val xb = (tx * w / rw) * 3 + c
          want += (((seed + y.toLong * 7919L + xb) * 1103515245L + 12345L) >>> 16) & 0xff
        }
      }
    }
    assert(rz.foldLeft(0L)((a, v) => a + (v & 0xff)) === want)
  }

  test("GVID container: index seek slices the exact PNG frames back out") {
    val bytes = Multimodal.encodeVideo(nFrames = 4, width = 18, height = 9, seed = 7L)
    assert(Multimodal.isGvidBytes(bytes))
    (0 until 4).foreach { f =>
      val (off, len) = Multimodal.gvidFrameAt(bytes, f)
      val frame = bytes.slice(off, off + len)
      assert(frame.toSeq === Multimodal.encodePng(18, 9, 7L * 100 + f).toSeq,
        s"frame $f bytes")
      // and each sliced frame still pixel-decodes for real
      assert(Multimodal.decodePngPixels(frame).length === 18 * 9 * 3)
    }
    // column-expression frame count agrees
    import spark.implicits._
    val n = Seq((1L, bytes)).toDF("id", "payload")
      .select(Multimodal.gvidFrameCount(col("payload"))).head().getLong(0)
    assert(n === 4L)
  }

  test("dhash64: exact duplicate → hamming 0; perturbed twin stays close; " +
    "different image far; halves stay positive") {
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    def hashOf(bytes: Array[Byte]): (Long, Long) = {
      val (w, h, _, _) = Multimodal.pngHeader(bytes)
      Multimodal.dhash64(Multimodal.decodePngPixels(bytes), w, h)
    }
    val base = hashOf(Multimodal.encodePng(40, 30, seed = 9L))
    val dup = hashOf(Multimodal.encodePng(40, 30, seed = 9L))
    val near = hashOf(Multimodal.encodePngPerturbed(40, 30, seed = 9L, mod = 997))
    val other = hashOf(Multimodal.encodePng(40, 30, seed = 10L))
    assert(ham(base, dup) === 0)
    assert(ham(base, near) <= 6, s"perturbed twin drifted: ${ham(base, near)}")
    // LCG images are perceptual noise — an unrelated one is ~32 bits away
    assert(ham(base, other) > 12, s"unrelated image too close: ${ham(base, other)}")
    Seq(base, near, other).foreach { case (hi, lo) =>
      assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32))
    }
  }

  test("encodePngPerturbed changes exact bytes but still decodes; exactly " +
    "the mod-indexed pixel bytes differ by +1 mod 256") {
    val a = Multimodal.encodePng(25, 19, seed = 3L)
    val b = Multimodal.encodePngPerturbed(25, 19, seed = 3L, mod = 997)
    assert(!java.util.Arrays.equals(a, b))
    val pa = Multimodal.decodePngPixels(a)
    val pb = Multimodal.decodePngPixels(b)
    assert(pa.length === pb.length)
    pa.indices.foreach { i =>
      val expect =
        if (i % 997 == 0) ((pa(i) & 0xff) + 1) % 256 else pa(i) & 0xff
      assert((pb(i) & 0xff) === expect, s"pixel byte $i")
    }
  }

  test("audioFingerprint: dropout twin within a few bits, value positive, " +
    "window count exact") {
    val base = Multimodal.encodeWav(1200, 8000, seed = 5L)
    val twin = Multimodal.encodeWavDropout(1200, 8000, seed = 5L, dropMod = 101)
    val other = Multimodal.encodeWav(1200, 8000, seed = 6L)
    val (n1, nw1, f1) = Multimodal.audioFingerprint(base)
    val (n2, nw2, f2) = Multimodal.audioFingerprint(twin)
    val (_, _, f3) = Multimodal.audioFingerprint(other)
    assert(n1 === 1200L && nw1 === 1200L / 64)
    assert((n1, nw1) === ((n2, nw2)))
    assert(f1 >= 0 && f1 < (1L << 56) && f2 >= 0)
    assert(java.lang.Long.bitCount(f1 ^ f2) <= 4,
      s"dropout twin drifted: ${java.lang.Long.bitCount(f1 ^ f2)}")
    // twins differ in raw samples even though fingerprints agree
    assert(!java.util.Arrays.equals(base, twin))
    // an unrelated stream needn't be far on few bits, but must be a
    // DIFFERENT deterministic value in general: recompute twice, stable
    assert(f3 === Multimodal.audioFingerprint(other)._3)
  }
}
