package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, batched per-partition decode (REAL
  * ImageIO for images, stub for the rest), metadata pruning. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ImageIO decode recovers the exact pixels of an in-test PNG") {
    // hand-built 3×2 PNG: red / green / blue columns, two rows
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2) {
      img.setRGB(0, y, 0xff0000); img.setRGB(1, y, 0x00ff00); img.setRGB(2, y, 0x0000ff)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = Seq(Multimodal.MediaRecord(7L, "image", baos.toByteArray, 3, 2, 0L)).toDS()
    val st = Multimodal.decodeImageStats(media).collect()
    assert(st.length === 1)
    assert(st(0) === Multimodal.ImageStats(7L, 3, 2, 6L, 510L, 510L, 510L))
    // extractFeatures routes image payloads through the real decoder:
    // features lead with true width/height, not stub byte-folds
    val f = Multimodal.extractFeatures(media).collect()(0).features
    assert(f(0) === 3f && f(1) === 2f)
    assert(math.abs(f(2) - 1f / 3f) < 1e-6) // mean R: one full-red column of three
  }

  test("syntheticImages encode→decode round-trips the formula pixels") {
    val docs = Seq(0L, 1L, 41L, 254L, 255L, 256L).toDF("doc_id")
    val stats = Multimodal.decodeImageStats(Multimodal.syntheticImages(docs)).collect()
      .map(s => s.media_id -> s).toMap
    assert(stats.size === 6)
    docs.collect().map(_.getLong(0)).foreach { d =>
      val w = (8 + d % 9).toInt; val h = (8 + d % 7).toInt; val wa = w / 2
      def c(m: Long) = (d * m) % 256
      val s = stats(d)
      assert(s.width === w && s.height === h && s.n_pixels === w.toLong * h)
      assert(s.sum_r === h * (wa * c(37) + (w - wa) * c(101)))
      assert(s.sum_g === h * (wa * c(59) + (w - wa) * c(131)))
      assert(s.sum_b === h * (wa * c(83) + (w - wa) * c(151)))
    }
  }

  test("non-image payloads fall back to the stub decoder, never decode") {
    val media = Seq(Multimodal.MediaRecord(1L, "audio", Array[Byte](1, 2, 3, 4), 0, 0, 9L)).toDS()
    assert(Multimodal.decodeImageStats(media).isEmpty)
    val f = Multimodal.extractFeatures(media).collect()(0)
    assert(f.features === Multimodal.StubDecoder.decode(Array[Byte](1, 2, 3, 4)))
  }

  test("extractFeatures runs the batched decode over partitions deterministically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length === 20)
    assert(rows.forall(_.features.length === Multimodal.StubDecoder.dim))
    // deterministic: same input -> same checksum on a second run
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.map(r => r.media_id -> r.checksum).toMap ===
      again.map(r => r.media_id -> r.checksum).toMap)
  }

  test("frameSchedule samples midpoints of equal duration slices") {
    val m = Seq((1L, 10000L), (2L, 500L), (3L, 3000L)).toDF("media_id", "duration_ms")
    val r = Multimodal.frameSchedule(m, 5).collect()
      .map(x => (x.getAs[Long]("media_id"), x.getAs[Int]("frame_idx"), x.getAs[Long]("ts_ms")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(r(1L) === Seq(1000L, 3000L, 5000L, 7000L, 9000L)) // 5 of 10 s
    assert(r(2L) === Seq(250L))                              // sub-second clip: 1 frame
    assert(r(3L) === Seq(500L, 1500L, 2500L))                // 1 fps cap: 3 frames
  }

  test("syntheticAudio encode→decode round-trips the square-wave PCM exactly") {
    import spark.implicits._
    val docs = Seq(3L, 10L, 77L).toDF("doc_id")
    val stats = Multimodal.decodeAudioStats(Multimodal.syntheticAudio(docs))
      .collect().map(s => s.media_id -> s).toMap
    assert(stats.keySet === Set(3L, 10L, 77L))
    Seq(3L, 10L, 77L).foreach { d =>
      val amp = ((d * 97) % 16384 + 1000).toInt
      val n = (400 + d % 50).toInt
      val s = stats(d)
      assert(s.sample_rate === 8000)
      assert(s.channels === 1)
      assert(s.n_frames === n.toLong)
      assert(s.sum_abs === n.toLong * amp) // every sample is exactly ±amp
      assert(s.peak === amp)
    }
  }

  test("non-WAV payloads are dropped by the audio decode, not mis-parsed") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.MediaRecord(1L, "audio", Array[Byte](1, 2, 3, 4), 0, 0, 0L),
      Multimodal.MediaRecord(2L, "audio", "RIFFxxxxJUNK".getBytes, 0, 0, 0L), // wrong form type
      Multimodal.MediaRecord(3L, "audio", "RIFFxxxxWAVEgarbage".getBytes, 0, 0, 0L)).toDS() // corrupt chunks
    assert(Multimodal.decodeAudioStats(junk).count() === 0)
  }

  test("dHash is brightness-invariant: shifted variants pair, bytes differ") {
    import graft.multimodal.Phash
    // one group of 4 (doc 0..3: variants v=0..3 of the same gradient)
    // plus an unrelated group (doc 40..41, different gradient)
    val docs = Seq(0L, 1L, 2L, 3L, 40L, 41L).toDF("doc_id")
    val media = Multimodal.syntheticGradientImages(docs)
    // brightness-shifted copies have DIFFERENT bytes (exact dedup blind)
    val checksums = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(checksums(0L) !== checksums(1L))
    // ...but variants 0/1/2 hash IDENTICALLY (adjacent-pixel comparisons
    // are invariant to a global +v shift), and variant 3's planted
    // perturbation lands within Hamming <= 2
    val sig = Phash.signatures(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) === sig(1L) && sig(1L) === sig(2L))
    val d3 = java.lang.Long.bitCount(sig(0L) ^ sig(3L))
    assert(d3 >= 1 && d3 <= 2)
    // the banded pairing finds every within-group pair at threshold 3
    val pairs = Phash.pairs(media, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (a <- 0L to 3L; b <- (a + 1) to 3L) assert(pairs.contains((a, b)))
    assert(pairs.contains((40L, 41L)))
  }

  test("audio envelope fingerprint: gain-invariant, pairs volume-shifted copies") {
    import graft.multimodal.AudioFp
    // docs 0 and 50 share doc_id % 50 = 0 (same envelope pattern,
    // different volume offset → different WAV bytes); doc 1 differs
    val docs = Seq(0L, 50L, 100L, 1L).toDF("doc_id")
    val media = AudioFp.syntheticAmAudio(docs)
    // volume-shifted copies have different bytes (exact dedup blind)...
    val bytes = media.collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(bytes(0L) !== bytes(50L))
    // ...but identical envelope fingerprints; the other class differs
    val sig = AudioFp.fingerprints(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) === sig(50L) && sig(50L) === sig(100L))
    assert(sig(0L) !== sig(1L))
    val pairs = AudioFp.pairs(media, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 50L)).contains(0))
    assert(pairs.get((0L, 100L)).contains(0))
    assert(pairs.get((50L, 100L)).contains(0))
  }

  test("metadata pruning filters without touching payload bytes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val media = Multimodal.mediaFromDocuments(spark, docs).toDF()
    val small = Multimodal.prunableMedia(media, "image", maxBytes = 200)
    assert(small.count() > 0)
    assert(small.count() < 50)
  }
}
