package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {

  test("decode stub is deterministic and md5-derived") {
    val payload = "hello world".getBytes("UTF-8")
    val (w1, h1) = Multimodal.MediaDecoder.decodeStub(payload)
    val (w2, h2) = Multimodal.MediaDecoder.decodeStub(payload)
    assert((w1, h1) == (w2, h2))
    assert(w1 >= 64 && w1 < 576 && h1 >= 64 && h1 < 576)
  }

  test("Column decode expressions are bit-identical to the codec-slot stub") {
    val spark = TestSpark.spark
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, TestSpark.sfDir)
    val viaColumns = media.toDF()
      .select($"doc_id",
        Multimodal.decodeWidth($"payload").as("width"),
        Multimodal.decodeHeight($"payload").as("height"))
    val viaStub = Multimodal.decodeAll(media).toDF()
      .select($"doc_id", $"width", $"height")
    assert(viaColumns.except(viaStub).count() == 0)
    assert(viaStub.except(viaColumns).count() == 0)
  }

  test("binary payload plumbing: one metadata row per document, sane sizes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val meta = Multimodal.mediaMeta(spark, TestSpark.sfDir)
    assert(meta.count() == docs.count())
    val joined = meta.join(docs, "doc_id")
      .select($"n_bytes", length($"text").cast("long").as("len"))
      .collect()
    joined.foreach(r => assert(r.getLong(0) == r.getLong(1))) // ASCII text: bytes == chars
    assert(meta.select($"media_type").distinct().count() == 3)
  }

  test("metadata-only resize plan prunes the payload column at the scan") {
    val spark = TestSpark.spark
    import spark.implicits._
    // The production layout: decode once, persist metadata next to the
    // payload; planning queries must then never read the binary column.
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    Multimodal.mediaTable(spark, TestSpark.sfDir).toDF()
      .withColumn("n_bytes", length($"payload").cast("long"))
      .withColumn("width", Multimodal.decodeWidth($"payload"))
      .withColumn("height", Multimodal.decodeHeight($"payload"))
      .write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    val plan = Multimodal.resizePlanFromMeta(persisted)
    plan.collect()
    val planStr = plan.queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(planStr).map(_.group(1)).toList
    assert(readSchemas.nonEmpty, planStr)
    readSchemas.foreach { read =>
      assert(!read.contains("payload"), s"payload not pruned: $read")
    }
    // And the result matches the payload-decoding form on the same corpus.
    val fromPayload = Multimodal.resizePlan(spark, TestSpark.sfDir)
    assert(plan.except(fromPayload).count() == 0)
    assert(fromPayload.except(plan).count() == 0)
  }

  test("PNG codec round-trips: decode(encode(id)) returns the generator formula") {
    for (id <- Seq(0L, 1L, 24L, 25L, 311L, 499L, 624L, 12345L)) {
      val (w, h) = Multimodal.PngCodec.dims(id)
      val bytes = Multimodal.PngCodec.encode(id)
      // Real PNG bytes: magic header present, non-trivial size.
      assert(bytes.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
      val (dw, dh, sum) = Multimodal.PngCodec.decode(bytes)
      assert((dw, dh) == (w, h))
      var expected = 0L
      for (y <- 0 until h; x <- 0 until w) expected += Multimodal.PngCodec.pixel(id, x, y)
      assert(sum == expected, s"raster checksum mismatch for id=$id")
    }
  }

  test("m05 decodes every document's PNG distributed, matching the formula") {
    val spark = TestSpark.spark
    import spark.implicits._
    val decoded = Multimodal.pngDecodeMeta(spark, TestSpark.sfDir)
    val viaFormula = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id",
        (lit(8L) + $"doc_id" % 25).as("width"),
        (lit(8L) + ($"doc_id" / 25).cast("long") % 25).as("height"))
      .as[(Long, Long, Long)].collect().map { case (id, w, h) =>
        var sum = 0L
        for (y <- 0 until h.toInt; x <- 0 until w.toInt)
          sum += Multimodal.PngCodec.pixel(id, x, y)
        (id, w, h, sum)
      }.toSeq.toDF("doc_id", "width", "height", "pix_sum")
    assert(decoded.count() == viaFormula.count())
    assert(decoded.except(viaFormula).count() == 0)
    assert(viaFormula.except(decoded).count() == 0)
  }

  test("WAV codec round-trips: decode(encode(id)) returns the generator formula") {
    for (id <- Seq(0L, 1L, 199L, 200L, 399L, 400L, 12345L)) {
      val bytes = Multimodal.WavCodec.encode(id)
      // Real WAV bytes: RIFF/WAVE container header present.
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
      val n = Multimodal.WavCodec.nSamples(id)
      var sum = 0L
      var wsum = 0L
      for (i <- 0 until n) {
        val s = Multimodal.WavCodec.sample(id, i)
        sum += s
        wsum += s.toLong * (i + 1)
      }
      val (dn, dsum, dwsum) = Multimodal.WavCodec.decode(bytes)
      assert(dn == n.toLong, s"sample count mismatch for id=$id")
      assert(dsum == sum, s"amplitude checksum mismatch for id=$id")
      assert(dwsum == wsum, s"weighted checksum (sample order) mismatch for id=$id")
    }
  }

  test("m06 decodes every document's WAV distributed, matching the formula") {
    val spark = TestSpark.spark
    import spark.implicits._
    val decoded = Multimodal.wavDecodeMeta(spark, TestSpark.sfDir)
    val viaFormula = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id").as[Long].collect().map { id =>
        val n = Multimodal.WavCodec.nSamples(id)
        var sum = 0L
        var wsum = 0L
        for (i <- 0 until n) {
          val s = Multimodal.WavCodec.sample(id, i)
          sum += s
          wsum += s.toLong * (i + 1)
        }
        (id, n.toLong, sum, wsum)
      }.toSeq.toDF("doc_id", "n_samples", "amp_sum", "amp_wsum")
    assert(decoded.count() == viaFormula.count())
    assert(decoded.except(viaFormula).count() == 0)
    assert(viaFormula.except(decoded).count() == 0)
  }

  test("m09 frame energies match the formula, and energy is frame-local") {
    val spark = TestSpark.spark
    import spark.implicits._
    def energies(id: Long): Array[Long] = {
      val n = Multimodal.WavCodec.nSamples(id)
      val e = new Array[Long]((n + 63) / 64)
      for (i <- 0 until n) {
        val s = Multimodal.WavCodec.sample(id, i).toLong
        e(i / 64) += s * s
      }
      e
    }
    val viaFormula = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id").as[Long].collect().map { id =>
        val e = energies(id)
        val peak = e.indices.minBy(i => (-e(i), i))
        val tot = e.sum
        (id, e.length.toLong, peak.toLong, e(peak), tot,
          e.count(x => x * e.length > tot).toLong)
      }.toSeq.toDF("doc_id", "n_frames", "peak_frame", "peak_energy",
        "total_energy", "n_active")
    val got = Multimodal.wavFrameEnergy(spark, TestSpark.sfDir)
    assert(got.count() == viaFormula.count())
    assert(got.except(viaFormula).count() == 0)
    assert(viaFormula.except(got).count() == 0)
    // locality: zeroing one sample changes exactly one frame's energy
    val id = 7L
    val base = energies(id)
    val bytes = Multimodal.WavCodec.encode(id)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val pcm = ais.readAllBytes(); ais.close()
    pcm(0) = 0; pcm(1) = 0 // zero sample 0 → only frame 0 moves
    val mod = new Array[Long](base.length)
    for (i <- 0 until pcm.length / 2) {
      val s = (((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff))).toLong
      mod(i / 64) += s * s
    }
    val changed = base.indices.count(i => base(i) != mod(i))
    assert(changed == 1 && base(0) != mod(0))
  }

  test("GIF codec round-trips: decode(encode(id)) returns the generator formula") {
    for (id <- Seq(0L, 1L, 9L, 10L, 99L, 311L, 499L, 12345L)) {
      val bytes = Multimodal.GifCodec.encode(id)
      // Real GIF bytes: GIF89a/GIF87a container header present.
      assert(new String(bytes.take(3), "US-ASCII") == "GIF", bytes.take(6).mkString(","))
      val (w, h) = Multimodal.GifCodec.dims(id)
      val n = Multimodal.GifCodec.nFrames(id)
      var sum = 0L
      var wsum = 0L
      for (f <- 0 until n) {
        var frameSum = 0L
        for (y <- 0 until h; x <- 0 until w)
          frameSum += Multimodal.GifCodec.pixel(id, f, x, y)
        sum += frameSum
        wsum += (f + 1).toLong * frameSum
      }
      val (dn, dw, dh, dsum, dwsum) = Multimodal.GifCodec.decode(bytes)
      assert(dn == n.toLong, s"frame count mismatch for id=$id: $dn != $n")
      assert((dw, dh) == (w.toLong, h.toLong), s"dims mismatch for id=$id")
      assert(dsum == sum, s"raster checksum mismatch for id=$id")
      assert(dwsum == wsum, s"weighted checksum (frame order) mismatch for id=$id")
    }
  }

  test("m07 decodes every document's GIF frames distributed, matching the formula") {
    val spark = TestSpark.spark
    import spark.implicits._
    val decoded = Multimodal.gifDecodeMeta(spark, TestSpark.sfDir)
    val viaFormula = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id").as[Long].collect().map { id =>
        val (w, h) = Multimodal.GifCodec.dims(id)
        val n = Multimodal.GifCodec.nFrames(id)
        var sum = 0L
        var wsum = 0L
        for (f <- 0 until n) {
          var frameSum = 0L
          for (y <- 0 until h; x <- 0 until w)
            frameSum += Multimodal.GifCodec.pixel(id, f, x, y)
          sum += frameSum
          wsum += (f + 1).toLong * frameSum
        }
        (id, n.toLong, w.toLong, h.toLong, sum, wsum)
      }.toSeq.toDF("doc_id", "n_frames", "width", "height", "pix_sum", "pix_wsum")
    assert(decoded.count() == viaFormula.count())
    assert(decoded.except(viaFormula).count() == 0)
    assert(viaFormula.except(decoded).count() == 0)
  }

  test("m08 aHash of the decoded raster equals the formula-side hash, and flags near-dups") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Formula-side recompute with the SAME ⌊k·w/8⌋ cell quantization the
    // oracle uses — passing through encode+decode first must not change
    // a single bit (PNG is lossless).
    def formulaHash(id: Long): (Long, Long) = {
      val (w, h) = Multimodal.PngCodec.dims(id)
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) total += Multimodal.PngCodec.pixel(id, x, y)
      var hi = 0L; var lo = 0L
      for (j <- 0 until 8; i <- 0 until 8) {
        val (x0, x1, y0, y1) = (i * w / 8, (i + 1) * w / 8, j * h / 8, (j + 1) * h / 8)
        var csum = 0L
        for (y <- y0 until y1; x <- x0 until x1) csum += Multimodal.PngCodec.pixel(id, x, y)
        if (csum * w * h > total * (x1 - x0).toLong * (y1 - y0)) {
          val b = 8 * j + i
          if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
        }
      }
      (hi, lo)
    }
    val got = graft.ops.Multimodal.pngAHash(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, hi, lo) =>
      assert((hi, lo) == formulaHash(id), s"doc $id")
    }
    // The perceptual property: re-encoding the same raster with one
    // pixel nudged by ±1 gray level leaves the hash within a few bits
    // (hamming distance over both halves), while a structurally
    // different image (different id) is far away on average.
    val id = got.head._1
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.PngCodec.encode(id)))
    val v = img.getRGB(0, 0) & 0xff
    val nudged = (v + 1) min 255
    img.setRGB(0, 0, (nudged << 16) | (nudged << 8) | nudged)
    val (nhi, nlo) = Multimodal.ahashOf(img)
    val ham = java.lang.Long.bitCount(nhi ^ got.head._2) +
      java.lang.Long.bitCount(nlo ^ got.head._3)
    assert(ham <= 2, s"one-pixel nudge moved $ham bits")
  }

  test("m10 resize output matches the box-downsample formula exactly") {
    val spark = TestSpark.spark
    // Recompute out_w/out_h/out_sum/out_wsum driver-side from the
    // generator formula for every doc and compare the full rows — an
    // exact match certifies decode → downsample → encode → decode with
    // pixels in place (the weighted sum pins position).
    val got = Multimodal.pngResize(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (id, ow, oh, sum, wsum) =>
      val (w, h) = Multimodal.PngCodec.dims(id)
      assert(ow == w / 2 && oh == h / 2)
      var es = 0L
      var ews = 0L
      for (j <- 0 until h / 2; i <- 0 until w / 2) {
        val v = (Multimodal.PngCodec.pixel(id, 2 * i, 2 * j) +
          Multimodal.PngCodec.pixel(id, 2 * i + 1, 2 * j) +
          Multimodal.PngCodec.pixel(id, 2 * i, 2 * j + 1) +
          Multimodal.PngCodec.pixel(id, 2 * i + 1, 2 * j + 1)) / 4
        es += v
        ews += v.toLong * (j * (w / 2) + i + 1)
      }
      assert(sum == es && wsum == ews, s"doc $id: got ($sum,$wsum) want ($es,$ews)")
    }
  }

  test("m11 image near-dup pairs equal a driver-side band-join recount") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = Multimodal.imageDupPairs(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // recompute every aHash from the pixel formula, then replay the
    // band join + Hamming <= 2 verify exactly
    val ids = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select($"doc_id").collect().map(_.getLong(0))
    val hashes = ids.map { id =>
      val (w, h) = Multimodal.PngCodec.dims(id)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = Multimodal.PngCodec.pixel(id, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      id -> Multimodal.ahashOf(img)
    }.toMap
    def bands(hl: (Long, Long)): Seq[Long] =
      Seq(hl._2 & 0xffffL, (hl._2 >> 16) & 0xffffL, hl._1 & 0xffffL, (hl._1 >> 16) & 0xffffL)
    val expected = (for {
      a <- ids; b <- ids if a < b
      if bands(hashes(a)).zip(bands(hashes(b))).exists(p => p._1 == p._2)
      ham = java.lang.Long.bitCount(hashes(a)._1 ^ hashes(b)._1) +
        java.lang.Long.bitCount(hashes(a)._2 ^ hashes(b)._2)
      if ham <= 2
    } yield (a, b, ham.toLong)).toSet
    assert(got == expected)
    assert(got.forall { case (a, b, h) => a < b && h >= 0 && h <= 2 })
  }

  test("m11 executed plan: no shuffle ever carries a binary payload column") {
    val spark = TestSpark.spark
    val df = Multimodal.imageDupPairs(spark, TestSpark.sfDir)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    // QueryStageExec is a leaf node, so TreeNode.collect stops there —
    // descend into materialized stages by hand.
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case r: ReusedExchangeExec => Seq.empty // output mirrors the reused original
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    val ex = shuffles(df.queryExecution.executedPlan)
    assert(ex.nonEmpty, "expected at least one shuffle in the band join")
    ex.foreach { e =>
      val binCols = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.BinaryType).map(_.name)
      assert(binCols.isEmpty,
        s"shuffle carries binary column(s) ${binCols.mkString(",")}: pixels must " +
          "reduce to hashes before anything shuffles")
    }
  }

  test("m12 executed plan: clustering never shuffles a binary payload") {
    // m12 runs the full decode -> hash -> band-join -> connected
    // components -> savings-report chain; like m11, the only things
    // that may cross an exchange are hashes, ids, labels, and pixel
    // COUNTS — never rasters.
    val spark = TestSpark.spark
    val df = Multimodal.imageDedupReport(spark, TestSpark.sfDir)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case r: ReusedExchangeExec => Seq.empty
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    val ex = shuffles(df.queryExecution.executedPlan)
    assert(ex.nonEmpty)
    ex.foreach { e =>
      val binCols = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.BinaryType).map(_.name)
      assert(binCols.isEmpty, s"m12 shuffle carries binary: ${binCols.mkString(",")}")
    }
    // and the report's numbers hold together: every cluster has >= 2
    // members (singletons never enter the pair graph) and n_dropped is
    // exactly n_members - 1.
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(2) == r.getLong(1) - 1)
      assert(r.getLong(3) > 0) // every dropped image has pixels
    }
  }

  test("m20 scene report is internally consistent with the generator's frame counts") {
    val spark = TestSpark.spark
    val rows = Multimodal.sceneChanges(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nFrames, nScenes, nCuts, longest) =>
      assert(nFrames == 2 + id % 4, s"video $id frame count")
      assert(nScenes == nCuts + 1)
      assert(nScenes >= 1 && nScenes <= nFrames)
      assert(longest >= 1 && longest <= nFrames)
      // scenes partition the frames, so the longest is at least the mean
      assert(longest * nScenes >= nFrames)
    }
    // the generator varies every frame (f*17 in each pixel), so real
    // motion must dominate: some video must have >1 scene
    assert(rows.exists(_._3 > 1))
  }

  test("m19 decimation equals the generator formula at even indices, through real codecs") {
    val spark = TestSpark.spark
    val rows = Multimodal.wavDecimate(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val nIn = Multimodal.WavCodec.nSamples(id)
      val nOut = (nIn + 1) / 2
      assert(r.getLong(1) == nIn.toLong)
      assert(r.getLong(2) == nOut.toLong, s"clip $id output length")
      var sum = 0L
      var wsum = 0L
      var j = 0
      while (j < nOut) {
        val sm = Multimodal.WavCodec.sample(id, 2 * j).toLong
        sum += sm
        wsum += sm * (j + 1)
        j += 1
      }
      assert(r.getLong(3) == sum, s"clip $id decimated amplitude sum")
      assert(r.getLong(4) == wsum, s"clip $id order-pinning weighted sum")
    }
  }

  test("m14 audio 1-NN equals a driver-side fingerprint recount, PCM never shuffles") {
    val spark = TestSpark.spark
    val df = Multimodal.audioNearestNeighbor(spark, TestSpark.sfDir)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver recount straight from the WAV generator formula
    val ids = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    def energies(id: Long): Array[Long] = {
      val n = Multimodal.WavCodec.nSamples(id)
      val e = new Array[Long]((n + 63) / 64)
      var i = 0
      while (i < n) {
        val s = Multimodal.WavCodec.sample(id, i).toLong
        e(i / 64) += s * s
        i += 1
      }
      e
    }
    val fp = ids.map(id => id -> energies(id)).toMap
    val expected = ids.filter(_ < 50).flatMap { q =>
      val qe = fp(q)
      val cands = ids.filter(c => c != q && fp(c).length == qe.length).map { c =>
        (c, qe.zip(fp(c)).map { case (a, b) => math.abs(a - b) }.sum)
      }
      if (cands.isEmpty) None
      else {
        val (c, l1) = cands.minBy { case (cid, d) => (d, cid) }
        Some((q, c, qe.length.toLong, l1))
      }
    }
    assert(rows.toSeq == expected.toSeq)
    // executed plan: the only arrays on exchanges are the <=10-long
    // fingerprints; PCM payload bytes never leave the codec partition.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case r: ReusedExchangeExec => Seq.empty
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    shuffles(df.queryExecution.executedPlan).foreach { e =>
      val binCols = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.BinaryType).map(_.name)
      assert(binCols.isEmpty, s"m14 shuffle carries binary: ${binCols.mkString(",")}")
    }
  }

  test("registered m04 plan keeps the image filter below the decode") {
    val spark = TestSpark.spark
    // The Column-expression decode means the media_type predicate is a
    // plain filter the optimizer keeps under the projection — the md5
    // never runs for audio/video rows. Assert no opaque
    // DeserializeToObject/mapPartitions boundary is in the plan.
    val plan = Multimodal.resizePlan(spark, TestSpark.sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("MapPartitions"), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
  }

  test("m15 video frame dedup equals a formula recount and shuffles no binary") {
    val spark = TestSpark.spark
    import spark.implicits._
    import Multimodal.GifCodec
    // driver-side recount: per-frame aHash from the generator formula
    // (same integer 8x8 cell algorithm), digest groups across videos
    val ids = Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id").as[Long].collect().sorted
    def frameHash(id: Long, f: Int): (Long, Long) = {
      val (w, h) = GifCodec.dims(id)
      val px = Array.tabulate(h, w)((y, x) => GifCodec.pixel(id, f, x, y).toLong)
      val total = px.map(_.sum).sum
      var hi = 0L; var lo = 0L
      for (j <- 0 until 8; i <- 0 until 8) {
        val x0 = i * w / 8; val x1 = (i + 1) * w / 8
        val y0 = j * h / 8; val y1 = (j + 1) * h / 8
        var csum = 0L
        for (y <- y0 until y1; x <- x0 until x1) csum += px(y)(x)
        val np = (x1 - x0).toLong * (y1 - y0)
        if (csum * w * h > total * np) {
          val b = 8 * j + i
          if (b >= 32) hi |= 1L << (b - 32) else lo |= 1L << b
        }
      }
      (hi, lo)
    }
    val frames = ids.flatMap(id =>
      (0 until GifCodec.nFrames(id)).map(f => (frameHash(id, f), id, f.toLong)))
    val expected = frames.groupBy(_._1).collect {
      case ((hi, lo), xs) if xs.map(_._2).distinct.length >= 2 =>
        (hi, lo) -> ((xs.map(_._2).distinct.length.toLong, xs.length.toLong,
          xs.map(x => x._2 * 8 + x._3).min))
    }.toMap
    val got = Multimodal.videoFrameDedup(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4) * 8 + r.getLong(5)))).toMap
    assert(got.nonEmpty, "fixture must produce at least one repeated frame group")
    assert(got == expected)

    // the decoded rasters must reduce to hashes inside the codec slot:
    // no exchange in the executed plan may carry a binary column
    val df = Multimodal.videoFrameDedup(spark, TestSpark.sfDir)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    def exchanges(p: SparkPlan): Seq[Exchange] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case r: ReusedExchangeExec => Seq.empty
      case e: Exchange => e +: e.children.flatMap(exchanges)
      case other => other.children.flatMap(exchanges)
    }
    val ex = exchanges(df.queryExecution.executedPlan)
    assert(ex.nonEmpty)
    ex.foreach { e =>
      val bin = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.BinaryType).map(_.name)
      assert(bin.isEmpty, s"m15 exchange carries binary column(s): ${bin.mkString(",")}")
    }
  }

  test("d24 cross-modal report composes from the d11 and m12 label tables") {
    val spark = TestSpark.spark
    // Driver-side recomputation of the disagreement set from the two
    // label tables the report claims to join — the oracle does the same
    // with recursive CTEs; this pins the composition at fixture scale.
    val txt = graft.ops.Dedup.dupClusters(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val img = Multimodal.imageClusterLabels(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = (txt.keySet ++ img.keySet).toSeq.sorted
    val tcOf = ids.map(id => id -> txt.getOrElse(id, id)).toMap
    val icOf = ids.map(id => id -> img.getOrElse(id, id)).toMap
    val nImg = ids.groupBy(tcOf).map { case (tc, ms) => tc -> ms.map(icOf).distinct.size }
    val nTxt = ids.groupBy(icOf).map { case (ic, ms) => ic -> ms.map(tcOf).distinct.size }
    val expected = ids.map(id =>
      (id, tcOf(id), icOf(id), nImg(tcOf(id)) > 1, nTxt(icOf(id)) > 1))
    val got = Multimodal.crossModalReport(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
      .toSeq
    assert(got.nonEmpty)
    assert(got == expected)
    // the fixture must actually exercise a disagreement, or the flags
    // are vacuous
    assert(got.exists(_._4) || got.exists(_._5),
      "fixture produced no cross-modal disagreement")
  }

  test("m22 consensus: candidate set equals m11, dHash verdicts recomputed, veto really fires") {
    import java.awt.image.BufferedImage
    val spark = TestSpark.spark
    val got = Multimodal.consensusDupPairs(spark, TestSpark.sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    val m11 = Multimodal.imageDupPairs(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == m11.keySet, "m22 must re-judge exactly m11's pairs")
    got.foreach { case (k, (aH, _, _)) => assert(aH == m11(k)) }
    // dHash distances recomputed from the generator formula
    def raster(id: Long): BufferedImage = {
      val w = (8 + id % 25).toInt; val h = (8 + (id / 25) % 25).toInt
      val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id * 31 + 7 * x + 13 * y) % 256).toInt
        b.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      b
    }
    got.foreach { case ((a, b), (_, dH, cons)) =>
      val (ahi, alo) = Multimodal.dhashOf(raster(a))
      val (bhi, blo) = Multimodal.dhashOf(raster(b))
      val expected = java.lang.Long.bitCount(ahi ^ bhi).toLong +
        java.lang.Long.bitCount(alo ^ blo).toLong
      assert(dH == expected, s"pair ($a,$b)")
      assert(cons == (dH <= 2))
    }
    // both verdict classes must occur or the consensus column is vacuous
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "fixture must produce both consensus and vetoed pairs")
  }

  test("m23 zero crossings: order-sensitivity proven — a reversed stream changes the count") {
    val spark = TestSpark.spark
    val got = Multimodal.wavZeroCrossingRate(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (id, n, ch, zcr) =>
      // recompute from the generator formula
      val samples = (0 until n.toInt).map(i => Multimodal.WavCodec.sample(id, i))
      val expected = samples.sliding(2).count {
        case Seq(a, b) => (a < 0) != (b < 0)
        case _ => false
      }.toLong
      assert(ch == expected, s"doc $id")
      assert(zcr == ch.toDouble / (n - 1).toDouble)
      assert(n == Multimodal.WavCodec.nSamples(id).toLong)
    }
    // the statistic is genuinely ORDER-sensitive on this corpus: for at
    // least one clip, sorting the samples (same amplitude multiset)
    // yields a different crossing count — the certificate m06's plain
    // sum cannot give
    val orderMatters = got.exists { case (id, n, ch, _) =>
      val sorted = (0 until n.toInt).map(i => Multimodal.WavCodec.sample(id, i)).sorted
      val chSorted = sorted.sliding(2).count {
        case Seq(a, b) => (a < 0) != (b < 0)
        case _ => false
      }.toLong
      chSorted != ch
    }
    assert(orderMatters, "every clip's crossings survive a sort — statistic vacuous")
  }

  test("m21 dHash: brightness-shift invariant, recomputed from the generator formula") {
    import java.awt.image.BufferedImage
    // build two rasters differing by a constant brightness shift
    // TYPE_INT_RGB with v replicated to all channels: getRGB & 0xff
    // returns v exactly (TYPE_BYTE_GRAY would gamma-convert in getRGB)
    def img(w: Int, h: Int, shift: Int): BufferedImage = {
      val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((x * 7 + y * 13 + (x * y) % 5) % 200 + shift).min(255)
        b.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      b
    }
    val base = img(20, 17, 0)
    val bright = img(20, 17, 40)
    assert(Multimodal.dhashOf(base) == Multimodal.dhashOf(bright),
      "dHash must survive a global brightness shift (cross-multiplied " +
        "adjacent-cell compares cancel the constant exactly)")
    // the registered query equals a driver-side recompute from the
    // generator formula for a sample of docs (incl. a w = 8 one whose
    // 9-column grid has an empty cell)
    val spark = TestSpark.spark
    val got = Multimodal.pngDHash(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sample = got.keySet.filter(id => id % 25 == 0 || id % 97 == 3).take(30)
    assert(sample.exists(_ % 25 == 0), "need a w = 8 doc to pin the empty-cell case")
    sample.foreach { id =>
      val w = (8 + id % 25).toInt; val h = (8 + (id / 25) % 25).toInt
      val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id * 31 + 7 * x + 13 * y) % 256).toInt
        b.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      assert(got(id) == Multimodal.dhashOf(b), s"doc $id")
    }
  }

  test("m25 keyframes agree with m20 scene counts; adjacent scenes change hash") {
    val spark = TestSpark.spark
    val kf = Multimodal.keyframes(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        (r.getLong(4), r.getLong(5))))
    val m20 = Multimodal.sceneChanges(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    kf.groupBy(_._1).foreach { case (doc, scenes) =>
      val (nFrames, nScenes) = m20(doc)
      assert(scenes.length.toLong == nScenes, s"doc $doc scene count")
      assert(scenes.map(_._4).sum == nFrames, s"doc $doc frame conservation")
      val byId = scenes.sortBy(_._2)
      assert(byId.map(_._2).toSeq == (1L to nScenes).toSeq, s"doc $doc scene ids")
      // keyframe = first frame after the previous scene's span
      byId.foldLeft(0L) { case (expectStart, (_, _, kfNo, len, _)) =>
        assert(kfNo == expectStart, s"doc $doc keyframe index"); expectStart + len
      }
      // a cut by definition changes the hash: adjacent scenes differ
      byId.sliding(2).foreach {
        case Array(a, b) => assert(a._5 != b._5, s"doc $doc adjacent scenes")
        case _ =>
      }
    }
  }

  test("m24 normalize: every clip lands exactly on the target peak, order preserved") {
    val spark = TestSpark.spark
    val rows = Multimodal.wavNormalize(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, peakIn, peakOut, sum, wsum) =>
      assert(n == 200 + id % 400, s"doc $id sample count changed through the chain")
      // the generator always produces at least one nonzero sample, and
      // scaling by 30000/peak maps the peak sample exactly onto 30000
      assert(peakIn >= 1, s"doc $id silent clip unexpected")
      assert(peakOut == 30000L, s"doc $id peak_out")
      // driver recompute from the generator formula through the same
      // integer scaling — pins the decode→scale→encode→decode chain
      var eSum = 0L; var eW = 0L; var eP = 0L
      var i = 0L
      while (i < n) {
        val s = (id * 7919 + i * 104729) % 65536 - 32768
        if (math.abs(s) > eP) eP = math.abs(s)
        i += 1
      }
      i = 0
      while (i < n) {
        val s = (id * 7919 + i * 104729) % 65536 - 32768
        val sc = if (s >= 0) s * 30000 / eP else -(-s * 30000 / eP)
        eSum += sc; eW += sc * (i + 1)
        i += 1
      }
      assert(sum == eSum && wsum == eW, s"doc $id sums")
    }
  }

  test("m26 ViT patches: grid dims, per-patch sums and order weights recomputed") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("m26_vit_patches")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    def pix(id: Long, i: Long, j: Long): Long = (id * 31 + 7 * i + 13 * j) % 256
    rows.groupBy(_._1).foreach { case (id, ps) =>
      val w = 8 + id % 25
      val h = 8 + (id / 25) % 25
      // complete-patch grid only: exactly ⌊w/4⌋×⌊h/4⌋ patches per image
      assert(ps.length == ((w / 4) * (h / 4)).toInt, s"doc $id grid")
      ps.foreach { case (_, py, px, sum, wsum) =>
        var eS = 0L; var eW = 0L
        var k = 0
        while (k < 16) {
          val v = pix(id, px * 4 + k % 4, py * 4 + k / 4)
          eS += v; eW += v * (k + 1); k += 1
        }
        assert(sum == eS && wsum == eW, s"doc $id patch ($py,$px)")
      }
    }
    // order sensitivity: some patch must have p_wsum ≠ the constant-
    // content value 8.5·p_sum (i.e. the weights see non-uniform pixels)
    assert(rows.exists { case (_, _, _, s, ws) => 2L * ws != 17L * s },
      "every patch looked constant — the order weight is not discriminating")
  }

  test("m27 tubelets: grid dims, sums and weights recomputed; frame order pinned") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("m27_video_tubelets")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    import graft.ops.Multimodal.GifCodec
    var orderWitness = false
    rows.groupBy(_._1).foreach { case (id, ts) =>
      val (w, h) = GifCodec.dims(id)
      val nf = GifCodec.nFrames(id)
      assert(ts.length == (nf / 2) * (h / 3) * (w / 3), s"doc $id grid")
      ts.foreach { case (_, tt, py, px, sum, wsum) =>
        var eS = 0L; var eW = 0L; var eWswap = 0L
        var k = 0
        while (k < 18) {
          val dt = k / 9; val dy = (k / 3) % 3; val dx = k % 3
          val v = GifCodec.pixel(id, (tt * 2 + dt).toInt,
            (px * 3 + dx).toInt, (py * 3 + dy).toInt).toLong
          val vSwap = GifCodec.pixel(id, (tt * 2 + (1 - dt)).toInt,
            (px * 3 + dx).toInt, (py * 3 + dy).toInt).toLong
          eS += v; eW += v * (k + 1); eWswap += vSwap * (k + 1); k += 1
        }
        assert(sum == eS && wsum == eW, s"doc $id tubelet ($tt,$py,$px)")
        if (eW != eWswap) orderWitness = true
      }
    }
    // the weight must DISCRIMINATE frame order: swapping the two frames
    // of some tubelet changes its weighted sum (f enters the generator
    // with coefficient 17, so consecutive frames always differ)
    assert(orderWitness, "no tubelet distinguished its frame order")
  }

  test("m29 upsample: chain recomputed from the PCM formula; floor midpoints exercised") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("m29_wav_upsample")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ids = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    assert(got.keySet == ids.toSet)
    var floorWitness = false
    ids.foreach { id =>
      val n = (200 + id % 400).toInt
      def s(i: Int): Long = (id * 7919 + i.toLong * 104729) % 65536 - 32768
      val out = (0 until 2 * n - 1).map { j =>
        if (j % 2 == 0) s(j / 2)
        else {
          val a = s(j / 2) + s(j / 2 + 1)
          // the semantics under test: TRUNCATING division (Java / and
          // DuckDB // both round toward zero) — a floor/shift would
          // sit one lower on exactly these odd negative sums
          if (a < 0 && a % 2 != 0) floorWitness = true
          a / 2
        }
      }
      val (ni, no, sum, wsum) = got(id)
      assert(ni == n.toLong && no == (2 * n - 1).toLong, s"doc $id counts")
      assert(sum == out.sum, s"doc $id sum")
      assert(wsum == out.zipWithIndex.map { case (v, k) => v * (k + 1) }.sum,
        s"doc $id wsum")
    }
    // the corpus must actually exercise the floor-vs-truncate corner
    assert(floorWitness, "no odd negative midpoint in the corpus")
  }

  test("m28 repeated patches: keys recomputed from the raster, gradient collapse proven") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("m28_repeated_patches")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty)
    val ids = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    // driver replay of the generator raster per patch
    def patches(id: Long): Seq[(Long, Long, Long, Long)] = {
      val w = (8 + id % 25).toInt; val h = (8 + (id / 25) % 25).toInt
      for { py <- 0 until h / 4; px <- 0 until w / 4 } yield {
        var k = 0L
        for (dy <- 0 until 4; dx <- 0 until 4) {
          val v = (id * 31 + 7 * (px * 4 + dx) + 13 * (py * 4 + dy)) % 256
          k = (k * 257 + v) % 2147483647L
        }
        // the collapse claim: the key is a FUNCTION of the patch's
        // base offset mod 256 alone (affine gradient ⇒ content is
        // base + fixed pattern), so key classes number ≤ 256
        val base = (id * 31 + 7 * (px * 4) + 13 * (py * 4)) % 256
        (py.toLong, px.toLong, k, base)
      }
    }
    val all = ids.flatMap(id => patches(id).map(p => (id, p._1, p._2, p._3, p._4)))
    val keyByBase = all.groupBy(_._5).map { case (b, g) => b -> g.map(_._4).distinct }
    assert(keyByBase.values.forall(_.size == 1),
      "same base offset must always yield the same patch key")
    assert(all.map(_._4).distinct.length <= 256)
    // recount the recurrence table
    val expected = all.groupBy(_._4).collect {
      case (k, g) if g.map(_._1).distinct.length >= 2 =>
        k -> (g.length.toLong, g.map(_._1).distinct.length.toLong, g.map(_._1).min)
    }
    assert(got == expected)
  }

  test("m33 payload validation: real headers pass; a corrupted byte is caught") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("m33_payload_validation")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    val nDocs = spark.read.parquet(TestSpark.sfDir + "/documents.parquet").count()
    assert(got.keySet == Set("gif", "png", "wav"))
    got.foreach { case (m, (n, v, ok)) =>
      assert(n == nDocs && v == nDocs && ok, s"$m")
    }
    // negative control: the check actually READS the bytes — flip one
    // signature byte and the verdict must flip
    import spark.implicits._
    val goodPng = graft.ops.Multimodal.PngCodec.encode(7L)
    val badPng = goodPng.clone(); badPng(0) = 0x00.toByte
    val df = Seq((1L, goodPng), (2L, badPng)).toDF("doc_id", "payload")
    val checked = df.select($"doc_id",
      (org.apache.spark.sql.functions.hex(
        org.apache.spark.sql.functions.expr("substring(payload, 1, 8)")) ===
        "89504E470D0A1A0A").as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(checked == Map(1L -> true, 2L -> false))
  }

  test("m32 modality correlation: sums recomputed from decoded features; |r| bounded") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("m32_modality_corr")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == Set("chars_pixsum", "chars_samples", "pixsum_samples"))
    val chars = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS x").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // features off the same decode paths the op uses
    val pix = graft.ops.Multimodal.pngDecodeMeta(spark, TestSpark.sfDir)
      .selectExpr("doc_id", "pix_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val samp = graft.ops.Multimodal.wavDecodeMeta(spark, TestSpark.sfDir)
      .selectExpr("doc_id", "n_samples").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = chars.keySet.intersect(pix.keySet).intersect(samp.keySet).toSeq
    val n = ids.length.toLong
    def corr(f: Map[Long, Long], g: Map[Long, Long]): (Long, Long, Long, Double) = {
      val sa = ids.map(f).sum; val sb = ids.map(g).sum
      val saa = ids.map(i => f(i) * f(i)).sum
      val sbb = ids.map(i => g(i) * g(i)).sum
      val sab = ids.map(i => f(i) * g(i)).sum
      val num = n * sab - sa * sb
      val da = n * saa - sa * sa
      val db = n * sbb - sb * sb
      (num, da, db,
        num.toDouble / (math.sqrt(da.toDouble) * math.sqrt(db.toDouble)))
    }
    val exp = Map("chars_pixsum" -> corr(chars, pix),
      "chars_samples" -> corr(chars, samp), "pixsum_samples" -> corr(pix, samp))
    got.foreach { case (k, (gn, num, da, db, r)) =>
      val (en, eda, edb, er) = exp(k)
      assert(gn == n, s"$k n")
      assert(num == en && da == eda && db == edb, s"$k integer sums")
      assert(java.lang.Double.doubleToLongBits(r) ==
        java.lang.Double.doubleToLongBits(er), s"$k r")
      assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12, s"$k bound")
    }
  }

  test("m31 rotation: replayed from the raster; pos_wsum separates all four orientations") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("m31_png_rotate")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ids = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    assert(got.size == ids.length)
    def pix(id: Long, x: Int, y: Int): Long = (id * 31 + 7 * x + 13 * y) % 256
    // weighted sum of a w2-wide, h2-tall raster given a pixel lookup
    def wsum(w2: Int, h2: Int, f: (Int, Int) => Long): (Long, Long) = {
      var s = 0L; var ws = 0L
      for (y <- 0 until h2; x <- 0 until w2) {
        val v = f(x, y); s += v; ws += v * (y * w2 + x + 1)
      }
      (s, ws)
    }
    ids.foreach { id =>
      val w = (8 + id % 25).toInt; val h = (8 + (id / 25) % 25).toInt
      val (s, ws) = wsum(h, w, (x2, y2) => pix(id, y2, h - 1 - x2))
      val (gw, gh, gs, gws) = got(id)
      assert(gw == h && gh == w && gs == s && gws == ws, s"doc $id")
    }
    // orientation discrimination: on a witness image, identity / CW /
    // CCW / transpose all share pix_sum but give four DISTINCT
    // position-weighted sums — the column the manifest exists for
    val id = ids.head
    val w = (8 + id % 25).toInt; val h = (8 + (id / 25) % 25).toInt
    val ident = wsum(w, h, (x, y) => pix(id, x, y))
    val cw = wsum(h, w, (x2, y2) => pix(id, y2, h - 1 - x2))
    val ccw = wsum(h, w, (x2, y2) => pix(id, w - 1 - y2, x2))
    val tr = wsum(h, w, (x2, y2) => pix(id, y2, x2))
    val all = Seq(ident, cw, ccw, tr)
    assert(all.map(_._1).distinct.length == 1, "rotations must preserve pix_sum")
    assert(all.map(_._2).distinct.length == 4,
      s"pos_wsum must separate orientations: ${all.map(_._2)}")
  }

  test("m30 pixel entropy: histogram and fold replayed from the raster, bit-exact") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("m30_pixel_entropy")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
      .toMap
    val ids = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    assert(got.size == ids.length)
    ids.foreach { id =>
      val w = (8 + id % 25).toInt; val h = (8 + (id / 25) % 25).toInt
      val counts = new Array[Long](256)
      for (y <- 0 until h; x <- 0 until w)
        counts(((id * 31 + 7 * x + 13 * y) % 256).toInt) += 1
      val n = w.toLong * h
      // the same fold the codec slot runs: bins ascending, c·ln c
      var s = 0.0; var nv = 0L
      for (v <- 0 until 256) {
        val c = counts(v)
        if (c > 0) { nv += 1; s += c.toDouble * Math.log(c.toDouble) }
      }
      val ent = Math.log(n.toDouble) - s / n.toDouble
      val (gw, gh, gn, gnv, gent, gflat) = got(id)
      assert(gw == w && gh == h && gn == n && gnv == nv, s"doc $id dims")
      assert(java.lang.Double.doubleToLongBits(gent) ==
        java.lang.Double.doubleToLongBits(ent), s"doc $id entropy")
      assert(gflat == (nv <= 16), s"doc $id flat")
      // entropy bounds: 0 (constant raster) .. ln(min(256, n)) (uniform)
      assert(ent >= 0.0 && ent <= Math.log(Math.min(256L, n).toDouble) + 1e-12,
        s"doc $id bounds")
    }
  }
}
