package graft

import graft.functions.TokenCountExpression
import graft.multimodal._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("decode recovers the dimensions carried in the typed metadata") {
    val media = MediaFixture.generate(spark, 60)
    val decoded = MediaFunctions.decodeFrames(media).toDF()
    val joined = media.toDF()
      .select(col("mediaId"), col("meta.width").as("mw"), col("meta.height").as("mh"))
      .join(decoded, "mediaId")
    assert(joined.count() == 60)
    assert(joined.filter(col("mw") =!= col("width") || col("mh") =!= col("height")).count() == 0)
  }

  test("feature extraction is deterministic with fixed dimensionality") {
    val a = MediaFunctions.extractFeatures(MediaFixture.generate(spark, 30)).collect()
    val b = MediaFunctions.extractFeatures(MediaFixture.generate(spark, 30)).collect()
    assert(a.length == 30)
    assert(a.forall(_.embedding.length == MediaFunctions.EmbeddingDim))
    val am = a.map(r => r.mediaId -> r.embedding.toSeq).toMap
    b.foreach(r => assert(am(r.mediaId) == r.embedding.toSeq, s"media ${r.mediaId} not deterministic"))
  }

  test("frame sampling only covers video and respects the stride") {
    val media = MediaFixture.generate(spark, 60)
    val frames = MediaFunctions.sampleFrames(media, stride = 4).toDF()
    val kinds = frames.join(media.toDF().select("mediaId", "kind"), "mediaId")
      .select("kind").distinct().collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("video"))
    assert(frames.filter(col("frameIndex") % 4 =!= 0).count() == 0)
  }

  test("resize halves dimensions, decimates payloads, and round-trips the decoder") {
    val media = MediaFixture.generate(spark, 60)
    val resized = MediaFunctions.resize(media, 2)
    val byId = media.collect().map(m => m.mediaId -> m).toMap
    resized.collect().foreach { r =>
      val orig = byId(r.mediaId)
      if (r.kind == "audio") {
        assert(r.content.sameElements(orig.content), "audio must pass through")
      } else {
        val (w, h) = (orig.meta.width, orig.meta.height)
        // independent header re-parse (GRFT magic + kind byte + two BE int32)
        val bb = java.nio.ByteBuffer.wrap(r.content, 5, 8)
        val (rw, rh) = (bb.getInt(), bb.getInt())
        assert(new String(r.content, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "GRFT")
        assert(rw == w / 2 && rh == h / 2, s"media ${r.mediaId} header not halved")
        assert(r.meta.width == w / 2 && r.meta.height == h / 2)
        val expected = orig.content.drop(13).grouped(2).map(_.head).toArray
        assert(r.content.drop(13).sameElements(expected),
          s"media ${r.mediaId} payload not decimated byte-for-byte")
      }
    }
  }

  test("real image codec: actual PNGs decode, resize, and embed through ImageIO") {
    import spark.implicits._
    // real PNG payloads generated through the JDK codec itself
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17 + seed * 7919) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = spark.createDataset(Seq(
      MediaRow(1000L, "image", png(40, 30, 1), MediaMeta("image/png", 40, 30, -1, -1L)),
      MediaRow(1001L, "image", png(64, 48, 2), MediaMeta("image/png", 64, 48, -1, -1L))))

    // decode: true raster dimensions, not metadata echoes
    val decoded = MediaFunctions.decodeFrames(rows).collect()
      .map(d => d.mediaId -> ((d.width, d.height))).toMap
    assert(decoded == Map(1000L -> ((40, 30)), 1001L -> ((64, 48))))

    // resize: a REAL pixel rescale — re-decode the emitted PNG bytes
    // independently and check the raster, not just the metadata
    MediaFunctions.resize(rows, 2).collect().foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      assert(img != null, "resized payload must be a decodable PNG")
      assert((img.getWidth, img.getHeight) == (r.meta.width, r.meta.height))
      assert(img.getWidth == decoded(r.mediaId)._1 / 2)
    }

    // embed: pixel-histogram features — deterministic, normalized, and
    // sensitive to content (different images ⇒ different embeddings)
    val feats = MediaFunctions.extractFeatures(rows).collect()
      .map(f => f.mediaId -> f.embedding).toMap
    feats.values.foreach { e =>
      assert(e.length == MediaFunctions.EmbeddingDim)
      assert(math.abs(e.sum - 1.0f) < 1e-3, "histogram must be L1-normalized")
    }
    assert(feats(1000L).toSeq != feats(1001L).toSeq)
  }

  test("real audio codec: actual WAVs decode, downsample, and embed through javax.sound.sampled") {
    import spark.implicits._
    // real 16-bit PCM WAV payloads generated through the JDK codec itself
    def wav(nFrames: Int, rate: Float, tone: Int): Array[Byte] = {
      import javax.sound.sampled._
      val bytes = new Array[Byte](nFrames * 2)
      for (i <- 0 until nFrames) {
        val s = (math.sin(2 * math.Pi * tone * i / rate) * 12000).toInt.toShort
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt,
          nFrames.toLong), AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = spark.createDataset(Seq(
      MediaRow(2000L, "audio", wav(800, 8000f, 440),
        MediaMeta("audio/wav", -1, -1, 8000, 100L)),
      MediaRow(2001L, "audio", wav(1200, 8000f, 1200),
        MediaMeta("audio/wav", -1, -1, 8000, 150L))))

    // decode: true (sample frames, channels) from the decoded stream
    val decoded = MediaFunctions.decodeFrames(rows).collect()
      .map(d => d.mediaId -> ((d.width, d.height))).toMap
    assert(decoded == Map(2000L -> ((800, 1)), 2001L -> ((1200, 1))))

    // resize: REAL downsampling — re-decode the emitted WAV independently
    // and check frame count, rate, and that samples are the decimated
    // originals (every 2nd frame of the source PCM)
    val origById = rows.collect().map(r => r.mediaId -> r.content).toMap
    MediaFunctions.resize(rows, 2).collect().foreach { r =>
      import javax.sound.sampled._
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.content))
      assert(ais.getFormat.getSampleRate == 4000f, "rate must halve")
      assert(r.meta.sampleRate == 4000)
      val n0 = decoded(r.mediaId)._1
      assert(ais.getFrameLength == (n0 + 1) / 2, "every 2nd frame kept")
      val got = ais.readAllBytes()
      val src = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(origById(r.mediaId))).readAllBytes()
      for (f <- 0 until (n0 + 1) / 2; b <- 0 until 2)
        assert(got(2 * f + b) == src(4 * f + b),
          s"media ${r.mediaId} frame $f not the decimated source sample")
    }

    // embed: amplitude-histogram features — deterministic, L1-normalized,
    // and sensitive to content (different tones ⇒ different embeddings)
    val feats = MediaFunctions.extractFeatures(rows).collect()
      .map(f => f.mediaId -> f.embedding).toMap
    feats.values.foreach { e =>
      assert(e.length == MediaFunctions.EmbeddingDim)
      assert(math.abs(e.sum - 1.0f) < 1e-3, "histogram must be L1-normalized")
    }
    assert(feats(2000L).toSeq != feats(2001L).toSeq)
  }

  test("real video codec: animated GIFs sample, resize, and embed frame-by-frame") {
    import spark.implicits._
    // a real multi-frame GIF generated through the JDK sequence writer
    def gif(w: Int, h: Int, nFrames: Int, seed: Int): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until w; y <- 0 until h)
          img.setRGB(x, y, (x * 31 + y * 17 + f * 101 + seed * 7919) & 0xffffff)
        img
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(fr => writer.writeToSequence(
          new javax.imageio.IIOImage(fr, null, null), writer.getDefaultWriteParam))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    val rows = spark.createDataset(Seq(
      MediaRow(3000L, "video", gif(32, 24, 9, 1), MediaMeta("image/gif", 32, 24, -1, 900L)),
      MediaRow(3001L, "video", gif(48, 32, 5, 2), MediaMeta("image/gif", 48, 32, -1, 500L))))

    // frame sampling: REAL decoded frames, every 4th, true raster dims
    val frames = MediaFunctions.sampleFrames(rows, stride = 4).collect()
      .groupBy(_.mediaId).view.mapValues(_.sortBy(_.frameIndex)).toMap
    assert(frames(3000L).map(_.frameIndex).toSeq == Seq(0, 4, 8))
    assert(frames(3001L).map(_.frameIndex).toSeq == Seq(0, 4))
    assert(frames(3000L).forall(f => f.width == 32 && f.height == 24))

    // resize: a real per-frame rescale re-encoded as a MULTI-FRAME gif —
    // re-decode independently and check frame count and rasters
    MediaFunctions.resize(rows, 2).collect().foreach { r =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.content))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      val f0 = reader.read(0)
      reader.dispose(); iis.close()
      val orig = if (r.mediaId == 3000L) (9, 32, 24) else (5, 48, 32)
      assert(n == orig._1, s"media ${r.mediaId}: frame count must survive resize")
      assert(f0.getWidth == orig._2 / 2 && f0.getHeight == orig._3 / 2)
      assert(r.meta.width == orig._2 / 2 && r.meta.height == orig._3 / 2)
    }

    // embed: pooled-across-frames histogram — L1-normalized, content-
    // sensitive
    val feats = MediaFunctions.extractFeatures(rows).collect()
      .map(f => f.mediaId -> f.embedding).toMap
    feats.values.foreach { e =>
      assert(e.length == MediaFunctions.EmbeddingDim)
      assert(math.abs(e.sum - 1.0f) < 1e-3, "pooled histogram must be L1-normalized")
    }
    assert(feats(3000L).toSeq != feats(3001L).toSeq)

    // decode: header parse = frame-0 raster dimensions
    val decoded = MediaFunctions.decodeFrames(rows).collect()
      .map(d => d.mediaId -> ((d.width, d.height))).toMap
    assert(decoded == Map(3000L -> ((32, 24)), 3001L -> ((48, 32))))
  }

  test("optimized patch-frame GIFs composite to their full-frame twin") {
    import java.awt.image.BufferedImage
    import javax.imageio.metadata.IIOMetadataNode
    import spark.implicits._
    val (sw, sh) = (32, 20)
    def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      img
    }
    // an OPTIMIZED animation: full base frame, then small patches at
    // offsets with explicit disposal methods (incl. one
    // restoreToBackgroundColor whose rect must revert to black)
    def writePatchGif(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      def meta(img: BufferedImage, x: Int, y: Int, disposal: String) = {
        val m = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
          writer.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = m.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        def child(tag: String): IIOMetadataNode = {
          val nl = root.getElementsByTagName(tag)
          if (nl.getLength > 0) nl.item(0).asInstanceOf[IIOMetadataNode]
          else { val n = new IIOMetadataNode(tag); root.appendChild(n); n }
        }
        val id = child("ImageDescriptor")
        id.setAttribute("imageLeftPosition", x.toString)
        id.setAttribute("imageTopPosition", y.toString)
        val gce = child("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        m.setFromTree(fmt, root)
        m
      }
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        def frame(img: BufferedImage, x: Int, y: Int, disposal: String): Unit =
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, meta(img, x, y, disposal)),
            writer.getDefaultWriteParam)
        frame(solid(sw, sh, 0xcc2200), 0, 0, "doNotDispose")   // full base
        frame(solid(8, 6, 0x00bb33), 4, 2, "doNotDispose")     // patch
        frame(solid(8, 6, 0x1133ee), 12, 8, "restoreToBackgroundColor")
        frame(solid(8, 6, 0xffffff), 20, 3, "doNotDispose")
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    // the full-frame TWIN: each frame is the manually composed screen
    def composite(ops: Seq[(BufferedImage, Int, Int)]): BufferedImage = {
      val c = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_RGB)
      val g = c.createGraphics()
      try ops.foreach { case (img, x, y) => g.drawImage(img, x, y, null) }
      finally g.dispose()
      c
    }
    val base = (solid(sw, sh, 0xcc2200), 0, 0)
    val green = (solid(8, 6, 0x00bb33), 4, 2)
    val blue = (solid(8, 6, 0x1133ee), 12, 8)
    val blackRect = (solid(8, 6, 0x000000), 12, 8) // after background disposal
    val white = (solid(8, 6, 0xffffff), 20, 3)
    val twinFrames = Seq(
      composite(Seq(base)),
      composite(Seq(base, green)),
      composite(Seq(base, green, blue)),
      composite(Seq(base, green, blackRect, white)))
    def writeFullGif(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        twinFrames.foreach(f => writer.writeToSequence(
          new javax.imageio.IIOImage(f, null, null), writer.getDefaultWriteParam))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    val rows = spark.createDataset(Seq(
      MediaRow(4000L, "video", writePatchGif(), MediaMeta("image/gif", sw, sh, -1, 400L)),
      MediaRow(4001L, "video", writeFullGif(), MediaMeta("image/gif", sw, sh, -1, 400L))))
    // composited frames report the LOGICAL SCREEN dims, not patch dims
    val frames = MediaFunctions.sampleFrames(rows, stride = 1).collect()
      .groupBy(_.mediaId).view.mapValues(_.sortBy(_.frameIndex)).toMap
    assert(frames(4000L).length == 4)
    assert(frames(4000L).forall(f => f.width == sw && f.height == sh),
      s"patch frames must composite to the ${sw}x$sh screen: " +
        frames(4000L).map(f => (f.width, f.height)).toSeq)
    // raster-level equality: identity resize re-encodes the COMPOSITED
    // frames of both files — decode and compare every pixel of every frame
    val out = MediaFunctions.resize(rows, 1).collect()
      .map(r => r.mediaId -> r.content).toMap
    def rasters(bytes: Array[Byte]): Seq[Seq[Int]] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis)
      try (0 until reader.getNumImages(true)).map { i =>
        val f = reader.read(i)
        (for (y <- 0 until f.getHeight; x <- 0 until f.getWidth)
          yield f.getRGB(x, y)).toSeq
      }.toSeq
      finally { reader.dispose(); iis.close() }
    }
    val (patchR, fullR) = (rasters(out(4000L)), rasters(out(4001L)))
    assert(patchR.length == 4 && fullR.length == 4)
    patchR.zip(fullR).zipWithIndex.foreach { case ((p, f), i) =>
      assert(p == f, s"frame $i: composited patch raster != full-frame twin")
    }
    // and the pooled video descriptor agrees byte-for-byte
    val feats = MediaFunctions.extractFeatures(rows).collect()
      .map(f => f.mediaId -> f.embedding.toSeq).toMap
    assert(feats(4000L) == feats(4001L),
      "pooled embedding must match the full-frame twin")
  }

  test("token_count matches size(split) on real documents and edge cases") {
    TokenCountExpression.register(spark)
    val docs = Tables.load(spark, sf0001, "documents")
    val mismatches = docs.select(
      expr("token_count(text)").as("native"),
      size(split(trim(col("text")), "\\s+")).as("viaSplit"))
      .filter(col("native") =!= col("viaSplit"))
      .count()
    assert(mismatches == 0)

    import spark.implicits._
    val edge = Seq("", "   ", "a", " a ", "a b\tc\nd", "\t\n x \r\n y").toDF("text")
    val rows = edge.select(expr("token_count(text)")).collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(0, 0, 1, 1, 4, 2))
  }

  test("token_count participates in whole-stage codegen") {
    TokenCountExpression.register(spark)
    val plan = Tables.load(spark, sf0001, "documents")
      .select(expr("token_count(text)").as("n"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[token_count.*"),
      s"expected token_count inside a codegen stage:\n$plan")
  }
}
