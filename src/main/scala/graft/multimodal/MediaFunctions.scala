package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Media decode / feature-extraction plumbing (SURVEY.md §7.5).
  *
  * The Spark-side shape is the real deliverable: typed `Dataset[MediaRow]` →
  * `mapPartitions` with explicit micro-batching (the JVM analog of
  * `mapInPandas` arrow batches — decode libraries amortize per-batch setup),
  * executor-local decoding, fixed-width embedding output ready for the
  * similarity operators (q31/q32).
  *
  * DECODE IS A STUB: real image/audio codecs are not available in this
  * environment, so [[decodeHeader]] parses this repo's deterministic fake
  * container format (see [[MediaFixture]]) and [[embed]] derives a
  * deterministic pseudo-embedding from content bytes. Both are single,
  * clearly-marked plug points — swapping in javacv/ffmpeg changes no
  * signature and no plan shape.
  */
object MediaFunctions {

  val EmbeddingDim = 32
  val DecodeBatchSize = 64

  /** Fake container header: magic "GRFT" + kind byte + width + height.
    * The plug point for a real codec.
    */
  private[multimodal] def decodeHeader(content: Array[Byte]): (Int, Int) = {
    require(content.length >= 13 &&
      new String(content, 0, 4, StandardCharsets.US_ASCII) == "GRFT",
      "not a GRFT container")
    val bb = ByteBuffer.wrap(content, 5, 8)
    (bb.getInt(), bb.getInt())
  }

  /** Deterministic pseudo-embedding of the payload — stands in for a model
    * forward pass; statistically spread via sha256 expansion. The digest is
    * taken over the LOWERCASE-HEX rendering of the bytes (not the raw
    * blob) so the DuckDB oracle can replay the stage byte-for-byte:
    * `sha256(lower(hex(content)))` there is bit-identical to this digest
    * (DuckDB's sha256 only accepts VARCHAR).
    */
  private[multimodal] def embed(content: Array[Byte]): Array[Float] = {
    val hex = content.map("%02x".format(_)).mkString
    val md = MessageDigest.getInstance("SHA-256")
    val d1 = md.digest(hex.getBytes(StandardCharsets.US_ASCII))
    val d2 = MessageDigest.getInstance("SHA-256").digest(d1)
    val bytes = d1 ++ d2
    Array.tabulate(EmbeddingDim)(i => (bytes(i) & 0xff).toFloat / 255f - 0.5f)
  }

  /** Decode stage: one header parse per row, batched per partition. */
  def decodeFrames(media: Dataset[MediaRow]): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        // per-batch codec setup would live here (mapInPandas analog)
        batch.iterator.map { m =>
          val (w, h) = decodeHeader(m.content)
          DecodedFrame(m.mediaId, 0, w, h, m.content.length)
        }
      }
    }
  }

  /** Feature-extraction stage → embeddings compatible with q31/q32. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          MediaFeatures(m.mediaId, m.kind, embed(m.content), m.content.length)
        }
      }
    }
  }

  /** Resize stage (images/video; audio passes through untouched): the
    * header is rewritten to (w/factor, h/factor) and the payload decimated
    * to every `factor`-th byte — the deterministic stand-in for pixel
    * decimation, so the output is byte-reproducible by the DuckDB oracle
    * straight from the input blob. A real impl calls the codec's scaler in
    * the same per-batch slot; signature and plan shape don't change.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    // fail loudly at the driver, not as an ArithmeticException (or silently
    // reversed semantics) deep inside an executor task
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          if (m.kind == "audio") m
          else {
            val (w, h) = decodeHeader(m.content)
            // clamp: a factor above a small dimension must not emit a
            // 0-width/height header over a non-empty payload
            val (rw, rh) = (math.max(w / factor, 1), math.max(h / factor, 1))
            val header = ByteBuffer.allocate(13)
            header.put("GRFT".getBytes(StandardCharsets.US_ASCII))
            header.put(m.content(4))
            header.putInt(rw)
            header.putInt(rh)
            val payload = m.content.drop(13).grouped(factor).map(_.head).toArray
            m.copy(content = header.array() ++ payload,
              meta = m.meta.copy(width = rw, height = rh))
          }
        }
      }
    }
  }

  /** Frame sampling for video kind: every `stride`-th synthetic frame of the
    * container (a real impl seeks keyframes; same output shape).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val (w, h) = decodeHeader(m.content)
      val nFrames = math.max(1, (m.content.length - 13) / 16)
      (0 until nFrames by stride).map(i => DecodedFrame(m.mediaId, i, w, h, 16))
    }
  }
}

/** Deterministic fake-media generator (fixture side of the stub). */
object MediaFixture {

  private def payload(id: Long, kind: String, w: Int, h: Int, extra: Int): Array[Byte] = {
    val header = ByteBuffer.allocate(13)
    header.put("GRFT".getBytes(StandardCharsets.US_ASCII))
    header.put((kind match { case "image" => 1; case "audio" => 2; case _ => 3 }).toByte)
    header.putInt(w)
    header.putInt(h)
    val body = MessageDigest.getInstance("SHA-256")
      .digest(s"media:$id".getBytes(StandardCharsets.UTF_8))
    header.array() ++ Iterator.continually(body).flatten.take(extra).toArray
  }

  def generate(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 64 + (i % 8).toInt * 16
      val h = 48 + (i % 5).toInt * 16
      MediaRow(i, kind, payload(i, kind, w, h, 128 + (i % 11).toInt * 16),
        MediaMeta(s"x-graft/$kind", w, h,
          if (kind == "audio") 16000 else -1,
          if (kind == "image") -1 else 1000L + i))
    }
  }
}
