package graft.multimodal

/** Multimodal rows: media as an opaque `binary` column plus typed metadata
  * (SURVEY.md §7.5 / north-star brief). The engine never interprets media
  * bytes outside [[MediaFunctions]]; everything else treats `content` as a
  * blob, which is exactly how a 100 TB media table behaves — metadata
  * predicates prune, bytes only flow through the decode stage.
  */
case class MediaMeta(
  mimeType: String,
  width: Int, // images/video; -1 otherwise
  height: Int,
  sampleRate: Int, // audio; -1 otherwise
  durationMs: Long) // audio/video; -1 otherwise

case class MediaRow(
  mediaId: Long,
  kind: String, // image | audio | video
  content: Array[Byte],
  meta: MediaMeta)

/** Decoded/derived shapes. */
case class DecodedFrame(
  mediaId: Long,
  frameIndex: Int,
  width: Int,
  height: Int,
  nBytes: Int)

case class MediaFeatures(
  mediaId: Long,
  kind: String,
  embedding: Array[Float],
  nBytes: Int)

case class MediaPhash(
  mediaId: Long,
  phash: Long)
