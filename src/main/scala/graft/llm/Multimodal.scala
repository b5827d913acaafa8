package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus feature-extraction stages.
  *
  * The Spark-side plumbing (schema, payload column, per-row feature
  * projection, deterministic batch-friendly shapes) is real and tested;
  * the actual media DECODE is a clearly-marked deterministic stub —
  * this container ships no image/audio codecs, so `decodeStub` derives
  * fake-but-stable "decoded" features (dimensions, frame hashes) from the
  * payload bytes. Swapping in a real codec means replacing only the
  * stubbed expressions (or routing the payload through `mapPartitions`
  * with a codec library) — the surrounding pipeline is unchanged.
  */
object Multimodal {

  /** Attach an opaque binary payload (UTF-8 bytes of `textCol`, standing
    * in for image/audio bytes) plus typed metadata: byte length and
    * content digest. */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        lit("application/octet-stream").as("mime_type")))

  /** STUB decode: deterministic fake features derived from payload bytes.
    * A real implementation would decode pixels/samples here; the stub
    * keeps schema and scaling behavior identical. */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("decoded", struct(
      (length(col("payload")) % 1280 + 640).cast("int").as("fake_width"),
      (length(col("payload")) % 720 + 360).cast("int").as("fake_height"),
      md5(col("payload")).as("pixel_digest")))

  /** What a decode produces: typed dimensions + a content digest. A real
    * image/audio codec fills the same shape. */
  final case class DecodedMedia(width: Int, height: Int, nFrames: Int, digest: String)

  /** Pluggable codec, constructed ONCE PER PARTITION inside
    * [[decodeWithCodec]] — heavy native init (a libjpeg/ffmpeg context)
    * is amortized over a partition's rows, never paid per row. This is
    * the Scala analog of a batched (pandas-style) decode UDF: the
    * partition iterator is the batch. */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte]): DecodedMedia
  }

  /** STUB codec (this container ships no media codecs): deterministic
    * fake dimensions from the byte length + a true md5 of the payload
    * bytes, so the plumbing around it — binary column in, typed row
    * out, per-partition batching — is fully exercised and oracle-
    * checkable. A real decoder replaces ONLY this class. */
  final class StubCodec extends MediaCodec {
    // transient + lazy: MessageDigest is not serializable, and a codec
    // instance captured in a task closure must survive the round-trip
    // (re-initialized per deserialized copy, once, not per row).
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    def decode(payload: Array[Byte]): DecodedMedia = {
      md.reset()
      val digest = md.digest(payload).map("%02x".format(_)).mkString
      DecodedMedia(payload.length % 1280 + 640, payload.length % 720 + 360,
        payload.length / 16, digest)
    }
  }

  /** Partition-wise decode: the imperative escape hatch (mapPartitions)
    * the SURVEY reserves for genuine per-partition logic — a codec is
    * exactly that. `mkCodec` runs once per partition (asserted in
    * LlmOpsSpec via an accumulator); rows stream through the iterator
    * without materializing the partition. Narrow op: no shuffle, scales
    * with input splits. */
  def decodeWithCodec(spark: SparkSession, df: DataFrame,
      mkCodec: () => MediaCodec): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = mkCodec()
        rows.map { case (id, bytes) =>
          val d = codec.decode(bytes)
          (id, d.width, d.height, d.nFrames, d.digest)
        }
      }
      .toDF("doc_id", "width", "height", "n_frames", "digest")
  }

  /** Resize planning: aspect-preserving fit of decoded (width, height)
    * into a (maxW, maxH) box, never upscaling — REAL arithmetic (this is
    * what a resize stage computes; only the pixel resample itself
    * belongs in the codec). Pure projection: codegen'd, zero shuffle. */
  def resizePlan(df: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame =
    df.withColumn("resize_scale",
        least(lit(maxW.toDouble) / col("width"),
          lit(maxH.toDouble) / col("height"), lit(1.0)))
      .withColumn("target_width",
        floor(col("width") * col("resize_scale")).cast("int"))
      .withColumn("target_height",
        floor(col("height") * col("resize_scale")).cast("int"))

  /** STUB frame sampling: `n` consecutive "frames", each fingerprinted
    * from a slice of the BINARY payload itself — the byte-domain slicing
    * (`substring` over BinaryType) is the real multimodal plumbing under
    * test; only the decode of a frame is faked. The fingerprint is
    * md5(hex(bytes)) rather than md5(bytes) so engines without blob
    * slicing (e.g. the DuckDB oracle) can reproduce a frame by slicing
    * the hex dump of the whole payload at 2× the offsets. */
  def frameSampleStub(df: DataFrame, n: Int = 4, frameBytes: Int = 16): DataFrame = {
    val frames = (0 until n).map { i =>
      md5(hex(expr(s"substring(payload, ${i * frameBytes + 1}, $frameBytes)")))
    }
    df.withColumn("frame_hashes", array(frames: _*))
  }
}
