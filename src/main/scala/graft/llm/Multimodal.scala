package graft.llm

import org.apache.spark.sql.DataFrame
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

  /** STUB frame sampling: `n` evenly spaced "frames", each fingerprinted
    * from a deterministic slice of the payload (char-domain slices of the
    * source text so any engine can reproduce them). */
  def frameSampleStub(df: DataFrame, textCol: String = "text", n: Int = 4): DataFrame = {
    val frames = (0 until n).map { i =>
      md5(substring(col(textCol), i * 16 + 1, 16))
    }
    df.withColumn("frame_hashes", array(frames: _*))
  }
}
