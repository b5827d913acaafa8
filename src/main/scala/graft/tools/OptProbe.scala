package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal}
import graft.queries.Registry.T

/** Round-14 optimization probe: stage-level timings for the heavy media
  * gates (guide §1 "measure first"). Times each sub-chain of the
  * image/audio/video dedup pipelines under the bench's count()
  * convention, with and without a round-robin repartition of the
  * doc_id frame feeding the synthetic encode — the hypothesis under
  * test being that the encode+decode compute runs at SCAN parallelism
  * (one ~600 KB parquet file = one split = one core) while everything
  * downstream is already exchange-parallel. Prints one JSON line per
  * probe; no state is shared between probes (no persist anywhere).
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.range(1000).count() catch { case _: Throwable => }

    def docs: DataFrame = T(spark, dir, "documents").select(col("doc_id"))
    val par = spark.sparkContext.defaultParallelism
    def docsPar: DataFrame = docs.repartition(par)

    def time(label: String, warm: Int = 1, iters: Int = 3)(df: => DataFrame): Unit = {
      (1 to warm).foreach(_ => df.count())
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.size / 2)
      println(f"""{"probe":"$label","sec":$med%.3f,"runs":${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    }

    // --- image chain ---------------------------------------------------
    time("img_encode")(Multimodal.encodeBmpGray8x8(docs))
    time("img_encode_par")(Multimodal.encodeBmpGray8x8(docsPar))
    time("img_decode")(Multimodal.decodeBmpGray(spark, Multimodal.encodeBmpGray8x8(docs)))
    time("img_decode_par")(Multimodal.decodeBmpGray(spark, Multimodal.encodeBmpGray8x8(docsPar)))
    time("img_hash")(Multimodal.dHash56(
      Multimodal.decodeBmpGray(spark, Multimodal.encodeBmpGray8x8(docs))))
    time("img_hash_par")(Multimodal.dHash56(
      Multimodal.decodeBmpGray(spark, Multimodal.encodeBmpGray8x8(docsPar))))

    // --- audio chain ---------------------------------------------------
    time("wav_decode")(Multimodal.decodeWavPcm(spark, Multimodal.encodeWavPcm(docs)))
    time("wav_decode_par")(Multimodal.decodeWavPcm(spark, Multimodal.encodeWavPcm(docsPar)))

    // --- video chain ---------------------------------------------------
    time("avi_decode")(Multimodal.decodeAviFrames(spark, Multimodal.encodeAvi(docs)))
    time("avi_decode_par")(Multimodal.decodeAviFrames(spark, Multimodal.encodeAvi(docsPar)))
    time("avi_hash")(Multimodal.dHash56(
      Multimodal.decodeAviFrames(spark, Multimodal.encodeAvi(docs)),
      Seq("doc_id", "frame_idx")))
    time("avi_hash_par")(Multimodal.dHash56(
      Multimodal.decodeAviFrames(spark, Multimodal.encodeAvi(docsPar)),
      Seq("doc_id", "frame_idx")))

    // --- byte-equality proof: the retired EXPRESSION encoders, kept
    // here verbatim as reference implementations, joined payload-to-
    // payload against the shipping JVM encoders. Expected output: n=0
    // for all four. -----------------------------------------------------
    def refBmp8x8(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
      def le(v: Int, bytes: Int): String =
        (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
      val headerHex = "424D" + le(54 + 192, 4) + le(0, 4) + le(54, 4) +
        le(40, 4) + le(8, 4) + le(8, 4) + le(1, 2) + le(24, 2) +
        le(0, 4) + le(192, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
      def pixHex(j: Int): String = {
        val blk = j / 16
        val off = 2 * (j % 16) + 1
        val base = s"SUBSTRING(element_at(_blks, ${blk + 1}), $off, 2)"
        s"IF($idCol % 64 = $j, " +
          s"LOWER(LPAD(HEX((CAST(CONV($base, 16, 10) AS INT) + 128) % 256), 2, '0')), $base)"
      }
      val pixelPlane = (0 until 8).flatMap { sr =>
        val r = 7 - sr
        (0 until 8).map { c => s"REPEAT(${pixHex(r * 8 + c)}, 3)" }
      }
      val blks = (0 until 4).map(b =>
        s"MD5(CONCAT(CAST($idCol DIV 4 AS STRING), '_', '$b'))").mkString(", ")
      df.withColumn("_blks", expr(s"array($blks)"))
        .withColumn("payload",
          unhex(expr(s"CONCAT('$headerHex', ${pixelPlane.mkString(", ")})")))
        .drop("_blks")
    }
    def refBmpVar(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
      def le(v: Int, bytes: Int): String =
        (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
      def headerHex(w: Int, h: Int): String = {
        val stride = ((w * 3 + 3) / 4) * 4
        "424D" + le(54 + stride * h, 4) + le(0, 4) + le(54, 4) +
          le(40, 4) + le(w, 4) + le(h, 4) + le(1, 2) + le(24, 2) +
          le(0, 4) + le(stride * h, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
      }
      def pixHex(j: Int, npix: Int): String = {
        val blk = j / 16
        val off = 2 * (j % 16) + 1
        val base = s"SUBSTRING(element_at(_blks, ${blk + 1}), $off, 2)"
        s"IF($idCol % $npix = $j, " +
          s"LOWER(LPAD(HEX((CAST(CONV($base, 16, 10) AS INT) + 128) % 256), 2, '0')), $base)"
      }
      def bodyHex(w: Int, h: Int): String = {
        val padHex = "00" * (((w * 3 + 3) / 4) * 4 - w * 3)
        val rows = (0 until h).map { sr =>
          val r = h - 1 - sr
          (0 until w).map(c => s"REPEAT(${pixHex(r * w + c, w * h)}, 3)")
            .mkString(", ") + (if (padHex.nonEmpty) s", '$padHex'" else "")
        }
        rows.mkString(", ")
      }
      def blks(n: Int) = (0 until n).map(b =>
        s"MD5(CONCAT(CAST($idCol DIV 4 AS STRING), '_', '$b'))").mkString(", ")
      val narrow = s"CONCAT('${headerHex(13, 16)}', ${bodyHex(13, 16)})"
      val wide = s"CONCAT('${headerHex(18, 16)}', ${bodyHex(18, 16)})"
      df.withColumn("_blks", expr(
          s"IF(($idCol DIV 4) % 2 = 0, array(${blks(13)}), array(${blks(18)}))"))
        .withColumn("payload",
          unhex(expr(s"IF(($idCol DIV 4) % 2 = 0, $narrow, $wide)")))
        .drop("_blks")
    }
    def refWav(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
      def le(v: Int, bytes: Int): String =
        (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
      def ascii(s: String): String = s.getBytes("US-ASCII").map("%02X".format(_)).mkString
      val dataBytes = 128 * 2
      val headerHex = ascii("RIFF") + le(36 + dataBytes, 4) + ascii("WAVE") +
        ascii("fmt ") + le(16, 4) + le(1, 2) + le(1, 2) + le(16000, 4) +
        le(32000, 4) + le(2, 2) + le(16, 2) + ascii("data") + le(dataBytes, 4)
      val blks = (0 until 16).map(b =>
        s"MD5(CONCAT(CAST($idCol DIV 4 AS STRING), '_', '$b'))").mkString(", ")
      def sampleHex(i: Int): String = {
        val blk = i / 8
        val off = 4 * (i % 8) + 1
        val pair = s"SUBSTRING(element_at(_blks, ${blk + 1}), $off, 4)"
        val v = s"(CAST(CONV(SUBSTRING($pair, 1, 2), 16, 10) AS INT) + " +
          s"256 * CAST(CONV(SUBSTRING($pair, 3, 2), 16, 10) AS INT) + 512) % 65536"
        s"IF($idCol % 128 = $i, LOWER(CONCAT(LPAD(HEX(($v) % 256), 2, '0'), " +
          s"LPAD(HEX(($v) DIV 256), 2, '0'))), $pair)"
      }
      val sampleHexes = (0 until 128).map(sampleHex).mkString(", ")
      df.withColumn("_blks", expr(s"array($blks)"))
        .withColumn("payload", unhex(expr(s"CONCAT('$headerHex', $sampleHexes)")))
        .drop("_blks")
    }
    def refAvi(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
      def le(v: Int, bytes: Int): String =
        (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
      def ascii(s: String): String = s.getBytes("US-ASCII").map("%02X".format(_)).mkString
      val frameBytes = 8 * 8 * 3
      val nFrames = 4
      val strfHex = ascii("strf") + le(40, 4) +
        le(40, 4) + le(8, 4) + le(8, 4) + le(1, 2) + le(24, 2) +
        le(0, 4) + le(frameBytes, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
      val strhHex = ascii("strh") + le(56, 4) +
        ascii("vids") + ascii("DIB ") + le(0, 4) + le(0, 2) + le(0, 2) +
        le(0, 4) + le(1, 4) + le(25, 4) + le(0, 4) + le(nFrames, 4) +
        le(frameBytes, 4) + le(0, 4) + le(0, 4) +
        le(0, 2) + le(0, 2) + le(8, 2) + le(8, 2)
      val strlHex = ascii("LIST") + le(4 + 64 + 48, 4) + ascii("strl") +
        strhHex + strfHex
      val avihHex = ascii("avih") + le(56, 4) +
        le(40000, 4) + le(frameBytes * 25, 4) + le(0, 4) + le(0, 4) +
        le(nFrames, 4) + le(0, 4) + le(1, 4) + le(frameBytes, 4) +
        le(8, 4) + le(8, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
      val hdrlHex = ascii("LIST") + le(4 + 64 + 8 + 116, 4) + ascii("hdrl") +
        avihHex + strlHex
      val moviSize = 4 + nFrames * (8 + frameBytes)
      val riffSize = 4 + (8 + 4 + 64 + 8 + 116) + (8 + moviSize)
      val headerHex = ascii("RIFF") + le(riffSize, 4) + ascii("AVI ") + hdrlHex +
        ascii("LIST") + le(moviSize, 4) + ascii("movi")
      val frameChunkHdr = ascii("00db") + le(frameBytes, 4)
      def pixHex(g: Int): String = {
        val blk = g / 16
        val off = 2 * (g % 16) + 1
        val base = s"SUBSTRING(element_at(_blks, ${blk + 1}), $off, 2)"
        s"IF($idCol % 256 = $g, " +
          s"LOWER(LPAD(HEX((CAST(CONV($base, 16, 10) AS INT) + 128) % 256), 2, '0')), $base)"
      }
      val body = (0 until nFrames).flatMap { f =>
        s"'$frameChunkHdr'" +: (0 until 8).flatMap { sr =>
          val r = 7 - sr
          (0 until 8).map { c => s"REPEAT(${pixHex(f * 64 + r * 8 + c)}, 3)" }
        }
      }
      val blks = (0 until 16).map(b =>
        s"MD5(CONCAT(CAST($idCol DIV 4 AS STRING), '_', '$b'))").mkString(", ")
      df.withColumn("_blks", expr(s"array($blks)"))
        .withColumn("payload",
          unhex(expr(s"CONCAT('$headerHex', ${body.mkString(", ")})")))
        .drop("_blks")
    }

    def mismatches(name: String, ref: DataFrame, now: DataFrame): Unit = {
      val n = ref.select(col("doc_id"), col("payload").as("p1"))
        .join(now.select(col("doc_id"), col("payload").as("p2")), "doc_id")
        .filter(not(col("p1") === col("p2"))).count()
      println(s"""{"probe":"${name}_payload_mismatches","n":$n}""")
    }
    mismatches("bmp8x8", refBmp8x8(docs), Multimodal.encodeBmpGray8x8(docs))
    mismatches("bmpvar", refBmpVar(docs), Multimodal.encodeBmpGrayVar(docs))
    mismatches("wav", refWav(docs), Multimodal.encodeWavPcm(docs))
    mismatches("avi", refAvi(docs), Multimodal.encodeAvi(docs))
    time("wav_decode_refenc")(Multimodal.decodeWavPcm(spark, refWav(docs)))

    // --- downstream-from-checkpoint cost (video dedup verify) ----------
    val fh = Multimodal.dHash56(
        Multimodal.decodeAviFrames(spark, Multimodal.encodeAvi(docsPar)),
        Seq("doc_id", "frame_idx"))
      .localCheckpoint(true)
    time("video_verify_from_ckpt") {
      val bands = fh
        .select(col("doc_id"), col("frame_idx"), col("phash"),
          explode(expr("sequence(0, 3)")).as("b"))
        .select(col("doc_id"),
          (col("frame_idx") * 4 + col("b")).as("band"),
          expr("shiftright(phash, 14 * b) & 16383").as("band_hash"))
      Dedup.candidatePairsCapped(bands, "doc_id", maxBucket = 64, reps = 8)
        .join(fh.select(col("doc_id").as("id_a"), col("frame_idx"),
          col("phash").as("ph_a")), "id_a")
        .join(fh.select(col("doc_id").as("id_b"), col("frame_idx"),
          col("phash").as("ph_b")), Seq("id_b", "frame_idx"))
        .groupBy("id_a", "id_b", "capped")
        .agg(sum(bit_count(col("ph_a").bitwiseXOR(col("ph_b")))).as("hamming"))
        .filter(col("hamming") <= 6)
    }

    spark.stop()
  }
}
