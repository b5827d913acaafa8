package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus feature-extraction stages.
  *
  * The Spark-side plumbing (schema, payload column, per-row feature
  * projection, deterministic batch-friendly shapes) is real and tested.
  * Decode comes in two tiers:
  *   - [[PpmCodec]] / [[BmpCodec]]: REAL pure-JVM decoders for the two
  *     self-contained uncompressed raster formats (PPM P6 and 24-bit
  *     BMP) — header parse, dimension extraction, pixel-byte extraction,
  *     pixel digest — no external codec library needed.
  *   - [[encodePng8x8]] / [[pngPixelsTopDown]]: a REAL COMPRESSED
  *     codec — zlib ships in the JDK, so the full PNG
  *     filter→deflate→chunk→CRC→inflate→unfilter round-trip runs pure
  *     JVM (as do the RIFF WAVE/AVI codecs for audio/video).
  *   - [[decodeStub]] / [[StubCodec]]: a clearly-marked deterministic
  *     stub standing in ONLY for formats whose codecs genuinely are
  *     not in the JDK (JPEG, H.264). The stub keeps schema and scaling
  *     behavior identical, so swapping in a libjpeg/ffmpeg-backed
  *     [[MediaCodec]] changes nothing around it.
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

  /** md5 of the UPPERCASE HEX dump of `bytes`, lowercase-hex-encoded.
    * Digesting the hex string rather than the raw bytes keeps the value
    * reproducible by engines whose md5() only accepts strings (the
    * DuckDB oracle among them); the bytes themselves are still the real
    * decoded pixels. */
  private[llm] def hexMd5(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    val hex = new StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      hex.append("%02X".format(bytes(i) & 0xff)); i += 1
    }
    md.reset()
    md.digest(hex.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .map("%02x".format(_)).mkString
  }

  /** REAL PPM (P6) decoder — pure JVM, no codec library. Parses the
    * text header (magic, optional `#` comments, width, height, maxval),
    * then extracts the binary pixel plane. Dimensions and the pixel
    * digest come from the actual payload bytes. */
  final class PpmCodec extends MediaCodec {
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    def decode(payload: Array[Byte]): DecodedMedia = {
      require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
        "not a P6 PPM payload")
      var pos = 2
      def skipWsAndComments(): Unit = {
        var done = false
        while (!done && pos < payload.length) {
          val c = payload(pos)
          if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
          else done = true
        }
      }
      def readInt(): Int = {
        skipWsAndComments()
        val start = pos
        var v = 0
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); pos += 1
        }
        require(pos > start, s"expected integer in PPM header at byte $start")
        v
      }
      val w = readInt(); val h = readInt(); val maxval = readInt()
      require(w > 0 && h > 0 && maxval > 0 && maxval < 65536,
        s"bad PPM header: ${w}x$h maxval=$maxval")
      // Exactly ONE whitespace byte separates maxval from pixel data
      // (per the netpbm spec — more would be pixel bytes).
      pos += 1
      val n = w * h * 3 * (if (maxval < 256) 1 else 2)
      require(payload.length - pos >= n,
        s"truncated PPM: need $n pixel bytes, have ${payload.length - pos}")
      val pixels = java.util.Arrays.copyOfRange(payload, pos, pos + n)
      DecodedMedia(w, h, 1, hexMd5(md, pixels))
    }
  }

  /** REAL 24-bit uncompressed BMP decoder — pure JVM. Parses the
    * BITMAPFILEHEADER + BITMAPINFOHEADER, honors the 4-byte row stride
    * padding and bottom-up row order (negative height = top-down), and
    * digests the pixel bytes in top-down row order with padding
    * stripped, so the digest depends only on image content, not layout. */
  final class BmpCodec extends MediaCodec {
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    def decode(payload: Array[Byte]): DecodedMedia = {
      val (w, h, pixels) = bmpPixelsTopDown(payload)
      DecodedMedia(w, h, 1, hexMd5(md, pixels))
    }
  }

  /** Build a REAL PPM (P6) payload per row, dimensions and pixel bytes
    * derived deterministically from `idCol` so an external oracle can
    * recompute the decoded features without parsing the image: width =
    * id%8+2, height = id%5+2, pixel byte i = (id*31+i)%256. Pure
    * expressions (sequence/transform HOF + unhex) — codegen'd, zero
    * shuffle; this is the encode twin of [[PpmCodec]]. */
  def encodePpm(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol).cast("long")
    val w = (id % 8 + 2).cast("int")
    val h = (id % 5 + 2).cast("int")
    val header = concat(lit("P6\n"), w.cast("string"), lit(" "),
      h.cast("string"), lit("\n255\n"))
    val nBytes = (w * h * 3).cast("long")
    val pixHex = concat_ws("",
      transform(sequence(lit(0L), nBytes - 1),
        i => lpad(hex((id * 31 + i) % 256), 2, "0")))
    df.withColumn("payload", concat(encode(header, "UTF-8"), unhex(pixHex)))
  }

  /** Build a REAL 24-bit BMP payload per row at fixed 2×2 dims — the
    * encode twin of [[BmpCodec]], exercising everything that makes BMP
    * awkward: little-endian headers, 4-byte row stride padding, and
    * bottom-up storage order. Logical TOP-DOWN pixel byte j (j<12) is
    * (id*31+j)%256 — the same formula family as [[encodePpm]] — so an
    * external oracle recomputes the decoded digest without parsing the
    * image; the encoder stores row 1 before row 0 with 2 pad bytes
    * each, which the decoder must undo to reach that digest. */
  def encodeBmp2x2(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def le(v: Int, bytes: Int): String =
      (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
    // 14-byte file header + 40-byte info header, all dims constant.
    val headerHex = "424D" + le(70, 4) + le(0, 4) + le(54, 4) + // BM, size, res, offset
      le(40, 4) + le(2, 4) + le(2, 4) + le(1, 2) + le(24, 2) +  // hdr, w, h, planes, bpp
      le(0, 4) + le(16, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
    val id = col(idCol).cast("long")
    def rowHex(r: Int) = concat_ws("", (0 until 6).map { c =>
      lpad(hex((id * 31 + (r * 6 + c)) % 256), 2, "0")
    }: _*)
    // Bottom-up: stored row order is logical row 1, then row 0.
    df.withColumn("payload",
      unhex(concat(lit(headerHex), rowHex(1), lit("0000"), rowHex(0), lit("0000"))))
  }

  /** Hex string → bytes, for assembling constant payload headers from
    * the same hex builders the oracle docs quote. */
  private def hexToBytes(hx: String): Array[Byte] =
    hx.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  /** Append a `payload` BinaryType column computed by a per-partition
    * JVM builder (one MessageDigest per task, like the decode codecs).
    * All input columns survive, payload lands last — the exact contract
    * of the `withColumn("payload", unhex(...))` expression encoders this
    * replaces.
    *
    * WHY JVM and not expressions (r14 optimization round, guide §1.2
    * "per-task work" + §4.2 "do the heavy lifting in native code"): the
    * expression encoders built the payload as one CONCAT over 64–256
    * per-pixel/per-sample terms (SUBSTRING/IF/CONV chains against
    * hoisted md5 blocks). That tree codegens into a method family far
    * past the JIT's huge-method compilation limit, so the hot loop runs
    * INTERPRETED — and when a decode mapPartitions follows in the same
    * stage, the whole encode+deserialize stage degrades together.
    * Measured at sf0.1 (OptProbe, median-of-3 under count()):
    * decodeWavPcm∘encodeWavPcm 1.76 s as expressions vs 0.19 s with
    * this builder (9.3×), payloads byte-identical (join-compare: 0
    * mismatches over 5000 docs). Same narrow, shuffle-free shape —
    * scale behavior is unchanged (still one pass over input splits). */
  private def appendPayload(df: DataFrame, idCol: String)(
      make: (java.security.MessageDigest, Long) => Array[Byte]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "payload", org.apache.spark.sql.types.BinaryType, nullable = true))
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.get(idx).asInstanceOf[Number].longValue
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ make(md, id))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** One 16-byte md5 block of the seeded corpora: md5(seed || '_' || b)
    * digest bytes — the DIGEST bytes are exactly the hex pairs the old
    * expression encoders SUBSTRINGed out of md5()'s hex string, so
    * copying them verbatim reproduces the payload byte-for-byte. */
  private def seedBlock(md: java.security.MessageDigest, seed: Long, b: Int): Array[Byte] = {
    md.reset()
    md.digest((seed.toString + "_" + b).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  }

  /** Build a REAL 8×8 24-bit BMP per row whose grayscale content is a
    * seeded pseudo-image with NEAR-DUPLICATE structure: every 4
    * consecutive doc_ids share a source image (seed = doc_id div 4;
    * gray of logical pixel j = byte j%16 of md5(seed || '_' || j div 16))
    * and each doc perturbs exactly ONE pixel (+128 mod 256 at position
    * doc_id % 64) — so same-seed images differ in ≤2 pixels, the shape a
    * perceptual-hash dedup must catch, while different seeds are
    * uncorrelated. r=g=b, so any luma formula recovers the gray value
    * exactly, and an external oracle recomputes every pixel from the
    * md5 formula without parsing BMP. Stored bottom-up with LE headers
    * like every 24-bit BMP (8·3 = 24-byte rows are already 4-aligned,
    * so no stride padding here — encodeBmp2x2 covers that case).
    * Partition-wise JVM builder (4 md5 digests per row), zero shuffle —
    * see [[appendPayload]] for why this is not an expression tree. */
  def encodeBmpGray8x8(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def le(v: Int, bytes: Int): String =
      (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
    val headerHex = "424D" + le(54 + 192, 4) + le(0, 4) + le(54, 4) +
      le(40, 4) + le(8, 4) + le(8, 4) + le(1, 2) + le(24, 2) +
      le(0, 4) + le(192, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
    val header = hexToBytes(headerHex)
    appendPayload(df, idCol) { (md, id) =>
      val out = new Array[Byte](header.length + 192)
      System.arraycopy(header, 0, out, 0, header.length)
      val dig = Array.tabulate(4)(b => seedBlock(md, id / 4, b))
      val perturbed = (id % 64).toInt
      // Storage order: bottom-up rows (stored row sr = logical row 7-sr),
      // three identical channel bytes per pixel.
      var sr = 0
      while (sr < 8) {
        val r = 7 - sr
        var c = 0
        while (c < 8) {
          val j = r * 8 + c
          var v = dig(j / 16)(j % 16) & 0xff
          if (j == perturbed) v = (v + 128) % 256
          val o = header.length + (sr * 8 + c) * 3
          out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
          c += 1
        }
        sr += 1
      }
      out
    }
  }

  /** Shared 24-bit BMP pixel extraction: LE header parse, stride
    * honored, rows returned in LOGICAL top-down order with padding
    * stripped. [[BmpCodec]] digests these bytes; [[decodeBmpGray]]
    * projects luma from them. */
  private[llm] def bmpPixelsTopDown(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    require(payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M',
      "not a BMP payload")
    val dataOffset = le32(payload, 10)
    val w = le32(payload, 18)
    val rawH = le32(payload, 22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    val bpp = le16(payload, 28)
    val compression = le32(payload, 30)
    require(bpp == 24 && compression == 0,
      s"only 24-bit uncompressed BMP supported (bpp=$bpp, compression=$compression)")
    require(w > 0 && h > 0, s"bad BMP dimensions ${w}x$rawH")
    // All size math in Long: a fuzzed w near 2^30 overflows Int stride to
    // a NEGATIVE value, which would slip the bounds require and surface
    // as AIOOBE/NegativeArraySize from the copy loop instead of a loud
    // reject (CodecFuzzSpec). Once the Long bound holds, every Int cast
    // below is exact (stride*h <= payload.length <= Int.MaxValue).
    require(dataOffset >= 54, s"bad BMP data offset $dataOffset")
    val strideL = ((w.toLong * 3 + 3) / 4) * 4
    require(payload.length >= dataOffset + strideL * h,
      s"truncated BMP: need ${strideL * h} pixel bytes at offset $dataOffset")
    val stride = strideL.toInt
    val pixels = new Array[Byte](w * 3 * h)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      System.arraycopy(payload, dataOffset + srcRow * stride, pixels, row * w * 3, w * 3)
      row += 1
    }
    (w, h, pixels)
  }

  /** Partition-wise BMP decode to GRAYSCALE: parses the same 24-bit
    * format as [[BmpCodec]] and projects integer luma
    * (299·R + 587·G + 114·B) div 1000 per pixel (BMP stores BGR), in
    * logical top-down order. Narrow mapPartitions — no shuffle, scales
    * with input splits; the real pixel bytes are the only input, so a
    * decoder bug (row flip, stride, channel order) changes the grays
    * and every downstream perceptual hash. */
  def decodeBmpGray(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h, px) = bmpPixelsTopDown(payload)
          val gray = new Array[Int](w * h)
          var i = 0
          while (i < gray.length) {
            val b = px(3 * i) & 0xff
            val g = px(3 * i + 1) & 0xff
            val r = px(3 * i + 2) & 0xff
            gray(i) = (299 * r + 587 * g + 114 * b) / 1000
            i += 1
          }
          (id, w, h, gray)
        }
      }
      .toDF("doc_id", "width", "height", "gray")
  }

  /** Build variable-size 24-bit BMPs (the general-image input for the
    * resample→dHash path): width 13 or 18 BY SEED (both widths force a
    * nonzero 4-byte stride pad — 39→40 and 54→56 — so the decoder's
    * padding handling is exercised on every row), height 16. Same
    * near-dup structure as [[encodeBmpGray8x8]]: 4 consecutive docs
    * share a seed (= same dims + same md5 base pixels, since width is a
    * seed function), each doc perturbing ONE pixel (+128 at
    * doc_id % npix). Gray of logical pixel j = byte j%16 of
    * md5(seed || '_' || j div 16); r=g=b. Partition-wise JVM builder
    * (13/18 md5 digests per row by width), zero shuffle — see
    * [[appendPayload]] for why this is not an expression tree. */
  def encodeBmpGrayVar(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def le(v: Int, bytes: Int): String =
      (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
    def headerHex(w: Int, h: Int): String = {
      val stride = ((w * 3 + 3) / 4) * 4
      "424D" + le(54 + stride * h, 4) + le(0, 4) + le(54, 4) +
        le(40, 4) + le(w, 4) + le(h, 4) + le(1, 2) + le(24, 2) +
        le(0, 4) + le(stride * h, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
    }
    val headerNarrow = hexToBytes(headerHex(13, 16))
    val headerWide = hexToBytes(headerHex(18, 16))
    appendPayload(df, idCol) { (md, id) =>
      // Width by seed parity (13 narrow / 18 wide), height 16; the
      // narrow image only needs blocks 0-12 — digest count stays
      // width-dependent, the r12 md5-count lesson carried over.
      val narrow = (id / 4) % 2 == 0
      val w = if (narrow) 13 else 18
      val h = 16
      val header = if (narrow) headerNarrow else headerWide
      val stride = ((w * 3 + 3) / 4) * 4
      val npix = w * h
      val nBlocks = (npix + 15) / 16
      val dig = Array.tabulate(nBlocks)(b => seedBlock(md, id / 4, b))
      val perturbed = (id % npix).toInt
      val out = new Array[Byte](header.length + stride * h)
      System.arraycopy(header, 0, out, 0, header.length)
      var sr = 0
      while (sr < h) {
        val r = h - 1 - sr // bottom-up storage
        var c = 0
        while (c < w) {
          val j = r * w + c
          var v = dig(j / 16)(j % 16) & 0xff
          if (j == perturbed) v = (v + 128) % 256
          val o = header.length + sr * stride + c * 3
          out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
          c += 1
        }
        // stride pad bytes stay zero (new Array[Byte] zero-fills)
        sr += 1
      }
      out
    }
  }

  /** Block-mean resample of a decoded (width, height, gray) image to a
    * gw×gh grid — the resample stage classic dHash runs before hashing.
    * Pixel (x, y) belongs to grid cell (y·gh div h, x·gw div w);
    * the cell value is the integer mean of its pixels. Exactly
    * replayable by any engine with integer division.
    *
    * Declarative spelling for ALREADY-DECODED frames: posexplode →
    * map-side-combined groupBy at (doc, cell) grain — the shuffle
    * carries only the gw×gh resampled cells per image (output-sized),
    * not the pixels. A 64-cell HOF projection was measured 3.5× SLOWER
    * (11.4 s vs 3.3 s at sf0.1: higher-order lambdas are interpreted
    * and O(cells × pixels) per row). When decoding anyway, prefer
    * [[decodeBmpGrayResampled]] — the codec does the block-mean in the
    * same per-partition pass, zero shuffle, O(pixels). */
  def resampleGray(df: DataFrame, gw: Int = 8, gh: Int = 8): DataFrame =
    df.select(col("doc_id"), col("width"), col("height"),
        posexplode(col("gray")).as(Seq("j", "v")))
      .select(col("doc_id"), col("width"), col("height"), col("v"),
        expr(s"(j DIV width) * $gh DIV height").as("gy"),
        expr(s"(j % width) * $gw DIV width").as("gx"))
      .groupBy("doc_id", "width", "height", "gy", "gx")
      .agg(expr("CAST(sum(v) AS BIGINT) DIV count(v)").as("mv"))
      .groupBy("doc_id", "width", "height")
      .agg(expr(
        s"""transform(array_sort(collect_list(struct(gy, gx, mv))),
           |  s -> CAST(s.mv AS INT))""".stripMargin).as("gray"))

  /** Decode + block-mean resample FUSED in the codec pass: the per-
    * partition decoder already holds the pixel bytes, so the gw×gh
    * integer means cost one O(pixels) sweep with no intermediate pixel
    * array column and NO shuffle at all — the resample belongs in the
    * codec. Semantics identical to decodeBmpGray ∘ resampleGray
    * (pinned in LlmOpsSpec). */
  def decodeBmpGrayResampled(spark: SparkSession, df: DataFrame,
      gw: Int = 8, gh: Int = 8): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h, px) = bmpPixelsTopDown(payload)
          val sums = new Array[Long](gw * gh)
          val ns = new Array[Long](gw * gh)
          var y = 0
          while (y < h) {
            val gy = y * gh / h
            var x = 0
            while (x < w) {
              val i = y * w + x
              val b = px(3 * i) & 0xff
              val g = px(3 * i + 1) & 0xff
              val r = px(3 * i + 2) & 0xff
              val c = gy * gw + x * gw / w
              sums(c) += (299 * r + 587 * g + 114 * b) / 1000
              ns(c) += 1
              x += 1
            }
            y += 1
          }
          (id, w, h, Array.tabulate(gw * gh)(c => (sums(c) / ns(c)).toInt))
        }
      }
      .toDF("doc_id", "width", "height", "gray")
  }

  /** 56-bit difference hash (dHash) over an 8×8 `gray` grid: bit
    * (r·7 + c) is set when gray(r,c) < gray(r,c+1) — for left pixel j
    * (column j%8 < 7) the bit index is j - j div 8. Pure codegen'd
    * projection over the array column; the BIGINT packs bits 0..55, so
    * it is non-negative and replays exactly in any engine with 64-bit
    * integers (the KMV hash-range lesson). Classic dHash resamples an
    * arbitrary image to the grid first — [[resampleGray]] is that stage;
    * [[encodeBmpGray8x8]] corpora are generated at grid size and skip it.
    * `keyCols` carries the identity through — (doc_id) for still
    * images, (doc_id, frame_idx) for video frames. */
  def dHash56(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.select(keyCols.map(col) :+ expr(
      """aggregate(filter(sequence(0, 62), j -> j % 8 < 7), CAST(0 AS BIGINT),
        |  (acc, j) -> acc + IF(element_at(gray, j + 1) < element_at(gray, j + 2),
        |    shiftleft(CAST(1 AS BIGINT), j - j DIV 8), CAST(0 AS BIGINT)))""".stripMargin)
      .as("phash"): _*)

  def dHash56(df: DataFrame): DataFrame =
    df.select(col("doc_id"), expr(
      """aggregate(filter(sequence(0, 62), j -> j % 8 < 7), CAST(0 AS BIGINT),
        |  (acc, j) -> acc + IF(element_at(gray, j + 1) < element_at(gray, j + 2),
        |    shiftleft(CAST(1 AS BIGINT), j - j DIV 8), CAST(0 AS BIGINT)))""".stripMargin)
      .as("phash"))

  /** Scene segmentation over per-frame perceptual hashes — the video
    * curation stage between decode and dedup: a frame OPENS a new scene
    * when its dHash Hamming distance to the PREVIOUS frame exceeds
    * `threshold` (the first frame always opens scene 0), and each scene
    * elects a deterministic content-addressed KEYFRAME — the frame with
    * the smallest (phash, frame_idx) — the representative a training
    * pipeline samples instead of every near-identical frame. Input is
    * the (doc_id, frame_idx, phash) frame the dedup chain already
    * computes (8 bytes per frame; the raw video is never re-decoded);
    * output is one row per (doc, scene) with the span, frame count, and
    * keyframe. Cost: the lag window, the running-cut sum, and the
    * per-scene aggregate all key on doc_id, so Catalyst plans ONE
    * exchange of the hash frame for the whole op; per-task state is one
    * video's frames and nothing is quadratic at any corpus scale. */
  def sceneSplit(frameHashes: DataFrame, threshold: Int = 28): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byFrame = Window.partitionBy("doc_id").orderBy("frame_idx")
    val prev = lag(col("phash"), 1).over(byFrame)
    frameHashes
      .select(col("doc_id"), col("frame_idx"), col("phash"),
        when(prev.isNull ||
            bit_count(col("phash").bitwiseXOR(prev)) > threshold, 1L)
          .otherwise(0L).as("_cut"))
      .select(col("doc_id"), col("frame_idx"), col("phash"),
        (sum(col("_cut")).over(byFrame
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
          .as("scene_id"))
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(
        min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        min(struct(col("phash"), col("frame_idx"))).as("_kf"))
      .select(col("doc_id"), col("scene_id"), col("start_frame"),
        col("end_frame"), col("n_frames"),
        col("_kf.frame_idx").as("keyframe_idx"),
        col("_kf.phash").as("keyframe_phash"))
  }

  /** Frame-aligned CLIP-in-VIDEO containment — the Content-ID shape: for
    * every (clip, video, offset) where the clip's frame sequence aligns
    * inside the video, report the summed aligned-frame Hamming distance
    * when it clears `tau`. Candidate generation is CONTENT-ADDRESSED and
    * never all-pairs: the join key is the full 56-bit frame hash, so a
    * candidate bucket is exactly the set of bit-identical frames — at
    * any corpus scale its size is the true-duplicate multiplicity (seed-
    * group-sized here, like the audio band keys), not a function of
    * corpus size; random 56-bit collisions are ~2⁻⁵⁶. Recall holds for
    * near-dup containment because a perturbed source changes at most
    * one frame's hash: at least one clip frame still matches exactly,
    * and the verify re-checks EVERY aligned frame. `clips` is
    * (clip_id, p, phash) with p = 0..nClipFrames-1; `videos` is
    * (doc_id, frame_idx, phash); both are 8-byte-per-frame hash frames
    * — no pixel data moves through the join. A candidate survives only
    * if all nClipFrames align inside the video (the n_aligned check —
    * a clip hanging off the end dies there). */
  def clipContainment(clips: DataFrame, videos: DataFrame,
      nClipFrames: Int, tau: Int = 6): DataFrame = {
    val v = videos.select(col("doc_id").as("video_id"),
      col("frame_idx"), col("phash"))
    val cand = clips.select(col("clip_id"), col("p"), col("phash"))
      .join(v, Seq("phash"))
      .select(col("clip_id"), col("video_id"),
        (col("frame_idx") - col("p")).as("offset"))
      .filter(col("offset") >= 0)
      .distinct()
    cand
      .join(clips.select(col("clip_id"), col("p"), col("phash").as("ph_c")),
        Seq("clip_id"))
      .select(col("clip_id"), col("video_id"), col("offset"), col("ph_c"),
        (col("offset") + col("p")).as("want_idx"))
      .join(v.select(col("video_id"), col("frame_idx").as("want_idx"),
        col("phash").as("ph_v")), Seq("video_id", "want_idx"))
      .groupBy(col("clip_id"), col("video_id"), col("offset"))
      .agg(sum(bit_count(col("ph_c").bitwiseXOR(col("ph_v")))).as("hamming"),
        count(lit(1)).as("n_aligned"))
      .filter(col("n_aligned") === nClipFrames && col("hamming") <= tau)
      .select(col("clip_id"), col("video_id"), col("offset"), col("hamming"))
  }

  /** Build a REAL RIFF/WAVE payload per row: canonical 44-byte header
    * (PCM format 1, mono, 16-bit, 16 kHz) + 128 little-endian int16
    * samples. Waveform content is seeded like the image corpus: 4
    * consecutive doc_ids share a source signal (seed = doc_id div 4;
    * sample i = LE int16 from bytes 2(i%8), 2(i%8)+1 of
    * md5(seed || '_' || i div 8) — so the unperturbed payload hex IS
    * the md5 hex verbatim) and each doc perturbs ONE sample
    * (+512 mod 2¹⁶ at position doc_id % 128). An external oracle
    * recomputes every sample from the formula without RIFF parsing. */
  def encodeWavPcm(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def le(v: Int, bytes: Int): String =
      (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
    def ascii(s: String): String = s.getBytes("US-ASCII").map("%02X".format(_)).mkString
    val dataBytes = 128 * 2
    val headerHex = ascii("RIFF") + le(36 + dataBytes, 4) + ascii("WAVE") +
      ascii("fmt ") + le(16, 4) + le(1, 2) + le(1, 2) + le(16000, 4) +
      le(32000, 4) + le(2, 2) + le(16, 2) + ascii("data") + le(dataBytes, 4)
    val header = hexToBytes(headerHex)
    // Partition-wise JVM builder (see [[appendPayload]]): the
    // unperturbed data plane IS the 16 md5 digests back to back —
    // "the payload hex is the md5 hex verbatim" becomes an arraycopy.
    appendPayload(df, idCol) { (md, id) =>
      val out = new Array[Byte](header.length + dataBytes)
      System.arraycopy(header, 0, out, 0, header.length)
      var b = 0
      while (b < 16) {
        System.arraycopy(seedBlock(md, id / 4, b), 0, out, header.length + 16 * b, 16)
        b += 1
      }
      // Perturbation: v = b0 + 256·b1 (LE), +512 mod 2^16, re-emit LE.
      val pos = header.length + 2 * (id % 128).toInt
      val v = ((out(pos) & 0xff) + 256 * (out(pos + 1) & 0xff) + 512) % 65536
      out(pos) = (v % 256).toByte
      out(pos + 1) = (v / 256).toByte
      out
    }
  }

  /** Partition-wise RIFF/WAVE PCM decode — pure JVM, no codec library:
    * walks the chunk list (ignoring non-fmt/data chunks like LIST),
    * validates PCM/mono/16-bit, and extracts the signed little-endian
    * samples. Narrow mapPartitions, no shuffle; the real payload bytes
    * are the only input, so a header-offset or endianness bug changes
    * every downstream feature. */
  /** Pure-JVM RIFF/WAVE chunk walk → (sampleRate, PCM samples). Hoisted
    * out of [[decodeWavPcm]]'s closure so the fuzz harness
    * (CodecFuzzSpec) can drive it directly with mutated payloads; every
    * corrupt shape must die in a `require`, never an AIOOBE or a
    * non-advancing loop. */
  private[llm] def wavPcmSamples(p: Array[Byte]): (Int, Array[Int]) = {
    def le32(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def tag(off: Int): String = new String(p, off, 4, "US-ASCII")
    require(p.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    var sampleRate = -1
    var samples: Array[Int] = null
    while (off + 8 <= p.length && (sampleRate < 0 || samples == null)) {
      val id4 = tag(off); val sz = le32(off + 4)
      // Validate the declared chunk size BEFORE dispatching: a
      // corrupt payload with sz past the buffer would otherwise
      // throw a raw AIOOBE from the sample extraction, and a
      // negative sz (high bit set) would make `off += 8 + sz`
      // non-advancing — an infinite loop in an executor task.
      // Fail loudly instead, like bmpPixelsTopDown's truncation
      // check (r12 advice).
      require(sz >= 0 && off + 8 + sz.toLong <= p.length,
        s"corrupt RIFF chunk '$id4' at byte $off: declared size $sz " +
          s"exceeds payload (${p.length} bytes)")
      if (id4 == "fmt ") {
        // The fmt reads below reach off+23; a fuzzed short chunk at the
        // payload tail would AIOOBE without this (CodecFuzzSpec).
        require(sz >= 16, s"short fmt chunk ($sz bytes)")
        require(le16(off + 8) == 1 && le16(off + 10) == 1 &&
          le16(off + 22) == 16,
          "only PCM mono 16-bit WAV supported")
        sampleRate = le32(off + 12)
      } else if (id4 == "data") {
        val n = sz / 2
        samples = Array.tabulate(n) { i =>
          val v = le16(off + 8 + 2 * i)
          if (v >= 32768) v - 65536 else v
        }
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    (sampleRate, samples)
  }

  def decodeWavPcm(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, p) =>
          val (sampleRate, samples) = wavPcmSamples(p)
          (id, sampleRate, samples.length, samples)
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "samples")
  }

  /** Audio features over decoded samples — pure integer projections,
    * exactly replayable by any engine: peak |amplitude|, mean-square
    * energy (integer division — no float sqrt), zero-crossing count
    * (sign change on the >= 0 predicate), and a 15-bit ENERGY-DELTA
    * fingerprint over 16 windows of 8 samples (bit w set when window
    * w+1 is louder than window w) — the Shazam-style band-energy shape
    * reduced to exact integer math. */
  def audioFeatures(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("sample_rate"), col("n_samples"),
      expr("aggregate(samples, CAST(0 AS BIGINT), (m, s) -> greatest(m, CAST(abs(s) AS BIGINT)))")
        .as("peak"),
      expr("aggregate(samples, CAST(0 AS BIGINT), (a, s) -> a + CAST(s AS BIGINT) * s) DIV n_samples")
        .as("mean_square"),
      expr("""aggregate(sequence(1, n_samples - 1), CAST(0 AS BIGINT),
             |  (a, i) -> a + IF((element_at(samples, i + 1) >= 0) !=
             |                   (element_at(samples, i) >= 0), 1, 0))""".stripMargin)
        .as("zero_crossings"),
      expr("""aggregate(sequence(0, 14), CAST(0 AS BIGINT), (acc, w) ->
             |  acc + IF(
             |    aggregate(slice(samples, 8 * (w + 1) + 1, 8), CAST(0 AS BIGINT),
             |      (a, s) -> a + CAST(s AS BIGINT) * s) >
             |    aggregate(slice(samples, 8 * w + 1, 8), CAST(0 AS BIGINT),
             |      (a, s) -> a + CAST(s AS BIGINT) * s),
             |    shiftleft(CAST(1 AS BIGINT), w), CAST(0 AS BIGINT)))""".stripMargin)
        .as("energy_fp"))

  /** Silence-gated audio segmentation — the audio twin of [[sceneSplit]]
    * and the VAD-shaped curation stage between decode and feature
    * extraction: the signal is cut into fixed windows of
    * `windowSamples` samples, a window is ACTIVE when its exact integer
    * energy (Σ s²) clears `threshold`, and each maximal run of active
    * windows becomes one segment (classic gaps-and-islands: a run opens
    * where the previous active window is not the immediate neighbor).
    * Output is one row per (doc, segment) with the window span, length,
    * peak- and total-energy — all BIGINT math, exactly replayable by
    * any engine. Cost mirrors sceneSplit: the lag window, the running
    * run-id sum, and the per-segment aggregate all key on doc_id, so
    * ONE exchange of the (doc, window, energy) frame — 16 rows/doc, the
    * samples themselves never shuffle — covers the whole op at any
    * corpus scale. */
  def silenceSplit(decoded: DataFrame, threshold: Long,
      windowSamples: Int = 8, nWindows: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byW = Window.partitionBy("doc_id").orderBy("w")
    val prevW = lag(col("w"), 1).over(byW)
    // loud length guard (r13 ADVICE): a signal shorter than the window
    // grid would silently yield empty/partial slices whose energy
    // computes as 0 (or a partial sum) and vanishes below the silence
    // gate — fail per-row instead, the same posture as Pq.subspaces on
    // wrong-length vectors. assert_true returns NULL on pass, so the
    // where() both forces the check and filters nothing.
    val expected = windowSamples * nWindows
    decoded
      .where(assert_true(size(col("samples")) === expected,
        concat(lit(s"silenceSplit: samples must have exactly $expected " +
          s"(= $windowSamples x $nWindows) values; got "),
          size(col("samples")), lit(" for doc_id "), col("doc_id"))).isNull)
      .select(col("doc_id"),
        explode(expr(s"sequence(0, ${nWindows - 1})")).as("w"),
        col("samples"))
      .select(col("doc_id"), col("w"),
        expr(s"""aggregate(slice(samples, $windowSamples * w + 1, $windowSamples),
                |  CAST(0 AS BIGINT), (a, s) -> a + CAST(s AS BIGINT) * s)""".stripMargin)
          .as("energy"))
      .filter(col("energy") >= threshold)
      .select(col("doc_id"), col("w"), col("energy"),
        when(prevW.isNull || col("w") - prevW > 1, 1L).otherwise(0L).as("_cut"))
      .select(col("doc_id"), col("w"), col("energy"),
        (sum(col("_cut")).over(byW
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
          .as("segment_id"))
      .groupBy(col("doc_id"), col("segment_id"))
      .agg(
        min(col("w")).as("start_w"),
        max(col("w")).as("end_w"),
        count(lit(1)).as("n_windows"),
        max(col("energy")).as("peak_energy"),
        sum(col("energy")).as("sum_energy"))
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

  /** Build a REAL RIFF AVI container per row — multi-frame uncompressed
    * video, the third genuinely-decoded modality after BMP images and
    * WAV audio. Canonical structure, all little-endian:
    * {{{
    *   RIFF('AVI '
    *     LIST('hdrl' avih(56) LIST('strl' strh(56: 'vids'/'DIB ')
    *                               strf(40: BITMAPINFOHEADER 8×8×24)))
    *     LIST('movi' '00db'(192-byte DIB frame) ×4))
    * }}}
    * Four 8×8 frames, each a bottom-up 24-bit DIB plane (8·3 = 24-byte
    * rows, already 4-aligned). Content is seeded like the image/audio
    * corpora: 4 consecutive doc_ids share a source VIDEO (seed =
    * doc_id div 4); gray of GLOBAL pixel g = frame g div 64, offset
    * g % 64 is byte g%16 of md5(seed || '_' || g div 16), r=g=b; each
    * doc perturbs exactly ONE pixel (+128 mod 256 at g = doc_id % 256)
    * — so same-seed videos differ in at most one frame's hash each,
    * the shape a temporal near-dup must catch. An external oracle
    * recomputes every pixel from the formula without RIFF parsing.
    * Partition-wise JVM builder (16 md5 digests per row), zero shuffle
    * — see [[appendPayload]] for why this is not an expression tree. */
  def encodeAvi(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def le(v: Int, bytes: Int): String =
      (0 until bytes).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
    def ascii(s: String): String = s.getBytes("US-ASCII").map("%02X".format(_)).mkString
    val frameBytes = 8 * 8 * 3 // 24-byte rows, 4-aligned: no stride pad
    val nFrames = 4
    // BITMAPINFOHEADER (strf body): 8×8, 24bpp, BI_RGB.
    val strfHex = ascii("strf") + le(40, 4) +
      le(40, 4) + le(8, 4) + le(8, 4) + le(1, 2) + le(24, 2) +
      le(0, 4) + le(frameBytes, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
    // AVIStreamHeader (strh body): 'vids' handled by 'DIB ', 25 fps
    // (rate/scale), 4 frames, rcFrame = (0,0,8,8) as four int16s.
    val strhHex = ascii("strh") + le(56, 4) +
      ascii("vids") + ascii("DIB ") + le(0, 4) + le(0, 2) + le(0, 2) +
      le(0, 4) + le(1, 4) + le(25, 4) + le(0, 4) + le(nFrames, 4) +
      le(frameBytes, 4) + le(0, 4) + le(0, 4) +
      le(0, 2) + le(0, 2) + le(8, 2) + le(8, 2)
    val strlHex = ascii("LIST") + le(4 + 64 + 48, 4) + ascii("strl") +
      strhHex + strfHex
    // MainAVIHeader (avih body): 40000 µs/frame (25 fps), 1 stream,
    // dwTotalFrames = 4, 8×8 — the decoder cross-checks this count
    // against the movi chunk walk.
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
    val header = hexToBytes(headerHex)
    val frameChunkHdr = hexToBytes(ascii("00db") + le(frameBytes, 4))
    appendPayload(df, idCol) { (md, id) =>
      val out = new Array[Byte](header.length + nFrames * (frameChunkHdr.length + frameBytes))
      System.arraycopy(header, 0, out, 0, header.length)
      // 16 md5 digests per row (one per 16-pixel block: 4 frames × 4).
      val dig = Array.tabulate(16)(b => seedBlock(md, id / 4, b))
      val perturbed = (id % 256).toInt
      var f = 0
      var o = header.length
      while (f < nFrames) {
        System.arraycopy(frameChunkHdr, 0, out, o, frameChunkHdr.length)
        o += frameChunkHdr.length
        // Each frame stored bottom-up (stored row sr = logical row
        // 7-sr), three identical channel bytes per pixel.
        var sr = 0
        while (sr < 8) {
          val r = 7 - sr
          var c = 0
          while (c < 8) {
            val g = f * 64 + r * 8 + c
            var v = dig(g / 16)(g % 16) & 0xff
            if (g == perturbed) v = (v + 128) % 256
            out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
            o += 3
            c += 1
          }
          sr += 1
        }
        f += 1
      }
      out
    }
  }

  /** Partition-wise RIFF AVI decode — pure JVM, no codec library: walks
    * the top-level chunk list, descends LIST('hdrl') → LIST('strl') for
    * the stream headers (requires one 'vids' stream handled as raw
    * 'DIB ', 24-bit uncompressed via the strf BITMAPINFOHEADER), then
    * walks LIST('movi') extracting each '00db' frame — a bottom-up
    * stride-padded DIB plane decoded to integer luma exactly like the
    * BMP path. One output ROW PER FRAME: (doc_id, frame_idx, width,
    * height, gray in logical top-down order). Declared-size validation
    * on every chunk (the WAV lesson: corrupt sizes fail loudly, never
    * AIOOBE or a non-advancing loop); the avih dwTotalFrames count is
    * cross-checked against the movi walk. Narrow mapPartitions — no
    * shuffle, scales with input splits. */
  /** Pure-JVM RIFF/AVI chunk walk → (width, height, grayscale frames).
    * Hoisted out of [[decodeAviFrames]]'s closure so the fuzz harness
    * (CodecFuzzSpec) can drive it directly with mutated payloads; every
    * corrupt shape must die in a `require`, never an AIOOBE or a
    * non-advancing loop. */
  private[llm] def aviGrayFrames(p: Array[Byte]): (Int, Int, Seq[Array[Int]]) = {
    def le32(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def tag(off: Int): String = new String(p, off, 4, "US-ASCII")
    require(p.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "not a RIFF/AVI payload")
    var declaredFrames = -1
    var w = -1; var h = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def checkedSize(off: Int): Int = {
      val sz = le32(off + 4)
      require(sz >= 0 && off + 8 + sz.toLong <= p.length,
        s"corrupt RIFF chunk '${tag(off)}' at byte $off: declared size " +
          s"$sz exceeds payload (${p.length} bytes)")
      sz
    }
    // walk(from, to): iterate sibling chunks, descending into the LIST
    // types that matter (hdrl/strl/movi).
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id4 = tag(off); val sz = checkedSize(off)
        if (id4 == "LIST" && sz >= 4) {
          tag(off + 8) match {
            case "hdrl" | "strl" => walk(off + 12, off + 8 + sz)
            case "movi" => walk(off + 12, off + 8 + sz)
            case _ => // INFO etc: opaque
          }
        } else id4 match {
          case "avih" =>
            require(sz >= 40, s"short avih chunk ($sz bytes)")
            declaredFrames = le32(off + 8 + 16)
            require(le32(off + 8 + 24) == 1,
              "only single-stream AVI supported")
          case "strh" =>
            require(sz >= 8, s"short strh chunk ($sz bytes)")
            val fcc = tag(off + 8); val handler = tag(off + 12)
            require(fcc == "vids" && (handler == "DIB " || handler == "    "),
              s"only uncompressed 'vids'/'DIB ' streams supported " +
                s"(got '$fcc'/'$handler')")
          case "strf" =>
            require(sz >= 40, s"short strf chunk ($sz bytes)")
            w = le32(off + 8 + 4); h = le32(off + 8 + 8)
            val bpp = le16(off + 8 + 14); val compression = le32(off + 8 + 16)
            require(bpp == 24 && compression == 0,
              s"only 24-bit uncompressed DIB frames supported " +
                s"(bpp=$bpp, compression=$compression)")
            require(w > 0 && h > 0, s"bad frame dimensions ${w}x$h")
          case "00db" =>
            require(w > 0 && h > 0, "frame chunk before stream format")
            // Long stride: a fuzzed strf width near 2^30 overflows the
            // Int product, and an overflowed stride*h could collide with
            // a corrupted sz and pass (CodecFuzzSpec hardening).
            val stride = ((w.toLong * 3 + 3) / 4) * 4
            require(sz.toLong == stride * h,
              s"frame chunk size $sz != ${stride * h} (${w}x$h stride $stride)")
            frames += java.util.Arrays.copyOfRange(p, off + 8, off + 8 + sz)
          case _ => // JUNK / idx1 / unknown: opaque
        }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, 8 + checkedSize(0))
    require(declaredFrames == frames.length,
      s"avih declares $declaredFrames frames, movi carries ${frames.length}")
    val grays = frames.toSeq.map { plane =>
      val stride = ((w * 3 + 3) / 4) * 4
      val gray = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val srcRow = h - 1 - y // DIB planes are bottom-up
        var x = 0
        while (x < w) {
          val o = srcRow * stride + 3 * x
          val b = plane(o) & 0xff
          val g = plane(o + 1) & 0xff
          val r = plane(o + 2) & 0xff
          gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      gray
    }
    (w, h, grays)
  }

  def decodeAviFrames(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val (w, h, grays) = aviGrayFrames(p)
        grays.iterator.zipWithIndex.map { case (gray, idx) => (id, idx, w, h, gray) }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "gray")
  }

  // ------------------------------------------------------------------
  // PNG — a REAL COMPRESSED codec, pure JVM. zlib ships in the JDK
  // (java.util.zip.Deflater/Inflater), so PNG needs no external codec
  // library: signature + big-endian chunk frames (length/type/data/
  // CRC32), IHDR, zlib-deflated IDAT scanlines, per-scanline filter
  // types 0-4 (None/Sub/Up/Average/Paeth per the PNG spec). This is
  // the compressed tier the decodeStub note said the container could
  // not ship — for PNG it can, so the stub now stands in only for
  // formats whose codecs genuinely are not in the JDK (JPEG/H.264).
  // ------------------------------------------------------------------

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** a=left, b=up, c=up-left — the PNG spec's Paeth predictor. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** One PNG chunk: BE length, 4-byte type, data, CRC32(type||data). */
  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(t.length == 4, s"bad chunk tag $tag")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
    out.array()
  }

  /** Build a REAL 8×8 truecolor (color type 2) PNG per row — the full
    * compressed path: formula pixels → per-scanline FILTER (type
    * (doc_id + row) % 5, so all five PNG filters are load-bearing in
    * every image) → one zlib-deflated IDAT → CRC32-framed chunks. Same
    * near-dup corpus structure as [[encodeBmpGray8x8]] but in a
    * DISTINCT seed namespace so the two corpora don't alias: gray of
    * logical pixel j = byte j%16 of md5('p' || doc_id div 4 || '_' ||
    * j div 16), +128 mod 256 at j = doc_id % 64; r=g=b. The oracle
    * replays pixels from that formula without any PNG parsing, so an
    * encode/decode bug anywhere in the deflate→inflate→unfilter
    * round-trip breaks pixel equality downstream. Per-partition
    * MessageDigest + Deflater (reset per row), narrow mapPartitions. */
  def encodePng8x8(spark: SparkSession, df: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val defl = new java.util.zip.Deflater()
        ids.map { id =>
          val seed = id / 4
          val gray = new Array[Int](64)
          var b = 0
          while (b < 4) {
            md.reset()
            val digest = md.digest(s"p${seed}_$b"
              .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            var k = 0
            while (k < 16) { gray(b * 16 + k) = digest(k) & 0xff; k += 1 }
            b += 1
          }
          val perturbed = (id % 64).toInt
          gray(perturbed) = (gray(perturbed) + 128) % 256
          // Scanlines: filter byte + 24 RGB bytes, filtered per spec.
          val w = 8; val h = 8; val bpp = 3
          val raw = Array.tabulate(h, w * bpp)((r, i) => gray(r * w + i / bpp))
          val scan = new Array[Byte](h * (1 + w * bpp))
          var r = 0
          while (r < h) {
            val f = ((id + r) % 5).toInt
            scan(r * 25) = f.toByte
            var i = 0
            while (i < w * bpp) {
              val cur = raw(r)(i)
              val left = if (i >= bpp) raw(r)(i - bpp) else 0
              val up = if (r > 0) raw(r - 1)(i) else 0
              val upLeft = if (r > 0 && i >= bpp) raw(r - 1)(i - bpp) else 0
              val v = f match {
                case 0 => cur
                case 1 => cur - left
                case 2 => cur - up
                case 3 => cur - (left + up) / 2
                case 4 => cur - paeth(left, up, upLeft)
              }
              scan(r * 25 + 1 + i) = (v & 0xff).toByte
              i += 1
            }
            r += 1
          }
          defl.reset()
          defl.setInput(scan)
          defl.finish()
          val buf = new Array[Byte](scan.length + 64)
          val n = defl.deflate(buf)
          require(defl.finished(), "deflate buffer too small for 8x8 scanlines")
          val ihdr = java.nio.ByteBuffer.allocate(13)
            .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
            .put(0.toByte).put(0.toByte).put(0.toByte).array()
          val payload = PngSig ++ pngChunk("IHDR", ihdr) ++
            pngChunk("IDAT", buf.take(n)) ++ pngChunk("IEND", Array.emptyByteArray)
          (id, payload)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Full PNG decode to top-down RGB bytes — signature check, BE chunk
    * walk with declared-size validation BEFORE dispatch (the WAV
    * chunk-walk lesson: a corrupt length must fail loudly, never AIOOBE
    * or loop) and CRC32 verification of every chunk, IHDR field
    * validation (8-bit truecolor, deflate, filter method 0, no
    * interlace), multi-IDAT zlib inflate to the exact scanline length,
    * and per-scanline UNFILTER of all five PNG filter types. */
  private[llm] def pngPixelsTopDown(p: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(p.length >= 8 && PngSig.indices.forall(i => p(i) == PngSig(i)),
      "not a PNG payload")
    def be32(off: Int): Int =
      ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
    var off = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= p.length, s"truncated PNG chunk header at byte $off")
      val len = be32(off)
      val tag = new String(p, off + 4, 4, "US-ASCII")
      require(len >= 0 && off + 12L + len <= p.length,
        s"corrupt PNG chunk '$tag' at byte $off: declared size $len " +
          s"exceeds payload (${p.length} bytes)")
      val crc = new java.util.zip.CRC32()
      crc.update(p, off + 4, 4 + len)
      require(crc.getValue.toInt == be32(off + 8 + len),
        s"PNG chunk '$tag' at byte $off fails CRC32")
      tag match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len != 13")
          w = be32(off + 8); h = be32(off + 12)
          val (depth, color) = (p(off + 16) & 0xff, p(off + 17) & 0xff)
          val (comp, filt, inter) =
            (p(off + 18) & 0xff, p(off + 19) & 0xff, p(off + 20) & 0xff)
          require(depth == 8 && color == 2,
            s"only 8-bit truecolor PNG supported (depth=$depth, color=$color)")
          require(comp == 0 && filt == 0 && inter == 0,
            s"unsupported PNG compression/filter/interlace ($comp/$filt/$inter)")
          require(w > 0 && h > 0, s"bad PNG dimensions ${w}x$h")
        case "IDAT" =>
          require(w > 0, "IDAT before IHDR")
          idat.write(p, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped, CRC still verified
      }
      off += 12 + len
    }
    require(w > 0 && idat.size() > 0, "missing IHDR/IDAT chunk")
    val bpp = 3
    val rowLen = 1 + w * bpp
    val scan = new Array[Byte](h * rowLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < scan.length && !inf.finished()) {
      val n = inf.inflate(scan, got, scan.length - got)
      require(n > 0 || inf.finished(), "truncated PNG IDAT stream")
      got += n
    }
    require(got == scan.length && (inf.finished() ||
        inf.inflate(new Array[Byte](1)) == 0 && inf.finished()),
      s"PNG IDAT inflates to $got bytes, expected ${scan.length}")
    inf.end()
    val pixels = new Array[Byte](h * w * bpp)
    var r = 0
    while (r < h) {
      val f = scan(r * rowLen) & 0xff
      require(f <= 4, s"bad PNG filter type $f on scanline $r")
      var i = 0
      while (i < w * bpp) {
        val x = scan(r * rowLen + 1 + i) & 0xff
        val left = if (i >= bpp) pixels(r * w * bpp + i - bpp) & 0xff else 0
        val up = if (r > 0) pixels((r - 1) * w * bpp + i) & 0xff else 0
        val upLeft =
          if (r > 0 && i >= bpp) pixels((r - 1) * w * bpp + i - bpp) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => x + paeth(left, up, upLeft)
        }
        pixels(r * w * bpp + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    (w, h, pixels)
  }

  /** Partition-wise PNG decode to GRAYSCALE — the compressed-format
    * sibling of [[decodeBmpGray]]: full inflate + unfilter via
    * [[pngPixelsTopDown]], then integer luma (299·R + 587·G + 114·B)
    * div 1000 (PNG stores RGB, not BGR). Narrow mapPartitions, no
    * shuffle; scales with input splits. */
  def decodePngGray(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h, px) = pngPixelsTopDown(payload)
          val gray = new Array[Int](w * h)
          var i = 0
          while (i < gray.length) {
            val r = px(3 * i) & 0xff
            val g = px(3 * i + 1) & 0xff
            val b = px(3 * i + 2) & 0xff
            gray(i) = (299 * r + 587 * g + 114 * b) / 1000
            i += 1
          }
          (id, w, h, gray)
        }
      }
      .toDF("doc_id", "width", "height", "gray")
  }

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
