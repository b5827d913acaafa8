package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial codec fuzz (r13 verdict item 8, stretch): the pure-JVM
  * decoders (BMP, WAV, AVI, PNG) under GENERATED corruption — truncation
  * at any offset, single-byte bit flips, and 4-byte length-field
  * overwrites at any aligned offset. The contract under fuzz: a mutated
  * payload either still decodes (many mutations are harmless — ancillary
  * bytes, pixel data) or dies in a LOUD `require`
  * (IllegalArgumentException with a message naming the corruption) —
  * NEVER an ArrayIndexOutOfBounds, NegativeArraySize, zip/DataFormat
  * error, OOM-sized allocation, or a non-advancing chunk-walk hang.
  *
  * This is the ingest-robustness story the corrupt-scan gates (s21)
  * opened, closed at the byte level: at 100 TB a crawler WILL deliver
  * every one of these shapes, and an executor that AIOOBEs (or spins)
  * on one payload kills the task, the stage, and eventually the job —
  * a `require` is caught by a quarantine wrapper, a VM error is not.
  * The fuzz pass found (and this round fixed) three such windows:
  * Int-overflowing stride math in BMP and AVI for fuzzed dimensions
  * near 2^30, a negative BMP data offset, and WAV fmt field reads past
  * a short chunk at the payload tail.
  *
  * Seeds are the library's own encoders, so the valid-payload control
  * holds by round-trip. The walkers are driven DIRECTLY (wavPcmSamples /
  * aviGrayFrames / bmpPixelsTopDown / pngPixelsTopDown — hoisted from
  * the mapPartitions closures for exactly this purpose), so thousands of
  * cases cost milliseconds, not Spark jobs. Deterministic seeds (the
  * repo-standard manual Gen driver — no scalatestplus bridge in the
  * offline cache) make every failure reproducible by case index.
  */
class CodecFuzzSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  // ---- seed payloads from the library's own encoders ------------------
  private def payloadsOf(df: org.apache.spark.sql.DataFrame): Seq[Array[Byte]] =
    df.select(col("doc_id"), col("payload")).orderBy("doc_id")
      .collect().map(_.getAs[Array[Byte]]("payload")).toSeq

  private lazy val bmpSeeds: Seq[Array[Byte]] = {
    import spark.implicits._
    payloadsOf(Multimodal.encodeBmpGrayVar(Seq(1L, 7L, 42L).toDF("doc_id")))
  }
  private lazy val wavSeeds: Seq[Array[Byte]] = {
    import spark.implicits._
    payloadsOf(Multimodal.encodeWavPcm(Seq(1L, 7L, 42L).toDF("doc_id")))
  }
  private lazy val aviSeeds: Seq[Array[Byte]] = {
    import spark.implicits._
    payloadsOf(Multimodal.encodeAvi(Seq(1L, 7L, 42L).toDF("doc_id")))
  }
  private lazy val pngSeeds: Seq[Array[Byte]] = {
    import spark.implicits._
    payloadsOf(Multimodal.encodePng8x8(spark, Seq(1L, 7L, 42L).toDF("doc_id")))
  }

  // ---- mutations -------------------------------------------------------
  private sealed trait Mut { def apply(p: Array[Byte]): Array[Byte] }
  private case class Truncate(at: Int) extends Mut {
    def apply(p: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOfRange(p, 0, math.min(at, p.length))
  }
  private case class FlipByte(off: Int, mask: Int) extends Mut {
    def apply(p: Array[Byte]): Array[Byte] = {
      val q = p.clone(); val i = off % q.length
      q(i) = (q(i) ^ (mask | 1)).toByte; q
    }
  }
  private case class Stamp32(off: Int, value: Int) extends Mut {
    // Overwrites a 4-byte window — aimed at length/size/dimension fields
    // (huge, negative, zero, off-by-one are all reachable via `value`).
    def apply(p: Array[Byte]): Array[Byte] = {
      val q = p.clone(); val i = off % math.max(1, q.length - 4)
      q(i) = (value & 0xff).toByte
      q(i + 1) = ((value >> 8) & 0xff).toByte
      q(i + 2) = ((value >> 16) & 0xff).toByte
      q(i + 3) = ((value >> 24) & 0xff).toByte
      q
    }
  }

  private def mutGen(maxLen: Int): Gen[Mut] = Gen.oneOf(
    Gen.choose(0, maxLen).map(Truncate),
    for { o <- Gen.choose(0, maxLen - 1); m <- Gen.choose(1, 255) }
      yield FlipByte(o, m),
    for {
      o <- Gen.choose(0, math.max(0, maxLen - 5))
      v <- Gen.oneOf(Gen.oneOf(0, 1, -1, 44, 0x7fffffff, 0x40000000,
        0x80000000, 0xffffff), Gen.choose(Int.MinValue, Int.MaxValue))
    } yield Stamp32(o, v))

  private val N = 3000 // mutated cases per decoder; byte-level, runs in ms

  /** The fuzz contract: decode returns, or throws the loud reject. */
  private def fuzz[A](name: String, decode: Array[Byte] => A,
      seeds: Seq[Array[Byte]]): Unit = {
    val gen = for {
      s <- Gen.choose(0, seeds.size - 1)
      m <- mutGen(seeds(s).length)
    } yield (s, m)
    var decoded = 0; var rejected = 0
    val failures = scala.collection.mutable.ListBuffer[String]()
    (0 until N).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (s, m) =>
        val mutated = m(seeds(s))
        try { decode(mutated); decoded += 1 }
        catch {
          case _: IllegalArgumentException => rejected += 1 // the contract
          case e: Throwable =>
            failures += s"case $i: ${e.getClass.getName}: ${e.getMessage} " +
              s"on $m of seed $s (len ${mutated.length})"
        }
      }
    }
    assert(failures.isEmpty,
      s"$name: ${failures.size} non-require failures; first 5:\n" +
        failures.take(5).mkString("\n"))
    // Both contract branches must be exercised, or the fuzz proves nothing.
    assert(rejected > 0, s"$name: no mutation was ever rejected")
    assert(decoded > 0, s"$name: no mutation ever still decoded")
  }

  test("valid seed payloads decode (fuzz control)") {
    bmpSeeds.foreach(p => Multimodal.bmpPixelsTopDown(p))
    wavSeeds.foreach(p => assert(Multimodal.wavPcmSamples(p)._2.length === 128))
    aviSeeds.foreach(p => assert(Multimodal.aviGrayFrames(p)._3.size === 4))
    pngSeeds.foreach(p => Multimodal.pngPixelsTopDown(p))
  }

  test("BMP decoder under fuzz: decode or loud require, never a VM error") {
    fuzz("bmp", Multimodal.bmpPixelsTopDown, bmpSeeds)
  }

  test("WAV decoder under fuzz: decode or loud require, never a VM error") {
    fuzz("wav", Multimodal.wavPcmSamples, wavSeeds)
  }

  test("AVI decoder under fuzz: decode or loud require, never a VM error") {
    fuzz("avi", Multimodal.aviGrayFrames, aviSeeds)
  }

  test("PNG decoder under fuzz: decode or loud require, never a VM error " +
      "(CRC32 armors every frame against silent corruption)") {
    fuzz("png", Multimodal.pngPixelsTopDown, pngSeeds)
  }

  test("targeted overflow shapes reject loudly (the fuzz classes that bit: " +
      "huge dimensions overflowing Int stride math, short fmt at tail)") {
    // BMP with w = 2^30: Int stride would go negative; must require-fail.
    intercept[IllegalArgumentException](
      Multimodal.bmpPixelsTopDown(Stamp32(18, 0x40000000)(bmpSeeds.head)))
    // BMP with a negative data offset.
    intercept[IllegalArgumentException](
      Multimodal.bmpPixelsTopDown(Stamp32(10, -2000000000)(bmpSeeds.head)))
    // WAV whose fmt chunk declares 4 bytes right at the payload tail: the
    // fmt field reads would run past the buffer without the sz guard.
    val shortFmt = java.util.Arrays.copyOfRange(wavSeeds.head, 0, 24)
    val le = java.nio.ByteBuffer.wrap(shortFmt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    le.putInt(4, 16) // RIFF size → spans exactly this truncated buffer
    le.putInt(16, 4) // fmt size 4: header fits, field reads would not
    intercept[IllegalArgumentException](Multimodal.wavPcmSamples(shortFmt))
  }
}
