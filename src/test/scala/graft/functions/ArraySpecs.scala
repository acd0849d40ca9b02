package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(Array(10.0, 2.0, 3.0, 4.0, 5.0, 1.0, 9.0, 8.0)).toDF("e")

  test("at/bandRatio are 0-based and zero-denominator-safe") {
    df.select(Spectral.at(col("e"), 0)).as[Double].collect()(0) shouldBe 10.0
    df.select(Spectral.bandRatio(col("e"), 0, 4)).as[Double].collect()(0) shouldBe 2.0
    val z = Seq(Array(1.0, 0.0)).toDF("e")
      .select(Spectral.bandRatio(col("e"), 0, 1)).as[Option[Double]].collect()(0)
    z shouldBe None
  }

  test("median3 takes the middle of the 3-window centered at i") {
    // window centered at index 2 (0-based): (2.0, 3.0, 4.0) -> 3.0
    df.select(Spectral.median3(col("e"), 2)).as[Double].collect()(0) shouldBe 3.0
    // window centered at 6: (1.0, 9.0, 8.0) -> 8.0
    df.select(Spectral.median3(col("e"), 6)).as[Double].collect()(0) shouldBe 8.0
  }

  test("median3 truncated edge windows use numpy median semantics") {
    val d2 = Seq(Array(4.0, 1.0, 3.0)).toDF("e")
    // center 0: window (4,1) -> mean 2.5 (and no illegal slice(a,0,3))
    d2.select(Spectral.median3(col("e"), 0)).as[Double].collect()(0) shouldBe 2.5
    // center = last index: window (1,3) -> mean 2.0
    d2.select(Spectral.median3(col("e"), 2)).as[Double].collect()(0) shouldBe 2.0
    // single element
    Seq(Array(7.0)).toDF("e")
      .select(Spectral.median3(col("e"), 0)).as[Double].collect()(0) shouldBe 7.0
  }

  test("nearestIndex and the named OPTAA bundle resolve wavelength targets") {
    val wl = (400 to 750 by 2).map(_.toDouble)
    Spectral.nearestIndex(wl, 412.0) shouldBe 6
    Spectral.nearestIndex(wl, 441.0) shouldBe 20 // 440 closer than 442
    val n = wl.length
    val aSpec = Array.tabulate(n)(i => 1.0 + i * 0.01)
    val cSpec = Array.tabulate(n)(i => 2.0 + i * 0.01)
    val df = Seq((aSpec, cSpec)).toDF("a", "c")
    val prods = Spectral.opticalProducts(col("a"), col("c"), wl)
    prods.map(_._1) shouldBe Seq("ratio_412_440", "ratio_443_440", "chl_line_height", "poc")
    val r = df.select(prods.map { case (nme, cl) => cl.as(nme) }: _*)
      .as[(Double, Double, Double, Double)].collect()(0)
    r._1 shouldBe (aSpec(6) / aSpec(20)) +- 1e-12
    // reference baseline fraction is the NOMINAL (676-650)/(715-650) = 0.4,
    // not the index fraction: on this 2 nm grid (715 resolves to 714) a
    // linear-in-index spectrum leaves a small positive residual
    val (i650, i676, i715) = (Spectral.nearestIndex(wl, 650.0),
      Spectral.nearestIndex(wl, 676.0), Spectral.nearestIndex(wl, 715.0))
    val expectedLh = aSpec(i676) -
      (aSpec(i650) + (aSpec(i715) - aSpec(i650)) * ((676.0 - 650.0) / (715.0 - 650.0)))
    r._3 shouldBe expectedLh +- 1e-9
    r._4 shouldBe (cSpec(Spectral.nearestIndex(wl, 660.0)) * 381.0) +- 1e-9
  }

  test("lineHeight subtracts the nominal-wavelength-interpolated baseline") {
    // medians: @1=(10,2,3)->3; @2=(2,3,4)->3; @3=(3,4,5)->4
    // baseline at peak between lo and hi: 3 + (4-3)*(676-650)/(715-650) = 3.4
    df.select(Spectral.lineHeight(col("e"), 1, 2, 3, 650.0, 676.0, 715.0))
      .as[Double].collect()(0) shouldBe -0.4 +- 1e-12
  }
}

class ArrayTestsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    Array(1.0, 2.0, 3.0, 4.0),
    Array(0.0, 0.0, 0.0, 5.0),
    Array(2.0, 2.0, 2.0, 2.0)
  ).toDF("a")

  test("countAbove / voteFail count elements over the threshold") {
    df.select(ArrayTests.countAbove(col("a"), 1.5)).as[Int].collect() shouldBe
      Array(3, 1, 4)
    df.select(ArrayTests.countAbove(col("a"), 1.5, take = 2)).as[Int].collect() shouldBe
      Array(1, 0, 2)
    df.select(ArrayTests.voteFail(col("a"), 1.5, k = 2, take = 4)).as[Boolean].collect() shouldBe
      Array(false, true, false)
  }

  test("anyOutOfRange is exists() over the bounds") {
    df.select(ArrayTests.anyOutOfRange(col("a"), 0.5, 4.5)).as[Boolean].collect() shouldBe
      Array(false, true, false)
  }

  test("arrayStd is the population std; flatSignal thresholds it") {
    val stds = df.select(ArrayTests.arrayStd(col("a"))).as[Double].collect()
    stds(0) shouldBe math.sqrt(1.25) +- 1e-12 // std of 1,2,3,4
    stds(2) shouldBe 0.0 +- 1e-12
    df.select(ArrayTests.flatSignal(col("a"), 0.1)).as[Boolean].collect() shouldBe
      Array(false, false, true)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("attachPayload + decode: binary plumbing with stub fallback features") {
    val docs = Seq((1L, "AB"), (2L, ""), (3L, "hello world")).toDF("doc_id", "text")
    val media = graft.operators.Multimodal.attachPayload(docs, "doc_id", "text")
    media.schema("payload").dataType.typeName shouldBe "binary"
    media.select("meta.n_bytes").as[Int].collect().sorted shouldBe Array(0, 2, 11)
    val feats = graft.operators.Multimodal.decode(media)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, String, Int, Int)].collect()
    feats(0) shouldBe ((1L, 2, 'A'.toInt, 'B'.toInt, "unknown", 2, 2))
    feats(1) shouldBe ((2L, 0, -1, -1, "unknown", 0, 0)) // empty payload -> sentinel
    feats(2)._2 shouldBe 11
  }

  test("decode parses real PNG IHDR and JPEG SOF dimensions from bytes") {
    val docs = Seq((1L, "png", 1920, 1080, "body"), (2L, "jpeg", 640, 480, "x"),
      (3L, "jpeg", 33, 7, ""), (4L, "text", 0, 0, "plain")).toDF("id", "kind", "w", "h", "body")
    val media = docs.select(col("id").as("doc_id"),
      graft.operators.Multimodal.synthImageUdf(
        col("kind"), col("w"), col("h"), col("body")).as("payload"))
    val feats = graft.operators.Multimodal.decode(media)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, String, Int, Int)].collect()
    feats(0) shouldBe ((1L, 37, 0x89, 'y'.toInt, "png", 1920, 1080))
    feats(1) shouldBe ((2L, 15, 0xff, 0xd9, "jpeg", 640, 480))
    feats(2) shouldBe ((3L, 14, 0xff, 0xd9, "jpeg", 33, 7))
    feats(3)._5 shouldBe "unknown"
  }

  test("decodeAudio parses a real WAV header round-trip") {
    val specs = Seq((1L, 1, 8000, 8, 4000), (2L, 2, 44100, 16, 44100),
      (3L, 2, 16000, 8, 1)).toDF("id", "ch", "rate", "bits", "frames")
    val media = specs.select(col("id").as("doc_id"),
      graft.operators.Multimodal.synthWavUdf(
        col("ch"), col("rate"), col("bits"), col("frames")).as("payload"))
    val feats = graft.operators.Multimodal.decodeAudio(media)
      .orderBy("doc_id")
      .as[(Long, Int, String, Int, Int, Int, Long, Double)].collect()
    feats(0) shouldBe ((1L, 44 + 4000, "wav", 1, 8000, 8, 4000L, 0.5))
    feats(1) shouldBe ((2L, 44 + 44100 * 4, "wav", 2, 44100, 16, 44100L, 1.0))
    feats(2) shouldBe ((3L, 46, "wav", 2, 16000, 8, 1L, 1.0 / 16000))
  }

  test("decodeAudioOne walks preceding chunks and rejects non-WAV payloads") {
    import graft.operators.Multimodal
    // hand-build: RIFF/WAVE + a 6-byte JUNK chunk (odd size -> pad byte)
    // before fmt, then data
    val base = Multimodal.synthWavUdf
    val spark2 = spark
    import spark2.implicits._
    val wav = Seq((1, 16000, 16, 10)).toDF("c", "r", "b", "f")
      .select(base(col("c"), col("r"), col("b"), col("f"))).as[Array[Byte]].head()
    val junk = "JUNK".getBytes ++ Array[Byte](5, 0, 0, 0) ++ Array.fill[Byte](6)(0)
    val shifted = wav.take(12) ++ junk ++ wav.drop(12)
    // fix RIFF size irrelevant to the parser; walk must skip JUNK (5 + pad)
    val f = Multimodal.decodeAudioOne(7L, shifted)
    (f.format, f.channels, f.sample_rate, f.bits, f.n_frames) shouldBe
      (("wav", 1, 16000, 16, 10L))
    Multimodal.decodeAudioOne(8L, "notawav".getBytes).format shouldBe "unknown"
    Multimodal.decodeAudioOne(9L, Array.empty[Byte]).format shouldBe "unknown"
    // RIFF/WAVE but truncated before any fmt chunk -> fallback, no crash
    Multimodal.decodeAudioOne(10L, wav.take(12)).format shouldBe "unknown"
    // hostile chunk size (0xFFFFFFFF -> negative as int) must not loop or
    // walk the cursor backwards
    val evil = wav.clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    Multimodal.decodeAudioOne(11L, evil).format shouldBe "unknown"
  }

  test("frameSamplePlan emits k bucket-center samples at the video's fps") {
    val videos = Seq((1L, 10.0, 30)).toDF("video_id", "duration_s", "fps")
    val plan = graft.operators.Multimodal
      .frameSamplePlan(videos, "video_id", "duration_s", "fps", k = 4)
      .orderBy("frame_idx")
      .as[(Long, Int, Double, Long)].collect()
    plan shouldBe Array(
      (1L, 0, 1.25, 37L), (1L, 1, 3.75, 112L),
      (1L, 2, 6.25, 187L), (1L, 3, 8.75, 262L))
  }

  test("parseHumanSizeMb converts KB/MB/GB and rejects unknown units") {
    val df = Seq("512 KB", "1.5 MB", "2 GB", "7 XB").toDF("s")
    val r = df.select(TextFunctions.parseHumanSizeMb(col("s"))).as[Option[Double]].collect()
    r(0).get shouldBe 0.5 +- 1e-12
    r(1).get shouldBe 1.5
    r(2).get shouldBe 2048.0
    r(3) shouldBe None
  }
}
