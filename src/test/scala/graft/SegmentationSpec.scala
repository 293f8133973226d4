package graft

import graft.multimodal.Multimodal

/** Unit coverage for the q246/q247 segmentation primitives: the
  * scene-structured Y4M and VAD WAV generators, and the per-frame
  * decode paths that recover their planted structure from REAL bytes.
  */
class SegmentationSpec extends SparkTestBase {

  test("scene Y4M: decoded luma sums are flat within shots, jump at cuts") {
    for (id <- Seq(0L, 5L, 123L)) {
      val (w, h, sums) = Multimodal.y4mFrameStats(
        Multimodal.sceneY4mPayload(id, 4, 4, 60))
      assert((w, h, sums.length) === (4, 4, 60))
      // restate the planted cut schedule independently of the generator
      val cuts = (1 until 60)
        .filter(f => Multimodal.frameOffset(id * 3 + 1, f) % 5 == 0).toSet
      (1 until 60).foreach { f =>
        if (!cuts.contains(f))
          assert(sums(f) === sums(f - 1), s"id=$id flat shot broke at f=$f")
      }
      // at least one planted cut should move the luma sum (offs differ)
      assert(cuts.exists(f => sums(f) != sums(f - 1)),
        s"id=$id: no cut visible in decoded sums")
    }
  }

  test("VAD WAV: frame energies separate cleanly across the τ=50000 line") {
    for (id <- 0L until 50L) {
      val e = Multimodal.pcmFrameEnergies(
        Multimodal.vadWavPayload(id, 60, 160, 16000), 60)
      (0 until 60).foreach { f =>
        val voiced = Multimodal.frameOffset(id * 7 + 3, f) % 4 != 0
        if (voiced) assert(e(f) > 50000L, s"id=$id voiced f=$f e=${e(f)}")
        else assert(e(f) === 4528L, s"id=$id silent f=$f e=${e(f)}")
      }
    }
  }

  test("pcmFrameEnergies rejects a stream that doesn't frame evenly") {
    intercept[IllegalArgumentException] {
      Multimodal.pcmFrameEnergies(Multimodal.vadWavPayload(1L, 59, 160, 16000), 60)
    }
  }

  test("frame-level decode helpers explode one row per frame") {
    import spark.implicits._
    val pay = Seq(7L, 9L).toDF("doc_id")
      .as[Long]
      .map(id => (id, Multimodal.sceneY4mPayload(id, 4, 4, 60)))
      .toDF("doc_id", "payload")
    val fs = Multimodal.decodeFrameSums(pay, "doc_id", "payload")
    assert(fs.count() === 120)
    assert(fs.columns.toSeq === Seq("id", "f", "e"))
    val wav = Seq(7L).toDF("doc_id").as[Long]
      .map(id => (id, Multimodal.vadWavPayload(id, 60, 160, 16000)))
      .toDF("doc_id", "payload")
    assert(Multimodal.decodeAudioEnergies(wav, "doc_id", "payload", 60)
      .count() === 60)
  }
}
