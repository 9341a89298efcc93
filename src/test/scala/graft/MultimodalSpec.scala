package graft

import graft.operators.Multimodal
import graft.sources.Corpus
import org.apache.spark.sql.functions._

/** Multimodal plumbing: decode-metadata, frame sampling, resize
  * planning, feature extraction — stub decode, real Spark shapes.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val meta = Multimodal.mediaMeta(Corpus.spansTable(spark, sf)).cache()

  test("media metadata is deterministic and typed") {
    val a = meta.collect().sortBy(m => (m.doc_id, m.offset))
    val b = Multimodal.mediaMeta(Corpus.spansTable(spark, sf))
      .collect().sortBy(m => (m.doc_id, m.offset))
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    assert(a.forall(m => m.width >= 64 && m.height >= 64 && m.n_frames >= 1))
  }

  test("frame sampling: every 30th frame incl. frame 0, metadata-only") {
    val fs = Multimodal.frameSample(meta, 30)
    val perMedia = fs.groupBy($"media_ref", $"n_frames")
      .agg(count(lit(1)).as("n"), min($"frame_idx").as("f0"), max($"frame_idx").as("fmax"))
      .collect()
    assert(perMedia.nonEmpty)
    perMedia.foreach { r =>
      val nFrames = r.getInt(1); val n = r.getLong(2)
      assert(n === (nFrames + 29) / 30, s"media ${r.getString(0)}")
      assert(r.getInt(3) === 0)            // frame 0 always sampled
      assert(r.getInt(4) < nFrames)        // never beyond the last frame
    }
  }

  test("resize plan preserves aspect ratio and never upscales") {
    val rp = Multimodal.resizePlan(meta, 512).collect()
    rp.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(ow <= 512 && oh <= 512)
      assert(ow <= w && oh <= h) // never upscale
      if (w > 512 || h > 512)    // downscaled: same scale factor on both
        assert(math.abs(ow.toDouble / w - oh.toDouble / h) <= 1.0 / w + 1.0 / h,
          s"$w x $h -> $ow x $oh") // ceil adds at most 1px per axis
      else assert(ow === w && oh === h)
    }
  }

  test("mediaContext: nearest PRECEDING media span, null before any media") {
    import graft.model.{Doc, Span}
    import graft.operators.Serialize
    val docs = Seq(
      Doc("dA", Seq(
        Span("text", "s0", null, 0),           // before any media -> null
        Span("media", null, "media://m1", 1),
        Span("text", "s2", null, 2),           // -> m1
        Span("text", "s3", null, 3),           // -> m1 (still nearest preceding)
        Span("media", null, "media://m2", 4),
        Span("text", "s5", null, 5))),         // -> m2
      Doc("dB", Seq(Span("text", "t0", null, 0)))) // no media at all
      .toDS()
    val ctx = Serialize.mediaContext(docs).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> Option(r.getString(2))).toMap
    assert(ctx(("dA", 0)) === None)
    assert(ctx(("dA", 2)) === Some("media://m1"))
    assert(ctx(("dA", 3)) === Some("media://m1"))
    assert(ctx(("dA", 5)) === Some("media://m2"))
    assert(ctx(("dB", 0)) === None)
    assert(ctx.size === 5) // media spans themselves are not rows
  }

  test("quickStatementsWithMedia appends S4656 only under a media span") {
    import graft.model.{Doc, Span}
    import graft.operators.Serialize
    val docs = Corpus.fixtureCorpus(spark, 30)
    val triples = Pipeline.textPath(docs)
    val qs = Serialize.quickStatementsWithMedia(triples, Serialize.mediaContext(docs))
      .collect().map(_.getString(0))
    assert(qs.nonEmpty)
    val withMedia = qs.filter(_.contains("S4656"))
    assert(withMedia.nonEmpty, "fixture corpus plants media spans; some triple must sit under one")
    withMedia.foreach { l =>
      assert(l.matches(""".*\tS854\t"[^"]*"\tS4656\t"media://[^"]*"$"""), l)
    }
    // every line still carries the S854 source reference
    qs.foreach(l => assert(l.contains("\tS854\t"), l))
  }

  test("media features: deterministic, bounded, k-dim") {
    val f = Multimodal.mediaFeatures(meta, 8)
    val rows = f.select($"media_ref", $"feat").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length === 8)
      assert(v.forall(x => x >= -1.0 && x <= 1.0))
    }
    val again = Multimodal.mediaFeatures(meta, 8).select($"media_ref", $"feat")
      .collect().map(r => (r.getString(0), r.getSeq[Double](1))).toMap
    rows.foreach(r => assert(again(r.getString(0)) === r.getSeq[Double](1)))
  }
}
