package graft.operators

import graft.model.Doc
import graft.util.Det
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media spans are opaque references /
  * binary payloads with typed metadata. The Spark-side machinery —
  * schema, partition-local batch decode, metadata extraction — is
  * real; the actual pixel/sample decode is a STUB (deterministic fake
  * from the media_ref hash), because no image/audio libraries exist in
  * this container. Swap `stubDecode` for a real decoder (e.g. via
  * mapInPandas/ImageIO) without touching the surrounding plan.
  */
object Multimodal {

  case class MediaMeta(
      doc_id: String,
      media_ref: String,
      offset: Int,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      payload_bytes: Long)

  /** STUB decode: deterministic fake metadata derived from media_ref.
    * Marked clearly — replace with a real decoder off-sandbox.
    */
  def stubDecode(mediaRef: String): (String, Int, Int, Int, Long) = {
    val h = Det.hashStr(mediaRef)
    val fmt = Seq("jpeg", "png", "webm", "wav")(Det.bounded(h, 4))
    val w = 64 + Det.bounded(Det.mix64(h ^ 1), 1920)
    val ht = 64 + Det.bounded(Det.mix64(h ^ 2), 1080)
    val frames = if (fmt == "webm") 1 + Det.bounded(Det.mix64(h ^ 3), 300) else 1
    val bytes = w.toLong * ht * (if (fmt == "wav") 2 else 3) * frames / 8
    (fmt, w, ht, frames, bytes)
  }

  /** Extract media spans and "decode" them partition-locally — the
    * decode batch shape a real pipeline would use (amortized setup in
    * mapPartitions; one output row per media span).
    */
  def mediaMeta(docs: Dataset[Doc]): Dataset[MediaMeta] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      // real decoder setup would happen once per partition here
      it.flatMap { d =>
        d.spans.iterator
          .filter(s => s.kind == "media" && s.media_ref != null)
          .map { s =>
            val (fmt, w, h, frames, bytes) = stubDecode(s.media_ref)
            MediaMeta(d.doc_id, s.media_ref, s.offset, fmt, w, h, frames, bytes)
          }
      }
    }
  }

  /** Frame-sampling plan for multi-frame media: every `everyN`th frame
    * index (always including frame 0) as one work-unit row. Pure
    * Catalyst (`explode(sequence(...))`) — at scale the sampling
    * decision happens on METADATA, before any pixel decode, so the
    * decoder fleet receives exactly the (media_ref, frame_idx) units
    * it must touch and nothing else. ts_ms uses the stub 25 fps
    * timebase.
    */
  def frameSample(meta: Dataset[MediaMeta], everyN: Int): DataFrame =
    meta.toDF()
      .filter(col("n_frames") > 1)
      .select(col("doc_id"), col("media_ref"), col("format"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))
      .withColumn("ts_ms", col("frame_idx") * lit(40))

  /** Aspect-preserving resize plan: target geometry is pure arithmetic
    * over decoded metadata (never upscale). The actual pixel resample
    * belongs to the same batched decoder stage as stubDecode — this op
    * only plans it, which is all the cluster-side query has to do.
    */
  def resizePlan(meta: Dataset[MediaMeta], maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim.toDouble) / col("width"),
      lit(maxDim.toDouble) / col("height"),
      lit(1.0))
    meta.toDF().select(col("media_ref"), col("format"),
      col("width"), col("height"),
      ceil(col("width") * scale).cast("int").as("out_w"),
      ceil(col("height") * scale).cast("int").as("out_h"))
  }

  /** STUB media feature extractor: deterministic fake k-dim embedding
    * from the media_ref hash, produced in the mapPartitions batch shape
    * a real (CLIP-ish) extractor uses — model setup once per partition,
    * then batched inference over the iterator. Swap the inner function
    * for a real encoder without touching the plan.
    */
  def mediaFeatures(meta: Dataset[MediaMeta], k: Int = 8): DataFrame = {
    import meta.sparkSession.implicits._
    meta.mapPartitions { it =>
      // real encoder weights would load once per partition here
      it.map { m =>
        val h = Det.hashStr(m.media_ref)
        val feat = Array.tabulate(k)(j =>
          (Det.bounded(Det.mix(h, j.toLong), 2001) - 1000) / 1000.0)
        (m.doc_id, m.media_ref, m.format, feat)
      }
    }.toDF("doc_id", "media_ref", "format", "feat")
  }

  /** Per-format media stats (the aggregation a curation pipeline runs). */
  def mediaStats(docs: Dataset[Doc]): DataFrame = {
    mediaMeta(docs).groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("payload_bytes")).as("total_bytes"),
        round(avg(col("width")), 2).as("avg_width"))
      .orderBy(col("format"))
  }
}
