package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.asMedia(graft.Tables.documents(spark, sf))

  test("media schema: binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "size_bytes", "tag"))
  }

  test("byte-lane feature extraction is deterministic and fixed-width") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == Multimodal.FeatureDim))
    assert(f1.nonEmpty)
    // lane semantics: feature j = (exact long sum of bytes at p%dim==j)/255
    val payload0 = media.filter(col("media_id") === 0).head().getAs[Array[Byte]]("payload")
    val expect = Array.tabulate(Multimodal.FeatureDim) { j =>
      payload0.zipWithIndex.collect { case (b, p) if p % Multimodal.FeatureDim == j => (b & 0xff).toLong }
        .sum / 255.0
    }
    assert(f1(0L) == expect.toSeq, s"lane sums diverge: ${f1(0L)} vs ${expect.toSeq}")
  }

  test("feature extraction stays inside whole-stage codegen (no RDD break)") {
    val plan = Multimodal.extractFeatures(media)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("graft_byte_features"), plan)
    assert(!plan.contains("Scan ExistingRDD"), "features must come from a projection, not an RDD:\n" + plan)
    assert(plan.contains("[codegen id"), "projection must be whole-stage codegen'd:\n" + plan)
  }

  test("frame sampling covers the payload in frame-size chunks") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, everyK = 2)
    val r = frames.filter(col("media_id") === 0)
      .orderBy("frame_idx").collect()
    assert(r.nonEmpty)
    // frame 0 = first 16 payload bytes
    val payload0 = media.filter(col("media_id") === 0).head().getAs[Array[Byte]]("payload")
    assert(r(0).getAs[Array[Byte]]("frame_bytes").toSeq == payload0.take(16).toSeq)
  }

  test("q_multimodal_features joins features with metadata per media row") {
    val out = Multimodal.qMultimodalFeatures(spark, sf).collect()
    assert(out.length == media.count())
    assert(out.forall(r => r.getDouble(3) > 0)) // byte sums are positive
  }
}
