package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing (SURVEY §2C): media as opaque `binary`
  * payloads + typed metadata structs, with decode / feature-extract /
  * frame-sample stages.
  *
  * The actual image/audio codecs are NOT in this container (builder
  * contract), so the decode step is a clearly-marked deterministic STUB —
  * but everything Spark-side is real and tested: the schema (binary payload
  * + StructType metadata), the partition-preserving `mapPartitions` batch
  * shape (the Scala analog of a `mapInPandas` batched Pandas-UDF decode:
  * rows stream per partition, the codec would be initialized once per
  * partition, output is a fixed-width feature vector), and the downstream
  * columnar ops over the extracted features.
  *
  * Scale: payload bytes never shuffle — metadata/features are projected out
  * and the binary column is pruned from any aggregation. Feature extraction
  * is map-only; per-partition codec init amortizes like a real decoder
  * would.
  */
object Multimodal {

  val FeatureDim = 8

  /** Wrap documents as media rows: payload = utf-8 bytes of text (stand-in
    * for image/audio bytes), meta = typed struct. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("n_chars").cast("long").as("size_bytes"),
        col("lang").as("tag")).as("meta"))

  /** STUB codec: a real implementation would decode image/audio bytes here
    * (per-partition codec init + batched decode). This deterministic fake
    * derives FeatureDim floats from payload byte statistics so the full
    * pipeline is testable without codec libraries. */
  private def stubDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * stage: one "codec" per partition, rows streamed through it. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      // per-partition "codec init" would happen here
      rows.map { r =>
        Row(r.getLong(0), stubDecodeFeatures(r.getAs[Array[Byte]](1)).toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling: every k-th fixed-size chunk of the payload (the video
    * frame-sample shape: offset arithmetic only, no decode). */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    media.select(
      col("media_id"),
      posexplode(transform(
        sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyK)),
        i => substring(col("payload"), i * frameBytes + 1, lit(frameBytes))))
        .as(Seq("frame_idx", "frame_bytes")))
  }

  /** Rows-only driver query (no SQL oracle — binary/stub stage; covered by
    * MultimodalSpec instead): media features + metadata summary. */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = asMedia(Tables.documents(spark, dir))
    val feats = extractFeatures(media)
    media.select(col("media_id"), col("meta.size_bytes").as("size_bytes"), col("meta.tag").as("tag"))
      .join(feats, "media_id")
      .select(col("media_id"), col("size_bytes"), col("tag"),
        round(aggregate(col("features"), lit(0.0), (a, x) => a + x.cast("double")), 4).as("feature_sum"))
      .orderBy("media_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> qMultimodalFeatures
  )

  /** Intentionally empty: binary payload + stub decode are not
    * SQL-expressible; the driver records a rows-only check and
    * MultimodalSpec asserts the semantics. */
  def oracleSql: Map[String, String] = Map.empty
}
