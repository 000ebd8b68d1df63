package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, with decode/feature-extract as a batched per-partition stage.
  *
  * The Spark-side mechanics are real and tested — schema, partition-sized
  * batching, column pruning around the binary blob. The codec itself is a
  * STUB (this container ships no image/audio libraries): `decodeStub`
  * derives deterministic fake dimensions/features from the payload bytes.
  * Swapping in a real decoder means replacing ONLY the marked function body
  * with JNI/opencv/ffmpeg calls — the distributed shape stays identical.
  *
  * Scale notes: the payload column stays out of every projection until the
  * decode stage (Parquet column pruning — metadata queries never read
  * blobs); decode runs as mapPartitions so per-batch library init (model
  * load, codec contexts) amortizes across a whole partition, the same
  * economics as Arrow-batched pandas UDFs on PySpark.
  */
object Multimodal {

  /** Pack a text column as a binary payload with typed metadata — the shape
    * an image/audio table has: (id, media_type, payload, n_bytes). */
  def packBinary(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      lit("text/plain").as("media_type"),
      col(textCol).cast(BinaryType).as("payload"),
      octet_length(col(textCol)).as("n_bytes"))

  /** Frame-sample: treat the payload as fixed-size frames and keep every
    * k-th one — the video/audio sampling shape with positional slicing
    * standing in for the codec (a real decoder replaces the substring with
    * frame extraction; the explosion, pruning, and per-frame digest
    * plumbing stay identical). The blob column is pruned until this stage;
    * the output carries a digest per sampled frame, not the bytes, so
    * downstream stats never re-ship media. */
  def sampleFrames(packed: DataFrame, frameBytes: Int = 64, every: Int = 4,
                   idCol: String = "doc_id"): DataFrame = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    packed.select(col(idCol), col("payload"))
      .withColumn("n_frames",
        ceil(octet_length(col("payload")) / lit(frameBytes.toDouble)).cast(IntegerType))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(every))))
      .select(col(idCol), col("frame_idx"), col("n_frames"),
        md5(col("payload").substr(col("frame_idx") * frameBytes + 1,
          lit(frameBytes))).as("frame_md5"))
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** Decode + feature-extract. STUB CODEC: real deployments replace the body
    * of `decodeOne` below; everything around it (batching, schema, pruning)
    * is production-shaped. */
  def decodeStub(packed: DataFrame): DataFrame = {
    val out = packed.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        // ---- per-partition init happens here (codec/model load) ----
        def decodeOne(id: Long, payload: Array[Byte]): Row = {
          // STUB: deterministic fake decode derived from the bytes.
          // Real impl: image/audio decode + embedding extraction.
          val n = payload.length
          val width = 1 + (n % 640)
          val height = 1 + ((n / 640) % 480)
          val features = Array.tabulate(8) { i =>
            var acc = 0L
            var j = i
            while (j < n) { acc = (acc * 31 + (payload(j) & 0xff)) & 0xffffff; j += 8 }
            acc.toDouble / 0xffffff.toDouble
          }
          Row(id, width, height, n, features)
        }
        it.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(RowEncoder.encoderFor(decodedSchema))
    out.toDF()
  }
}
