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
