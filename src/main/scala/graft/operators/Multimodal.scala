package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, with decode/feature-extract as a batched per-partition stage.
  *
  * The codecs are REAL, dependency-free container implementations — PCM
  * WAV ([[packWav]]/[[decodeWav]]) and 24bpp BMP ([[packBmp]]/
  * [[decodeBmp]]) with genuine headers, endianness, row padding and
  * bottom-up storage — so the decode stage parses actual byte structure.
  * Swapping in a heavier codec (JPEG/FLAC via JNI/opencv/ffmpeg) means
  * replacing only the per-row parse inside the same `mapPartitions`; the
  * distributed shape stays identical.
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

  /** m9: scene-change detection over the sampled frame stream — the
    * temporal-structure signal on top of [[sampleFrames]]'s digests:
    * per document, count the sampled-frame transitions where the digest
    * CHANGES (a content cut) and pin the first change index. Runs on
    * digests, never bytes — the blob stays pruned. One window exchange on
    * the doc id, shared with the same-key aggregation (the a14 plan
    * shape); at 100 TB this is a narrow pass over the frame index, not
    * the media. */
  def sceneChanges(frames: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame_idx"))
    frames
      .withColumn("__prev", lag(col("frame_md5"), 1).over(w))
      .withColumn("__chg", when(col("__prev").isNotNull &&
        col("__prev") =!= col("frame_md5"), 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("__chg")).as("n_changes"),
        min(when(col("__chg") === 1L, col("frame_idx"))).as("first_change_idx"))
  }

  // ------------------------------------------------------- WAV codec (real)

  /** Synthesis rule shared by [[packWav]] and its oracle replay: per-doc
    * sample rate in {8000, 16000, 24000} Hz keyed off the doc id, one
    * 16-bit mono PCM sample per ASCII char, centered near zero. */
  private def wavSampleRate(docId: Long): Int = (8000L * (1 + docId % 3)).toInt
  private def wavSample(b: Byte): Int = ((b & 0xff) - 96) * 256

  // shared (id, media_type, payload, n_bytes) shape for every packed container
  private val packedMediaSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("n_bytes", IntegerType)))

  /** Pack each document as a REAL audio container: a canonical 44-byte
    * RIFF/WAVE PCM header plus one little-endian 16-bit mono sample per
    * text char ([[wavSample]]), at a per-doc sample rate ([[wavSampleRate]]).
    * This is the synthesis side of the in-container codec pair — the bytes
    * are a valid WAV file any player could open, so [[decodeWav]] has real
    * structure to parse rather than a byte-fold fake. */
  def packWav(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val out = docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val rate = wavSampleRate(id)
          val dataSize = text.length * 2 // 16-bit mono
          val buf = new java.io.ByteArrayOutputStream(44 + dataSize)
          buf.write("RIFF".getBytes("US-ASCII")); buf.write(le32(36 + dataSize))
          buf.write("WAVE".getBytes("US-ASCII"))
          buf.write("fmt ".getBytes("US-ASCII")); buf.write(le32(16))
          buf.write(le16(1))          // PCM
          buf.write(le16(1))          // mono
          buf.write(le32(rate))
          buf.write(le32(rate * 2))   // byte rate = rate * blockAlign
          buf.write(le16(2))          // blockAlign = channels * bits/8
          buf.write(le16(16))         // bits per sample
          buf.write("data".getBytes("US-ASCII")); buf.write(le32(dataSize))
          text.getBytes("US-ASCII").foreach(b => buf.write(le16(wavSample(b) & 0xffff)))
          val bytes = buf.toByteArray
          Row(id, "audio/wav", bytes, bytes.length)
        }
      }(RowEncoder.encoderFor(packedMediaSchema))
    out.toDF()
  }

  // ---------------- shared little-endian helpers for the container codecs

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  // ------------------------------------------------------- BMP codec (real)

  /** Synthesis rule shared by [[packBmp]] and its oracle replay: per-doc
    * pixel-row width in {6,8,10,12,14} keyed off the doc id (odd strides
    * exercise the 4-byte row padding), one 24bpp pixel per 3 consecutive
    * text bytes in (B,G,R) order, zero-padded past the text. */
  private def bmpWidth(docId: Long): Int = (6 + (docId % 5) * 2).toInt

  /** Dimension cap for decoded containers: 2^26 per axis keeps every
    * downstream stride/offset product far inside Long (and any sane image
    * far inside it) — a hostile header width like 2^30 would otherwise wrap
    * the Int stride negative and slip past the truncation check into a raw
    * ArrayIndexOutOfBounds instead of the contractual doc-id error. */
  private val MaxBmpDim = 1 << 26

  /** Validate a canonical 24bpp bottom-up BMP and return (width, height,
    * stride) — the one parser [[decodeBmp]] and [[resizeBmp]] share, all
    * arithmetic overflow-safe, every rejection carrying the doc id. */
  private def bmpDims(b: Array[Byte], id: Long): (Int, Int, Int) = {
    require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte &&
      u32(b, 10) == 54 && u32(b, 14) == 40,
      s"doc $id: not a canonical BMP payload")
    val wL = u32(b, 18); val hL = u32(b, 22)
    val bpp = u16(b, 28)
    require(bpp == 24 && u16(b, 26) == 1 && u32(b, 30) == 0 &&
      wL > 0 && hL > 0 && wL <= MaxBmpDim && hL <= MaxBmpDim,
      s"doc $id: unsupported BMP layout (bpp=$bpp dims=${wL}x$hL)")
    val strideL = (wL * 3 + 3) / 4 * 4
    require(54L + strideL * hL <= b.length,
      s"doc $id: truncated BMP pixel array")
    (wL.toInt, hL.toInt, strideL.toInt)
  }

  /** The canonical 54-byte header both BMP writers emit. */
  private def writeBmpHeader(buf: java.io.ByteArrayOutputStream,
                             w: Int, h: Int, dataSize: Int): Unit = {
    buf.write('B'); buf.write('M'); buf.write(le32(54 + dataSize))
    buf.write(le32(0)); buf.write(le32(54))       // reserved, data offset
    buf.write(le32(40)); buf.write(le32(w)); buf.write(le32(h))
    buf.write(le16(1)); buf.write(le16(24))       // planes, bpp
    buf.write(le32(0)); buf.write(le32(dataSize)) // BI_RGB, image size
    buf.write(le32(2835)); buf.write(le32(2835))  // 72 DPI
    buf.write(le32(0)); buf.write(le32(0))        // palette: none
  }

  /** Pack each document as a REAL image container: a canonical 54-byte
    * BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) with 24bpp pixels stored
    * BOTTOM-UP in 4-byte-aligned rows — the actual format quirks, so
    * [[decodeBmp]] parses real structure. Pixel p holds text bytes
    * (3p, 3p+1, 3p+2) as (B, G, R); bytes past the text are zero. */
  def packBmp(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val out = docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1).getBytes("US-ASCII")
          val w = bmpWidth(id)
          val h = math.max(1, (text.length + 3 * w - 1) / (3 * w))
          val stride = (w * 3 + 3) / 4 * 4 // rows pad to 4-byte boundaries
          val dataSize = stride * h
          val buf = new java.io.ByteArrayOutputStream(54 + dataSize)
          writeBmpHeader(buf, w, h, dataSize)
          // pixel array: bottom row FIRST (the BMP storage order)
          var row = h - 1
          while (row >= 0) {
            var b = 0
            while (b < stride) {
              val px = row * w + b / 3
              val idx = px * 3 + b % 3
              buf.write(if (b < w * 3 && idx < text.length) text(idx) & 0xff else 0)
              b += 1
            }
            row -= 1
          }
          val bytes = buf.toByteArray
          Row(id, "image/bmp", bytes, bytes.length)
        }
      }(RowEncoder.encoderFor(packedMediaSchema))
    out.toDF()
  }

  /** Nearest-neighbor downsample of packed BMPs by an integer factor: parse
    * the container, keep every factor-th pixel in both dimensions (out
    * pixel (x,y) = in pixel (x·f, y·f)), and re-encode a NEW canonical BMP
    * with ceil-divided dimensions — the real image-resize plumbing over the
    * in-container codec (a library decoder would swap in bilinear here; the
    * mapPartitions batching, blob flow, and header arithmetic are what
    * scale). Output schema matches [[packBmp]], so resizes chain:
    * `decodeBmp(resizeBmp(packBmp(docs), 2))` or another `resizeBmp`. */
  def resizeBmp(packed: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resizeBmp: factor must be >= 1, got $factor")
    val out = packed.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (w, h, stride) = bmpDims(b, id)
          val w2 = (w + factor - 1) / factor; val h2 = (h + factor - 1) / factor
          val stride2 = (w2 * 3 + 3) / 4 * 4
          val dataSize2 = stride2 * h2
          val buf = new java.io.ByteArrayOutputStream(54 + dataSize2)
          writeBmpHeader(buf, w2, h2, dataSize2)
          var row2 = h2 - 1 // bottom-up output, like packBmp
          while (row2 >= 0) {
            // stored input row for image row (row2 * factor) is bottom-up too
            val inBase = 54 + (h - 1 - row2 * factor) * stride
            var x2 = 0
            while (x2 < w2) {
              val px = inBase + x2 * factor * 3
              buf.write(b(px) & 0xff); buf.write(b(px + 1) & 0xff); buf.write(b(px + 2) & 0xff)
              x2 += 1
            }
            var pad = w2 * 3
            while (pad < stride2) { buf.write(0); pad += 1 }
            row2 -= 1
          }
          val bytes = buf.toByteArray
          Row(id, "image/bmp", bytes, bytes.length)
        }
      }(RowEncoder.encoderFor(packedMediaSchema))
    out.toDF()
  }

  private val decodedBmpSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_px", LongType),
    StructField("mean_b", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_r", DoubleType),
    StructField("tl_b", IntegerType),
    StructField("tl_g", IntegerType),
    StructField("tl_r", IntegerType)))

  private val dHashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("band0", IntegerType),
    StructField("band1", IntegerType),
    StructField("band2", IntegerType),
    StructField("band3", IntegerType)))

  /** Perceptual difference-hash (dHash) over the REAL decoded pixels: a
    * 9×8 nearest-neighbor luma grid is sampled from the BMP's padded
    * bottom-up rows, and bit `i = 8·gy + gx` is set when the grid cell to
    * the right is brighter — the standard 64-bit perceptual fingerprint
    * (near-duplicate images differ in a few bits; crops/re-encodes of the
    * same content collide). Luma is the integer B+G+R sum — no float, so
    * the oracle replays the hash bit-for-bit from the synthesis rule while
    * THIS code path reads actual container bytes.
    *
    * Emitted as four 16-bit BANDS rather than one signed 64-bit value:
    * the bands are both the oracle-safe export (no sign games) and the
    * join keys [[imageNearDupPairs]] buckets on. */
  def imageDHash(packed: DataFrame): DataFrame = {
    val out = packed.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (w, h, stride) = bmpDims(b, id)
          // grid cell (gx, gy), gx ∈ [0,9), gy ∈ [0,8): image pixel
          // (gx·w/9, gy·h/8); image row sy lives at stored row h-1-sy
          def gray(gx: Int, gy: Int): Int = {
            val sx = gx * w / 9; val sy = gy * h / 8
            val base = 54 + (h - 1 - sy) * stride + sx * 3
            (b(base) & 0xff) + (b(base + 1) & 0xff) + (b(base + 2) & 0xff)
          }
          var hash = 0L
          var i = 0
          while (i < 64) {
            val gx = i % 8; val gy = i / 8
            if (gray(gx + 1, gy) > gray(gx, gy)) hash |= 1L << i
            i += 1
          }
          Row(id, w, h,
            (hash & 0xFFFFL).toInt, ((hash >>> 16) & 0xFFFFL).toInt,
            ((hash >>> 32) & 0xFFFFL).toInt, ((hash >>> 48) & 0xFFFFL).toInt)
        }
      }(RowEncoder.encoderFor(dHashSchema))
    out.toDF()
  }

  /** Image near-duplicate pairs by banded Hamming LSH over [[imageDHash]]
    * — the multimodal face of the dedup family (d2's band-join economics
    * on perceptual bits instead of MinHash signatures). Candidates are
    * pairs sharing at least one 16-bit band: by pigeonhole that is EVERY
    * pair within Hamming distance 3 (guaranteed recall), and pairs up to
    * `maxHamming` with the standard LSH probability above it; candidates
    * then pay one exact popcount filter. Never all-pairs: the join
    * buckets on (band index, band value) — a 4·2^16 key space, so
    * candidate volume is bounded by bucket occupancy, not corpus², the
    * same argument as d3's value-space bound. (A degenerate corpus of
    * flat/trivial images collapses into few buckets — cap or pre-filter
    * those upstream, the d4 `maxBlock` pattern.) */
  /** Frame-SET near-dup — the video-shaped third face of the multimodal
    * dedup family (m6 hashes one image, m7 one audio stream; a video is a
    * SEQUENCE of frames, and two videos are near-dups when enough sampled
    * frames coincide). Works on [[sampleFrames]] output: the frame digest
    * is the blocking key (equality join — never all-pairs), the
    * distinct-shared-frame count the rank.
    *
    * `maxDocsPerFrame` drops frames appearing in more documents: a
    * ubiquitous frame (padding, black frames, silence) is both a
    * quadratic blowup and zero dedup signal — same cap discipline as
    * [[Dedup.embeddingPairs]]'s `maxBlock`. The cap is part of the
    * operator contract (a replay must apply it identically). */
  def frameNearDupPairs(frames: DataFrame, minShared: Int = 2,
                        maxDocsPerFrame: Int = 1000,
                        idCol: String = "doc_id"): DataFrame = {
    require(minShared >= 1 && maxDocsPerFrame >= 2,
      s"frameNearDupPairs: bad minShared=$minShared / maxDocsPerFrame=$maxDocsPerFrame")
    val distinctFrames = frames.select(col(idCol), col("frame_md5")).distinct()
    val kept = distinctFrames
      .withColumn("__fn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("frame_md5"))))
      .filter(col("__fn") <= maxDocsPerFrame)
    val l = kept.select(col(idCol).as("id_a"), col("frame_md5"))
    val r = kept.select(col(idCol).as("id_b"), col("frame_md5"))
    l.join(r, Seq("frame_md5"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def imageNearDupPairs(hashed: DataFrame, maxHamming: Int = 8): DataFrame =
    bandedHammingPairs(hashed, maxHamming)

  /** The modality-agnostic banded Hamming join behind
    * [[imageNearDupPairs]] — any DataFrame carrying `doc_id` plus four
    * 16-bit `band0..band3` columns pairs the same way
    * ([[audioFingerprint]] exports the identical shape). */
  def bandedHammingPairs(hashed: DataFrame, maxHamming: Int = 8): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"bandedHammingPairs: maxHamming must be in [0, 64] " +
        s"(64 = all bits of the fingerprint differ), got $maxHamming")
    val bands = Seq("band0", "band1", "band2", "band3")
    val tagged = hashed
      .select(col("doc_id") +: bands.map(col): _*)
      .withColumn("__band", explode(array(bands.zipWithIndex.map { case (bn, i) =>
        struct(lit(i).as("i"), col(bn).as("v")) }: _*)))
      .select(col("doc_id") +: bands.map(col) :+
        col("__band.i").as("__bi") :+ col("__band.v").as("__bv"): _*)
    val left = tagged.select(col("doc_id").as("id_a") +: col("__bi") +: col("__bv") +:
      bands.map(bn => col(bn).as(s"${bn}_a")): _*)
    val right = tagged.select(col("doc_id").as("id_b") +: col("__bi") +: col("__bv") +:
      bands.map(bn => col(bn).as(s"${bn}_b")): _*)
    val hamming = bands.map(bn =>
      bit_count(col(s"${bn}_a").bitwiseXOR(col(s"${bn}_b")))).reduce(_ + _)
    left.join(right, Seq("__bi", "__bv"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming.cast(LongType))
      .filter(col("hamming") <= lit(maxHamming))
      .select("id_a", "id_b", "hamming")
      .distinct()
  }

  /** Decode REAL BMP containers: validate the BM magic and header layout,
    * read the LE dimension fields, walk the BOTTOM-UP padded rows, and fold
    * the pixels into per-channel means plus the top-left pixel (which lives
    * in the LAST stored row — reading it correctly proves the row order is
    * honored, since channel means alone are order-blind). Same batched
    * mapPartitions economics as [[decodeWav]]; blob pruned elsewhere. */
  def decodeBmp(packed: DataFrame): DataFrame = {
    val out = packed.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (w, h, stride) = bmpDims(b, id)
          var sb = 0L; var sg = 0L; var sr = 0L
          var row = 0
          while (row < h) {
            // stored row `row` is image row (h - 1 - row): bottom-up
            val base = 54 + row * stride
            var x = 0
            while (x < w) {
              sb += b(base + x * 3) & 0xff
              sg += b(base + x * 3 + 1) & 0xff
              sr += b(base + x * 3 + 2) & 0xff
              x += 1
            }
            row += 1
          }
          val nPx = w.toLong * h
          def mean(s: Long): Double =
            BigDecimal(s.toDouble / nPx)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val tlBase = 54 + (h - 1) * stride // image top-left = LAST stored row
          Row(id, w, h, nPx, mean(sb), mean(sg), mean(sr),
            b(tlBase) & 0xff, b(tlBase + 1) & 0xff, b(tlBase + 2) & 0xff)
        }
      }(RowEncoder.encoderFor(decodedBmpSchema))
    out.toDF()
  }

  private val decodedWavSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("peak", IntegerType),
    StructField("rms", DoubleType)))

  /** Decode REAL WAV containers: validate the RIFF/WAVE/fmt/data magics,
    * read the little-endian header fields, and fold the PCM samples into
    * peak amplitude and RMS — an actual in-container codec with zero
    * external dependencies, not a stub. Malformed payloads throw with the
    * offending doc id. Runs as mapPartitions so a heavier codec's
    * per-partition init (contexts, model load) amortizes across the batch;
    * the blob column is pruned out of every query that doesn't decode. */
  /** Validate a canonical 16-bit mono PCM WAV and return (sampleRate,
    * nSamples) — the one parser [[decodeWav]] and [[audioFingerprint]]
    * share, every rejection carrying the doc id. Channels/bits are pinned
    * to 1/16 by the layout require, so callers may treat them as literal. */
  private def wavLayout(b: Array[Byte], id: Long): (Int, Long) = {
    def magic(off: Int, want: String): Boolean =
      b.length >= off + 4 && new String(b, off, 4, "US-ASCII") == want
    require(b.length >= 44 && magic(0, "RIFF") && magic(8, "WAVE") &&
      magic(12, "fmt ") && magic(36, "data"),
      s"doc $id: not a canonical PCM WAV payload")
    val fmt = u16(b, 20); val channels = u16(b, 22)
    val rate = u32(b, 24).toInt; val blockAlign = u16(b, 32)
    val bits = u16(b, 34); val dataSize = u32(b, 40)
    require(fmt == 1 && bits == 16 && channels == 1 && rate > 0 &&
      blockAlign == channels * 2 && 44 + dataSize <= b.length,
      s"doc $id: unsupported WAV layout (fmt=$fmt bits=$bits " +
        s"channels=$channels rate=$rate)")
    (rate, dataSize / blockAlign)
  }

  def decodeWav(packed: DataFrame): DataFrame = {
    val out = packed.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        // ---- per-partition codec init would happen here ----
        it.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (rate, nSamples) = wavLayout(b, id)
          var i = 0; var peak = 0; var sumSq = 0.0
          while (i < nSamples.toInt) {
            val s = u16(b, 44 + i * 2).toShort.toInt // sign-extend LE sample
            val a = math.abs(s)
            if (a > peak) peak = a
            sumSq += s.toDouble * s // exact: |s| <= 2^15, n < 2^22 => < 2^53
            i += 1
          }
          val rms = if (nSamples == 0) 0.0
            else BigDecimal(math.sqrt(sumSq / nSamples))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Row(id, rate, 1, 16, nSamples,
            nSamples * 1000L / rate, peak, rms)
        }
      }(RowEncoder.encoderFor(decodedWavSchema))
    out.toDF()
  }

  private val audioFpSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("band0", IntegerType),
    StructField("band1", IntegerType),
    StructField("band2", IntegerType),
    StructField("band3", IntegerType)))

  /** Audio energy-envelope fingerprint over the REAL decoded PCM: the
    * sample stream splits into 65 equal windows, each window's energy is
    * the integer sum of absolute amplitudes, and bit `i` is set when
    * window `i+1` is louder than window `i` — the loudness-CONTOUR
    * fingerprint (64 bits), invariant to overall gain scaling the way
    * dHash is invariant to brightness. All arithmetic is integer, so the
    * oracle replays it bit-for-bit from the synthesis rule while this
    * path walks actual RIFF/PCM bytes. Same four-16-bit-band export as
    * [[imageDHash]]; pair up with [[bandedHammingPairs]]. */
  def audioFingerprint(packed: DataFrame): DataFrame = {
    val out = packed.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (rate, nSamples) = wavLayout(b, id)
          val n = nSamples.toInt
          val energies = new Array[Long](65)
          var w = 0
          while (w < 65) {
            // window w covers samples [w*n/65, (w+1)*n/65) — empty
            // windows (n < 65) have energy 0, comparisons stay defined
            var j = (w.toLong * n / 65).toInt
            val until = ((w + 1).toLong * n / 65).toInt
            var e = 0L
            while (j < until) {
              e += math.abs(u16(b, 44 + j * 2).toShort.toInt)
              j += 1
            }
            energies(w) = e
            w += 1
          }
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (energies(i + 1) > energies(i)) hash |= 1L << i
            i += 1
          }
          Row(id, rate, nSamples,
            (hash & 0xFFFFL).toInt, ((hash >>> 16) & 0xFFFFL).toInt,
            ((hash >>> 32) & 0xFFFFL).toInt, ((hash >>> 48) & 0xFFFFL).toInt)
        }
      }(RowEncoder.encoderFor(audioFpSchema))
    out.toDF()
  }
}
