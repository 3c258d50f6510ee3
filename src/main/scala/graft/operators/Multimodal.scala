package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in partition-sized
  * batches.
  *
  * The decode itself is a DETERMINISTIC STUB (no image/audio codecs in
  * this container): byte-level arithmetic stands in for pixel work.
  * Everything around it — the binary schema, the per-partition batch
  * loop (the Scala analogue of a pandas-batched UDF), the bounded
  * output schema — is the real plumbing a codec would drop into.
  *
  * Scale: mapPartitions keeps the decode batched per task with zero
  * driver involvement; binary payloads never shuffle (metadata is
  * projected out before any wide operation downstream).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frame_offsets", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Wrap a documents table as a media table: the UTF-8 payload plays
    * the role of an encoded image/audio blob.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      concat(lit("fake/"), col("source")).as("media_type"),
      col("text").cast(BinaryType).as("payload"))

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_offset", LongType, nullable = false),
    StructField("frame_len", IntegerType, nullable = false),
    StructField("frame_checksum", LongType, nullable = false)))

  /** FNV-1a over a byte range — the stub stand-in for per-frame pixel
    * work, shared by [[decode]] and [[frameSample]].
    */
  private def fnv(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Frame sampling: every `stride`-th 256-byte "frame" of each
    * payload, with byte-range metadata and a per-frame checksum (the
    * stub for a per-frame feature extraction). One mapPartitions pass
    * over the media table — decode and sample fuse into a single scan,
    * the payload never shuffles, and output volume is
    * n_frames/stride rows of fixed-width metadata (the video-pipeline
    * pattern: sample on the executor, ship only features).
    */
  def frameSample(media: DataFrame, stride: Int = 4): DataFrame = {
    require(stride >= 1)
    val enc = RowEncoder.encoderFor(frameSchema)
    val ds: Dataset[Row] = media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val nFrames = (bytes.length + 255) / 256
          (0 until nFrames by stride).iterator.map { f =>
            val off = f * 256
            val len = math.min(256, bytes.length - off)
            Row(id, f, off.toLong, len, fnv(bytes, off, off + len))
          }
        }
      }(enc)
    ds.toDF()
  }

  /** Batched "decode": per partition, walk the payload bytes once and
    * emit typed metadata. STUB — a real build links an image codec
    * here; the signature (Iterator[Row] => Iterator[Row], schema-in /
    * schema-out) is exactly what it would keep.
    */
  def decode(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    val ds: Dataset[Row] = media.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          // deterministic fake decode: FNV-1a checksum, fake geometry
          // from the checksum, "frame" offsets every 256 bytes
          val h = fnv(bytes, 0, bytes.length)
          val width = 320 + (math.floorMod(h, 8L) * 64).toInt
          val height = 240 + (math.floorMod(h >>> 3, 8L) * 48).toInt
          val offsets = 0L.until(bytes.length.toLong, 256L).toArray
          Row(id, mt, bytes.length.toLong, h, width, height, offsets)
        }
      }(enc)
    ds.toDF()
  }
}
