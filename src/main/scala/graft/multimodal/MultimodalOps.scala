package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column plus typed metadata, and decode/feature steps
  * run batched per partition.
  *
  * The Spark-side shape here is real and tested — schema, partitioning,
  * batch iteration via `mapPartitions` over a typed Dataset (the Scala
  * analog of `mapInPandas`: one iterator in, one iterator out, arbitrary
  * per-batch native work inside). The pixel/sample decode itself is
  * STUBBED with a deterministic fake (media codecs are not shipped in
  * this container); swapping `FakeCodec` for a real JNI/javacv decoder
  * changes no plan shape.
  */
object MultimodalOps {

  /** One media row as carried through the pipeline. */
  case class MediaRow(media_id: Long, kind: String, blob: Array[Byte])

  /** Decoded (fake) media features — what a real decoder would emit. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, mean_intensity: Double)

  /** Deterministic fake decoder: "decodes" dimensions/intensity from the
    * blob's bytes. Replace with a real codec at deployment; signature and
    * batch shape stay identical.
    */
  object FakeCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val n = row.blob.length.toLong
      // cheap deterministic byte statistics standing in for pixel decode
      var sum = 0L
      var i = 0
      while (i < row.blob.length) { sum += (row.blob(i) & 0xff); i += 1 }
      val h = java.util.Arrays.hashCode(row.blob) & 0x7fffffff
      MediaFeatures(
        row.media_id, row.kind, n,
        width = 16 + h % 640, height = 16 + (h / 640) % 480,
        n_frames = if (row.kind == "video") 1 + h % 300 else 1,
        mean_intensity = if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** One perceptual hash row: parent id plus the packed 64-bit hash. */
  case class MediaHash(media_id: Long, phash: Long)

  /** 64-bit average-hash over the blob bytes — the perceptual-dedup
    * primitive (stand-in for pixel aHash: a real implementation
    * downsamples to 8x8 luma and thresholds on the mean; this one
    * splits the byte stream into 64 equal chunks and thresholds each
    * chunk mean against the global mean). Bit j is set iff
    * chunkSum_j * n > totalSum * chunkLen_j — an integer-exact mean
    * comparison, no floats, so the hash is bit-identical in any engine
    * that can sum bytes. Empty blob hashes to 0.
    */
  def pHash64(blob: Array[Byte]): Long = {
    val n = blob.length
    if (n == 0) return 0L
    var tot = 0L
    var i = 0
    while (i < n) { tot += (blob(i) & 0xff); i += 1 }
    var h = 0L
    var j = 0
    while (j < 64) {
      val lo = j * n / 64
      val hi = (j + 1) * n / 64
      var cs = 0L
      i = lo
      while (i < hi) { cs += (blob(i) & 0xff); i += 1 }
      // cs * n <= 255 * n^2 and tot * len <= 255 * n^2 — overflow-safe
      // for any blob under ~190 MB
      if (hi > lo && cs * n > tot * (hi - lo)) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Batched perceptual hashing through the same mapPartitions plumbing
    * as decode — one linear pass per blob, no shuffle, no driver hop.
    */
  def perceptualHashes(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => MediaHash(r.media_id, pHash64(r.blob))))
  }

  /** Attach a binary payload column derived from a string column —
    * the testdata has no real media, so documents.text doubles as the
    * blob source (utf-8 bytes). At deployment the blob column comes
    * straight from parquet/Delta `binary`, or from [[readMediaDir]].
    */
  def withBlob(df: DataFrame, srcCol: String, blobCol: String = "blob"): DataFrame =
    df.withColumn(blobCol, encode(col(srcCol), "UTF-8"))

  /** Disk ingestion of raw media files via Spark's `binaryFile` source —
    * the production entry point for an image/audio/video directory tree:
    * each file becomes one row (path, length, content), `pathGlobFilter`
    * narrows by extension WITHOUT reading rejected files, and the
    * resulting `blob` column is exactly what every operator downstream
    * ([[blobMeta]], [[perceptualHashes]], the decode plumbing) consumes.
    * media_id = xxhash64(path): stable under re-listing, no collect.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    glob.fold(reader)(g => reader.option("pathGlobFilter", g)).load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("path"),
        col("length").cast(LongType).as("n_bytes"),
        col("content").as("blob"))
  }

  /** Batched decode: iterate each partition once, decode row-by-row
    * inside the JVM task (no driver involvement, no collect) — the
    * `mapInPandas` analog. Partition count = decode parallelism.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(FakeCodec.decode))
  }

  /** Pure-SQL metadata over a blob column (byte length + digest) — the
    * part of media handling that needs no codec and stays oracle-checkable.
    */
  def blobMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(blobCol)).cast(LongType).as("n_bytes"),
      md5(col(blobCol)).as("digest"))

  /** A resized image: same id, target dims, new (fake) payload. */
  case class ResizedImage(
      media_id: Long, width: Int, height: Int, blob: Array[Byte])

  /** Batched resize through the same mapPartitions plumbing as decode.
    * The pixel resample is stubbed (deterministic byte subsample standing
    * in for bilinear scaling); schema, batching and partition behavior
    * are the deployment shape.
    */
  def resizeImages(
      spark: SparkSession, media: Dataset[MediaRow],
      targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    import spark.implicits._
    media.mapPartitions(_.map { row =>
      val n = math.max(1, math.min(row.blob.length, targetW * targetH / 64))
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = row.blob(i * row.blob.length / n); i += 1 }
      ResizedImage(row.media_id, targetW, targetH, out)
    })
  }

  /** One sampled frame: parent id, frame index, frame payload. */
  case class SampledFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: one input video row → `everyNth`-strided frames
    * (iterator flatMap inside the partition — the UDTF/`mapInPandas`
    * one-to-many shape; output cardinality is data-dependent and never
    * driver-side).
    */
  def sampleFrames(
      spark: SparkSession, media: Dataset[MediaRow],
      everyNth: Int): Dataset[SampledFrame] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { row =>
      val f = FakeCodec.decode(row)
      (0 until f.n_frames by everyNth).iterator.map { idx =>
        // fake per-frame payload: slice of the blob keyed by frame index
        val start = if (row.blob.length == 0) 0 else idx % row.blob.length
        SampledFrame(row.media_id, idx,
          java.util.Arrays.copyOfRange(row.blob, start,
            math.min(row.blob.length, start + 16)))
      }
    })
  }
}
