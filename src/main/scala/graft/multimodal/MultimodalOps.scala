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
  * per-batch native work inside). IMAGE decode is real ([[ImageIoCodec]]
  * over the in-JDK `javax.imageio`); AUDIO decode is real for linear
  * PCM ([[WavPcmCodec]], canonical RIFF parse + `javax.sound.sampled`
  * fallback); multi-frame decode is real for animated GIF
  * ([[gifFrames]] — the one multi-frame container with an in-JDK
  * codec). True VIDEO codecs (H.264/VP9) and compressed audio stay
  * STUBBED with a deterministic fake ([[FakeCodec]] — not shipped in
  * this container), and swapping in a real JNI/javacv decoder changes
  * no plan shape.
  */
object MultimodalOps {

  /** One media row as carried through the pipeline. */
  case class MediaRow(media_id: Long, kind: String, blob: Array[Byte])

  /** Decoded (fake) media features — what a real decoder would emit. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, mean_intensity: Double)

  /** The codec seam: one blob in, one feature row out, called batched
    * inside `mapPartitions` tasks — implementations must be serializable
    * (they ship in the task closure). [[FakeCodec]] keeps the byte-math
    * oracle queries deterministic; [[ImageIoCodec]] decodes real
    * PNG/JPEG/BMP/GIF bytes with the in-JDK `javax.imageio` (no new
    * dependency). Audio/video codecs stay deployment-provided.
    */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic fake decoder: "decodes" dimensions/intensity from the
    * blob's bytes. Replace with a real codec at deployment; signature and
    * batch shape stay identical.
    */
  object FakeCodec extends MediaCodec {
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

  /** REAL image decoding through the JDK's `javax.imageio` — the image
    * half of the codec seam with zero added dependencies: PNG, JPEG,
    * BMP, GIF and WBMP decode to actual pixels. width/height are the
    * decoded raster's; mean_intensity is the mean 8-bit luma
    * (ITU-R BT.601 integer weights) over every pixel — a full decode,
    * so cost is O(pixels) per row; use [[imageMeta]] when only
    * header-level dimensions/format are needed. Undecodable bytes
    * throw with the media_id (a production pipeline wraps this in the
    * typed-error-row pattern of Pipeline.fetchDetails rather than
    * letting one corrupt file kill the task).
    */
  object ImageIoCodec extends MediaCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.blob))
      require(img != null, s"undecodable image bytes for media_id=${row.media_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      var lumaSum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // BT.601 luma in integer arithmetic: (77R + 150G + 29B) >> 8
          lumaSum += (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
            29 * (rgb & 0xff)) >> 8
          x += 1
        }
        y += 1
      }
      MediaFeatures(row.media_id, row.kind, row.blob.length.toLong,
        width = w, height = h, n_frames = 1,
        mean_intensity = if (w * h == 0) 0.0 else lumaSum.toDouble / (w.toLong * h))
    }
  }

  /** Header-level image metadata: format + dimensions. */
  case class ImageMeta(media_id: Long, format: String, width: Int, height: Int)

  /** Format/width/height WITHOUT a pixel decode: `ImageIO`'s reader
    * discovery sniffs the container from the leading bytes and
    * `getWidth(0)`/`getHeight(0)` read only the header — the right cost
    * shape for a 100 TB catalog pass where full decode is reserved for
    * the rows that survive metadata filters. Same mapPartitions
    * plumbing as decode: batched, no shuffle, no driver hop.
    */
  def imageMeta(spark: SparkSession, media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import spark.implicits._
    media.mapPartitions(_.map { row =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(row.blob))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no image reader for media_id=${row.media_id}")
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          ImageMeta(row.media_id, r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            r.getWidth(0), r.getHeight(0))
        } finally r.dispose()
      } finally iis.close()
    })
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
    * Codec defaults to [[FakeCodec]] (the oracle-checked byte math);
    * pass [[ImageIoCodec]] for real image bytes.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow],
      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(rows => rows.map(codec.decode))
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

  /** One REAL decoded frame from a multi-frame container. */
  case class DecodedFrame(
      media_id: Long, frame_idx: Int, n_frames: Int,
      width: Int, height: Int, mean_luma: Double)

  /** REAL multi-frame ("video") decode for the one multi-frame container
    * the JDK ships a codec for: animated GIF. Each blob's frame count is
    * read from the container, every `everyNth` frame is decoded to
    * pixels, and the BT.601 integer luma is computed per sampled frame —
    * the frame-sampling feature-extraction shape (decode cost paid only
    * for sampled frames; `n_frames` comes from the index, not a full
    * decode). Frames are the RAW per-frame rasters (GIF delta frames
    * are not composited onto the canvas — document-level stats, not
    * playback). True video codecs (H.264 etc.) remain deployment-
    * provided behind [[FakeCodec]]'s seam; this makes the plumbing real
    * for a container the sandbox can actually decode and re-encode.
    */
  def gifFrames(spark: SparkSession, media: Dataset[MediaRow],
      everyNth: Int): Dataset[DecodedFrame] = {
    import spark.implicits._
    require(everyNth >= 1, "everyNth must be >= 1")
    media.mapPartitions(_.flatMap { row =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(row.blob))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no image reader for media_id=${row.media_id}")
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true) // forces an index scan, no pixel decode
          (0 until n by everyNth).map { idx =>
            val img = r.read(idx)
            var lumaSum = 0L
            val (w, h) = (img.getWidth, img.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                lumaSum += (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
                  29 * (rgb & 0xff)) >> 8
                x += 1
              }
              y += 1
            }
            DecodedFrame(row.media_id, idx, n, w, h,
              if (w * h == 0) 0.0 else lumaSum.toDouble / (w.toLong * h))
          }
        } finally r.dispose()
      } finally iis.close()
    })
  }

  /** REAL video decode for the one container+codec pair the stock JDK
    * can fully handle: Motion-JPEG in AVI. The AVI container is RIFF —
    * the same chunk grammar [[WavPcmCodec]] already hand-parses — and
    * each MJPEG frame chunk (`00dc`/`00db`) is a complete baseline JPEG
    * that `javax.imageio` decodes. So the claim "no in-JDK video
    * decoder exists" is false for exactly this format, and the seam's
    * video half gets a real member: frame COUNT is an index scan over
    * chunk headers (no pixel work), and pixel decode is paid only for
    * SAMPLED frames — the cost shape [[gifFrames]] established.
    * Inter-frame codecs (H.264/VP9/AV1) remain deployment-provided;
    * MJPEG is what scraped surveillance/scientific/legacy corpora
    * actually carry, and it exercises the full container→frame→pixel
    * path for real.
    */
  object AviMjpegCodec extends Serializable {
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    /** (offset, length) of every video frame chunk in stream order — an
      * index scan over chunk headers, no pixel decode. Frame chunks are
      * `SSdc` (compressed) or `SSdb` (uncompressed) with SS the decimal
      * stream number; LIST chunks (`hdrl`, `movi`, `rec `) are walked
      * recursively, everything else skipped by its declared size.
      */
    def frameChunks(mediaId: Long, b: Array[Byte]): Vector[(Int, Int)] = {
      require(b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ",
        s"not a RIFF/AVI container for media_id=$mediaId")
      val out = Vector.newBuilder[(Int, Int)]
      walkChunks(mediaId, b) { (id, off, len) =>
        if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.endsWith("dc") || id.endsWith("db")))
          out += ((off, len))
      }
      out.result()
    }

    /** The first video stream's format off its `strf` BITMAPINFOHEADER:
      * (width, height, bitCount, compression) with compression "DIB"
      * for 0 (uncompressed device-independent bitmap) and the fourcc
      * string otherwise (e.g. "MJPG"). Header-only — no pixel work.
      */
    def streamFormat(mediaId: Long, b: Array[Byte]): (Int, Int, Int, String) = {
      var found: Option[(Int, Int, Int, String)] = None
      walkChunks(mediaId, b) { (id, off, len) =>
        if (found.isEmpty && id == "strf" && len >= 40) {
          val comp = u32(b, off + 16)
          val bitCount = (b(off + 14) & 0xff) | ((b(off + 15) & 0xff) << 8)
          found = Some((u32(b, off + 4).toInt, u32(b, off + 8).toInt,
            bitCount, if (comp == 0L) "DIB" else fourcc(b, off + 16)))
        }
      }
      found.getOrElse(throw new IllegalArgumentException(
        s"no strf video format header for media_id=$mediaId"))
    }

    /** Recursive RIFF chunk walk shared by the index scan and the
      * header reads, with the wrapped-size guard from WavPcmCodec's
      * walk: a 0xFFFFFFFF size field would go negative through toInt
      * and step the cursor BACKWARD forever.
      */
    private def walkChunks(mediaId: Long, b: Array[Byte])(
        f: (String, Int, Int) => Unit): Unit = {
      require(b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ",
        s"not a RIFF/AVI container for media_id=$mediaId")
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = fourcc(b, p)
          val szL = u32(b, p + 4)
          require(szL <= (b.length - p - 8).toLong,
            s"malformed RIFF chunk size $szL at offset $p for media_id=$mediaId")
          val sz = szL.toInt
          if (id == "LIST") walk(p + 12, math.min(end, p + 8 + sz))
          else f(id, p + 8, sz)
          p += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, math.min(b.length.toLong, u32(b, 4) + 8L).toInt)
    }

    /** One frame's (width, height, mean BT.601 luma). DIB frames are
      * pure byte math (BGR rows, 4-byte-aligned stride — engine-exact,
      * which is what lets a SQL oracle re-derive the whole video
      * pipeline); anything else goes through `javax.imageio` (MJPEG).
      */
    def frameLuma(mediaId: Long, b: Array[Byte], off: Int, len: Int,
        fmt: (Int, Int, Int, String)): (Int, Int, Double) = fmt match {
      case (w, h, 24, "DIB") =>
        val stride = ((w * 3 + 3) / 4) * 4
        require(len >= stride * h,
          s"short DIB frame for media_id=$mediaId ($len < ${stride * h})")
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = off + y * stride + x * 3 // row order irrelevant for a mean
            s += (77 * (b(o + 2) & 0xff) + 150 * (b(o + 1) & 0xff) +
              29 * (b(o) & 0xff)) >> 8
            x += 1
          }
          y += 1
        }
        (w, h, if (w * h == 0) 0.0 else s.toDouble / (w.toLong * h))
      case _ =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b, off, len))
        require(img != null, s"undecodable frame bytes for media_id=$mediaId")
        val (w, h) = (img.getWidth, img.getHeight)
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            s += (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
              29 * (rgb & 0xff)) >> 8
            x += 1
          }
          y += 1
        }
        (w, h, if (w * h == 0) 0.0 else s.toDouble / (w.toLong * h))
    }
  }

  /** Frame-sampled REAL video decode over MJPEG/AVI blobs — the exact
    * shape of [[gifFrames]] on the container [[AviMjpegCodec]] parses:
    * n_frames from the chunk index (no pixel cost), every `everyNth`
    * frame's JPEG decoded to pixels for the BT.601 luma. Batched
    * `mapPartitions`, no shuffle, no provider-registry lookups in the
    * hot path (the JPEG reader is resolved per image by content, which
    * ImageIO caches; the container walk is pure byte math).
    */
  def aviFrames(spark: SparkSession, media: Dataset[MediaRow],
      everyNth: Int): Dataset[DecodedFrame] = {
    import spark.implicits._
    require(everyNth >= 1, "everyNth must be >= 1")
    media.mapPartitions(_.flatMap { row =>
      val fmt = AviMjpegCodec.streamFormat(row.media_id, row.blob)
      val chunks = AviMjpegCodec.frameChunks(row.media_id, row.blob)
      val n = chunks.length
      (0 until n by everyNth).iterator.map { idx =>
        val (off, len) = chunks(idx)
        val (w, h, luma) = AviMjpegCodec.frameLuma(
          row.media_id, row.blob, off, len, fmt)
        DecodedFrame(row.media_id, idx, n, w, h, luma)
      }
    })
  }

  /** Frame-delta video fingerprint over a real AVI blob (the video
    * analog of [[audioFingerprint]]'s frame-energy sign bits): bit f is
    * set when frame f's mean luma EXCEEDS frame f+1's, over the first
    * 32 frames — robust to uniform brightness scaling, exact integer
    * comparisons for DIB frames, so identical content gives identical
    * signatures across engines and runs.
    */
  def videoFingerprint(mediaId: Long, blob: Array[Byte]): (Int, Long) = {
    val fmt = AviMjpegCodec.streamFormat(mediaId, blob)
    val lumas = AviMjpegCodec.frameChunks(mediaId, blob).take(32)
      .map { case (off, len) =>
        AviMjpegCodec.frameLuma(mediaId, blob, off, len, fmt)._3
      }
    val nBits = math.max(lumas.length - 1, 0)
    var sig = 0L
    var f = 0
    while (f < nBits) {
      if (lumas(f) > lumas(f + 1)) sig |= 1L << f
      f += 1
    }
    (nBits, sig)
  }

  /** Minimal-but-valid MJPEG/AVI encoder (the video analog of
    * [[pcmU8ToWav]]): wraps already-encoded JPEG frames in a RIFF/AVI
    * container — `hdrl` (avih + one `vids`/`MJPG` stream) and `movi`
    * with one `00dc` chunk per frame, word-aligned. Gives the specs a
    * round-trip (encode → [[aviFrames]] decode) without shipping any
    * binary fixture, and the pipeline a way to materialize sampled
    * clips.
    */
  def jpegFramesToAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] =
    buildAvi(frames, width, height, fps, handler = "MJPG",
      compression = Some("MJPG"), chunkId = "00dc")

  /** UNCOMPRESSED (BI_RGB 24-bit DIB) AVI encoder — each frame is raw
    * bottom-up BGR rows with 4-byte-aligned stride. Pure byte math end
    * to end (no lossy codec anywhere), which is what lets the
    * q_video_fingerprint oracle re-derive the whole video pipeline in
    * SQL the way the WAV oracle re-derives the audio one.
    */
  def dibFramesToAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    frames.foreach(f => require(f.length == stride * height,
      s"DIB frame must be stride*height = ${stride * height} bytes, got ${f.length}"))
    buildAvi(frames, width, height, fps, handler = "DIB ",
      compression = None, chunkId = "00db")
  }

  /** Flat-gray convenience on top of [[dibFramesToAvi]]: frame k is
    * every pixel at gray level `grays(k)` (B = G = R, so the BT.601
    * integer luma is exactly the gray level — (77+150+29)g >> 8 = g).
    */
  def grayFramesToAviDib(grays: Seq[Int], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    dibFramesToAvi(grays.map(g => Array.fill[Byte](stride * height)((g & 0xff).toByte)),
      width, height, fps)
  }

  private def buildAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int, handler: String, compression: Option[String],
      chunkId: String): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "need at least one frame and fps > 0")
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val out = new Array[Byte](8 + payload.length + pad)
      System.arraycopy(cc(id), 0, out, 0, 4)
      System.arraycopy(le32(payload.length.toLong), 0, out, 4, 4)
      System.arraycopy(payload, 0, out, 8, payload.length)
      out // trailing pad byte (if any) stays 0
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(kind) ++ children)
    val n = frames.length
    val maxFrame = frames.map(_.length).max
    val compBytes = compression.map(cc).getOrElse(le32(0))
    val avih = le32(1000000L / fps) ++ le32(maxFrame.toLong * fps) ++
      le32(0) ++ le32(0) ++ le32(n.toLong) ++ le32(0) ++ le32(1) ++
      le32(maxFrame.toLong) ++ le32(width.toLong) ++ le32(height.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = cc("vids") ++ cc(handler) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps.toLong) ++ le32(0) ++ le32(n.toLong) ++
      le32(maxFrame.toLong) ++ le32(0xffffffffL) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
      le16(1) ++ le16(24) ++ compBytes ++ le32(width.toLong * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.map(chunk(chunkId, _)).reduce(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** Decoded audio: container/stream facts plus the amplitude
    * statistics an audio-quality filter gates on (all samples, all
    * channels, normalized to [-1, 1]).
    */
  case class AudioFeatures(
      media_id: Long, n_bytes: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, duration_ms: Double, rms: Double,
      peak: Double)

  /** REAL audio decoding — the audio half of the codec seam with zero
    * added dependencies: WAV (and AU/AIFF) containers carrying linear
    * PCM decode to actual samples. Covers the PCM encodings the WAV
    * core defines — 16-bit signed (either endianness) and 8-bit
    * signed/unsigned — which is what a scraped-audio training corpus
    * overwhelmingly contains after transcoding; compressed codecs
    * (MP3/AAC/Opus) remain deployment-provided, same seam. rms and
    * peak are over normalized samples across all channels; undecodable
    * bytes throw with the media_id (wrap in the typed-error-row
    * pattern in production).
    *
    * SCALE-CRITICAL: canonical RIFF/WAVE bytes take a hand-rolled
    * header parse, NOT `AudioSystem.getAudioInputStream` — the JDK's
    * provider registry synchronizes every lookup, which serializes all
    * task threads under `mapPartitions` (measured: the 100x corpus
    * smoke ran at 134x wall — i.e. ZERO parallel speedup on 32 cores —
    * before this fast path; ~13x after). The parse is proven
    * result-identical to the AudioSystem route on JDK-encoded files in
    * MultimodalSpec; non-WAV containers (AU/AIFF) still fall back to
    * AudioSystem.
    */
  object WavPcmCodec extends Serializable {

    def decode(mediaId: Long, blob: Array[Byte]): AudioFeatures =
      if (isRiffWave(blob)) decodeRiff(mediaId, blob)
      else decodeViaAudioSystem(mediaId, blob)

    private def isRiffWave(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    /** Canonical RIFF walk: fmt chunk for the stream facts, data chunk
      * for the samples. WAV stores 8-bit PCM unsigned and 16-bit PCM
      * signed little-endian (the container defines it, so no encoding
      * flag exists to read).
      */
    private def decodeRiff(mediaId: Long, b: Array[Byte]): AudioFeatures = {
      var off = 12
      var haveFmt = false
      var fmtCode = 0
      var channels = 0
      var rate = 0
      var bits = 0
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= b.length && (dataOff < 0 || !haveFmt)) {
        val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = u32(b, off + 4).toInt
        // a chunk size past 2^31 wraps negative and would walk BACKWARD
        // (infinite loop on crafted input); no real WAV is that large
        require(size >= 0, s"media_id=$mediaId: malformed RIFF chunk size")
        val body = off + 8
        id match {
          case "fmt " =>
            require(size >= 16, s"media_id=$mediaId: truncated fmt chunk")
            fmtCode = u16(b, body)
            channels = u16(b, body + 2)
            rate = u32(b, body + 4).toInt
            bits = u16(b, body + 14)
            haveFmt = true
          case "data" =>
            dataOff = body
            dataLen = math.min(size, b.length - body)
          case _ => ()
        }
        off = body + size + (size & 1) // chunks pad to even
      }
      require(haveFmt && dataOff >= 0,
        s"media_id=$mediaId: RIFF/WAVE without fmt+data chunks")
      require(fmtCode == 1 && (bits == 8 || bits == 16) && channels > 0,
        s"media_id=$mediaId: unsupported WAV format code=$fmtCode/$bits-bit " +
          "(linear 8/16-bit PCM only; transcode compressed audio upstream)")
      features(mediaId, b.length.toLong, b, dataOff, dataLen, bits,
        bigEndian = false, unsigned8 = true, rate.toDouble, channels)
    }

    /** Non-WAV containers (AU/AIFF): the JDK provider route — correct,
      * but its synchronized registry makes it the slow path.
      */
    private def decodeViaAudioSystem(mediaId: Long, blob: Array[Byte]): AudioFeatures = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val ais =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(blob))
        catch { case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"undecodable audio bytes for media_id=$mediaId", e)
        }
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        require((enc == AudioFormat.Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
          (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8),
          s"media_id=$mediaId: unsupported encoding $enc/$bits-bit " +
            "(linear 8/16-bit PCM only; transcode compressed audio upstream)")
        val bytes = ais.readAllBytes()
        features(mediaId, blob.length.toLong, bytes, 0, bytes.length, bits,
          fmt.isBigEndian, enc == AudioFormat.Encoding.PCM_UNSIGNED,
          fmt.getSampleRate.toDouble, fmt.getChannels)
      } finally ais.close()
    }

    /** Shared amplitude kernel — one sequential pass, identical IEEE op
      * order on both container routes (and in the DuckDB oracle).
      */
    private def features(mediaId: Long, nBytes: Long, bytes: Array[Byte],
        from: Int, len: Int, bits: Int, bigEndian: Boolean,
        unsigned8: Boolean, rate: Double, channels: Int): AudioFeatures = {
      val bytesPerSample = bits / 8
      val nSamples = len / bytesPerSample
      var sumSq = 0.0
      var peak = 0.0
      var i = 0
      while (i < nSamples) {
        val off = from + i * bytesPerSample
        val s =
          if (bits == 16) {
            val (lo, hi) =
              if (bigEndian) (bytes(off + 1), bytes(off))
              else (bytes(off), bytes(off + 1))
            ((hi << 8) | (lo & 0xff)).toDouble / 32768.0
          } else if (unsigned8)
            ((bytes(off) & 0xff) - 128).toDouble / 128.0
          else bytes(off).toDouble / 128.0
        sumSq += s * s
        val a = math.abs(s)
        if (a > peak) peak = a
        i += 1
      }
      val frames = nSamples.toLong / channels
      AudioFeatures(mediaId, nBytes,
        sample_rate = math.round(rate).toInt, channels = channels,
        bits = bits, n_frames = frames,
        duration_ms = if (rate == 0) 0.0 else frames * 1000.0 / rate,
        rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples),
        peak = peak)
    }

    /** Raw PCM-U8 payload of a canonical 8-bit RIFF/WAVE blob (the
      * shape [[pcmU8ToWav]] writes); throws on anything else — the
      * energy fingerprint below is defined on the u8 sample stream.
      */
    def pcmU8Data(b: Array[Byte]): Array[Byte] = {
      require(isRiffWave(b), "pcmU8Data: not a RIFF/WAVE blob")
      var off = 12
      var bits = -1
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= b.length && (dataOff < 0 || bits < 0)) {
        val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = u32(b, off + 4).toInt
        require(size >= 0, "pcmU8Data: malformed RIFF chunk size")
        val body = off + 8
        id match {
          case "fmt " => bits = u16(b, body + 14)
          case "data" =>
            dataOff = body
            dataLen = math.min(size, b.length - body)
          case _ => ()
        }
        off = body + size + (size & 1)
      }
      require(bits == 8 && dataOff >= 0,
        s"pcmU8Data: expected 8-bit PCM WAV, got bits=$bits")
      java.util.Arrays.copyOfRange(b, dataOff, dataOff + dataLen)
    }
  }

  /** Frame-energy delta fingerprint over u8 PCM samples — the
    * Haitsma-Kalker sign-of-difference idea without the spectral
    * transform: bit f is set when frame f's summed |amplitude| exceeds
    * frame f+1's. Robust to uniform gain, one linear pass, and —
    * unlike the pHash DCT — exactly SQL-reproducible, so the audio
    * dedup path is oracle-checked end to end. Frames of `frame`
    * samples; at most `maxBits` bits (sub-2-frame clips fingerprint
    * to 0 bits / signature 0).
    */
  def audioFingerprint(samples: Array[Byte], frame: Int = 32,
      maxBits: Int = 31): (Int, Long) = {
    val nFrames = samples.length / frame
    val nBits = math.min(maxBits, math.max(nFrames - 1, 0))
    if (nBits == 0) return (0, 0L)
    val energy = Array.tabulate(nBits + 1) { f =>
      var s = 0L
      var i = f * frame
      val end = i + frame
      while (i < end) { s += math.abs((samples(i) & 0xff) - 128); i += 1 }
      s
    }
    var sig = 0L
    var f = 0
    while (f < nBits) {
      if (energy(f) > energy(f + 1)) sig |= (1L << f)
      f += 1
    }
    (nBits, sig)
  }

  /** Batched audio decode through the same mapPartitions plumbing as
    * [[decodeFeatures]]: one linear pass per blob inside the task, no
    * shuffle, no driver hop; partition count = decode parallelism.
    */
  def audioFeatures(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => WavPcmCodec.decode(r.media_id, r.blob)))
  }

  /** Encode raw 8-bit unsigned PCM samples into a WAV container through
    * the JDK's own encoder (`AudioSystem.write`) — the counterpart of
    * [[WavPcmCodec]], used where the pipeline needs real audio BYTES
    * (the testdata ships none): q_audio_decode synthesizes one WAV per
    * document from its text bytes and decodes it back, so the
    * encode→container→decode roundtrip is exercised end to end and the
    * amplitude stats stay closed-form oracle-checkable.
    */
  def pcmU8ToWav(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    // canonical 44-byte RIFF header written directly — BYTE-IDENTICAL
    // to AudioSystem.write's output (pinned in MultimodalSpec), but
    // without the JDK provider registry, whose synchronized lookups
    // serialize mapPartitions task threads (see WavPcmCodec scaladoc)
    val n = samples.length
    val out = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(36 + n)
    out.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(16) // PCM fmt chunk size
    out.putShort(1) // format code: linear PCM
    out.putShort(1) // channels
    out.putInt(sampleRate)
    out.putInt(sampleRate) // byte rate = rate * channels * 1 byte/sample
    out.putShort(1) // block align
    out.putShort(8) // bits/sample (8-bit PCM is unsigned by the spec)
    out.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putInt(n)
    out.put(samples)
    out.array()
  }

  /** The JDK-encoder reference for [[pcmU8ToWav]] — kept so the spec can
    * pin the hand-rolled header byte-identical to `AudioSystem.write`.
    */
  def pcmU8ToWavViaAudioSystem(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 8, 1, false, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
