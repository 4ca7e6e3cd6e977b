package graft

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaFeatures, MediaRow}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeFeatures preserves ids/kinds, computes deterministic features") {
    val rows = Seq(
      MediaRow(1L, "image", "hello pixels".getBytes("UTF-8")),
      MediaRow(2L, "video", "some video bytes here".getBytes("UTF-8")),
      MediaRow(3L, "audio", Array.emptyByteArray))
    val ds = spark.createDataset(rows)(Encoders.product[MediaRow]).repartition(2)
    val out = MultimodalOps.decodeFeatures(spark, ds).collect().sortBy(_.media_id)

    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.kind).toSeq == Seq("image", "video", "audio"))
    assert(out(0).n_bytes == 12L)
    assert(out.forall(f => f.width >= 16 && f.height >= 16))
    assert(out(1).n_frames >= 1 && out(0).n_frames == 1)
    assert(out(2).mean_intensity == 0.0) // empty blob guarded

    // determinism: same input -> identical features
    val again = MultimodalOps.decodeFeatures(spark, ds).collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
  }

  test("decode runs distributed per partition (no driver collect)") {
    val ds = spark.range(100)
      .select(col("id").as("media_id"), lit("image").as("kind"),
        encode(concat(lit("blob"), col("id")), "UTF-8").as("blob"))
      .as(Encoders.product[MediaRow]).repartition(8)
    val out: Array[MediaFeatures] = MultimodalOps.decodeFeatures(spark, ds).collect()
    assert(out.length == 100)
    assert(out.map(_.media_id).toSet == (0L until 100L).toSet)
  }

  test("resizeImages emits target dims with bounded payload, distributed") {
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "image", Array.tabulate[Byte](4096)(_.toByte)),
      MediaRow(2L, "image", Array.tabulate[Byte](100)(_.toByte))))(Encoders.product[MediaRow])
      .repartition(2)
    val out = MultimodalOps.resizeImages(spark, ds, 64, 64)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(_.blob.length <= 64 * 64 / 64))
    // deterministic
    val again = MultimodalOps.resizeImages(spark, ds, 64, 64)
      .collect().sortBy(_.media_id)
    assert(out.zip(again).forall { case (a, b) => a.blob.sameElements(b.blob) })
  }

  test("sampleFrames is one-to-many with stride, only for decoded frame count") {
    val video = MediaRow(7L, "video", "some video payload bytes".getBytes("UTF-8"))
    val nFrames = MultimodalOps.FakeCodec.decode(video).n_frames
    val ds = spark.createDataset(Seq(video))(Encoders.product[MediaRow])
    val frames = MultimodalOps.sampleFrames(spark, ds, everyNth = 10).collect()
    assert(frames.length == (nFrames + 9) / 10)
    assert(frames.map(_.frame_idx).toSeq == (0 until nFrames by 10).toSeq)
    assert(frames.forall(_.media_id == 7L))
  }

  test("blobMeta byte length counts bytes, not chars (utf-8)") {
    val df = Seq((1L, "héllo")).toDF("id", "t")
    val meta = MultimodalOps.blobMeta(
      MultimodalOps.withBlob(df, "t"), "id", "blob").head()
    assert(meta.getLong(1) == 6L) // é is 2 bytes
  }
}
