package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** The REAL image-codec path (JDK ImageIO) behind the multimodal
  * mapPartitions batch shape: lossless PNG round-trip geometry/pixel
  * recovery, corrupt-blob isolation, and the graded query against an
  * independent from-text reconstruction. */
class ImageCodecSpec extends SparkTestBase {

  private def pngBytes(w: Int, h: Int, samples: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, samples)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("PNG encode→decode round-trip recovers geometry and pixel sum") {
    import spark.implicits._
    val samples = Array.tabulate(64)(identity)
    val media = Seq(
      Multimodal.MediaRow(7L, pngBytes(32, 2, samples), "image/png")).toDS()
    val out = Multimodal.decodeImages(media).collect()
    assert(out.length == 1)
    val d = out.head
    assert(d.width == 32L && d.height == 2L && d.n_channels == 1L)
    assert(d.pixel_sum == samples.sum.toLong)
  }

  test("undecodable blobs drop their row, not the job") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Array[Byte](1, 2, 3, 4), "application/junk"),
      Multimodal.MediaRow(2L, pngBytes(4, 1, Array(9, 9, 9, 9)), "image/png")
    ).toDS()
    val out = Multimodal.decodeImages(media).collect()
    assert(out.map(_.media_id).toSeq == Seq(2L))
    assert(out.head.pixel_sum == 36L)
  }

  test("mm_decode_png matches an independent from-text reconstruction") {
    val got = Multimodal.queries("mm_decode_png")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val expected = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("b"))
      .collect()
      .flatMap { r =>
        val b = r.getAs[Array[Byte]]("b")
        val h = math.min(b.length / 32, 8)
        if (h < 1) None
        else Some((r.getLong(0), 32L, h.toLong, 1L,
          b.take(32 * h).map(x => (x & 0xff).toLong).sum))
      }.toSet
    assert(expected.nonEmpty, "fixture should yield at least one image")
    assert(got == expected)
  }
}
