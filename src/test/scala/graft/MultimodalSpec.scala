package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Real-bytes verification of the image_header expression: the registry
  * query (mm5) runs over the text corpus where only the GIF/unknown
  * branches are reachable, so the PNG/JPEG parses are proven here on
  * hand-assembled headers that follow the public specs byte-for-byte.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // minimal-but-real PNG: signature + IHDR(width=320, height=200,
  // bit depth 8, color type 6 = RGBA)
  private val png = bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
    bytes(0, 0, 0, 13) ++ "IHDR".getBytes ++
    bytes(0, 0, 1, 64) ++ // width 320
    bytes(0, 0, 0, 200) ++ // height 200
    bytes(8, 6, 0, 0, 0)

  // real JPEG start: SOI, APP0/JFIF segment, then SOF0 with
  // precision 8, height 480, width 640, 3 components
  private val jpeg = bytes(0xFF, 0xD8) ++
    bytes(0xFF, 0xE0, 0x00, 0x10) ++ "JFIF".getBytes ++
    bytes(0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
    bytes(0xFF, 0xC0, 0x00, 0x11, 8, 0x01, 0xE0, 0x02, 0x80, 3) ++
    bytes(1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)

  // GIF89a logical screen 13 x 7 (little-endian) + packed/background/ratio
  private val gif = "GIF89a".getBytes ++ bytes(13, 0, 7, 0, 0x91, 0, 0)

  private val truncatedPng = bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
  private val sofLessJpeg = bytes(0xFF, 0xD8, 0xFF, 0xD9) // SOI then EOI
  private val junk = "just some prose, no magic at all".getBytes

  test("image_header parses real PNG/JPEG/GIF headers and degrades honestly") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, png), Row(2L, jpeg), Row(3L, gif),
      Row(4L, truncatedPng), Row(5L, sofLessJpeg), Row(6L, junk))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    val got = df
      .select(col("id"), call_function("image_header", col("bin")).as("h"))
      .select(col("id"), col("h.format"), col("h.width"), col("h.height"), col("h.channels"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getInt(4))))).toMap

    assert(got(1L) === (("png", Some(320), Some(200), Some(4))))
    assert(got(2L) === (("jpeg", Some(640), Some(480), Some(3))))
    assert(got(3L) === (("gif", Some(13), Some(7), None)))
    assert(got(4L) === (("png", None, None, None)),
      "truncated PNG must keep the format with null dims")
    assert(got(5L) === (("jpeg", None, None, None)),
      "SOF-less JPEG must keep the format with null dims")
    assert(got(6L) === (("unknown", None, None, None)))
  }

  test("image_header: truncated streams degrade, never read past the buffer") {
    // JPEG ending in a fill-byte run (the marker scan must stop, not index b(n))
    val fillTail = bytes(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xFF)
    val r = graft.functions.ImageHeader.compute(fillTail)
    assert(r.getUTF8String(0).toString === "jpeg" && r.isNullAt(1) && r.isNullAt(2))
    // segment whose declared length runs past the end
    val overLen = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x7F, 0xFF, 0x00)
    val r2 = graft.functions.ImageHeader.compute(overLen)
    assert(r2.getUTF8String(0).toString === "jpeg" && r2.isNullAt(1))
    assert(graft.functions.ImageHeader.compute(Array.empty[Byte])
      .getUTF8String(0).toString === "unknown")
  }

  test("image_header channel table follows the PNG color types") {
    val colorTypes = Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)
    colorTypes.foreach { case (ct, want) =>
      val p = bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
        bytes(0, 0, 0, 13) ++ "IHDR".getBytes ++
        bytes(0, 0, 0, 1, 0, 0, 0, 1, 8, ct, 0, 0, 0)
      val r = graft.functions.ImageHeader.compute(p)
      assert(r.getInt(3) === want, s"colorType $ct")
    }
  }
}
