package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 codec-surface tests: the GIF leg of the real image path (q182)
  * agrees with q140's analytic pixels, and JPEG — the JDK's fourth image
  * codec — runs through the same real encode → decode → resample path
  * with its loss bounded (the reason it is pinned here instead of an
  * exact DuckDB oracle). */
class Round6Spec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q182 GIF decode emits exactly q140's pixel features " +
       "(same formulas, third lossless codec)") {
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val gif = key(Multimodal.q182GifDecode(spark, dir).collect())
    val pngBmp = key(Multimodal.q140ImageDecode(spark, dir).collect())
    assert(gif.keySet === pngBmp.keySet)
    for ((id, feats) <- pngBmp)
      assert(gif(id) === feats, s"GIF decode diverged from PNG/BMP at doc $id")
  }

  test("JPEG absorbs into the real codec path: encode → decode keeps " +
       "geometry, loss stays bounded (and nonzero — hence no exact oracle)") {
    var sawLoss = false
    for (id <- Seq(3L, 7L, 12L)) {
      val w = (16 + (id * 37 + 11) % 48).toInt
      val h = (16 + (id * 53 + 7) % 48).toInt
      val bytes = Multimodal.encodeImage(id, w, h, "jpg")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK JPEG reader failed on its own writer, doc $id")
      assert(img.getWidth == w && img.getHeight == h)
      var maxErr = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val got = img.getRGB(x, y) & 0xff
          val want = Multimodal.pixel(id, x, y)
          maxErr = math.max(maxErr, math.abs(got - want))
          x += 1
        }
        y += 1
      }
      assert(maxErr <= 64, s"JPEG loss out of expected envelope: $maxErr")
      if (maxErr > 0) sawLoss = true
    }
    assert(sawLoss, "JPEG round-tripped bit-exactly — if the JDK codec " +
      "became lossless, promote it to an exact-oracle query like q182")
  }
}
