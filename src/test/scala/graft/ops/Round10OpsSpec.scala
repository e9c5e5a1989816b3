package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 operators: full JPEG SOFn frame-marker coverage and the
  * exact-substring (maximal shared run) dedup cut.
  */
class Round10OpsSpec extends SparkSpec {

  test("imageDims: all SOFn frame markers resolve except DHT/JPG/DAC") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val app0 = "FFE0" + "0010" + "4A46494600010100000100010000"
    def frame(marker: String) = hexBytes("FFD8" + app0 +
      marker + "0011" + "08" + "0140" + "00F0" + "03012200021101031101")
    // arithmetic-coded SOF9, lossless SOF3, differential SOF5,
    // arithmetic-lossless SOF15 — all share the SOF0 header layout and
    // must parse (320x320 would be h=0x0140 w=0x00F0 → 240x320)
    val sof9 = frame("FFC9")
    val sof3 = frame("FFC3")
    val sof5 = frame("FFC5")
    val sof15 = frame("FFCF")
    // DHT (C4) is NOT a frame header: its payload here is gibberish for
    // a Huffman table but the walk must skip it BY LENGTH and then find
    // the real SOF9 that follows
    val dhtThenSof9 = hexBytes("FFD8" + app0 +
      "FFC4" + "0011" + "08" + "9999" + "9999" + "03012200021101031101" +
      "FFC9" + "0011" + "08" + "0140" + "00F0" + "03012200021101031101")
    val packed = spark.createDataFrame(Seq(
        (1L, sof9), (2L, sof3), (3L, sof5), (4L, sof15), (5L, dhtThenSof9)))
      .toDF("id", "payload")
    val out = MultimodalOps.imageDims(packed).collect()
      .map(d => d.id -> ((d.format, d.width, d.height))).toMap
    (1L to 5L).foreach { id =>
      assert(out(id) === (("jpeg", 240L, 320L)), s"id=$id")
    }
  }
}
