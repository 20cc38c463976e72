package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("typed decode pipeline: one meta row per media row, stable values") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "abc".getBytes("UTF-8"), "application/octet-stream"),
      Multimodal.MediaRow(2L, Array.empty[Byte], "application/octet-stream"))
      .toDS()
    val metas = Multimodal.decodeMeta(media).collect().sortBy(_.doc_id)
    assert(metas.length == 2)
    assert(metas(0).byte_len == 3 && metas(0).width == 3 && metas(0).channels == 3)
    assert(metas(1).byte_len == 0 && metas(1).sig == 0xcbf29ce484222325L)
    // decode is deterministic
    val again = Multimodal.decodeMeta(media).collect().sortBy(_.doc_id)
    assert(metas.toSeq == again.toSeq)
  }

  test("decode_typed query agrees with the SQL decode stub on shared fields") {
    val typed = SparkEntry.queries("multimodal_decode_typed")(spark, sf)
      .select("doc_id", "byte_len", "width", "height")
    val sql = SparkEntry.queries("multimodal_decode_stub")(spark, sf)
      .select("doc_id", "byte_len", "width", "height")
    assert(typed.exceptAll(sql).count() == 0)
    assert(sql.exceptAll(typed).count() == 0)
  }
}
