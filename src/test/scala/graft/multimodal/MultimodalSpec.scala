package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  test("assets derive deterministically and decode in partition batches") {
    val assets = assetsFromDocuments(spark, "/root/testdata/sf0.001")
    val features = decode(assets).collect()
    assert(features.length == 500)
    // formats cycle by id
    val byFormat = features.groupBy(_.format).view.mapValues(_.length).toMap
    assert(byFormat.keySet == Set("png", "jpg", "webp"))
    // stub decode is deterministic and in-range
    val f = features.find(_.asset_id == 0).get
    assert(f.channels == 4 || f.channels == 3)
    assert(f.width >= 64 && f.width < 576)
    assert(f.height >= 64 && f.height < 576)
    assert(f.mean_luma >= 0.0 && f.mean_luma <= 1.0)
    val again = decode(assetsFromDocuments(spark, "/root/testdata/sf0.001"))
      .collect().find(_.asset_id == 0).get
    assert(again == f)
  }

  test("binary payload round-trips through the typed Dataset") {
    import spark.implicits._
    val a = Seq(Asset(1L, "png", Array[Byte](1, 2, 3))).toDS()
    val d = decode(a).head()
    assert(d.byte_len == 3)
    assert(d.channels == 4)
  }
}
