package graft

import org.apache.spark.sql.Encoders

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaFeatures, MediaRow}

class MultimodalOpsSpec extends SparkSuite {

  private lazy val media = {
    implicit val enc = Encoders.product[MediaRow]
    spark.createDataset(
      (0L until 100L).map(i =>
        MediaRow(i, s"payload-$i-${"x" * (i % 17).toInt}".getBytes("UTF-8"),
          if (i % 3 == 0) "video" else "image")))
      .repartition(4)
  }

  test("extractFeatures: typed batch decode preserves rows and is deterministic") {
    val f1 = MultimodalOps.extractFeatures(media, batchSize = 8).collect()
    val f2 = MultimodalOps.extractFeatures(media, batchSize = 32).collect()
    assert(f1.length == 100)
    // batch size must not change results — decode is per-row semantically
    assert(f1.sortBy(_.docId).map(_.feature.toSeq).toSeq ==
      f2.sortBy(_.docId).map(_.feature.toSeq).toSeq)
    assert(f1.forall(f => f.width >= 320 && f.height >= 240 && f.feature.length == 8))
    assert(f1.filter(_.nFrames > 1).forall(_.docId % 3 == 0))
  }
}
