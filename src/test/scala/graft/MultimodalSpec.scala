package graft

import graft.multimodal.{Multimodal, Pipeline}

class MultimodalSpec extends SparkSpec {

  test("multimodal_meta extracts byte length, digest, sniffed type") {
    val rows = Multimodal.multimodalMeta(tables).collect()
    val docs = tables.documents.count()
    assert(rows.length == docs)
    rows.foreach { r =>
      assert(r.getLong(1) > 0) // n_bytes
      assert(r.getString(2).matches("[0-9a-f]{32}")) // md5 hex
      assert(r.getString(3) == "text/plain") // text payloads sniff as text
    }
  }

  test("Pipeline.features: deterministic fake decode, exact values") {
    import spark.implicits._
    val payload = (1 to 10).map(_.toByte).toArray // len 10 → 3 frames of 3
    val recs = Seq(Pipeline.MediaRecord(7L, "video/fake", payload)).toDS()
    val f = Pipeline.features(recs, Pipeline.FakeDecoder,
      maxDim = 8, frameStride = 2).collect().head
    assert(f.id == 7L && f.mediaType == "video/fake" && f.nBytes == 10L)
    // FakeDecoder: w = 4 + 1%8 = 5, h = 4 + 10%8 = 6, frames = 1 + 10%4 = 3
    assert(f.width == 5 && f.height == 6 && f.nFrames == 3)
    assert(f.sampledFrames == 2) // stride 2 over 3 frames → indexes 0, 2
    // frames are payload slices of len 10/3=3: [1,2,3] and [7,8,9]
    assert(math.abs(f.meanByte - (1 + 2 + 3 + 7 + 8 + 9) / 6.0) < 1e-12)
  }

  test("Pipeline runs distributed over the documents corpus") {
    val feats = Pipeline.features(
      Pipeline.recordsFromDocuments(tables), Pipeline.FakeDecoder).collect()
    assert(feats.length == tables.documents.count())
    assert(feats.forall(f => f.width <= 8 && f.height <= 8 && f.nFrames >= 1))
    // deterministic: same input → same features on rerun
    val again = Pipeline.features(
      Pipeline.recordsFromDocuments(tables), Pipeline.FakeDecoder).collect()
    assert(feats.sortBy(_.id).map(_.meanByte).toSeq ==
      again.sortBy(_.id).map(_.meanByte).toSeq)
  }

  test("RealDecoder is an explicit stub") {
    intercept[UnsupportedOperationException] {
      Pipeline.RealDecoder.decode(Array[Byte](1))
    }
  }

  test("multimodal_features entry = the typed features, rounded, per doc") {
    val entry = Multimodal.multimodalFeatures(tables).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    val direct = Pipeline.features(
      Pipeline.recordsFromDocuments(tables), Pipeline.FakeDecoder)
      .collect()
      .map(f => f.id -> (f.nBytes, f.width, f.height, f.nFrames.toLong,
        f.sampledFrames.toLong,
        graft.functions.Portable.round6Double(f.meanByte))).toMap
    assert(entry == direct)
    assert(entry.size.toLong == tables.documents.count())
  }
}
