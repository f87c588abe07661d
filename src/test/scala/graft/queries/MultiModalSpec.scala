package graft.queries

import graft.SparkSuite
import graft.queries.MultiModalOps.{Asset, StubCodec}
import org.apache.spark.sql.functions.col

class MultiModalSpec extends SparkSuite {

  test("stub codec is deterministic and computes byte stats") {
    val a = Asset(1L, "image", "abab".getBytes("UTF-8"), 10, 10, 16000)
    val f1 = StubCodec.decode(a)
    val f2 = StubCodec.decode(a)
    assert(f1 == f2)
    assert(f1.n_bytes == 4)
    assert(f1.mean_byte == ("ab".getBytes("UTF-8").map(_.toInt).sum / 2.0))
    assert(math.abs(f1.byte_entropy - 1.0) < 1e-12) // two symbols, equal freq
    assert(f1.n_frames == 1)
  }

  test("feature extraction runs distributed over asset partitions") {
    val feats = MultiModalOps.c6Features(spark, sf)
    val rows = feats.collect()
    assert(rows.length == 500) // one per document at sf0.001
    assert(rows.forall(_.getInt(2) > 0)) // n_bytes
    assert(feats.columns.toSeq ==
      Seq("asset_id", "modality", "n_bytes", "mean_byte", "byte_entropy", "n_frames"))
  }

  test("asset dedup keeps exactly the min asset per payload digest") {
    val rows = MultiModalOps.c6AssetDedup(spark, sf).collect()
    assert(rows.length == 500) // one row per asset
    val byMd5 = rows.groupBy(_.getString(2))
    byMd5.foreach { case (md5, rs) =>
      val kept = rs.filter(_.getBoolean(4))
      assert(kept.length == 1, s"digest $md5: ${kept.length} kept")
      assert(kept.head.getLong(0) == rs.map(_.getLong(0)).min)
      assert(rs.forall(_.getLong(3) == rs.length), s"digest $md5: n_copies")
    }
    // exactly one keeper per distinct payload (the sf0.001/sf0.01
    // corpora carry no duplicate payloads so kept == all here; sf0.1
    // carries 8 duplicated texts and is covered by the sf0.1 pre-flight
    // oracle run)
    assert(rows.count(_.getBoolean(4)) == byMd5.size)
  }

  test("frame near-dup: one-round min propagation over shared frame hashes") {
    val memb = MultiModalOps.c6FrameSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val bucketMin = memb.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val want = memb.groupBy(_._1).view
      .mapValues(_.map(fh => bucketMin(fh._2)).min).toMap
    val got = MultiModalOps.c6FrameNearDup(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (id, rep, kept) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(rep == want(id), s"asset $id")
      assert(rep <= id)
      assert(kept == (id == rep))
    }
  }

  test("frame-set MinHash near-dup: high-Jaccard frame sets collapse, disjoint stay apart") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the discrimination c6_frame_neardup can't make: B shares 95% of
    // A's frames (Jaccard ≈ 0.90 — a trim/appended-tail edit) and must
    // band-collide; C is fully disjoint and must stay its own cluster,
    // even though a single-shared-frame rule would treat both the same
    // way if any one frame coincided
    val f = (0 until 100).map(i => s"f$i")
    val rows = Seq(
      (1L, f),
      (2L, f.take(95) ++ Seq("g1", "g2", "g3", "g4", "g5")),
      (3L, (0 until 100).map(i => s"z$i")))
    val got = graft.dedup.MinHash
      .dedupAssignmentsFromSets(rows.toDF("asset_id", "frames"),
        col("asset_id"), col("frames"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L)
    assert(got(2L) == 1L, "95%-overlap frame sets must share an LSH band")
    assert(got(3L) == 3L, "disjoint frame set must keep its own cluster")
    // and the declared query agrees with the one-round assignment shape
    val q = MultiModalOps.c6FrameNearDupMinhash(spark, sf).collect()
    assert(q.length == MultiModalOps.c6FrameNearDup(spark, sf).count())
    q.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      assert(r.getBoolean(2) == (r.getLong(0) == r.getLong(1)))
    }
  }

  test("frame sampling: every 4th 256-byte frame, consistent with n_frames") {
    val df = MultiModalOps.c6FrameSample(spark, sf)
    val byAsset = df.collect().groupBy(_.getLong(0))
    val nFrames = MultiModalOps.c6Features(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(5))).toMap
    byAsset.foreach { case (id, rs) =>
      val expected = math.ceil(math.max(nFrames(id), 1) / 4.0).toInt
      assert(rs.length == expected, s"asset $id")
      assert(rs.forall(_.getInt(4) <= StubCodec.FrameBytes))
    }
  }

  test("c6_scene_cut matches an in-memory brute-force segmentation") {
    val got = MultiModalOps.c6SceneCut(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getBoolean(4), r.getLong(5)))
    assert(got.nonEmpty)
    // both verdicts must occur, or the threshold is degenerate
    assert(got.exists(r => r._2 > 0 && r._5))
    assert(got.exists(r => r._2 > 0 && !r._5))
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .filter(_.getLong(0) % 3 == 2)
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = texts.toSeq.flatMap { case (id, text) =>
      val fb = StubCodec.FrameBytes
      val frames = (0 until math.max((text.length + fb - 1) / fb, 1))
        .map(f => text.slice(f * fb, (f + 1) * fb))
      var scene = 0L
      frames.zipWithIndex.map { case (fs, i) =>
        val s = fs.map(_.toLong).sum
        val l = fs.length
        val cut = i == 0 || {
          val (ps, pl) = (frames(i - 1).map(_.toLong).sum, frames(i - 1).length)
          math.abs(s * pl - ps * l) > 3L * l * pl
        }
        if (cut) scene += 1
        (id, i, s, l, cut, scene)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
  }
}
