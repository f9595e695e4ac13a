package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SimilarityMultimodalSpec extends AnyFunSuite with SparkSpec {

  test("s02 sign-LSH recall vs s01 brute force >= 0.8 at sf0.001") {
    val exact = Similarity.s01(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.s02(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low (exact=$exact approx=$approx)")
  }

  test("s04 IVF recall vs s01 brute force >= 0.6 at sf0.001") {
    val exact = Similarity.s01(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.s04(spark, sfSmoke, nlist = 8, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }

  test("s04 quantizer is fitted on the hash-prefix sample, not the corpus") {
    val norm = Similarity.normalized(graft.Tables.embeddings(spark, sfSmoke))
    val sampleCount = Similarity.ivfFitSample(norm).count()
    val corpusCount = norm.count()
    assert(sampleCount > 0 && sampleCount < corpusCount / 2,
      s"sample $sampleCount should be a strict sketch of corpus $corpusCount")
    val km = Similarity.ivfQuantizer(norm, nlist = 8)
    // the model's training summary records exactly what the fit consumed
    assert(km.hasSummary && km.summary.predictions.count() == sampleCount,
      "KMeans fit input must be the deterministic sample")
  }

  test("s06 PQ: 16-byte codes, recall >= 0.6 vs exact, codebooks fitted on the sample") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sfSmoke)
    // the training draw is bounded and rerun-stable
    val train = Similarity.pqTrainSample(e)
    assert(train.length == math.min(Similarity.PqTrainCap, e.count()))
    assert(train.map(_.toSeq).toSeq == Similarity.pqTrainSample(e).map(_.toSeq).toSeq)
    val cb = Similarity.pqCodebooks(train)
    assert(cb.length == Similarity.PqM && cb.forall(_.length == Similarity.PqK))
    val codes = Similarity.pqEncode(e, cb)
    // the compression claim: every vector is exactly M code bytes
    assert(codes.select($"codes").as[Array[Byte]].collect()
      .forall(_.length == Similarity.PqM))
    val exact = Similarity.s01(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.s06(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= Similarity.S04RecallFloor, s"PQ recall $recall too low")
  }

  test("d07 prefilter prunes hard AND loses nothing vs exact all-pairs at floor 0.9") {
    import spark.implicits._
    val aug = Similarity.plantNearDups(graft.Tables.embeddings(spark, sfSmoke)).cache()
    val n = aug.count()
    val allPairs = n * (n - 1) / 2
    val candCount = Similarity.d07Candidates(aug).count()
    assert(candCount < allPairs / 4,
      s"prefilter admitted $candCount of $allPairs pairs — not a prune")
    val exact = aug.select($"vec_id".as("a"), $"embedding".as("ea"))
      .join(aug.select($"vec_id".as("b"), $"embedding".as("eb")), $"a" < $"b")
      .select($"a", $"b", Similarity.cosine($"ea", $"eb").as("cosine"))
      .filter($"cosine" >= Similarity.NearDupFloor)
      .select($"a", $"b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.d07(spark, sfSmoke)
      .select($"a", $"b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "planted near-dups should survive the 0.9 floor")
    assert(got == exact, s"prune-then-verify diverged from exact: " +
      s"missing=${exact -- got} extra=${got -- exact}")
  }

  test("s07 centroids match a driver-side float mean within quantization error") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rows = Similarity.s07(spark, sfSmoke).collect()
    assert(rows.nonEmpty && rows.length % 64 == 0)
    // independent truth for one (label, dim) cell, computed on the driver
    val (label, dim) = (rows.head.getAs[Int]("label"), 3)
    val xs = graft.Tables.embeddings(spark, sfSmoke)
      .filter($"label" === label)
      .select(element_at($"embedding", dim + 1).cast("double"))
      .collect().map(_.getDouble(0))
    val truth = xs.sum / xs.length
    val got = rows.find(r => r.getAs[Int]("label") == label && r.getAs[Int]("dim") == dim)
      .get.getAs[Double]("centroid")
    // fixed-point floor(x*1e9) undercounts each element by < 1e-9
    assert(math.abs(got - truth) < 1e-8, s"$got vs $truth")
    assert(got <= truth + 1e-12) // quantization only rounds DOWN
  }

  test("s08 semantic dedup finds every planted pair inside one cluster and drops by centroid-sim") {
    import spark.implicits._
    val rows = Similarity.s08(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    // all reported pairs clear the floor, and the drop is one of the pair
    rows.foreach { r =>
      assert(r.getAs[Double]("cosine") >= Similarity.NearDupFloor)
      val d = r.getAs[Long]("drop_id")
      assert(d == r.getAs[Long]("a") || d == r.getAs[Long]("b"))
    }
    // the planted (v, v+offset) pairs dominate: each plant is a near-dup of
    // its source, and nothing in the raw corpus sits above the 0.9 floor
    val planted = rows.filter(r =>
      r.getAs[Long]("b") == r.getAs[Long]("a") + Similarity.PlantOffset)
    assert(planted.length == rows.length, "unexpected non-planted pair above floor")
    val nPlants = graft.Tables.embeddings(spark, sfSmoke)
      .filter($"vec_id" % 10 === 0).count()
    // a plant can only be missed if prototype assignment split the pair
    assert(planted.length >= (nPlants * 9) / 10,
      s"found ${planted.length} of $nPlants planted pairs")
    // drop rule: the dropped member is the one MORE similar to its centroid
    val sims = Similarity
      .labelCentroids(graft.Tables.embeddings(spark, sfSmoke))
      .crossJoin(Similarity.plantNearDups(graft.Tables.embeddings(spark, sfSmoke)))
      .select($"vec_id", $"label",
        Similarity.cosineQ($"embedding", $"centroid").as("sim"))
      .groupBy($"vec_id").agg(org.apache.spark.sql.functions.max($"sim").as("best"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (a, b, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("drop_id"))
      val kept = if (d == a) b else a
      assert(sims(d) >= sims(kept),
        s"pair ($a,$b): dropped $d sim=${sims(d)} < kept $kept sim=${sims(kept)}")
    }
  }

  test("s09 hard negatives: labels always differ, and each anchor gets the true top-3 different-label neighbors") {
    import spark.implicits._
    val rows = Similarity.s09(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    // driver-side brute force over the small corpus
    val e = graft.Tables.embeddings(spark, sfSmoke)
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val anchors = e.filter(_._1 < 5)
    val cands = e.filter(_._1 >= 5)
    val expected = anchors.flatMap { case (qid, qlab, qe) =>
      cands.filter(_._2 != qlab)
        .map { case (cid, clab, ce) => (qid, qlab, cid, clab, cos(qe, ce)) }
        .sortBy { case (_, _, cid, _, c) => (-c, cid) }
        .take(3)
    }
    assert(rows.length == anchors.length * 3)
    rows.foreach { case (_, qlab, _, clab, _) =>
      assert(qlab != clab, "a hard negative must carry a different label")
    }
    val got = rows.map { case (q, _, c, _, _) => (q, c) }.toSet
    val want = expected.map { case (q, _, c, _, _) => (q, c) }.toSet
    assert(got == want, s"mined pairs diverge: got $got want $want")
  }

  test("cosine is symmetric, bounded, and 1.0 on self") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val v = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val self = v.select(Similarity.cosine($"a", $"b")).collect()(0).getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
    val w = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    assert(w.select(Similarity.cosine($"a", $"b")).collect()(0).getDouble(0) == 0.0)
  }

  test("m04 frame dedup: ratios bounded, totals match a direct frame-hash recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Multimodal.m04(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dup) = (r.getAs[Long]("n_distinct_frames"), r.getAs[Long]("n_dup_frames"))
      assert(dup >= 0 && dup <= n)
    }
    // direct recompute of the distinct-frame totals from the frame stage
    val expected = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sfSmoke)).toDF()
      .select($"media_id", md5($"frame_bytes").as("fh")).distinct()
      .groupBy($"media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_.getAs[Long]("n_distinct_frames") > 0).foreach { r =>
      assert(expected(r.getAs[Long]("media_id")) == r.getAs[Long]("n_distinct_frames"))
    }
  }

  test("multimodal pipeline: decode/features/frames consistent and partition-preserving") {
    val media = Multimodal.mediaTable(spark, sfSmoke)
    val nParts = media.rdd.getNumPartitions
    val decoded = Multimodal.decode(media)
    assert(decoded.rdd.getNumPartitions == nParts) // narrow, no shuffle
    val d = decoded.collect()
    assert(d.length == media.count())
    assert(d.forall(r => r.byte_len > 0 && r.width > 0 && r.height > 0))
    // frame count follows the payload length for videos, 1 otherwise
    assert(d.filter(_.modality == "video").forall(r => r.n_frames == 1 + r.byte_len / 64))
    assert(d.filter(_.modality != "video").forall(_.n_frames == 1))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(f => f.entropy > 0 && f.entropy <= 8.0)) // ≤ log2(256)
    assert(feats.forall(f => f.mean_byte > 0 && f.mean_byte < 256))
    // the advisory entropy agrees with its gated integer surrogate: both
    // zero together, and the Rényi-2 entropy −log2(Σp²) reconstructed from
    // the impurity (Σp² = 1 − impurity/n²) lower-bounds Shannon entropy
    val lenById = d.map(r => r.media_id -> r.byte_len.toLong).toMap
    feats.foreach { f =>
      assert((f.entropy == 0.0) == (f.coll_impurity == 0L))
      val n2 = lenById(f.media_id) * lenById(f.media_id)
      val collision = 1.0 - f.coll_impurity.toDouble / n2
      val renyi2 = -math.log(collision) / math.log(2)
      assert(f.entropy >= renyi2 - 1e-9,
        s"media ${f.media_id}: Shannon ${f.entropy} < Rényi-2 $renyi2")
    }
    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0)) // stride honored
    assert(frames.forall(_.frame_bytes.length <= 64))
  }

  test("m05 frameSig: exact bits on a crafted block; tail bytes ignored") {
    // 30 bytes of 100 then 30 of 200: total 9000, so 60·100 < 9000 (bits
    // 0–29 clear) and 60·200 ≥ 9000 (bits 30–59 set); the last 4 bytes
    // must not matter
    val block = Array.fill(30)(100.toByte) ++ Array.fill(30)(200.toByte) ++
      Array.fill(4)(7.toByte)
    val expected = ((1L << 30) - 1) << 30
    assert(Multimodal.frameSig(block) == expected)
    assert(Multimodal.frameSig(block.dropRight(4) ++ Array.fill(4)(99.toByte))
      == expected)
    // exact mean boundary counts as set (>=): all-equal bytes → all 60 bits
    assert(Multimodal.frameSig(Array.fill(64)(50.toByte)) == (1L << 60) - 1)
  }

  test("m05 banding is lossless: engine pairs equal a local brute-force hamming scan") {
    val out = Multimodal.m05(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // recompute from the same payload bytes, no banding
    val media = Multimodal.mediaTable(spark, sfSmoke)
    val sigs = Multimodal.sampleFrames(media).collect()
      .filter(_.frame_bytes.length == 64)
      .map(f => (f.media_id, Multimodal.frameSig(f.frame_bytes)))
      .distinct
    val want = (for {
      (ma, sa) <- sigs; (mb, sb) <- sigs if ma < mb
      if java.lang.Long.bitCount(sa ^ sb) <= Multimodal.PHashRadius
    } yield (ma, mb)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == want)
    assert(out.nonEmpty, "smoke corpus should contain perceptual near-dups")
  }

  test("m06 alignment: one row per planted caption; true pair beats the shuffled decoy") {
    val rows = Multimodal.m06(spark, sfSmoke).collect()
    val nPlanted = graft.Tables.embeddings(spark, sfSmoke)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 0).count()
    assert(rows.length == nPlanted, s"${rows.length} rows vs $nPlanted planted captions")
    rows.foreach { r =>
      val (cap, t, d, aligned) =
        (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      assert(t >= 0.9, s"cap $cap: true pair cosine $t below the planted near-dup floor")
      assert(d < 0.9, s"cap $cap: decoy cosine $d implausibly high")
      assert(aligned == (t > d))
    }
    // planted corpus is aligned by construction — the audit must say so
    assert(rows.forall(_.getBoolean(3)), "planted pairs misclassified as misaligned")
  }
}
