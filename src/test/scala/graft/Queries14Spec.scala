package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis, TrainPrep}

/** Round-14: DSIR importance weights, token-budget planning, corpus-wide
  * BPE encoding, and the whitened PCA projection.
  */
class Queries14Spec extends SparkSpec {
  import spark.implicits._

  // ── dsirWeights ───────────────────────────────────────────────────

  test("dsirWeights: documents made of target-corpus tokens outweigh documents of target-absent tokens") {
    // target speaks {alpha, beta}; raw has one doc in-distribution and
    // one far out. Multiple distinct tokens per side so a single
    // bucket collision cannot flip the ordering.
    val raw = Seq(
      (0L, "alpha beta alpha beta alpha beta"),
      (1L, "zulu yankee xray zulu yankee xray")
    ).toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val r = TrainPrep.dsirWeights(raw, target).orderBy("doc_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(6L, 6L), "token counts")
    assert(r(0).getLong(2) > r(1).getLong(2),
      s"in-target doc must outweigh out-of-target doc: ${r.toSeq}")
  }

  test("dsirWeights: every raw doc_id is present (zero-token docs score 0), and the weights are partitioning-invariant") {
    val raw = Seq(
      (0L, "alpha beta"), (1L, ""), (2L, "gamma delta gamma")
    ).toDF("doc_id", "text")
    val target = Seq((9L, "alpha")).toDF("doc_id", "text")
    val base = TrainPrep.dsirWeights(raw, target).orderBy("doc_id").collect()
    assert(base.length == 3)
    assert(base(1).getLong(1) == 0L && base(1).getLong(2) == 0L,
      "an empty doc is present with zeros")
    val shuffled = TrainPrep.dsirWeights(raw.repartition(7), target.repartition(3))
      .orderBy("doc_id").collect()
    assert(base.map(_.toSeq).toSeq == shuffled.map(_.toSeq).toSeq,
      "bucket-grain integerization must make the sum partitioning-invariant")
  }

  test("dsirWeights: raw == target degenerates to near-flat weights (smoothing-only differences)") {
    val d = Seq(
      (0L, "one two three"), (1L, "four five six")
    ).toDF("doc_id", "text")
    val r = TrainPrep.dsirWeights(d, d).orderBy("doc_id").collect()
    // identical distributions: per-bucket log-ratio is exactly 0 when
    // c_tgt == c_raw and N_tgt == N_raw -> every doc scores 0
    assert(r.forall(_.getLong(2) == 0L),
      s"raw==target must zero every log-ratio, got ${r.toSeq}")
  }

  // ── dsirSelect ────────────────────────────────────────────────────

  test("dsirSelect: top-quota selection by weight, threshold ties excluded, vacuous quota keeps all") {
    // target speaks alpha/beta; 2 docs in-distribution, 6 out — a 25%
    // quota must keep exactly the top-weighted tier
    val raw = (Seq(
      (0L, "alpha beta alpha beta"), (1L, "alpha beta alpha alpha")) ++
      (2L until 8L).map(i => (i, "zulu yankee xray whisky")))
      .toDF("doc_id", "text")
    val target = Seq((99L, "alpha beta")).toDF("doc_id", "text")
    val r = TrainPrep.dsirSelect(raw, target, keepPpm = 250000L)
      .orderBy("doc_id").collect()
    assert(r.count(_.getBoolean(3)) == 2, s"8 docs * 25% = 2 kept: ${r.toSeq}")
    assert(r(0).getBoolean(3) && r(1).getBoolean(3),
      "the in-target docs must be the kept ones")
    // identical docs tie at the threshold: strictly-above semantics
    // drop the WHOLE tie class (deterministic under-fill)
    val tied = (0L until 8L).map(i => (i, "same text every doc"))
      .toDF("doc_id", "text")
    val rt = TrainPrep.dsirSelect(tied, target, keepPpm = 250000L).collect()
    assert(rt.forall(!_.getBoolean(3)),
      "an all-tied corpus has no doc strictly above the threshold")
    // keepPpm = 1e6: the rank-<1 vacuous branch keeps everything
    val all = TrainPrep.dsirSelect(tied, target, keepPpm = 1000000L).collect()
    assert(all.forall(_.getBoolean(3)), "full quota keeps every doc")
  }

  // ── tokenBudgetPlan ───────────────────────────────────────────────

  test("tokenBudgetPlan: hand-checked sqrt-temperature plan, epoch ppm, and the oversampled flag") {
    // s1: 100 tokens, s2: 400 -> sqrt weights 10:20 -> 333333/666666 ppm
    val docs = Seq.tabulate(10)(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "s1")) ++
      Seq.tabulate(20)(i => (100L + i, Seq.fill(20)("w").mkString(" "), "s2"))
    val df = docs.toDF("doc_id", "text", "source")
    val r = TrainPrep.tokenBudgetPlan(df, budget = 300L).orderBy("source").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("s1", 10L, 100L), ("s2", 20L, 400L)))
    assert(r.map(_.getLong(3)).toSeq == Seq(333333L, 666666L), "weight ppm")
    assert(r.map(_.getLong(4)).toSeq == Seq(99L, 199L), "planned tokens")
    assert(r.map(_.getLong(5)).toSeq == Seq(990000L, 497500L), "epochs ppm")
    assert(r.forall(!_.getBoolean(6)), "no source oversampled at this budget")
  }

  test("tokenBudgetPlan: a tiny source under a big budget is flagged oversampled") {
    val docs = (Seq((0L, "a b c", "tiny")) ++
      Seq.tabulate(50)(i => (10L + i, Seq.fill(40)("w").mkString(" "), "big")))
      .toDF("doc_id", "text", "source")
    val r = TrainPrep.tokenBudgetPlan(docs, budget = 4000L)
      .orderBy("source").collect()
    val tiny = r.find(_.getString(0) == "tiny").get
    assert(tiny.getBoolean(6), s"3-token source drawn >3 tokens must flag: $tiny")
    assert(tiny.getLong(5) > 1000000L)
  }

  // ── bpeEncodeCorpus ───────────────────────────────────────────────

  test("bpeEncodeCorpus: hand-checked token counts, fertility and compression under one learned merge") {
    // word freqs: ab:2, abc:1 -> top pair (a,b) merges; encodings:
    // 'ab' -> [ab] (1 tok), 'abc' -> [ab, c] (2 toks)
    val docs = Seq((0L, "ab ab"), (1L, "abc")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeEncodeCorpus(docs, rounds = 1).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 2L && r(0).getLong(3) == 4L)
    assert(r(0).getLong(4) == 1000000L && r(0).getLong(5) == 500000L)
    assert(r(1).getLong(1) == 1L && r(1).getLong(2) == 2L && r(1).getLong(3) == 3L)
    assert(r(1).getLong(4) == 2000000L && r(1).getLong(5) == 666666L)
  }

  test("bpeEncodeCorpus: zero-token docs stay present with zeros; more rounds never increase a doc's token count") {
    val docs = Seq((0L, ""), (1L, "aaaa aaaa aaaa"), (2L, "bb cc")).toDF("doc_id", "text")
    val r1 = TextAnalysis.bpeEncodeCorpus(docs, rounds = 1).orderBy("doc_id").collect()
    val r4 = TextAnalysis.bpeEncodeCorpus(docs, rounds = 4).orderBy("doc_id").collect()
    assert(r1.length == 3 && r1(0).getLong(2) == 0L && r1(0).getLong(4) == 0L)
    assert(r1.zip(r4).forall { case (a, b) => b.getLong(2) <= a.getLong(2) },
      "each extra merge can only fuse symbols")
    // rounds=0 is rejected, the untrained identity encode is rounds-free
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncodeCorpus(docs, rounds = 0).collect()
    }
  }

  // ── pcaWhitenProject ──────────────────────────────────────────────

  test("pcaWhitenProject: whitened components land at unit variance on the 1e6 grid for an anisotropic cloud") {
    // 40 vectors along two orthogonal directions with variances ~100:1
    // (dim0 stretched, dim1 compressed, dims 2-3 ~0)
    val vecs = (0 until 40).map { i =>
      val t = (i - 20).toFloat
      (i.toLong, Array(t * 0.02f, ((i % 5) - 2) * 0.002f, 0.0f, 0.0f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val r = Similarity.pcaWhitenProject(df, k = 2, iters = 12).collect()
    def rms(xs: Seq[Long]): Double =
      math.sqrt(xs.map(x => x.toDouble * x).sum / xs.length)
    val rms1 = rms(r.map(_.getLong(1)).toSeq)
    val rms2 = rms(r.map(_.getLong(2)).toSeq)
    assert(math.abs(rms1 - 1e6) / 1e6 < 0.25, s"pc1 rms $rms1 !~ 1e6")
    assert(math.abs(rms2 - 1e6) / 1e6 < 0.25, s"pc2 rms $rms2 !~ 1e6")
    // the raw projections differ by ~100x variance; whitening undid that
    val p = Similarity.pcaProject(df, k = 2, iters = 12).collect()
    val rawRatio = rms(p.map(_.getLong(1)).toSeq) / rms(p.map(_.getLong(2)).toSeq)
    assert(rawRatio > 5.0, s"cloud must be anisotropic for this test, got $rawRatio")
  }

  test("pcaWhitenProject: whitening preserves each component's ordering, and identical vectors whiten to exact zero") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array((i * 0.01f) - 0.15f, (i % 3) * 0.005f, 0.001f * (i % 7)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val num = Similarity.pcaProject(df, k = 2, iters = 12)
      .orderBy("vec_id").collect()
    val wht = Similarity.pcaWhitenProject(df, k = 2, iters = 12)
      .orderBy("vec_id").collect()
    // truncation-toward-zero by one positive constant is monotone:
    // num_a <= num_b  ⇒  white_a <= white_b, component-wise
    for (c <- 1 to 2) {
      val pairs = num.map(_.getLong(c)).zip(wht.map(_.getLong(c))).sortBy(_._1)
      assert(pairs.sliding(2).forall(w =>
        w.length < 2 || w(0)._2 <= w(1)._2),
        s"whitening must preserve pc$c ordering")
    }

    val same = (0 until 10).map(i => (i.toLong, Array(0.1f, -0.2f, 0.3f)))
      .toDF("vec_id", "embedding")
    val z = Similarity.pcaWhitenProject(same, k = 2, iters = 12).collect()
    assert(z.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L),
      "identical vectors center to exactly zero and stay zero whitened")
  }

  // ── repetitionExcise ──────────────────────────────────────────────

  test("repetitionExcise: a doc repeating its own opening keeps the first occurrence; cross-doc duplication is untouched") {
    val docs = Seq(
      (0L, "a b c d e a b c d e"),  // pos-5 span repeats pos-0's key
      (1L, "a b c d e x y z"),      // shares a span with doc 0 — NOT within-doc
      (2L, "p q r s t")
    ).toDF("doc_id", "text")
    val r = Dedup.repetitionExcise(docs, w = 5).orderBy("doc_id").collect()
    assert(r(0).getString(1) == "a b c d e",
      s"the trailing self-repeat must be excised: ${r(0)}")
    assert(r(0).getLong(3) == 5L && r(0).getLong(4) == 1L && r(0).getLong(5) == 10L)
    assert(r(1).getString(1) == "a b c d e x y z",
      "cross-doc duplication is the OTHER operator's job")
    assert(r(2).getLong(3) == 0L)
  }

  test("repetitionExcise: overlapping in-doc repeats remove the position union; every doc_id stays present") {
    // spans 'm n o'@4 and 'n o m'@5 are both second occurrences; their
    // covered ranges 4..6 and 5..7 OVERLAP — the union 4..7 is removed
    val docs = Seq((0L, "z m n o m n o m"), (1L, "")).toDF("doc_id", "text")
    val r = Dedup.repetitionExcise(docs, w = 3).orderBy("doc_id").collect()
    assert(r.length == 2)
    assert(r(0).getString(1) == "z m n o", s"union excision: ${r(0)}")
    assert(r(0).getLong(3) == 4L && r(0).getLong(4) == 2L)
  }

  // ── bpeFertilityByLang ────────────────────────────────────────────

  test("bpeFertilityByLang: the under-represented language pays higher fertility under the corpus-trained merges") {
    // 'en' dominates with word 'ab' (merged), 'xx' only has 'cd'
    // (never merged at rounds=1) — fertility(en)=1 tok/word,
    // fertility(xx)=2
    val docs = (Seq.tabulate(6)(i => (i.toLong, "ab ab ab", "en")) :+
      (100L, "cd cd", "xx")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.bpeFertilityByLang(docs, rounds = 1)
      .orderBy("lang").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("en", 18L, 18L), ("xx", 2L, 4L)))
    assert(r(0).getLong(4) == 1000000L && r(1).getLong(4) == 2000000L,
      s"fertility ppm must expose the equity gap: ${r.toSeq}")
  }

  // ── indexedImage: the shared seeded-raster constructor ────────────

  // palette entries 2 levels apart — all inside ONE cell of the JDK's
  // 5-bit inverse color map, the adversarial case for indexed writes
  private def nearPaletteRgb(i: Int): Int = {
    val c = 0x10 + 2 * (i % 4)
    (c << 16) | (c << 8) | c
  }

  test("indexedImage: an adversarial near-palette (entries 2 levels apart) is exact, survives the GIF writer losslessly, and setRGB on the same indexed model demonstrably snaps") {
    val w = 8; val h = 4
    val img = Multimodal.indexedImage(w, h, nearPaletteRgb)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) == nearPaletteRgb(y * w + x),
        s"index-written raster must be exact at ($x,$y)")

    // the full GIF writer round-trip (encodeGif's exact writer setup)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    for (y <- 0 until h; x <- 0 until w)
      assert((back.getRGB(x, y) & 0xffffff) == nearPaletteRgb(y * w + x),
        s"GIF round-trip must be lossless at ($x,$y)")

    // negative control — the hazard the constructor exists to avoid:
    // BLITTING into an indexed raster (the drawImage composition every
    // naive "render then index" encode pipeline uses) routes through
    // AWT's 5-bit InverseColorMap; palette entries 2 levels apart share
    // one 5-bit cell and collapse to a single index
    val src = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, nearPaletteRgb(y * w + x))
    val bad = new java.awt.image.BufferedImage(
      img.getColorModel,
      img.getColorModel.createCompatibleWritableRaster(w, h), false, null)
    val g = bad.createGraphics()
    try g.drawImage(src, 0, 0, null) finally g.dispose()
    val snapped = (for (y <- 0 until h; x <- 0 until w)
      yield (bad.getRGB(x, y) & 0xffffff) != nearPaletteRgb(y * w + x)).count(identity)
    assert(snapped > 0,
      "drawImage into a near-palette indexed raster is expected to misindex — " +
        "if the JDK fixed its inverse map, the workaround can retire")
  }

  test("gifWithPerturbedTwins: perturbed GIF decodes to the perturbed BMP's stats — the lossless-twin contract behind the gif phash cluster key") {
    for (id <- 0L until 10L) {
      val viaGif = Multimodal.decodeImage(id,
        Multimodal.encodeGif(id, perturb = true))
      val viaBmp = Multimodal.decodeBmp(id,
        Multimodal.perturbBmp(Multimodal.encodeBmp(id)))
      assert(viaGif == viaBmp, s"perturbed GIF diverged from perturbed BMP at id=$id")
    }
  }

  test("TYPE_INT_RGB setRGB (the PNG/JPEG seeded path) has no inverse map: the same near-palette is exact and PNG round-trips losslessly") {
    val w = 8; val h = 4
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, nearPaletteRgb(y * w + x))
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) == nearPaletteRgb(y * w + x),
        "DirectColorModel setRGB must store verbatim")
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    for (y <- 0 until h; x <- 0 until w)
      assert((back.getRGB(x, y) & 0xffffff) == nearPaletteRgb(y * w + x),
        "PNG round-trip of a DirectColorModel raster must be lossless")
  }
}
