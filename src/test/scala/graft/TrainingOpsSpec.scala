package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.{Similarity, VecCore}
import graft.text.{TextAnalysis, TextCore}

/** Training-data pipeline operators: dedup, similarity, text analysis,
  * multimodal plumbing. */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
  lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("exact dedup: survivors + counts reconcile") {
    val base = docs.select($"doc_id", $"text")
    // plant exact duplicates
    val dup = base.filter($"doc_id" < 10)
      .withColumn("doc_id", $"doc_id" + 100000)
    val all = base.unionByName(dup)
    val groups = Dedup.exact(all)
    assert(groups.agg(sum("dup_count")).as[Long].collect()(0) === all.count())
    assert(groups.filter($"dup_count" >= 2).count() >= 10)
    val survivors = Dedup.exactSurvivors(all)
    assert(survivors.count() === groups.count())
    // survivor of a planted dup is the original (min id)
    assert(survivors.filter($"doc_id" >= 100000).count() === 0)
  }

  test("minhash LSH finds planted near-duplicates, skips unrelated") {
    val base = docs.select($"doc_id", $"text").limit(100)
    // near-dup: append two words to the end (high shingle overlap)
    val near = base.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", concat($"text", lit(" extra tail")))
    val pairs = Dedup.minhashLshPairs(base.unionByName(near), threshold = 0.5).cache()
    val planted = pairs.filter($"doc_b" - $"doc_a" === 100000)
    assert(planted.count() >= 4, s"found ${planted.count()} of 5 planted near-dups")
    // estimates in range
    pairs.collect().foreach(r => assert(r.getAs[Double]("jaccard_est") >= 0.5))
    pairs.unpersist()
  }

  test("ngram jaccard verifies LSH candidates exactly") {
    val base = docs.select($"doc_id", $"text").limit(60)
    val near = base.filter($"doc_id" < 3)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", concat($"text", lit(" tail")))
    val pairs = Dedup.ngramJaccardPairs(base.unionByName(near), threshold = 0.6)
    val planted = pairs.filter($"doc_b" - $"doc_a" === 100000).collect()
    assert(planted.length >= 2)
    planted.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.6 && j < 1.0)
    }
  }

  test("containment: full inclusion scores 1.0 where jaccard stays low") {
    val a = Seq((1L, "alpha beta gamma delta epsilon zeta"))
    // b fully contains a's text plus a long unrelated tail
    val b = Seq((2L, "alpha beta gamma delta epsilon zeta " +
      "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"))
    val d = (a ++ b).toDF("doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.containmentVerify(cand, d, threshold = 0.9).collect()
    assert(r.length === 1)
    // every shingle of a appears in b
    assert(r(0).getAs[Double]("containment_ab") === 1.0)
    // but b is mostly NOT in a, and symmetric jaccard would miss the pair
    assert(r(0).getAs[Double]("containment_ba") < 0.5)
    val j = Dedup.jaccardVerify(cand, d, threshold = 0.0).collect()
    assert(j(0).getAs[Double]("jaccard") < 0.5)
    // the gate drops unrelated pairs in both directions
    val neg = Seq((3L, "completely different words entirely here now"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentVerify(Seq((1L, 3L)).toDF("doc_a", "doc_b"),
      d.unionByName(neg), threshold = 0.9).count() === 0)
  }

  test("simhash blocking finds hamming<=3 pairs with full recall vs brute force") {
    val base = docs.select($"doc_id", $"text").limit(150)
    val near = base.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", concat($"text", lit(" x")))
    val all = base.unionByName(near).cache()
    val pairs = Dedup.simhashPairs(all, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute force ground truth
    val sigs = all.collect().map(r => r.getLong(0) -> TextCore.simhash(r.getString(1)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && TextCore.hamming(sa, sb) <= 3
    } yield (ia, ib)).toSet
    assert(pairs === brute)
    assert(brute.nonEmpty) // planted pairs land within hamming 3
    all.unpersist()
  }

  test("embedding near-dup pairs are symmetric-safe and above threshold") {
    val base = embs.select($"vec_id", $"embedding").limit(120)
    val near = base.filter($"vec_id" < 5)
      .withColumn("vec_id", $"vec_id" + 100000) // identical vectors, cos=1
    val pairs = Dedup.embeddingNearDupPairs(base.unionByName(near), threshold = 0.999)
    val planted = pairs.filter($"id_b" - $"id_a" === 100000)
    assert(planted.count() === 5)
  }

  test("brute-force cosine kNN matches local ground truth") {
    val queries = embs.filter($"vec_id" < 3)
    val got = Similarity.bruteForceKnn(queries, embs, k = 5)
      .orderBy($"query_id", $"knn_rank").collect()
    assert(got.length === 15)
    // local ground truth for query 0
    val all = embs.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val q0 = all.find(_._1 === 0L).get._2
    val expect = all.filter(_._1 !== 0L)
      .map { case (id, v) => (id, VecCore.cosine(q0, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    val got0 = got.filter(_.getAs[Long]("query_id") === 0L)
      .map(r => (r.getAs[Long]("item_id"), r.getAs[Double]("cos")))
    assert(got0.map(_._1).toSeq === expect.map(_._1).toSeq)
    got0.zip(expect).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
  }

  test("LSH kNN recall >= 0.9 vs brute force on retrievable structure") {
    // ANN recall is defined over retrievable (clustered) neighbours: plant
    // 10 perturbed copies (cos ~ 0.95) of each query into the corpus — the
    // true top-10 is then the planted cluster. Uniform-random directions
    // (cos ~ 0.4 "neighbours") are not retrievable by any sub-linear method.
    val queries = embs.filter($"vec_id" < 10).select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    def mix(i: Long) = {
      var z = i * 0x9E3779B97F4A7C15L + 3L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z ^ (z >>> 27)
    }
    val planted = for {
      (qid, v) <- queries.toSeq; c <- 0 until 10
    } yield {
      val noise = v.indices.map(i =>
        ((mix(qid * 1000 + c * 64 + i) & 0xffffL).toDouble / 65535.0 - 0.5).toFloat)
      val scale = 0.25f * (VecCore.norm(v) / math.sqrt(v.length / 12.0)).toFloat
      (qid * 100 + c + 500000L, v.indices.map(i => v(i) + noise(i) * scale).toArray)
    }
    val corpus = embs.select($"vec_id", $"embedding")
      .unionByName(planted.toDF("vec_id", "embedding"))
    val qDf = embs.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceKnn(qDf, corpus, k = 10)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshKnn(qDf, corpus, k = 10, bits = 12, tables = 6)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.9, s"LSH recall $recall too low")
    // sanity: the planted clusters really are the true neighbours
    assert(brute.count(_._2 >= 500000L).toDouble / brute.size > 0.9)

    // IVF variant on the same retrievable structure: the k-means quantizer
    // puts a query and its planted cluster in nearby lists, so probing
    // nprobe/nlist of the corpus recovers the true top-k
    val ivf = Similarity.ivfKnn(qDf, corpus, k = 10, nlist = 16, nprobe = 4)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    assert(ivfRecall >= 0.9, s"IVF recall $ivfRecall too low")
  }

  test("IVF quantizer is deterministic and assigns every vector exactly one list") {
    val c1 = Similarity.trainIvfCentroids(embs, nlist = 8, iters = 3)
    val c2 = Similarity.trainIvfCentroids(embs, nlist = 8, iters = 3)
    assert(c1.toSeq === c2.toSeq)
    val r = Similarity.ivfKnn(embs.filter($"vec_id" < 5), embs, k = 3,
      nlist = 8, nprobe = 8) // nprobe = nlist => exhaustive => equals brute
    val brute = Similarity.bruteForceKnn(embs.filter($"vec_id" < 5), embs, k = 3)
    assert(r.select("query_id", "knn_rank", "item_id").collect().map(_.toString).sorted.toSeq
      === brute.select("query_id", "knn_rank", "item_id").collect().map(_.toString).sorted.toSeq)
  }

  test("LSH dedup survives degenerate buckets: 10k identical + 5k empty docs") {
    // the crawl-scale killer: empty texts share one signature, boilerplate
    // shares one bucket — without minLen + bucket caps the candidate join is
    // n^2 (10k identical docs = 50M pairs). With the guards it completes and
    // still finds the genuine near-dups.
    val boiler = spark.range(0, 10000)
      .select(($"id" + 200000).as("doc_id"),
        lit("copyright 2026 example site all rights reserved navigation home about contact").as("text"))
    val empties = spark.range(0, 5000)
      .select(($"id" + 300000).as("doc_id"), lit("").as("text"))
    val base = docs.select($"doc_id", $"text").limit(50)
    val near = base.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", concat($"text", lit(" extra tail")))
    val all = base.unionByName(near).unionByName(boiler).unionByName(empties)
    val pairs = Dedup.minhashLshPairs(all, threshold = 0.5).cache()
    // no pair from the identical mega-cluster (cap excluded it — exact
    // dedup's job), no pair from empties (minLen), planted near-dups found
    assert(pairs.filter($"doc_a" >= 200000).count() === 0)
    assert(pairs.filter($"doc_b" - $"doc_a" === 100000).count() >= 4)
    // the cap is observable, not silent
    val dropped = Dedup.droppedBuckets(all).collect()
    assert(dropped.nonEmpty && dropped.forall(_.getAs[Long]("bucket_size") >= 10000))
    pairs.unpersist()
    // simhash path: same guards (single-char edit keeps hamming <= 3)
    val nearX = base.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", concat($"text", lit(" x")))
    val allX = base.unionByName(nearX).unionByName(boiler).unionByName(empties)
    val sp = Dedup.simhashPairs(allX, maxDist = 3)
    assert(sp.filter($"doc_a" >= 200000).count() === 0)
    assert(sp.filter($"doc_b" - $"doc_a" === 100000).count() >= 1)
  }

  test("language ID picks the stopword-dominant language") {
    val df = Seq(
      (1L, "the cat and the dog went to the market and it was fun"),
      (2L, "der hund und die katze sind nicht auf der straße"),
      (3L, "el perro y la gata en la casa de los abuelos"),
      (4L, "le chien et les chats dans la maison pour une semaine"),
      (5L, "你好世界 这是中文文本")
    ).toDF("doc_id", "text")
      .withColumn("lang_pred", TextAnalysis.langId($"text"))
    val got = df.select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got(1L) === "en"); assert(got(2L) === "de")
    assert(got(3L) === "es"); assert(got(4L) === "fr"); assert(got(5L) === "zh")
  }

  test("quality scoring: garbage scores below clean prose") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it was entirely fine that day"),
      (2L, "!!! ??? ;;; ### $$$ %%% 123 456 789 000 111"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val q = TextAnalysis.withQuality(df).select("doc_id", "quality_score")
      .as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L))
    assert(q(1L) > q(3L))
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("token counts: whitespace and BPE-ish estimates") {
    val df = Seq((1L, "hello world, this is 1 test!")).toDF("doc_id", "text")
      .withColumn("ws", TextAnalysis.tokenCountWs($"text"))
      .withColumn("bpe", TextAnalysis.tokenCountBpe($"text"))
    val r = df.collect()(0)
    assert(r.getAs[Int]("ws") === 6)
    assert(r.getAs[Long]("bpe") >= 6L)
  }

  test("fingerprints are deterministic and edit-sensitive") {
    val df = Seq((1L, "some document text body"), (2L, "some document text body"),
      (3L, "completely different content here")).toDF("doc_id", "text")
    val fps = TextAnalysis.withFingerprints(df)
      .select("doc_id", "winnow_fp", "simhash").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("multimodal: binary meta, stub features, frame sampling, batched decode") {
    val pages = graft.fixtures.Synth.pages(spark, 40, 2).toDF()
    val meta = Multimodal.withBinaryMeta(pages)
    assert(meta.filter($"mime" === "text/html").count() === 40)
    assert(meta.filter($"bin_len" <= 0).count() === 0)

    val feats = Multimodal.withFeatures(pages, dim = 32)
    val v = feats.select("features").as[Array[Float]].collect()
    assert(v.forall(_.length === 32))

    val frames = Multimodal.sampleFrames(pages, frames = 4)
    assert(frames.count() === 160)
    assert(frames.filter(length($"frame") === 0).count() === 0)

    val batched = Multimodal.batchedDecode(spark, pages, batchSize = 16, dim = 8)
    assert(batched.count() === 40)
    assert(batched.select(max("n_in_batch")).as[Int].collect()(0) <= 16)

    // portable features: 16 values in [-0.5, 0.5) => norm in (0, 2]
    val pf = Multimodal.withPortableFeatures(pages, dim = 16)
    assert(pf.filter(size($"features") =!= 16).count() === 0)
    assert(pf.filter($"feat_norm" <= 0 || $"feat_norm" > 2.0).count() === 0)
  }

  test("connected components: chains, triangles, and pairs cluster to min id") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, triangle 20-21-22, plus a
    // redundant edge — clusters must be independent of edge order/multiplicity
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 21L))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    val clusters = Dedup.dupClusters(edges)
    assert(clusters.filter($"is_canonical").count() === 3)
    val sizes = clusters.select("cluster_id", "cluster_size").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes === Map(1L -> 4L, 10L -> 2L, 20L -> 3L))
    // non-canonical members are exactly the docs a keep-policy would drop
    assert(clusters.filter(!$"is_canonical").count() === 6)
  }

  test("portable sha256 minhash: known hash value, planted near-dups found") {
    // sha60("0", "hello world") = first 15 hex chars of
    // sha256("0:hello world") — independently computed: 343071447330290252
    val h = spark.range(1)
      .select(Dedup.sha60(lit("0"), lit("hello world")).as("h")).as[Long].collect()(0)
    assert(h === 343071447330290252L)
    val base = docs.select($"doc_id", $"text").limit(100)
    val near = base.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", concat($"text", lit(" extra tail")))
    val pairs = Dedup.portableMinhashLshPairs(base.unionByName(near), threshold = 0.5)
      .cache()
    val planted = pairs.filter($"doc_b" - $"doc_a" === 100000)
    assert(planted.count() >= 4, s"found ${planted.count()} of 5 planted near-dups")
    assert(pairs.filter($"jaccard_est" < 0.5 || $"jaccard_est" > 1.0).count() === 0)
    pairs.unpersist()
  }

  test("portable simhash: identical docs at distance 0, one-word edits close") {
    val base = docs.select($"doc_id", $"text").limit(80)
    val ident = base.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000) // exact copies -> hamming 0
    val pairs = Dedup.portableSimhashPairs(base.unionByName(ident), maxDist = 3)
      .cache()
    val planted = pairs.filter($"doc_b" - $"doc_a" === 100000)
    assert(planted.count() === 5)
    assert(planted.filter($"hamming_dist" =!= 0).count() === 0)
    // no pair reported above the distance bound
    assert(pairs.filter($"hamming_dist" > 3).count() === 0)
    pairs.unpersist()
  }

  test("portable embedding near-dup: planted identical vectors recovered") {
    val base = embs.select($"vec_id", $"embedding").limit(200)
    val ident = base.filter($"vec_id" < 10)
      .withColumn("vec_id", $"vec_id" + 100000)
    val pairs = Dedup.portableEmbeddingNearDupPairs(
      base.unionByName(ident), threshold = 0.999).cache()
    // identical vectors share every bucket key -> always candidates
    val planted = pairs.filter($"id_b" - $"id_a" === 100000)
    assert(planted.count() === 10)
    assert(planted.filter(abs($"cos" - 1.0) > 1e-12).count() === 0)
    assert(pairs.filter($"cos" < 0.999).count() === 0)
    pairs.unpersist()
  }

  test("portable winnow: known short-text hash, append-past-window stability") {
    // sha60("wn:hi") independently computed: int(sha256('wn:hi')[:15], 16)
    assert(TextCore.portableWinnow("hi", 8, 16) === 71419500124699162L)
    // 90 chars -> 83 grams -> 5 full windows (grams 80..82 unused); appending
    // 2 chars adds grams 83..84 without completing a 6th window or touching
    // any earlier gram -> fingerprint is stable under the trailing edit
    val t = ("the quick brown fox jumps over the lazy dog again and then " +
      "some more filler text here ok" + "z" * 8).take(90)
    assert(t.length === 90)
    assert(TextCore.portableWinnow(t, 8, 16) === TextCore.portableWinnow(t + "ab", 8, 16))
    // 16 more chars complete a new window -> fingerprint changes
    assert(TextCore.portableWinnow(t, 8, 16) !==
      TextCore.portableWinnow(t + "x" * 16, 8, 16))
  }

  test("repetition signals: exact ratios on crafted docs") {
    val crafted = Seq(
      (1L, "a a a a"),            // ttr 1/4; trigrams [a a a, a a a] -> dup 1/2
      (2L, "w x y z"),            // all distinct
      (3L, "b"),                  // 1 token: no bigrams/trigrams
      (4L, "spam ham spam ham spam ham")) // top bigram "spam ham" 3 of 5
      .toDF("doc_id", "text")
    val r = TextAnalysis.withRepetitionSignals(crafted)
      .select("doc_id", "n_tokens", "type_token_ratio", "dup_trigram_ratio",
        "frac_top_bigram", "frac_top_trigram")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getDouble(2) === 0.25)
    assert(r(1L).getDouble(3) === 0.5)
    assert(r(1L).getDouble(4) === 1.0)
    assert(r(2L).getDouble(2) === 1.0 && r(2L).getDouble(3) === 0.0)
    assert(r(2L).getDouble(4) === 1.0 / 3.0) // 3 distinct bigrams, each once
    assert(r(3L).getDouble(4) === 0.0 && r(3L).getDouble(5) === 0.0)
    assert(r(4L).getDouble(4) === 0.6)
    assert(r(4L).getInt(1) === 6 || r(4L).getLong(1) === 6L)
  }

  test("pii redaction: emails, ips, phones replaced with typed tokens") {
    val crafted = Seq(
      (1L, "mail bob.smith+x@sub.example.org now"),
      (2L, "host 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +41 79 123 4567 today"),
      (4L, "clean text only"),
      (5L, "a@b.co from 1.2.3.4 dial +1 800 555 0199"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.withRedaction(crafted)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "clean_text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) === 1 && r(1L).getString(4) === "mail <EMAIL> now")
    assert(r(2L).getInt(2) === 2 && r(2L).getString(4) === "host <IP> and <IP> up")
    assert(r(3L).getInt(3) === 1 && r(3L).getString(4) === "call <PHONE> today")
    assert(r(4L).getString(4) === "clean text only")
    assert(r(5L).getInt(1) === 1 && r(5L).getInt(2) === 1 && r(5L).getInt(3) === 1)
    assert(r(5L).getString(4) === "<EMAIL> from <IP> dial <PHONE>")
  }
}
