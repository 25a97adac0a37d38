package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Text-analysis operators for the training-data pipeline, over a
 * `documents(doc_id, text, lang, ...)`-shaped table. All built-in Column
 * expressions (whole-stage codegen) except the sketch functions, which are
 * codegen StaticInvoke shims — no Scala UDF closures anywhere.
 */
object TextAnalysis {

  /** Tiny per-language stopword lexicons for the n-gram/stopword language-ID
    * heuristic. Deliberately small — language ID at crawl scale is a
    * lexicon-hit-ratio problem, and the operator shape (map-only, broadcast
    * lexicon) is what matters. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"),
    "it" -> Seq("il", "la", "di", "che", "e", "per", "con", "del", "una", "sono"))

  /** THE tokenizer — shared by text analysis and the dedup shingles (oracle
    * parity depends on both using one definition). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{Nd}]+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: letter runs count ceil(len/4) tokens,
    * digits and punctuation 1 each — the shape of a GPT-style tokenizer
    * budget without a merges table. */
  def tokenCountBpe(text: Column): Column =
    aggregate(
      transform(regexp_extract_all(text, lit("[\\p{L}]+|[0-9]|[^\\p{L}0-9\\s]"), lit(0)),
        t => when(t.rlike("^[\\p{L}]+$"), ceil(length(t) / 4.0).cast("long")).otherwise(lit(1L))),
      lit(0L), (acc, x) => acc + x)

  /** Flesch reading-ease with a deterministic vowel-group syllable
    * heuristic: syllables(text) = count of `[aeiouy]+` runs, words =
    * `\p{L}+` runs (min 1), sentences = `[.!?]+` runs (min 1);
    * 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words) — the
    * published constants. Map-only codegen string math, the crawl-scale
    * readability-gate shape (pairs with the length/stopword gates in
    * [[withQuality]]). */
  def fleschScore(text: Column): Column = {
    val words = greatest(
      size(regexp_extract_all(lower(text), lit("[\\p{L}]+"), lit(0))), lit(1))
      .cast("double")
    val sylls =
      size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))).cast("double")
    val sents = greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1)).cast("double")
    lit(206.835) - lit(1.015) * (words / sents) - lit(84.6) * (sylls / words)
  }

  private def hitRatio(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang).map(lit(_)): _*))) /
      greatest(size(toks), lit(1)).cast("double")

  /** Language ID: argmax stopword-hit ratio; CJK-codepoint presence short-
    * circuits to zh; "und" (undetermined) when no lexicon scores. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.keys.toSeq.sorted.map { l =>
      struct(hitRatio(toks, l).as("score"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise("und")
  }

  /** Quality metrics + composite score in [0,1]: length band, token shape,
    * punctuation/digit load, stopword presence — the standard crawl-quality
    * heuristics (C4/Gopher-style rules) as pure SQL expressions. */
  def withQuality(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val len = length(text)
    val nTok = tokenCountWs(text)
    val meanTokLen = (length(regexp_replace(text, "\\s+", "")) /
      greatest(nTok, lit(1)).cast("double"))
    val punctRatio = (len - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
      greatest(len, lit(1)).cast("double")
    val digitRatio = (len - length(regexp_replace(text, "[0-9]", ""))) /
      greatest(len, lit(1)).cast("double")
    val enStop = hitRatio(tokens(text), "en")
    val lengthScore = least(nTok / lit(20.0), lit(1.0))
    val tokShapeScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.3)
    val score = greatest(lit(0.0), least(lit(1.0),
      lengthScore * 0.4 + tokShapeScore * 0.2 +
        (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.2 +
        (lit(1.0) - least(digitRatio * 5.0, lit(1.0))) * 0.1 +
        least(enStop * 5.0, lit(1.0)) * 0.1))
    docs.withColumn("n_chars_m", len)
      .withColumn("n_tokens", nTok)
      .withColumn("mean_token_len", meanTokLen)
      .withColumn("punct_ratio", punctRatio)
      .withColumn("digit_ratio", digitRatio)
      .withColumn("stopword_ratio", enStop)
      .withColumn("quality_score", score)
  }

  /** Frozen-weight logistic quality scorer — the model-based filter shape
    * (a fastText/CCNet-style keep/drop classifier) with the weights frozen
    * as plan literals, which is exactly how a trained filter ships into a
    * 100 TB scoring pass: the model rides the plan, scoring is map-only,
    * and no driver/executor state exists to drift. The logit is ONE
    * fixed-order left-to-right chain over [[withQuality]]'s feature columns,
    * so an external engine replays the identical IEEE arithmetic; consumers
    * gate on the 6dp-rounded probability (`round(p_keep, 6) >= 0.5`) so the
    * decision boundary is engine-independent too. */
  def withLogitQuality(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val q = withQuality(docs, text)
    val z = lit(-1.5) +
      least(col("n_tokens") / lit(50.0), lit(1.0)) * lit(2.0) +
      col("mean_token_len") * lit(0.15) +
      col("punct_ratio") * lit(-4.0) +
      col("digit_ratio") * lit(-2.0) +
      col("stopword_ratio") * lit(6.0)
    q.withColumn("logit", z)
      .withColumn("p_keep", lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** Space-joined word n-grams. Built by zipping the token array against its
    * own shifted slices: each input expression is evaluated O(n) times per
    * row, never once per ELEMENT — an `element_at(toks, i+j)` lambda would be
    * projection-collapsed into a full re-tokenization per n-gram term
    * (measured: 66 s -> 7 s for the repetition signals at sf0.1). */
  def ngramArr(toks: Column, n: Int): Column = {
    val zipped = arrays_zip((0 until n).map(j =>
      slice(toks, lit(j + 1), greatest(size(toks) - j, lit(0))).as(s"g$j")): _*)
    filter(
      transform(zipped, st =>
        when((0 until n).map(j => st.getField(s"g$j").isNotNull).reduce(_ && _),
          concat_ws(" ", (0 until n).map(j => st.getField(s"g$j")): _*))),
      x => x.isNotNull)
  }

  /** Gopher-style intra-document repetition signals — the standard "is this
    * page boilerplate / template spam" filters for a crawl corpus:
    *
    *  - `type_token_ratio`: distinct tokens / tokens (low = repetitive).
    *  - `dup_trigram_ratio`: 1 - distinct trigrams / trigrams.
    *  - `frac_top_bigram` / `frac_top_trigram`: share of all n-grams taken by
    *    the single most frequent one.
    *
    * The per-doc ratios are map-only list expressions; the top-n-gram mode is
    * explode -> two-level aggregation (partial map-side combine, never a
    * per-row quadratic distinct-vs-all scan — a 100 KB doc has ~2*10^4
    * n-grams, and all-pairs per row would be 4*10^8 comparisons). Ratios are
    * exact integer quotients, so independently recomputable. */
  def withRepetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val tg = ngramArr(toks, 3)
    val base = docs.withColumn("n_tokens", size(toks))
      .withColumn("type_token_ratio",
        size(array_distinct(toks)) / greatest(size(toks), lit(1)).cast("double"))
      .withColumn("dup_trigram_ratio",
        when(size(tg) === 0, 0.0)
          .otherwise(lit(1.0) - size(array_distinct(tg)) / size(tg).cast("double")))
    val grams = docs
      .select(col(idCol), explode(ngramArr(toks, 2)).as("g")).withColumn("n", lit(2))
      .unionByName(docs.select(col(idCol), explode(tg).as("g")).withColumn("n", lit(3)))
    val top = grams.groupBy(col(idCol), col("n"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol)).agg(
        (max(when(col("n") === 2, col("cnt"))) /
          sum(when(col("n") === 2, col("cnt"))).cast("double")).as("frac_top_bigram"),
        (max(when(col("n") === 3, col("cnt"))) /
          sum(when(col("n") === 3, col("cnt"))).cast("double")).as("frac_top_trigram"))
    base.join(top, Seq(idCol), "left")
      .withColumn("frac_top_bigram", coalesce(col("frac_top_bigram"), lit(0.0)))
      .withColumn("frac_top_trigram", coalesce(col("frac_top_trigram"), lit(0.0)))
  }

  // PII patterns, deliberately restricted to syntax valid in BOTH java.util
  // .regex and RE2 (\b, \d, {m,n} — no lookarounds) so the redaction is
  // independently recomputable by an ANSI oracle.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3}( \\d{2,4}){2,4}\\b"

  /** PII scrub for training corpora: replace emails, IPv4 addresses, and
    * international-format phone numbers with typed placeholder tokens.
    * Order matters and is fixed (email first — its local part may contain
    * digits and dots an IP pattern could clip). Map-only. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Redaction with per-doc counts (counted on the ORIGINAL text, before any
    * placeholder rewriting): (n_emails, n_ips, n_phones, clean_text). */
  def withRedaction(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(Ipv4Re), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(PhoneRe), lit(0))))
      .withColumn("clean_text", redactPii(t))
  }

  /** Content fingerprints: fast 64-bit xxhash + winnowing fingerprint (robust
    * to local edits) + simhash. */
  def withFingerprints(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.withColumn("xxh64", xxhash64(text))
      .withColumn("winnow_fp", TextFunctions.winnow(text, lit(8), lit(16)))
      .withColumn("simhash", TextFunctions.simhash(text))

  /** Fixed alphabet for character-distribution stats: 26 letters + 10
    * digits + space; everything else is one implicit "other" class.
    * Package-visible so the oracle SQL generator replays the same classes
    * in the same order. */
  private[graft] val CharClasses: Seq[String] =
    ("abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
      "0123456789".map(_.toString) :+ " ").toSeq

  /**
   * Character-distribution quality signals — the cheap gibberish/encoding-
   * junk gate (base64 blobs, minified JS, binary spills all have flat or
   * degenerate char distributions):
   *
   *   - `char_gini_ppm`: Gini impurity `1 - Σ pᵢ²` of the lowercased
   *     char-class distribution, in parts per million. PURE integer
   *     arithmetic (`1e6 - (Σcᵢ² · 1e6) div n²`) — exact, order-insensitive,
   *     replayable bit-for-bit by any engine; this is the gating column.
   *   - `char_entropy_b6`: Shannon entropy in bits, rounded to 6 dp. The
   *     sum is ONE fixed-order left-to-right chain over the 38 classes
   *     (same determinism contract as [[withLogitQuality]]'s logit chain).
   *   - `n_char_classes`: distinct classes present (integer).
   *
   * Scale shape: map-only — per class one `replace` length-diff count, no
   * explode (a per-CHARACTER explode would shuffle text-length × rows), no
   * shuffle at all; 37 codegen'd string passes ≈ one regex pass over the
   * row. At 100 TB this runs at scan speed alongside the other gates.
   */
  def withCharDistribution(docs: DataFrame, text: Column = col("text")): DataFrame = {
    // CollapseProject inlines withColumn chains, so reference the lowered
    // text through a SINGLE materialized column and build every count off
    // it; each count column is referenced more than once downstream, so
    // those are materialized through named columns too (gini/entropy read
    // them by name, never re-inline the 37-pass chain).
    // counts as LONG from the start: the Gini sum-of-squares would overflow
    // INT (ANSI mode errors, not wraps) past ~46k-char documents
    val withLo = docs.withColumn("lo_cd", lower(text))
      .withColumn("n_chars_cd", length(col("lo_cd")).cast("long"))
    val cntCols = CharClasses.zipWithIndex.map { case (ch, i) =>
      s"c${i}_cd" -> (col("n_chars_cd") -
        length(replace(col("lo_cd"), lit(ch), lit(""))).cast("long"))
    }
    val withCnt0 = cntCols.foldLeft(withLo) { case (d, (nm, c)) =>
      d.withColumn(nm, c)
    }
    val named = cntCols.map { case (nm, _) => col(nm) }
    val other = col("n_chars_cd") - named.reduce(_ + _)
    val withCnt = withCnt0.withColumn("co_cd", other)
    val all = named :+ col("co_cd")
    val n = col("n_chars_cd")
    val sumSq = all.map(c => c * c).reduce(_ + _)
    val gini = when(n > 0, lit(1000000L) -
        expr("(sum_sq_cd * 1000000) div (n_chars_cd * n_chars_cd)"))
      .otherwise(lit(0L))
    val nd = n.cast("double")
    val entropy = all.map { c =>
      val p = c.cast("double") / nd
      when(c > 0, -(p * log2(p))).otherwise(lit(0.0))
    }.reduce(_ + _)
    val nClasses = all.map(c => when(c > 0, 1).otherwise(0)).reduce(_ + _)
    withCnt
      .withColumn("sum_sq_cd", sumSq)
      .withColumn("char_gini_ppm", gini)
      .withColumn("n_char_classes", nClasses)
      .withColumn("char_entropy_b6", when(n > 0, round(entropy, 6))
        .otherwise(lit(0.0)))
      .drop(("lo_cd" +: "co_cd" +: "sum_sq_cd" +: cntCols.map(_._1)): _*)
  }

  /** The Gopher repetition-free document-filter rule list (Rae et al. 2021
    * §A1.1) needs ≥2 distinct hits from this closed 8-word set. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-style rule gate (Rae et al. 2021, "Scaling Language Models",
   * appendix A1.1) — the published crawl-filter rule list as per-rule
   * columns plus the conjunctive keep flag, distinct from [[withQuality]]'s
   * blended score: word-count bounds [50, 100000], mean word length
   * [3, 10], symbol-to-word ratio ('#' plus non-overlapping "..." plus '…')
   * ≤ 0.1, bullet-start line ratio ≤ 0.9, ellipsis-end line ratio ≤ 0.3,
   * ≥ 80% of words containing a letter, and ≥ 2 distinct hits from the
   * closed 8-word stopword list.
   *
   * Everything is map-only codegen string math: word counts via one split,
   * total word chars via the whitespace-strip length trick (no per-word
   * lambda sum), symbol counts via length-diff replaces, and the stopword
   * hit count via ONE `array_intersect` against a literal array so the
   * token array is evaluated once (CollapseProject would inline a per-word
   * lambda 8×). Every ratio is rounded to 6dp BEFORE the rule comparison so
   * the keep decision is engine-independent; an external engine (the DuckDB
   * oracle) replays the identical chain.
   */
  def withGopherRules(docs: DataFrame, text: Column = col("text")): DataFrame = {
    val d0 = docs
      .withColumn("ws_g", filter(split(trim(text), "\\s+"), w => length(w) > 0))
      .withColumn("lines_g", filter(split(text, "\n"), l => length(trim(l)) > 0))
      .withColumn("toks_g", tokens(text))
    val nWords = size(col("ws_g")).cast("long")
    val nLines = greatest(size(col("lines_g")), lit(1)).cast("long")
    // sum of word lengths == chars left after stripping ALL whitespace
    val wordChars = length(regexp_replace(text, "\\s+", "")).cast("long")
    val meanLen = round(wordChars / greatest(nWords, lit(1L)).cast("double"), 6)
    val nHash = (length(text) - length(replace(text, lit("#"), lit("")))).cast("long")
    val nDots = ((length(text) -
      length(replace(text, lit("..."), lit("")))) / lit(3)).cast("long")
    val nEllChar = (length(text) - length(replace(text, lit("…"), lit("")))).cast("long")
    val symbolRatio = round(
      (nHash + nDots + nEllChar) / greatest(nWords, lit(1L)).cast("double"), 6)
    val nBullet = size(filter(col("lines_g"),
      l => substring(trim(l), 1, 1).isin("-", "*", "•"))).cast("long")
    val bulletRatio = round(nBullet / nLines.cast("double"), 6)
    val nEllEnd = size(filter(col("lines_g"), l => {
      val t = trim(l)
      t.endsWith("...") || t.endsWith("…")
    })).cast("long")
    val ellipsisRatio = round(nEllEnd / nLines.cast("double"), 6)
    val nAlpha = size(filter(col("ws_g"), w => w.rlike("\\p{L}"))).cast("long")
    val alphaRatio = round(nAlpha / greatest(nWords, lit(1L)).cast("double"), 6)
    val nStop = size(array_intersect(col("toks_g"),
      array(GopherStopwords.map(lit(_)): _*))).cast("long")
    d0.withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("bullet_ratio", bulletRatio)
      .withColumn("ellipsis_ratio", ellipsisRatio)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("n_req_stopwords", nStop)
      .withColumn("gopher_keep",
        col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_ratio") <= 0.9 &&
          col("ellipsis_ratio") <= 0.3 &&
          col("alpha_ratio") >= 0.8 &&
          col("n_req_stopwords") >= 2L)
      .drop("ws_g", "lines_g", "toks_g")
  }

  /**
   * Unigram language-model quality score — the distributed analog of the
   * CCNet perplexity gate: train unigram probabilities p(t) = count(t)/total
   * on the corpus itself, score each document by its mean token log-prob
   * (higher = more typical, low = surprising/garbage).
   *
   * Determinism: per-token log-probs are rounded to 7 dp and summed as
   * DECIMAL, so the per-doc total is exact and order-insensitive — an
   * external engine replaying the same double arithmetic reproduces every
   * score bit-for-bit regardless of partitioning.
   *
   * Scale shape: the LM "training" is ONE combinable count over the vocab
   * (boilerplate tokens collapse map-side), scoring is a hash join from the
   * exploded tokens to the vocab table + one per-doc aggregate. Documents
   * with no tokens surface with n_tokens=0 and a null score.
   *
   * @return (doc_key, n_tokens: int, lm_logprob: double — mean ln p(token))
   */
  def lmScore(docs: DataFrame, key: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    // doc length is NOT carried through the explode: size(toks) in the same
    // projection as explode(toks) lands in a Project ABOVE the Generate, so
    // CollapseProject re-tokenizes the document once PER TOKEN ROW (measured
    // 4.2 s -> 0.3 s at sf0.1). The per-doc length is recomputed once on the
    // docs side for the final join instead.
    val ex = docs.select(key.as("doc_key"), explode(toks).as("token"))
    val vocab = ex.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = ex.agg(count(lit(1)).as("total"))
    val logp = log(col("cnt").cast("double") / col("total"))
    val termDec = round(logp, 7).cast("decimal(20,7)")
    val scored = ex.join(vocab, "token").crossJoin(broadcast(total))
      .groupBy("doc_key")
      .agg(sum(termDec).as("__sum_dec"))
    docs.select(key.as("doc_key"), size(toks).cast("int").as("n_tokens"))
      .join(scored, Seq("doc_key"), "left")
      .select(col("doc_key"), col("n_tokens"),
        (col("__sum_dec").cast("double") / col("n_tokens")).as("lm_logprob"))
  }

  /**
   * Interpolated BIGRAM-LM score — one order up from [[lmScore]], the
   * CCNet/KenLM-style perplexity gate shape: the first token of a document
   * scores ln p_uni(w0) and every subsequent position scores
   * ln( lam * c(prev,cur)/c(prev) + (1-lam) * c(cur)/N ); the document
   * score is the mean over all n_tokens positions.
   *
   * Scale shape: bigram occurrences come from ONE codegen windowNgrams call
   * exploded (never a per-doc lag window — no per-doc sort, no doc-ordered
   * shuffle); the model is two combinable counts (unigram, bigram) joined
   * back by token keys with map-side partials absorbing the Zipf head.
   * Determinism: the per-position float chain is fixed-order, rounded to
   * 7 dp and summed as DECIMAL, so totals are order-insensitive and an
   * external engine replays every score bit-for-bit (doc_lm_bigram).
   *
   * @param lam interpolation weight on the bigram MLE (0.7 = classic)
   * @return (doc_key, n_tokens: int, lm2_logprob: double; null for empty docs)
   */
  def bigramLmScore(docs: DataFrame, key: Column, text: Column,
                    lam: Double = 0.7): DataFrame =
    bigramLmDecimal(docs, key, text, lam)
      .select(col("doc_key"), col("n_tokens"),
        (col("__sdec").cast("double") / col("n_tokens")).as("lm2_logprob"))

  /** [[bigramLmScore]] with the EXACT per-doc DECIMAL sum still exposed
    * (`__sdec`, scale 7) — the form corpus-level consumers need when the
    * downstream math must stay in the exact integer domain (e.g.
    * [[graft.text.Corpus.ccnetBuckets]]'s micro-nat thresholds). */
  private[graft] def bigramLmDecimal(docs: DataFrame, key: Column,
                                     text: Column, lam: Double): DataFrame = {
    require(lam > 0.0 && lam < 1.0, s"lam must be in (0,1), got $lam")
    val toks = tokens(text)
    val base = docs.select(key.as("doc_key"), toks.as("toks"))
    val ex = base.select(explode(col("toks")).as("token"))
    val uni = ex.groupBy("token").agg(count(lit(1)).as("cnt"))
    val tot = ex.agg(count(lit(1)).as("total"))
    val bgEx = docs.select(key.as("doc_key"),
      explode(graft.functions.TextFunctions.windowNgrams(text, lit(2))).as("g"))
    val bg = bgEx.groupBy("g").agg(count(lit(1)).as("c_ab"))
    val pairTerms = bgEx
      .withColumn("a", split(col("g"), " ").getItem(0))
      .withColumn("b", split(col("g"), " ").getItem(1))
      .join(bg, "g")
      .join(uni.select(col("token").as("a"), col("cnt").as("c_a")), "a")
      .join(uni.select(col("token").as("b"), col("cnt").as("c_b")), "b")
      .crossJoin(broadcast(tot))
      .select(col("doc_key"), round(log(
          lit(lam) * (col("c_ab").cast("double") / col("c_a")) +
          lit(1.0 - lam) * (col("c_b").cast("double") / col("total"))), 7)
        .cast("decimal(20,7)").as("t"))
    val firstTerms = base.filter(size(col("toks")) >= 1)
      .select(col("doc_key"), element_at(col("toks"), 1).as("token"))
      .join(uni, "token").crossJoin(broadcast(tot))
      .select(col("doc_key"),
        round(log(col("cnt").cast("double") / col("total")), 7)
          .cast("decimal(20,7)").as("t"))
    val scored = firstTerms.unionByName(pairTerms)
      .groupBy("doc_key").agg(sum(col("t")).as("__sdec"))
    base.select(col("doc_key"), size(col("toks")).cast("int").as("n_tokens"))
      .join(scored, Seq("doc_key"), "left")
  }

  /**
   * FEATURE HASHING ("the hashing trick", Weinberger et al. 2009): each
   * token lands in bucket `sha60("fh:"+token) mod dims` with a ±1 sign from
   * the next hash bit, summing to a fixed-width integer embedding with no
   * vocabulary pass at all — the fastText-style representation a quality
   * classifier trains on when a 10^9-type vocabulary table is off the
   * table. The hash is the portable sha60 family, so an external engine
   * re-derives every bucket and sign.
   *
   * Scale shape: one explode + ONE combinable (doc, bucket) count — the
   * same two-level-agg shape as every other text gate; absent (doc, bucket)
   * pairs are implicit zeros by contract.
   *
   * @return (doc_key, k: int — bucket, weight: long — signed count)
   */
  def hashEmbed(docs: DataFrame, key: Column, text: Column,
                dims: Int = 32): DataFrame = {
    require(dims >= 2 && dims <= 4096, s"dims must be in [2,4096], got $dims")
    docs.select(key.as("doc_key"), explode(tokens(text)).as("token"))
      .select(col("doc_key"), graft.functions.TextFunctions.sha60(
        concat(lit("fh:"), col("token"))).as("h"))
      .select(col("doc_key"),
        pmod(col("h"), lit(dims.toLong)).cast("int").as("k"),
        when(expr("shiftright(h, 1) & 1") === 0, lit(1L))
          .otherwise(lit(-1L)).as("s"))
      .groupBy("doc_key", "k").agg(sum(col("s")).as("weight"))
  }

  /**
   * Interpolated KNESER-NEY bigram LM score — the smoothing family KenLM
   * (and therefore the original CCNet pipeline) actually uses, where
   * [[bigramLmScore]] is plain Jelinek-Mercer interpolation. All model
   * quantities come from the bigram TYPE/count tables with a fixed absolute
   * discount `d`:
   *
   *   - prefix count      c(a·)      = Σ_b c(a,b)
   *   - fan-out           N1+(a·)    = |{b : c(a,b) > 0}|
   *   - fan-in            N1+(·b)    = |{a : c(a,b) > 0}|
   *   - bigram types      T          = |{(a,b) : c(a,b) > 0}|
   *   - continuation prob p_cont(b)  = N1+(·b) / T
   *
   * and every position i ≥ 1 scores
   *   ln( (max(c(a,b) − d, 0) + d · N1+(a·) · p_cont(b)) / c(a·) ).
   * The first token scores the add-one-smoothed continuation probability
   * ln( (N1+(·b) + 1) / (T + V) ) with V the unigram vocabulary size, so the
   * term is positive even for a token that only ever occurs document-initial.
   * Because the model is trained on the corpus being scored, every scored
   * bigram has c(a,b) ≥ 1 and every prefix has c(a·) ≥ 1 — no zero path.
   *
   * Scale shape: identical to [[bigramLmScore]] — bigrams from ONE codegen
   * windowNgrams explode, the model is combinable counts over bigram types
   * (map-side partials absorb the Zipf head), scoring is hash joins back by
   * token keys. Determinism: the per-position double chain is fixed-order,
   * rounded to 7 dp and summed as DECIMAL (the doc_lm_bigram contract), so
   * DuckDB replays every score bit-for-bit from a position self-join.
   *
   * @param d absolute discount in (0,1); 0.75 is the classic choice
   * @return (doc_key, n_tokens: int, kn_logprob: double; null for empty docs)
   */
  def knBigramLmScore(docs: DataFrame, key: Column, text: Column,
                      d: Double = 0.75): DataFrame = {
    require(d > 0.0 && d < 1.0, s"discount d must be in (0,1), got $d")
    val toks = tokens(text)
    val base = docs.select(key.as("doc_key"), toks.as("toks"))
    val ex = base.select(explode(col("toks")).as("token"))
    val uni = ex.groupBy("token").agg(count(lit(1)).as("cnt"))
    val vocab = uni.agg(count(lit(1)).as("vocab"))
    val bgEx = docs.select(key.as("doc_key"),
      explode(graft.functions.TextFunctions.windowNgrams(text, lit(2))).as("g"))
    val bg = bgEx.groupBy("g").agg(count(lit(1)).as("c_ab"))
    val bgSplit = bg
      .withColumn("a", split(col("g"), " ").getItem(0))
      .withColumn("b", split(col("g"), " ").getItem(1))
    val pref = bgSplit.groupBy("a")
      .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1p_fwd"))
    val suff = bgSplit.groupBy("b").agg(count(lit(1)).as("n1p_bwd"))
    val types = bg.agg(count(lit(1)).as("t_types"))
    val pairTerms = bgEx
      .withColumn("a", split(col("g"), " ").getItem(0))
      .withColumn("b", split(col("g"), " ").getItem(1))
      .join(bg, "g")
      .join(pref, "a")
      .join(suff, "b")
      .crossJoin(broadcast(types))
      .select(col("doc_key"), round(log(
          (greatest(col("c_ab").cast("double") - lit(d), lit(0.0)) +
            lit(d) * col("n1p_fwd").cast("double") *
              (col("n1p_bwd").cast("double") / col("t_types").cast("double"))) /
            col("c_a").cast("double")), 7)
        .cast("decimal(20,7)").as("t"))
    val firstTerms = base.filter(size(col("toks")) >= 1)
      .select(col("doc_key"), element_at(col("toks"), 1).as("b"))
      .join(suff, Seq("b"), "left")
      .crossJoin(broadcast(types)).crossJoin(broadcast(vocab))
      .select(col("doc_key"), round(log(
          (coalesce(col("n1p_bwd"), lit(0L)) + lit(1L)).cast("double") /
            (col("t_types") + col("vocab")).cast("double")), 7)
        .cast("decimal(20,7)").as("t"))
    val scored = firstTerms.unionByName(pairTerms)
      .groupBy("doc_key").agg(sum(col("t")).as("__sdec"))
    base.select(col("doc_key"), size(col("toks")).cast("int").as("n_tokens"))
      .join(scored, Seq("doc_key"), "left")
      .select(col("doc_key"), col("n_tokens"),
        (col("__sdec").cast("double") / col("n_tokens")).as("kn_logprob"))
  }
}
