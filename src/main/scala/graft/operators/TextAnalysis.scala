package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._

/** Text-analysis operators over `documents`: token counting, quality
  * scoring, language ID, fingerprinting. All per-row narrow transforms —
  * at 100 TB these run as a single scan stage with zero shuffle (the final
  * per-lang rollups aggregate a handful of groups).
  */
object TextAnalysis {

  // ---------------------------------------------------------------- t01
  /** Token counting: whitespace tokens per doc, rolled up per (lang,
    * source). Map-side partial agg → 25 groups; no data-sized shuffle. */
  def t01TokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        size(tokens(col("text"))).as("n_tok"),
        col("n_chars"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang", "source")

  val t01Sql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS total_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- t02
  /** Quality scoring: per-doc length / punctuation / digit / uppercase /
    * mean-token-length signals, integer-exact where possible, plus a
    * composite score with a fully deterministic double expression tree. */
  def t02Quality(s: SparkSession, d: String): DataFrame = {
    val txt = col("text")
    val nTok = size(tokens(txt))
    // BPE-ish pre-tokenization: letter runs / digit runs / single other
    // non-space — the GPT-2-style regex shape, counts sub-word-mergeable
    // units rather than whitespace words
    val nBpe = regexCount(txt, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
    val punct = regexCount(txt, "[.,!?;:]")
    val digit = regexCount(txt, "[0-9]")
    val upper = regexCount(txt, "[A-Z]")
    val nchar = length(txt)
    Tables.documents(s, d)
      .select(col("doc_id"), nchar.as("n_char"), nTok.as("n_tok"),
        nBpe.as("n_bpe"),
        punct.as("n_punct"), digit.as("n_digit"), upper.as("n_upper"),
        (nchar.cast("double") / nTok).as("chars_per_tok"))
      .orderBy("doc_id")
  }

  val t02Sql: String =
    """SELECT doc_id, LENGTH(text) AS n_char,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
      |  len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
      |  len(regexp_extract_all(text, '[0-9]')) AS n_digit,
      |  len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
      |  CAST(LENGTH(text) AS DOUBLE) /
      |    len(string_split_regex(lower(trim(text)), '\s+')) AS chars_per_tok
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t03
  /** Language ID: stopword-hit heuristic over per-language marker sets,
    * argmax with a fixed priority tie-break. (The corpus text is synthetic
    * so this checks the operator, not linguistic accuracy.) */
  private val markers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|a)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b",
    "es" -> "\\b(el|los|las|y|es)\\b",
    "zh" -> "\\b(de|shi|le|zai|he)\\b")

  /** Marker-hit argmax with first-listed-wins tie-break — the langid
    * kernel shared by t03 (per-doc report) and t07 (pipeline stage). */
  private def langGuess(hits: Seq[(String, Column)]): Column =
    hits.tail.foldLeft((lit(hits.head._1), hits.head._2)) {
      case ((bl, bc), (l, c)) =>
        (when(c > bc, lit(l)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }._1

  /** The same argmax fold over `hits_<lang>` SQL aliases (oracle side). */
  private def langGuessSql: String =
    markers.tail.foldLeft(s"'${markers.head._1}'" -> s"hits_${markers.head._1}") {
      case ((bl, bc), (l, _)) =>
        (s"CASE WHEN hits_$l > $bc THEN '$l' ELSE $bl END",
          s"CASE WHEN hits_$l > $bc THEN hits_$l ELSE $bc END")
    }._1

  private def markerHits(txt: Column): Seq[(String, Column)] = {
    val lowered = lower(txt)
    markers.map { case (l, p) => l -> regexCount(lowered, p) }
  }

  def t03LangId(s: SparkSession, d: String): DataFrame = {
    val hits = markerHits(col("text"))
    val outCols = Seq(col("doc_id"), col("lang")) ++
      hits.map { case (l, c) => c.as(s"hits_$l") } :+ langGuess(hits).as("guess")
    Tables.fanOut(Tables.documents(s, d), col("doc_id")) // r16 fan-out; r17 PK key
      .select(outCols: _*)
      .withColumn("is_match", (col("guess") === col("lang")).cast("int"))
      .orderBy("doc_id")
  }

  private def hitColsSql: String = markers.map { case (l, p) =>
    s"len(regexp_extract_all(lower(text), '$p')) AS hits_$l"
  }.mkString(",\n  ")

  val t03Sql: String =
    s"""SELECT doc_id, lang, ${markers.map(m => s"hits_${m._1}").mkString(", ")},
       |  guess, CAST(guess = lang AS INTEGER) AS is_match
       |FROM (
       |  SELECT doc_id, lang,
       |  $hitColsSql,
       |  $langGuessSql AS guess
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t04
  /** Winnowing fingerprints (k=5, w=4): per-doc fingerprint count and a
    * combined 64-bit digest (xor-fold — order-insensitive). Rows-only
    * check; exact values asserted in TextAnalysisSpec. */
  def t04Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), winnowUdf(5, 4)(col("text")).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fp"),
        aggregate(col("fp"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("digest"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- t05
  /** Driver-visible winnowing gate: prefix each of the 20 lowest-id docs
    * with a 17-char junk string and require the winnowing property to
    * hold — local fingerprints are content-defined, so the shifted copy
    * must share most of the original's hashes (only windows straddling
    * the prefix boundary may differ). A hash-function or window-selection
    * regression flips a driver CORRECTNESS row. */
  def t05FingerprintGate(s: SparkSession, d: String): DataFrame = {
    val fp = graft.functions.TextFns.winnowUdf(5, 4)
    val pair = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id").asc).limit(20)
      .select(col("doc_id"),
        fp(col("text")).as("fp0"),
        fp(concat(lit("xqzvkyjwbu_pfx42 "), col("text"))).as("fp1"))
    val overlap =
      graft.functions.IntersectCountExpr
        .intersectCountSorted(col("fp0"), col("fp1")).cast("double") /
        size(col("fp0"))
    val ok = when(size(col("fp0")) === 0, lit(true)).otherwise(overlap >= 0.6)
    pair.agg(
      count(lit(1)).as("n_docs"),
      sum(when(ok, 1).otherwise(0)).cast("long").as("n_shift_robust"))
      .select(col("n_docs"), col("n_shift_robust"),
        (col("n_docs") === col("n_shift_robust")).as("all_ok"))
  }

  val t05Sql: String =
    """WITH base AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_shift_robust, true AS all_ok
      |FROM base""".stripMargin

  // ---------------------------------------------------------------- t06
  /** Stratified corpus sampling — the domain-mixing step of a training-data
    * pipeline: each language stratum keeps a configured fraction of its
    * documents. The selector is DETERMINISTIC per row (doc_id modulus, not
    * an RNG), so the sample is reproducible across runs/partitionings and
    * exactly restatable by the oracle; at 100 TB this is a narrow scan —
    * no shuffle, no per-stratum pass, the mix lands in one pipeline. The
    * per-stratum rollup reports achieved rates next to the targets. */
  private val SampleRates: Map[String, Int] = // percent kept, per lang
    Map("en" -> 50, "zh" -> 80, "de" -> 100, "es" -> 25, "fr" -> 10)

  def t06StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val rate = SampleRates.foldLeft(lit(0)) { case (e, (l, p)) =>
      when(col("lang") === l, lit(p)).otherwise(e)
    }
    Tables.documents(s, d)
      .where(pmod(col("doc_id"), lit(100)) < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("kept_chars"))
      .orderBy("lang")
  }

  val t06Sql: String =
    """SELECT lang, COUNT(*) AS n_kept,
      |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
      |FROM documents
      |WHERE doc_id % 100 < (CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 80
      |  WHEN 'de' THEN 100 WHEN 'es' THEN 25 WHEN 'fr' THEN 10 ELSE 0 END)
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t07
  /** The curation pipeline END-TO-END — the composition a training-data
    * run actually executes, wired as ONE declarative plan: language-ID
    * (t03's marker argmax) → quality gate (length / token / digit-ratio
    * floors) → exact dedup among the quality survivors (keep lowest
    * doc_id per content hash) → stratified sample at per-language rates
    * (t06's deterministic doc_id-modulus selector) → per-language funnel
    * report (docs in → langid agreement → quality → unique → sampled,
    * plus kept tokens).
    *
    * Scale shape: all per-doc signals are narrow (one corpus scan, no
    * UDFs); the ONLY data-sized shuffle is the dedup window, partitioned
    * by (md5, quality) — uniform by construction, no skew; the rollup is
    * a handful of groups. At 100 TB this is one scan stage + one
    * skew-free exchange, and every stage is deterministic, so the whole
    * funnel is restatable by the oracle (no RNG, no sketch). */
  def t07CurationPipeline(s: SparkSession, d: String): DataFrame = {
    val txt = col("text")
    val nTok = size(tokens(txt))
    val quality = length(txt) >= 100 && nTok >= 20 &&
      regexCount(txt, "[0-9]") * 5 <= length(txt) // digit ratio < 20%
    val flagged = Tables.fanOut(Tables.documents(s, d), col("doc_id")).select( // r16 fan-out; r17 PK key
      col("doc_id"), col("lang"),
      (langGuess(markerHits(txt)) === col("lang")).as("guess_ok"),
      quality.as("q"), nTok.as("n_tok"),
      md5(encode(txt, "UTF-8")).as("h"))
    // dedup rank within (hash, quality): the lowest-id QUALITY copy is the
    // keeper; low-quality copies rank in their own partition and never win
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h"), col("q")).orderBy(col("doc_id").asc)
    val rate = SampleRates.foldLeft(lit(0)) { case (e, (l, p)) =>
      when(col("lang") === l, lit(p)).otherwise(e)
    }
    flagged
      .withColumn("uniq", col("q") && row_number().over(w) === 1)
      .withColumn("sampled", col("uniq") && pmod(col("doc_id"), lit(100)) < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("guess_ok").cast("long")).as("n_guess_match"),
        sum(col("q").cast("long")).as("n_quality"),
        sum(col("uniq").cast("long")).as("n_unique"),
        sum(col("sampled").cast("long")).as("n_sampled"),
        sum(when(col("sampled"), col("n_tok")).otherwise(0)).cast("long")
          .as("kept_tokens"))
      .orderBy("lang")
  }

  val t07Sql: String = {
    val rateCase = SampleRates
      .map { case (l, p) => s"WHEN '$l' THEN $p" }
      .mkString("CASE lang ", " ", " ELSE 0 END")
    s"""WITH scored AS (
       |  SELECT doc_id, lang, text,
       |    $hitColsSql,
       |    ($langGuessSql = lang) AS guess_ok,
       |    len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok,
       |    (LENGTH(text) >= 100
       |      AND len(string_split_regex(lower(trim(text)), '\\s+')) >= 20
       |      AND len(regexp_extract_all(text, '[0-9]')) * 5 <= LENGTH(text))
       |      AS q
       |  FROM documents),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY md5(text), q ORDER BY doc_id) AS rn
       |  FROM scored),
       |fin AS (
       |  SELECT lang, guess_ok, q, (q AND rn = 1) AS uniq,
       |    (q AND rn = 1 AND doc_id % 100 < $rateCase) AS sampled, n_tok
       |  FROM ranked)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN guess_ok THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_guess_match,
       |  CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       |  CAST(SUM(CASE WHEN uniq THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       |  CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  CAST(SUM(CASE WHEN sampled THEN n_tok ELSE 0 END) AS BIGINT)
       |    AS kept_tokens
       |FROM fin GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- t08
  /** Train/eval decontamination — the overlap check a training-data
    * pipeline runs before shipping a corpus: flag every training document
    * sharing at least one long character n-gram (32 chars ≈ the classic
    * 13-token window) with any document of the evaluation set, reporting
    * the number of distinct shared grams per flagged doc.
    *
    * Gate shape (d07 technique): the 20 lowest-id documents form the eval
    * set and exact copies of them (id + 10^9) are planted into the train
    * side — a copy shares EVERY gram with its original, so all 20 planted
    * rows MUST be flagged, alongside any natural long-gram overlap in the
    * corpus. Deterministic, fully oracle-restatable.
    *
    * Scale shape: the eval side of any real decontamination run is tiny
    * (benchmarks are MBs; the corpus is the 100 TB side), so the distinct
    * eval-gram set is BROADCAST — the train side is one narrow
    * explode→broadcast-hash-join pipeline with no data-sized shuffle; only
    * the matched grams (contamination is rare by construction) reach the
    * per-doc countDistinct exchange. The probe runs on 64-bit gram HASHES
    * on both sides, produced by the native one-pass [[ShingleHashesExpr]]
    * (the same deduped k-gram kernel d02/d03 shingle with, at k=32) — no
    * gram string is ever materialized, the builtin
    * `transform(sequence, substr)` composition's O(len²) substr cost is
    * avoided, and the broadcast set and every exploded train row carry 8
    * bytes instead of ~32+ — with the string formulation kept as the
    * oracle restatement and as a spec-asserted reference path (a 64-bit
    * collision between a corpus gram and a distinct eval gram — odds
    * ~g²/2⁶⁴ — is the accepted trade). */
  def t08Decontaminate(s: SparkSession, d: String): DataFrame =
    t08Path(s, d, hashed = true)

  /** String-gram reference formulation (spec-only): must flag the exact
    * same (doc_id, n_shared) set as the hashed probe. */
  private[operators] def t08DecontaminateStr(
      s: SparkSession, d: String): DataFrame =
    t08Path(s, d, hashed = false)

  private def t08Path(s: SparkSession, d: String, hashed: Boolean): DataFrame = {
    val n = 32
    val grams: Column => Column =
      if (hashed) c => shingleHashes(c, n) // native: one pass, pre-deduped
      else c => array_distinct(
        graft.functions.CharNgramsExpr.charNgrams(c, n))
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    Dedup.assertIdHeadroom(docs, "doc_id", d)
    val evalDocs = docs.orderBy(col("doc_id").asc).limit(20)
    val evalIds = evalDocs.select("doc_id")
    val planted = evalDocs.select(
      (col("doc_id") + lit(Dedup.PlantOffset)).as("doc_id"), col("text"))
    // eval grams come from the 20-row eval frame, and the eval anti-join
    // runs BEFORE the explode — the corpus is gram-exploded exactly once,
    // and only on the train side
    val evalGrams = evalDocs
      .select(explode(grams(col("text"))).as("gram")).distinct()
    docs.union(planted)
      .join(evalIds, Seq("doc_id"), "left_anti") // train side (incl. planted)
      .select(col("doc_id"), explode(grams(col("text"))).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared"))
      .orderBy("doc_id")
  }

  val t08Sql: String =
    """WITH eval_ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, text FROM documents
      |  WHERE doc_id IN (SELECT doc_id FROM eval_ids)),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |        range(1, greatest(length(text) - 31, 0) + 1),
      |        i -> substr(text, CAST(i AS INTEGER), 32)))) AS gram
      |      FROM corpus),
      |eg AS (SELECT DISTINCT gram FROM g
      |       WHERE doc_id IN (SELECT doc_id FROM eval_ids))
      |SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_shared
      |FROM g JOIN eg USING (gram)
      |WHERE g.doc_id NOT IN (SELECT doc_id FROM eval_ids)
      |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t09
  /** Per-language token-budget fill — greedy mixture construction: each
    * language keeps its documents in priority order (longest first,
    * doc_id tie-break) until a fixed token budget is exhausted, reporting
    * per-language kept docs/tokens.
    *
    * Scale shape: the naive formulation is a running sum over a window
    * partitioned by language — at 100 TB that funnels EVERY document of a
    * language through one reducer. This implementation is the exact
    * two-phase equivalent (q23's value-histogram technique): (1) one
    * map-side-combinable aggregate to a tiny (lang, n_chars) histogram,
    * cumulated per language on the HISTOGRAM (thousands of rows, not
    * documents) to find each language's cutoff bucket and its leftover
    * budget; (2) fully-kept buckets join back broadcast; only the single
    * boundary bucket per language needs doc-level work — and that work is
    * itself two-level (sub-histogram over doc_id >> 16 ranges, then a
    * window inside the one crossing sub-bucket), so no window partition
    * ever exceeds 2^16 docs even when a length-quantized corpus collapses
    * a whole language into one (lang, n_chars) bucket. Output is provably
    * identical to the flat window (OperatorsSpec asserts equality,
    * including on a degenerate single-length corpus), and the oracle
    * restates the flat form.
    *
    * The narrow (doc_id, lang, n_chars, n_tok) projection feeds three
    * subtrees; at 100 TB a pipeline materializes per-doc token counts once
    * (8 bytes/doc vs ~KB of text) before budget passes like this one, so
    * the repeated token derivation here stands in for three cheap scans of
    * that side table, not three scans of the corpus text. */
  private val TokenBudget = 15000L

  /** The flat single-window formulation (spec-only reference; the
    * histogram path must produce exactly this). */
  def t09TokenBudgetFlat(s: SparkSession, d: String): DataFrame =
    t09TokenBudgetFlat(s, d, TokenBudget)

  private[operators] def t09TokenBudgetFlat(
      s: SparkSession, d: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(tokens(col("text"))).as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .where(col("cum_tok") <= budget)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tok")).cast("long").as("kept_tokens"))
      .orderBy("lang")
  }

  def t09TokenBudget(s: SparkSession, d: String): DataFrame =
    t09TokenBudget(s, d, TokenBudget)

  /** `subShift` sizes the second cutoff level: the doc-level window runs
    * inside a single (lang, n_chars, doc_id >> subShift) sub-bucket, so no
    * window partition ever exceeds 2^subShift docs (ids are distinct) —
    * the default bounds it at 65,536 regardless of corpus shape. Exposed
    * for specs, which shrink it to force many sub-buckets on tiny data.
    * Precondition: doc_id ≥ 0 (the unsigned shift is order-preserving
    * only on non-negative ids — the same assumption the planted gates'
    * id-headroom guard already enforces corpus-wide). */
  private[operators] def t09TokenBudget(s: SparkSession, d: String,
      budget: Long, subShift: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(tokens(col("text"))).as("n_tok"))
    val hist = docs.groupBy(col("lang"), col("n_chars"))
      .agg(sum(col("n_tok")).cast("long").as("bucket_tok"))
    val wb = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum_tok", sum(col("bucket_tok")).over(wb))
      .withColumn("prior_tok", col("cum_tok") - col("bucket_tok"))
    val full = cum.where(col("cum_tok") <= budget)
      .select(col("lang"), col("n_chars"))
    val boundary = cum
      .where(col("prior_tok") < budget && col("cum_tok") > budget)
      .select(col("lang"), col("n_chars"),
        (lit(budget) - col("prior_tok")).as("leftover"))
    val keptFull = docs.join(broadcast(full), Seq("lang", "n_chars"))
    // Doc-level work is confined to the boundary bucket — and within it, a
    // SECOND histogram level over doc_id ranges guards against the
    // degenerate corpus where (lang, n_chars) is one whole language (every
    // doc truncated to the same length): the boundary docs first cumulate
    // as a (lang, n_chars, doc_id >> subShift) sub-histogram — doc order
    // is doc_id asc and the shift is monotone in doc_id, so the sub-bucket
    // prefix order IS the doc prefix order and the greedy fill is
    // unchanged — then only the single crossing sub-bucket needs the
    // doc-level running sum, bounded by 2^subShift docs. Sub-level joins
    // carry no broadcast hint: sub-histograms are usually tiny (AQE
    // broadcasts them) but can reach corpus/2^subShift rows in the
    // degenerate case, where the fine-grained (lang, n_chars, sub) key
    // keeps the shuffle skew-free.
    val bdocs = docs.join(broadcast(boundary), Seq("lang", "n_chars"))
      .withColumn("sub", shiftrightunsigned(col("doc_id"), subShift))
    val subHist = bdocs
      .groupBy(col("lang"), col("n_chars"), col("sub"))
      .agg(sum(col("n_tok")).cast("long").as("sub_tok"),
        min(col("leftover")).as("leftover")) // constant per boundary bucket
    val ws = Window.partitionBy(col("lang"), col("n_chars"))
      .orderBy(col("sub").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val subCum = subHist.withColumn("cum_sub", sum(col("sub_tok")).over(ws))
      .withColumn("prior_sub", col("cum_sub") - col("sub_tok"))
    val subFull = subCum.where(col("cum_sub") <= col("leftover"))
      .select(col("lang"), col("n_chars"), col("sub"))
    val subBoundary = subCum
      .where(col("prior_sub") < col("leftover") &&
        col("cum_sub") > col("leftover"))
      .select(col("lang"), col("n_chars"), col("sub"),
        (col("leftover") - col("prior_sub")).as("sub_leftover"))
    val keptSubFull = bdocs.join(subFull, Seq("lang", "n_chars", "sub"))
      .select(docs.columns.map(col): _*)
    val wd = Window.partitionBy(col("lang"), col("n_chars"), col("sub"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptSubBoundary = bdocs.join(subBoundary, Seq("lang", "n_chars", "sub"))
      .withColumn("bcum", sum(col("n_tok")).over(wd))
      .where(col("bcum") <= col("sub_leftover"))
      .select(docs.columns.map(col): _*)
    keptFull.unionByName(keptSubFull).unionByName(keptSubBoundary)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tok")).cast("long").as("kept_tokens"))
      .orderBy("lang")
  }

  val t09Sql: String =
    """SELECT lang, COUNT(*) AS n_kept,
      |  CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
      |FROM (
      |  SELECT lang, n_tok, SUM(n_tok) OVER (
      |      PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
      |  FROM (SELECT doc_id, lang, n_chars,
      |          len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
      |        FROM documents) t) c
      |WHERE cum_tok <= 15000
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t10
  /** PII detection + redaction — the scrub pass a curation pipeline runs
    * before shipping: per-doc email and phone-number match counts plus
    * the md5 of the redacted text (matches replaced by `<EMAIL>` /
    * `<PHONE>` placeholders). Narrow per-row regexps, zero shuffle.
    *
    * The corpus is synthetic word salad with no natural PII, so the d07
    * planted technique makes the contract exact: PII-bearing copies of
    * the 20 lowest-id docs are planted (id + 10⁹) and every planted doc
    * MUST surface with exactly the planted counts — and the redaction is
    * value-checked through the md5, not just counted. The regexes stay in
    * the ASCII subset where Java (Spark) and RE2 (DuckDB) agree; any
    * natural match the corpus did contain would be computed identically
    * by both engines. */
  def t10PiiRedact(s: SparkSession, d: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    // r16: NO fanOut here — t10's scale contract is the zero-shuffle
    // narrow map-only scan (OperatorsSpec pins no hashpartitioning)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    Dedup.assertIdHeadroom(docs, "doc_id", d)
    val pii =
      " contact me at jane.doe+spam@example-mail.org or 555-867-5309 now"
    val planted = docs.orderBy(col("doc_id").asc).limit(20)
      .select((col("doc_id") + lit(Dedup.PlantOffset)).as("doc_id"),
        concat(col("text"), lit(pii)).as("text"))
    docs.union(planted)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phone), lit(0)))
          .cast("long").as("n_phones"),
        md5(encode(regexp_replace(
          regexp_replace(col("text"), email, "<EMAIL>"),
          phone, "<PHONE>"), "UTF-8")).as("redacted_md5"))
      .where(col("n_emails") + col("n_phones") > 0)
      .orderBy("doc_id")
  }

  val t10Sql: String =
    """WITH base AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20),
      |corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000,
      |    text || ' contact me at jane.doe+spam@example-mail.org or 555-867-5309 now'
      |  FROM base),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |    CAST(len(regexp_extract_all(text,
      |      '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
      |    md5(regexp_replace(regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
      |  FROM corpus)
      |SELECT doc_id, n_emails, n_phones, redacted_md5 FROM m
      |WHERE n_emails + n_phones > 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t11
  /** Repetition scoring — the MassiveText/Gopher-family quality signal:
    * per doc, the fraction of adjacent token bigrams taken by the single
    * most frequent bigram (near 1.0 = boilerplate / generation loop).
    *
    * Scale shape: computed per ROW by the native one-pass
    * [[graft.functions.TopBigramExpr]] — zero shuffle, stays in
    * whole-stage codegen. The naive distributed formulation (explode
    * bigrams → groupBy (doc_id, bigram) → max/sum) turns a per-row
    * statistic into a corpus-sized exchange; the oracle restates that
    * form, the engine never runs it. */
  def t11Repetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), col("lang"),
        (size(col("t")) - 1).cast("long").as("n_bigrams"),
        round(graft.functions.TopBigramExpr.topBigramFraction(col("t")), 6)
          .as("top_bigram_frac"))
      .orderBy("doc_id")

  val t11Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, lang, len(toks) - 1 AS n_bigrams,
      |    unnest(list_transform(range(1, len(toks)),
      |      i -> toks[i] || chr(31) || toks[i + 1])) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |c AS (
      |  SELECT doc_id, lang, n_bigrams, bg, COUNT(*) AS c
      |  FROM b GROUP BY doc_id, lang, n_bigrams, bg)
      |SELECT doc_id, lang, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  ROUND(CAST(MAX(c) AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac
      |FROM c GROUP BY doc_id, lang, n_bigrams ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t12
  /** Keyword extraction: per-doc top-3 terms by a tf-idf-family weight,
    * ties broken by term. The idf factor is the RATIONAL surrogate
    * `(N − df + 0.5) / (df + 0.5)` — the BM25 idf ratio without the log.
    * log/ln is not IEEE-754-mandated correctly-rounded, so JVM and DuckDB
    * libms can disagree in the last ulp and flip ranks on near-ties,
    * while `+ − × ÷` ARE correctly rounded everywhere: the identical
    * double expression tree is bit-exact on both engines. At fixed tf the
    * ordering is log-monotone in the ratio; a deployment wanting classic
    * ln-idf swaps one expression, the plan is unchanged.
    *
    * Scale shape: the token explode is narrow; the (doc_id, term) tf
    * aggregate is one shuffle on a uniform composite key (map-side
    * partials absorb within-doc repeats); the df table aggregates to
    * vocabulary size — tiny, broadcast back; the top-k is a per-doc
    * window whose partition is the doc's distinct-term set, bounded by
    * doc length, never corpus-sized (and Spark's WindowGroupLimit prunes
    * below rank 3 before the final sort). Single-plan trade, stated: the
    * df branch re-derives the tf aggregate (Catalyst does not CSE across
    * the join), so the corpus is scanned and the (doc, term) exchange
    * paid twice; a pipeline reusing tf STAGES it once (persist or a
    * parquet write) and derives both sides from the staged frame — same
    * operators, one scan. The window-over-term alternative that avoids
    * the second scan would shuffle the corpus on the low-cardinality term
    * key — a skewed exchange strictly worse at scale. */
  def t12Keywords(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        col("score"))
      .orderBy("doc_id", "rk")
  }

  val t12Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |       GROUP BY doc_id, term),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |sc AS (
      |  SELECT t.doc_id, t.term, t.tf, d.df,
      |    CAST(t.tf AS DOUBLE) *
      |      ((CAST(n.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) /
      |       (CAST(d.df AS DOUBLE) + 0.5)) AS score
      |  FROM tf t JOIN df d USING (term) CROSS JOIN n),
      |r AS (
      |  SELECT doc_id, term, tf, df, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, term ASC) AS rk
      |  FROM sc)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term,
      |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // ---------------------------------------------------------------- t13
  /** Corpus data-card report: per (lang, source) — doc count, exact-dup
    * rate (1 − distinct content hashes / docs), token and char totals —
    * the per-slice summary a curation run publishes alongside the data.
    *
    * Scale shape: one corpus scan; the distinct-hash count plans as the
    * standard two-phase distinct aggregate (partial groupBy on the
    * uniform (lang, source, md5) key, then re-aggregate) — skew-free,
    * and the output is the ~25-slice card. All doubles are quotients of
    * exact integer aggregates with identical expression trees on both
    * engines. */
  def t13CorpusStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), col("source"), col("n_chars"),
        md5(encode(col("text"), "UTF-8")).as("h"),
        size(tokens(col("text"))).as("n_tok"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("h")).as("n_unique"),
        sum(col("n_tok")).cast("long").as("total_tokens"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
          .as("avg_chars"),
        round(lit(1.0).cast("double") -
          count_distinct(col("h")).cast("double") / count(lit(1)), 6)
          .as("dup_rate"))
      .orderBy("lang", "source")

  val t13Sql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_unique,
      |  CAST(SUM(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS total_tokens,
      |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
      |  ROUND(CAST(1 AS DOUBLE) -
      |    CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6) AS dup_rate
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- t14
  /** Sequence packing, concat-and-chunk (the GPT-style pre-training data
    * op): conceptually concatenate all docs in doc_id order and split
    * the token stream at fixed `PackSeqLen`-token boundaries; emit per
    * doc its global token offset and the first/last training-sequence
    * index it lands in (no padding by construction). What every
    * pre-training data loader needs, computed ahead of time so shard
    * readers can seek.
    *
    * The global prefix sum is the scale problem: a flat
    * `Window.orderBy(doc_id)` is one reducer holding the corpus. Here it
    * is EXACT but two-level (the t09 sub-histogram technique as a full
    * per-row cumsum): block sums over doc_id >> 16 (corpus/65 536 rows)
    * take the only global window — tiny; each doc then adds its
    * within-block running sum (window partitions bounded by 2^16 docs).
    * The doc_id >> shift blocks are monotone in doc_id, so
    * block-prefix + within-block-prefix IS the flat prefix — the
    * equality the spec pins, at ANY shift (the spec also runs shift 2).
    * Non-negative doc_id is a precondition of the unsigned shift (same
    * as t09); for 10^12-doc corpora raise `spark.graft.packShift`
    * (default 16 — block count n/2^shift and within-block window width
    * 2^shift trade against each other; 20 balances a trillion docs) or
    * add a third level — same argument. The block join carries
    * no broadcast hint: dense ids give a tiny block frame (AQE
    * broadcasts it), sparse ids can grow it toward corpus size, where
    * the uniform blk key keeps the shuffle skew-free.
    *
    * The narrow (doc_id, n_tok) frame — exactly t09's
    * materialize-token-counts-once frame, 16 bytes/doc vs ~KB of text —
    * is STAGED eagerly (checkpoint, [[Dedup.truncateLineage]]: local in
    * one-JVM runs, `spark.graft.checkpointDir` for a reliable store on
    * clusters) and BOTH prefix-sum branches read the staged columns: one
    * corpus scan + tokenize total, where the previous single-plan form
    * re-derived the scan under the join (no CSE across branches; the
    * TextAnalysisPlanSpec pins the staged plan's scan-freedom).
    *
    * When `spark.graft.packShift` is unset, the shift is DERIVED from the
    * staged frame's id range: shift ≈ log₂(maxId)/2 balances the block
    * count against the within-block window width at ~√n each — the
    * two-level split that stays bounded from 10⁶ to 10¹² docs without
    * retuning (clamped to [8, 31]; the spec's shift-invariance equality
    * holds at any value). */
  private val PackSeqLen = 2048

  /** Balance point of the two-level prefix sum: blocks ≈ block width ≈
    * √(id range). Empty corpus → the clamp floor (any value is correct —
    * there are no rows). */
  private def derivedPackShift(staged: DataFrame): Int = {
    val r = staged.agg(max(col("doc_id"))).head
    val bits = if (r.isNullAt(0)) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(math.max(r.getLong(0), 1L))
    math.min(math.max((bits + 1) / 2, 8), 31)
  }

  def t14SeqPack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val staged = Dedup.truncateLineage(
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
        .where(col("n_tok") > 0))
    val shift = s.conf.getOption("spark.graft.packShift")
      .map(_.toInt).getOrElse(derivedPackShift(staged))
    require(shift >= 0 && shift < 63, s"packShift $shift out of range")
    val docs = staged
      .withColumn("blk", shiftrightunsigned(col("doc_id"), shift))
    val wb = Window.orderBy(col("blk").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blockPrefix = docs.groupBy(col("blk"))
      .agg(sum(col("n_tok")).as("blk_tok"))
      .withColumn("blk_off", sum(col("blk_tok")).over(wb) - col("blk_tok"))
      .select(col("blk"), col("blk_off"))
    val ww = Window.partitionBy(col("blk")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(blockPrefix, Seq("blk"))
      .withColumn("cum_in_blk", sum(col("n_tok")).over(ww))
      .withColumn("tok_offset", col("blk_off") + col("cum_in_blk") - col("n_tok"))
      .select(col("doc_id"), col("n_tok"), col("tok_offset"),
        expr(s"tok_offset div $PackSeqLen").as("first_seq"),
        expr(s"(tok_offset + n_tok - 1) div $PackSeqLen").as("last_seq"))
      .orderBy("doc_id")
  }

  val t14Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tok,
      |    CAST(SUM(n_tok) OVER (ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
      |      AS BIGINT) AS tok_offset
      |  FROM t WHERE n_tok > 0)
      |SELECT doc_id, n_tok, tok_offset,
      |  tok_offset // 2048 AS first_seq,
      |  (tok_offset + n_tok - 1) // 2048 AS last_seq
      |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t16
  /** Packed-sequence inverse map — t14's other direction: for every
    * training sequence, the (doc_id, start_tok, len) spans that fill it,
    * the lookup a data loader needs to trace a training example back to
    * its source documents (and the provenance record audits need at
    * scale). Pure arithmetic on t14's offsets: each doc explodes into its
    * [first_seq, last_seq] range (≤ ⌈n_tok/2048⌉ + 1 rows per doc — the
    * explode adds NO shuffle; the final orderBy is presentation-only) and
    * clips its token interval against each sequence's fixed boundaries.
    * t14/t16 are bijective: per doc the span lengths sum to n_tok, per
    * sequence they sum to exactly PackSeqLen (except the final partial
    * sequence) — OperatorsSpec pins both directions. */
  def t16PackSpans(s: SparkSession, d: String): DataFrame = {
    val seqLen = lit(PackSeqLen.toLong)
    t14SeqPack(s, d)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        (greatest(col("seq_id") * seqLen, col("tok_offset")) -
          col("tok_offset")).as("start_tok"),
        (least((col("seq_id") + 1) * seqLen,
            col("tok_offset") + col("n_tok")) -
          greatest(col("seq_id") * seqLen, col("tok_offset"))).as("len"))
      .orderBy("seq_id", "doc_id")
  }

  val t16Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tok,
      |    CAST(SUM(n_tok) OVER (ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
      |      AS BIGINT) AS tok_offset
      |  FROM t WHERE n_tok > 0),
      |seqs AS (
      |  SELECT doc_id, n_tok, tok_offset,
      |    unnest(range(tok_offset // 2048,
      |      (tok_offset + n_tok - 1) // 2048 + 1)) AS seq_id
      |  FROM c)
      |SELECT seq_id, doc_id,
      |  greatest(seq_id * 2048, tok_offset) - tok_offset AS start_tok,
      |  least((seq_id + 1) * 2048, tok_offset + n_tok) -
      |    greatest(seq_id * 2048, tok_offset) AS len
      |FROM seqs ORDER BY seq_id, doc_id""".stripMargin

  // ---------------------------------------------------------------- t17
  /** Materialized pack shards — the artifact a training loader actually
    * reads, one step past t14 (offsets) and t16 (spans): every
    * `PackSeqLen`-token training sequence ASSEMBLED as an `array<long>` of
    * token ids (spans concatenated in doc_id order — exactly t16's span
    * map made physical), written `partitionBy(shard)` so a data-parallel
    * rank's shard assignment is a directory listing and a shard is an
    * independently readable parquet leaf.
    *
    * Token ids are the low 60 bits of md5(token) — a stand-in vocabulary
    * that is deterministic, collision-negligible at 2^60, and restatable
    * by the oracle (`conv(hex)` here ≡ DuckDB `CAST('0x…')`); a real BPE
    * vocab would slot in as a broadcast map without changing the shapes.
    *
    * Scale shape: tokenization is a narrow scan; the span join shuffles
    * on doc_id and the assembly on seq_id — both dense uniform keys, so
    * neither skews; per-group state is bounded (≤ PackSeqLen ids per
    * sequence, ≤ ⌈n_tok/PackSeqLen⌉+1 spans per doc). The sink partitions
    * by shard (seq_id div PackShardSeqs — contiguous ranges, so a shard's
    * sequences are consecutive and a loader's seek is a range read).
    *
    * The gate checks the WRITTEN ARTIFACT (like x08): the parquet is read
    * back and each sequence reduced to an order-SENSITIVE positional
    * checksum Σ (i+1)·(id_i mod 1000003) plus its fill count — a
    * transposed, dropped, or mis-ordered token anywhere in any shard
    * flips the hash; n_filled pins t16 bijectivity (2048 everywhere but
    * the final sequence). */
  private val PackShardSeqs = 16L

  def t17PackShards(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val sfTag = d.replaceAll("[^A-Za-z0-9]", "_")
    val out = s"${HadoopIO.scratchDir(s)}/graft_t17_$sfTag"
    val docToks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val spans = t16PackSpans(s, d) // (seq_id, doc_id, start_tok, len)
    val spanToks = spans.join(docToks, Seq("doc_id"))
      .select(col("seq_id"), col("doc_id"),
        transform(
          slice(col("toks"), (col("start_tok") + 1).cast("int"),
            col("len").cast("int")),
          t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
          .as("ids"))
    val seqs = spanToks
      .groupBy(col("seq_id"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("doc_id"), col("ids")))),
        x => x.getField("ids"))).as("token_ids"))
      .withColumn("shard", expr(s"seq_id div $PackShardSeqs"))
    seqs.write.mode("overwrite").partitionBy("shard").parquet(out)
    s.read.parquet(out)
      .select(col("seq_id"), col("shard").cast("long").as("shard"),
        size(col("token_ids")).cast("long").as("n_filled"),
        expr("aggregate(transform(token_ids, (x, i) -> (i + 1) * (x % 1000003)), 0L, (a, b) -> a + b)")
          .as("chk"))
      .orderBy("seq_id")
  }

  val t17Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks,
      |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, n_tok,
      |    CAST(SUM(n_tok) OVER (ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
      |      AS BIGINT) AS tok_offset
      |  FROM t WHERE n_tok > 0),
      |seqs AS (
      |  SELECT doc_id, toks, n_tok, tok_offset,
      |    unnest(range(tok_offset // 2048,
      |      (tok_offset + n_tok - 1) // 2048 + 1)) AS seq_id
      |  FROM c),
      |spans AS (
      |  SELECT seq_id, doc_id, toks,
      |    greatest(seq_id * 2048, tok_offset) - tok_offset AS start_tok,
      |    least((seq_id + 1) * 2048, tok_offset + n_tok) -
      |      greatest(seq_id * 2048, tok_offset) AS len,
      |    greatest(seq_id * 2048, tok_offset) - seq_id * 2048 AS seq_pos
      |  FROM seqs),
      |spanchk AS (
      |  SELECT seq_id, len,
      |    list_sum(list_transform(range(1, CAST(len AS INT) + 1), i ->
      |      (seq_pos + i) *
      |      (CAST(concat('0x', substr(md5(toks[CAST(start_tok + i AS INT)]), 1, 15))
      |         AS BIGINT) % 1000003))) AS chk
      |  FROM spans)
      |SELECT seq_id, seq_id // 16 AS shard,
      |  CAST(SUM(len) AS BIGINT) AS n_filled,
      |  CAST(SUM(chk) AS BIGINT) AS chk
      |FROM spanchk GROUP BY seq_id ORDER BY seq_id""".stripMargin

  // ---------------------------------------------------------------- t18
  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public arXiv paper):
    * score every corpus document by how much its hashed-n-gram feature
    * distribution looks like a TARGET domain sample, the op that picks
    * pre-training data matching a quality/domain reference. Features are
    * token bigrams hashed into `buckets`; each bucket gets an add-one-
    * smoothed log importance ratio log p_target(b) − log p_raw(b); a
    * document's weight is the mean ratio over its features (mean, not
    * sum, so length doesn't masquerade as domain fit). Docs with < 2
    * tokens have no features and drop out (no weight row).
    *
    * Scale shape — the paper's fit-then-score split, two corpus passes,
    * both narrow scans: (1) histogram pass: explode → map-side-combined
    * count into ≤ `buckets` keys (the shuffle carries buckets×partitions
    * rows, not corpus rows); (2) scoring pass: explode → broadcast-join
    * the ≤ `buckets`-row ratio dim → re-agg on doc_id (uniform key).
    * Nothing corpus-sized ever broadcasts; the target sample is a dim by
    * contract (it is a curated reference set, thousands of docs). */
  def dsirBigramBuckets(text: Column, buckets: Int): Column = {
    val t = tokens(text)
    zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => pmod(xxhash64(concat(a, lit(" "), b)), lit(buckets.toLong)))
  }

  /** (bucket, lr) importance-ratio dim: lr = log((tc+1)/(T+B)) −
    * log((rc+1)/(R+B)). Buckets absent from both histograms carry no row —
    * no corpus feature can probe them (rc ≥ 1 for every probed bucket). */
  def dsirLogRatios(docs: DataFrame, target: DataFrame,
      buckets: Int): DataFrame = {
    def hist(df: DataFrame) = df
      .select(explode(dsirBigramBuckets(col("text"), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val r = hist(docs).withColumnRenamed("n", "rc")
    val t = hist(target).withColumnRenamed("n", "tc")
    val joined = r.join(t, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    val totals = joined.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("rt"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("tc") + 1).cast("double") / (col("tt") + buckets)) -
          log((col("rc") + 1).cast("double") / (col("rt") + buckets)))
          .as("lr"))
  }

  /** Per-doc importance weight (see [[dsirLogRatios]]). */
  def dsirWeights(docs: DataFrame, target: DataFrame,
      buckets: Int): DataFrame = {
    val lr = dsirLogRatios(docs, target, buckets)
    docs.select(col("doc_id"),
        explode(dsirBigramBuckets(col("text"), buckets)).as("bucket"))
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(avg(col("lr")).as("weight"))
  }

  /** Planted-recall gate (the d07 pattern for an op whose float weights
    * aren't oracle-restatable): 20 planted docs written in a synthetic
    * vocabulary no corpus doc shares ARE the target domain; with the
    * target sample stacked 500× (tc=500 per planted bucket) their
    * per-feature ratio clears any corpus feature's by ~log(1000/rc) —
    * only a >1000-occurrence corpus bigram hashing into a planted bucket
    * could close the margin, and the 64 Ki bucket space keeps the planted
    * buckets clear (verified on both test SFs; deterministic thereafter —
    * xxhash64 is seedless and the corpus fixed). The top-20 selection
    * must be exactly the planted set. */
  def t18DsirGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val phrase = (0 until 10).map(i => s"zqdsir$i").mkString(" ")
    val planted = s.range(20).select(
      (col("id") + lit(1000000000L)).as("doc_id"), lit(phrase).as("text"))
    val target = s.range(500).select(lit(phrase).as("text"))
    val corpus = docs.unionByName(planted)
    val top = dsirWeights(corpus, target, 1 << 16)
      .orderBy(col("weight").desc, col("doc_id").asc)
      .limit(20)
    top.agg(
      count(lit(1)).as("n_top"),
      sum((col("doc_id") >= 1000000000L).cast("long")).as("n_planted_top"))
      .select(col("n_top"), col("n_planted_top"),
        (col("n_top") === 20 && col("n_planted_top") === 20)
          .as("recall_ok"))
  }

  val t18Sql: String =
    """SELECT CAST(20 AS BIGINT) AS n_top,
      |  CAST(20 AS BIGINT) AS n_planted_top,
      |  true AS recall_ok""".stripMargin

  // ---------------------------------------------------------------- t19
  /** Duplicated-span detection — the span-level complement to the
    * doc-level dedup family (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", public arXiv: exact substring
    * duplication is what doc-level near-dup misses — boilerplate,
    * licenses, templated headers repeated across otherwise-distinct
    * docs). Every `SpanW`-token rolling window is hashed (low 60 bits of
    * md5 over the space-joined window — the oracle-restatable id); a
    * window whose hash occurs more than once CORPUS-WIDE is a duplicated
    * span. Emits per doc its window count and duplicated-window count —
    * the per-doc duplication profile a span-scrubbing pass consumes.
    *
    * Scale shape: window generation is a narrow per-row transform (no
    * explode until the hash is a 8-byte long); the global occurrence
    * count shuffles uniform 60-bit keys with map-side combine; the
    * re-join back to windows is on the same uniform key and the per-doc
    * re-agg on dense doc_id. Nothing corpus-sized broadcasts; rolling
    * hashes would drop the md5 cost at 100 TB but change no shape (the
    * hash fn is a pluggable expression, the restatable md5 keeps the
    * driver oracle exact). */
  private val SpanW = 20

  def t19DupSpans(s: SparkSession, d: String): DataFrame = {
    // tokens are STAGED to an attribute before the window transform:
    // a lambda capturing the tokenize EXPRESSION re-tokenizes the doc
    // once per window after CollapseProject inlining (the t20 lesson —
    // O(n_tok²) splits per doc; measured 3× the whole query). The
    // checkpoint barrier makes `toks` a plain column read.
    val tokDf = Dedup.truncateLineage(Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))) // r16 fanOut: tokenize pass
    val t = col("toks")
    // guard: sequence(1, n) with n < 1 DESCENDS in Spark ([1, 0]) — a
    // short doc must yield zero windows, not two bogus ones
    val idxs = when(size(t) >= SpanW, sequence(lit(1), size(t) - (SpanW - 1)))
      .otherwise(array().cast("array<int>"))
    val winHashes = transform(idxs,
      i => conv(substring(md5(array_join(slice(t, i, lit(SpanW)), " ")),
        1, 15), 16, 10).cast("long"))
    // staged once (t14's lesson): the occurrence count AND the join probe
    // both read this frame — without the checkpoint Catalyst re-derives
    // the window pass per branch (no CSE across branches), doubling the
    // dominant cost; the staged frame is 16 bytes/window
    val wins = Dedup.truncateLineage(
      tokDf.select(col("doc_id"), explode(winHashes).as("h")))
    val dupCounts = wins.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2)
    wins.join(dupCounts, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("n_occ").isNotNull.cast("long")).as("n_dup_windows"))
      .orderBy("doc_id")
  }

  val t19Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |w AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5(array_to_string(
      |      toks[CAST(i AS INT):CAST(i + 19 AS INT)], ' ')), 1, 15))
      |      AS BIGINT) AS h
      |  FROM t, unnest(range(1, greatest(len(toks) - 19, 0) + 1)) AS u(i)),
      |occ AS (SELECT h, COUNT(*) AS n_occ FROM w GROUP BY h)
      |SELECT w.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_windows,
      |  CAST(SUM(CASE WHEN occ.n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_windows
      |FROM w JOIN occ USING (h)
      |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin

  // ---------------------------------------------------------------- t20
  /** Duplicated-span SCRUBBING — the removal pass consuming t19's signal
    * (Lee et al. 2022, arXiv 2107.06499: ExactSubstr dedup strips the
    * duplicated substring itself and keeps the rest of the doc — doc-level
    * keep/drop either loses the unique remainder or keeps the
    * boilerplate). Every `SpanW`-token rolling window is hashed exactly as
    * t19; a token is scrubbed when ANY corpus-wide duplicated window
    * covers its position (a window starting at w covers [w, w+SpanW-1]).
    * Emits per doc the token count, kept-token count, and the md5 of the
    * space-joined kept tokens — order-SENSITIVE, so a scrub that dropped
    * the wrong token or reordered survivors flips the hash.
    *
    * Ten planted docs (unique 2-token prefixes + a shared 25-token
    * phrase) make the contract non-vacuous at any sf: the phrase's six
    * shared windows cover all 25 suffix positions, so each planted doc's
    * kept text is provably its unique prefix alone, while natural
    * exact-dup docs scrub to the empty string (md5('') on both engines).
    *
    * Scale shape: window hashing is the same staged narrow pass as t19
    * (16 bytes/window leaves the scan, staged once across the count and
    * probe branches); the occurrence count and dup-start probe shuffle
    * uniform 60-bit keys with map-side combine; dup starts collapse to a
    * per-doc sorted int array (bounded by doc length) joined back on
    * dense doc_id; the coverage test is a LINEAR per-row merge — the
    * sorted starts partition the doc into per-gap segments (`min(SpanW,
    * gap)` covered, remainder kept) and the survivors are emitted
    * DIRECTLY as `slice`s of the token array (prefix before the first
    * start ++ one tail slice per gap, `zip_with`/`flatten`): O(n_tok +
    * n_dup_starts) per row with no per-token work at all, replacing the
    * O(n_tok · n_dup_starts) exists-scan (kept as
    * [[spanScrubQuadratic]], the spec's equality oracle) — no exchange
    * changes. */
  /** Core scrub over any (doc_id, text) frame — see [[t20SpanScrub]] for
    * the gated corpus entry point and the scale contract. */
  def spanScrub(docs: DataFrame): DataFrame =
    spanScrubImpl(docs, linear = true)

  /** The O(n_tok · n_dup_starts) exists-scan coverage form the linear
    * merge replaced — kept ONLY as the spec's equality oracle (same
    * exchanges, different per-row kernel). */
  private[graft] def spanScrubQuadratic(docs: DataFrame): DataFrame =
    spanScrubImpl(docs, linear = false)

  private def spanScrubImpl(docs: DataFrame, linear: Boolean): DataFrame = {
    // checkpoint barrier: `toks` must be an ATTRIBUTE before the window
    // lambda below — a captured tokenize EXPRESSION re-splits the doc
    // once per window after CollapseProject inlining (the same trap as
    // the boolean-coverage probe documented at `kept`); the barrier also
    // keeps the final join branch from re-deriving the tokenize pass
    val docsF = Dedup.truncateLineage(
      docs.select(col("doc_id"), tokens(col("text")).as("toks")))
    val n = size(col("toks"))
    val starts0 = when(n >= SpanW, sequence(lit(1), n - (SpanW - 1)))
      .otherwise(array().cast("array<int>"))
    val winHashes = transform(starts0,
      i => conv(substring(md5(array_join(slice(col("toks"), i, lit(SpanW)),
        " ")), 1, 15), 16, 10).cast("long"))
    val wins = Dedup.truncateLineage(docsF
      .select(col("doc_id"), posexplode(winHashes).as(Seq("p0", "h"))))
    val dups = wins.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2)
    val dupStarts = wins.join(dups, Seq("h"))
      .select(col("doc_id"), (col("p0") + 1).cast("int").as("w"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("w"))).as("starts"))
    val kept =
      if (!linear)
        filter(col("toks"), (tok, i0) =>
          !exists(col("starts"),
            st => st <= i0 + 1 && i0 + 1 <= st + lit(SpanW - 1)))
      else {
        // linear merge of the sorted starts, emitting the SURVIVORS
        // directly as slices: each start's gap to the NEXT start (last
        // gap runs to n+1) is covered for min(SpanW, gap) positions and
        // uncovered for the remainder, so the kept text is the prefix
        // before the first start ++ one per-gap tail slice — total work
        // O(n_tok + n_dup_starts) per row with NO per-token probe. (A
        // first cut materialized a boolean coverage array and probed it
        // per token with element_at; HOF lambdas are interpreted and
        // CollapseProject inlines single-use aliases into the lambda
        // body, so the "O(1) probe" re-built the array per token —
        // quadratic again, and 4× slower than the exists-scan at sf0.1.
        // Slices keep every intermediate an attribute or a per-gap
        // scalar, which nothing can re-expand.)
        val nexts = concat(
          slice(col("starts"), lit(2),
            greatest(size(col("starts")) - 1, lit(0))),
          when(size(col("starts")) > 0, array(n + 1))
            .otherwise(array().cast("array<int>")))
        // try_element_at: ANSI-safe null (not error) on the empty array
        concat(
          slice(col("toks"), lit(1),
            (coalesce(try_element_at(col("starts"), lit(1)), n + 1) - 1)
              .cast("int")),
          flatten(zip_with(col("starts"), nexts, (st, nx) =>
            slice(col("toks"), st + least(nx - st, lit(SpanW)),
              greatest(nx - st - SpanW, lit(0)).cast("int")))))
      }
    docsF.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("kept", kept)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
        size(col("kept")).cast("long").as("n_kept"),
        md5(array_join(col("kept"), " ")).as("scrub_md5"))
      .orderBy("doc_id")
  }

  def t20SpanScrub(s: SparkSession, d: String): DataFrame = {
    val phrase = (0 until 25).map(i => s"zqscrub$i").mkString(" ")
    val planted = s.range(10).select(
      (col("id") + lit(2000000000L)).as("doc_id"),
      concat_ws(" ", concat(lit("pfx"), col("id").cast("string")),
        concat(lit("uniq"), col("id").cast("string")), lit(phrase))
        .as("text"))
    spanScrub(Tables.fanOut(Tables.documents(s, d), col("doc_id")) // r16 fan-out; r17 PK key
      .select(col("doc_id"), col("text"))
      .unionByName(planted))
  }

  val t20Sql: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT CAST(2000000000 + i AS BIGINT) AS doc_id,
      |    'pfx' || i || ' uniq' || i || ' ' ||
      |    array_to_string(list_transform(range(0, 25),
      |      j -> 'zqscrub' || j), ' ') AS text
      |  FROM range(10) r(i)),
      |t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM base),
      |w AS (
      |  SELECT doc_id, CAST(i AS INT) AS st,
      |    CAST(concat('0x', substr(md5(array_to_string(
      |      toks[CAST(i AS INT):CAST(i + 19 AS INT)], ' ')), 1, 15))
      |      AS BIGINT) AS h
      |  FROM t, unnest(range(1, greatest(len(toks) - 19, 0) + 1)) AS u(i)),
      |occ AS (SELECT h FROM w GROUP BY h HAVING COUNT(*) >= 2),
      |cov AS (SELECT DISTINCT doc_id, st FROM w JOIN occ USING (h)),
      |pos AS (
      |  SELECT doc_id, CAST(p AS INT) AS p, toks[CAST(p AS INT)] AS tok
      |  FROM t, unnest(range(1, len(toks) + 1)) AS v(p)),
      |kept AS (
      |  SELECT pos.doc_id, pos.p, pos.tok FROM pos
      |  WHERE NOT EXISTS (SELECT 1 FROM cov
      |    WHERE cov.doc_id = pos.doc_id
      |      AND cov.st BETWEEN pos.p - 19 AND pos.p)),
      |ka AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |    md5(string_agg(tok, ' ' ORDER BY p)) AS m
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
      |  CAST(COALESCE(ka.n_kept, 0) AS BIGINT) AS n_kept,
      |  COALESCE(ka.m, md5('')) AS scrub_md5
      |FROM t LEFT JOIN ka USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t21
  /** Temperature-weighted domain mixture — the allocation knob every
    * multi-source pre-training run turns (DoReMi / "sampling with
    * temperature" in the Pile/ROOTS recipes, public papers): a domain's
    * share of the token budget is proportional to its size RAISED TO a
    * temperature α < 1, flattening the natural distribution so small
    * high-quality sources aren't drowned by bulk crawl. α = 0.5 here,
    * computed INTEGER-EXACTLY: weight w_s = ⌊√n_tok_s⌋ (floor(sqrt) is
    * bit-identical across engines — sqrt is IEEE-exact-rounded, unlike
    * ln/pow), allocation = budget·w_s div Σw — so the row hash-matches
    * the oracle with no float-tolerance games. A different α slots in as
    * any integer-exact weight (⌊n^α·2^k⌋ via integer ops).
    *
    * Scale: one narrow scan + one agg keyed by source (domains are
    * dozens); the weight normalization is a broadcast 1-row total. The
    * downstream per-domain greedy FILL to these allocations is t09's
    * two-level histogram cutoff, unchanged. */
  private val MixBudget = 100000L

  def t21DomainMix(s: SparkSession, d: String): DataFrame = {
    val bySource = Tables.documents(s, d)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
      .withColumn("w", floor(sqrt(col("sum_tok").cast("double"))).cast("long"))
    val totalW = bySource.agg(sum(col("w")).as("tw"))
    bySource.crossJoin(broadcast(totalW))
      .select(col("source"), col("n_docs"), col("sum_tok"), col("w"),
        expr(s"($MixBudget * w) div tw").as("alloc_tok"))
      .orderBy("source")
  }

  val t21Sql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
      |      AS n_tok
      |  FROM documents),
      |g AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
      |    CAST(floor(sqrt(CAST(SUM(n_tok) AS DOUBLE))) AS BIGINT) AS w
      |  FROM t GROUP BY source)
      |SELECT source, n_docs, sum_tok, w,
      |  CAST((100000 * w) // (SELECT SUM(w) FROM g) AS BIGINT) AS alloc_tok
      |FROM g ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t15
  /** Curation pipeline V2 — t07's end-to-end composition extended with
    * the newer signals, still ONE declarative plan: language-ID →
    * quality gate (t07's floors) → repetition gate (the native
    * [[graft.functions.TopBigramExpr]] kernel, cap 0.1 — filters the
    * boilerplate/loop tail) → exact dedup among survivors (lowest-id
    * survivor per content hash) → per-language funnel report, with the
    * kept set's PII exposure (t10's regexes) as the final audit column.
    *
    * Scale shape, same as t07: every per-doc signal — including the
    * one-pass bigram kernel — is narrow (single corpus scan, no
    * corpus-sized bigram explode; the oracle restates that explode, the
    * engine never runs it); the ONLY data-sized exchange is the dedup
    * window on the uniform (md5, survivor) key; the rollup is
    * per-language. */
  def t15CurationV2(s: SparkSession, d: String): DataFrame = {
    val txt = col("text")
    val nTok = size(tokens(txt))
    val quality = length(txt) >= 100 && nTok >= 20 &&
      regexCount(txt, "[0-9]") * 5 <= length(txt) // digit ratio < 20%
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val lowRep = when(nTok >= 2,
      graft.functions.TopBigramExpr.topBigramFraction(tokens(txt)) <= 0.1)
      .otherwise(lit(false))
    val flagged = Tables.documents(s, d).select(
      col("doc_id"), col("lang"), quality.as("q"), nTok.as("n_tok"),
      lowRep.as("low_rep"),
      (regexCount(txt, email) + regexCount(txt, phone) > 0).as("pii"),
      md5(encode(txt, "UTF-8")).as("h"))
      .withColumn("surv", col("q") && col("low_rep"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h"), col("surv")).orderBy(col("doc_id").asc)
    flagged
      .withColumn("uniq", col("surv") && row_number().over(w) === 1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("q").cast("long")).as("n_quality"),
        sum(col("surv").cast("long")).as("n_low_rep"),
        sum(col("uniq").cast("long")).as("n_unique"),
        sum(when(col("uniq"), col("n_tok")).otherwise(0)).cast("long")
          .as("kept_tokens"),
        sum((col("uniq") && col("pii")).cast("long")).as("n_pii_docs"))
      .orderBy("lang")
  }

  val t15Sql: String =
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    (LENGTH(text) >= 100
      |      AND len(string_split_regex(lower(trim(text)), '\s+')) >= 20
      |      AND len(regexp_extract_all(text, '[0-9]')) * 5 <= LENGTH(text)) AS q,
      |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok,
      |    (len(regexp_extract_all(text,
      |       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
      |     len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) > 0) AS pii,
      |    md5(text) AS h
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / n_bigrams AS frac FROM (
      |    SELECT doc_id, n_bigrams, bg, COUNT(*) AS c FROM (
      |      SELECT doc_id, len(toks) - 1 AS n_bigrams,
      |        unnest(list_transform(range(1, len(toks)),
      |          i -> toks[i] || chr(31) || toks[i + 1])) AS bg
      |      FROM (SELECT doc_id,
      |              string_split_regex(lower(trim(text)), '\s+') AS toks
      |            FROM documents)
      |      WHERE len(toks) >= 2) z GROUP BY doc_id, n_bigrams, bg) y
      |  GROUP BY doc_id, n_bigrams),
      |u AS (
      |  SELECT f.lang, f.q, f.n_tok, f.pii,
      |    (f.q AND COALESCE(b.frac <= 0.1, false)) AS surv,
      |    COALESCE(b.frac <= 0.1, false) AS low_rep,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY f.h, (f.q AND COALESCE(b.frac <= 0.1, false))
      |      ORDER BY f.doc_id ASC) AS rn
      |  FROM f LEFT JOIN b USING (doc_id))
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      |  CAST(SUM(CASE WHEN surv THEN 1 ELSE 0 END) AS BIGINT) AS n_low_rep,
      |  CAST(SUM(CASE WHEN surv AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |  CAST(SUM(CASE WHEN surv AND rn = 1 THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
      |  CAST(SUM(CASE WHEN surv AND rn = 1 AND pii THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs
      |FROM u GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t22
  /** Vocabulary statistics per language — the data-card slice t13 doesn't
    * cover (Dodge et al. 2021's C4 documentation, public arXiv: corpus
    * cards report vocabulary size, hapax mass, and head-token
    * concentration per language, the signals that expose boilerplate
    * floods and tokenizer mismatch before training). Per language: doc
    * and token totals, distinct-token count (types), hapax count (types
    * occurring exactly once — Zipf's tail mass), the top token's
    * occurrence count (head concentration), and type-token ratio as the
    * one IEEE division both engines perform identically on exact integer
    * aggregates.
    *
    * Scale shape: token explode is narrow; the (lang, term) count
    * shuffles uniform string keys with map-side combine (vocabulary-sized
    * output, not corpus-sized); the per-language rollup aggregates a
    * vocabulary-sized frame into a handful of rows. Nothing collects,
    * nothing broadcasts. */
  def t22VocabStats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), tokens(col("text")).as("toks"))
    val perDoc = docs.select(col("lang"), col("doc_id"), size(col("toks")).as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).cast("long").as("n_tokens"))
    val terms = docs.select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val vocab = terms.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum((col("cnt") === 1).cast("long")).as("n_hapax"),
        max(col("cnt")).as("top_tok_count"))
    perDoc.join(vocab, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("top_tok_count"),
        (col("n_types").cast("double") / col("n_tokens")).as("type_token_ratio"))
      .orderBy("lang")
  }

  val t22Sql: String =
    """WITH t AS (
      |  SELECT lang, doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |pd AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
      |  FROM t GROUP BY lang),
      |tc AS (
      |  SELECT lang, tok, COUNT(*) AS cnt
      |  FROM (SELECT lang, unnest(toks) AS tok FROM t)
      |  GROUP BY lang, tok),
      |v AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |    CAST(MAX(cnt) AS BIGINT) AS top_tok_count
      |  FROM tc GROUP BY lang)
      |SELECT pd.lang, n_docs, n_tokens, n_types, n_hapax, top_tok_count,
      |  CAST(n_types AS DOUBLE) / n_tokens AS type_token_ratio
      |FROM pd JOIN v USING (lang)
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t23
  /** Model-based quality filtering — the classifier gate real curation
    * recipes run after the rule-based floors (GPT-3/LLaMA-family
    * pipelines train a linear model on quality exemplars and keep
    * high-scoring docs; public papers): a LogisticRegression over
    * per-doc quality signals scores the corpus and the keep decision is
    * the model's prediction. Adds the LR surface to the engine's ML
    * coverage (RF and GBT live in the mito family).
    *
    * Determinism argument (x04's engineered-margin technique, LR form):
    * the decisive feature is 0 or 10 by construction (a rule on
    * n_chars), the training fixture generates the SAME support with
    * labels equal to the rule and noise dims drawn from j = id/2 (one
    * row per label per j — zero label↔noise correlation), and L2
    * regularization keeps the optimum finite and stable: the separating
    * weight saturates the sigmoid at both supports while the noise
    * weights stay at ~0, so predictions provably equal the generating
    * rule and the DuckDB oracle restates the confusion counts as plain
    * arithmetic on n_chars. LBFGS on fixed data is bit-deterministic —
    * no seed enters. */
  def t23QualityClassifierGate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val j = (col("id") / 2).cast("long")
    val train = s.range(2048).toDF().select(
      (col("id") % 2).cast("double").as("label"),
      ((col("id") % 2) * 10).cast("double").as("sep"),
      (j % 7).cast("double").as("noise1"),
      ((j * 3) % 5).cast("double").as("noise2"))
    val asm = new VectorAssembler()
      .setInputCols(Array("sep", "noise1", "noise2"))
      .setOutputCol("features")
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01)
      .fit(asm.transform(train))
    val docFeats = Tables.documents(s, d).select(
      col("doc_id"),
      (col("n_chars") >= 200).as("rule"),
      when(col("n_chars") >= 200, 10.0).otherwise(0.0).as("sep"),
      (col("n_chars") % 7).cast("double").as("noise1"),
      (col("doc_id") % 5).cast("double").as("noise2"))
    lr.transform(asm.transform(docFeats))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("prediction") === 1.0).cast("long")).as("n_kept"),
        sum(col("rule").cast("long")).as("n_rule"),
        sum(when((col("prediction") === 1.0) === col("rule"), 1L)
          .otherwise(0L)).as("n_agree"))
      .select(col("n_docs"), col("n_kept"), col("n_rule"),
        (col("n_agree") === col("n_docs")).as("all_match"))
  }

  val t23Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_rule,
      |  true AS all_match
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- t24
  /** Character-trigram LM scoring — the CCNet-family "perplexity filter"
    * shape (Wenzek et al. 2020, public arXiv: score every doc under a LM
    * trained on a trusted slice; low-likelihood docs are the quality
    * cut): the model here is the corpus' own `en` slice's trigram
    * counts, and each doc accrues the BIT-DEPTH of its trigrams'
    * training counts — floor(log2(1+cnt)), computed as
    * length(bin(1+cnt))-1 so it is INTEGER-exact in both engines (IEEE
    * `log` is not guaranteed bit-identical across JVM and DuckDB; bit
    * length is arithmetic). Out-of-vocabulary trigrams are counted
    * apart — the OOV rate is the second CCNet signal.
    *
    * Scale shape: the model table is bounded by charset³ (a dim by
    * contract → broadcast; no data-sized shuffle for the probe). The
    * trigram fan-out is the one heavy stage; it feeds a per-lang
    * aggregate whose distinct-doc count partial-aggregates map-side on
    * dense doc_id. At 100 TB the trigrams would be hashed to ints
    * before the explode (pluggable, as in t19) — same shape, smaller
    * rows; the restatable substring keeps the driver oracle exact. */
  def t24LmScore(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), lower(col("text")).as("text"))
    // t19 guard: sequence(1, n) DESCENDS for n < 1 — short docs must
    // yield zero trigrams, not bogus ones
    val tris = graft.functions.CharNgramsExpr.charNgrams(col("text"), 3)
    val train = docs.where(col("lang") === "en")
      .select(explode(tris).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("cnt"))
    docs.select(col("doc_id"), col("lang"), explode(tris).as("tri"))
      .join(broadcast(train), Seq("tri"), "left")
      .groupBy(col("lang"))
      .agg(
        count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_grams"),
        sum(when(col("cnt").isNull, 0L)
          .otherwise((length(bin(col("cnt") + 1)) - 1).cast("long")))
          .as("sum_bits"),
        sum(col("cnt").isNull.cast("long")).as("n_oov"))
      .orderBy("lang")
  }

  val t24Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, lower(text) AS text FROM documents),
      |grams AS (
      |  SELECT doc_id, lang, substr(text, CAST(i AS INTEGER), 3) AS tri
      |  FROM docs, UNNEST(range(1, len(text) - 1)) AS u(i)),
      |train AS (
      |  SELECT tri, COUNT(*) AS cnt FROM grams WHERE lang = 'en'
      |  GROUP BY tri)
      |SELECT g.lang,
      |  CAST(COUNT(DISTINCT g.doc_id) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN t.cnt IS NULL THEN 0
      |    ELSE length(bin(1 + t.cnt)) - 1 END) AS BIGINT) AS sum_bits,
      |  CAST(SUM(CASE WHEN t.cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov
      |FROM grams g LEFT JOIN train t USING (tri)
      |GROUP BY g.lang ORDER BY g.lang""".stripMargin

  // ---------------------------------------------------------------- t25
  /** BPE merge training — the tokenizer-training kernel (Sennrich et al.
    * 2016, public arXiv): greedy highest-frequency adjacent-pair merges
    * over the corpus WORD-FREQUENCY table. The distributed contract is
    * the classical one: the corpus is touched ONCE (tokenize → word
    * counts, a vocab-bounded aggregate); every merge round then runs on
    * the vocab table only — pair counting is an explode + hash agg over
    * ≤ vocab × max-word-len rows, and the argmax is a 1-row driver
    * collect (the merge RULE is the model, like an ML fit). Merge
    * application is a codegen'd left-to-right `aggregate` fold (the
    * standard greedy BPE application order), no UDF.
    *
    * Ties break (freq DESC, pair lexicographic ASC) so training is
    * bit-deterministic. */
  def bpeMerges(wordCounts: DataFrame, rounds: Int): Seq[(String, String)] = {
    var vocab = wordCounts.select(
      transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))).as("syms"),
      col("freq"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 0 until rounds) {
      // t19 guard: sequence(1, n) DESCENDS for n < 1 — a single-symbol
      // word has no pairs, not an out-of-bounds element_at
      val pairs = when(size(col("syms")) >= 2,
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val top = vocab
        .select(explode(pairs).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        // greedy left-to-right single-rule application: fold the symbol
        // array, replacing each (a, b) adjacency with the merged symbol;
        // a freshly merged symbol never re-merges within the same round
        vocab = vocab.select(
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x)))).as("syms"),
          col("freq"))
      }
    }
    merges.toSeq
  }

  /** t25 gate: train 3 merges on the corpus plus a planted word whose
    * frequency exceeds the whole corpus' character count, so every
    * corpus pair is provably outweighed and the learned merges are
    * rule-derivable: "zqwx" at freq > Σ n_chars forces (q,w) (the
    * lexicographically-least of the three tied planted pairs), then
    * (qw,x) ("qw" < "z"), then (z,qwx) — the oracle restates them as
    * constants. */
  def t25BpeGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // one driver scalar (dim-by-contract, like the LD map): an upper
    // bound on any corpus pair count
    val totalChars = docs.agg(sum(col("n_chars"))).first().getLong(0)
    val words = docs
      .select(explode(tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val planted = s.range(1).select(
      lit("zqwx").as("word"), lit(totalChars + 1).as("freq"))
    val merges = bpeMerges(words.unionByName(planted), 3)
    val got = merges.map { case (a, b) => s"$a|$b" }
    val expected = Seq("q|w", "qw|x", "z|qwx")
    s.range(1).select(
      lit(got.length).cast("long").as("n_merges"),
      lit(got.lift(0).getOrElse("")).as("merge1"),
      lit(got.lift(1).getOrElse("")).as("merge2"),
      lit(got.lift(2).getOrElse("")).as("merge3"),
      lit(got == expected).as("merges_match"))
  }

  val t25Sql: String =
    """SELECT CAST(3 AS BIGINT) AS n_merges,
      |  'q|w' AS merge1, 'qw|x' AS merge2, 'z|qwx' AS merge3,
      |  true AS merges_match""".stripMargin

  // ---------------------------------------------------------------- t26
  /** Deterministic hash split — train/val/test assignment every training
    * pipeline needs reproducible across engines and reruns: bucket =
    * md5(doc_id ‖ salt) mod 100 (98/1/1), no randomness, no state. A
    * narrow per-row expression with a 3-group rollup — zero data-sized
    * shuffle at any scale, and adding data never reassigns existing
    * docs (the property a random split lacks). */
  private def splitBucket(id: Column): Column =
    conv(substring(md5(encode(concat(id.cast("string"), lit(":split")),
      "UTF-8")), 1, 15), 16, 10).cast("long") % 100

  private def splitName(bucket: Column): Column =
    when(bucket < 98, "train").when(bucket === 98, "val").otherwise("test")

  def t26HashSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        splitName(splitBucket(col("doc_id"))).as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_checksum"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("split")

  private val splitBucketSql =
    "CAST(concat('0x', substr(md5(CAST(%s AS VARCHAR) || ':split'), 1, 15)) AS BIGINT) %% 100"

  val t26Sql: String =
    s"""WITH b AS (
       |  SELECT doc_id, n_chars,
       |    ${splitBucketSql.format("doc_id")} AS bucket
       |  FROM documents)
       |SELECT CASE WHEN bucket < 98 THEN 'train'
       |  WHEN bucket = 98 THEN 'val' ELSE 'test' END AS split,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- t27
  /** Contamination-safe split — t26's hash split keyed by the DUP-GROUP
    * representative instead of the doc: duplicates of one document must
    * never straddle train and eval (the leakage mode doc-level splits
    * invite — a val doc whose twin sits in train is measured
    * memorization, not generalization). Group = exact-content hash
    * (md5), rep = min doc_id; every member inherits the rep's bucket.
    * The gate plants 20 exact copies and emits both straddle counts:
    * by construction the CLUSTER split never straddles a group
    * (recomputed from data, not assumed), while the doc-id split's
    * straddle count is the measured leakage the operator prevents.
    *
    * Scale shape: one uniform md5 shuffle for the group table, one
    * same-key join back — the d01 profile; the near-dup upgrade swaps
    * md5 groups for d12's cluster ids, same wiring. */
  def t27ClusterSafeSplit(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val planted = docs.orderBy(col("doc_id").asc).limit(20)
      .select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("text"))
    val g = docs.unionByName(planted)
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("h"))
    val reps = g.groupBy(col("h"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("grp_n"))
    g.join(reps, Seq("h"))
      .select(col("h"), col("grp_n"),
        splitName(splitBucket(col("rep_id"))).as("cluster_split"),
        splitName(splitBucket(col("doc_id"))).as("docid_split"))
      .groupBy(col("h"), col("grp_n"))
      .agg(count_distinct(col("cluster_split")).as("n_cs"),
        count_distinct(col("docid_split")).as("n_ds"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("grp_n")).as("n_docs"),
        sum((col("grp_n") > 1).cast("long")).as("n_multi_groups"),
        sum((col("n_cs") > 1).cast("long")).as("straddle_cluster"),
        sum((col("n_ds") > 1).cast("long")).as("straddle_docid"))
  }

  val t27Sql: String =
    s"""WITH pl AS (
       |  SELECT doc_id + 1000000000 AS doc_id, text
       |  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20)),
       |a AS (SELECT doc_id, text FROM documents UNION ALL SELECT * FROM pl),
       |g AS (SELECT md5(text) AS h, doc_id FROM a),
       |reps AS (
       |  SELECT h, MIN(doc_id) AS rep_id, COUNT(*) AS grp_n
       |  FROM g GROUP BY h),
       |k AS (
       |  SELECT g.h, reps.grp_n,
       |    CASE WHEN ${splitBucketSql.format("reps.rep_id")} < 98 THEN 'train'
       |      WHEN ${splitBucketSql.format("reps.rep_id")} = 98 THEN 'val'
       |      ELSE 'test' END AS cluster_split,
       |    CASE WHEN ${splitBucketSql.format("g.doc_id")} < 98 THEN 'train'
       |      WHEN ${splitBucketSql.format("g.doc_id")} = 98 THEN 'val'
       |      ELSE 'test' END AS docid_split
       |  FROM g JOIN reps USING (h)),
       |per_g AS (
       |  SELECT h, grp_n, COUNT(DISTINCT cluster_split) AS n_cs,
       |    COUNT(DISTINCT docid_split) AS n_ds
       |  FROM k GROUP BY h, grp_n)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(SUM(grp_n) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN grp_n > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_multi_groups,
       |  CAST(SUM(CASE WHEN n_cs > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS straddle_cluster,
       |  CAST(SUM(CASE WHEN n_ds > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS straddle_docid
       |FROM per_g""".stripMargin

  // ---------------------------------------------------------------- t28
  /** Categorical feature encoding — StringIndexer + OneHotEncoder, the
    * MLlib preprocessing pair every tabular feature pipeline starts
    * with. Determinism pinned: `frequencyDesc` ordering ties broken
    * alphabetically (Spark's documented contract), which the oracle
    * restates as a (count DESC, value ASC) rank; the one-hot position
    * equals the index (dropLast=false), asserted in-row so an encoder
    * regression flips the driver row. Indexer fit = one tiny
    * value-count aggregate; the transform is a broadcast-map lookup —
    * no data-sized shuffle at any scale. */
  def t28CategoricalEncode(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer}
    import org.apache.spark.ml.functions.vector_to_array
    val docs = Tables.documents(s, d)
    val idx = new StringIndexer().setInputCol("lang").setOutputCol("li")
      .setStringOrderType("frequencyDesc").fit(docs)
    val enc = new OneHotEncoder().setInputCol("li").setOutputCol("vec")
      .setDropLast(false).fit(idx.transform(docs))
    enc.transform(idx.transform(docs))
      .select(col("lang"), col("li").cast("long").as("lang_idx"),
        vector_to_array(col("vec")).as("oh"))
      .groupBy(col("lang"), col("lang_idx"))
      .agg(count(lit(1)).as("n_docs"),
        // one-hot sanity folded into the row: position == index, size ==
        // cardinality, exactly one hot bit — any violation skews the sums
        sum(element_at(col("oh"), (col("lang_idx") + 1).cast("int"))
          .cast("long")).as("hot_at_idx"),
        max(size(col("oh"))).as("onehot_dim"))
      .select(col("lang"), col("lang_idx"), col("n_docs"),
        (col("hot_at_idx") === col("n_docs")).as("onehot_ok"),
        col("onehot_dim"))
      .orderBy("lang_idx")
  }

  val t28Sql: String =
    """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents
      |  GROUP BY lang)
      |SELECT lang,
      |  CAST(ROW_NUMBER() OVER (ORDER BY n_docs DESC, lang ASC) - 1
      |    AS BIGINT) AS lang_idx,
      |  n_docs, true AS onehot_ok,
      |  CAST((SELECT COUNT(*) FROM c) AS INT) AS onehot_dim
      |FROM c ORDER BY lang_idx""".stripMargin

  // ---------------------------------------------------------------- t29
  /** Snapshot DIFF — the dataset-versioning op a recurring crawl needs:
    * given two corpus snapshots, classify content as unchanged / added /
    * removed by content hash (id-independent: a re-crawled doc with a
    * new id but identical text is UNCHANGED — the property an id join
    * gets wrong). Snapshots here are the even/odd doc_id halves plus 20
    * docs planted into BOTH (the non-vacuous unchanged set). One
    * uniform md5 full-outer join; at 100 TB both sides bucket by the
    * hash and the join is co-located (q44's lever). */
  def t29SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val shared = docs.orderBy(col("doc_id").asc).limit(20)
      .select(md5(encode(col("text"), "UTF-8")).as("h"))
    def snap(pred: org.apache.spark.sql.Column): DataFrame = docs
      .where(pred)
      .select(md5(encode(col("text"), "UTF-8")).as("h"))
      .unionByName(shared).distinct()
    val a = snap(col("doc_id") % 2 === 0).withColumn("in_a", lit(1))
    val b = snap(col("doc_id") % 2 === 1).withColumn("in_b", lit(1))
    a.join(b, Seq("h"), "full_outer")
      .agg(
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("n_unchanged"),
        sum(when(col("in_a").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in_b").isNull, 1L).otherwise(0L)).as("n_removed"))
      .select(col("n_unchanged"), col("n_added"), col("n_removed"),
        (col("n_unchanged") >= 20).as("shared_found"))
  }

  val t29Sql: String =
    """WITH shared AS (
      |  SELECT md5(text) AS h
      |  FROM (SELECT text FROM documents ORDER BY doc_id LIMIT 20)),
      |a AS (
      |  SELECT DISTINCT h FROM (
      |    SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0
      |    UNION ALL SELECT h FROM shared)),
      |b AS (
      |  SELECT DISTINCT h FROM (
      |    SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 1
      |    UNION ALL SELECT h FROM shared))
      |SELECT
      |  CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
      |  CAST(SUM(CASE WHEN a.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(SUM(CASE WHEN b.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  true AS shared_found
      |FROM a FULL OUTER JOIN b ON a.h = b.h""".stripMargin

  // ---------------------------------------------------------------- t30
  /** Deterministic EPOCH SHUFFLE — reproducible per-epoch data ordering
    * (training-order reproducibility is a debugging requirement; a
    * `rand()` shuffle can't replay): epoch e's position of a doc is its
    * rank under md5(doc_id ‖ epoch) — a keyed permutation, different
    * every epoch, identical every rerun — computed WITHOUT a global
    * sort: the rank decomposes over HASH-RANGE BUCKETS (t14's two-level
    * prefix-sum technique). The bucket is the hash's top byte (256
    * buckets; md5 hex is fixed-width lowercase, so lexicographic order
    * of the full digest = (bucket, remainder) order), per-bucket counts
    * are a 256-row aggregate whose cumulative offsets are folded on the
    * DRIVER (dimension-sized by contract, like the NUMT table — no
    * single-partition WindowExec anywhere) and broadcast-joined back,
    * and the within-bucket rank is a PARTITIONED window. The md5 keys
    * are uniform, so the 256 bucket partitions are balanced at any
    * corpus size. The in-row plan assert pins the contract: no
    * unpartitioned logical Window survives optimization (the flat
    * `Window.orderBy` form lives only in the oracle SQL and the
    * bucketed==flat equality spec). */
  def t30EpochShuffle(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def h(epoch: Int): Column =
      md5(encode(concat(col("doc_id").cast("string"), lit(s":e$epoch")),
        "UTF-8"))
    def blk(c: Column): Column =
      conv(substring(c, 1, 2), 16, 10).cast("int")
    // staged once: both epochs' bucket counts AND both rank branches read
    // the hashed columns without re-deriving the corpus scan per branch
    val docs = Dedup.truncateLineage(
      Tables.documents(s, d)
        .select(col("doc_id"), h(1).as("h1"), h(2).as("h2"))
        .withColumn("blk1", blk(col("h1")))
        .withColumn("blk2", blk(col("h2"))))
    // BOTH epochs' bucket histograms in ONE action (≤512 rows: the
    // model-sized collect that replaces the global sorts)
    val counts = docs.select(explode(array(
        struct(lit(1).as("e"), col("blk1").as("b")),
        struct(lit(2).as("e"), col("blk2").as("b")))).as("x"))
      .groupBy(col("x.e").as("e"), col("x.b").as("b"))
      .agg(count(lit(1)).as("c")).orderBy("e", "b").collect()
    def offsDf(epoch: Int): DataFrame = {
      var acc = 0L
      val offs = counts.filter(_.getInt(0) == epoch).map { r =>
        val o = (r.getInt(1), acc); acc += r.getLong(2); o
      }.toSeq
      s.createDataFrame(offs).toDF("blk", "off")
    }
    def rank(hc: String, blkc: String, epoch: Int, out: String): DataFrame = {
      val bucketed = docs.select(col("doc_id"), col(hc).as("h"),
        col(blkc).as("blk"))
      val ww = Window.partitionBy(col("blk"))
        .orderBy(col("h").asc, col("doc_id").asc)
      bucketed.join(broadcast(offsDf(epoch)), Seq("blk"))
        .select(col("doc_id"),
          (col("off") + row_number().over(ww)).cast("int").as(out))
    }
    val r = rank("h1", "blk1", 1, "pos_e1")
      .join(rank("h2", "blk2", 2, "pos_e2"), Seq("doc_id"))
      .orderBy("doc_id")
    val flatWindows = r.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    require(flatWindows.isEmpty,
      "t30: unpartitioned window survived — the bucketed rank must not " +
        "move the corpus to one reducer")
    r
  }

  val t30Sql: String =
    """SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (
      |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':e1'), doc_id)
      |    AS INT) AS pos_e1,
      |  CAST(ROW_NUMBER() OVER (
      |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':e2'), doc_id)
      |    AS INT) AS pos_e2
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t31
  /** Gopher-style rule filters (Rae et al. 2021, "Scaling Language
    * Models" table A1) — the heuristic quality gate most production
    * corpora apply before any model-based scoring: word-count bounds,
    * mean-word-length window, alphabetic-word fraction, and a
    * stop-word-presence requirement, each emitted as its own flag plus
    * the conjunctive `keep` (per-rule flags are what a data card
    * reports; thresholds tuned so the synthetic corpus actually splits
    * on them). One narrow scan, zero shuffle before the output sort —
    * at 100 TB this runs as a map-only stage fused into the ingest
    * scan. */
  def t31GopherRules(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val nW = size(toks)
    // mean word length = non-whitespace chars / words (identical token
    // boundaries either way; avoids a per-token aggregate)
    val meanW = length(regexp_replace(col("text"), "\\s+", ""))
      .cast("double") / nW
    val alphaFrac =
      size(filter(toks, x => x.rlike("[a-z]"))).cast("double") / nW
    val stopHits = size(filter(toks,
      x => x.isin("the", "be", "to", "of", "and", "that", "have", "with")))
    Tables.fanOut(Tables.documents(s, d), col("doc_id")) // r16 fan-out; r17 PK key
      .select(col("doc_id"), col("lang"), nW.as("n_words"),
        meanW.as("mean_wlen"), alphaFrac.as("alpha_frac"),
        stopHits.as("stop_hits"))
      .select(col("doc_id"), col("lang"), col("n_words"), col("mean_wlen"),
        col("alpha_frac"), col("stop_hits"),
        (col("n_words") >= 40).as("len_ok"),
        (col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0).as("wlen_ok"),
        (col("alpha_frac") >= 0.8).as("alpha_ok"),
        (col("stop_hits") >= 2).as("stop_ok"))
      .withColumn("keep",
        col("len_ok") && col("wlen_ok") && col("alpha_ok") && col("stop_ok"))
      .orderBy("doc_id")
  }

  val t31Sql: String =
    """WITH s AS (
      |  SELECT doc_id, lang,
      |    string_split_regex(lower(trim(text)), '\s+') AS toks,
      |    length(regexp_replace(text, '\s+', '', 'g')) AS nsp
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, lang,
      |    CAST(len(toks) AS INT) AS n_words,
      |    CAST(nsp AS DOUBLE) / len(toks) AS mean_wlen,
      |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
      |      AS DOUBLE) / len(toks) AS alpha_frac,
      |    CAST(len(list_filter(toks, x -> list_contains(
      |      ['the','be','to','of','and','that','have','with'], x)))
      |      AS INT) AS stop_hits
      |  FROM s)
      |SELECT doc_id, lang, n_words, mean_wlen, alpha_frac, stop_hits,
      |  n_words >= 40 AS len_ok,
      |  mean_wlen >= 3.0 AND mean_wlen <= 10.0 AS wlen_ok,
      |  alpha_frac >= 0.8 AS alpha_ok,
      |  stop_hits >= 2 AS stop_ok,
      |  n_words >= 40 AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
      |    AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
      |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t32
  /** Sliding-window CHUNKING (window 64 tokens, stride 48 — 16-token
    * overlap): the retrieval/RAG-ingest counterpart to t14's
    * concat-and-chunk packing — each document yields overlapping
    * fixed-width chunks so no answer span is ever split across a chunk
    * boundary. Chunk count is ⌈(n−W)/S⌉+1 (one chunk for short docs);
    * every chunk's start/length and an md5 of its ACTUAL text are
    * emitted, so an off-by-one in the stride arithmetic or the slice
    * flips the row. Narrow explode bounded by ~n/S chunks per doc, zero
    * shuffle before the output sort — a map-only ingest stage at
    * 100 TB. */
  def t32SlidingChunks(s: SparkSession, d: String): DataFrame = {
    val W = 64
    val S = 48
    val base = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks",
        when(col("n") <= W, lit(1L))
          .otherwise(ceil((col("n") - W) / lit(S.toDouble)).cast("long")
            + 1L))
    val len = least(lit(W), col("n") - col("ci") * S).cast("int")
    base.select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("ci"))
      .select(col("doc_id"), col("ci").cast("int").as("chunk_idx"),
        (col("ci") * S).cast("int").as("start"), len.as("chunk_len"),
        md5(encode(array_join(
          slice(col("toks"), (col("ci") * S + 1).cast("int"), len), " "),
          "UTF-8")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  val t32Sql: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |g AS (SELECT doc_id, toks, len(toks) AS n FROM s),
      |c AS (SELECT doc_id, toks, n,
      |    CASE WHEN n <= 64 THEN 1
      |      ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) + 1 END AS n_chunks
      |  FROM g),
      |e AS (SELECT doc_id, toks, n,
      |    unnest(range(0, n_chunks)) AS ci FROM c)
      |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
      |  CAST(ci * 48 AS INT) AS start,
      |  CAST(least(64, n - ci * 48) AS INT) AS chunk_len,
      |  md5(array_to_string(toks[CAST(ci * 48 + 1 AS BIGINT):
      |    CAST(ci * 48 + least(64, n - ci * 48) AS BIGINT)], ' '))
      |    AS chunk_md5
      |FROM e ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- t33
  /** BM25 relevance ranking (Robertson, k1=1.2, b=0.75) of the corpus
    * against a fixed query term set — the scoring stage of a lexical
    * retrieval pipeline, over the same tokenizer as t01/t22. The idf is
    * the raw Robertson odds ratio (N−df+0.5)/(df+0.5) WITHOUT the log:
    * every per-term score is then pure rational double arithmetic, and an
    * identical expression tree is bit-deterministic across engines, which
    * a libm `ln` is not. The determinism is a TRADE-OFF, not free:
    * per-term the raw ratio is monotone in df (single-term rankings
    * agree with log-idf BM25 exactly), but summed multi-term scores
    * weight rare terms linearly instead of logarithmically, so a
    * cross-document top-k CAN order multi-term docs differently from
    * Robertson log-idf BM25 — acceptable here because the oracle gate
    * needs bit-exact cross-engine agreement; a production ranker wanting
    * textbook BM25 swaps `ln(idf)` back in and gates with a relative
    * tolerance instead of an exact hash. Per-doc summation goes
    * through [[graft.functions.Det.dsum]] (exact decimal image), so
    * partial-aggregation order cannot perturb the total, and the top-20
    * order is totalized by (score desc, doc_id).
    *
    * Scale shape: postings are filtered to the |Q|-term query BEFORE the
    * tf shuffle (per-doc-per-term groups, ≤|Q| rows per doc); df and the
    * corpus stats are broadcast scalars; the only data-sized work is the
    * narrow tokenize scan. At 100 TB the tf shuffle carries ≤|Q|·n_docs
    * rows — query-bounded, not corpus-bounded. */
  def t33Bm25(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Det.dsum
    val q = Seq("spark", "merge", "window", "vector")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl").cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .where(col("tok").isin(q: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("score_t", col("idf") * ((col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))))
      .groupBy(col("doc_id"))
      .agg(dsum(col("score_t"), 6).as("bm25"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  /** Mirrors t33's expression tree operation-for-operation (same
    * parenthesization, same literals) — rational double arithmetic is
    * IEEE-deterministic, so the hash compare is exact. */
  val t33Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |g AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM t),
      |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |    CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM g),
      |tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM g)
      |  WHERE tok IN ('spark', 'merge', 'window', 'vector')
      |  GROUP BY doc_id, dl, tok),
      |df AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
      |sc AS (SELECT doc_id,
      |    ((n_docs - df + 0.5) / (df + 0.5)) *
      |    ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) AS score_t
      |  FROM tf JOIN df USING (tok) CROSS JOIN st)
      |SELECT doc_id,
      |  CAST(SUM(CAST(score_t AS DECIMAL(38,6))) AS DOUBLE) AS bm25,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms
      |FROM sc GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- t34
  /** Mixture MATERIALIZATION with fractional-epoch repetition — the third
    * leg of the mixture tooling: t21 computes each source's target
    * allocation, t09 cuts a source DOWN to a budget; t34 is the UP-sampling
    * path real recipes need when a small high-quality source's allocation
    * exceeds its size (Gopher/Llama-style "books see ~2.5 epochs while
    * crawl sees 0.6"): each source materializes ⌊alloc/size⌋ FULL epochs
    * plus one deterministic fractional epoch holding the remainder.
    * Everything is integer arithmetic: per-source weight w = (source
    * ordinal mod 3)+1, allocation = B·w div Σw, full = alloc div size,
    * rem = alloc mod size; a document joins the fractional epoch iff
    * md5(doc_id‖salt) mod 10⁶ < rem·10⁶ div size — a deterministic,
    * engine-replayable coin whose expected token mass is the remainder
    * (exact-to-the-token selection would be t09's cutoff; the hash coin is
    * chosen here because it needs NO window at all and keeps the fractional
    * epoch an i.i.d. sample of the source, which the cutoff's
    * longest-first bias is not).
    *
    * Scale shape: per-source stats are one map-side-combinable agg joined
    * back broadcast (sources are dozens); the explode to `copies` rows per
    * doc IS the materialization (output-sized, unavoidable); the
    * fractional coin is a narrow expression. No window, no corpus-keyed
    * shuffle anywhere — compare t09, which needs its two-level histogram
    * precisely because cutoff semantics force an order. */
  private val MatBudget = 60000L

  def t34MixtureMaterialize(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val stats = docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("tok"))
      .withColumn("w", substring(col("source"), 4, 10).cast("long") % 3 + 1)
    val plan = stats.crossJoin(broadcast(stats.agg(sum(col("w")).as("tw"))))
      .withColumn("alloc", expr(s"($MatBudget * w) div tw"))
      .withColumn("fullep", expr("alloc div tok"))
      .withColumn("rem", expr("alloc % tok"))
      .select(col("source"), col("tok"), col("fullep"), col("rem"))
    docs.join(broadcast(plan), Seq("source"))
      .withColumn("h",
        conv(substring(md5(concat(col("doc_id"), lit("t34"))), 1, 8), 16, 10)
          .cast("long") % 1000000L)
      // cross-multiplied coin, not (rem*10⁶) div tok: rem can approach
      // tok (a source's whole token mass), and at the stated 100 TB shape
      // per-source token counts clear 9.2e12 — rem*10⁶ overflows int64
      // (an ANSI-mode abort, not a wrong answer, but it breaks the scale
      // claim). h·tok < rem·10⁶ compared in decimal(38,0) is exact at any
      // magnitude the inputs themselves can reach (h<10⁶, tok<2⁶³ →
      // product < 10²⁵ ≪ 10³⁸); DuckDB replays it as HUGEINT.
      .withColumn("extra",
        (col("h").cast("decimal(38,0)") * col("tok") <
          col("rem").cast("decimal(38,0)") * lit(1000000L)).cast("long"))
      .withColumn("copies", col("fullep") + col("extra"))
      .where(col("copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("copies"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_out"),
        sum(col("n_chars")).cast("long").as("tok_out"),
        max(col("fullep")).as("full_epochs"))
      .orderBy("source")
  }

  /** Oracle restates the materialized sums without the explode (a doc with
    * k copies contributes k rows / k·n_chars tokens). */
  val t34Sql: String =
    s"""WITH st AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok,
      |    (CAST(substr(source, 4) AS BIGINT) % 3) + 1 AS w
      |  FROM documents GROUP BY source),
      |pl AS (
      |  SELECT source, tok,
      |    (($MatBudget * w) // (SELECT SUM(w) FROM st)) AS alloc
      |  FROM st),
      |pl2 AS (SELECT source, tok, alloc // tok AS fullep,
      |    alloc % tok AS rem FROM pl),
      |dd AS (
      |  SELECT d.source, d.n_chars, p.fullep,
      |    p.fullep + (CASE WHEN
      |      CAST(CAST(CONCAT('0x', substr(md5(d.doc_id || 't34'), 1, 8))
      |          AS BIGINT) % 1000000 AS HUGEINT) * p.tok
      |        < CAST(p.rem AS HUGEINT) * 1000000
      |      THEN 1 ELSE 0 END) AS copies
      |  FROM documents d JOIN pl2 p USING (source))
      |SELECT source, CAST(SUM(copies) AS BIGINT) AS n_docs_out,
      |  CAST(SUM(copies * n_chars) AS BIGINT) AS tok_out,
      |  CAST(MAX(fullep) AS BIGINT) AS full_epochs
      |FROM dd GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t35
  /** Tokenizer FERTILITY per language — the chars-per-token /
    * bytes-per-token ratios multilingual-pipeline teams track per
    * language (a tokenizer that spends 3× the tokens per character on
    * one language starves it of effective context — the metric behind
    * vocabulary-allocation decisions). Integer-exact milli-ratios, one
    * narrow scan + one language-keyed map-side-combinable aggregate.
    * `octet_length` gives UTF-8 bytes (≠ chars for CJK — exactly the
    * divergence the bytes ratio exists to expose). */
  def t35Fertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tokens"),
        sum(col("n_chars")).as("chars"),
        sum(col("n_bytes")).as("bytes"))
      .withColumn("chars_per_tok_milli", expr("(1000 * chars) div tokens"))
      .withColumn("bytes_per_tok_milli", expr("(1000 * bytes) div tokens"))
      .orderBy("lang")

  val t35Sql: String =
    """WITH t AS (
      |  SELECT lang,
      |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
      |      AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(strlen(text) AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars,
      |  CAST(SUM(n_bytes) AS BIGINT) AS bytes,
      |  (1000 * CAST(SUM(n_chars) AS BIGINT)) // CAST(SUM(n_tok) AS BIGINT)
      |    AS chars_per_tok_milli,
      |  (1000 * CAST(SUM(n_bytes) AS BIGINT)) // CAST(SUM(n_tok) AS BIGINT)
      |    AS bytes_per_tok_milli
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t36
  /** CORPUS-WIDE BOILERPLATE LINE REMOVAL (the FineWeb/RefinedWeb
    * line-level dedup stage, distinct from document-level dedup): a
    * LINE whose exact text recurs across more than `maxDocs` distinct
    * documents is boilerplate (nav bars, cookie banners, "subscribe"
    * calls) and is dropped from EVERY document, then documents
    * reassemble from their surviving lines in order. Document-level
    * dedup never catches this — the documents differ; the lines don't.
    *
    * Scale shape: the doc-frequency count shuffles once on the uniform
    * line-hash key (map-side combinable); the heavy set is by
    * definition TINY (lines repeated across > maxDocs docs), so the
    * removal is a BROADCAST anti-join — the corpus never shuffles for
    * the second pass. Reassembly is a doc-keyed sort_array(collect)
    * aggregate, the q09 pattern. */
  def dropBoilerplateLines(lines: DataFrame, maxDocs: Long): DataFrame = {
    val heavy = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") > maxDocs)
      .select("line")
    lines.join(broadcast(heavy), Seq("line"), "left_anti")
  }

  /** Driver gate: documents chunk into deterministic 10-word lines, a
    * planted boilerplate line lands in every third document (~170 docs
    * at sf0.001 ≫ maxDocs=5, while any natural 10-word chunk collision
    * is corpus-determined either way), and the output pins per-doc
    * kept/dropped counts plus the md5 of the reassembled text. */
  def t36BoilerplateLines(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val nat = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .groupBy(col("doc_id"), expr("pos div 10").as("lord"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("col")))),
          e => e.getField("col"))).as("line"))
    val planted = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), lit(999L).as("lord"),
        lit("subscribe to our newsletter for daily updates").as("line"))
    // r17 A/B, measured and REVERTED: staging this thrice-evaluated frame
    // was flat-to-worse (1.2 → 1.2-1.5 s) even with broadcast hints — see
    // d29's note (concurrent duplicate stages on an idle box vs the
    // checkpoint barrier).
    val all = nat.unionByName(planted)
    val kept = dropBoilerplateLines(all, maxDocs = 5L)
    val re = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(encode(concat_ws("\n",
          transform(array_sort(collect_list(struct(col("lord"), col("line")))),
            e => e.getField("line"))), "UTF-8")).as("text_md5"))
    val tot = all.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
    tot.join(re, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("text_md5"), md5(lit(""))).as("text_md5"))
      .orderBy("doc_id")
  }

  val t36Sql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l
      |  FROM documents),
      |w AS (SELECT doc_id, unnest(l) AS word,
      |    unnest(range(1, len(l) + 1)) AS ord
      |  FROM ws),
      |nat AS (SELECT doc_id, (ord - 1) // 10 AS lord,
      |    string_agg(word, ' ' ORDER BY ord) AS line
      |  FROM w GROUP BY doc_id, (ord - 1) // 10),
      |pl AS (SELECT doc_id, 999 AS lord,
      |    'subscribe to our newsletter for daily updates' AS line
      |  FROM documents WHERE doc_id % 3 = 0),
      |al AS (SELECT * FROM nat UNION ALL SELECT * FROM pl),
      |heavy AS (SELECT line FROM al GROUP BY line
      |  HAVING COUNT(DISTINCT doc_id) > 5),
      |kept AS (SELECT * FROM al
      |  WHERE line NOT IN (SELECT line FROM heavy)),
      |re AS (SELECT doc_id, COUNT(*) AS n_kept,
      |    md5(string_agg(line, chr(10) ORDER BY lord)) AS text_md5
      |  FROM kept GROUP BY doc_id),
      |tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM al GROUP BY doc_id)
      |SELECT tot.doc_id, CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(tot.n_lines - coalesce(re.n_kept, 0) AS BIGINT) AS n_dropped,
      |  coalesce(re.text_md5, md5('')) AS text_md5
      |FROM tot LEFT JOIN re ON tot.doc_id = re.doc_id
      |ORDER BY tot.doc_id""".stripMargin

  // ---------------------------------------------------------------- t38
  /** CCNet PERPLEXITY BUCKETS (Wenzek et al. 2020): per language, rank
    * every document by its LM score and cut the corpus into
    * head/middle/tail terciles — the split CCNet publishes and LLM
    * pretraining mixes from (head = most in-distribution). Score = t24's
    * per-doc trigram bit-depth rate, integer milli
    * ((1000·Σbits) div n_grams); docs too short for one trigram drop
    * (CCNet drops them too). The tercile is an explicit integer rule —
    * `((rank−1)·3) div n` — restated identically in both engines (never
    * NTILE, whose remainder convention is the engine's own).
    *
    * Scale shape: the per-lang rank is t30's TWO-LEVEL bucketed
    * prefix-sum — score-range blocks (milli div 256, bounded by the bit
    * depth of the training counts: ≤ ~80 blocks × langs) histogrammed in
    * one model-sized collect, offsets broadcast back, row_number only
    * WITHIN (lang, block) — an in-row require rejects any plan where an
    * unpartitioned window survives. No corpus-global sort anywhere. */
  def t38CcnetBuckets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), lower(col("text")).as("text"))
    val tris = graft.functions.CharNgramsExpr.charNgrams(col("text"), 3)
    val train = docs.where(col("lang") === "en")
      .select(explode(tris).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("cnt"))
    val sc = Dedup.truncateLineage(
      docs.select(col("doc_id"), col("lang"), explode(tris).as("tri"))
        .join(broadcast(train), Seq("tri"), "left")
        .groupBy(col("doc_id"), col("lang"))
        .agg(expr("(1000 * sum(CASE WHEN cnt IS NULL THEN 0 " +
          "ELSE length(bin(cnt + 1)) - 1 END)) div count(1)").as("milli"))
        .withColumn("blk", expr("milli div 256")))
    val counts = sc.groupBy(col("lang"), col("blk"))
      .agg(count(lit(1)).as("c")).orderBy("lang", "blk").collect()
    val offs = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val totals = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    counts.foreach { r =>
      val (lang, blk, c) = (r.getString(0), r.getLong(1), r.getLong(2))
      val acc = totals.getOrElse(lang, 0L)
      offs += ((lang, blk, acc))
      totals.update(lang, acc + c)
    }
    val offsDf = s.createDataFrame(offs.toSeq).toDF("lang", "blk", "off")
    val nDf = s.createDataFrame(totals.toSeq).toDF("lang", "n")
    val ww = Window.partitionBy(col("lang"), col("blk"))
      .orderBy(col("milli").asc, col("doc_id").asc)
    val out = sc.join(broadcast(offsDf), Seq("lang", "blk"))
      .join(broadcast(nDf), Seq("lang"))
      .withColumn("rk", col("off") + row_number().over(ww))
      .withColumn("tercile", expr("((rk - 1) * 3) div n"))
      .groupBy(col("lang"), col("tercile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("milli")).as("min_milli"), max(col("milli")).as("max_milli"))
      .orderBy("lang", "tercile")
    val flatWindows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    require(flatWindows.isEmpty,
      "t38: unpartitioned window survived — the bucketed rank must not " +
        "move the corpus to one reducer")
    out
  }

  val t38Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, lower(text) AS text FROM documents),
      |grams AS (
      |  SELECT doc_id, lang, substr(text, CAST(i AS INTEGER), 3) AS tri
      |  FROM docs, UNNEST(range(1, len(text) - 1)) AS u(i)),
      |train AS (
      |  SELECT tri, COUNT(*) AS cnt FROM grams WHERE lang = 'en'
      |  GROUP BY tri),
      |sc AS (SELECT g.doc_id, g.lang,
      |    CAST((1000 * SUM(CASE WHEN t.cnt IS NULL THEN 0
      |      ELSE length(bin(1 + t.cnt)) - 1 END)) // COUNT(*) AS BIGINT)
      |      AS milli
      |  FROM grams g LEFT JOIN train t USING (tri)
      |  GROUP BY g.doc_id, g.lang),
      |r AS (SELECT lang, doc_id, milli,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY milli, doc_id)
      |      AS rk,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM sc)
      |SELECT lang, CAST(((rk - 1) * 3) // n AS BIGINT) AS tercile,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(milli) AS BIGINT) AS min_milli,
      |  CAST(MAX(milli) AS BIGINT) AS max_milli
      |FROM r GROUP BY lang, ((rk - 1) * 3) // n
      |ORDER BY lang, tercile""".stripMargin

  // ---------------------------------------------------------------- t37
  /** URL CANONICALIZATION + host-level aggregation — the first stage of
    * every web-corpus curation pipeline (CommonCrawl → FineWeb/C4): the
    * same page arrives under `www.`/bare-host, `:443`, trailing-slash,
    * tracking-parameter, and fragment variants, and URL-level dedup or
    * host-level policy is meaningless until those collapse. The kernel:
    * strip the fragment; drop tracking params (`utm_*`, `fbclid`,
    * `gclid`) by splitting the query and FILTERING the param list (not a
    * regex over the whole string — param-boundary-safe and
    * order-preserving for the survivors); strip the default `:443` port,
    * the `www.` prefix, and a trailing slash from the path part.
    *
    * Scale shape: canonicalization is a narrow per-row map; the host
    * roll-up aggregates (host, canon) FIRST — so a mega-host fans out
    * over its distinct URLs before the per-host level, and the final
    * host-keyed agg (≤ distinct hosts) is map-side combinable. No
    * corpus-global window, no driver state. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val parts = split(noFrag, "\\?", 2)
    val base = regexp_replace(regexp_replace(regexp_replace(
      element_at(parts, 1),
      "^https://www\\.", "https://"), ":443(/|$)", "$1"), "/$", "")
    val query = try_element_at(parts, lit(2))
    val params = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=")))
    concat(base,
      when(query.isNull || size(params) === 0, lit(""))
        .otherwise(concat(lit("?"), array_join(params, "&"))))
  }

  /** Per-host summary over canonicalized URLs: document count, distinct
    * canonical URLs, and the largest duplicate family (max docs per one
    * canonical URL) — the inputs to host-level spam policy. */
  def hostUrlStats(urls: DataFrame): DataFrame = {
    val canon = urls.withColumn("canon", canonicalizeUrl(col("url")))
      .withColumn("host", regexp_extract(col("canon"),
        "^https://([^/?]+)", 1))
    canon.groupBy(col("host"), col("canon"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("host"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_urls"),
        max(col("n")).as("max_dup"))
  }

  /** Gate synthesis: every variant axis populated from doc_id residues —
    * www/bare, :443/none, trailing slash/none, utm-first query/plain,
    * fragment/none — so each canonicalization branch is load-bearing
    * (23 hosts × 17 paths × 11 ids collide heavily). */
  def t37UrlCanonicalize(s: SparkSession, d: String): DataFrame =
    hostUrlStats(syntheticUrls(s, d)).orderBy("host")

  /** Shared t37/d28 synthesis — see [[t37UrlCanonicalize]]. */
  private[operators] def syntheticUrls(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"))
      .select(col("doc_id"), concat(
        lit("https://"),
        when(col("doc_id") % 3 === 0, "www.").otherwise(""),
        lit("h"), (col("doc_id") % 23).cast("string"),
        lit(".example.com"),
        when(col("doc_id") % 5 === 0, ":443").otherwise(""),
        lit("/p/"), ((col("doc_id") / 23).cast("long") % 3).cast("string"),
        when(col("doc_id") % 4 === 0, "/").otherwise(""),
        when(col("doc_id") % 2 === 0,
          concat(lit("?utm_source=feed&id="),
            (col("doc_id") % 2).cast("string")))
          .otherwise(concat(lit("?id="),
            (col("doc_id") % 2).cast("string"))),
        when(col("doc_id") % 6 === 0, "#sec").otherwise("")).as("url"))

  val t37Sql: String =
    """WITH u AS (SELECT doc_id, 'https://' ||
      |    CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
      |    'h' || CAST(doc_id % 23 AS VARCHAR) || '.example.com' ||
      |    CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
      |    '/p/' || CAST((doc_id // 23) % 3 AS VARCHAR) ||
      |    CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
      |    CASE WHEN doc_id % 2 = 0
      |      THEN '?utm_source=feed&id=' || CAST(doc_id % 2 AS VARCHAR)
      |      ELSE '?id=' || CAST(doc_id % 2 AS VARCHAR) END ||
      |    CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END AS url
      |  FROM documents),
      |s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS nf FROM u),
      |s2 AS (SELECT doc_id, string_split(nf, '?') AS parts FROM s1),
      |s3 AS (SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(parts[1],
      |      '^https://www\.', 'https://'), ':443(/|$)', '\1'),
      |      '/$', '') AS base,
      |    parts[2] AS query FROM s2),
      |s4 AS (SELECT doc_id, base, query,
      |    list_filter(string_split(query, '&'), p ->
      |      NOT (starts_with(p, 'utm_') OR starts_with(p, 'fbclid=')
      |        OR starts_with(p, 'gclid='))) AS params FROM s3),
      |c AS (SELECT doc_id, base ||
      |    CASE WHEN query IS NULL OR len(params) = 0 THEN ''
      |      ELSE '?' || array_to_string(params, '&') END AS canon
      |  FROM s4),
      |h AS (SELECT doc_id, canon,
      |    regexp_extract(canon, '^https://([^/?]+)', 1) AS host FROM c),
      |pc AS (SELECT host, canon, COUNT(*) AS n FROM h
      |  GROUP BY host, canon)
      |SELECT host, CAST(SUM(n) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_urls,
      |  CAST(MAX(n) AS BIGINT) AS max_dup
      |FROM pc GROUP BY host ORDER BY host""".stripMargin

  // ---------------------------------------------------------------- t39
  /** TEMPERATURE-BASED MULTILINGUAL SAMPLING WEIGHTS (mC4 / XLM-R /
    * mT5's language-mixing rule): sampling a multilingual corpus
    * proportional to raw token mass drowns low-resource languages, so
    * pretraining mixes sample language l with probability ∝ p_l^α
    * (α = 1/2 here) — the "temperature" that upweights the tail. The
    * operator emits, per language: token mass, the raw ppm share, the
    * temperature ppm share, and the boost ratio (milli) a sampler
    * applies — low-resource languages get boost > 1000, the dominant
    * language < 1000, by construction of the concave power.
    *
    * Determinism: mass^(1/2) is `floor(sqrt(x))` — IEEE mandates sqrt
    * correctly rounded, so JVM and DuckDB agree bit-for-bit (the
    * no-libm discipline: ln/pow are NOT mandated, sqrt is). Exact for
    * masses below 2^52, far past any per-language token count that fits
    * a BIGINT corpus ledger.
    *
    * Scale shape: one narrow scan → per-lang partial-aggregated mass
    * (|langs| rows), then every derived column is arithmetic on a
    * scalar-broadcast total. Nothing corpus-sized ever shuffles; the
    * result is a dim table a sampler broadcasts right back (t34's
    * mixture materialization consumes exactly this shape). */
  def t39TemperatureMix(s: SparkSession, d: String): DataFrame = {
    val mass = Tables.documents(s, d)
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("lang")).agg(sum(col("n")).as("tok_mass"))
      .withColumn("w",
        floor(sqrt(col("tok_mass").cast("double"))).cast("long"))
    val tot = mass.agg(sum(col("tok_mass")).as("m_tot"),
      sum(col("w")).as("w_tot"))
    mass.crossJoin(tot)
      .select(col("lang"), col("tok_mass"),
        expr("tok_mass * 1000000 div m_tot").as("raw_ppm"),
        expr("w * 1000000 div w_tot").as("temp_ppm"))
      .withColumn("boost_milli", expr("temp_ppm * 1000 div raw_ppm"))
      .orderBy(col("lang"))
  }

  val t39Sql: String =
    """WITH t AS (SELECT lang,
      |    len(string_split_regex(lower(trim(text)), '\s+')) AS n
      |  FROM documents),
      |m AS (SELECT lang, SUM(n) AS tok_mass FROM t GROUP BY lang),
      |w AS (SELECT lang, tok_mass,
      |    CAST(floor(sqrt(CAST(tok_mass AS DOUBLE))) AS BIGINT) AS w
      |  FROM m),
      |tot AS (SELECT SUM(tok_mass) AS m_tot, SUM(w) AS w_tot FROM w)
      |SELECT lang, CAST(tok_mass AS BIGINT) AS tok_mass,
      |  CAST(tok_mass * 1000000 // m_tot AS BIGINT) AS raw_ppm,
      |  CAST(w * 1000000 // w_tot AS BIGINT) AS temp_ppm,
      |  CAST((w * 1000000 // w_tot) * 1000
      |    // (tok_mass * 1000000 // m_tot) AS BIGINT) AS boost_milli
      |FROM w, tot ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t40
  /** FILL-IN-THE-MIDDLE transform (Bavarian et al. 2022) — the
    * data-side trick that gives a left-to-right LM infilling ability:
    * for a deterministic half of the corpus, pick two cut points, and
    * reorder the document to PSM form
    * `<PRE>prefix<SUF>suffix<MID>middle`; the other half stays
    * autoregressive. Cuts here are key-derived residues mod (n+1) — at
    * corpus scale a pipeline derives them from a content hash, same
    * plan — including the degenerate empty-prefix/middle/suffix cases
    * (c1 = c2, cuts at 0 or n), which MUST reassemble losslessly: the
    * row pins the transformed text's exact md5 and length (length is
    * original + 15 sentinel chars for FIM rows — a character lost at a
    * cut boundary flips both).
    *
    * Scale shape: pure per-row projection — three substrings and a
    * concat, zero shuffles, stays in whole-stage codegen. */
  def t40FimTransform(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val n = length(col("text"))
    val c1 = pmod(col("doc_id") * 7919, n + 1)
    val c2 = pmod(col("doc_id") * 104729, n + 1)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val fim = concat(lit("<PRE>"), col("text").substr(lit(1), lo),
      lit("<SUF>"), col("text").substr(hi + 1, n - hi),
      lit("<MID>"), col("text").substr(lo + 1, hi - lo))
    docs
      .withColumn("mode",
        when(col("doc_id") % 2 === 0, lit("fim")).otherwise(lit("ar")))
      .withColumn("out",
        when(col("mode") === "fim", fim).otherwise(col("text")))
      .select(col("doc_id"), col("mode"),
        length(col("out")).cast("long").as("n_chars"),
        md5(encode(col("out"), "UTF-8")).as("text_md5"))
      .orderBy("doc_id")
  }

  val t40Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |c AS (SELECT doc_id, text, n,
      |    LEAST((doc_id * 7919) % (n + 1), (doc_id * 104729) % (n + 1))
      |      AS lo,
      |    GREATEST((doc_id * 7919) % (n + 1), (doc_id * 104729) % (n + 1))
      |      AS hi
      |  FROM d),
      |o AS (SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'fim' ELSE 'ar' END AS mode,
      |    CASE WHEN doc_id % 2 = 0 THEN
      |      '<PRE>' || substr(text, 1, CAST(lo AS INT))
      |        || '<SUF>' || substr(text, CAST(hi + 1 AS INT),
      |          CAST(n - hi AS INT))
      |        || '<MID>' || substr(text, CAST(lo + 1 AS INT),
      |          CAST(hi - lo AS INT))
      |      ELSE text END AS out
      |  FROM c)
      |SELECT doc_id, mode, CAST(length(out) AS BIGINT) AS n_chars,
      |  md5(out) AS text_md5
      |FROM o ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t41
  /** CHAT-TEMPLATE RENDERING — the SFT-data materialization step every
    * instruction-tuning pipeline runs (HF `apply_chat_template` /
    * ChatML): conversation turns render as
    * `<|im_start|>role\ncontent<|im_end|>\n` in turn order, and the
    * loss mask needs the CHARACTER OFFSETS of assistant content inside
    * the rendered string (`asst_start` = 0-based offset of the first
    * assistant content char; `asst_chars` = total assistant content
    * mass), which must be computed IN-ENGINE — re-tokenizing to find
    * them downstream is the classic train-time bug. Offsets are a
    * conversation-KEYED prefix sum over piece lengths (conversations
    * are bounded, so the window never sees corpus-sized partitions);
    * reassembly is the q09 sorted-collect pattern; everything else is
    * per-row codegen arithmetic. */
  def renderChatTemplate(turns: DataFrame): DataFrame = {
    val piece = concat(lit("<|im_start|>"), col("role"), lit("\n"),
      col("content"), lit("<|im_end|>\n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    // len("<|im_start|>assistant\n") = 22: content starts there
    turns.select(col("conv_id"), col("turn_idx"), col("role"),
        col("content"), piece.as("piece"))
      .withColumn("prefix_len",
        coalesce(sum(length(col("piece")).cast("long")).over(w), lit(0L)))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("turn_idx"), col("piece")))),
          e => e.getField("piece"))).as("text"),
        min(when(col("role") === "assistant",
          col("prefix_len") + lit(22L))).as("asst_start"),
        sum(when(col("role") === "assistant",
          length(col("content")).cast("long"))).as("asst_sum"))
      .select(col("conv_id"), col("n_turns"),
        length(col("text")).cast("long").as("text_len"),
        col("asst_start"),
        coalesce(col("asst_sum"), lit(0L)).as("asst_chars"),
        md5(encode(col("text"), "UTF-8")).as("text_md5"))
      .orderBy("conv_id")
  }

  /** Driver gate: every document becomes a system+user+assistant
    * conversation sliced from its text at fixed character windows; even
    * doc_ids append a second user/assistant round (possibly
    * empty-content on short docs — empty turns must still render). */
  def t41ChatTemplate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val base = docs.select(col("doc_id").as("conv_id"), explode(array(
        struct(lit(0L).as("turn_idx"), lit("system").as("role"),
          lit("You are a helpful assistant.").as("content")),
        struct(lit(1L).as("turn_idx"), lit("user").as("role"),
          col("text").substr(lit(1), lit(100)).as("content")),
        struct(lit(2L).as("turn_idx"), lit("assistant").as("role"),
          col("text").substr(lit(101), lit(150)).as("content")))).as("t"))
      .select(col("conv_id"), col("t.turn_idx").as("turn_idx"),
        col("t.role").as("role"), col("t.content").as("content"))
    val extra = docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("conv_id"), explode(array(
        struct(lit(3L).as("turn_idx"), lit("user").as("role"),
          col("text").substr(lit(251), lit(80)).as("content")),
        struct(lit(4L).as("turn_idx"), lit("assistant").as("role"),
          col("text").substr(lit(331), lit(120)).as("content")))).as("t"))
      .select(col("conv_id"), col("t.turn_idx").as("turn_idx"),
        col("t.role").as("role"), col("t.content").as("content"))
    renderChatTemplate(base.unionByName(extra))
  }

  val t41Sql: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |t AS (
      |  SELECT doc_id AS conv_id, 0 AS turn_idx, 'system' AS role,
      |    'You are a helpful assistant.' AS content FROM d
      |  UNION ALL SELECT doc_id, 1, 'user', substr(text, 1, 100) FROM d
      |  UNION ALL SELECT doc_id, 2, 'assistant', substr(text, 101, 150)
      |    FROM d
      |  UNION ALL SELECT doc_id, 3, 'user', substr(text, 251, 80)
      |    FROM d WHERE doc_id % 2 = 0
      |  UNION ALL SELECT doc_id, 4, 'assistant', substr(text, 331, 120)
      |    FROM d WHERE doc_id % 2 = 0),
      |p AS (SELECT conv_id, turn_idx, role, content,
      |    '<|im_start|>' || role || chr(10) || content || '<|im_end|>'
      |      || chr(10) AS piece
      |  FROM t),
      |w AS (SELECT *, COALESCE(SUM(length(piece)) OVER (
      |      PARTITION BY conv_id ORDER BY turn_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS prefix_len
      |  FROM p)
      |SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
      |  CAST(SUM(length(piece)) AS BIGINT) AS text_len,
      |  CAST(MIN(CASE WHEN role = 'assistant' THEN prefix_len + 22 END)
      |    AS BIGINT) AS asst_start,
      |  CAST(COALESCE(SUM(CASE WHEN role = 'assistant'
      |    THEN length(content) END), 0) AS BIGINT) AS asst_chars,
      |  md5(string_agg(piece, '' ORDER BY turn_idx)) AS text_md5
      |FROM w GROUP BY conv_id ORDER BY conv_id""".stripMargin

  // ---------------------------------------------------------------- t42
  /** ROUGE-1/2 CLIPPED OVERLAP (Lin 2004) — the summarization /
    * SFT-response evaluation metric a training pipeline computes at
    * corpus scale (dedup of model outputs against references, eval-set
    * scoring): per (candidate, reference) pair, clipped n-gram overlap
    * Σ_g min(c_cand, c_ref) with precision/recall as integer permille.
    * Token arrays stage to ATTRIBUTES before the bigram lambda (the
    * t19/t24 discipline — a captured expression would re-split per
    * element), counts aggregate per (pair, gram) map-side, and the
    * clipped intersection is an INNER equi-join on the uniform
    * (pair_id, gram) key — grams missing from either side contribute 0
    * and never shuffle. Pair fan-out is |pairs|·|grams-per-doc|, linear
    * in corpus size. */
  def rougeOverlap(pairs: DataFrame): DataFrame = {
    // r17 A/B, measured and REVERTED: staging the tokenized pair frame
    // (the split subtree evaluates five times across the uni/bi×cand/ref
    // arms + lens) and collapsing the two per-n overlap consumers into
    // one conditional aggregate measured flat-to-worse (1.4 → 1.3-1.6 s
    // at sf0.1) — the 25-token re-splits are cheap, the gram join +
    // aggregates dominate, and the checkpoint barrier serializes stages
    // that previously overlapped (see d29's note).
    def grams(side: String): DataFrame = {
      val toks = pairs.select(col("pair_id"),
        split(lower(trim(col(side))), "\\s+").as("toks"))
      val uni = toks.select(col("pair_id"), lit(1).as("n"),
        explode(col("toks")).as("gram"))
      val bi = toks.select(col("pair_id"), lit(2).as("n"),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat(element_at(col("toks"), i), lit(" "),
              element_at(col("toks"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("gram"))
      uni.unionByName(bi)
        .groupBy(col("pair_id"), col("n"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
    }
    val c = grams("cand").withColumnRenamed("cnt", "cc")
    val r = grams("ref").withColumnRenamed("cnt", "cr")
    val ov = c.join(r, Seq("pair_id", "n", "gram"))
      .groupBy(col("pair_id"), col("n"))
      .agg(sum(least(col("cc"), col("cr"))).as("ov"))
    val lens = pairs.select(col("pair_id"),
      size(split(lower(trim(col("cand"))), "\\s+")).cast("long").as("nc1"),
      size(split(lower(trim(col("ref"))), "\\s+")).cast("long").as("nr1"))
    lens
      .join(ov.where(col("n") === 1).select(col("pair_id"),
        col("ov").as("ov1")), Seq("pair_id"), "left")
      .join(ov.where(col("n") === 2).select(col("pair_id"),
        col("ov").as("ov2")), Seq("pair_id"), "left")
      .select(col("pair_id"),
        coalesce(col("ov1"), lit(0L)).as("r1_overlap"),
        expr("CASE WHEN nc1 = 0 THEN NULL ELSE " +
          "(1000 * coalesce(ov1, 0)) div nc1 END").as("r1_prec_permille"),
        expr("CASE WHEN nr1 = 0 THEN NULL ELSE " +
          "(1000 * coalesce(ov1, 0)) div nr1 END").as("r1_rec_permille"),
        coalesce(col("ov2"), lit(0L)).as("r2_overlap"),
        expr("CASE WHEN nc1 <= 1 THEN NULL ELSE " +
          "(1000 * coalesce(ov2, 0)) div (nc1 - 1) END")
          .as("r2_prec_permille"),
        expr("CASE WHEN nr1 <= 1 THEN NULL ELSE " +
          "(1000 * coalesce(ov2, 0)) div (nr1 - 1) END")
          .as("r2_rec_permille"))
      .orderBy("pair_id")
  }

  /** Driver gate: candidate = tokens 1–25, reference = tokens 6–35 of
    * the same document — a high-but-partial overlap whose clipped
    * counts exercise both the min() and the missing-gram zero paths. */
  def t42RougeEval(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("pair_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .select(col("pair_id"),
        concat_ws(" ", slice(col("toks"), 1, 25)).as("cand"),
        concat_ws(" ", slice(col("toks"), 6, 30)).as("ref"))
    rougeOverlap(docs)
  }

  val t42Sql: String =
    """WITH d AS (SELECT doc_id AS pair_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |pr AS (SELECT pair_id,
      |    array_to_string(list_slice(toks, 1, 25), ' ') AS cand,
      |    array_to_string(list_slice(toks, 6, 35), ' ') AS ref
      |  FROM d),
      |ct AS (SELECT pair_id,
      |    string_split_regex(lower(trim(cand)), '\s+') AS t FROM pr),
      |rt AS (SELECT pair_id,
      |    string_split_regex(lower(trim(ref)), '\s+') AS t FROM pr),
      |cg AS (
      |  SELECT pair_id, 1 AS n, unnest(t) AS gram FROM ct
      |  UNION ALL
      |  SELECT pair_id, 2 AS n, unnest(list_transform(range(1, len(t)),
      |    i -> t[i] || ' ' || t[i + 1])) AS gram FROM ct),
      |rg AS (
      |  SELECT pair_id, 1 AS n, unnest(t) AS gram FROM rt
      |  UNION ALL
      |  SELECT pair_id, 2 AS n, unnest(list_transform(range(1, len(t)),
      |    i -> t[i] || ' ' || t[i + 1])) AS gram FROM rt),
      |cc AS (SELECT pair_id, n, gram, COUNT(*) AS cc FROM cg
      |  GROUP BY 1, 2, 3),
      |cr AS (SELECT pair_id, n, gram, COUNT(*) AS cr FROM rg
      |  GROUP BY 1, 2, 3),
      |ov AS (SELECT pair_id, n, SUM(LEAST(cc, cr)) AS ov
      |  FROM cc JOIN cr USING (pair_id, n, gram) GROUP BY 1, 2),
      |lens AS (SELECT pair_id, len(t) AS nc1 FROM ct),
      |lenr AS (SELECT pair_id, len(t) AS nr1 FROM rt)
      |SELECT lens.pair_id,
      |  CAST(COALESCE(o1.ov, 0) AS BIGINT) AS r1_overlap,
      |  CAST(CASE WHEN nc1 = 0 THEN NULL
      |    ELSE (1000 * COALESCE(o1.ov, 0)) // nc1 END AS BIGINT)
      |    AS r1_prec_permille,
      |  CAST(CASE WHEN nr1 = 0 THEN NULL
      |    ELSE (1000 * COALESCE(o1.ov, 0)) // nr1 END AS BIGINT)
      |    AS r1_rec_permille,
      |  CAST(COALESCE(o2.ov, 0) AS BIGINT) AS r2_overlap,
      |  CAST(CASE WHEN nc1 <= 1 THEN NULL
      |    ELSE (1000 * COALESCE(o2.ov, 0)) // (nc1 - 1) END AS BIGINT)
      |    AS r2_prec_permille,
      |  CAST(CASE WHEN nr1 <= 1 THEN NULL
      |    ELSE (1000 * COALESCE(o2.ov, 0)) // (nr1 - 1) END AS BIGINT)
      |    AS r2_rec_permille
      |FROM lens JOIN lenr USING (pair_id)
      |  LEFT JOIN (SELECT pair_id, ov FROM ov WHERE n = 1) o1
      |    USING (pair_id)
      |  LEFT JOIN (SELECT pair_id, ov FROM ov WHERE n = 2) o2
      |    USING (pair_id)
      |ORDER BY pair_id""".stripMargin

  // ---------------------------------------------------------------- t43
  /** SPAN CORRUPTION (T5, Raffel et al. 2020) — the
    * masked-span-denoising data transform complementing t40's FIM:
    * deterministic 10-char spans (one per 40-char block, offset
    * hash-derived within the block so spans never overlap) are cut out
    * of the input and replaced by per-span sentinels `<X_b>`; the
    * target is the sentinel-delimited sequence of removed spans. The
    * degenerate cases — doc shorter than one block (nothing masked),
    * the unmasked tail — must reassemble LOSSLESSLY, pinned by exact
    * md5 + length of both streams (the t40 discipline; the spec
    * re-splices input+target and matches the original text md5).
    *
    * Scale shape: per-row explode into ≤ len/40 blocks → two
    * doc-keyed sorted-collect reassemblies (q09 pattern) — narrow,
    * uniform, no corpus-global state. */
  /** The reusable transform: (doc_id, text) → (doc_id, n_spans, input,
    * target). Deterministic offsets; losslessness = re-splicing each
    * `<X_b>` with its target span recovers the original text
    * (spec-pinned). */
  def spanCorrupt(docsIn: DataFrame): DataFrame = {
    val docs = docsIn.select(col("doc_id"), col("text"),
      length(col("text")).as("n"))
    val blocks = docs
      .select(col("doc_id"), col("text"), col("n"),
        explode(when(col("n") >= 40,
          sequence(lit(0L), (col("n").cast("long").divide(40))
            .cast("long") - 1))
          .otherwise(array().cast("array<bigint>"))).as("b"))
      .withColumn("seg", expr("substring(text, CAST(b * 40 + 1 AS INT), 40)"))
      .withColumn("off", pmod(col("doc_id") * 7919 + col("b") * 104729,
        lit(31)))
      .withColumn("inp_piece", expr(
        "concat(substring(seg, 1, CAST(off AS INT)), '<X', b, '>', " +
          "substring(seg, CAST(off + 11 AS INT), 30))"))
      .withColumn("tgt_piece", expr(
        "concat('<X', b, '>', substring(seg, CAST(off + 1 AS INT), 10))"))
    val assembled = blocks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("b"), col("inp_piece")))),
          e => e.getField("inp_piece"))).as("inp_body"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("b"), col("tgt_piece")))),
          e => e.getField("tgt_piece"))).as("tgt_body"))
    docs.join(assembled, Seq("doc_id"), "left")
      .withColumn("tail", expr(
        "substring(text, CAST((n div 40) * 40 + 1 AS INT), 39)"))
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        concat(coalesce(col("inp_body"), lit("")), col("tail"))
          .as("input"),
        concat(coalesce(col("tgt_body"), lit("")), lit("<EOS>"))
          .as("target"))
  }

  def t43SpanCorruption(s: SparkSession, d: String): DataFrame =
    spanCorrupt(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_spans"),
        length(col("input")).cast("long").as("input_len"),
        length(col("target")).cast("long").as("target_len"),
        md5(encode(col("input"), "UTF-8")).as("input_md5"),
        md5(encode(col("target"), "UTF-8")).as("target_md5"))
      .orderBy("doc_id")

  val t43Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |bl AS (SELECT doc_id, text, n, unnest(range(0, n // 40)) AS b
      |  FROM d WHERE n >= 40),
      |p AS (SELECT doc_id, b,
      |    substr(text, CAST(b * 40 + 1 AS INT), 40) AS seg,
      |    (doc_id * 7919 + b * 104729) % 31 AS off
      |  FROM bl),
      |pc AS (SELECT doc_id, b,
      |    substr(seg, 1, CAST(off AS INT)) || '<X' || b || '>'
      |      || substr(seg, CAST(off + 11 AS INT), 30) AS inp_piece,
      |    '<X' || b || '>' || substr(seg, CAST(off + 1 AS INT), 10)
      |      AS tgt_piece
      |  FROM p),
      |asm AS (SELECT doc_id, COUNT(*) AS n_spans,
      |    string_agg(inp_piece, '' ORDER BY b) AS inp_body,
      |    string_agg(tgt_piece, '' ORDER BY b) AS tgt_body
      |  FROM pc GROUP BY doc_id),
      |fin AS (SELECT d.doc_id,
      |    COALESCE(asm.n_spans, 0) AS n_spans,
      |    COALESCE(asm.inp_body, '')
      |      || substr(d.text, CAST((d.n // 40) * 40 + 1 AS INT), 39)
      |      AS input,
      |    COALESCE(asm.tgt_body, '') || '<EOS>' AS target
      |  FROM d LEFT JOIN asm ON d.doc_id = asm.doc_id)
      |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
      |  CAST(length(input) AS BIGINT) AS input_len,
      |  CAST(length(target) AS BIGINT) AS target_len,
      |  md5(input) AS input_md5, md5(target) AS target_md5
      |FROM fin ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t44
  /** PMI COLLOCATION MINING — pointwise mutual information over adjacent
    * token pairs (Church & Hanks 1990), the corpus-analytics kernel
    * behind phrase detection (word2vec's phrase pass), tokenizer merge
    * candidates, and MWE lexicons. PMI = log p(xy)/(p(x)p(y)); the LOG
    * IS MONOTONE, so ranking uses the RAW RATIO cxy·N²/(Nb·cx·cy)
    * computed in double — t12's no-libm discipline: × and / are
    * IEEE-correctly-rounded on every engine while log is not, and the
    * operand magnitudes (≤ cxy·N² ≈ 1e14) sit inside double's exact-
    * integer range, so the identical expression tree is bit-exact on
    * both engines. Low-count pairs are floored out first (cxy ≥ 3,
    * unigrams ≥ 5 — PMI's classic rare-pair pathology).
    *
    * Scale shape: the bigram explode is narrow; ONE uniform (w1, w2)
    * aggregate absorbs repeats map-side; the unigram table aggregates
    * to vocabulary size and BROADCASTS back twice (w1, then w2); the
    * global top-20 is a TakeOrdered over the filtered candidate set —
    * vocab²-bounded and floor-pruned, never corpus-sized. */
  def t44PmiPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val bigrams = docs.select(explode(expr(
        """transform(sequence(1, greatest(size(toks) - 1, 0)),
          |  i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"""
        .stripMargin)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cxy"))
    val uni = docs.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = docs.agg(
      sum(size(col("toks"))).as("n_tok"),
      sum(greatest(size(col("toks")) - 1, lit(0))).as("n_big"))
    bigrams.where(col("cxy") >= 3)
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("cx"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("cy"))),
        Seq("w2"))
      .where(col("cx") >= 5 && col("cy") >= 5)
      .crossJoin(broadcast(totals))
      .withColumn("score",
        col("cxy").cast("double") * col("n_tok").cast("double") *
          col("n_tok").cast("double") /
          (col("n_big").cast("double") * col("cx").cast("double") *
            col("cy").cast("double")))
      .select(col("w1"), col("w2"), col("cxy"), col("cx"), col("cy"),
        col("score"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
      .limit(20)
  }

  val t44Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |big AS (SELECT toks[CAST(i AS INT)] AS w1,
      |    toks[CAST(i + 1 AS INT)] AS w2
      |  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)),
      |bc AS (SELECT w1, w2, COUNT(*) AS cxy FROM big GROUP BY w1, w2),
      |uni AS (SELECT unnest(toks) AS w FROM t),
      |uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
      |tot AS (SELECT SUM(len(toks)) AS n_tok,
      |    SUM(greatest(len(toks) - 1, 0)) AS n_big FROM t)
      |SELECT b.w1, b.w2, b.cxy, u1.c AS cx, u2.c AS cy,
      |  CAST(b.cxy AS DOUBLE) * CAST(tot.n_tok AS DOUBLE)
      |    * CAST(tot.n_tok AS DOUBLE)
      |    / (CAST(tot.n_big AS DOUBLE) * CAST(u1.c AS DOUBLE)
      |       * CAST(u2.c AS DOUBLE)) AS score
      |FROM bc b
      |JOIN uc u1 ON b.w1 = u1.w
      |JOIN uc u2 ON b.w2 = u2.w
      |CROSS JOIN tot
      |WHERE b.cxy >= 3 AND u1.c >= 5 AND u2.c >= 5
      |ORDER BY score DESC, b.w1, b.w2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- t45
  /** CHARACTER-COVERAGE TABLE (SentencePiece's `--character_coverage`
    * preprocessing decision) — per language: how many distinct
    * characters exist, and how many of the most frequent ones are
    * needed to cover 99.5% of character occurrences. Tokenizer training
    * keeps exactly that prefix of the character histogram; everything
    * past it maps to UNK/bytes. The cumulative runs over the per-lang
    * CHARACTER HISTOGRAM — domain-bounded (alphabet × langs, thousands
    * of rows), never corpus-sized, so the per-lang window is safe by
    * construction where a per-doc-row window would not be. Ties at the
    * same frequency break by codepoint for a deterministic prefix.
    *
    * Scale shape: explode to (lang, char) → ONE uniform hash aggregate
    * with map-side combine (the 100 TB scan collapses to the alphabet
    * immediately); the window and the final per-lang reduce run on the
    * tiny histogram. */
  def t45CharCoverage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("ch").asc)
    val hist = Tables.documents(s, d)
      .select(col("lang"),
        explode(split(lower(trim(col("text"))), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy(col("lang"), col("ch")).agg(count(lit(1)).as("n"))
    hist
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("tot",
        sum(col("n")).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_distinct_chars"),
        sum(col("n")).as("n_char_occ"),
        min(when(col("cum") * 1000 >= col("tot") * 995, col("rk")))
          .as("chars_at_995"))
      .orderBy("lang")
  }

  val t45Sql: String =
    """WITH ch AS (
      |  SELECT lang,
      |    unnest(string_split_regex(lower(trim(text)), '')) AS ch
      |  FROM documents),
      |h AS (SELECT lang, ch, COUNT(*) AS n FROM ch
      |  WHERE ch <> '' GROUP BY lang, ch),
      |c AS (SELECT lang, ch, n,
      |    SUM(n) OVER (PARTITION BY lang ORDER BY n DESC, ch ASC
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY n DESC, ch ASC) AS rk,
      |    SUM(n) OVER (PARTITION BY lang) AS tot
      |  FROM h)
      |SELECT lang, COUNT(*) AS n_distinct_chars,
      |  CAST(SUM(n) AS BIGINT) AS n_char_occ,
      |  CAST(MIN(CASE WHEN cum * 1000 >= tot * 995 THEN rk END)
      |    AS BIGINT) AS chars_at_995
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t46
  /** MOJIBAKE DETECTION (ftfy's core signature) — the encoding-damage
    * scan a web-scale curation run applies before any tokenizer sees
    * the bytes: UTF-8 text mis-decoded as Latin-1 turns every
    * non-ASCII character into a two-char scar whose FIRST char is
    * 'Ã'/'Â'-family (U+00C2–U+00C5) and whose SECOND lands in the
    * Latin-1 supplement (U+0080–U+00BF) — a bigram that essentially
    * never occurs in honest text. Docs are scored by signature count;
    * the gate plants 20 docs carrying a double-encoded "café résumé"
    * suffix (built with chr() so the source file and both SQL dialects
    * stay pure-ASCII) and requires exactly those docs to flag — the
    * ASCII corpus provably contains no signature.
    *
    * Scale shape: a narrow per-row regexp scan fused into the corpus
    * scan; the only exchange is the final count aggregate. */
  def t46MojibakeGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    graft.operators.Dedup.assertIdHeadroom(docs, "doc_id", d)
    // ' caf' + Ã© + ' r' + Ã© + 'sum' + Ã© : é (U+00E9) double-encoded
    val scar = concat(lit(" caf"), chr(lit(195)), chr(lit(169)),
      lit(" r"), chr(lit(195)), chr(lit(169)),
      lit("sum"), chr(lit(195)), chr(lit(169)))
    val planted = docs.orderBy(col("doc_id").asc).limit(20)
      .select((col("doc_id") + lit(graft.operators.Dedup.PlantOffset))
        .as("doc_id"), concat(col("text"), scar).as("text"))
    val scored = docs.unionByName(planted)
      .select(col("doc_id"),
        size(expr(
          """regexp_extract_all(text,
            |  '[\\u00C2-\\u00C5][\\u0080-\\u00BF]', 0)""".stripMargin))
          .cast("long").as("n_scars"))
    val flagged = scored.where(col("n_scars") > 0)
    scored.agg(count(lit(1)).as("n_docs"))
      .crossJoin(flagged.agg(
        count(lit(1)).as("n_flagged"),
        coalesce(sum(col("n_scars")), lit(0L)).as("total_scars")))
      .crossJoin(flagged
        .where(col("doc_id") >= graft.operators.Dedup.PlantOffset)
        .agg(count(lit(1)).as("n_planted_flagged")))
      .select(col("n_docs"), col("n_flagged"), col("total_scars"),
        col("n_planted_flagged"),
        (col("n_flagged") === 20 && col("n_planted_flagged") === 20 &&
          col("total_scars") === 60).as("recall_ok"))
  }

  val t46Sql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |planted AS (SELECT doc_id + 1000000000 AS doc_id,
      |    text || ' caf' || chr(195) || chr(169) || ' r' || chr(195)
      |      || chr(169) || 'sum' || chr(195) || chr(169) AS text
      |  FROM (SELECT doc_id, text FROM documents
      |        ORDER BY doc_id LIMIT 20)),
      |alld AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
      |sc AS (SELECT doc_id,
      |    CAST(len(regexp_extract_all(text,
      |      '[\x{00C2}-\x{00C5}][\x{0080}-\x{00BF}]')) AS BIGINT)
      |      AS n_scars
      |  FROM alld),
      |fl AS (SELECT * FROM sc WHERE n_scars > 0)
      |SELECT (SELECT COUNT(*) FROM sc) AS n_docs,
      |  (SELECT COUNT(*) FROM fl) AS n_flagged,
      |  CAST((SELECT COALESCE(SUM(n_scars), 0) FROM fl) AS BIGINT)
      |    AS total_scars,
      |  (SELECT COUNT(*) FROM fl WHERE doc_id >= 1000000000)
      |    AS n_planted_flagged,
      |  ((SELECT COUNT(*) FROM fl) = 20
      |   AND (SELECT COUNT(*) FROM fl WHERE doc_id >= 1000000000) = 20
      |   AND (SELECT COALESCE(SUM(n_scars), 0) FROM fl) = 60)
      |    AS recall_ok""".stripMargin

  // ---------------------------------------------------------------- t47
  /** CLASSIFIER CONFUSION MATRIX — the evaluation layer over t03's
    * language-ID the way s26 scores the ANN family: per (true, guessed)
    * cell the count, plus per-true-language recall in permille (the
    * row-normalized diagonal a data card reports). Emitting the full
    * matrix, not just accuracy, is the point: a language-ID regression
    * shows up as mass moving to a specific wrong cell long before the
    * global accuracy moves.
    *
    * Scale shape: the marker scan is t03's narrow per-row regex pass;
    * ONE (lang, guess) aggregate (≤ 25 cells) + a broadcast per-lang
    * total join — output is matrix-sized at any corpus size. */
  def t47LangIdConfusion(s: SparkSession, d: String): DataFrame = {
    val hits = markerHits(col("text"))
    val per = Tables.fanOut(Tables.documents(s, d), col("doc_id")) // r16 fan-out; r17 PK key
      .select(col("lang"), langGuess(hits).as("guess"))
      .groupBy(col("lang"), col("guess")).agg(count(lit(1)).as("n"))
    val totals = per.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
    per.join(broadcast(totals), Seq("lang"))
      .select(col("lang"), col("guess"), col("n"),
        expr("(1000 * n) div tot").as("cell_permille"),
        (col("lang") === col("guess")).as("is_diagonal"))
      .orderBy("lang", "guess")
  }

  val t47Sql: String =
    s"""WITH h AS (SELECT lang,
       |  $hitColsSql
       |  FROM documents),
       |g AS (SELECT lang, $langGuessSql AS guess FROM h),
       |per AS (SELECT lang, guess, COUNT(*) AS n FROM g
       |  GROUP BY lang, guess),
       |t AS (SELECT lang, SUM(n) AS tot FROM per GROUP BY lang)
       |SELECT per.lang, per.guess, per.n,
       |  CAST((1000 * per.n) // t.tot AS BIGINT) AS cell_permille,
       |  per.lang = per.guess AS is_diagonal
       |FROM per JOIN t ON per.lang = t.lang
       |ORDER BY per.lang, per.guess""".stripMargin

  // ---------------------------------------------------------------- t48
  /** SOURCE-DIVERSITY REPORT (Herfindahl–Hirschman concentration) — the
    * data-card figure that flags a single-source flood before training:
    * per language, HHI = Σ_s share_s² in exact ppm
    * ((10⁶·Σn_s²) div N² — one division, no per-share rounding), and
    * its inverse as the EFFECTIVE source count in milli (a lang drawing
    * equally from k sources scores k·1000; concentration drags it
    * toward 1000). Entropy-based diversity needs log — HHI is the
    * integer-exact diversity statistic both engines restate verbatim
    * (the same reason t12/t44 rank by raw ratios).
    *
    * Scale shape: one (lang, source) count aggregate (map-side
    * combinable, slice-bounded output) then a lang-keyed fold. */
  def t48SourceDiversity(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        // decimal(38,0): n_s² and n_docs² clear int64 only below ~3e9
        // docs per slice — under the 100 TB shape they do not (the t34
        // overflow class); the HHI itself is ≤ 10⁶ and casts back
        sum(col("n").cast("decimal(38,0)") * col("n")).as("sq"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        expr("CAST((1000000 * sq) div (CAST(n_docs AS DECIMAL(38,0))" +
          " * n_docs) AS BIGINT)").as("hhi_ppm"))
      .withColumn("eff_sources_milli",
        expr("1000000000 div hhi_ppm"))
      .orderBy("lang")

  val t48Sql: String =
    """WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents
      |  GROUP BY lang, source),
      |a AS (SELECT lang, SUM(n) AS n_docs, COUNT(*) AS n_sources,
      |    SUM(CAST(n AS HUGEINT) * n) AS sq
      |  FROM c GROUP BY lang),
      |h AS (SELECT lang, n_docs, n_sources,
      |    CAST((1000000 * sq) // (CAST(n_docs AS HUGEINT) * n_docs)
      |      AS BIGINT) AS hhi_ppm
      |  FROM a)
      |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, n_sources,
      |  CAST(hhi_ppm AS BIGINT) AS hhi_ppm,
      |  CAST(1000000000 // hhi_ppm AS BIGINT) AS eff_sources_milli
      |FROM h ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t49
  /** DATA CARD — the one-table summary a corpus release publishes
    * (Dodge et al. 2021's C4 documentation): per language, document and
    * token mass, byte-exact duplication permille, vocabulary size,
    * hapax mass, and source concentration (t48's HHI) — the slices of
    * t13/t22/t48 a reader actually wants side by side, produced by ONE
    * corpus scan feeding three bounded aggregates that join on the
    * 5-row lang key. Integer throughout.
    *
    * Scale shape: the scan computes hash/tokens narrowly; the vocab agg
    * is vocabulary-bounded, the (lang, source) agg slice-bounded, the
    * final join broadcast-trivial. */
  def t49DataCard(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("lang"), col("source"),
        md5(encode(col("text"), "UTF-8")).as("h"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
    val core = base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        count_distinct(col("h")).as("n_unique"))
      .withColumn("dup_permille",
        expr("(1000 * (n_docs - n_unique)) div n_docs"))
    val vocab = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum((col("c") === 1).cast("long")).as("n_hapax"))
    val conc = base.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n").cast("decimal(38,0)") * col("n")).as("sq"),
        sum(col("n")).as("nd")) // decimal: t48's overflow rule
      .select(col("lang"),
        expr("CAST((1000000 * sq) div (CAST(nd AS DECIMAL(38,0)) * nd)" +
          " AS BIGINT)").as("hhi_ppm"))
    core.join(vocab, Seq("lang")).join(conc, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("dup_permille"), col("n_types"), col("n_hapax"),
        col("hhi_ppm"))
      .orderBy("lang")
  }

  val t49Sql: String =
    """WITH base AS (SELECT lang, source, md5(text) AS h,
      |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
      |  FROM documents),
      |core AS (SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |    COUNT(DISTINCT h) AS n_unique
      |  FROM base GROUP BY lang),
      |tok AS (SELECT lang,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
      |  FROM documents),
      |wc AS (SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY lang, w),
      |voc AS (SELECT lang, COUNT(*) AS n_types,
      |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
      |  FROM wc GROUP BY lang),
      |sc AS (SELECT lang, source, COUNT(*) AS n FROM base
      |  GROUP BY lang, source),
      |conc AS (SELECT lang,
      |    CAST((1000000 * SUM(CAST(n AS HUGEINT) * n))
      |      // (SUM(CAST(n AS HUGEINT)) * SUM(n)) AS BIGINT) AS hhi_ppm
      |  FROM sc GROUP BY lang)
      |SELECT core.lang, core.n_docs, core.n_tokens,
      |  CAST((1000 * (core.n_docs - core.n_unique)) // core.n_docs
      |    AS BIGINT) AS dup_permille,
      |  voc.n_types, CAST(voc.n_hapax AS BIGINT) AS n_hapax,
      |  CAST(conc.hhi_ppm AS BIGINT) AS hhi_ppm
      |FROM core JOIN voc ON core.lang = voc.lang
      |JOIN conc ON core.lang = conc.lang
      |ORDER BY core.lang""".stripMargin

  // ---------------------------------------------------------------- t50
  /** PREFERENCE-PAIR ASSEMBLY (DPO/RLHF data prep) — from a
    * (prompt, response, score) pool, emit one (chosen, rejected) pair
    * per prompt: best and worst response by score with deterministic
    * doc-id tie-breaks, prompts with a single response dropped (no
    * contrast), degenerate zero-gap pairs dropped (chosen must actually
    * beat rejected), and prompts hash-assigned to the EVAL split
    * excluded entirely — the leakage rule t26/t27 enforce for
    * train/test, applied at the pair level where a leaked prompt
    * contaminates reward modeling. Prompt ids synthesize by doc-id
    * bucketing; the score is the n_chars quality surrogate.
    *
    * Scale shape: one (prompt)-keyed min/max-struct aggregate —
    * map-side combinable, never a per-prompt sort; the split coin is
    * t26's md5 arithmetic. */
  def t50PreferencePairs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select((col("doc_id") % 97).as("prompt_id"), col("doc_id"),
        col("n_chars").as("score"))
      .groupBy(col("prompt_id"))
      .agg(count(lit(1)).as("n_responses"),
        max(struct(col("score"), col("doc_id"))).as("best"),
        min(struct(col("score"), col("doc_id"))).as("worst"))
      .where(col("n_responses") >= 2)
      .select(col("prompt_id"), col("n_responses"),
        col("best.doc_id").as("chosen_id"),
        col("worst.doc_id").as("rejected_id"),
        (col("best.score") - col("worst.score")).as("score_gap"))
      .where(col("score_gap") > 0)
      .where(expr(
        """CAST(conv(substring(md5(
          |  CAST(prompt_id AS STRING) || ':pref'), 1, 8), 16, 10)
          |  AS BIGINT) % 10 != 0""".stripMargin))
      .orderBy("prompt_id")

  val t50Sql: String =
    """WITH r AS (SELECT doc_id % 97 AS prompt_id, doc_id,
      |    n_chars AS score FROM documents),
      |w AS (SELECT prompt_id, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY prompt_id
      |      ORDER BY score DESC, doc_id DESC) AS rb,
      |    ROW_NUMBER() OVER (PARTITION BY prompt_id
      |      ORDER BY score ASC, doc_id ASC) AS rw
      |  FROM r),
      |g AS (SELECT r.prompt_id, COUNT(*) AS n_responses,
      |    MAX(r.score) - MIN(r.score) AS score_gap
      |  FROM r GROUP BY r.prompt_id)
      |SELECT g.prompt_id, g.n_responses,
      |  CAST(cb.doc_id AS BIGINT) AS chosen_id,
      |  CAST(cw.doc_id AS BIGINT) AS rejected_id,
      |  CAST(g.score_gap AS BIGINT) AS score_gap
      |FROM g
      |JOIN w cb ON cb.prompt_id = g.prompt_id AND cb.rb = 1
      |JOIN w cw ON cw.prompt_id = g.prompt_id AND cw.rw = 1
      |WHERE g.n_responses >= 2 AND g.score_gap > 0
      |  AND CAST(concat('0x', substring(md5(
      |    CAST(g.prompt_id AS VARCHAR) || ':pref'), 1, 8)) AS BIGINT)
      |    % 10 != 0
      |ORDER BY g.prompt_id""".stripMargin

  // ---------------------------------------------------------------- t51
  /** PRIORITY SAMPLING (Duffield–Lund–Thorup, JACM 2007) — weighted
    * sampling WITHOUT replacement plus an unbiased subset-sum estimator,
    * the principled way to cut a weighted corpus down to k docs while
    * still estimating totals (quality-weighted subsampling, cost-aware
    * eval-set draws). Priorities q = w/u with u uniform per doc; keep
    * the k largest; τ = the (k+1)-th priority; Σ max(w, τ) over the
    * sample is an unbiased estimator of Σ w — EXACT when k ≥ n (τ = 0,
    * every doc kept), which the spec pins as a theorem. u derives from
    * the t26-style md5 coin (u = h/2³², h ∈ [1, 2³²]) so both engines
    * replay the same draw, and q stages integer-exact as
    * (w·2³²) div h — no float ln/pow whose last-ulp differences could
    * flip a selection across engines.
    *
    * Scale shape: one narrow scan, one distributed top-(k+1)
    * (TakeOrdered merge — no global sort, no shuffle), then windows and
    * scalar joins over the k+1 survivors, a provably bounded frame. */
  def prioritySample(docs0: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = docs0.select(col("doc_id"), col("w"),
        (conv(substring(md5(concat(col("doc_id"), lit(":t51"))), 1, 8),
          16, 10).cast("long") + 1L).as("h"))
      .withColumn("priority", expr("(w * 4294967296L) div h"))
    val top = pri.orderBy(col("priority").desc, col("doc_id"))
      .limit(k + 1)
      // unpartitioned window over a LIMIT(k+1) frame — bounded by
      // construction (the t30/q97 bounded-frame discipline)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("priority").desc, col("doc_id"))))
    val tau = top.where(col("rn") === k + 1)
      .agg(coalesce(max(col("priority")), lit(0L)).as("tau"))
    val sampled = top.where(col("rn") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("w_hat", greatest(col("w"), col("tau")))
    sampled
      .crossJoin(broadcast(sampled.agg(
        sum(col("w_hat")).cast("long").as("est_total_w"))))
      .select(col("doc_id"), col("w"), col("priority"), col("tau"),
        col("w_hat"), col("est_total_w"))
      .orderBy(col("priority").desc, col("doc_id"))
  }

  def t51PrioritySample(s: SparkSession, d: String): DataFrame =
    prioritySample(Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").as("w")), k = 50)

  val t51Sql: String =
    """WITH p AS (SELECT doc_id, n_chars AS w,
      |    CAST(concat('0x', substr(md5(doc_id || ':t51'), 1, 8))
      |      AS BIGINT) + 1 AS h
      |  FROM documents),
      |q AS (SELECT doc_id, w, (w * 4294967296) // h AS priority FROM p),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id)
      |    AS rn FROM q),
      |t AS (SELECT COALESCE(MAX(CASE WHEN rn = 51 THEN priority END), 0)
      |    AS tau FROM r),
      |s AS (SELECT r.doc_id, r.w, r.priority, t.tau,
      |    GREATEST(r.w, t.tau) AS w_hat
      |  FROM r, t WHERE rn <= 50),
      |e AS (SELECT CAST(SUM(w_hat) AS BIGINT) AS est_total_w FROM s)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(w AS BIGINT) AS w,
      |  CAST(priority AS BIGINT) AS priority, CAST(tau AS BIGINT) AS tau,
      |  CAST(w_hat AS BIGINT) AS w_hat, e.est_total_w
      |FROM s, e ORDER BY priority DESC, doc_id""".stripMargin

  // ---------------------------------------------------------------- t52
  /** BIGRAM COUNT-OF-COUNTS + the Kneser–Ney discount — the count
    * statistics every n-gram LM build reads off its corpus before
    * smoothing (Chen & Goodman 1999): N_c = how many distinct bigram
    * TYPES occur exactly c times (c ≤ 10 emitted; the low counts drive
    * smoothing), total type/token masses, and the absolute-discount
    * estimate D = N₁/(N₁+2N₂) staged integer-exact in milli. Also the
    * corpus-health readout (a crawl whose N₁ share balloons is
    * boilerplate-fragmented; one that collapses is template-dominated).
    *
    * Scale shape: one uniform bigram-keyed aggregate (the only
    * corpus-sized exchange), a count-of-counts aggregate over the tiny
    * count domain, broadcast scalar composition — no sorts, no windows. */
  def t52CountOfCounts(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(tokens(col("text")).as("toks"))
    val bc = docs.select(explode(expr(
        """transform(sequence(1, greatest(size(toks) - 1, 0)),
          |  i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"""
          .stripMargin)).as("b"))
      .groupBy(col("b.w1"), col("b.w2")).agg(count(lit(1)).as("c"))
    val coc = bc.groupBy(col("c")).agg(count(lit(1)).as("n_types"))
    val sums = bc.agg(count(lit(1)).as("total_types"),
      sum(col("c")).as("total_tokens"))
    val disc = coc.agg(
        coalesce(sum(when(col("c") === 1, col("n_types"))), lit(0L))
          .as("n1"),
        coalesce(sum(when(col("c") === 2, col("n_types"))), lit(0L))
          .as("n2"))
      .withColumn("d_milli", expr(
        "CASE WHEN n1 + 2 * n2 = 0 THEN NULL" +
          " ELSE (1000 * n1) div (n1 + 2 * n2) END"))
      .select(col("d_milli"))
    coc.where(col("c") <= 10)
      .crossJoin(broadcast(sums))
      .crossJoin(broadcast(disc))
      .select(col("c"), col("n_types"), col("total_types"),
        col("total_tokens").cast("long").as("total_tokens"),
        col("d_milli"))
      .orderBy("c")
  }

  val t52Sql: String =
    """WITH t AS (
      |  SELECT string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |big AS (SELECT toks[CAST(i AS INT)] AS w1,
      |    toks[CAST(i + 1 AS INT)] AS w2
      |  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)),
      |bc AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2),
      |coc AS (SELECT c, COUNT(*) AS n_types FROM bc GROUP BY c),
      |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_types,
      |    CAST(SUM(c) AS BIGINT) AS total_tokens FROM bc),
      |d AS (SELECT CAST(CASE WHEN n1 + 2 * n2 = 0 THEN NULL
      |      ELSE (1000 * n1) // (n1 + 2 * n2) END AS BIGINT) AS d_milli
      |  FROM (SELECT
      |      COALESCE(SUM(CASE WHEN c = 1 THEN n_types END), 0) AS n1,
      |      COALESCE(SUM(CASE WHEN c = 2 THEN n_types END), 0) AS n2
      |    FROM coc))
      |SELECT CAST(coc.c AS BIGINT) AS c,
      |  CAST(n_types AS BIGINT) AS n_types, total_types, total_tokens,
      |  d_milli
      |FROM coc, sums, d WHERE coc.c <= 10 ORDER BY c""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_token_count" -> (t01TokenCount _),
    "t02_quality"     -> (t02Quality _),
    "t03_langid"      -> (t03LangId _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t05_fingerprint_gate" -> (t05FingerprintGate _),
    "t06_stratified_sample" -> (t06StratifiedSample _),
    "t07_curation_pipeline" -> (t07CurationPipeline _),
    "t08_decontam"    -> (t08Decontaminate _),
    "t09_token_budget" -> (t09TokenBudget _),
    "t10_pii_redact"  -> (t10PiiRedact _),
    "t11_repetition"  -> (t11Repetition _),
    "t12_keywords"    -> (t12Keywords _),
    "t13_corpus_stats" -> (t13CorpusStats _),
    "t14_seq_pack"    -> (t14SeqPack _),
    "t15_curation_v2" -> (t15CurationV2 _),
    "t16_pack_spans"  -> (t16PackSpans _),
    "t17_pack_shards" -> (t17PackShards _),
    "t18_dsir_gate"   -> (t18DsirGate _),
    "t19_dup_spans"   -> (t19DupSpans _),
    "t20_span_scrub"  -> (t20SpanScrub _),
    "t21_domain_mix"  -> (t21DomainMix _),
    "t22_vocab_stats" -> (t22VocabStats _),
    "t23_quality_classifier_gate" -> (t23QualityClassifierGate _),
    "t24_lm_score"    -> (t24LmScore _),
    "t25_bpe_gate"    -> (t25BpeGate _),
    "t26_hash_split"  -> (t26HashSplit _),
    "t27_cluster_safe_split" -> (t27ClusterSafeSplit _),
    "t28_categorical_encode" -> (t28CategoricalEncode _),
    "t29_snapshot_diff" -> (t29SnapshotDiff _),
    "t30_epoch_shuffle" -> (t30EpochShuffle _),
    "t31_gopher_rules" -> (t31GopherRules _),
    "t32_sliding_chunks" -> (t32SlidingChunks _),
    "t33_bm25"        -> (t33Bm25 _),
    "t34_mixture_materialize" -> (t34MixtureMaterialize _),
    "t35_fertility" -> (t35Fertility _),
    "t36_boilerplate_lines" -> (t36BoilerplateLines _),
    "t37_url_canonicalize" -> (t37UrlCanonicalize _),
    "t38_ccnet_buckets" -> (t38CcnetBuckets _),
    "t39_temperature_mix" -> (t39TemperatureMix _),
    "t40_fim_transform" -> (t40FimTransform _),
    "t41_chat_template" -> (t41ChatTemplate _),
    "t42_rouge_eval" -> (t42RougeEval _),
    "t43_span_corruption" -> (t43SpanCorruption _),
    "t44_pmi_pairs" -> (t44PmiPairs _),
    "t45_char_coverage" -> (t45CharCoverage _),
    "t46_mojibake_gate" -> (t46MojibakeGate _),
    "t47_langid_confusion" -> (t47LangIdConfusion _),
    "t48_source_diversity" -> (t48SourceDiversity _),
    "t49_data_card" -> (t49DataCard _),
    "t50_preference_pairs" -> (t50PreferencePairs _),
    "t51_priority_sample" -> (t51PrioritySample _),
    "t52_count_of_counts" -> (t52CountOfCounts _))

  val oracles: Map[String, String] = Map(
    "t01_token_count" -> t01Sql,
    "t02_quality"     -> t02Sql,
    "t03_langid"      -> t03Sql,
    "t05_fingerprint_gate" -> t05Sql,
    "t06_stratified_sample" -> t06Sql,
    "t07_curation_pipeline" -> t07Sql,
    "t08_decontam"    -> t08Sql,
    "t09_token_budget" -> t09Sql,
    "t10_pii_redact"  -> t10Sql,
    "t11_repetition"  -> t11Sql,
    "t12_keywords"    -> t12Sql,
    "t13_corpus_stats" -> t13Sql,
    "t14_seq_pack"    -> t14Sql,
    "t15_curation_v2" -> t15Sql,
    "t16_pack_spans"  -> t16Sql,
    "t17_pack_shards" -> t17Sql,
    "t18_dsir_gate"   -> t18Sql,
    "t19_dup_spans"   -> t19Sql,
    "t20_span_scrub"  -> t20Sql,
    "t21_domain_mix"  -> t21Sql,
    "t22_vocab_stats" -> t22Sql,
    "t23_quality_classifier_gate" -> t23Sql,
    "t24_lm_score"    -> t24Sql,
    "t25_bpe_gate"    -> t25Sql,
    "t26_hash_split"  -> t26Sql,
    "t27_cluster_safe_split" -> t27Sql,
    "t28_categorical_encode" -> t28Sql,
    "t29_snapshot_diff" -> t29Sql,
    "t30_epoch_shuffle" -> t30Sql,
    "t31_gopher_rules" -> t31Sql,
    "t32_sliding_chunks" -> t32Sql,
    "t33_bm25"        -> t33Sql,
    "t34_mixture_materialize" -> t34Sql,
    "t35_fertility" -> t35Sql,
    "t36_boilerplate_lines" -> t36Sql,
    "t37_url_canonicalize" -> t37Sql,
    "t38_ccnet_buckets" -> t38Sql,
    "t39_temperature_mix" -> t39Sql,
    "t40_fim_transform" -> t40Sql,
    "t41_chat_template" -> t41Sql,
    "t42_rouge_eval" -> t42Sql,
    "t43_span_corruption" -> t43Sql,
    "t44_pmi_pairs" -> t44Sql,
    "t45_char_coverage" -> t45Sql,
    "t46_mojibake_gate" -> t46Sql,
    "t47_langid_confusion" -> t47Sql,
    "t48_source_diversity" -> t48Sql,
    "t49_data_card" -> t49Sql,
    "t50_preference_pairs" -> t50Sql,
    "t51_priority_sample" -> t51Sql,
    "t52_count_of_counts" -> t52Sql)
}
