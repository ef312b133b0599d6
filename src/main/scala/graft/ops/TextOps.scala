package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  * All pure column expressions (codegen'd, no UDFs) — each scales as a
  * narrow map over the documents table.
  *
  * Determinism: every float emitted is a single division of integer
  * counts (bit-identical across engines — the DuckDB oracles replicate
  * the same arithmetic).
  */
object TextOps {

  /** Portable 60-bit hash: first 15 hex chars of md5, parsed base-16.
    * Identical in Spark (`conv`) and DuckDB (`('0x'||…)::BIGINT`). */
  def md5h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def words(text: Column): Column = split(text, " ")

  /** Whitespace chars spelled explicitly, shared by every regex here
    * AND interpolated into the DuckDB oracles: Java-regex \s includes
    * \x0B, RE2's \s does not, so the shorthand silently diverges
    * between engine and oracle on a vertical tab. */
  val wsChars = " \\t\\n\\x0B\\f\\r"
  val wsClass = s"[$wsChars]"

  /** Whitespace token count + BPE-ish subtoken count (letters runs,
    * digit runs, single punctuation — a regex proxy for byte-pair
    * pieces). */
  def tokenCounts(text: Column): (Column, Column) = (
    size(words(text)),
    size(regexp_extract_all(text,
      lit(s"[A-Za-z]+|[0-9]+|[^A-Za-z0-9$wsChars]"), lit(0))))

  /** Quality features: counts are exact ints; ratios single divisions. */
  def qualityCols(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    val nTok = size(ws)
    val nChar = length(text)
    val nPunct =
      size(regexp_extract_all(text, lit(s"[^A-Za-z0-9$wsChars]"), lit(0)))
    val nDigit = size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
    val nStop = size(filter(ws, w => w.isin(stopEn: _*)))
    Seq(
      "n_tokens" -> nTok,
      "n_chars" -> nChar,
      "punct_ratio" -> nPunct.cast("double") / greatest(nChar, lit(1)).cast("double"),
      "digit_ratio" -> nDigit.cast("double") / greatest(nChar, lit(1)).cast("double"),
      "stopword_ratio" -> nStop.cast("double") / greatest(nTok, lit(1)).cast("double"),
      "mean_word_len" -> (nChar - nTok + 1).cast("double") / greatest(nTok, lit(1)).cast("double"))
  }

  val stopEn = Seq("the", "of", "and", "to", "in", "is", "was", "for", "on", "as")
  val stopDe = Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein")
  val stopEs = Seq("el", "la", "que", "y", "en", "un", "es", "se", "no", "los")
  val stopFr = Seq("le", "la", "et", "un", "pour", "dans", "ce", "une", "les", "des")
  val langSets: Seq[(String, Seq[String])] =
    Seq("de" -> stopDe, "en" -> stopEn, "es" -> stopEs, "fr" -> stopFr)

  /** Language-ID heuristic: per-language stopword hit counts (non-
    * distinct), argmax with deterministic tie-break (lexicographic
    * language code); 'und' when no hits. */
  def langIdCols(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    def hits(set: Seq[String]): Column =
      size(filter(ws, w => w.isin(set: _*)))
    val hitCols = langSets.map { case (l, set) => l -> hits(set) }
    // argmax via greatest + case cascade in lexicographic order
    val best = greatest(hitCols.map(_._2): _*)
    val pred = when(best === 0, lit("und")).otherwise(
      hitCols.foldRight(lit("und")) { case ((l, h), acc) =>
        when(h === best, lit(l)).otherwise(acc)
      })
    // foldRight + overwrite order: first (lexicographically smallest)
    // language wins ties because its `when` is outermost.
    hitCols.map { case (l, h) => s"hits_$l" -> h } :+ ("lang_pred" -> pred)
  }

  /** Document fingerprint: md5 of the normalized text (lowercased,
    * non-alphanumerics stripped) — exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** The reference alignment pipeline's exact `clean` chain
    * (/root/reference/preprocess/align_input.py:7-11): ORDERED literal
    * replacements — PTB bracket tokens before the bare '{'/'-' removals
    * that would otherwise corrupt them, entity escapes longest-first,
    * single chars last. Each step is a literal (non-regex) `replace`,
    * so the whole chain stays one codegen'd narrow map at any scale.
    * The DuckDB oracle is generated from this same list, and
    * TextOpsSpec pins a reference-computed expected string so the
    * ordering semantics can't silently drift. */
  val cleanChain: Seq[(String, String)] = Seq(
    "-LCB-" -> "", "-RCB-" -> "", "{" -> "", "}" -> "",
    "-LRB-" -> "(", "-RRB-" -> ")", "." -> "", "`" -> "", "'" -> "",
    "\"" -> "", "-LSB-" -> "[", "-RSB-" -> "]", "<UNK>" -> "",
    "&amp;T" -> "", "&amp;M" -> "", "&amp;A" -> "", "&amp;" -> "",
    "&AMP;" -> "", "\t" -> "", "\n" -> "", "&" -> "", "-" -> "",
    "M" -> "", "A" -> "")

  def ptbClean(text: Column): Column =
    cleanChain.foldLeft(text) { case (c, (f, t)) =>
      replace(c, lit(f), lit(t)) }

  /** `remove_space` (align_input.py:13-15, string form): drop ALL
    * whitespace ([[wsClass]] — see its note on Java-vs-RE2 \s), then
    * clean. (Python's str.split also strips Unicode whitespace; this
    * chain matches the reference on ASCII text, which is what the
    * corpus and documents tables are.) */
  def removeSpace(text: Column): Column =
    ptbClean(regexp_replace(text, wsClass, ""))

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the classic
    * rolling-hash document fingerprint): hash every char k-gram, then
    * keep the MINIMUM hash of every sliding window of `win` k-grams;
    * the distinct selected hashes are the document's fingerprint set.
    * Guarantees any shared substring of length >= k + win - 1 yields a
    * shared fingerprint. Computed entirely NARROW: the whole hash +
    * sliding-min + distinct chain runs in one native codegen
    * expression per row (`graft.functions.WinnowFps`) and the result
    * array explodes — zero shuffle (rounds 1-3 shuffled every k-gram
    * hash into a per-doc window and a global distinct; fingerprints
    * are per-doc facts, so no cross-row data movement is ever
    * needed). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, win: Int = 4): DataFrame = {
    graft.functions.SigFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc"),
      explode(expr(s"winnow_fps(`$textCol`, $k, $win)")).as("fp"))
  }

  /** Word n-gram set (distinct, first-occurrence order), the dedup
    * shingle unit — HOF reference formulation. Production operators use
    * the value-identical native kernel (`ngram_shingles`,
    * functions/HashSigs.scala) instead: `transform` is CodegenFallback
    * in Spark, so this form pays an interpreted lambda dispatch per
    * n-gram. Kept as the independent parity oracle (OpsSpec compares
    * the two element-wise). */
  def ngrams(text: Column, n: Int): Column = {
    val t = words(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }
}
