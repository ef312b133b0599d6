package graft.core

/** Core data model for the KG-construction engine.
  *
  * Mirrors the reference's record shapes (see SURVEY.md §1; reference
  * /root/reference/data_util.py:481-583 for the sentence record and
  * /root/reference/evaluation.py:69-103 for the strict-match mention
  * tuple) re-expressed as typed Spark Datasets over the source-code
  * input table (BASELINE.json input_hint).
  */

/** Input table row — exactly the input_hint shape. */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** SourceFile plus the per-row content invariant (sha256 hex). */
final case class SourceFileHashed(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    sha256: String)

/** One tokenized sentence (one logical code line).
  * Analog of the reference JSON record (data_util.py:481-494), INCLUDING
  * the left/right context sentences: the reference fuses ltokens/rtokens
  * into every encoding (text_encoder.py:316-390, loaded
  * data_util.py:484-493); here they are the adjacent non-blank lines
  * (empty seq = no adjacent line, the reference's None). */
final case class Sentence(
    docId: String,     // repo/path
    sentId: Int,       // line index within the file
    tokens: Seq[String],
    pos: Seq[String],  // code-aware tag per token (KW_DEF, IDENT, ...)
    ltokens: Seq[String] = Seq.empty,  // previous adjacent line
    lpos: Seq[String] = Seq.empty,
    rtokens: Seq[String] = Seq.empty,  // next adjacent line
    rpos: Seq[String] = Seq.empty)

/** Extracted typed mention. `end` EXCLUSIVE. `nextTok` is the token
  * right after the span ("" at line end) — a token-local feature
  * computed for free at extract time so downstream triple rules
  * (call-site detection) need no join back to the sentence table. */
final case class Mention(
    docId: String,
    sentId: Int,
    start: Int,
    end: Int,
    entType: String,
    score: Double,
    surface: String,
    nextTok: String)

/** Mention linked to a candidate canonical entity. */
final case class LinkedMention(
    docId: String,
    sentId: Int,
    start: Int,
    end: Int,
    entType: String,
    surface: String,
    entity: String,     // linked entity key (pre-canonicalization)
    linkScore: Double,
    nextTok: String)

/** Final KG triple. */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    docId: String,
    score: Double)

/** Manifest (lineage/checkpoint) row — generalizes the reference's
  * metric_log existence gate (main.py:44-46) to partition granularity. */
final case class ManifestRow(
    stage: String,
    snapshotId: String,
    bucket: Int,
    rowCount: Long,
    sha256Agg: String,
    metricsJson: String,
    committedAt: Long)

/** THE docId scheme: `repo/path`. One definition shared by extraction,
  * the sequential twin, streaming, resumable bucketing, the corpus
  * generator, and the incremental splice — independent re-spellings of
  * the format would let a drift silently break every docId equi-join
  * (stale triples kept alongside their re-extraction). */
object DocId {
  def of(repo: String, path: String): String = s"$repo/$path"
  /** Column form over a table with (repo, path). */
  def column: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    concat(col("repo"), lit("/"), col("path"))
  }
}

object TypeDict {
  /** Fixed-order entity type dictionary (ours), mirroring the
    * per-dataset hardcoded lists in reference data_util.py:93-100.
    * Round-3 additions, both decision-bearing for the sequence/context
    * channels:
    *  - `param_decl`: an `ident : Type` pair INSIDE a def signature —
    *    the same local token pattern occurs in type-ascribed call
    *    arguments, so the decision needs the far-away `def` keyword
    *    via the whole-line forward recurrence (K4);
    *  - `documented_fn`: a `def name` whose directly-preceding line is
    *    a doc comment CONTAINING an entity — the entity sits mid-line,
    *    so the decision needs the pooled previous-line context
    *    (K5 full), not just its endpoint token. */
  val types: Vector[String] = Vector(
    "identifier", "function", "type_ref", "api_symbol", "doc_entity",
    "signature", "annotation", "param_decl", "documented_fn")
  val typeToId: Map[String, Int] = types.zipWithIndex.toMap
  val numTypes: Int = types.size
  /** NA / non-entity class id (reference uses num_types as NA,
    * data_util.py:325-333). */
  val naId: Int = numTypes

  /** Triple predicates (BASELINE.json north_star). */
  val predicates: Vector[String] = Vector(
    "defines_symbol", "imports", "calls", "has_type", "documented_as")
}

/** POS-like code tags emitted by the tokenizer. */
object Tags {
  val KwDef = "KW_DEF"
  val KwImport = "KW_IMPORT"
  val KwPackage = "KW_PKG"
  val KwVal = "KW_VAL"
  val Ident = "IDENT"       // lowercase-initial identifier
  val Typeish = "TYPEISH"   // capitalized identifier
  val Num = "NUM"
  val Doc = "DOC"           // word inside a doc comment
  val DocCap = "DOCCAP"     // Capitalized word inside a doc comment
  val PLParen = "P_LP"
  val PRParen = "P_RP"
  val PColon = "P_COLON"
  val PDot = "P_DOT"
  val PEq = "P_EQ"
  val PComma = "P_COMMA"
  val PLBrace = "P_LB"
  val PRBrace = "P_RB"
  val POther = "P_OTHER"
  val all: Vector[String] = Vector(
    KwDef, KwImport, KwPackage, KwVal, Ident, Typeish, Num, Doc, DocCap,
    PLParen, PRParen, PColon, PDot, PEq, PComma, PLBrace, PRBrace, POther)
}
