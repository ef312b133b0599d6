package graft.extract

import graft.core.{Sentence, Tags, Vocab}

/** Code-aware tokenizer: file content -> per-line token/tag sentences.
  *
  * Plays the role of the reference's subword/word/POS feature prep
  * (/root/reference/data_util.py:481-583) re-targeted at source code:
  * the "POS" column is a code-token tag (keyword / identifier / type /
  * punctuation / doc-comment word). Inverts [[graft.core.CorpusGen.render]]
  * exactly; robust on arbitrary text.
  */
object Tokenizer {

  import Tags._

  private val word = "[A-Za-z_][A-Za-z0-9_]*".r
  private val tokenPat =
    java.util.regex.Pattern.compile("[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^\\sA-Za-z0-9_]")
  private val wsPat = java.util.regex.Pattern.compile("\\s+")

  private val kw: Map[String, String] = Map(
    "def" -> KwDef, "import" -> KwImport, "package" -> KwPackage,
    "val" -> KwVal)

  private val punct: Map[String, String] = Map(
    "(" -> PLParen, ")" -> PRParen, ":" -> PColon, "." -> PDot,
    "=" -> PEq, "," -> PComma, "{" -> PLBrace, "}" -> PRBrace)

  def tagOf(tok: String): String =
    kw.getOrElse(tok,
      if (tok.head.isDigit) Num
      else if (tok.head.isLetter || tok.head == '_')
        (if (tok.head.isUpper) Typeish else Ident)
      else punct.getOrElse(tok, POther))

  /** Tokenize one line. Doc-comment lines (starting with a slash-star
    * doc opener or `#`, or inside an open doc block per `inDocBlock`)
    * are whitespace-split with DOC/DOCCAP tags; code lines use the
    * regex. A bare leading `*` is NOT a doc marker by itself — on
    * arbitrary text a `*args,` continuation or pointer line would
    * otherwise lose its identifiers and gain spurious doc_entity
    * mentions; only block state (tracked by [[sentences]]) makes `*`
    * lines doc. */
  def tokenizeLine(line: String,
      inDocBlock: Boolean = false): (Array[String], Array[String]) = {
    val t = line.trim
    if (t.isEmpty) (Array.empty, Array.empty)
    else if (inDocBlock || t.startsWith("/**") || t.startsWith("#")) {
      val toks = wsPat.split(t)
      val tags = toks.map { w =>
        if (w.head.isUpper && w.forall(c => c.isLetterOrDigit) &&
          !Vocab.docStopCaps.contains(w)) DocCap
        else Doc
      }
      (toks, tags)
    } else {
      val m = tokenPat.matcher(t)
      val buf = Array.newBuilder[String]
      while (m.find()) buf += m.group()
      val toks = buf.result()
      (toks, toks.map(tagOf))
    }
  }

  /** Max tokens per sentence — truncation budget, mirroring the
    * reference's truncate_length (data_util.py:242-289). */
  val maxSentLen = 64

  /** Content -> sentences. sentId = 0-based line index in the file
    * (blank lines keep their index but emit no sentence).
    *
    * ltokens/rtokens = the IMMEDIATELY adjacent line's tokens (empty if
    * that line is blank or absent) — the reference's left/right context
    * record fields (data_util.py:484-493), which its context-aware
    * encoder fuses into every sentence encoding
    * (text_encoder.py:316-390). Adjacency is by raw line index, so a
    * blank separator deterministically breaks context. */
  def sentences(docId: String, content: String): Seq[Sentence] = {
    // /** ... */ block state: a bare `*`/`*/` continuation line is doc
    // only while a /** block is open (single-line /** ... */ never
    // opens). Markers are scanned LEFT-TO-RIGHT so multiple markers per
    // line update state correctly (`x */ y /**` re-opens; a keyed
    // contains() test models only one marker per line and mis-tags
    // every following line on arbitrary source).
    var inDoc = false
    val lines = content.split("\n", -1).map { line =>
      val t = line.trim
      val isDoc = inDoc
      var i = 0
      while (i < t.length) {
        if (!inDoc && t.startsWith("/**", i)) { inDoc = true; i += 3 }
        else if (inDoc && t.startsWith("*/", i)) { inDoc = false; i += 2 }
        else i += 1
      }
      tokenizeLine(line, isDoc)
    }
    lines.iterator.zipWithIndex.flatMap { case ((toks, tags), i) =>
      if (toks.isEmpty) None
      else {
        val (lt, lg) =
          if (i > 0) lines(i - 1)
          else (Array.empty[String], Array.empty[String])
        val (rt, rg) =
          if (i < lines.length - 1) lines(i + 1)
          else (Array.empty[String], Array.empty[String])
        Some(Sentence(docId, i,
          toks.take(maxSentLen).toSeq, tags.take(maxSentLen).toSeq,
          lt.take(maxSentLen).toSeq, lg.take(maxSentLen).toSeq,
          rt.take(maxSentLen).toSeq, rg.take(maxSentLen).toSeq))
      }
    }.toSeq
  }

  /** Word-ish vocabulary check used in tests. */
  def isWord(tok: String): Boolean = word.matches(tok)
}
