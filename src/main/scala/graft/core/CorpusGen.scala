package graft.core

import java.security.MessageDigest
import scala.util.Random

/** Deterministic synthetic source-code corpus (FIXTURES.md §1).
  *
  * One pure function per fileId: content, gold mentions, and gold
  * triples are generated together from the same seeded draw, so the
  * expected output of the whole KG pipeline is known in closed form.
  * Rendering (tokens -> text) is inverted exactly by
  * [[graft.extract.Tokenizer]]; a unit test asserts the round trip.
  *
  * The grammar mirrors the reference's record/gold shape (nested spans:
  * `signature` strictly contains `function`, `identifier`, `type_ref` —
  * the reference supports nesting because each span cell is classified
  * independently, /root/reference/data_util.py:323-333).
  */
object CorpusGen {

  import Tags._

  final case class GoldMention(docId: String, sentId: Int, start: Int,
      end: Int, entType: String, surface: String)
  final case class GoldTriple(subj: String, pred: String, obj: String,
      docId: String)
  /** Closed-form sentence length (token count of the PRE-render token
    * vector — the tokenizer inverts render, so this equals the engine
    * tokenizer's count; the round-trip test pins the inversion). Lets
    * the neg_sample oracle enumerate the span universe without
    * re-implementing code-aware tokenization in SQL. Every grammar
    * line is far below maxSentLen=64, so no truncation cap applies. */
  final case class GoldSentence(docId: String, sentId: Int, n: Int)
  final case class Generated(source: SourceFileHashed,
      mentions: Vector[GoldMention], triples: Vector[GoldTriple],
      sents: Vector[GoldSentence])

  private val langs = Vector("scala", "java", "python")
  private val exts = Map("scala" -> "scala", "java" -> "java",
    "python" -> "py")

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Render one token line to source text: no space before `.`/`,`/`:`/
    * `(`/`)`; no space after `.`/`(`. The tokenizer inverts this. */
  def render(toks: Seq[String]): String = {
    val sb = new StringBuilder
    var prev = ""
    toks.foreach { t =>
      val noSpaceBefore = Set(".", ",", ":", "(", ")").contains(t)
      val noSpaceAfter = Set(".", "(").contains(prev)
      if (sb.nonEmpty && !noSpaceBefore && !noSpaceAfter) sb += ' '
      sb ++= t
      prev = t
    }
    sb.toString
  }

  /** Number of repos; repo000 is hot (~30% of files) to exercise
    * skew handling (salting / AQE) in the extract stage. */
  val nRepos = 20

  def repoOf(fileId: Long): String = {
    if (fileId % 10 < 3) "repo000"
    else {
      // .abs is identity-negative for Int.MinValue (would format a
      // malformed "repo0-2"); mask keeps every other input bit-identical
      val h = scala.util.hashing.MurmurHash3.stringHash(fileId.toString)
      val a = if (h == Int.MinValue) 0 else h.abs
      "repo%03d".format(1 + a % (nRepos - 1))
    }
  }

  /** Generate one file: content + gold. Pure, seeded by fileId only. */
  def file(fileId: Long): Generated = {
    val rng = new Random(fileId * 1000003L + 42L)
    val lang = langs((fileId % 3).toInt)
    val repo = repoOf(fileId)
    val pkg = s"pkg${fileId % 7}"
    val path = s"src/$pkg/File$fileId.${exts(lang)}"
    val docId = DocId.of(repo, path)
    def canon(e: String): String = Vocab.canonicalOf.getOrElse(e, e)

    val lines = Vector.newBuilder[String]
    val mentions = Vector.newBuilder[GoldMention]
    val triples = Vector.newBuilder[GoldTriple]
    val sents = Vector.newBuilder[GoldSentence]
    var sentId = 0
    def emit(toks: Seq[String]): Int = {
      val id = sentId
      // blank separator lines keep their index but emit no sentence —
      // mirrors Tokenizer.sentences exactly
      if (toks.nonEmpty) sents += GoldSentence(docId, id, toks.length)
      lines += render(toks); sentId += 1; id
    }

    if (lang != "python") {
      emit(Vector("package", pkg) ++
        (if (lang == "java") Vector(";") else Vector()))
    }

    val nImp = 1 + rng.nextInt(3)
    (0 until nImp).foreach { _ =>
      val lib = Vocab.libs(rng.nextInt(Vocab.libs.size))
      val mod = Vocab.mods(rng.nextInt(Vocab.mods.size))
      val sym = Vocab.types(rng.nextInt(Vocab.types.size))
      // ~25% SHORT imports (`import lib . mod`, no symbol): the K4
      // backward-recurrence negative — locally a short import's tail
      // (`mod`, next = line end) looks exactly like a full import's
      // tail (`Sym`, next = line end); only the decayed count of dots
      // to the RIGHT of the head (bwd slot) separates them. Short
      // imports emit NO api_symbol mention and NO imports triple.
      val full = rng.nextInt(4) > 0
      if (full) {
        val toks = Vector("import", lib, ".", mod, ".", sym)
        val id = emit(toks)
        mentions += GoldMention(docId, id, 1, 6, "api_symbol",
          toks.slice(1, 6).mkString(" "))
        triples += GoldTriple(docId, "imports", canon(sym), docId)
      } else emit(Vector("import", lib, ".", mod))
    }
    emit(Vector()) // blank separator line

    val nFun = 1 + rng.nextInt(4)
    var prevFns = Vector.empty[String]
    (0 until nFun).foreach { _ =>
      // --- doc comment line: ~70% carry an entity, ~30% are PLAIN
      // (lowercase filler, no DOCCAP token). Plain doc lines emit no
      // doc_entity mention and no documented_as triple — and the def
      // below them gets no documented_fn mention (the K5-full
      // negative: both variants have identical ENDPOINT tokens, only
      // the pooled mid-line content separates them). ---
      val ent = Vocab.docEntities(rng.nextInt(Vocab.docEntities.size))
      val verb = Vocab.verbs(rng.nextInt(Vocab.verbs.size))
      val noun = Vocab.nouns(rng.nextInt(Vocab.nouns.size))
      val hasEnt = rng.nextInt(10) < 7
      val docToks =
        if (lang == "python")
          (if (hasEnt) Vector("#", "Uses", ent, "to", verb, noun)
           else Vector("#", "uses", "it", "to", verb, noun))
        else
          (if (hasEnt) Vector("/**", "Uses", ent, "to", verb, noun, "*/")
           else Vector("/**", "uses", "it", "to", verb, noun, "*/"))
      val docLine = emit(docToks)
      if (hasEnt)
        mentions += GoldMention(docId, docLine, 2, 3, "doc_entity", ent)

      // --- annotation / decorator line (~40% of functions) ---
      // Sits DIRECTLY above the def: the mention is only extractable
      // with cross-line context (the next line must start with `def`),
      // exercising the reference's context-aware encode (K5,
      // /root/reference/model/text_encoder.py:316-390).
      val hasAnn = rng.nextInt(10) < 4
      val annName =
        if (hasAnn) Vocab.annots(rng.nextInt(Vocab.annots.size)) else ""
      if (hasAnn) {
        val annLine = emit(Vector("@", annName))
        mentions += GoldMention(docId, annLine, 1, 2, "annotation", annName)
      }

      // --- def line, ~50% with a SECOND parameter pair. Each
      // `param : Type` pair is a param_decl mention (K4: the decision
      // needs the far-left def keyword through the forward recurrence —
      // the identical local pattern inside an ascribed CALL below must
      // not fire). has_type triples are anchored on param_decl. ---
      val fname = Vocab.idents(rng.nextInt(Vocab.idents.size))
      var param = Vocab.idents(rng.nextInt(Vocab.idents.size))
      if (param == fname) param = Vocab.idents(
        (Vocab.idents.indexOf(param) + 1) % Vocab.idents.size)
      val ptype = Vocab.types(rng.nextInt(Vocab.types.size))
      val rtype = Vocab.types(rng.nextInt(Vocab.types.size))
      val hasP2 = rng.nextInt(2) == 0
      var param2 = Vocab.idents(rng.nextInt(Vocab.idents.size))
      if (param2 == fname) param2 = Vocab.idents(
        (Vocab.idents.indexOf(param2) + 1) % Vocab.idents.size)
      val ptype2 = Vocab.types(rng.nextInt(Vocab.types.size))
      val sigEnd = if (hasP2) 13 else 9  // exclusive end of the signature
      val defToks = Vector("def", fname, "(", param, ":", ptype) ++
        (if (hasP2) Vector(",", param2, ":", ptype2) else Vector()) ++
        Vector(")", ":", rtype) ++
        (if (lang == "python") Vector(":") else Vector("=", "{"))
      val defLine = emit(defToks)
      mentions += GoldMention(docId, defLine, 1, 2, "function", fname)
      mentions += GoldMention(docId, defLine, 1, sigEnd, "signature",
        defToks.slice(1, sigEnd).mkString(" "))
      mentions += GoldMention(docId, defLine, 3, 4, "identifier", param)
      mentions += GoldMention(docId, defLine, 5, 6, "type_ref", ptype)
      mentions += GoldMention(docId, defLine, 3, 6, "param_decl",
        s"$param : $ptype")
      if (hasP2) {
        mentions += GoldMention(docId, defLine, 7, 8, "identifier", param2)
        mentions += GoldMention(docId, defLine, 9, 10, "type_ref", ptype2)
        mentions += GoldMention(docId, defLine, 7, 10, "param_decl",
          s"$param2 : $ptype2")
      }
      mentions += GoldMention(docId, defLine, sigEnd - 1, sigEnd,
        "type_ref", rtype)
      // documented_fn (K5 full): only when the DIRECTLY preceding line
      // is an entity-carrying doc comment (an annotation line in
      // between hides it)
      if (hasEnt && !hasAnn)
        mentions += GoldMention(docId, defLine, 0, 2, "documented_fn",
          s"def $fname")
      triples += GoldTriple(docId, "defines_symbol", canon(fname), docId)
      triples += GoldTriple(canon(param), "has_type", canon(ptype), docId)
      if (hasP2)
        triples += GoldTriple(canon(param2), "has_type", canon(ptype2), docId)
      if (hasEnt)
        triples += GoldTriple(canon(fname), "documented_as", canon(ent), docId)
      if (hasAnn)
        triples += GoldTriple(canon(fname), "documented_as", canon(annName),
          docId)

      // --- body lines: val v = callee(arg), ~30% with TYPE-ASCRIBED
      // arguments — the K4 negative: `( a : T , b : U )` is locally
      // indistinguishable from a def's parameter list, but there is no
      // def keyword to the left, so NO param_decl and NO has_type. ---
      val nBody = rng.nextInt(3)
      (0 until nBody).foreach { _ =>
        val v = Vocab.idents(rng.nextInt(Vocab.idents.size))
        val target =
          if (prevFns.nonEmpty && rng.nextBoolean()) prevFns(rng.nextInt(prevFns.size))
          else Vocab.idents(rng.nextInt(Vocab.idents.size))
        // 30% of call sites use the snake_case alias of the target —
        // exercises the linking stage's alias-dictionary join.
        val surface =
          if (rng.nextInt(10) < 3) Vocab.snake(target) else target
        val ascribed = rng.nextInt(10) < 3
        if (ascribed) {
          val a2 = Vocab.idents(rng.nextInt(Vocab.idents.size))
          val t2 = Vocab.types(rng.nextInt(Vocab.types.size))
          val b2 = Vocab.idents(rng.nextInt(Vocab.idents.size))
          val u2 = Vocab.types(rng.nextInt(Vocab.types.size))
          val bodyToks = Vector("val", v, "=", surface, "(",
            a2, ":", t2, ",", b2, ":", u2, ")")
          val bodyLine = emit(bodyToks)
          mentions += GoldMention(docId, bodyLine, 1, 2, "identifier", v)
          mentions += GoldMention(docId, bodyLine, 3, 4, "identifier", surface)
          mentions += GoldMention(docId, bodyLine, 5, 6, "identifier", a2)
          mentions += GoldMention(docId, bodyLine, 7, 8, "type_ref", t2)
          mentions += GoldMention(docId, bodyLine, 9, 10, "identifier", b2)
          mentions += GoldMention(docId, bodyLine, 11, 12, "type_ref", u2)
        } else {
          val bodyToks = Vector("val", v, "=", surface, "(", param, ")")
          val bodyLine = emit(bodyToks)
          mentions += GoldMention(docId, bodyLine, 1, 2, "identifier", v)
          mentions += GoldMention(docId, bodyLine, 3, 4, "identifier", surface)
          mentions += GoldMention(docId, bodyLine, 5, 6, "identifier", param)
        }
        triples += GoldTriple(canon(fname), "calls", canon(target), docId)
      }
      if (lang != "python") emit(Vector("}"))
      prevFns = prevFns :+ fname
    }

    val content = lines.result().mkString("\n")
    val commit = sha256Hex(s"$repo/$path").take(12)
    Generated(
      SourceFileHashed(repo, path, commit, lang, content,
        sha256Hex(content)),
      mentions.result(),
      triples.result().distinct,
      sents.result())
  }
}
