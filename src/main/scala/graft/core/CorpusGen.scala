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
  final case class Generated(source: SourceFileHashed,
      mentions: Vector[GoldMention], triples: Vector[GoldTriple])

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
    var sentId = 0
    def emit(toks: Seq[String]): Int = {
      val id = sentId
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
      val toks = Vector("import", lib, ".", mod, ".", sym)
      val id = emit(toks)
      mentions += GoldMention(docId, id, 1, 6, "api_symbol",
        toks.slice(1, 6).mkString(" "))
      triples += GoldTriple(docId, "imports", canon(sym), docId)
    }
    emit(Vector()) // blank separator line

    val nFun = 1 + rng.nextInt(4)
    var prevFns = Vector.empty[String]
    (0 until nFun).foreach { _ =>
      // --- doc comment line ---
      val ent = Vocab.docEntities(rng.nextInt(Vocab.docEntities.size))
      val verb = Vocab.verbs(rng.nextInt(Vocab.verbs.size))
      val noun = Vocab.nouns(rng.nextInt(Vocab.nouns.size))
      val docToks =
        if (lang == "python") Vector("#", "Uses", ent, "to", verb, noun)
        else Vector("/**", "Uses", ent, "to", verb, noun, "*/")
      val docLine = emit(docToks)
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

      // --- def line ---
      val fname = Vocab.idents(rng.nextInt(Vocab.idents.size))
      var param = Vocab.idents(rng.nextInt(Vocab.idents.size))
      if (param == fname) param = Vocab.idents(
        (Vocab.idents.indexOf(param) + 1) % Vocab.idents.size)
      val ptype = Vocab.types(rng.nextInt(Vocab.types.size))
      val rtype = Vocab.types(rng.nextInt(Vocab.types.size))
      val defToks = Vector("def", fname, "(", param, ":", ptype, ")",
        ":", rtype) ++
        (if (lang == "python") Vector(":") else Vector("=", "{"))
      val defLine = emit(defToks)
      mentions += GoldMention(docId, defLine, 1, 2, "function", fname)
      mentions += GoldMention(docId, defLine, 1, 9, "signature",
        defToks.slice(1, 9).mkString(" "))
      mentions += GoldMention(docId, defLine, 3, 4, "identifier", param)
      mentions += GoldMention(docId, defLine, 5, 6, "type_ref", ptype)
      mentions += GoldMention(docId, defLine, 8, 9, "type_ref", rtype)
      triples += GoldTriple(docId, "defines_symbol", canon(fname), docId)
      triples += GoldTriple(canon(param), "has_type", canon(ptype), docId)
      triples += GoldTriple(canon(fname), "documented_as", canon(ent), docId)
      if (hasAnn)
        triples += GoldTriple(canon(fname), "documented_as", canon(annName),
          docId)

      // --- body lines: val v = callee(arg) ---
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
        val bodyToks = Vector("val", v, "=", surface, "(", param, ")")
        val bodyLine = emit(bodyToks)
        mentions += GoldMention(docId, bodyLine, 1, 2, "identifier", v)
        mentions += GoldMention(docId, bodyLine, 3, 4, "identifier", surface)
        mentions += GoldMention(docId, bodyLine, 5, 6, "identifier", param)
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
      triples.result().distinct)
  }
}
