package graft

import graft.core._
import graft.extract.{ReferenceScorer, Tokenizer}
import graft.kernel.{TriaffineScorer, Weights}
import org.scalatest.funsuite.AnyFunSuite

/** Pure (no-Spark) tests: generator/tokenizer round trip, kernel rule
  * exactness vs closed-form gold, determinism. */
class CorpusKernelSpec extends AnyFunSuite {

  val N = 120 // tiny corpus (FIXTURES.md scales)

  test("bare * lines are doc only inside an open /** block") {
    val content = Seq(
      "def f(*args, other):",   // code despite token starting with *
      "/**",
      "* Uses ParseTree here",  // doc: block is open
      "*/",                     // doc: closes the block
      "x = y * z"               // code again
    ).mkString("\n")
    val s = Tokenizer.sentences("d", content).map(x => x.sentId -> x).toMap
    assert(!s(0).pos.contains(Tags.Doc) && s(0).tokens.contains("args"))
    assert(s(2).pos.forall(t => t == Tags.Doc || t == Tags.DocCap))
    assert(s(2).pos.contains(Tags.DocCap)) // ParseTree
    assert(s(3).pos.forall(t => t == Tags.Doc || t == Tags.DocCap))
    assert(!s(4).pos.contains(Tags.Doc))
    // single-line /** ... */ does NOT open a block
    val t = Tokenizer.sentences("d", "/** Uses Foo */\nx = y * z")
      .map(x => x.sentId -> x).toMap
    assert(!t(1).pos.contains(Tags.Doc))
  }

  test("doc-block markers are scanned left-to-right within a line") {
    // inline opener mid-line opens the block for FOLLOWING lines
    val a = Tokenizer.sentences("d", Seq(
      "val x = 1 /** note",
      "still doc here",
      "*/",
      "val y = 2").mkString("\n")).map(x => x.sentId -> x).toMap
    assert(a(1).pos.forall(t => t == Tags.Doc || t == Tags.DocCap),
      s"line after inline /** must be doc: ${a(1).pos}")
    assert(!a(3).pos.contains(Tags.Doc))
    // close-then-reopen on ONE line leaves the block OPEN (the round-2
    // contains() state machine modeled one marker per line and closed)
    val b = Tokenizer.sentences("d", Seq(
      "/**",
      "*/ gap /**",
      "inside again",
      "*/",
      "val z = 3").mkString("\n")).map(x => x.sentId -> x).toMap
    assert(b(2).pos.forall(t => t == Tags.Doc || t == Tags.DocCap),
      s"*/ ... /** must reopen: ${b(2).pos}")
    assert(!b(4).pos.contains(Tags.Doc))
  }

  test("generator is deterministic") {
    val a = CorpusGen.file(17L)
    val b = CorpusGen.file(17L)
    assert(a == b)
    assert(a.source.sha256 == CorpusGen.sha256Hex(a.source.content))
  }

  test("tokenizer inverts the generator rendering (round trip)") {
    (0 until N).foreach { id =>
      val g = CorpusGen.file(id.toLong)
      val docId = s"${g.source.repo}/${g.source.path}"
      val sents = Tokenizer.sentences(docId, g.source.content)
      // every gold mention's span indices must address real tokens with
      // the expected surface
      val byId = sents.map(s => s.sentId -> s).toMap
      g.mentions.foreach { m =>
        val s = byId(m.sentId)
        val surf = s.tokens.slice(m.start, m.end).mkString(" ")
        assert(surf == m.surface,
          s"file=$id sent=${m.sentId} ${m.entType}: got '$surf' want '${m.surface}'\n" +
            s"tokens=${s.tokens.mkString("|")}")
      }
    }
  }

  test("kernel mentions == closed-form gold mentions (P=R=1.0)") {
    val w = Weights.default
    var pred = Set.empty[(String, Int, Int, Int, String)]
    var gold = Set.empty[(String, Int, Int, Int, String)]
    (0 until N).foreach { id =>
      val g = CorpusGen.file(id.toLong)
      val docId = s"${g.source.repo}/${g.source.path}"
      Tokenizer.sentences(docId, g.source.content).foreach { s =>
        TriaffineScorer.mentions(s, w).foreach { m =>
          pred += ((m.docId, m.sentId, m.start, m.end, m.entType))
        }
      }
      g.mentions.foreach { m =>
        gold += ((m.docId, m.sentId, m.start, m.end, m.entType))
      }
    }
    val falsePos = pred -- gold
    val falseNeg = gold -- pred
    assert(falsePos.isEmpty, s"false positives (${falsePos.size}): ${falsePos.take(5)}")
    assert(falseNeg.isEmpty, s"false negatives (${falseNeg.size}): ${falseNeg.take(5)}")
  }

  test("nested spans coexist (signature strictly contains function)") {
    val g = CorpusGen.file(3L)
    val docId = s"${g.source.repo}/${g.source.path}"
    val w = Weights.default
    val ms = Tokenizer.sentences(docId, g.source.content)
      .flatMap(s => TriaffineScorer.mentions(s, w))
    val sigs = ms.filter(_.entType == "signature")
    assert(sigs.nonEmpty)
    sigs.foreach { sig =>
      val inner = ms.filter(m => m.sentId == sig.sentId &&
        m.start >= sig.start && m.end <= sig.end && m != sig)
      assert(inner.exists(_.entType == "function"))
      assert(inner.exists(_.entType == "type_ref"))
    }
  }

  test("ReferenceScorer twin is deterministic and non-empty") {
    val a = ReferenceScorer.mentions(0 until 20)
    val b = ReferenceScorer.mentions(0 until 20)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("annotation mentions REQUIRE cross-line context (K5)") {
    val w = Weights.default
    // find a generated file with an annotation line
    val g = (0 until 50).map(i => CorpusGen.file(i.toLong))
      .find(_.mentions.exists(_.entType == "annotation")).get
    val docId = s"${g.source.repo}/${g.source.path}"
    val sents = Tokenizer.sentences(docId, g.source.content)
    val annGold = g.mentions.filter(_.entType == "annotation")
    assert(annGold.nonEmpty)
    annGold.foreach { am =>
      val s = sents.find(_.sentId == am.sentId).get
      // next line must be the def line — context present
      assert(s.rpos.headOption.contains(Tags.KwDef))
      // WITH context: annotation extracted
      val withCtx = TriaffineScorer.mentions(s, w)
      assert(withCtx.exists(m => m.entType == "annotation" &&
        m.start == am.start && m.end == am.end))
      // WITHOUT context (line-local scoring): invisible — this is what
      // makes the context channel decision-bearing, not decorative
      val noCtx = TriaffineScorer.scoreSentence(
        s.tokens.toIndexedSeq, s.pos.toIndexedSeq, w)
      assert(!noCtx.exists(sp => TypeDict.types(sp.typeId) == "annotation"),
        s"annotation extracted line-locally: $noCtx")
    }
  }

  private def score(line: String, w: Weights) = {
    val (toks, tags) = Tokenizer.tokenizeLine(line)
    TriaffineScorer.scoreSentence(toks.toIndexedSeq, tags.toIndexedSeq, w)
      .map(sp => (sp.start, sp.endExcl, TypeDict.types(sp.typeId)))
  }

  test("param_decl REQUIRES the whole-line forward recurrence (K4)") {
    val w = Weights.default
    // identical LOCAL pattern `( a : T , b : U )` — every ±1 window
    // around both pairs matches between the two lines; only the def
    // keyword 4-7 tokens to the LEFT (outside every window/endpoint
    // channel) separates a parameter DECLARATION from a type-ascribed
    // call argument. The fwd recurrence state is the only channel that
    // carries it.
    val defLine = score("def f(a: Row, b: Plan): Txn = {", w)
    val callLine = score("val r = probe(a: Row, b: Plan)", w)
    assert(defLine.contains((3, 6, "param_decl")), s"def: $defLine")
    assert(defLine.contains((7, 10, "param_decl")), s"def: $defLine")
    assert(!callLine.exists(_._3 == "param_decl"), s"call: $callLine")
    // and no has_type-feeding identifier x type_ref pattern leaks: the
    // ascribed call still has its identifier/type_ref mentions
    assert(callLine.contains((5, 6, "identifier")))
    assert(callLine.contains((7, 8, "type_ref")))
  }

  test("api_symbol REQUIRES the backward recurrence (K4 bwd): short imports rejected") {
    val w = Weights.default
    // both tails sit at line end; both heads follow `import` — the
    // only separator is the decayed dot-count RIGHT of the head (bwd)
    val full = score("import sqlkit.Exec.Table", w)
    val short = score("import sqlkit.Exec", w)
    assert(full.contains((1, 6, "api_symbol")), s"full: $full")
    assert(!short.exists(_._3 == "api_symbol"), s"short: $short")
  }

  test("documented_fn REQUIRES pooled mid-line context (K5 full)") {
    val w = Weights.default
    def withPrev(prev: String, line: String) = {
      val (lt, lg) = Tokenizer.tokenizeLine(prev,
        inDocBlock = false)
      val (toks, tags) = Tokenizer.tokenizeLine(line)
      TriaffineScorer.scoreSentence(toks.toIndexedSeq, tags.toIndexedSeq,
        lt.toIndexedSeq, lg.toIndexedSeq,
        IndexedSeq.empty, IndexedSeq.empty, w)
        .map(sp => (sp.start, sp.endExcl, TypeDict.types(sp.typeId)))
    }
    // entity-carrying doc line: entity at index 2 — mid-line, invisible
    // to any endpoint channel; the POOLED cp slot carries its DOCCAP
    // share
    val ent = withPrev("/** Uses Iceberg to merge rows */",
      "def f(a: Row): Txn = {")
    val plain = withPrev("/** uses it to merge rows */",
      "def f(a: Row): Txn = {")
    val annBetween = withPrev("@ deprecated", "def f(a: Row): Txn = {")
    assert(ent.contains((0, 2, "documented_fn")), s"ent: $ent")
    assert(!plain.exists(_._3 == "documented_fn"), s"plain: $plain")
    assert(!annBetween.exists(_._3 == "documented_fn"), s"ann: $annBetween")
    // endpoint tokens of the two doc variants are IDENTICAL — a
    // last-token-only context channel (round 2) cannot separate them
    assert(Tokenizer.tokenizeLine("/** Uses Iceberg to merge rows */")._1.last ==
      Tokenizer.tokenizeLine("/** uses it to merge rows */")._1.last)
  }

  test("EMA update follows torch_ema semantics (K13)") {
    val base = Weights.default
    val pert = Weights.perturbed(base, seed = 13L, std = 0.5)
    // steps=0: shadow untouched; decay=0: one step lands on the params
    assert(Weights.ema(base, pert, 0.9, 0).bias.sameElements(pert.bias))
    assert(Weights.ema(base, pert, 0.0, 1).bias.sameElements(base.bias))
    // one literal step: shadow' = d*shadow + (1-d)*param, per element —
    // (1 - 0.9) spelled as the subtraction, not 0.1: torch_ema computes
    // one_minus_decay = 1.0 - decay and the float results differ in the
    // last ulp
    val one = Weights.ema(base, pert, 0.9, 1)
    one.bias.indices.foreach { i =>
      assert(one.bias(i) == 0.9 * pert.bias(i) + (1 - 0.9) * base.bias(i))
    }
    // hyperparameters come from the tracked params, not the shadow
    assert(one.epsilon == base.epsilon && one.topK == base.topK)
  }

  test("EMA bundle (K13): distinct fingerprint, identical decode decisions") {
    val w = Weights.default
    val e = Weights.emaDefault
    // a genuinely different parameter set — the manifest fingerprint
    // (F9) separates the two bundles, so a resume that mixes them
    // fails fast (ResumeSpec)
    assert(e.fingerprint != w.fingerprint)
    assert(e.bias.zip(w.bias).exists { case (a, b) => a != b })
    // the reference's situation exactly (evaluation.py:28-37): the
    // flagship decode runs on the decay-averaged weights and yields the
    // same predictions as the converged checkpoint — the residual
    // perturbation (0.5 * 0.9^60 ~ 9e-4) sits far inside the +-5 rule
    // margins. Scores must DIFFER numerically (it is a different
    // bundle); decisions must not.
    var someScoreDiffers = false
    (0 until 40).foreach { id =>
      val g = CorpusGen.file(id.toLong)
      val docId = s"${g.source.repo}/${g.source.path}"
      Tokenizer.sentences(docId, g.source.content).foreach { s =>
        val a = TriaffineScorer.mentions(s, w)
        val b = TriaffineScorer.mentions(s, e)
        assert(a.map(m => (m.start, m.end, m.entType)).toSet ==
          b.map(m => (m.start, m.end, m.entType)).toSet,
          s"EMA decode diverged: file=$id sent=${s.sentId}")
        if (a.map(_.score) != b.map(_.score)) someScoreDiffers = true
      }
    }
    assert(someScoreDiffers, "EMA bundle scored bit-identically — " +
      "the perturbation is not reaching the kernel")
  }

  test("identity-keyed caches survive bundle ALTERNATION (no stale reuse)") {
    val w = Weights.default
    val e = Weights.emaDefault
    val (toks, tags) = Tokenizer.tokenizeLine("def f(a: Row): Txn = {")
    def run(b: Weights) = TriaffineScorer.scoreSentence(
      toks.toIndexedSeq, tags.toIndexedSeq, b)
    // Workspace and the per-thread token-vector cache are keyed by
    // Weights identity: scoring w -> e -> w on ONE thread must
    // reproduce w's scores bit-exactly (a stale sparse row or token
    // vector from the other bundle would shift them)
    val first = run(w)
    val other = run(e)
    val again = run(w)
    assert(first == again, "stale cross-bundle cache state leaked")
    assert(first.map(_.score) != other.map(_.score))
  }

  test("annotation names collide with no alias-dictionary key") {
    val aliases = Vocab.aliasRows.map(_._1).toSet
    Vocab.annots.foreach(a => assert(!aliases.contains(a), a))
  }

  test("context channel leaves line-local mentions unchanged") {
    val w = Weights.default
    // annotation and documented_fn are the two DELIBERATELY context-
    // dependent types; every other decision must be identical with and
    // without the cross-line channel
    val ctxTypes = Set("annotation", "documented_fn")
    (0 until 40).foreach { id =>
      val g = CorpusGen.file(id.toLong)
      val docId = s"${g.source.repo}/${g.source.path}"
      Tokenizer.sentences(docId, g.source.content).foreach { s =>
        val withCtx = TriaffineScorer.mentions(s, w)
          .filter(m => !ctxTypes(m.entType))
          .map(m => (m.start, m.end, m.entType)).toSet
        val noCtx = TriaffineScorer.scoreSentence(
          s.tokens.toIndexedSeq, s.pos.toIndexedSeq, w)
          .map(sp => (sp.start, sp.endExcl, TypeDict.types(sp.typeId)))
          .filterNot(t => ctxTypes(t._3)).toSet
        assert(withCtx == noCtx, s"file=$id sent=${s.sentId}")
      }
    }
  }

  test("union-find canonical map merges bridge pairs and hot alias") {
    val c = Vocab.canonicalOf
    // bridge0 connects idents(0) and idents(1)
    assert(c(Vocab.idents(0)) == c(Vocab.idents(1)))
    // hot alias 'common' merges idents 32..39
    (33 until 40).foreach(i =>
      assert(c(Vocab.idents(32)) == c(Vocab.idents(i))))
    // canonical is a member-min fixpoint
    c.foreach { case (e, canon) => assert(c(canon) == canon && canon <= e) }
  }
}
