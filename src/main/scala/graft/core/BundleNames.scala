package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F10 — encoder-bundle name abbreviation (ref train_utils.py:4-34).
  *
  * The reference shortens encoder identifiers ("bert_name_or_path",
  * possibly a filesystem path, possibly a comma-joined list) to stable
  * short names when composing run/output labels. The engine analog:
  * weight-bundle identifiers ("default", "ema", or a path to a bundle
  * dir) normalized for manifests, bench labels, and sink names.
  *
  * Like [[graft.ops.TextOps.cleanChain]], the literal table IS the
  * required semantics (train_utils.py:4-17) — kept verbatim so the
  * rename matches the reference entry-for-entry; the DuckDB oracle for
  * `bundle_name` is GENERATED from this same Seq so the two cannot
  * drift.
  *
  * Both mirrors are provided: a driver-side pure function (manifest /
  * label composition on the driver) and a codegen'd Column expression
  * (normalizing a name column distributed, no UDF).
  */
object BundleNames {

  /** The abbreviation table (train_utils.py:4-17), verbatim. */
  val Abbrev: Seq[(String, String)] = Seq(
    "Bio_ClinicalBERT" -> "clinicalbert",
    "bert-base-multilingual-cased" -> "mbert_cased",
    "bert-base-multilingual-uncased" -> "mbert_uncased",
    "bluebert_pubmed_mimic_base" -> "bluebert",
    "bert-base-cased" -> "base_cased",
    "bert-large-cased" -> "large_cased",
    "bert-base-uncased" -> "base_uncased",
    "bert-large-uncased" -> "large_uncased",
    "pubmedbert_abs" -> "pubmedbert",
    "scibert_scivocab_uncased" -> "scibert",
    "biobert_v1.1" -> "biobert",
    "biobert-large-cased-v1.1" -> "biobertL",
    "spanbert-large-cased" -> "span_large")

  private val abbrevMap: Map[String, String] = Abbrev.toMap

  /** main_name (train_utils.py:19-31): "kebio" anywhere in the name
    * (case-insensitive) wins outright; otherwise the last path segment
    * (ONE trailing slash stripped first) is looked up in [[Abbrev]],
    * falling back to itself. The no-slash branch of the reference is
    * the same lookup — split of a slashless string is the string. */
  def mainName(nameOrPath: String): String =
    if (nameOrPath.toLowerCase.contains("kebio")) "kebio"
    else {
      val seg = nameOrPath.stripSuffix("/").split("/", -1).last
      abbrevMap.getOrElse(seg, seg)
    }

  /** main_name_list (train_utils.py:33-34): per-element [[mainName]]
    * over a comma-joined list, re-joined with commas. Python split(',')
    * keeps empty segments — so does this (split limit -1). */
  def mainNameList(names: String): String =
    names.split(",", -1).map(mainName).mkString(",")

  /** Codegen'd [[mainName]]: pure `functions._` (when / contains /
    * regexp_replace / split / element_at over a map literal) — stays
    * inside whole-stage codegen, no UDF. element_at on the map literal
    * yields null for unmapped segments; coalesce restores the
    * identity fallback. */
  def mainNameCol(c: Column): Column = {
    val seg = element_at(split(regexp_replace(c, "/$", ""), "/", -1), -1)
    when(lower(c).contains("kebio"), lit("kebio"))
      .otherwise(coalesce(element_at(typedlit(abbrevMap), seg), seg))
  }

  /** Codegen'd [[mainNameList]]: per-element higher-order `transform`
    * of the comma split, re-joined. */
  def mainNameListCol(c: Column): Column =
    array_join(transform(split(c, ",", -1), x => mainNameCol(x)), ",")

  /** Deterministic demo roster for the `bundle_name` driver query and
    * the ScalaTest mirror check: every [[Abbrev]] key (pins the whole
    * table), plus one per semantic branch — path forms with and
    * without a trailing slash, mapped and unmapped segments, the
    * kebio override in plain/cased/path positions, the engine's own
    * bundle names, and comma lists mixing all of the above. */
  val demoNames: Seq[String] =
    Abbrev.map(_._1) ++ Seq(
      "default", "ema",
      "models/biobert_v1.1/",
      "/opt/encoders/scibert_scivocab_uncased",
      "custom/path/unknown-enc/",
      "KeBioLM",
      "hub/KEBIO-large",
      "bert-base-cased,biobert_v1.1",
      "models/pubmedbert_abs/,kebio/x,ema",
      "spanbert-large-cased,custom/enc,default")
}
