package graft.triples

import graft.core.{LinkedMention, Sentence, Triple}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Triple materialization: canonical mentions + sentences ->
  * (subj, pred, obj) rows for the five predicates
  * (BASELINE.json north_star): defines_symbol, imports, calls,
  * has_type, documented_as.
  *
  * All five are relational compositions over the mention table:
  *  - defines_symbol / imports: projections of function / api_symbol
  *    mentions;
  *  - has_type: positional self-join (type_ref immediately after the
  *    `ident :` of a parameter);
  *  - calls: mention ⋈ sentence token check (next token is `(`) +
  *    nearest-PRECEDING function via window;
  *  - documented_as: nearest-FOLLOWING function via window.
  *
  * Scale notes: all joins are co-keyed on (docId) or
  * (docId, sentId) — the mention table is already partitioned by docId
  * hash coming out of the extract stage, so these are narrow-ish
  * shuffles on the same key family. The windows partition by docId,
  * never global. Output is deduplicated and bucketable by
  * hash(canonical subj) for the downstream graph table.
  */
object TripleEmit {

  /** canonMentions: LinkedMention columns + `canonical` (post-CC). */
  def emit(canonMentions: DataFrame, sentences: Dataset[Sentence]): DataFrame = {
    val spark = canonMentions.sparkSession
    import spark.implicits._
    val m = canonMentions.cache()

    val defines = m.filter($"entType" === "function")
      .select($"docId".as("subj"), lit("defines_symbol").as("pred"),
        $"canonical".as("obj"), $"docId", $"linkScore".as("score"))

    val imports = m.filter($"entType" === "api_symbol")
      .select($"docId".as("subj"), lit("imports").as("pred"),
        $"canonical".as("obj"), $"docId", $"linkScore".as("score"))

    // has_type: identifier at (s,e) with a type_ref starting at e+1
    // (the `:` sits between them) in the same sentence.
    val idents = m.filter($"entType" === "identifier")
      .select($"docId".as("idoc"), $"sentId".as("isent"), $"end",
        $"canonical".as("subjC"), $"linkScore".as("score"))
    val types = m.filter($"entType" === "type_ref")
      .select($"docId".as("tdoc"), $"sentId".as("tsent"), $"start",
        $"canonical".as("objC"))
    val hasType = idents.join(types,
      $"idoc" === $"tdoc" && $"isent" === $"tsent" &&
        $"start" === $"end" + 1)
      .select($"subjC".as("subj"), lit("has_type").as("pred"),
        $"objC".as("obj"), $"idoc".as("docId"), $"score")

    // function mentions per doc, by line — the "definition timeline"
    val funcs = m.filter($"entType" === "function")
      .select($"docId".as("fdoc"), $"sentId".as("fnSent"),
        $"canonical".as("fnC"))

    // calls: identifier whose next token is "(" -> nearest preceding def
    val sentTok = sentences.toDF("sdoc", "ssent", "tokens", "pos")
    val callees = m.filter($"entType" === "identifier")
      .join(sentTok, $"docId" === $"sdoc" && $"sentId" === $"ssent")
      .filter(element_at($"tokens", $"end" + 1) === "(")
      .select($"docId".as("cdoc"), $"sentId".as("csent"), $"start",
        $"canonical".as("calleeC"), $"linkScore".as("score"))
    val callJoin = callees.join(funcs,
      $"cdoc" === $"fdoc" && $"fnSent" < $"csent")
    val wPrev = Window.partitionBy($"cdoc", $"csent", $"start")
      .orderBy($"fnSent".desc)
    val calls = callJoin.withColumn("rn", row_number().over(wPrev))
      .filter($"rn" === 1)
      .select($"fnC".as("subj"), lit("calls").as("pred"),
        $"calleeC".as("obj"), $"cdoc".as("docId"), $"score")

    // documented_as: doc_entity -> nearest following function
    val docs = m.filter($"entType" === "doc_entity")
      .select($"docId".as("ddoc"), $"sentId".as("dsent"), $"start",
        $"canonical".as("entC"), $"linkScore".as("score"))
    val docJoin = docs.join(funcs,
      $"ddoc" === $"fdoc" && $"fnSent" > $"dsent")
    val wNext = Window.partitionBy($"ddoc", $"dsent", $"start")
      .orderBy($"fnSent".asc)
    val documented = docJoin.withColumn("rn", row_number().over(wNext))
      .filter($"rn" === 1)
      .select($"fnC".as("subj"), lit("documented_as").as("pred"),
        $"entC".as("obj"), $"ddoc".as("docId"), $"score")

    defines.union(imports).union(hasType).union(calls).union(documented)
      .groupBy($"subj", $"pred", $"obj", $"docId")
      .agg(max($"score").as("score"))
  }

  def asTriples(df: DataFrame): Dataset[Triple] = {
    import df.sparkSession.implicits._
    df.as[Triple]
  }
}
