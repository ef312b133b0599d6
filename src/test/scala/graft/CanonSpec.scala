package graft

import graft.canon.{AliasMining, ConnectedComponents}
import org.apache.spark.sql.functions._

/** Canonicalization at data scale: large/small-star CC convergence on
  * an adversarial chain, and mention-derived alias edges. */
class CanonSpec extends SparkSpec {

  test("large/small-star CC converges in O(log n) rounds on a 10^6-edge chain") {
    import spark.implicits._
    // worst case for label propagation: a single chain — diameter n.
    // Zero-padded ids so lexicographic order == numeric order.
    val n = 1000000
    val edges = spark.range(n - 1)
      .select(format_string("n%07d", col("id")).as("src"),
        format_string("n%07d", col("id") + 1).as("dst"))
    val (labels, rounds) = ConnectedComponents.runWithStats(edges)
    val bound = 2 * (math.ceil(math.log(n.toDouble) / math.log(2)) + 2).toInt
    assert(rounds <= bound, s"took $rounds rounds (bound $bound)")
    val bad = labels.filter(col("component") =!= lit("n0000000")).count()
    assert(bad == 0, s"$bad nodes not labeled with the chain minimum")
    assert(labels.count() == n)
  }

  test("small graphs take the driver-solve gate; labels match the star family") {
    import spark.implicits._
    // a 2k-edge chain sits far below DriverSolveMaxEdges -> driver
    // union-find (rounds == 0), same min-member labeling the star
    // rounds produce on the 10^6 chain above
    val n = 2000
    val edges = spark.range(n - 1)
      .select(format_string("n%07d", col("id")).as("src"),
        format_string("n%07d", col("id") + 1).as("dst"))
    val (labels, rounds) = ConnectedComponents.runWithStats(edges)
    assert(rounds == 0, s"expected the driver gate, got $rounds rounds")
    assert(labels.filter(col("component") =!= lit("n0000000")).count() == 0)
    assert(labels.count() == n)
  }

  test("star CC equals min-label result on the alias dictionary") {
    val got = ConnectedComponents.canonicalMap(graft.link.Linker.aliasDf(spark))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == graft.core.Vocab.canonicalOf)
  }

  test("mention-derived edges merge camel/snake surfaces beyond the dictionary") {
    import spark.implicits._
    // two surface forms of an entity the dictionary does not know
    val linked = Seq(
      ("d1", 0, 0, 1, "identifier", "quuxFrob", "quuxFrob"),
      ("d2", 0, 0, 1, "identifier", "quux_frob", "quux_frob"),
      ("d3", 0, 0, 1, "identifier", "other", "other"))
      .toDF("docId", "sentId", "start", "end", "entType", "surface", "entity")
    val edges = AliasMining.mentionAliasEdges(linked)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(("quuxFrob", "quux_frob")), s"edges: $edges")
    val canon = ConnectedComponents.canonicalMap(
      graft.link.Linker.aliasDf(spark), Some(AliasMining.mentionAliasEdges(linked)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon("quux_frob") == canon("quuxFrob"))
    // edge-less non-dictionary entities are absent from the map — the
    // pipeline's left-join coalesce(entity) keeps them self-canonical
    assert(canon.getOrElse("other", "other") == "other")
    // dictionary entities keep their static canonical assignment
    graft.core.Vocab.canonicalOf.foreach { case (e, c) =>
      assert(canon(e) == c, s"dictionary canon drifted for $e")
    }
  }

  test("CC on an empty edge table returns empty labels (no NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(ConnectedComponents.run(empty).count() == 0)
  }

  test("seeded canon connects a new pair to a SINGLETON-key hub") {
    import spark.implicits._
    // the key "zkey" had ONE pair entity "bbb" before — a singleton is
    // never an edge endpoint, so it is absent from the prior canon
    // map. When "aaa" arrives under the same key, the seeded map must
    // still relabel BOTH (node set includes edge endpoints, not just
    // prior-map entities): dropping the hub would leave "bbb"
    // self-canonical while "aaa" got the component minimum.
    val priorCanon = Seq(("dictA", "dictA"), ("dictB", "dictA"))
      .toDF("entity", "canonical")
    val priorPairs = Seq(("zkey", "bbb", 1L)).toDF("k", "entity", "ndocs")
    val added = Seq(("zkey", "aaa")).toDF("k", "entity")
    val m = graft.canon.IncrementalCanon
      .seededCanonMap(priorCanon, priorPairs, added)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("bbb") == "aaa" && m("aaa") == "aaa", m.toString)
    // the prior forest is preserved untouched
    assert(m("dictA") == "dictA" && m("dictB") == "dictA")
  }

  test("pair-refcount merge: adds, net-zero re-ingest, retraction, corruption") {
    import spark.implicits._
    val prior = Seq(("k1", "e1", 2L), ("k2", "e2", 1L))
      .toDF("k", "entity", "ndocs")
    // doc d9 re-ingested keeping (k1,e1): +1 here, -1 in dec = net zero;
    // (k3,e3) is brand new; (k2,e2) loses its only doc = RETRACTION
    val inc = Seq(("k1", "e1", "d9"), ("k3", "e3", "d9"))
      .toDF("k", "entity", "docId")
    val dec = Seq(("k1", "e1", "d9"), ("k2", "e2", "d2"))
      .toDF("k", "entity", "docId")
    val pd = graft.canon.IncrementalCanon.mergePairs(prior, inc, dec)
    assert(pd.removedCount == 1L)
    val merged = pd.merged.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged == Map(("k1", "e1") -> 2L, ("k3", "e3") -> 1L))
    val added = pd.added.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(added == Set(("k3", "e3")))
    // a decrement that was never counted = corrupted state, fails loudly
    val badDec = Seq(("k9", "e9", "d1")).toDF("k", "entity", "docId")
    val bad = intercept[Exception] {
      graft.canon.IncrementalCanon.mergePairs(prior,
        inc.limit(0), badDec).merged.collect()
    }
    assert(bad.getMessage.contains("refcount"), bad.getMessage)
  }
}
