package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  // star: 1 -> 2, 3 -> 2 (2 dangling), plus isolated-ish 4 -> 5
  private lazy val star = Seq((1L, 2L), (3L, 2L), (4L, 5L))
    .toDF("src", "dst")

  test("pageRank: sink of a star out-ranks its sources; ranks stay positive") {
    val r = Graphs.pageRank(star, "src", "dst", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(r(2L) > r(1L) && r(2L) > r(3L), "two-in-edge sink must dominate")
    assert(r(2L) > r(5L), "two-in-edge sink beats one-in-edge sink")
    assert(r.values.forall(_ > 0L))
    assert(r(1L) === r(3L), "symmetric sources must tie exactly")
  }

  test("pageRank matches the hand-computed fixed-point recurrence on a 2-cycle") {
    // 1 <-> 2: N=2, no dangling, deg=1 each. r0 = Scale/2 and the update
    // maps each rank to 15*Scale/200 + 85*r/100 — a closed form we can
    // fold by hand for 2 iterations.
    val S = Graphs.Scale
    def step(r: Long): Long = (15L * S) / (100L * 2L) + (85L * r) / 100L
    val expected = step(step(S / 2))
    val out = Graphs.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
        "src", "dst", iterations = 2)
      .select("rank_fp").as[Long].collect()
    assert(out.toSet === Set(expected))
  }

  test("pageRank is layout-independent (repartition changes nothing)") {
    val e = Seq((1L, 2L), (3L, 2L), (2L, 4L), (4L, 1L), (5L, 1L), (5L, 4L))
      .toDF("src", "dst")
    val a = Graphs.pageRank(e, "src", "dst", iterations = 3)
      .select("node", "rank_fp").as[(Long, Long)].collect().toSet
    val b = Graphs.pageRank(e.repartition(7), "src", "dst", iterations = 3)
      .select("node", "rank_fp").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("pageRank conserves mass up to bounded truncation loss") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val total = Graphs.pageRank(e, "src", "dst", iterations = 4)
      .agg(sum("rank_fp")).as[Long].collect()(0)
    // each division truncates < 1 unit; a handful of nodes and iterations
    // can lose only a few hundred units off Scale
    assert(total <= Graphs.Scale)
    assert(total > Graphs.Scale - 1000L)
  }

  test("labelPropagation: two cliques joined by a bridge resolve to two " +
       "communities with min-label ids") {
    // clique A = {1,2,3}, clique B = {10,11,12}, bridge 3–10. Each
    // node's clique neighbors outvote the bridge, so the cliques settle
    // on two DISTINCT internal labels (min-tie-breaks may carry a label
    // across the bridge early — B ends on label 3 here — but the
    // partition itself is what LPA promises).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("src", "dst")
    val out = Graphs.labelPropagation(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L))
    val aLabels = Set(1L, 2L, 3L).map(out(_)._1)
    val bLabels = Set(10L, 11L, 12L).map(out(_)._1)
    assert(aLabels.size === 1 && bLabels.size === 1,
      s"each clique must agree on one label: $out")
    assert(aLabels !== bLabels,
      s"the two cliques must form distinct communities: $out")
    assert(out.values.forall(_._2 === 3L), "both communities have 3 members")
  }

  test("pageRankWeighted: unit-weight instances and the collapsed " +
       "(src, dst, count) multigraph are bit-identical") {
    // multi-edges: 1->2 twice, plus a dangling sink (5) to exercise the
    // mass term under weights
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L),
      (1L, 5L)).toDF("src", "dst")
    val perInstance = Graphs.pageRankWeighted(
      edges.withColumn("w", lit(1L)), "src", "dst", "w", iterations = 4)
    val collapsed = Graphs.pageRankKeyed(edges, "src", "dst",
      iterations = 4)
    assert(rendered(perInstance) === rendered(collapsed),
      "share·m must equal m summed unit shares, per iteration, exactly")
  }

  test("pageRankKeyed: string-keyed nodes rank like their long-keyed " +
       "isomorph") {
    val named = Seq(("a", "b"), ("c", "b"), ("d", "e")).toDF("src", "dst")
    val r = Graphs.pageRankKeyed(named, "src", "dst", iterations = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val longs = Graphs.pageRank(star, "src", "dst", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val iso = Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L, "e" -> 5L)
    assert(r.map { case (k, v) => iso(k) -> v } === longs,
      "rank arithmetic must not depend on the node key type")
  }

  test("hits: hand-computed two-round L1-normalized hubs/authorities " +
       "on a 2x2 bipartite graph") {
    // hubs 1,2 -> auths 10,11: 1->{10,11}, 2->{10}; n=4, h0 = S/4
    // round 1: ar = (S/2, S/4), ta = 3S/4 -> a = (2S/3, S/3) floored;
    //   hr = (a10+a11, a10), th -> h1 = (0.6S, 0.4S) exactly
    // round 2: ar = (S, 0.6S), ta = 1.6S -> a2 = (0.625S, 0.375S);
    //   hr = (S, 0.625S), th = 1.625S -> h2 = (S/1.625, 0.625S/1.625)
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val out = Graphs.hits(e, "src", "dst", rounds = 2)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((615384615384L, 0L)))
    assert(out(2L) === ((384615384615L, 0L)))
    assert(out(10L) === ((0L, 625000000000L)))
    assert(out(11L) === ((0L, 375000000000L)))
  }

  test("personalizedPageRank: hand-computed seed-restart recurrence on " +
       "a 2-cycle; isolated seeds recycle their dangling mass") {
    val cyc = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val seed1 = Seq(Tuple1(1L)).toDF("node")
    val r = Graphs.personalizedPageRank(cyc, "src", "dst", "w",
        seed1, "node", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r0 = (S, 0); r_k(seed) = 0.15S + 0.85·contrib, r_k(other) =
    // 0.85·contrib: r1 = (0.15S, 0.85S), r2 = (0.8725S, 0.1275S),
    // r3 = (0.258375S, 0.741625S)
    assert(r(1L) === 258375000000L && r(2L) === 741625000000L)
    // seed 9 has no edges: dangling, teleport + its own recycled mass
    // keep it ranked; non-seed 2 still receives only contribution mass
    val r2 = Graphs.personalizedPageRank(cyc, "src", "dst", "w",
        Seq(Tuple1(9L)).toDF("node"), "node", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2.keySet === Set(1L, 2L, 9L))
    assert(r2(9L) === Graphs.Scale,
      "an isolated seed is a fixpoint: teleport + its own recycled " +
        "dangling mass = the whole Scale")
    assert(r2(1L) === 0L && r2(2L) === 0L,
      "no path from the seed: the cycle holds zero mass")
  }

  test("labelPropagation is deterministic across layouts and ignores " +
       "direction/duplicates") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (4L, 3L))
      .toDF("src", "dst")
    val a = Graphs.labelPropagation(edges, "src", "dst").collect().toSet
    val b = Graphs.labelPropagation(edges.repartition(7), "src", "dst")
      .collect().toSet
    assert(a === b)
  }

  test("triangleCount: exact per-node counts; direction/dupes/loops ignored") {
    // K4 on {1,2,3,4} (4 triangles, 3 per node) plus a pendant 5 and an
    // isolated triangle {6,7,8}; edge 2→1 duplicates 1→2 reversed, and
    // 3→3 is a self-loop — both must not change counts
    val e = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 3L), (4L, 5L), (6L, 7L), (7L, 8L), (6L, 8L)
    ).toDF("src", "dst")
    val got = Graphs.triangleCount(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    graft.operators.OpCaches.release()
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 6L -> 1L, 7L -> 1L, 8L -> 1L))
    // global count = sum/3: 4 (K4) + 1 (isolated) = 5
    assert(got.values.sum === 15L)
  }

  test("clusteringCoefficient: K4 closes fully, pendant is NULL, " +
       "open wedge scores 0") {
    // K4 {1,2,3,4} + pendant 5 on 4 + open wedge 6-7-8
    val e = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L), (7L, 8L)
    ).toDF("src", "dst")
    val got = Graphs.clusteringCoefficient(e, "src", "dst")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    graft.operators.OpCaches.release()
    assert(got(1L) === ((1L, 3L, 3L, Some(1.0))),
      "inside K4 every neighbor pair is closed")
    assert(got(4L) === ((4L, 4L, 3L, Some(0.5))),
      "4 has degree 4 (incl. pendant): 3 closed of 6 pairs")
    assert(got(5L) === ((5L, 1L, 0L, None)),
      "degree-1 nodes have no wedge: NULL, not 0")
    assert(got(7L) === ((7L, 2L, 0L, Some(0.0))),
      "an open wedge center scores a true 0")
  }

  test("kCore: iterative peel cascades through chains; clique survives; " +
       "no-core graphs empty out") {
    // triangle {1,2,3} + tail 3-4-5: 2-core peels 5 then 4, keeps the
    // triangle at degree 2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = Graphs.kCore(g, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"the tail must cascade away, got $core")
    // a pure chain has no 2-core
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graphs.kCore(chain, "src", "dst", k = 2).count() === 0)
    // direction/dupes/self-loops don't inflate degrees
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (1L, 3L))
      .toDF("src", "dst")
    assert(Graphs.kCore(messy, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("degreeHistogram: distinct-neighbor degrees, parallel edges " +
       "collapse, NULL endpoints drop") {
    val e = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(10L)), // parallel: deg 1
      (Some(2L), Some(10L)), (Some(2L), Some(11L)), // deg 2
      (Some(3L), Some(10L)), (Some(3L), Some(11L)), (Some(3L), Some(12L)),
      (Some(4L), None), (None, Some(13L))           // dropped
    ).toDF("s", "d")
    val got = Graphs.degreeHistogram(e, "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hits: string-keyed run is the long-keyed run under the key map " +
       "(no caller-side re-keying needed)") {
    val names = Map(1L -> "alpha", 2L -> "beta", 10L -> "gamma",
      11L -> "delta")
    val eL = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val eS = Seq(("alpha", "gamma"), ("alpha", "delta"), ("beta", "gamma"))
      .toDF("src", "dst")
    val long = Graphs.hits(eL, "src", "dst", rounds = 2)
      .select("node", "hub_fp", "auth_fp")
      .as[(Long, Long, Long)].collect()
      .map(r => names(r._1) -> ((r._2, r._3))).toSet
    val str = Graphs.hits(eS, "src", "dst", rounds = 2)
      .select("node", "hub_fp", "auth_fp")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toSet
    assert(long === str)
  }

  test("hits saltShards: salted two-level exact sum is bit-identical to " +
       "the single-level form and a BigInt reference; the guard raises " +
       "unsalted past the cap and salting escapes it (VERDICT r18 i5)") {
    // star hub: 12 distinct in-neighbors on auth 100, plus side edges
    val pairs = (1L to 12L).map(u => (u, 100L)) ++
      Seq((1L, 101L), (2L, 101L), (3L, 102L), (11L, 103L))
    val e = pairs.toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select("node", "hub_fp", "auth_fp").orderBy("node")
        .as[(Long, Long, Long)].collect().toSeq
    val plain = run(Graphs.hits(e, "src", "dst", rounds = 2))
    val salted = run(Graphs.hits(e, "src", "dst", rounds = 2,
      saltShards = 5))
    assert(salted === plain,
      "the shard assignment must cancel in the total — bit-identical")
    // exact-integer reference formulation (BigInt = unbounded decimal):
    // the same L1-normalized recurrence with every sum and the
    // (raw·Scale) div total step in exact integer arithmetic
    val S = BigInt(Graphs.Scale)
    val eDd = pairs.distinct
    val nodesR = (eDd.map(_._1) ++ eDd.map(_._2)).distinct.sorted
    var hubR = nodesR.map(_ -> S / nodesR.size).toMap
    var authR = Map.empty[Long, BigInt]
    for (_ <- 1 to 2) {
      val ar = eDd.groupBy(_._2).map { case (v, es) =>
        v -> es.map(x => hubR.getOrElse(x._1, BigInt(0))).sum }
      val ta = ar.values.sum
      authR = ar.map { case (v, r) => v -> r * S / ta }
      val hr = eDd.groupBy(_._1).map { case (u, es) =>
        u -> es.map(x => authR.getOrElse(x._2, BigInt(0))).sum }
      val th = hr.values.sum
      hubR = hr.map { case (u, r) => u -> r * S / th }
    }
    val ref = nodesR.map(v => (v, hubR.getOrElse(v, BigInt(0)).toLong,
      authR.getOrElse(v, BigInt(0)).toLong))
    assert(plain === ref, "engine output must equal the exact reference")
    // guard: cap 8 — node 100's 12 in-neighbors exceed it unsalted
    val eW = e.distinct().withColumn("w", lit(1L))
    val ex = intercept[Exception] {
      Graphs.hitsLoop(eW, rounds = 2, weighted = false,
        maxTermsOverride = Some(8L)).collect()
    }
    assert(ex.getMessage != null && ex.toString.contains("saltShards"),
      s"the guard must point at the escape-hatch parameter: $ex")
    // salted across 5 shards the per-shard counts stay under the cap
    // and the values are still the single-level ones
    val escaped = run(Graphs.hitsLoop(eW, rounds = 2, weighted = false,
      saltShards = 5, maxTermsOverride = Some(8L)))
    assert(escaped === plain,
      "the salted form must ESCAPE the per-node cap with exact results")
    // weighted path: same identity through the product-limb machinery
    val wDf = pairs.toDF("src", "dst").withColumn("w",
      (col("src") % 3 + 1).cast("long"))
    val pw = run(Graphs.hitsWeighted(wDf, "src", "dst", "w", rounds = 2))
    val sw = run(Graphs.hitsWeighted(wDf, "src", "dst", "w", rounds = 2,
      saltShards = 4))
    assert(sw === pw, "weighted salted sum must be bit-identical too")
  }

  test("hitsWeighted: collapsed (src, dst, multiplicity) is bit-identical " +
       "to unit-weight exploded instances; weight 1 reproduces hits") {
    val inst = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 10L), (2L, 10L),
      (2L, 10L)).toDF("src", "dst")
    val collapsed = inst.groupBy("src", "dst")
      .agg(count(lit(1)).as("m"))
    val unit = inst.withColumn("w", lit(1L))
    val a = Graphs.hitsWeighted(collapsed, "src", "dst", "m", rounds = 2)
      .select("node", "hub_fp", "auth_fp")
      .as[(Long, Long, Long)].collect().toSet
    val b = Graphs.hitsWeighted(unit, "src", "dst", "w", rounds = 2)
      .select("node", "hub_fp", "auth_fp")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b, "share·w must equal summing exploded instances")
    // all-weight-1 on a simple graph = the unweighted operator exactly
    val simple = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val w1 = Graphs.hitsWeighted(simple.withColumn("w", lit(1L)),
        "src", "dst", "w", rounds = 2)
      .select("node", "hub_fp", "auth_fp")
      .as[(Long, Long, Long)].collect().toSet
    val plain = Graphs.hits(simple, "src", "dst", rounds = 2)
      .select("node", "hub_fp", "auth_fp")
      .as[(Long, Long, Long)].collect().toSet
    assert(w1 === plain)
  }

  test("weight guards raise loudly: nonpositive weights in " +
       "pageRankWeighted/personalizedPageRank/hitsWeighted, oversized " +
       "weight in hitsWeighted") {
    val bad = Seq((1L, 2L, 0L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    intercept[Exception] {
      Graphs.pageRankWeighted(bad, "src", "dst", "w", iterations = 1)
        .collect()
    }
    intercept[Exception] {
      Graphs.personalizedPageRank(bad, "src", "dst", "w",
        Seq(Tuple1(1L)).toDF("node"), "node", iterations = 1).collect()
    }
    intercept[Exception] {
      Graphs.hitsWeighted(bad, "src", "dst", "w", rounds = 1).collect()
    }
    val huge = Seq((1L, 2L, 1L << 23), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    intercept[Exception] {
      Graphs.hitsWeighted(huge, "src", "dst", "w", rounds = 1).collect()
    }
    // negative weights raise too (not just zero)
    val neg = Seq((1L, 2L, -3L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    intercept[Exception] {
      Graphs.pageRankWeighted(neg, "src", "dst", "w", iterations = 1)
        .collect()
    }
  }

  test("weight guard rejects NON-INTEGRAL weights loudly: 0.7 must not " +
       "truncate to 0 (the mass-vanish failure) and 1.7 must not " +
       "silently become 1; integral doubles pass and equal the long run") {
    // sub-1 fractional: passes a raw-column w <= 0 check but truncates
    // to 0 — exactly the failure the guard exists to prevent
    val sub1 = Seq((1L, 2L, 0.7), (2L, 1L, 1.0)).toDF("src", "dst", "w")
    intercept[Exception] {
      Graphs.pageRankWeighted(sub1, "src", "dst", "w", iterations = 1)
        .collect()
    }
    // super-1 fractional: would silently truncate 1.7 → 1
    val frac = Seq((1L, 2L, 1.7), (2L, 1L, 1.0)).toDF("src", "dst", "w")
    intercept[Exception] {
      Graphs.hitsWeighted(frac, "src", "dst", "w", rounds = 1).collect()
    }
    intercept[Exception] {
      Graphs.personalizedPageRank(frac, "src", "dst", "w",
        Seq(Tuple1(1L)).toDF("node"), "node", iterations = 1).collect()
    }
    // integral doubles are inside the contract: bit-identical to longs
    val dbl = Seq((1L, 2L, 2.0), (2L, 1L, 3.0)).toDF("src", "dst", "w")
    val lng = Seq((1L, 2L, 2L), (2L, 1L, 3L)).toDF("src", "dst", "w")
    val a = Graphs.pageRankWeighted(dbl, "src", "dst", "w", iterations = 2)
      .select("node", "rank_fp").as[(Long, Long)].collect().toSet
    val b = Graphs.pageRankWeighted(lng, "src", "dst", "w", iterations = 2)
      .select("node", "rank_fp").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("bfsDistances: exact hop counts on a path, horizon truncates, " +
       "unreached nodes absent") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("seed")
    val out = Graphs.bfsDistances(path, "src", "dst", seeds, "seed",
        maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      "node 5 is 4 hops out — beyond the horizon, so absent")
  }

  test("bfsDistances: multi-source takes the MIN over seeds; directed " +
       "mode respects edge direction") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val multi = Graphs.bfsDistances(path, "src", "dst",
        Seq(1L, 5L).toDF("seed"), "seed", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(multi === Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
      4L -> 1L, 5L -> 0L))
    val directed = Graphs.bfsDistances(path, "src", "dst",
        Seq(3L).toDF("seed"), "seed", maxHops = 3, directed = true)
      .as[(Long, Long)].collect().toMap
    assert(directed === Map(3L -> 0L, 4L -> 1L, 5L -> 2L),
      "directed BFS from 3 must not walk backwards to 2")
    intercept[IllegalArgumentException] {
      Graphs.bfsDistances(path, "src", "dst", Seq(1L).toDF("seed"),
        "seed", maxHops = 0)
    }
  }

  test("bfsDistances: a seed outside the edge set still reports dist 0; " +
       "layout-independent") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graphs.bfsDistances(e, "src", "dst",
        Seq(99L, 1L).toDF("seed"), "seed", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(99L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L))
    val again = Graphs.bfsDistances(e.repartition(5), "src", "dst",
        Seq(99L, 1L).toDF("seed"), "seed", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(again === out)
    // a NULL seed is noise, not a node: no spurious (null, 0) row
    val withNull = Graphs.bfsDistances(e, "src", "dst",
        Seq(Some(1L), None).toDF("seed"), "seed", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(withNull === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
