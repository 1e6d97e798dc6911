package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark lacks natively: as-of (time-travel) join and
  * range (point-in-interval) join.
  *
  * Both are phrased as compositions of shuffle-by-key primitives — no
  * cross joins, no broadcast-nested-loop fallbacks — so the plans scale
  * the same way ordinary equi-joins do.
  */
object Joins {

  /** Backward as-of join: for every left row, attach `rightVals` from the
    * right row with the greatest `rightTs` <= the left row's `leftTs`
    * within the same `key` group (pandas merge_asof / DuckDB ASOF JOIN
    * semantics, inclusive on equal timestamps). Left rows with no earlier
    * right row keep NULLs (left-outer flavor).
    *
    * Plan: union both sides tagged with a side marker, one window pass per
    * value column (`last(..., ignoreNulls)` over rows up to the current
    * one, right rows sorting before left rows on timestamp ties), keep the
    * left rows. ONE shuffle on `key` — the classic sort-merge formulation;
    * a range-condition join would be a broadcast-nested-loop in Spark.
    *
    * Determinism: if the right side can hold several rows with the same
    * (key, ts), pre-deduplicate it (e.g. Dedup.dedupKeepFirst) — which of
    * the tied rows wins is otherwise plan-dependent.
    *
    * Column names in `left` and `right` may overlap freely — the left row
    * rides through the union packed in a struct; right values surface
    * under `rightPrefix`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightVals: Seq[String],
               rightPrefix: String = "asof_"): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightVals, rightPrefix,
      forward = false)

  /** Forward as-of join: attaches the right row with the SMALLEST
    * `rightTs` >= the left row's `leftTs` (inclusive) — the
    * next-upcoming-event flavor. Same one-shuffle plan as [[asofJoin]],
    * traversed in descending timestamp order. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightVals: Seq[String],
                      rightPrefix: String = "asof_"): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightVals, rightPrefix,
      forward = true)

  /** Nearest as-of join: attaches whichever right row is temporally
    * closest to the left row's timestamp — backward match on ties.
    * Composes the backward and forward passes (two one-shuffle window
    * scans over the SAME key partitioning — the second reuses the
    * exchange) and picks per row by absolute delta in microseconds.
    * Rows with no match on either side get nulls. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightVals: Seq[String],
                      rightPrefix: String = "asof_"): DataFrame = {
    val vals = (rightVals :+ rightTs).distinct
    val b = asofImpl(left, right, key, leftTs, rightTs, vals, "__b_",
      forward = false)
    val bf = asofImpl(b, right, key, leftTs, rightTs, vals, "__f_",
      forward = true)
    val bts = col(s"__b_$rightTs"); val fts = col(s"__f_$rightTs")
    val lts = unix_micros(col(leftTs))
    val chooseB = bts.isNotNull && (fts.isNull ||
      lts - unix_micros(bts) <= unix_micros(fts) - lts)
    val out = rightVals.foldLeft(bf) { (df, v) =>
      df.withColumn(rightPrefix + v,
        when(chooseB, col(s"__b_$v")).otherwise(col(s"__f_$v")))
    }
    out.drop(vals.flatMap(v => Seq(s"__b_$v", s"__f_$v")): _*)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       rightVals: Seq[String], rightPrefix: String,
                       forward: Boolean): DataFrame = {
    val leftType = StructType(left.schema.fields)
    val l = left.select(
      Seq(col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
          struct(left.columns.map(col).toIndexedSeq: _*).as("__l")) ++
        rightVals.map(v =>
          lit(null).cast(right.schema(v).dataType).as(s"__r_$v")): _*)
    // A right row with no timestamp can never legitimately match — and
    // sorted nulls-first it would become a fallback value for every
    // left row. Drop such rows up front.
    val r = right.filter(col(rightTs).isNotNull).select(
      Seq(col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
          lit(null).cast(leftType).as("__l")) ++
        rightVals.map(v => col(v).as(s"__r_$v")): _*)
    // Backward scans timestamps ascending (running last = latest right
    // <= left); forward scans descending (running last = earliest right
    // >= left). Right rows sort before left on timestamp ties — the
    // inclusive bound, in either direction. Null timestamps sort FIRST
    // in both directions so a null-ts left row matches nothing (desc's
    // default NULLS LAST would hand it the whole right side's last
    // value).
    val ord = if (forward) col("__ts").desc_nulls_first
              else col("__ts").asc_nulls_first
    val w = Window.partitionBy("__k").orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(l.unionByName(r)) { (df, v) =>
      df.withColumn(s"__f_$v", last(col(s"__r_$v"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(left.columns.map(c => col("__l").getField(c).as(c)).toIndexedSeq ++
        rightVals.map(v => col(s"__f_$v").as(rightPrefix + v)): _*)
  }

  /** Salted equi-join for skewed keys: a plain shuffle join sends every
    * row of a hot key to one reducer; here the big side's rows are
    * spread across `salts` sub-keys (a hash of the whole row's content)
    * and the small side is replicated once per salt, so a hot key's work
    * fans out over `salts` reducers. Output rows are identical to
    * `big.join(small, key)` — salting only changes the shuffle layout.
    *
    * The salt hashes the row's columns, NOT monotonically_increasing_id
    * or rand: those depend on partition layout and intra-partition
    * order, so a stage retry could recompute a row with a different
    * salt — a shuffle key — duplicating or dropping it. Content hashing
    * is stable under retries; rows that are full duplicates share a
    * salt, which only costs spreading for corpora of identical rows.
    *
    * Use when the small side is too big to broadcast but the big side's
    * key histogram is heavy-tailed (AQE's skew handling covers sort-merge
    * joins; this is the explicit, always-on form). Replication cost is
    * `salts ×` the small side — keep `salts` near the executor count. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-filter semi-join reduction: keep only the `fact` rows whose
    * `factKey` MIGHT match a `dim.dimKey` — the explicit form of Spark's
    * runtime row-level filtering (InjectRuntimeFilter), built from the
    * same machinery: a `BloomFilterAggregate` over the dim keys delivered
    * as a scalar subquery, probed per fact row by
    * `BloomFilterMightContain` on the identical `xxhash64`.
    *
    * Why it matters at 100 TB: a selective dim filter (say 4% of
    * suppliers) only shrinks the FACT side after the join's shuffle has
    * already moved every fact row. The bloom probe runs at the fact scan,
    * before the exchange, so shuffle volume drops to the match rate plus
    * the false-positive rate — for the price of one broadcast-sized
    * binary (numBits/8 bytes). No false negatives, so
    * `bloomPreFilter(fact, …).join(dim, …)` ≡ `fact.join(dim, …)` exactly;
    * false positives are culled by the join itself.
    *
    * `expectedItems`/`fpp` size the filter (`optimalNumOfBits`), capped at
    * Spark's runtime-filter ceilings (4M items / 8 MiB) so the aggregate's
    * own validation never rejects the plan. Oversubscribing the cap only
    * degrades fpp — correctness is unaffected.
    */
  def bloomPreFilter(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedItems: Long = 1000000L,
                     fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ExprBridge
    import org.apache.spark.util.sketch.{BloomFilter => SketchBloom}
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val items = math.min(expectedItems, 4000000L)
    val numBits = math.min(SketchBloom.optimalNumOfBits(items, fpp), 67108864L)
    val agg = new BloomFilterAggregate(
      ExprBridge.expression(xxhash64(col(dimKey))),
      CLit(items), CLit(numBits)).toAggregateExpression()
    val bloom = dim.select(ExprBridge.column(agg).as("__bloom")).scalar()
    fact.filter(ExprBridge.column(new BloomFilterMightContain(
      ExprBridge.expression(bloom),
      ExprBridge.expression(xxhash64(col(factKey))))))
  }

  /** [[bloomPreFilter]] composed with the join it accelerates: semantically
    * identical to `fact.join(dim, fact(factKey) === dim(dimKey))`, with the
    * fact side bloom-reduced before its shuffle. */
  def bloomJoin(fact: DataFrame, factKey: String,
                dim: DataFrame, dimKey: String,
                expectedItems: Long = 1000000L,
                fpp: Double = 0.03): DataFrame = {
    val reduced = bloomPreFilter(fact, factKey, dim, dimKey, expectedItems, fpp)
    reduced.join(dim, reduced(factKey) === dim(dimKey))
  }

  /** Fuzzy (edit-distance) join — the entity-resolution primitive: every
    * (left, right) pair whose strings are within Levenshtein distance
    * `maxDist`, without the cross join a naive `levenshtein(l, r) <= d`
    * predicate would plan (broadcast-nested-loop — quadratic work AND
    * quadratic candidate volume).
    *
    * Candidate generation is the FastSS deletion neighborhood: each
    * string expands to itself plus every variant reachable by deleting
    * up to `maxDist` characters. Two strings within edit distance d
    * always share a depth-d deletion variant (align them and delete the
    * edited positions from each side), so joining on variant hash is a
    * COMPLETE candidate filter; false candidates are culled by the exact
    * `levenshtein` verify in-join, making the output identical to brute
    * force. Variants travel as xxhash64 longs — fixed-width keys, no
    * long strings through the shuffle (a 2^-64 hash collision can only
    * add a candidate, which the verify removes).
    *
    * Cost model: a string of length L yields ~L^d variants (L+1 at d=1),
    * so the exploded table is d-th-order polynomial in string length but
    * LINEAR in rows — the right shape for name/title/entity columns
    * (tens of chars). The PPJoin-style length bound (|len(a) − len(b)|
    * ≤ d) cuts in-join before the verify. Very short strings (length
    * ≤ d) share variants with everything of their size class — filter
    * them out upstream if the skew shows.
    *
    * LONG-STRING GUARD: the L^d blow-up means a single 500-char string
    * at d=2 would emit ~250k variant rows, so deletion neighborhoods
    * are used only for strings of length ≤ `maxLen`. Longer strings
    * route through a positional q-gram candidate filter (q = 16):
    * every length-q substring is emitted with its position, and
    * candidates equi-join on (gram hash, position BUCKET) — buckets of
    * width d+1, probe side replicated to the 3 adjacent buckets — with
    * the exact |pa − pb| ≤ d band cut in-join. The bucket key is what
    * keeps REPETITIVE strings linear: "xxxx…" yields one distinct gram
    * at a thousand positions, and a join on gram hash alone would pair
    * all of them (quadratic, the degenerate-bucket failure LSH caps
    * with bucketCap); bucketed, each occurrence meets only the ≤ 3(d+1)
    * occurrences in adjacent buckets — constant per gram.
    * Completeness: d edits destroy at most d·q of a string's
    * len − q + 1 grams and shift survivors' positions by at most d, so
    * any string longer than q·(d+1) − 1 = 47 chars within distance d
    * of another shares an intact gram with |pa − pb| ≤ d — and
    * |pa − pb| ≤ d < bucket width means the buckets differ by at most
    * 1, which the 3-bucket replication covers. The long class
    * (len > maxLen − d ≥ 47) always qualifies. Fan-out is LINEAR in
    * length (one row per gram, ×3 on the probe side), never L^d. A
    * pair straddling the boundary (one side ≤ maxLen, other > maxLen)
    * has both lengths in (maxLen − d, maxLen + d], so both sides also
    * enter the long class — the classes overlap by `maxDist` and the
    * candidate-pair distinct collapses pairs found by both paths.
    *
    * Candidate joins carry (id, hash, position) ONLY — strings
    * re-attach to the DISTINCT candidate pairs (the band-table
    * discipline from lshTopK/minhashNearDups), so no long string rides
    * a shuffle wider than the final verified output. Both paths end in
    * the same exact `levenshtein` verify, so output stays identical to
    * brute force at every length.
    *
    * Output: (left_id, left_str, right_id, right_str, dist), one row per
    * matching pair. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftId: String, leftStr: String,
                rightId: String, rightStr: String,
                maxDist: Int = 1, maxLen: Int = 64): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      "deletion-neighborhood size is len^maxDist: supported depths are 1 and 2")
    val q = 16
    require(maxLen - maxDist >= q * (maxDist + 1) - 1,
      s"maxLen too small: long class must satisfy the q-gram count " +
        s"filter (need maxLen >= ${q * (maxDist + 1) - 1 + maxDist})")
    val bw = maxDist + 1 // position-bucket width: |pa-pb| <= d spans <= 2 buckets
    val la = left.filter(col(leftStr).isNotNull)
      .select(col(leftId).as("left_id"), col(leftStr).as("left_str"))
    val ra = right.filter(col(rightStr).isNotNull)
      .select(col(rightId).as("right_id"), col(rightStr).as("right_str"))
    def side(df: DataFrame, id: String, str: String, oid: String) =
      df.filter(col(str).isNotNull && length(col(str)) <= maxLen)
        .select(col(id).as(oid),
          explode(deletionNeighborhood(col(str), maxDist)).as("__v"))
        .select(col(oid), xxhash64(col("__v")).as("__vh"))
        .distinct()
    def gramSide(df: DataFrame, id: String, str: String, oid: String) =
      df.filter(col(str).isNotNull && length(col(str)) > maxLen - maxDist)
        .select(col(id).as(oid),
          explode(transform(sequence(lit(1), length(col(str)) - (q - 1)),
            i => struct(i.as("p"),
              xxhash64(col(str).substr(i, lit(q))).as("gh")))).as("__g"))
        .select(col(oid), col("__g")("p").as("__p"), col("__g")("gh").as("__gh"))
    val candShort = side(left, leftId, leftStr, "left_id")
      .join(side(right, rightId, rightStr, "right_id"), "__vh")
      .select("left_id", "right_id")
    val lg = gramSide(left, leftId, leftStr, "left_id")
      .select(col("left_id"), col("__p").as("__pl"), col("__gh"),
        floor((col("__p") - 1) / bw).as("__b"))
    val rg = gramSide(right, rightId, rightStr, "right_id")
      .select(col("right_id"), col("__p").as("__pr"), col("__gh"),
        explode(sequence(floor((col("__p") - 1) / bw) - 1,
                         floor((col("__p") - 1) / bw) + 1)).as("__b"))
    val candLong = lg.join(rg, Seq("__gh", "__b"))
      .filter(abs(col("__pl") - col("__pr")) <= maxDist)
      .select("left_id", "right_id")
    candShort.unionByName(candLong).distinct()
      .join(la, "left_id").join(ra, "right_id")
      .filter(abs(length(col("left_str")) - length(col("right_str"))) <= maxDist)
      .filter(levenshtein(col("left_str"), col("right_str")) <= maxDist)
      .select(col("left_id"), col("left_str"), col("right_id"),
        col("right_str"),
        levenshtein(col("left_str"), col("right_str")).cast("long").as("dist"))
  }

  /** The string itself plus every variant reachable by deleting up to
    * `depth` characters, distinct. Built from codegen'd string
    * built-ins — one `transform` + `substr` pass per depth level. */
  private def deletionNeighborhood(c: Column, depth: Int): Column = {
    // delete the character at 1-based position i, for every i
    def dels(s: Column): Column =
      when(length(s) >= 1,
        transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - lit(1)),
                      s.substr(i + lit(1), length(s)))))
        .otherwise(array().cast("array<string>"))
    var vs: Column = array(c)
    (1 to depth).foreach { _ =>
      vs = array_distinct(concat(vs, flatten(transform(vs, dels(_)))))
    }
    vs
  }

  /** Range join: pair every point row with every interval row whose
    * [lo, hi) contains the point, within an equi-bucketized plan.
    *
    * Each interval is exploded to the fixed-width buckets it covers and
    * each point hashes to its single bucket, so the join is a plain
    * equi-join on bucket id followed by the exact containment filter — no
    * n×m nested loop. Pick `bucketWidth` near the median interval length:
    * wider buckets replicate points' candidate sets, narrower buckets
    * replicate intervals. Skew appears only if one interval spans
    * thousands of buckets (then raise the width).
    *
    * `points` and `intervals` column names must be disjoint.
    */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / w).cast("long"),
                       floor(col(hiCol) / w).cast("long"))))
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / w).cast("long"))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: every (left, right) pair within the same
    * `equiKeys` group whose half-open intervals [startCol, endCol)
    * overlap — the temporal pairing primitive (concurrent sessions,
    * co-active campaigns, conflicting bookings) that [[rangeJoin]]'s
    * point-in-interval shape cannot express. Output: equiKeys, `idL`,
    * `idR`, and the overlap window (ov_start, ov_end).
    *
    * Both sides carry LONG interval bounds in `startCol`/`endCol` (e.g.
    * epoch micros) plus an id column; intervals must be non-empty
    * (start < end) and non-negative, and `idL`/`idR` must be DISTINCT
    * names (both appear in the output).
    *
    * Plan shape: each interval explodes to its covered buckets of
    * `bucketWidth` (size ≤ interval/width + 1 rows — pick the width near
    * the typical interval length), the join is an EQUI-join on
    * (equiKeys, bucket) with the exact overlap predicate evaluated
    * in-join, and each qualifying pair is emitted from exactly ONE
    * bucket — the bucket containing max(startL, startR), which every
    * overlapping pair shares — so no dropDuplicates exchange ever runs
    * (the same in-join dedup trick as the LSH band joins). No cross
    * join, no broadcast-nested-loop: the plan scales like any equi-join
    * on (key, bucket). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   equiKeys: Seq[String], idL: String, idR: String,
                   startCol: String = "start", endCol: String = "end",
                   bucketWidth: Long = 3600L * 1000000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    // exact long bucket: (x - pmod(x, w)) is an exact multiple of w and
    // `div` keeps the whole computation in longs (Divide on longs is a
    // DOUBLE divide in Spark — rounds past 2^53, e.g. epoch-nanos
    // timestamps); truncation on an exact multiple equals floor for
    // any sign, preserving pmod's floor semantics
    def bkt(c: Column): Column = call_function("div", c - pmod(c, w), w)
    def exploded(df: DataFrame, id: String, s: String, e: String) =
      df.select((equiKeys.map(col) :+ col(id) :+
          col(startCol).as(s) :+ col(endCol).as(e)): _*)
        .withColumn("__bkt",
          explode(sequence(bkt(col(s)), bkt(col(e) - 1))))
    val a = exploded(left, idL, "__ls", "__le")
    val b = exploded(right, idR, "__rs", "__re")
    a.join(b, equiKeys :+ "__bkt")
      .filter(col("__ls") < col("__re") && col("__rs") < col("__le") &&
        col("__bkt") === bkt(greatest(col("__ls"), col("__rs"))))
      .select((equiKeys.map(col) :+ col(idL) :+ col(idR) :+
        greatest(col("__ls"), col("__rs")).as("ov_start") :+
        least(col("__le"), col("__re")).as("ov_end")): _*)
  }

  /** Blocked Jaro–Winkler self-match — the record-linkage comparator
    * pass: within each blocking key (last name token, zip code,
    * normalized domain), score every id-ordered pair with the native
    * codegen'd [[org.apache.spark.sql.graft.VectorExprs.JaroWinkler]]
    * and keep those at `minSim`+. Jaro–Winkler is the linkage-standard
    * choice where edit distance over-penalizes transpositions
    * (swapped name parts, typo'd digits); the deletion-neighborhood
    * fuzzy join stays the right tool for bounded-edit matching.
    *
    * The blocking key bounds candidates exactly like the LSH band
    * joins: one equi-join on the key, per-pair scoring inside
    * whole-stage codegen, no all-pairs anywhere. The score rounds to
    * 9 places BEFORE thresholding, so the survivor set is engine- and
    * layout-exact. */
  def blockedJaroWinkler(df: DataFrame, idCol: String, nameCol: String,
                         block: Column, minSim: Double): DataFrame = {
    require(minSim >= 0 && minSim <= 1, s"minSim in [0,1], got $minSim")
    val t = df
      .filter(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(col(idCol).as("id"), col(nameCol).as("name"), block.as("__blk"))
      .filter(col("__blk").isNotNull)
    t.as("a").join(t.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(org.apache.spark.sql.graft.VectorExprs
          .jaroWinkler(col("a.name"), col("b.name")), 9).as("jw"))
      .filter(col("jw") >= minSim)
  }
}
