package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus composition operators: per-source mixing (sampling a
  * target distribution out of a heterogeneous corpus) and fixed-budget
  * shard packing (assigning documents to budget-bounded groups for
  * sequence packing / shard writing).
  */
object Mixing {

  /** Token-budget mixing planner — waterfall allocation of a global
    * training budget across sources: each source's ideal share is
    * `budget · w_g / Σw` (integer weights, integer division — exactly
    * reproducible in any engine), but no source may exceed
    * `cap = ⌊avail · maxEpochs⌋`; capped sources take their cap and the
    * freed budget redistributes over the remaining sources by the same
    * rule, cascading until no source caps (≤ |sources| rounds). The
    * "compute the achievable mixture" step that runs BEFORE
    * [[sampleByRates]] / [[upsampleByRates]] execute it.
    *
    * The waterfall iterates on the driver over the collected per-source
    * size aggregate — model-state-sized (one row per source), the same
    * bound as the ANN codebooks, never row data. Output: one row per
    * weighted-or-present source with its available/cap/allocated token
    * counts, realized epochs (one IEEE division) and a capped flag.
    * Unallocatable remainder tokens (integer-division dust or an
    * everyone-capped budget surplus) stay unspent by design. */
  def allocateBudget(corpus: DataFrame, weights: Map[String, Long],
                     budget: Long, maxEpochs: Double = 1.0,
                     groupCol: String = "source",
                     sizeCol: String = "n_chars"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val maxW = (weights.values ++ Seq(1L)).max
    require(maxW == 0 || budget <= Long.MaxValue / maxW,
      "budget * max(weight) must fit in a Long — use smaller weight units")
    val spark = corpus.sparkSession
    import spark.implicits._
    val avail = corpus.groupBy(col(groupCol))
      .agg(sum(col(sizeCol)).cast("long").as("__avail"))
      .as[(String, Long)].collect().sortBy(_._1)
    val w = avail.map { case (g, _) => weights.getOrElse(g, 0L) }
    val cap = avail.map { case (_, av) => math.floor(av * maxEpochs).toLong }
    val alloc = Array.fill(avail.length)(0L)
    var active = avail.indices.filter(i => w(i) > 0).toSet
    var remaining = budget
    var settled = false
    while (!settled && active.nonEmpty) {
      val sumW = active.iterator.map(w).sum
      val capped = active.filter(i => remaining * w(i) / sumW >= cap(i))
      if (capped.isEmpty) {
        active.foreach(i => alloc(i) = remaining * w(i) / sumW)
        settled = true
      } else {
        capped.foreach { i => alloc(i) = cap(i); remaining -= cap(i) }
        active --= capped
      }
    }
    avail.indices.map { i =>
      val (g, av) = avail(i)
      (g, av, cap(i), alloc(i), alloc(i).toDouble / av,
        w(i) > 0 && alloc(i) == cap(i))
    }.toDF(groupCol, "avail_tokens", "cap_tokens", "alloc_tokens",
      "epochs", "capped")
  }

  /** Per-stratum Bernoulli sampling via Spark's `sampleBy` — the
    * standard mixing primitive. Deterministic for a fixed seed AND fixed
    * partitioning (the RNG is per-partition); for layout-independent
    * reproducibility use [[systematicSampleByRates]]. */
  def sampleByRates(df: DataFrame, strataCol: String,
                    rates: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, rates, seed)

  /** Systematic per-stratum sampling on a key column: keeps a row iff
    * `key mod 100 < rate*100`. Fully deterministic — independent of
    * partitioning, cluster layout, and engine — which makes sampled
    * corpora reproducible and auditable (the property that matters for
    * data lineage at 100 TB). Rates are rounded to percent granularity
    * (0.29 → 29%, not a float-error 28%). Strata missing from `rates`
    * are dropped. */
  def systematicSampleByRates(df: DataFrame, strataCol: String,
                              keyCol: String,
                              rates: Map[String, Double]): DataFrame = {
    val pct: Column = rates.foldLeft(lit(0L)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(math.round(r * 100))).otherwise(acc)
    }
    df.filter(pmod(col(keyCol), lit(100L)) < pct)
  }

  /** Deterministic per-stratum UPsampling: each row is emitted
    * floor(rate) or ceil(rate) times so its stratum's expected
    * multiplicity is exactly `rate` — the source-weighting / epoch-mixing
    * primitive LLM training mixes need (rate 2.5 = "this source appears
    * 2.5× per pass"); rates < 1 downsample through the same formula
    * (most rows get 0 copies), so one operator covers the whole mixing
    * table. Which rows receive the extra copy is decided by the same
    * Knuth-hash percent bucket as [[deterministicSplit]] —
    * key-determined, layout- and engine-independent, so the upsampled
    * corpus is bit-reproducible and auditable. A 0-based `copy_id`
    * column disambiguates replicas for downstream packing/shuffles
    * (replicas are byte-identical otherwise; anything keyed downstream
    * should key on (key, copy_id)).
    *
    * Plan: a pure per-row array explode — no shuffle, no driver state;
    * output volume is Σ rate_s·|stratum_s|. Rates round to percent
    * granularity; strata missing from `rates` are dropped (as in
    * [[systematicSampleByRates]]). `keyCol` constraints as in
    * [[deterministicGroupSample]]: non-negative, < ~3.4e9. */
  def upsampleByRates(df: DataFrame, strataCol: String, keyCol: String,
                      rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(_ >= 0.0), "rates must be non-negative")
    val pct: Column = rates.foldLeft(lit(-1L)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(math.round(r * 100))).otherwise(acc)
    }
    val bucket = pmod(
      pmod(col(keyCol) * lit(2654435761L), lit(4294967296L)), lit(100L))
    val copies = floor(pct / lit(100)).cast("long") +
      when(bucket < pct % 100, 1L).otherwise(0L)
    // sequence(0, -1) would DESCEND, not empty — guard the 0-copy case
    // with an empty array so explode drops the row
    df.filter(pct >= 0)
      .withColumn("copy_id",
        explode(when(copies > 0, sequence(lit(0L), copies - 1))
          .otherwise(array().cast("array<long>"))))
  }

  /** Deterministic k-per-group sample: keeps the k rows with the
    * smallest Knuth multiplicative hash of `keyCol` within each group —
    * a uniform-ish pseudo-random pick that is exactly reproducible
    * across runs, partitionings, and engines (bottom-k-by-hash is the
    * deterministic stand-in for reservoir sampling). One shuffle on the
    * group key; the rank<=k filter gets the WindowGroupLimit pushdown,
    * so map tasks forward at most k rows per group.
    *
    * `keyCol` must be non-negative (Spark's pmod and SQL's sign-
    * preserving % disagree on negatives, breaking the cross-engine
    * claim) and below ~3.4e9 so the multiply fits in a long (ANSI
    * overflow would throw); hash wider keys down first. */
  def deterministicGroupSample(df: DataFrame, groupCol: String,
                               keyCol: String, k: Int): DataFrame = {
    require(k > 0)
    // Null keys hash to null; push them LAST (Spark's ascending default
    // is nulls first, which would hand the whole sample to junk rows)
    // — also DuckDB's default, keeping the oracle formulation aligned.
    val h = pmod(col(keyCol) * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy(groupCol)
      .orderBy(h.asc_nulls_last, col(keyCol).asc_nulls_last)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic WEIGHTED k-per-group sample: keeps the k rows with
    * the smallest hash(key)/weight within each group, so selection
    * odds rise with `weightCol` (importance sampling for corpus
    * mixing — weight by quality score, length, or source priority)
    * while staying exactly reproducible across runs, partitionings and
    * engines, like [[deterministicGroupSample]].
    *
    * The priority is one IEEE division of the integer hash by the
    * weight — deliberately NOT the textbook exponential-jitter
    * u^(1/w) (Efraimidis–Spirakis A-ES): pow/ln are correctly-rounded
    * nowhere and round differently across engines, which would break
    * bit-reproducibility; division is correctly rounded everywhere.
    * The bias this trades away is documented: a row with twice the
    * weight gets twice-smaller priority, which is weight-proportional
    * for the top pick but not the exact without-replacement k-sample
    * distribution. Rows with NULL or non-positive weight sort last —
    * they are chosen only when a group has fewer than k positively
    * weighted rows. Same `keyCol` domain caveat as
    * [[deterministicGroupSample]]; keys must be unique within a group
    * or ties are layout-dependent. One shuffle; WindowGroupLimit
    * pushdown bounds map output at k rows per group. */
  def weightedGroupSample(df: DataFrame, groupCol: String, keyCol: String,
                          weightCol: String, k: Int): DataFrame = {
    require(k > 0)
    val h = pmod(col(keyCol) * lit(2654435761L), lit(4294967296L))
      .cast("double")
    val pr = when(col(weightCol).isNotNull && col(weightCol) > 0,
      h / col(weightCol).cast("double"))
    val w = Window.partitionBy(groupCol)
      .orderBy(pr.asc_nulls_last, col(keyCol).asc_nulls_last)
    df.withColumn("__wrk", row_number().over(w))
      .filter(col("__wrk") <= k)
      .drop("__wrk")
  }

  /** Keep at most `k` rows per group, the first k under `orderCols` —
    * the per-source/per-domain cap that stops any one source from
    * dominating a mixed corpus. Generalizes the reference's keep-first
    * window idiom (etl_pipeline.py:54–65, rn=1) to rn<=k; Spark's
    * WindowGroupLimit pushdown forwards at most k rows per group from
    * the map side, so the shuffle carries capped groups, not raw ones.
    * `orderCols` should reach total order (tie-break on a unique id)
    * for a deterministic cap. */
  def capPerGroup(df: DataFrame, groupCols: Seq[Column],
                  orderCols: Seq[Column], k: Int): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Temperature-balanced corpus sampling (the multilingual-mixing rule:
    * keep stratum i with rate ∝ count_i^tau / max_j count_j^tau, so
    * tau<1 up-weights rare strata relative to their raw share and the
    * largest stratum keeps `cap` of itself). Rates are derived IN the
    * plan from a grouped count — no driver-side rate table — and applied
    * with the same percent-granularity systematic rule as
    * [[systematicSampleByRates]], so membership stays layout- and
    * engine-independent. tau = 0.5 computes via sqrt, which IEEE
    * requires correctly rounded — the cross-engine-exact setting; other
    * tau go through pow, where libm implementations may differ by an
    * ulp (membership then flips only if a rate lands within an ulp of a
    * rounding boundary).
    *
    * The rate is floored at one percent cell: a stratum whose weighted
    * share rounds to 0% still keeps ~1% of itself. Without the floor the
    * RAREST strata — the ones temperature mixing exists to up-weight —
    * would be silently eliminated whenever count^tau / max < 0.5%. */
  def temperatureSample(df: DataFrame, strataCol: String, keyCol: String,
                        tau: Double = 0.5, cap: Double = 1.0): DataFrame = {
    require(tau > 0 && cap > 0 && cap <= 1.0)
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val w = if (tau == 0.5) sqrt(col("__n").cast("double"))
            else pow(col("__n").cast("double"), lit(tau))
    val weighted = counts.select(col(strataCol), w.as("__w"))
    val mx = weighted.agg(max(col("__w")).as("__mx"))
    val rates = weighted.crossJoin(broadcast(mx))
      .select(col(strataCol),
        greatest(lit(1.0),
          round(col("__w") / col("__mx") * (100.0 * cap))).as("__pct"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(pmod(col(keyCol), lit(100L)) < col("__pct"))
      .drop("__pct")
  }

  /** Deterministic train/val/test assignment: `keyCol` is bucketed into
    * 100 cells by the same layout-independent Knuth multiplicative hash
    * as [[deterministicGroupSample]], and cells map to labels by
    * cumulative percent weight (e.g. train 98 | val 1 | test 1). The
    * same key lands in the same split on every run, partitioning, and
    * engine — membership is auditable with one SQL expression, and no
    * shuffle is introduced (a pure per-row projection). Same key-domain
    * caveat as [[deterministicGroupSample]]: non-negative keys below
    * ~3.4e9 (hash wider keys down first). */
  def deterministicSplit(df: DataFrame, keyCol: String,
                         weights: Seq[(String, Int)],
                         splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0) &&
      weights.map(_._2).sum == 100, "percent weights must sum to 100")
    val bucket = pmod(
      pmod(col(keyCol) * lit(2654435761L), lit(4294967296L)), lit(100L))
    val withCum = weights.zip(weights.scanLeft(0)(_ + _._2).tail)
    val label = withCum.init.foldRight(lit(withCum.last._1._1): Column) {
      case (((name, _), cum), acc) => when(bucket < cum, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  /** K-fold cross-validation labels: `fold = Knuth-hash(key) mod k`,
    * layout- and engine-independent like [[deterministicSplit]] (same
    * multiplicative hash), so every engine re-derives the identical
    * partition of keys into k folds; pair with a filter on `fold` to
    * materialize each train/validation rotation without ever storing k
    * copies. Zero shuffle — a pure projection. */
  def kFoldSplit(df: DataFrame, keyCol: String, k: Int,
                 foldCol: String = "fold"): DataFrame = {
    require(k > 1, "need at least 2 folds")
    df.withColumn(foldCol, pmod(
      pmod(col(keyCol) * lit(2654435761L), lit(4294967296L)), lit(k.toLong)))
  }

  /** EXACT-proportion stratified split: within every `strataCol` group,
    * rows are ranked by `orderCol` (pass a hash expression column for a
    * pseudo-random draw, or an id for an auditable one) and assigned so
    * each split receives exactly its share of the stratum —
    * ⌊n·cum_i/100⌋ − ⌊n·cum_{i−1}/100⌋ rows — off by at most the
    * integer-boundary rounding, never by hash variance. This is the
    * eval-set construction guarantee [[deterministicSplit]]'s
    * hash-bucketing cannot give (hash splits are only proportional in
    * expectation; a 5% eval slice of a 200-doc stratum can easily come
    * out 3% or 8%). Cost: one rank window per stratum plus a broadcast
    * of per-stratum counts — no global window, no driver state.
    *
    * Deterministic given (data, orderCol): ties in `orderCol` are broken
    * by nothing here, so pass a total-order column (unique ids or a
    * hash of them). */
  def stratifiedExactSplit(df: DataFrame, strataCol: String,
                           orderCol: String,
                           weights: Seq[(String, Int)],
                           splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0) &&
      weights.map(_._2).sum == 100, "percent weights must sum to 100")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    // row_number = exclusive prefix COUNT + 1, via the distributed
    // two-level sum — a per-stratum serial window would stream whole
    // strata through single tasks at scale (orderCol must be numeric)
    val rn = col("__ps_rn") + lit(1L)
    // boundary_i = floor(n * cum_i / 100). `div`, not Divide: Divide on
    // longs is a DOUBLE divide in Spark, which rounds past 2^53 and can
    // disagree with the oracle's integer `//` — div stays in longs
    // (non-negative operands, so truncation IS floor).
    val cums = weights.zip(weights.scanLeft(0)(_ + _._2).tail)
    def boundary(cum: Int): Column =
      call_function("div", col("__n") * cum, lit(100L))
    val label = cums.init.foldRight(lit(cums.last._1._1): Column) {
      case (((name, _), cum), acc) =>
        when(rn <= boundary(cum), lit(name)).otherwise(acc)
    }
    withExclusivePrefixSum(df, strataCol, orderCol, lit(1L), "__ps_rn",
        4096L)
      .join(broadcast(counts), Seq(strataCol))
      .withColumn(splitCol, label)
      .drop("__n", "__ps_rn")
  }

  /** Near-dup-leakage-safe train/val/test assignment: documents in the
    * same TRANSITIVE near-duplicate cluster always land in the same
    * split. Splitting by raw document id leaks — a near-copy of a
    * training document in the eval split inflates every metric; the
    * standard fix is to split by cluster, not by document. Pipeline:
    * MinHash-LSH pairs → connected components → each doc keyed by its
    * cluster label (its own id when it has no near-dups) →
    * [[deterministicSplit]] on that representative key. Adds the dedup
    * pipeline's shuffles plus one label join; the split itself stays a
    * per-row projection. Same key-domain caveat as
    * [[deterministicSplit]] (non-negative ids below ~3.4e9). */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       weights: Seq[(String, Int)],
                       splitCol: String = "split",
                       shingleN: Int = 3, numHashes: Int = 16,
                       bands: Int = 4,
                       threshold: Double = 0.8): DataFrame = {
    val pairs = Dedup.minhashNearDups(df, idCol, textCol,
      shingleN, numHashes, bands, threshold)
    // strict: non-converged labels would silently split near-dup
    // clusters across train/eval — the exact leak this op exists to
    // prevent — so exhaustion must fail loudly, never degrade
    val comps = Dedup.connectedComponents(pairs, strict = true)
      .withColumnRenamed("id", idCol)
    val keyed = df.join(comps, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("comp"), col(idCol)))
      .drop("comp")
    deterministicSplit(keyed, "__rep", weights, splitCol).drop("__rep")
  }

  /** Pack documents into training sequences: [[packByBudget]] assigns
    * budget-bounded shards, then each (group, shard) concatenates its
    * members' text in order with `sep` between them — the
    * sequence-packing step that turns a curated corpus into
    * fixed-budget training rows (sep stands in for the EOS/attention-
    * reset boundary a tokenizer would insert). Output: (groupCol,
    * shard, seq, total_weight, n_docs). Adds one regroup shuffle on top
    * of packByBudget's window; the ordered concat is an array_sort over
    * collected (order, text) structs — per-shard data, never the
    * corpus. */
  def packSequences(df: DataFrame, groupCol: String, orderCol: String,
                    weightCol: String, textCol: String, budget: Long,
                    sep: String = " <eos> "): DataFrame =
    packByBudget(df, groupCol, orderCol, weightCol, budget)
      .groupBy(col(groupCol), col("shard"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol), col(textCol)))),
            x => x(textCol)),
          sep).as("seq"),
        sum(col(weightCol)).as("total_weight"),
        count(lit(1)).as("n_docs"))

  /** [[packSequences]] plus the per-shard structure arrays a trainer
    * consumes: the packed document ids in order, their weights
    * (token-count stand-ins), and `doc_starts` — exclusive cumulative
    * offsets of each document in the concatenated weight space (the
    * attention-reset / position-id boundaries for packed-sequence
    * training; separators are not counted). The offset scan is an
    * in-array `aggregate` HOF over the shard's OWN length array, so the
    * whole operator still costs exactly one group-key shuffle — the
    * boundary arrays add zero exchanges. */
  def packWithBoundaries(df: DataFrame, groupCol: String, orderCol: String,
                         weightCol: String, textCol: String, budget: Long,
                         sep: String = " <eos> "): DataFrame =
    packByBudget(df, groupCol, orderCol, weightCol, budget)
      .groupBy(col(groupCol), col("shard"))
      .agg(array_sort(
        collect_list(struct(col(orderCol), col(weightCol), col(textCol))))
        .as("__docs"))
      .select(col(groupCol), col("shard"),
        array_join(transform(col("__docs"), x => x(textCol)), sep).as("seq"),
        transform(col("__docs"), x => x(orderCol)).as("doc_ids"),
        transform(col("__docs"), x => x(weightCol)).as("doc_lens"),
        slice(
          aggregate(
            transform(col("__docs"), x => x(weightCol).cast("long")),
            array(lit(0L)),
            (acc, x) => concat(acc, array(element_at(acc, -1) + x))),
          lit(1), size(col("__docs"))).as("doc_starts"))

  /** GPT-style CONTIGUOUS packing: concatenate each group's documents
    * into one token stream (ordered by `orderCol`) and cut it every
    * `budget` tokens EXACTLY — documents SPAN example boundaries
    * instead of rounding shards up like [[packByBudget]] (whose greedy
    * fill leaves per-shard slack; pretraining wants every example
    * exactly `budget` tokens with no padding). Output: one row per
    * (document, example) SPAN — `example` the fixed-length example
    * index, `tok_start`/`tok_end` the half-open token range of this
    * document consumed by that example; a document of weight L at
    * stream offset S covers examples ⌊S/B⌋..⌊(S+L-1)/B⌋. A trainer
    * materializes example e by concatenating its spans in (orderCol,
    * tok_start) order; attention resets ride the span boundaries.
    *
    * All-integer arithmetic (span bounds by div/min/max over exact
    * stream offsets), so the span table is engine-exact. Zero-weight
    * docs contribute nothing and are dropped.
    *
    * The stream offsets come from a DISTRIBUTED two-level prefix sum,
    * not one window per group: `Window.partitionBy(groupCol)` would
    * stream each group's ENTIRE corpus through a single task — fine at
    * test scale, broken at 5 TB/source. Instead (1) rows bucket by
    * `orderCol div orderBucketWidth` (monotone in the order, computed
    * scan-side, no global pass), (2) per-(group, bucket) totals
    * aggregate in parallel, (3) the exclusive bucket-offset window runs
    * over BUCKET-COUNT rows per group (millions of longs at 100 TB —
    * trivial for one task), (4) the within-bucket exclusive window
    * partitions by (group, bucket) — parallel across the cluster. Same
    * math, same output, no group-sized serial scan; `orderCol` must be
    * numeric for the bucketing (doc ids are). */
  def packContiguous(df: DataFrame, groupCol: String, orderCol: String,
                     weightCol: String, budget: Long,
                     orderBucketWidth: Long = 4096L): DataFrame = {
    require(budget > 0)
    val rows = df.select(col(groupCol), col(orderCol),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
    withExclusivePrefixSum(rows, groupCol, orderCol, col("__w"), "__s",
        orderBucketWidth)
      .select(col(groupCol), col(orderCol), col("__w"), col("__s"),
        explode(sequence(
          expr(s"__s div $budget"),
          expr(s"(__s + __w - 1) div $budget"))).as("example"))
      .select(col(groupCol), col("example"), col(orderCol),
        greatest(lit(0L), col("example") * budget - col("__s"))
          .as("tok_start"),
        least(col("__w"), (col("example") + 1) * budget - col("__s"))
          .as("tok_end"))
  }

  /** Distributed EXCLUSIVE prefix sum of `weight` over each group's
    * `orderCol` order, added as `out` — the two-level construction
    * both packers share: (1) rows bucket by `orderCol div width`
    * (monotone in the order, computed scan-side), (2) per-(group,
    * bucket) totals aggregate in parallel, (3) the bucket-offset
    * window runs over bucket-COUNT rows per group, (4) the
    * within-bucket window partitions by (group, bucket) — parallel.
    * `orderCol` must be numeric; all input columns carry through. */
  private def withExclusivePrefixSum(df: DataFrame, groupCol: String,
                                     orderCol: String, weight: Column,
                                     out: String, width: Long): DataFrame = {
    require(width > 0)
    withExclusivePrefixSumOrdered(df, groupCol,
      (col(orderCol) / lit(width)).cast("long"), Seq(col(orderCol)),
      weight, out)
  }

  /** Estimated input size threshold (bytes) under which the prefix sum
    * keeps the plain one-window-per-group plan. The two-level
    * construction exists so no group ever streams through a single
    * window task at scale, but it costs an extra aggregate + join —
    * a fixed overhead that at bench scale made `prepare`/
    * `qualityPrune` ~1.5× slower for nothing (the whole corpus fits
    * one task's window with room to spare).
    *
    * The probe sums the LEAF relations' estimated sizes (scan file
    * sizes — the statistic Spark's own broadcast decision trusts), not
    * the derived plan's estimate: multiplicative join estimates above
    * the leaves run orders of magnitude high mid-pipeline (exactly
    * where `prepare`'s pack stage sits), which would pin the cutoff
    * permanently off. Leaf sizes bound what the window can see for the
    * drop/sample/pack pipelines these prefix sums serve (they contract
    * data); a caller exploding a small scan far past the threshold
    * gets a slow-but-correct single task, never a wrong answer. Costs
    * zero jobs. 256 MB of scan input is comfortable for one window
    * task; at any real scale the leaves alone cross the bar and the
    * distributed construction engages. Overridable via the
    * `graft.mixing.singleWindowMaxBytes` system property (0 forces the
    * two-level construction — how the spec pins both branches equal). */
  private def singleWindowMaxBytes: BigInt = BigInt(
    sys.props.get("graft.mixing.singleWindowMaxBytes").map(_.toLong)
      .getOrElse(256L << 20))

  /** Leaf sizes from the ANALYZED plan, not the optimized one: file
    * relations resolve (and carry their scan-size stats) at analysis,
    * and probing `optimizedPlan` here ran a FULL extra Catalyst
    * optimization of the whole upstream tree during frame
    * CONSTRUCTION — measured ~1s of driver time per pack call on the
    * tokenizer-encode plans (r15), for a decision the analyzed leaves
    * answer identically. Un-pruned self-join leaves can only
    * over-count, which errs toward the scale-safe two-level branch. */
  private def leafInputBytes(df: DataFrame): BigInt =
    df.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).sum

  /** General form of the two-level prefix sum: `bucket` must be
    * monotone NON-DECREASING along `orderCols`' ordering and constant
    * across order-ties (any scan-side projection of the sort key works:
    * `orderCol div width`, `-floor(score·K)` for a DESC score, …). The
    * bucket-offset window sees bucket-count rows per group; the
    * within-bucket window partitions by (group, bucket) — no
    * group-sized serial scan anywhere.
    *
    * Small inputs (estimated ≤ [[singleWindowMaxBytes]]) skip the
    * two-level machinery for the direct per-group window — bit-
    * identical output (bucket is monotone along `orderCols`, and the
    * summed weights are integers, so summation order cannot drift)
    * with one shuffle instead of two and no join. */
  private[graft] def withExclusivePrefixSumOrdered(
      df: DataFrame, groupCol: String, bucket: Column,
      orderCols: Seq[Column], weight: Column, out: String): DataFrame = {
    if (leafInputBytes(df) <= singleWindowMaxBytes) {
      val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      // column order matches the two-level branch, whose using-join
      // fronts the group key — consumers see one schema either way
      return df.withColumn(out, coalesce(sum(weight).over(w), lit(0L)))
        .select(col(groupCol) +:
          (df.columns.filter(_ != groupCol).map(col).toSeq :+ col(out)): _*)
    }
    val rows = df.withColumn("__ps_b", bucket)
    val bucketBefore = Window.partitionBy(groupCol).orderBy(col("__ps_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = rows.groupBy(col(groupCol), col("__ps_b"))
      .agg(sum(weight).as("__ps_bw"))
      .select(col(groupCol), col("__ps_b"),
        coalesce(sum(col("__ps_bw")).over(bucketBefore), lit(0L))
          .as("__ps_boff"))
    val withinBefore = Window.partitionBy(col(groupCol), col("__ps_b"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(bucketOffsets, Seq(groupCol, "__ps_b"))
      .withColumn(out, col("__ps_boff") +
        coalesce(sum(weight).over(withinBefore), lit(0L)))
      .drop("__ps_b", "__ps_boff")
  }

  /** Materialize [[packContiguous]]'s spans into the actual training
    * rows: join each span to its document's token-id sequence, slice
    * the half-open [tok_start, tok_end) range, and concatenate each
    * example's slices in document order — (groupCol, example,
    * n_tokens, token_ids), every example exactly `budget` tokens
    * except the final partial tail per group. This is the row a
    * training loader ships; the span table stays the cheap exchange
    * format (ids + offsets, no token bytes) until this last step.
    *
    * `seqCol` is the canonical comma-joined id string ([[Ngrams.bpeEncode]]'s
    * driver-gate form). Cost: one join from spans to sequences on the
    * doc key and one regroup by (group, example) — the only stage in
    * the chain that moves token payloads, so it runs LAST. */
  def materializeExamples(spans: DataFrame, enc: DataFrame,
                          idCol: String, groupCol: String,
                          seqCol: String = "token_ids"): DataFrame = {
    val ids = enc.select(col(idCol), split(col(seqCol), ",").as("__ids"))
    spans.join(ids, Seq(idCol))
      .select(col(groupCol), col("example"), col(idCol),
        slice(col("__ids"), col("tok_start") + 1,
          col("tok_end") - col("tok_start")).as("__slice"))
      .groupBy(col(groupCol), col("example"))
      .agg(
        sum(size(col("__slice"))).cast("long").as("n_tokens"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col(idCol), col("__slice")))),
          x => x("__slice"))), ",").as("token_ids"))
  }

  /** Deterministic epoch shuffle order: `epoch_rank` = dense position
    * of the Knuth multiplicative hash of `keyCol · (seed·2+1)` — a
    * layout- and engine-independent pseudo-random training order that
    * any two runs (and the SQL oracle) agree on exactly, unlike
    * `orderBy(rand(seed))` whose sampling is partition-dependent.
    * Different seeds decorrelate epochs (the odd multiplier keeps the
    * product full-period mod 2^32). Rank comes from the distributed
    * two-level prefix count bucketed by the hash itself — no global
    * serial sort window. Same key-domain contract as the other mixing
    * ops: non-negative keys, `key·(2·seed+1)` under ~3.4e9. */
  def epochShuffle(df: DataFrame, keyCol: String, seed: Long,
                   rankCol: String = "epoch_rank"): DataFrame = {
    require(seed >= 0)
    val h = pmod(col(keyCol) * lit(2 * seed + 1) * lit(2654435761L),
      lit(4294967296L))
    val hashed = df.withColumn("__eh", h).withColumn("__eg", lit(0))
    withExclusivePrefixSumOrdered(hashed, "__eg",
        bucket = (col("__eh") / lit(1 << 22)).cast("long"),
        orderCols = Seq(col("__eh"), col(keyCol)),
        weight = lit(1L), out = rankCol)
      .drop("__eh", "__eg")
  }

  /** Greedy fixed-budget shard assignment: within each `groupCol`
    * (ordered by `orderCol`), rows are packed into shards of at most
    * `budget` total `weightCol` (a row larger than the budget gets its
    * own shard). Adds a `shard` column = preceding-weight-sum div
    * budget, via the same distributed two-level prefix sum as
    * [[packContiguous]] — no group-sized serial window (`orderCol`
    * must be numeric). */
  def packByBudget(df: DataFrame, groupCol: String, orderCol: String,
                   weightCol: String, budget: Long,
                   orderBucketWidth: Long = 4096L): DataFrame = {
    require(budget > 0)
    withExclusivePrefixSum(df, groupCol, orderCol, col(weightCol),
        "__cum_before", orderBucketWidth)
      .withColumn("shard", expr(s"__cum_before div $budget"))
      .drop("__cum_before")
  }

  /** Length-bucketed batching report: quantile token-length buckets and
    * the padding waste a fixed-shape batch of each bucket would carry —
    * the planning step behind dynamic batching (batch docs of similar
    * length together so the pad-to-max overhead stays small; padding
    * waste across ONE global batch shape is the number this report
    * refutes).
    *
    * Bucket boundaries are the exact (nBuckets-1) interior quantiles of
    * the per-doc token count; a doc lands in the first bucket whose
    * boundary is >= its length (i.e. bucket = 1 + #boundaries strictly
    * below it). Boundaries ride a one-row aggregate broadcast-joined
    * onto the corpus — no driver action, the plan stays lazy. Exact
    * `percentile` keeps per-partition state bounded by the number of
    * DISTINCT lengths (a small domain), not rows, so the single
    * aggregate holds at corpus scale; `pad_frac` is integer arithmetic
    * until one final division, so the oracle reproduces it exactly.
    *
    * Output: one row per non-empty bucket — doc count, min/max length,
    * and pad_frac = wasted/total token slots at pad-to-bucket-max. */
  def lengthBuckets(docs: DataFrame, nBuckets: Int = 4,
                    idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val lens = docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("tok_len"))
    val bounds = lens.agg(
      percentile(col("tok_len"),
        array(ps.map(lit(_)): _*)).as("__bs"))
    lens.crossJoin(broadcast(bounds))
      .select(col("tok_len"),
        (size(filter(col("__bs"),
          b => b < col("tok_len"))) + 1).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
           min(col("tok_len")).as("min_len"),
           max(col("tok_len")).as("max_len"),
           sum(col("tok_len")).as("__sum"))
      .select(col("bucket"), col("n_docs"), col("min_len"), col("max_len"),
        when(col("max_len") > 0,
            round((col("n_docs") * col("max_len") - col("__sum"))
              .cast("double") / (col("n_docs") * col("max_len")), 9))
          .otherwise(lit(0.0)).as("pad_frac"))
  }

  /** Deterministic fixed-size sample per stratum: the k rows of each
    * group whose MD5(id) digests sort first — a seedless, engine- and
    * layout-independent "random" sample (MD5 of the id text is the
    * shared coin every engine can flip identically), reproducible
    * forever without storing a sample list. The eval-slice /
    * spot-check-extraction primitive: re-running it next quarter on the
    * grown corpus keeps previously-sampled ids in the sample iff they
    * still win their hash rank, and an auditor can verify membership
    * from the id alone.
    *
    * One grouped window (shuffle on the stratum key, top-k rank
    * filter); Spark's WindowGroupLimit pushes the `rank <= k` cut into
    * the sort, so no group ever materializes fully. The digest is
    * computed on `CAST(id AS STRING)` — cheap, and textual so the
    * oracle side is the same bytes. */
  def hashSample(df: DataFrame, strataCol: String, idCol: String,
                 k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(strataCol), col(idCol),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= k)
  }

  /** Weighted priority sample (Efraimidis–Spirakis A-Res), seedless
    * and deterministic: each row draws its uniform from the first 13
    * hex digits of MD5(id) — the same engine-shared coin as
    * [[hashSample]] — and the k rows per stratum with the largest
    * u^(1/weight) win, giving inclusion probability proportional to
    * weight (the long-document up-weighting / importance-mixing
    * primitive). Reproducible forever from ids alone; rows with
    * non-positive or NULL weight are excluded.
    *
    * Ordering uses the equivalent monotone key ln(u)/weight (no pow —
    * ln is the one transcendental both engines evaluate identically),
    * rounded to 9 places with an id tie-break so the survivor set is
    * engine- and layout-exact. One grouped window; the rank ≤ k cut
    * fuses into the sort via WindowGroupLimit, so no stratum ever
    * materializes fully. */
  /** Balanced deterministic source interleave — the epoch ordering that
    * guarantees ALTERNATION, not just shuffled mixing: row i of the
    * output cycles source₀, source₁, … so no window of |sources|
    * consecutive training rows is single-source (long same-source runs
    * are the batch-composition failure [[epochShuffle]]'s global hash
    * order only makes improbable, never impossible). Within each source
    * rows order by the Knuth hash of their key (layout- and engine-
    * independent); `ord` = (within-source rank − 1)·|sources| +
    * source-index is a strict total order any engine reproduces.
    * Smaller sources exhaust early and the tail cycles through the
    * survivors (ord stays strictly increasing per source — consumers
    * sort by ord). One source-keyed rank exchange + a |sources|-row
    * broadcast; same non-negative-key-domain caveat as
    * [[deterministicSplit]]. */
  def interleaveSources(df: DataFrame, sourceCol: String,
                        keyCol: String): DataFrame = {
    val h = pmod(col(keyCol) * lit(2654435761L), lit(4294967296L))
    val rw = Window.partitionBy(col(sourceCol)).orderBy(h, col(keyCol))
    val idxW = Window.orderBy(col(sourceCol))
    val srcIdx = df.select(col(sourceCol)).distinct()
      .select(col(sourceCol),
        (row_number().over(idxW) - 1).cast("long").as("__si"),
        count(lit(1)).over(Window.partitionBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          .as("__ns"))
    df.join(broadcast(srcIdx), sourceCol)
      .withColumn("ord",
        (row_number().over(rw).cast("long") - 1) * col("__ns") +
          col("__si"))
      .drop("__si", "__ns")
  }

  /** Deterministic negative sampling for implicit-feedback training
    * (the word2vec / recsys "sample k non-interacted items per user"
    * step) — at catalog scale the naive per-user catalog scan is
    * |users|·|items|, so candidates come from HASH BUCKETS: items split
    * into `buckets` by their hashed id, each user draws from the ONE
    * bucket its (user, round) hash picks (≈|items|/buckets candidates
    * per user; successive `round` values rotate buckets for coverage
    * across epochs), observed pairs anti-join out, and a per-user hash
    * rank keeps `k`. Fully deterministic and engine-replayable — item
    * ids hash through the char-polynomial [[TextAnalysis.fingerprint]]
    * recurrence and users through the Knuth multiplicative hash, so an
    * independent engine reproduces the exact sample (no rand()). A
    * user whose bucket holds fewer than k unseen items yields fewer
    * negatives that round — the standard trade, resolved by more
    * rounds. Output: (user, item, rank). */
  def negativeSample(interactions: DataFrame, userCol: String,
                     itemCol: String, k: Int, buckets: Int = 16,
                     round: Long = 0L): DataFrame = {
    require(k > 0 && buckets > 0)
    val m32 = lit(4294967296L)
    val knuth = lit(2654435761L)
    val items = interactions.select(col(itemCol).as("item")).distinct()
      .select(col("item"),
        graft.operators.TextAnalysis.fingerprint(
          col("item").cast("string")).as("__h"))
      .withColumn("__bkt",
        pmod(pmod(col("__h") * knuth, m32), lit(buckets.toLong)))
    val users = interactions.select(col(userCol).as("user")).distinct()
      .withColumn("__bkt", pmod(
        pmod((col("user") + lit(round)) * knuth, m32),
        lit(buckets.toLong)))
    val seen = interactions
      .select(col(userCol).as("user"), col(itemCol).as("item")).distinct()
    val w = Window.partitionBy(col("user")).orderBy(
      pmod((col("user") * 31 + col("__h") + lit(round)) * knuth, m32),
      col("item"))
    users.join(items, "__bkt")
      .join(seen, Seq("user", "item"), "left_anti")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("user"), col("item"), col("rank"))
  }

  /** Neyman-optimal stratified sample allocation (Neyman 1934): given a
    * total budget of `totalN` sampled rows, allocate nₕ ∝ Nₕ·Sₕ — more
    * budget to big AND internally-varied strata — the allocation that
    * minimizes the stratified estimator's variance at fixed cost. The
    * planning half of stratified sampling: feed `alloc` per stratum to
    * [[hashSample]]/[[deterministicGroupSample]] to execute the draw.
    *
    * Engine-exact: population σ comes from exact-DECIMAL sums via the
    * fixed-order closed form (9-dec rounded), weights Nₕ·σₕ round once
    * more, and integerization is largest-remainder with a (fraction
    * DESC, stratum) tie-break — any engine reproduces the same integer
    * allocation. Zero-variance strata get 0 (one row tells you
    * everything; the caller seeds certainty strata separately). `alloc`
    * may exceed Nₕ for extreme σ — `alloc_capped` clamps; the freed
    * budget cascade is [[allocateBudget]]'s job. One grouped aggregate
    * + one strata-bounded window. */
  def neymanAllocation(df: DataFrame, strataCol: String, valCol: String,
                       totalN: Long): DataFrame = {
    require(totalN > 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 9)
    val x = col(valCol).cast("double")
    val st = df.filter(x.isNotNull)
      .groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(x.cast(dec)).as("__sx"),
        sum((x * x).cast(dec)).as("__sxx"))
      .select(col("stratum"), col("n_rows"),
        round(sqrt(greatest(
          col("n_rows").cast("double") * col("__sxx").cast("double") -
            col("__sx").cast("double") * col("__sx").cast("double"),
          lit(0.0))) / col("n_rows"), 9).as("sd"))
    val wgt = st.withColumn("__w", round(col("n_rows") * col("sd"), 9))
    val tot = wgt.agg(
      sum(col("__w").cast(dec)).cast("double").as("__tw"))
    val whole = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rw = Window.partitionBy(lit(1))
      .orderBy((col("__share") - col("__floor")).desc, col("stratum"))
    wgt.crossJoin(broadcast(tot))
      .withColumn("__share", when(col("__tw") > 0,
        lit(totalN.toDouble) * col("__w") / col("__tw"))
        .otherwise(lit(0.0)))
      .withColumn("__floor", floor(col("__share")).cast("long"))
      .withColumn("__rank", row_number().over(rw))
      .withColumn("__tf", sum(col("__floor")).over(whole))
      .select(col("stratum"), col("n_rows"), col("sd"),
        // all-zero-variance corpus (tw = 0): Neyman has nothing to
        // allocate — emit 0s rather than spraying remainder +1s
        (col("__floor") + when(col("__tw") > 0 &&
          col("__rank") <= lit(totalN) - col("__tf"), 1L).otherwise(0L))
          .as("alloc"))
      .withColumn("alloc_capped", least(col("alloc"), col("n_rows")))
  }

  def weightedPrioritySample(df: DataFrame, strataCol: String,
                             idCol: String, weightCol: String,
                             k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val wgt = col(weightCol).cast("double")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 13),
      16, 10).cast("double") / lit(4503599627370496.0) // 16^13 = 2^52
    val key = round(log(u) / wgt, 9)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(key.desc, col(idCol))
    df.filter(wgt.isNotNull && wgt > 0)
      .select(col(strataCol), col(idCol), col(weightCol),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= k)
  }
}
