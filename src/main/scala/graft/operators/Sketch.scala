package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches (SURVEY §2 ops 118-119).
  *
  * Why sketches are first-class at 100 TB: `count(DISTINCT x)` and
  * exact heavy-hitters both shuffle EVERY distinct value — on a
  * 100 TB corpus the distinct-token set alone is larger than most
  * clusters' aggregate memory. A sketch replaces that with a
  * fixed-size, commutative, map-side-combinable state: registers
  * (HyperLogLog, Flajolet et al. 2007) or counters (Count-Min,
  * Cormode & Muthukrishnan 2005). Partial aggregation collapses each
  * input partition to KBs before the exchange, the merge is max/sum
  * per cell, and sketches from different days / sources / partitions
  * union without rescanning data — the property the whole lakehouse
  * rollup pattern rides on.
  *
  * Engine-neutral construction (SURVEY §6): all hashing is md5 hex
  * slices (`conv(substr(md5(v),…),16,10)`), the register rank is
  * derived from `length(bin(x))` (identical in DuckDB), and the only
  * transcendental (the low-range `ln` correction) is quantized to
  * 1e-6 before comparison — so the DuckDB oracle replays the sketch
  * bit-for-bit, registers included.
  */
object Sketch {

  /** md5-derived 32-bit uniform hash of a column (hex chars [from, from+8)). */
  private def h32(v: Column, from: Int): Column =
    conv(substring(md5(v.cast("string")), from, 8), 16, 10).cast("long")

  /** The KMV hash column, public so the streaming twin
    * ([[graft.streaming.Stateful.kmvSketchStream]]) stages the
    * IDENTICAL hash upstream of its typed state transition — bit
    * parity between the batch and streamed sketches rests on the two
    * paths hashing with one expression.
    */
  def kmvHash(v: Column): Column = h32(v, 1)

  /** alpha_m · m² of the HLL estimator (large-m alpha). Public so the
    * SQL oracle inlines the bit-identical double literal.
    */
  def hllAlphaM2(m: Int): Double = 0.7213 / (1.0 + 1.079 / m) * m * m

  /** HyperLogLog register table: one row per (group, register) with the
    * max rank observed. Register index = first 32 hash bits mod m;
    * rank = 1 + leading zeros of the NEXT 32 bits (1..33, 33 for the
    * all-zero pattern). `max` is duplicate- and order-insensitive, so
    * no distinct pass is needed anywhere, the agg is map-side
    * combinable, and register tables from disjoint corpora merge by
    * another max — the mergeability that makes the sketch worth it.
    *
    * m must be a power of two ≥ 128 (the alpha constant below assumes
    * the large-m regime).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   m: Int = 256): DataFrame = {
    require(m >= 128 && (m & (m - 1)) == 0, s"m must be a power of two >= 128, got $m")
    val v = col(valueCol)
    val x = h32(v, 9) // rank source: second 32-bit slice
    // leading zeros of a 32-bit pattern via bit length: bin(x) has no
    // leading zeros, so lz = 32 - length(bin(x)); x = 0 => rank 33.
    val rank = when(x === 0, lit(33))
      .otherwise(lit(33) - length(bin(x)))
    // A NULL value carries no cardinality; un-filtered it would form a
    // null register row and corrupt v_zero = m - n_regs downstream.
    df.where(v.isNotNull)
      .select(groupCols.map(col) ++ Seq(
        (h32(v, 1) % m).as("reg"), rank.as("rank")): _*)
      .groupBy(groupCols.map(col) :+ col("reg"): _*)
      .agg(max(col("rank")).as("max_rank"))
  }

  /** Estimate per group from a register table (standard HLL with the
    * small-range linear-counting correction; no sparse mode — the
    * register table IS the sparse representation). The harmonic sum
    * uses exact binary fractions (`1 / (1L << rank)`), absent
    * registers contribute 2^0 = 1 each, so everything up to the final
    * quantized division/ln is integer-exact and engine-neutral.
    *
    * Output: group cols, `n_regs` (registers set), `est_distinct`
    * (quantized to 1e-6).
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  m: Int = 256): DataFrame = {
    require(m >= 128 && (m & (m - 1)) == 0, s"m must be a power of two >= 128, got $m")
    // Σ 2^-rank over set registers; ranks ≤ 33 so each term and the
    // partial sums are exact doubles (53-bit window is never exceeded).
    val sumInv =
      sum(lit(1.0) / expr("shiftleft(1L, CAST(max_rank AS INT))").cast("double"))
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_regs"), sumInv.as("sum_inv"))
      .withColumn("v_zero", lit(m) - col("n_regs"))
      .withColumn("raw_est",
        lit(hllAlphaM2(m)) / (col("sum_inv") + col("v_zero").cast("double")))
      .withColumn("est_distinct",
        floor(when(col("raw_est") <= lit(2.5 * m) && col("v_zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
          .otherwise(col("raw_est")) * 1e6 + 0.5) / 1e6)
      .select(groupCols.map(col) :+ col("n_regs") :+ col("est_distinct"): _*)
  }

  /** Pairwise distinct-overlap estimates between groups, by register
    * algebra alone: |A∪B| comes from max-merging the two groups'
    * register tables (no rescan of either corpus), and
    * |A∩B| = |A| + |B| − |A∪B| by inclusion-exclusion. The intersect
    * estimate inherits ~3× the union's error (three estimates
    * subtract), the classic HLL-intersection caveat — fine for "how
    * much do these sources overlap" triage, which is the curation
    * question (shared boilerplate / mirrored content across crawls).
    *
    * Input is a register table from [[hllRegisters]] with ONE group
    * column named `g`. Output: (ga, gb, est_a, est_b, est_union,
    * est_intersect) for each unordered pair ga < gb. Register tables
    * are m rows per group, so the pair join is trivially small —
    * everything here is sketch-sized, nothing corpus-sized.
    */
  def hllOverlap(registers: DataFrame, m: Int = 256): DataFrame = {
    val groups = registers.select(col("g")).distinct()
    // Every unordered pair (tiny: |groups|² rows), each side's
    // registers replicated into its pairs, then one max-merge — the
    // union sketch per pair without touching any corpus row.
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .where(col("ga") < col("gb"))
    val contrib = registers.select(col("g").as("ga"), col("reg"), col("max_rank"))
        .join(pairs, "ga")
      .unionByName(
        registers.select(col("g").as("gb"), col("reg"), col("max_rank"))
          .join(pairs, "gb"))
    val merged = contrib.groupBy(col("ga"), col("gb"), col("reg"))
      .agg(max(col("max_rank")).as("max_rank"))
    val estU = hllEstimate(merged, Seq("ga", "gb"), m)
      .withColumnRenamed("est_distinct", "est_union").drop("n_regs")
    val estSingle = hllEstimate(registers, Seq("g"), m).drop("n_regs")
    estU
      .join(estSingle.select(col("g").as("ga"), col("est_distinct").as("est_a")), "ga")
      .join(estSingle.select(col("g").as("gb"), col("est_distinct").as("est_b")), "gb")
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
  }

  /** Count-Min counter table over the exploded values of `valueCol`:
    * `depth` hash rows × `width` columns, counter = Σ occurrences at
    * (row j, position h_j(v)). Fixed depth·width size regardless of
    * corpus size, sum-mergeable, map-side combinable — the frequency
    * twin of the HLL register table. Each hash row uses a disjoint
    * salted md5 ("j:value"), so rows are independent as the CM
    * guarantee requires.
    */
  def cmsCounters(df: DataFrame, valueCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    // NULL values carry no frequency (and would hash to a null cell).
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
    rows
      .select(col("j"),
        (h32(concat(col("j").cast("string"), lit(":"), col("v")), 1) % width)
          .as("pos"))
      .groupBy(col("j"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Heavy hitters via Count-Min probe: estimate(v) = min over hash
    * rows of the counter at h_j(v) (an overestimate, never under),
    * ranked (estimate desc, value asc), top `topK` by a global
    * TakeOrdered — a limit, not a single-partition window. The probe
    * set is the distinct values; the counter table (depth·width rows)
    * broadcasts, so the probe is a map-side hash join plus one
    * per-value min — nothing corpus-sized shuffles twice. The exact
    * count rides along for the error story (est ≥ exact always).
    */
  def cmsTopK(df: DataFrame, valueCol: String, depth: Int = 4,
              width: Int = 1024, topK: Int = 10): DataFrame = {
    // One token shuffle total: counters derive from the SAME distinct
    // count aggregate the probe needs (counter cell = Σ exact counts
    // hashing there — identical to hashing every occurrence, at
    // depth·|distinct| hashed rows instead of depth·|tokens|).
    val exact = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("exact_cnt"))
    val probes = probePositions(exact, depth, width)
    val counters = probes.groupBy(col("j"), col("pos"))
      .agg(sum(col("exact_cnt")).cast("long").as("cnt"))
    rankProbes(probes, counters, topK)
  }

  /** Heavy-hitter probe against a PREBUILT counter table (e.g. the
    * max-merged sink of a streaming [[cmsCounters]] run) — same probe
    * join and ranking as [[cmsTopK]], counter provenance independent.
    */
  def cmsProbeTopK(df: DataFrame, valueCol: String, counters: DataFrame,
                   depth: Int = 4, width: Int = 1024,
                   topK: Int = 10): DataFrame = {
    val exact = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("exact_cnt"))
    rankProbes(probePositions(exact, depth, width), counters, topK)
  }

  private def probePositions(exact: DataFrame, depth: Int,
                             width: Int): DataFrame =
    exact.where(col("v").isNotNull) // null probes can't match a cell
      .select(col("v"), col("exact_cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("pos",
        h32(concat(col("j").cast("string"), lit(":"), col("v")), 1) % width)

  private def rankProbes(probes: DataFrame, counters: DataFrame,
                         topK: Int): DataFrame =
    probes.join(broadcast(counters), Seq("j", "pos"))
      .groupBy(col("v"), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .orderBy(col("est_cnt").desc, col("v"))
      .limit(topK)

  // ------------------------------------------------------------ KMV

  /** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; the
    * basis of the DataSketches theta family): per group, keep the k
    * smallest DISTINCT 32-bit hash values. Where HLL answers only
    * "how many distinct", a KMV sketch is a uniform SAMPLE of the
    * distinct set — so merged sketches also answer set-overlap
    * questions (Jaccard, see [[kmvJaccard]]) that HLL's
    * inclusion-exclusion can only approximate at compounded error.
    *
    * Scale shape: dedupe is a (group, h) hash agg (map-side
    * combinable — duplicates of a value collapse per partition before
    * the exchange). The bottom-k is TWO bounded windows, never one
    * giant sort: first within (group, h mod buckets) — each bucket
    * partition holds ~1/buckets of the group's distinct hashes — then
    * within group over the surviving ≤ buckets·k rows. Any global
    * bottom-k element is necessarily in its bucket's bottom-k, so the
    * two-level cut is lossless. Output: group cols, `h`, `rank`
    * (1..k by ascending h).
    *
    * Mergeability (same losslessness): a hash among the k smallest of
    * a union is among the k smallest of its own source, so the union
    * sketch is exactly the bottom-k of the UNION OF SKETCHES — KB of
    * input, no corpus rescan.
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int = 64, buckets: Int = 32): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val v = col(valueCol)
    val g = groupCols.map(col)
    val hashed = df.where(v.isNotNull)
      .select(g :+ h32(v, 1).as("h"): _*)
      .distinct()
    val wBucket = Window.partitionBy(g :+ (col("h") % buckets): _*)
      .orderBy(col("h"))
    val wGroup = Window.partitionBy(g: _*).orderBy(col("h"))
    hashed
      .withColumn("r1", row_number().over(wBucket))
      .where(col("r1") <= k).drop("r1")
      .withColumn("rank", row_number().over(wGroup))
      .where(col("rank") <= k)
  }

  /** Distinct estimate from a KMV sketch: (k−1) / R_k where R_k is
    * the k-th smallest hash normalized to (0,1]. A group with fewer
    * than k distinct hashes IS its own sketch — the count is exact.
    * Estimates quantize to 1e-6 (engine-neutral). Output: group cols,
    * `n_kept`, `est_distinct`.
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String],
                  k: Int = 64): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(4294967296.0) /
            col("kth").cast("double") * 1e6 + 0.5) / 1e6))
      .drop("kth")

  /** Pairwise Jaccard estimates from per-group KMV sketches alone:
    * for each group pair, bottom-k of the two sketches' hash union is
    * a uniform sample of A∪B, and the fraction of it present in BOTH
    * sketches estimates |A∩B|/|A∪B| (the bottom-k MinHash estimator,
    * Broder 1997 §3). Everything joined is sketch-sized; the pair
    * window holds ≤ 2k rows. Output: ga, gb, n_union_kept, n_both,
    * jaccard_est (1e-6-quantized).
    */
  def kmvJaccard(sketch: DataFrame, groupCol: String,
                 k: Int = 64): DataFrame = {
    val s = sketch.select(col(groupCol).as("g"), col("h"))
    val gs = s.select(col("g")).distinct()
    val pairs = gs.select(col("g").as("ga"))
      .join(gs.select(col("g").as("gb")), col("ga") < col("gb"))
    val aSide = pairs.join(s, col("ga") === col("g"))
      .select(col("ga"), col("gb"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val bSide = pairs.join(s, col("gb") === col("g"))
      .select(col("ga"), col("gb"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val wPair = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    aSide.union(bSide)
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("r", row_number().over(wPair))
      .where(col("r") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_union_kept"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .withColumn("jaccard_est",
        floor(col("n_both").cast("double") /
          col("n_union_kept").cast("double") * 1e6 + 0.5) / 1e6)
  }

  /** Mergeable equi-width histogram quantile sketch (SURVEY §2 op 141)
    * — the quantile member of the sketch family: exact quantiles sort
    * the whole column (the 100 TB killer); a fixed-bin histogram is
    * ≤ nBins rows per group, map-side combinable, and histograms from
    * different sources/days MERGE BY SUMMING BINS without a rescan
    * (the same rollup property as the CMS counter table). The
    * bin-midpoint estimate is within binWidth/2 of the rank statistic
    * (hence within one bin width of any interpolated-quantile
    * convention) — an a-priori value-axis bound, chosen up front.
    *
    * Out-of-domain values clamp into the edge bins (their mass still
    * counts; their position saturates). Choose a DYADIC width
    * ((hi−lo)/nBins a power of two) and the bin arithmetic is exact in
    * IEEE doubles — no cross-engine rounding surface at all.
    */
  def histSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo, s"bad domain [$lo,$hi)/$nBins")
    val width = (hi - lo) / nBins
    val v = col(valueCol)
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor((v - lit(lo)) / lit(width)).cast("int")))
    df.where(v.isNotNull)
      .groupBy(groupCols.map(col) :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a (group, bin, cnt) histogram sketch: for
    * each q, the midpoint of the bin where the cumulative count first
    * reaches rank ⌊q·n⌋+1 (clamped to n). Bin-midpoint, not
    * interpolated — the estimate is a pure function of integer bin
    * counts, so engines agree bit-for-bit; the half-width error bound
    * is the sketch's contract, interpolation would only polish inside
    * it. Output: group cols, q, est (1e-6-quantized), n.
    */
  def histQuantiles(sketch: DataFrame, groupCols: Seq[String],
                    qs: Seq[Double], lo: Double, hi: Double,
                    nBins: Int): DataFrame = {
    val width = (hi - lo) / nBins
    val g = groupCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("bin"))
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(g: _*)))
    cum
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("target",
        least(col("n"), floor(col("q") * col("n").cast("double"))
          .cast("long") + 1L))
      .groupBy(g :+ col("q"): _*)
      .agg(
        min(when(col("cum") >= col("target"), col("bin"))).as("qbin"),
        max(col("n")).as("n"))
      .withColumn("est",
        floor((lit(lo) + (col("qbin").cast("double") + 0.5) * lit(width))
          * 1e6 + 0.5) / 1e6)
      .drop("qbin")
  }
}
