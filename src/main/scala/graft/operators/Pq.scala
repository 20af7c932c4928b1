package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — SURVEY §2 op 87. The standard
  * compression path for embedding stores: split each dim-d vector
  * into `m` subvectors, quantize each against a per-subspace codebook
  * of `k` centroids, and store only the m code ids (64 d × 8 B →
  * m bytes-ish). Search runs over codes via ADC (asymmetric distance
  * computation): the query builds an m×k table of exact
  * subspace distances once, and every corpus vector's distance is a
  * sum of m table lookups — no corpus-side float math at all.
  *
  * Deterministic for oracle replay: codebooks seed from the
  * subvectors of the k lowest-id corpus vectors (the same seed rule
  * as [[Similarity.ivfTopK]] cells and [[Cluster.kmeans]]), optionally
  * refined by `iters` grouped-Lloyd passes (op 95 — the "trained"
  * codebooks of the paper, all m subspace k-means problems in one
  * plan); code assignment breaks distance ties on the lowest centroid
  * id; ADC sums 1e-6-quantized longs so the m-term reduction is
  * order-independent (SURVEY §6).
  *
  * Scale shape: encoding is one broadcast of the m·k·subDim codebook
  * and one (id, sub) argmin aggregation — linear in corpus rows, all
  * map-side combinable. ADC search shuffles NOTHING corpus-sized:
  * the distance table is |queries|·m·k rows (broadcast), the per-pair
  * work is a long add, and the top-k window partitions by query.
  */
object Pq {

  /** Per-subspace codebook: seeds are the subvectors of the k
    * lowest-id vectors; `iters` grouped-Lloyd refinements (all m
    * subspace k-means problems advance together in ONE declarative
    * plan — the `sub` column rides through every assignment and
    * update, so the per-iteration cost is exactly [[Cluster.kmeans]]'s
    * with an equi-join on `sub` instead of a cross join). Returns
    * (sub, cid, cv, cn2); m·k rows — always broadcast.
    *
    * Same determinism conventions as [[Cluster.kmeans]]: argmin ties →
    * lowest cid, centroid means over 1e-6-quantized longs, clusters
    * that lose all members drop out.
    */
  private def codebook(v: DataFrame, k: Int, m: Int, subDim: Int,
                       iters: Int = 0): DataFrame = {
    val init = v.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("sub"), col("cid"),
        slice(col("v"), col("sub") * subDim + 1, lit(subDim)).as("cv"))
    def withN(c: DataFrame) = c.withColumn("cn2",
      DotProduct(col("cv"), col("cv")))
    val sv = subvecs(v, m, subDim)
    val fin = (1 to iters).foldLeft(init) { (cent, _) =>
      sv.join(broadcast(withN(cent)), "sub")
        .withColumn("_s",
          col("cn2") - lit(2.0) * DotProduct(col("sv"), col("cv")))
        .groupBy(col("id"), col("sub"))
        .agg(min_by(struct(col("cid"), col("sv")),
          struct(col("_s"), col("cid"))).as("_m"))
        .select(col("sub"), col("_m.cid").as("cid"),
          posexplode(col("_m.sv")).as(Seq("pos", "val")))
        .select(col("sub"), col("cid"), col("pos"),
          floor(col("val") * 1e6 + 0.5).cast("long").as("qv"))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("cnt"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"),
            (col("sq").cast("double") / col("cnt") / 1e6).as("comp")))),
          s => s.getField("comp")).as("cv"))
    }
    withN(fin)
  }

  private def subvecs(df: DataFrame, m: Int, subDim: Int): DataFrame =
    df.select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("v"))
      .select(col("id"), col("sub"),
        slice(col("v"), col("sub") * subDim + 1, lit(subDim)).as("sv"))

  private def idv(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))

  /** PQ codes, exploded: (id, sub, code) — code is the seed vector id
    * whose subvector is nearest (argmin |x_s − c_s|², ties → lowest).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             k: Int = 16, m: Int = 8, dim: Int = 64,
             iters: Int = 0): DataFrame = {
    val v = idv(df, idCol, vecCol)
    encodeWith(v, codebook(v, k, m, dim / m, iters), m, dim / m)
  }

  /** Code assignment against an already-built codebook — the shared
    * second half of [[encode]], split out so the ADC searches can feed
    * ONE materialized codebook to both the encoder and the distance
    * table (Catalyst does not dedupe common subplans; without the split
    * each search executed the codebook's seed-limit + Lloyd chain
    * twice).
    */
  private def encodeWith(v: DataFrame, cb: DataFrame, m: Int,
                         subDim: Int): DataFrame =
    subvecs(v, m, subDim).join(broadcast(cb), "sub")
      .withColumn("_s",
        col("cn2") - lit(2.0) * DotProduct(col("sv"), col("cv")))
      .groupBy(col("id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("_s"), col("cid"))).as("code"))

  /** IVF+PQ (the combined index of Jégou et al. 2011 §V / the Faiss
    * "IVFx,PQy" recipe): coarse-quantize the corpus into `nCells`
    * inverted lists, then run ADC only inside the `nProbe` cells
    * nearest each query — the per-query candidate set shrinks from n
    * to ~nProbe·n/nCells, which is what makes PQ search usable when
    * exhaustive [[adcTopK]] (queries × corpus lookups) stops fitting
    * the latency budget. Size `nCells ≈ √n` (the IVF rule).
    *
    * Determinism: cells seed from the nCells lowest-id corpus vectors;
    * corpus assignment is argmin (|c|² − 2·x·c, ties → lowest cell);
    * query probing takes the nProbe best cells by the same score.
    *
    * Scale shape: cell table (nCells·dim) and query-probe table
    * (|queries|·nProbe) broadcast; codes stay distributed and fan out
    * only to the queries probing their cell; nothing corpus-sized
    * shuffles or broadcasts — [[adcTopK]]'s shape with the candidate
    * generation bounded by the inverted lists.
    */
  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, topK: Int, nCells: Int = 16,
                 nProbe: Int = 4, k: Int = 16, m: Int = 8,
                 dim: Int = 64, iters: Int = 0): DataFrame = {
    val cv = idv(corpus, idCol, vecCol)
    // cell centroids and codebook are k-row tables consumed by TWO
    // subplans each (corpus assign + query probe; encoder + distance
    // table) — materialize once so the seed-limit corpus scans and the
    // Lloyd chain run once per query, not per consumer.
    val cent = cv.orderBy(col("id")).limit(nCells)
      .select(col("id").as("cell_id"), col("v").as("centv"))
      .withColumn("centn2", DotProduct(col("centv"), col("centv")))
      .localCheckpoint()
    def cellScore = col("centn2") - lit(2.0) * DotProduct(col("v"), col("centv"))
    val ccells = cv.crossJoin(broadcast(cent))
      .withColumn("_s", cellScore)
      .groupBy(col("id"))
      .agg(min_by(col("cell_id"), struct(col("_s"), col("cell_id")))
        .as("cell_id"))
    val cb = codebook(cv, k, m, dim / m, iters).localCheckpoint()
    val codes = encodeWith(cv, cb, m, dim / m)
      .join(ccells, "id")
      .select(col("id").as("neighbor_id"), col("sub"), col("code"),
        col("cell_id"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("_s"), col("cell_id"))
    val qcells = idv(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("v"))
      .crossJoin(broadcast(cent))
      .withColumn("_s", cellScore)
      .withColumn("_r", row_number().over(wq)).where(col("_r") <= nProbe)
      .select(col("qid"), col("cell_id"))
    val dt = subvecs(idv(queries, idCol, vecCol), m, dim / m)
      .join(broadcast(cb), "sub")
      .select(col("id").as("qid"), col("sub"), col("cid"),
        floor((DotProduct(col("sv"), col("sv")) -
          lit(2.0) * DotProduct(col("sv"), col("cv")) + col("cn2")) * 1e6
          + 0.5).cast("long").as("d2q"))
    val scored = codes
      .join(broadcast(qcells), "cell_id")
      .join(broadcast(dt),
        codes("sub") === dt("sub") && codes("code") === dt("cid") &&
          qcells("qid") === dt("qid"))
      .groupBy(dt("qid").as("query_id"), col("neighbor_id"))
      .agg(sum(col("d2q")).as("sq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (col("sq").cast("double") / 1e6).as("adc_d2"))
  }

  /** ADC top-k: exact per-subspace distances from each query to every
    * codebook centroid (an m·k table per query), then each corpus
    * vector scores as the sum of its m code lookups. Approximate by
    * construction (corpus vectors are quantized); `adc_d2` is the
    * squared L2 distance to the quantized corpus vector.
    */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, topK: Int, k: Int = 16, m: Int = 8,
              dim: Int = 64, iters: Int = 0): DataFrame = {
    val cv = idv(corpus, idCol, vecCol)
    // one materialized codebook for both the encoder and the distance
    // table (see encodeWith)
    val cb = codebook(cv, k, m, dim / m, iters).localCheckpoint()
    val codes = encodeWith(cv, cb, m, dim / m)
      .select(col("id").as("neighbor_id"), col("sub"), col("code"))
    // d2 = |q_s|² − 2·q_s·c_s + |c_s|², quantized to 1e-6 longs so the
    // m-term sum below is order-independent.
    val dt = subvecs(idv(queries, idCol, vecCol), m, dim / m)
      .join(broadcast(cb), "sub")
      .select(col("id").as("query_id"), col("sub"), col("cid"),
        floor((DotProduct(col("sv"), col("sv")) -
          lit(2.0) * DotProduct(col("sv"), col("cv")) + col("cn2")) * 1e6
          + 0.5).cast("long").as("d2q"))
    val scored = codes
      .join(broadcast(dt),
        codes("sub") === dt("sub") && codes("code") === dt("cid"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d2q")).as("sq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (col("sq").cast("double") / 1e6).as("adc_d2"))
  }
}
