package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-store compression and sketching utilities (SURVEY §2
  * ops 88–89): the storage-side counterparts of the ANN/PQ search ops
  * — an embedding table at 100 TB is itself a storage problem before
  * it is a search problem.
  *
  * Deterministic by the repo's standard construction (SURVEY §6):
  * per-element error terms quantize to 1e-6 longs before any
  * aggregation (order-independent sums), digests are md5 hex over
  * canonical string forms, and the projection sign matrix derives
  * from md5 nibble parity — any SQL engine replays every output bit.
  */
object Embed {

  private def idv(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))

  /** Int8 scalar quantization (the SQ8 codec of Faiss / the
    * uint8-range recipe most vector stores ship): per-DIMENSION
    * corpus-wide [min,max] ranges, code = round(255·(x−min)/(max−min)),
    * 8× smaller than float64 at ~0.2% range error. Emits one row per
    * vector: an md5 digest of the 64 codes (engine-neutral payload
    * check without a list-typed column) plus max/mean absolute
    * reconstruction error — the columns a pipeline actually monitors.
    *
    * Scale shape: pass 1 is a 64-row min/max aggregate (map-side
    * combinable, broadcast back); pass 2 is pure per-row column
    * algebra — no shuffle at all on the corpus. A constant range
    * degenerate dimension (max=min) codes to 0 and reconstructs
    * exactly.
    */
  def scalarQuantizeInt8(df: DataFrame, idCol: String,
                         vecCol: String): DataFrame = {
    val v = idv(df, idCol, vecCol)
    val ranges = v.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => s.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("mxs"))
    val withCodes = v.crossJoin(broadcast(ranges))
      .withColumn("codes", transform(col("v"), (x, i) => {
        val mn = element_at(col("mns"), i + 1)
        val mx = element_at(col("mxs"), i + 1)
        when(mx === mn, lit(0L))
          .otherwise(floor((x - mn) / (mx - mn) * 255.0 + 0.5).cast("long"))
      }))
      // |x − x̂| quantized to 1e-6 longs so max/mean are order-free.
      .withColumn("errs", transform(col("v"), (x, i) => {
        val mn = element_at(col("mns"), i + 1)
        val mx = element_at(col("mxs"), i + 1)
        val recon = mn + element_at(col("codes"), i + 1).cast("double") /
          255.0 * (mx - mn)
        floor(abs(x - recon) * 1e6 + 0.5).cast("long")
      }))
    withCodes.select(col("id"),
      md5(concat_ws(",", col("codes"))).as("code_digest"),
      (array_max(col("errs")).cast("double") / 1e6).as("max_abs_err"),
      (aggregate(col("errs"), lit(0L), (acc, e) => acc + e).cast("double")
        / size(col("v")) / 1e6).as("mean_abs_err"))
  }

  /** 1-bit (sign) quantization — the binary-embedding compression path
    * (64× smaller than float64; the retrieval recipe behind binary
    * passage retrieval / faiss `IndexBinaryFlat`): bit i = 1 iff
    * v[i] > 0, packed 32 bits per long (sum of distinct 2^off masks ≡
    * OR — exact integer math any SQL engine replays; offsets < 32 keep
    * every word positive). Output is long-form (id, w, word) with
    * exactly ceil(dim/32) rows per vector — list-free for the driver
    * compare, and exactly the join key shape [[hammingTopK]] consumes.
    *
    * Scale shape: one posexplode + one (id, w) map-side-combinable
    * aggregation; no joins, no corpus-sized broadcast.
    */
  def binarize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    idv(df, idCol, vecCol)
      .select(col("id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("id"), (col("pos") / 32).cast("long").as("w"))
      .agg(sum(when(col("x") > 0,
          pow(lit(2.0), (col("pos") % 32).cast("double")).cast("long"))
        .otherwise(lit(0L))).as("word"))

  /** Hamming-distance top-k over sign-quantized codes: distance =
    * Σ_w bit_count(qword XOR nword) — pure integer ops on the packed
    * words, 64× less data movement than float cosine. Codes pivot
    * WIDE (a ceil(dim/32)-long array per vector — a few longs, not a
    * bloom-scale payload) so the per-pair work is one codegen'd
    * zip_with/bit_count fold on a broadcast of the tiny query side:
    * nothing corpus-sized shuffles (the long-form join-then-regroup
    * alternative shuffles |q|·n·W rows into a |q|·n-group aggregate —
    * measured 2× slower at the 50× probe tier). Still the brute-force
    * BASELINE over compressed codes; gate it behind
    * [[Dedup.embeddingCosinePairs]] buckets or [[Similarity.ivfTopK]]
    * cells when |queries| grows. Ties rank by lowest neighbor id.
    */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, topK: Int): DataFrame = {
    def packed(df: DataFrame, out: String): DataFrame =
      binarize(df, idCol, vecCol)
        .groupBy(col("id").as(out))
        .agg(transform(array_sort(collect_list(struct(col("w"), col("word")))),
          s => s.getField("word")).as(s"${out}_words"))
    val q = packed(queries, "query_id")
    val n = packed(corpus, "neighbor_id")
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    n.crossJoin(broadcast(q))
      .withColumn("hamming", aggregate(
        zip_with(col("query_id_words"), col("neighbor_id_words"),
          (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
        lit(0L), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(win))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("hamming"))
  }

  /** Johnson–Lindenstrauss random projection (Achlioptas 2003,
    * "Database-friendly random projections": a ±1 sign matrix
    * preserves pairwise distances in expectation): dim-d → dim-d'
    * sketches, y_j = (Σ_i s_ij·x_i)/√d', with s_ij = ±1 from the
    * parity of an md5 nibble of (i,j) — the matrix is a FORMULA, not
    * data, so every executor (and the SQL oracle) derives it locally.
    * The cheap first stage in front of clustering/dedup when 64 dims
    * is already too wide at corpus scale.
    *
    * Output is long-form (id, pos, y) — d' rows per vector — keeping
    * the driver compare list-free; callers reassemble arrays with the
    * collect_list-over-pos idiom ([[Cluster.kmeans]]'s reassembly) if
    * they need them packed.
    *
    * Scale shape: posexplode (d rows per vector) → broadcast join with
    * the d·d' derived sign matrix → (id, j) sum of per-term
    * 1e-6-quantized longs, fully map-side combinable. One shuffle of
    * d'·n skinny rows; nothing corpus-sized broadcasts.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    outDim: Int = 16, dim: Int = 64,
                    seed: String = "jl"): DataFrame = {
    // The sign-matrix spine covers positions 0..dim-1, so a vector wider
    // than `dim` would silently project a PREFIX (the equi-join drops
    // positions >= dim). Fail loudly instead — the check is a per-row
    // size compare inside a filter, so Catalyst can't prune it away.
    val v = idv(df, idCol, vecCol)
      .where(assert_true(size(col("v")) === dim,
        concat(lit(s"randomProject: vector width "), size(col("v")),
          lit(s" != dim $dim for id "), col("id"))).isNull)
    val spark = df.sparkSession
    // s_ij = 1 − 2·(first md5 nibble of "seed_i_j" mod 2)
    val signs = spark.range(dim.toLong * outDim)
      .select((col("id") / outDim).cast("long").as("pos"),
        (col("id") % outDim).cast("long").as("opos"))
      .withColumn("s",
        lit(1L) - lit(2L) * (conv(substring(
          md5(concat_ws("_", lit(seed), col("pos"), col("opos"))), 1, 1),
          16, 10).cast("long") % 2L))
    v.select(col("id"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("pos", col("pos").cast("long"))
      .join(broadcast(signs), "pos")
      .groupBy(col("id"), col("opos"))
      .agg(sum(col("s") * floor(col("x") * 1e6 + 0.5).cast("long")).as("sq"))
      // y re-quantizes to an exact 1e-6 multiple (floor, not round —
      // a half-up tie on a 2.5e-7 grid splits engines; SURVEY §6).
      .select(col("id"), col("opos").as("pos"),
        (floor(col("sq").cast("double") / math.sqrt(outDim.toDouble) + 0.5)
          / 1e6).as("y"))
  }
}
