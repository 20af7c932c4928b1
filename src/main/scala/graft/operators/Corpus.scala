package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-curation operators for training-data pipelines, beyond the
  * dedup family: repetition-based quality stats, deterministic
  * stratified sampling (data mixtures), benchmark-contamination
  * detection, and sequence packing. All pure column algebra /
  * keyed-shuffle shapes — each op is one or two hash shuffles at any
  * corpus size, and every "random" choice is md5-derived so a SQL
  * oracle replays it exactly.
  */
object Corpus {

  /** Repetition stats per doc (the n-gram repetition signals of
    * MassiveText/Gopher-style quality rules, Rae et al. 2021): the
    * fraction of all word n-grams taken by the single most frequent
    * n-gram, and the distinct-n-gram fraction. High top-fraction or low
    * distinct-fraction = boilerplate/spam. One explode + two partial-agg
    * friendly aggregations (shuffles on (id, gram) then id).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame =
    df.select(col(idCol).as("id"),
        explode(Text.ngrams(col(textCol), n)).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("maxc"), count(lit(1)).as("nd"),
        sum(col("c")).as("nt"))
      .select(col("id"),
        round(col("maxc").cast("double") / col("nt"), 6).as("top_ngram_frac"),
        round(col("nd").cast("double") / col("nt"), 6).as("distinct_frac"))

  /** Deterministic uniform in [0,1) from the md5 of a column's string
    * form — the engine-neutral Bernoulli coin for sampling.
    */
  def md5Uniform(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("double") /
      4294967296.0

  /** Stratified Bernoulli sampling for data mixtures: keep a row iff
    * md5Uniform(id) < rate(stratum). Deterministic (same corpus → same
    * sample on any engine/cluster/partitioning — unlike
    * DataFrame.sample, whose draw depends on partition layout), and a
    * pure filter: no shuffle at all, prunes at the scan.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(strataCol === k, lit(v)).otherwise(acc)
    }
    df.where(md5Uniform(col(idCol)) < rate)
  }

  /** Benchmark-contamination detection: for each train doc, the number
    * of its distinct word `width`-grams that appear in ANY benchmark
    * doc (n-gram-overlap decontamination, the GPT-3/C4 convention —
    * 8-13-gram collisions flag train docs that leak eval data).
    * Shuffles on the shingle key: linear in corpus postings, the same
    * scale shape as the dedup family; the benchmark side is typically
    * tiny and broadcast-joins.
    */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, width: Int = 8): DataFrame = {
    val tr = train.select(col(idCol).as("id"),
      explode(Dedup.shingles(col(textCol), width)).as("sh"))
    val be = bench.select(explode(Dedup.shingles(col(textCol), width)).as("sh"))
      .distinct()
    tr.join(be, "sh").groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
  }

  /** Unigram-LM quality score (the CCNet/CC-Net-style LM filter shape,
    * Wenzek et al. 2020, with the corpus itself as the language model):
    * per-doc mean token cross-entropy −avg(ln p(tok)) against the
    * corpus's own unigram distribution. Low = typical text, high =
    * gibberish/outlier — the standard quality-filter signal when no
    * external LM fits the budget.
    *
    * Two inherent passes over the tokens: (1) corpus frequencies —
    * one hash shuffle on token, partial-agg friendly; (2) token→freq
    * equi-join + per-doc agg. The frequency table is vocab-sized, so
    * AQE broadcasts it at small scale and shuffle-joins on the token
    * key at 100 TB; either way no pair expansion, strictly linear in
    * corpus tokens. Per-token values are quantized to 1e-6 integers
    * before summing, so the doc aggregate is order-independent and
    * bit-identical on any engine (SURVEY §6 conventions).
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(Text.tokens(col(textCol))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = freq.agg(sum(col("c")).as("n")) // 1 row — broadcast
    toks.join(freq, "tok").crossJoin(broadcast(total))
      .select(col("id"),
        floor((log(col("n").cast("double")) - log(col("c").cast("double"))) *
          1e6 + 0.5).as("q"))
      .groupBy(col("id"))
      .agg(
        (floor(sum(col("q")).cast("double") / count(lit(1)) + 0.5) / 1e6)
          .as("lm_xent"),
        count(lit(1)).as("n_tokens"))
  }

  /** Chunk-level corpus dedup (the C4 "line dedup" shape, Raffel et
    * al. 2020 §2.2 — C4 drops any three-sentence span occurring more
    * than once in the corpus; here a chunk is a fixed window of
    * `chunkTokens` whitespace tokens, since the corpus has no sentence
    * boundaries). Per doc: chunk count, how many of its chunks are
    * corpus-duplicated (digest frequency ≥ `minCount` anywhere,
    * including within the same doc), and the cleaned text with the
    * duplicated chunks dropped (kept chunks rejoined in position
    * order; whitespace normalized by tokenization).
    *
    * Scale shape: chunking is per-row column algebra (no shuffle);
    * then ONE hash shuffle on the chunk digest for corpus counts, a
    * digest equi-join (AQE broadcasts the vocab-sized frequency side
    * when it is small), and ONE per-doc agg shuffle. Linear in corpus
    * tokens — the same postings shape as contamination/lmScore, no
    * pair expansion; a pathologically hot chunk ("" padding, menu
    * boilerplate) costs one skewed-but-bounded count row, never a
    * pair blowup.
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int = 10, minCount: Long = 2): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val n = greatest(
      ceil(size(toks).cast("double") / chunkTokens).cast("int"), lit(1))
    val chunks = transform(sequence(lit(0), n - 1),
      i => concat_ws(" ", slice(toks, i * chunkTokens + 1, lit(chunkTokens))))
    val posed = df
      .select(col(idCol).as("id"), posexplode(chunks).as(Seq("pos", "chunk")))
      .withColumn("h", md5(col("chunk")))
    val freq = posed.groupBy(col("h")).agg(count(lit(1)).as("c"))
    posed.join(freq, "h")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("c") >= minCount, 1L).otherwise(0L)).as("n_dup_chunks"),
        array_join(transform(array_sort(collect_list(
            when(col("c") < minCount, struct(col("pos"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("clean_text"))
  }

  /** Sequence packing for training batches: within each stratum (order
    * = `ordCol`), assign docs to bins of ~`targetTokens` whitespace
    * tokens by cumulative count — bin = floor(tokens-before / target).
    * The deterministic keyed-window formulation of greedy packing: one
    * shuffle on the stratum key, any engine reproduces the bins.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    strataCol: Column, targetTokens: Int,
                    ordCol: String): DataFrame = {
    // window partitions on the RENAMED stratum (strataCol may be an
    // arbitrary expression no longer present after the projection)
    val w = Window.partitionBy(col("stratum")).orderBy(col(ordCol))
    df.select(strataCol.as("stratum"), col(ordCol),
        Text.tokenCount(col(textCol)).cast("long").as("ntok"))
      .withColumn("bin",
        floor((sum(col("ntok")).over(w) - col("ntok")) / targetTokens))
  }
}
