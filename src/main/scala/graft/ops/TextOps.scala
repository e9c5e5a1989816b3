package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline north star
  * (BASELINE.json): tokenization, word counts, quality scoring, token
  * counting (whitespace + regex), document fingerprinting, corpus-profile
  * language ID. All pure `org.apache.spark.sql.functions` — codegen'd,
  * no UDFs, so the hot path stays inside WholeStageCodegen at 100 TB.
  */
object TextOps {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Whitespace tokens of a text column. */
  def tokens(c: Column): Column = split(c, " ")

  /** Per-document token statistics (SURVEY.md C3). */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("text_len", length(col(textCol)).cast("long"))
  }

  /** Corpus word count: explode(split) → hash aggregate (SURVEY.md C12).
    * At 100 TB this is the canonical two-phase aggregation: partial counts
    * map-side, one shuffle on the token.
    */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * (alphabetic runs). `regexp_extract_all` is codegen'd — no UDF.
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("re_tokens", size(regexp_extract_all(col(textCol), lit("[A-Za-z]+"), lit(0))).cast("long"))

  /** Heuristic document quality score from length / token-shape / stopword
    * ratios (north-star text analysis). All ratios are exact-integer
    * divisions so the score is bit-portable across engines.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t).cast("double")
    val nStop = size(filter(t, tk => tk.isin(Stopwords.map(s => s: Any): _*))).cast("double")
    val avgTokLen = (length(col(textCol)).cast("double") - (nTok - 1.0)) / nTok
    val stopRatio = nStop / nTok
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("avg_token_len", avgTokLen)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("quality_score", round(stopRatio * lit(0.5) + least(avgTokLen / lit(10.0), lit(1.0)) * lit(0.5), 6))
  }

  /** Canonical document fingerprint: md5 over whitespace-normalized,
    * lower-cased text. Portable (same value in any engine), and the basis
    * for exact dedup at scale (group by fingerprint instead of full text —
    * 32-byte shuffle keys instead of document bodies).
    */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", md5(regexp_replace(lower(col(textCol)), "\\s+", " ")))

  /** Corpus-profile language ID (north star): builds a per-language profile
    * of its top-N most frequent tokens (tie-break token asc) from a labeled
    * corpus, then predicts each document's language as the profile with the
    * largest distinct-token overlap (tie-break language asc).
    * Deterministic, relational, no UDFs: two hash aggregations + one
    * broadcastable profile join.
    */
  def langIdByProfile(df: DataFrame, idCol: String, textCol: String, langCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(langCol), explode(array_distinct(tokens(col(textCol)))).as("token"))
    val freq = tok.groupBy(langCol, "token").agg(count(lit(1)).as("f"))
    val w = Window.partitionBy(langCol).orderBy(col("f").desc, col("token").asc)
    val profile = freq.withColumn("rn", row_number().over(w)).where(col("rn") <= topN)
      .select(col(langCol).as("profile_lang"), col("token"))
    val docTok = df.select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("token"))
    val overlap = docTok.join(broadcast(profile), Seq("token"))
      .groupBy(col(idCol), col("profile_lang"))
      .agg(count(lit(1)).as("overlap"))
    val pick = Window.partitionBy(idCol).orderBy(col("overlap").desc, col("profile_lang").asc)
    overlap.withColumn("rn", row_number().over(pick)).where(col("rn") === 1)
      .select(col(idCol), col("profile_lang").as("lang_pred"), col("overlap"))
  }
}
