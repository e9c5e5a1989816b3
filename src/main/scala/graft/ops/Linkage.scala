package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Edit-distance joins via deletion-neighborhood (FastSS-style) blocking.
  *
  * The scale problem with fuzzy matching is candidate generation: a naive
  * lev(a,b) <= 1 join is an all-pairs cross join. Blocking on the deletion
  * neighborhood — the string itself plus every single-character deletion —
  * makes it an equi-join: two strings within Levenshtein distance 1 ALWAYS
  * share a key (substitution at position i → the two i-deletions are
  * equal; insertion/deletion → the shorter string is itself a deletion key
  * of the longer), so the blocking is lossless, and key sharing implies
  * lev <= 2, so one exact levenshtein refine finishes the job. Cost per
  * record is |s|+1 generated keys — linear state, shuffle on short string
  * keys only, no payload fan-out beyond the key column.
  *
  * Reference scope: the entity-resolution/typo-matching half of the dedup
  * family (whole-document dedup is C10/C18–C20); same candidates-then-
  * refine architecture as the LSH near-dup operators.
  */
object Linkage {

  /** The string plus all single-character deletions, deduplicated. */
  private def deletionKeys(c: Column): Column =
    array_union(
      array(c),
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - lit(1)), c.substr(i + lit(1), length(c)))))

  /** Lossless Levenshtein<=1 self-join: all pairs (id_a < id_b) of rows
    * whose strings are within edit distance 1, with the exact distance.
    * Candidate generation is the deletion-key equi-join; `distinct` folds
    * the multi-key hits before the refine.
    */
  def fuzzySelfJoinLev1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val keyed = df.select(col(idCol), col(strCol),
      explode(deletionKeys(col(strCol))).as("_key"))
    val a = keyed.select(col("_key"), col(idCol).as("id_a"), col(strCol).as("name_a"))
    val b = keyed.select(col("_key"), col(idCol).as("id_b"), col(strCol).as("name_b"))
    a.join(b, Seq("_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= 1)
  }

  /** Record linkage: resolve each dirty record to its best clean match at
    * edit distance <= 1 — minimum distance, ties to the lowest clean id.
    * Same lossless blocking; unmatched dirty records are dropped (the
    * caller can anti-join for the residue). Both sides stream through the
    * key shuffle; nothing is collected.
    */
  def linkLev1(clean: DataFrame, dirty: DataFrame,
               idCol: String, strCol: String): DataFrame = {
    val ck = clean.select(explode(deletionKeys(col(strCol))).as("_key"),
      col(idCol).as("clean_id"), col(strCol).as("clean_name"))
    val dk = dirty.select(explode(deletionKeys(col(strCol))).as("_key"),
      col(idCol).as("dirty_id"), col(strCol).as("dirty_name"))
    val cand = dk.join(ck, Seq("_key"))
      .select("dirty_id", "dirty_name", "clean_id", "clean_name").distinct()
      .withColumn("dist", levenshtein(col("dirty_name"), col("clean_name")).cast("long"))
      .where(col("dist") <= 1)
    val w = Window.partitionBy("dirty_id").orderBy(col("dist").asc, col("clean_id").asc)
    cand.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select("dirty_id", "dirty_name", "clean_id", "clean_name", "dist")
  }
}
