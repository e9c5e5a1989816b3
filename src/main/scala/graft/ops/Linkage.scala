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

  /** Segment start (1-based) and length for segment `i` of a string of
    * length `ls` under the even (tau+1)-way partition: the first
    * (tau+1 - ls%(tau+1)) segments get floor(ls/(tau+1)) characters, the
    * rest one more. Both sides of the join derive the layout from this
    * one definition, so index and probe can never disagree on it.
    */
  private def segLayout(ls: Column, i: Column, tau: Int): (Column, Column) = {
    val parts = lit(tau + 1)
    val base = floor(ls / parts).cast("int")
    val nBase = parts - (ls % parts).cast("int")
    val segLen = base + when(i >= nBase, 1).otherwise(0)
    val segStart = lit(1) + i * base + greatest(lit(0), i - nBase)
    (segStart, segLen)
  }

  /** Lossless Levenshtein<=tau self-join via PassJoin-style segment
    * blocking (Li, Deng, Feng, VLDB 2011 — "PassJoin: a partition-based
    * method for similarity joins"). FastSS deletion neighborhoods (the
    * lev<=1 operators above) blow up combinatorially at tau=2 (|s|^2 keys
    * per record); segment blocking stays LINEAR: the index side cuts each
    * string into tau+1 contiguous segments — tau edits can touch at most
    * tau of them, so any string within distance tau contains at least one
    * segment EXACTLY, shifted by at most tau positions (the shift of an
    * unedited block is bounded by the net insertions/deletions before
    * it). The probe side therefore emits, for each candidate indexed
    * length ls in [len-tau, len+tau] and each segment slot, the
    * substrings at the <=2*tau+1 admissible start positions, and the
    * candidate join is a plain equi-join on (substring, slot, ls) — both
    * sides corpus-sized streams, no cross join anywhere. One exact
    * `levenshtein` refine (codegen'd) finishes.
    *
    * Fan-out per probe row is bounded — tau+1 keys per index row, and on
    * the probe side at most (tau+1) starts per (length, slot) thanks to
    * the multi-match-aware window (a match at shift d forces >= |d| edits
    * before the segment and >= |delta-d| after, so only
    * |d| + |delta - d| <= tau survives) — payload-free shuffles both ways.
    *
    * Skew note: candidate volume is governed by SEGMENT ENTROPY. On a
    * templated corpus (e.g. "Customer#00000NNNN") the slots that never
    * vary become corpus-constant join keys and the candidate join
    * degrades toward n² on those slots — and no slot can be dropped
    * (the pigeonhole needs all tau+1). At scale the mitigation is the
    * C17 treatment of the hot keys: salt the high-DF segment keys and
    * replicate the matching index rows; selectivity is restored by the
    * varying slots either way.
    *
    * Returns (id_a, id_b, dist) with id_a < id_b, exact distances.
    */
  def editDistSelfJoin(df: DataFrame, idCol: String, strCol: String,
                       tau: Int): DataFrame = {
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val s = col(strCol)
    // Index side: the tau+1 segments of each string, keyed (seg, slot, len).
    val slots = sequence(lit(0), lit(tau))
    val segKeys = transform(slots, i => {
      val (st, ln) = segLayout(length(s), i, tau)
      struct(s.substr(st, ln).as("seg"), i.as("slot"), length(s).as("ls"))
    })
    val indexed = df
      .where(length(s) >= tau + 1)
      .select(col(idCol).as("id_b"), s.as("name_b"),
        explode(segKeys).as("_k"))
      .select(col("id_b"), col("name_b"),
        col("_k.seg").as("_seg"), col("_k.slot").as("_slot"), col("_k.ls").as("_ls"))
    // Probe side: for every admissible indexed length and slot, the
    // substrings at the multi-match-aware start positions. A match at
    // shift d = p - p_i forces >= |d| edits before the segment and
    // >= |delta - d| after it (delta = probe len - indexed len), so only
    // d with |d| + |delta - d| <= tau can witness a true pair:
    // d in [min(0,delta) - (tau-|delta|)/2, max(0,delta) + (tau-|delta|)/2]
    // — <= tau+1 starts per slot instead of the naive 2*tau+1.
    val lens = sequence(greatest(length(s) - tau, lit(tau + 1)), length(s) + tau)
    val probeKeys = flatten(transform(lens, ls =>
      flatten(transform(slots, i => {
        val (st, ln) = segLayout(ls, i, tau)
        val delta = length(s) - ls
        val slack = floor((lit(tau) - abs(delta)) / 2).cast("int")
        val pLo = greatest(st + least(delta, lit(0)) - slack, lit(1))
        val pHi = least(st + greatest(delta, lit(0)) + slack,
          length(s) - ln + lit(1))
        transform(
          when(pHi >= pLo, sequence(pLo, pHi)).otherwise(array()),
          p => struct(s.substr(p, ln).as("seg"), i.as("slot"), ls.as("ls")))
      }))))
    val probes = df
      .where(length(s) >= tau + 1)
      .select(col(idCol).as("id_a"), s.as("name_a"),
        explode(probeKeys).as("_k"))
      .select(col("id_a"), col("name_a"),
        col("_k.seg").as("_seg"), col("_k.slot").as("_slot"), col("_k.ls").as("_ls"))
    probes.join(indexed, Seq("_seg", "_slot", "_ls"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= tau)
      .select("id_a", "id_b", "dist")
  }
}
