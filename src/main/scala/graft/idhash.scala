package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Internal 64-bit id assignment with collision REPAIR.
  *
  * Candidate generation, scoring and CC move `xxhash64(image_id)` keys
  * instead of public string ids (2–3× narrower shuffle rows,
  * radix-sortable join keys). The honest envelope math (birthday over
  * 2^64): expected colliding pairs ≈ n²/2^65 — ~0.03 at 10⁹ rows but
  * ~27,000 at the 10¹² target. At that scale collisions are not a tail
  * risk an assertion can wave away, they are CERTAIN — yet they touch a
  * vanishing minority (~1 row in 2·10⁷). The engine's earlier
  * fail-loudly guard was sound at 10⁹ and a denial of service at 10¹².
  *
  * So: repair the minority instead of widening every shuffle key to 128
  * bits for everyone. Rows whose hash collides are re-hashed with an
  * incremented salt (round r ⇒ `xxhash64(image_id, r)`) until the id
  * map is globally injective. The loop state is ONLY the collider set
  * (≈54k rows at 10¹²), never the corpus: the one corpus-wide shuffle
  * is the initial collision census, and each repair round re-reads the
  * corpus with the candidates' hashes BROADCAST into the scan (a
  * shuffle-free pass, expected ~1 round). The final repair set
  * `(image_id, salt)` is broadcast into every id-derivation site and
  * committed alongside the stage tables so a resumed run derives
  * byte-identical ids.
  *
  * `base`/`salted` are injectable ONLY so tests can force collisions
  * with a deliberately narrow hash; production always uses xxhash64.
  */
object IdHash {

  private val defaultBase: Column => Column = c => xxhash64(c)
  private val defaultSalted: (Column, Column) => Column = (c, s) => xxhash64(c, s)

  /** Derive `dstCol` (i64 id) from public-id `srcCol` under an optional
    * repair table. With `repairs = None` (the overwhelmingly common
    * case) this is a plain projection — no join, no overhead.
    */
  def withId(
      df: DataFrame,
      srcCol: String,
      dstCol: String,
      repairs: Option[DataFrame],
      base: Column => Column = defaultBase,
      salted: (Column, Column) => Column = defaultSalted): DataFrame = repairs match {
    case None => df.withColumn(dstCol, base(col(srcCol)))
    case Some(r) =>
      val saltCol = s"__salt_$dstCol"
      val rr = broadcast(r.select(col("image_id").as(srcCol), col("salt").as(saltCol)))
      df.join(rr, Seq(srcCol), "left")
        .withColumn(dstCol,
          when(col(saltCol).isNotNull, salted(col(srcCol), col(saltCol)))
            .otherwise(base(col(srcCol))))
        .drop(saltCol)
  }

  /** Compute the salt assignment that makes the corpus hash injectively.
    * Returns None when the base hash already is (the common case — every
    * sandbox-scale corpus). Precondition: `ids` values are DISTINCT
    * (duplicate image_ids are a corpus error, guarded separately); a
    * duplicated id can never be repaired and would exhaust the rounds.
    *
    * A salted candidate is accepted only if it misses (a) EVERY base
    * hash in the corpus — conservative: re-salted rows' abandoned base
    * hashes still count as occupied, which can cost an extra round but
    * never correctness — (b) every previously accepted salted hash, and
    * (c) its round-mates. (a) is the scale-critical check and is
    * arranged as corpus-scan ⋈ broadcast(candidates): no corpus
    * shuffle, no corpus checkpoint, ever. Everything checkpointed is
    * O(|colliders|).
    */
  def buildRepairs(
      ids: DataFrame, // single column: image_id
      maxRounds: Int = 8,
      base: Column => Column = defaultBase,
      salted: (Column, Column) => Column = defaultSalted): Option[DataFrame] = {
    val baseHashes = ids.select(base(col("image_id")).as("h"))
    // the one corpus-wide shuffle: which base hashes collide?
    val dup0 = baseHashes.groupBy(col("h")).count()
      .where(col("count") > 1).select(col("h"))
    var pending = ids
      .withColumn("h", base(col("image_id")))
      .join(broadcast(dup0), Seq("h"), "left_semi")
      .select(col("image_id"))
      .localCheckpoint() // eager: tiny by the envelope; truncates lineage
    if (pending.isEmpty) return None
    // Duplicate-image_id detection, free of corpus-wide cost: a duplicated
    // public id hashes to the same base value, so BOTH rows are already in
    // the (tiny) collider set — check there, fail fast with the real cause
    // instead of burning maxRounds of futile re-salting.
    val dupIds = pending.groupBy(col("image_id")).count()
      .where(col("count") > 1).limit(5)
      .collect().map(_.getString(0))
    require(dupIds.isEmpty,
      s"duplicate image_ids in corpus (no hashing scheme can repair): " +
        dupIds.mkString(", "))
    repairRounds(pending, baseHashes, maxRounds, salted)
  }

  /** Incremental repair for the streaming path: detect and repair ONLY
    * collisions introduced by a new micro-batch, against the already-
    * committed id space. The batch [[buildRepairs]] re-aggregates the FULL
    * accumulated id set — a corpus-wide shuffle per micro-batch, which is
    * exactly the cost model a 10¹²-row stream cannot pay. Here the
    * committed side is touched only as `committedIds` (the i64 id column
    * of the committed signatures table — one narrow pruned columnar scan,
    * no shuffle, no aggregation): a new row needs repair iff its base
    * hash hits a committed id or another new row's base hash. Repairs
    * never touch committed rows (their ids are already final in committed
    * tables); only new rows are salted, and salted candidates are checked
    * against committed ids ∪ the batch's base hashes ∪ accepted salted
    * hashes — so the COMBINED map (committedRepairs ∪ result) is
    * injective over the accumulated corpus.
    *
    * Preconditions: `newIds` are distinct and disjoint from committed
    * image_ids (the stream's anti-join replay guard establishes both);
    * `committedIds` are post-repair (injective among themselves).
    * Returns the combined repair set to pass to every id-derivation site.
    */
  def buildRepairsIncremental(
      newIds: DataFrame, // single column: image_id (new rows only)
      committedIds: Option[DataFrame], // single column: id (i64, post-repair)
      committedRepairs: Option[DataFrame], // (image_id, salt)
      maxRounds: Int = 8,
      base: Column => Column = defaultBase,
      salted: (Column, Column) => Column = defaultSalted): Option[DataFrame] = {
    val newHashes = newIds.select(col("image_id"), base(col("image_id")).as("h"))
    // within-batch duplicates: a batch-local aggregation (new rows only)
    val dupNew = newHashes.groupBy(col("h")).count()
      .where(col("count") > 1).select(col("h"))
    // hits on the committed id space: scan ⋈ broadcast(batch hashes) —
    // shuffle-free on the committed side
    // no distinct on the committed side: its ids are injective by the
    // precondition, and a distinct would be exactly the corpus-wide
    // shuffle this path exists to avoid (the tiny union below dedups)
    val histHits = committedIds.fold(dupNew.limit(0)) { hist =>
      hist.select(col("id").as("h"))
        .join(broadcast(newHashes.select(col("h"))), Seq("h"), "left_semi")
    }
    val pending = newHashes
      .join(broadcast(dupNew.union(histHits).distinct()), Seq("h"), "left_semi")
      .select(col("image_id"))
      .localCheckpoint()
    val dupIds = pending.groupBy(col("image_id")).count()
      .where(col("count") > 1).limit(5)
      .collect().map(_.getString(0))
    require(dupIds.isEmpty,
      s"duplicate image_ids in micro-batch (no hashing scheme can repair): " +
        dupIds.mkString(", "))
    // occupied space for salted candidates: committed ids + ALL of this
    // batch's base hashes (conservative — abandoned base hashes of
    // re-salted rows still count, as in the batch path)
    val occupied = committedIds.fold(newHashes.select(col("h")))(hist =>
      hist.select(col("id").as("h")).unionByName(newHashes.select(col("h"))))
    val newRepairs =
      if (pending.isEmpty) None
      else repairRounds(pending, occupied, maxRounds, salted)
    (committedRepairs, newRepairs) match {
      case (None, n) => n
      case (h, None) => h
      case (Some(h), Some(n)) => Some(h.unionByName(n))
    }
  }

  /** The repair loop shared by the batch and incremental paths: re-salt
    * `pending` rows until their hashes miss `occupied` (col `h` — every
    * hash value that must not be hit), previously accepted salted hashes,
    * and round-mates. Loop state is O(|pending|); `occupied` is only ever
    * scanned against a BROADCAST candidate set (shuffle-free).
    */
  private def repairRounds(
      pending0: DataFrame, // single column: image_id
      occupied: DataFrame, // single column: h
      maxRounds: Int,
      salted: (Column, Column) => Column): Option[DataFrame] = {
    var pending = pending0
    var resolved: Option[DataFrame] = None // (image_id, salt, h)
    var round = 1L
    while (!pending.isEmpty) {
      require(round <= maxRounds,
        s"id collision repair did not converge in $maxRounds rounds — " +
          "duplicate image_ids in the corpus, or a pathological hash")
      val attempt = pending
        .withColumn("salt", lit(round))
        .withColumn("h", salted(col("image_id"), col("salt")))
      // (a) shuffle-free occupied-space pass: hash values the candidates hit
      val corpusHits = occupied
        .join(broadcast(attempt.select(col("h"))), Seq("h"), "left_semi")
        .distinct()
      // (b) previously accepted salted hashes the candidates hit
      val resolvedHits = resolved.fold(corpusHits.limit(0)) { r =>
        attempt.select(col("h"))
          .join(broadcast(r.select(col("h"))), Seq("h"), "left_semi")
      }
      // (c) intra-round duplicates
      val selfHits = attempt.groupBy(col("h")).count()
        .where(col("count") > 1).select(col("h"))
      val badH = corpusHits.union(resolvedHits).union(selfHits).distinct()
      val conflicted = attempt.join(broadcast(badH), Seq("h"), "left_semi")
        .select(col("image_id")).localCheckpoint()
      val ok = attempt.join(broadcast(badH), Seq("h"), "left_anti")
        .select(col("image_id"), col("salt"), col("h"))
      resolved = Some(resolved.fold(ok)(_.unionByName(ok)).localCheckpoint())
      pending = conflicted
      round += 1
    }
    resolved.map(_.select(col("image_id"), col("salt")))
  }
}
