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
    var resolved: Option[DataFrame] = None // (image_id, salt, h)
    var round = 1L
    while (!pending.isEmpty) {
      require(round <= maxRounds,
        s"id collision repair did not converge in $maxRounds rounds — " +
          "duplicate image_ids in the corpus, or a pathological hash")
      val attempt = pending
        .withColumn("salt", lit(round))
        .withColumn("h", salted(col("image_id"), col("salt")))
      // (a) shuffle-free corpus pass: base-hash values the candidates hit
      val corpusHits = baseHashes
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
