package graft

/** Core schema catalog (SURVEY.md §1.3). All intermediate state is typed
  * `Dataset[T]` / DataFrame with fixed case-class schemas — the
  * idiomatic-Spark replacement for the reference's pandas-dynamic frames
  * (SURVEY.md §1.1; reference mount empty, spec reconstructed from
  * BASELINE.json:L6/L14/L15).
  */

/** The binding input shape — BASELINE.json:L15 `input_hint`. */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String, // "png" | "jpeg"
    caption: String,
    phash: Long
)

/** Per-image signature row (stage 1 output). */
final case class SignatureRow(
    image_id: String,
    minhash: Array[Int], // cfg.numPerms lanes
    simhash: Long
)

/** Canonical candidate pair, a < b (SURVEY.md §2.2 P8). */
final case class CandPair(a: String, b: String, src: String)

final case class ScoredPair(
    a: String,
    b: String,
    jaccard_sig: Double,
    hamming: Int,
    span_len: Int
)

final case class VerifiedPair(
    a: String,
    b: String,
    psnr: Double,
    caption_eq: Boolean,
    is_dup: Boolean
)

final case class ClusterRow(image_id: String, cluster_id: String)

/** Per-partition lineage + metrics row (BASELINE.json:L6/L14). */
final case class MetricRow(
    run_id: String,
    stage: String,
    snapshot: Int,
    partition_id: Int,
    rows: Long,
    wall_ms: Long
)

/** Labeled fixture pair (reconstructed reference labels — SURVEY.md §5.1). */
final case class PairLabel(a: String, b: String, label: Boolean, kind: String)

/** Pinned signature/shingle config (BASELINE.json:L6 "same shingle/signature
  * config"). Hashed into the run manifest for resume idempotence.
  *
  * LSH s-curve: with b bands of r rows, P[candidate] = 1-(1-s^r)^b; at
  * b=32, r=4 the threshold (1/b)^(1/r) ≈ 0.42 Jaccard (MMDS ch.3).
  */
final case class DedupConfig(
    shingleK: Int = 5, // char k-gram length on normalized caption
    numPerms: Int = 128, // MinHash permutations (BASELINE.json:L6)
    bands: Int = 42, // LSH bands b — 42×3 uses 126 of 128 lanes;
    rowsPerBand: Int = 3, //   threshold (1/b)^(1/r) ≈ 0.287 (MMDS ch.3).
    //   Chosen against BOTH tails: the paraphrase hard case (J≈0.5) is
    //   caught at 1-(1-J^3)^42 ≈ 0.996, while background noise (J≈0.1,
    //   dup-heavy corpora share vocabulary) collides at only ~0.04 —
    //   r=2 at the same perms admits ~47%% of noise pairs and explodes
    //   candidate volume ~25×; r=4 misses 13%% of J=0.5 true pairs.
    simhashBlocks: Int = 6, // pigeonhole blocks q for Hamming prefilter
    simhashMaxHamming: Int = 3, // max Hamming distance h (needs q > h)
    minJaccardSig: Double = 0.20, // signature Jaccard gate — bounds the PSNR
    //   stage volume only; final precision comes from pixel verification
    psnrThresholdDb: Double = 40.0, // BASELINE.json:L15 invariant
    saMinSpan: Int = 24, // min exact shared caption span (chars)
    saGramK: Int = 8, // winnowing k-gram length for span routing
    bucketCap: Int = 256, // max ids kept per LSH/simhash bucket (W2).
    //   Skew handling is the bounded min-set aggregate (map-side combine,
    //   O(cap) state per key) — explicit salt fan-out config was removed
    //   with the salted-window caps it parameterized.
    topKPerImage: Int = 50, // top-k candidate pairs kept per image (W1)
    sigBuckets: Int = 32, // bucket count for the committed signature table
    //   (Iceberg bucket transform): scoring equi-joins on id then read an
    //   exchange-free signature side. Sized to the cluster's shuffle
    //   parallelism in production (thousands); 32 matches the sandbox.
    broadcastSigRows: Long = 4000000L, // sigs ≤ this → broadcast scoring join
    streamCompactEvery: Int = 8, // stream cluster sink: max delta snapshots
    //   before the merge-on-read view is compacted into a full base
    //   snapshot (Iceberg compaction cadence twin). Bounds both the
    //   read-side delta chain and the amortized write cost:
    //   O(corpus/K + churn) per batch instead of O(corpus).
    useOphSignatures: Boolean = false, // one-permutation-hashing MinHash
    //   (Hashing.ophMinHash): ONE hash per shingle instead of numPerms —
    //   the signature-stage CPU cut at 10¹² rows. Same 128-entry sketch
    //   shape and banding; P[bin match] ≈ J with MinHash-like
    //   concentration once shingle sets are a few times larger than the
    //   bin count (Shrivastava/Li ICML 2014). Default OFF for exactly
    //   that reason: short captions (~35–95 shingles vs 128 bins) sit
    //   BELOW the concentration regime — most bins are correlated
    //   rotation borrows and the b/r s-curve margins of the classic form
    //   (above) no longer apply quantitatively. The flag is the lever for
    //   long-text corpora (the oracled q_doc_near_dup_oph regime, where
    //   docs carry thousands of shingles); classic per-lane MinHash is
    //   the BASELINE.json:L6 config. Value checks: q_doc_near_dup_oph
    //   reproduces the exact-Jaccard oracle at both SFs; PipelineSpec
    //   pins golden clusters + zero decoy merges under the flag on the
    //   caption fixture.
    seed: Long = 42L,
    requireCaptionEq: Boolean = false, // BASELINE.json:L15 states the
    //   per-row invariant as decoded-pixel allclose + CAPTION EQUALITY.
    //   Default OFF (pixel-only is_dup) is this engine's DELIBERATE
    //   reading, documented in SURVEY.md §1.2: byte-identical images with
    //   rewritten captions ARE near-duplicates for every training-data
    //   purpose this engine serves (the rewritten-caption triangle in
    //   PipelineSpec is the canonical case — A≡B bytes, B's caption
    //   rewritten to near C's; strict caption equality would split
    //   {A,B} while still merging B→C via the span path, an incoherent
    //   cluster shape). ON = the invariant's letter: a pair is a dup only
    //   if pixels match AND captions are equal — is_dup gates on
    //   caption_eq, and exact-tier byte groups feed ONLY their
    //   same-caption edges to CC. Both semantics are golden-pinned.
    exactTier: Boolean = false // T38 tier-1 for the image pipeline: group
    //   byte-identical images by md5(bytes) BEFORE signatures, drop
    //   SAME-CAPTION dup members from the signature table, and feed
    //   (canon, dup) edges straight to the CC stage. A web crawl is
    //   typically 30–50%% byte-identical refetches; collapsing them
    //   first (a) removes the dominant LSH-bucket skew source (a
    //   10k-copy viral image's same-caption copies become ONE signature
    //   row instead of a capped 256-id bucket with logged drops),
    //   (b) shrinks candidates/scoring/verify by the same-caption dup
    //   share, and (c) catches byte-identical pairs whose captions
    //   differ — which caption-keyed retrieval can miss entirely but
    //   which ARE dups under the pixel keep rule (PSNR = ∞). The drop
    //   is recall-PRESERVING, not merely plausible: only members whose
    //   caption EQUALS the canon's are dropped, so every candidate
    //   their caption would retrieve is retrieved by the canon's
    //   identical caption against identical bytes; caption-rewritten
    //   copies keep their own signature row because theirs may be the
    //   only retrieval path to a third near-dup (PipelineSpec pins that
    //   scenario). Every exact edge is a true dup edge (is_dup is
    //   pixels-only, scoring.scala); cluster labels stay min-public-id.
    //   Default OFF to keep pre-existing snapshots resumable and golden
    //   pins unchanged.
) {
  require(bands * rowsPerBand <= numPerms, "b*r must fit in numPerms")
  require(!useOphSignatures || (numPerms & (numPerms - 1)) == 0,
    "OPH needs a power-of-two bin count")
  require(simhashBlocks > simhashMaxHamming, "pigeonhole needs q > h")

  /** Stable hash of the config — stored in the run manifest; resume refuses
    * on mismatch (SURVEY.md §3.3 idempotence guard).
    *
    * Compatibility rule: a NEW config field contributes to the hash only
    * when set away from its default, so snapshots committed before the
    * field existed stay resumable under unchanged settings (adding
    * `useOphSignatures` must not force a full recompute of a
    * classic-sketch corpus). The base string is the original field order.
    */
  def configHash: String = {
    val base = List(shingleK, numPerms, bands, rowsPerBand, simhashBlocks,
      simhashMaxHamming, minJaccardSig, psnrThresholdDb, saMinSpan, saGramK,
      bucketCap, topKPerImage, sigBuckets, broadcastSigRows,
      streamCompactEvery, seed)
    val s = (base ++ (if (useOphSignatures) List("oph") else Nil)
      ++ (if (exactTier) List("exact_tier") else Nil)
      ++ (if (requireCaptionEq) List("cap_eq") else Nil))
      .mkString("|")
    java.lang.Long.toHexString(Hashing.hashString(s))
  }
}
