package graft.operators

import graft.Tables
import graft.functions.Det.dround
import graft.functions.TextHash
import graft.functions.VectorExprs.cosine_similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline (SURVEY.md §2B
  * row 30 + builder-prompt extension list): exact hash dedup, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale shapes (designed for ~100 TB of documents):
  *  - exact dedup: one shuffle on the content hash (map-side partial agg);
  *  - MinHash LSH: signature is computed in a single pass per doc, then
  *    candidates come from an equality join on (band, bandHash) — the
  *    classic inverted-index shape; no O(n²) pair scan ever materializes;
  *  - n-gram Jaccard: shingle-inverted-index join, same property;
  *  - embedding near-dup: brute-force all-pairs here (oracle-checkable);
  *    the bucketed scale path is SimilarityQueries.q46_ann_lsh.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- 40. Exact dedup via content hash (md5 of normalized text) ----
  val q40_dedup_exact: Q = (s, dir) =>
    t(s, dir, "documents")
      .groupBy(md5(lower(trim(col("text")))).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"))
      .orderBy("h")

  val q40_dedup_exact_sql: String =
    """SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keeper,
      |  count(*) AS copies
      |FROM documents GROUP BY 1 ORDER BY h""".stripMargin

  // ---- 41. MinHash + LSH near-dup candidates (bench-only: the minhash
  //          permutation family is not expressible in DuckDB SQL) ----
  val q41_minhash_lsh: Q = (s, dir) => {
    import graft.functions.TextHashExprs.{band_hashes, minhash_signature}
    // Candidate generation is ids-only: the 64-long signatures never enter
    // the band exchange (they'd be duplicated once per band), and
    // est_jaccard is computed exactly once per distinct candidate pair —
    // the signatures are joined back on the deduplicated (ia, ib) set.
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), minhash_signature(col("text"), 3).as("sig"))
      .withColumn("bands", band_hashes(col("sig")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = docs
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bh")))
    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band", "bh"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .filter(col("ia") < col("ib"))
      .distinct()
    candidates
      .join(docs.select(col("doc_id").as("ia"), col("sig").as("sig_a")), "ia")
      .join(docs.select(col("doc_id").as("ib"), col("sig").as("sig_b")), "ib")
      .select(col("ia"), col("ib"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), p => p)) / lit(TextHash.NumPerms.toDouble))
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("ia"), col("ib"), dround(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy("ia", "ib")
  }

  // ---- 42. SimHash near-dup candidates (bench-only) ----
  val q42_simhash: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextHashExprs.simhash64(col("text")).as("sh"))
    // 4 bands of 16 bits: two docs within hamming distance 3 of each
    // other share at least one exact 16-bit band.
    val banded = docs.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band"),
          shiftright(col("sh"), 16 * k).bitwiseAND(lit(0xFFFFL)).as("bh"))): _*))
        .as("b"))
      .select(col("doc_id"), col("sh"), col("b.band"), col("b.bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.select(col("doc_id").as("ia"), col("sh").as("sh_a"),
      col("band"), col("bh"))
    val b = banded.select(col("doc_id").as("ib"), col("sh").as("sh_b"),
      col("band"), col("bh"))
    a.join(b, Seq("band", "bh"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 4)
      .orderBy("ia", "ib")
  }

  // ---- 43. Exact n-gram (3-word shingle) Jaccard near-dup ----
  // Ground truth ONLY: the sum(df²) shingle self-join is the textbook
  // scale-killer, so this query is not part of the declared surface —
  // q43b produces the identical oracle-checked output through the
  // LSH-then-verify shape (DedupSpec asserts exact equality). Kept as a
  // callable so the spec can diff the two implementations row by row.
  val q43_ngram_jaccard: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
        .as("sh"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n"))
    // both sides of the self-join read this: persist so the scan +
    // shingle expansion happens once (at 100 TB: persist(DISK_ONLY)
    // or a checkpoint, same plan shape)
    val exploded = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inter = exploded.as("a")
      .join(exploded.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("ia"), col("n").as("na")), "ia")
      .join(sizes.select(col("doc_id").as("ib"), col("n").as("nb")), "ib")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") > 0.5)
      .select(col("ia"), col("ib"), dround(col("jaccard"), 4).as("jaccard"))
      .orderBy("ia", "ib")
  }

  val q43_ngram_jaccard_sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |     for i in generate_series(1, len(ws) - 2)])) AS s
      |  FROM tok WHERE len(ws) >= 3
      |), sz AS (
      |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
      |), inter AS (
      |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT ia, ib,
      |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4) AS jaccard
      |FROM inter
      |JOIN sz sa ON sa.doc_id = ia
      |JOIN sz sb ON sb.doc_id = ib
      |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) > 0.5
      |ORDER BY ia, ib""".stripMargin

  // ---- 43b. LSH-accelerated exact near-dup: MinHash banding generates
  // candidates, exact shingle Jaccard verifies them. Same result set and
  // ORACLE as q43 (the generator's near-dup pairs sit at j>=0.9, so a
  // band collision is near-certain while j<0.1 pairs almost never
  // collide; false candidates are removed by exact verification), but the
  // all-pairs shingle join never happens — at 100 TB this is the only
  // viable shape: candidates ~ O(near-dups), not O(sum df^2).
  val q43b_lsh_verified: Q = (s, dir) => {
    import graft.functions.TextHashExprs.{band_hashes, minhash_signature}
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"),
        minhash_signature(col("text"), 3).as("sig"))
      .filter(size(col("ws")) >= 3)
      .withColumn("sh", array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1), element_at(col("ws"), i + 2)))))
      .select(col("doc_id"), col("sh"), band_hashes(col("sig")).as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = docs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band", "bh"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .filter(col("ia") < col("ib"))
      .distinct()
    candidates
      .join(docs.select(col("doc_id").as("ia"), col("sh").as("sha")), "ia")
      .join(docs.select(col("doc_id").as("ib"), col("sh").as("shb")), "ib")
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("c")))
      .filter(col("jaccard") > 0.5)
      .select(col("ia"), col("ib"), dround(col("jaccard"), 4).as("jaccard"))
      .orderBy("ia", "ib")
  }

  // ---- 104. Prefix-filtered exact similarity join (AllPairs/PPJoin
  // family). q43b reaches the same answer through MinHash banding —
  // PROBABILISTIC recall (a near-dup pair that never collides in any
  // band is silently lost; vanishingly rare but nonzero). The prefix
  // filter is the deterministic-recall alternative: order every doc's
  // shingles by global rarity (document frequency asc, shingle asc —
  // a total order), and note that two sets with Jaccard > t MUST share
  // a shingle among the first |s| - ceil(t*|s|) + 1 of each (if all
  // shared shingles sat in the last ceil(t*|s|) - 1 positions, the
  // overlap would be < t*|s| <= t*|union|). So an equi-join on PREFIX
  // shingles only — the rarest slice of each doc — generates candidates
  // with recall 1 by construction, and rare shingles have tiny posting
  // lists, so the join stays O(candidates), not O(sum df^2). On top of
  // the plain prefix filter, the PPJoin reductions (Xiao, Wang, Lin,
  // Yu, WWW'08 — size filter, short indexing prefix, positional
  // filter; each proven recall-preserving inline below) cut the
  // candidate set further, and a sorted-merge intersection COUNT
  // (native codegen expression, see ArrayExprs) verifies exactly.
  // DedupSpec diffs q104 against the all-pairs q43 row for row; the
  // oracle is q43's own SQL (identical output contract).
  //
  // Scale: one map-side-combined df aggregate + one skew-splittable
  // df equi-join + one per-doc re-sort agg + one prefix-keyed join
  // + one pair-keyed agg (the positional filter — same shuffle the
  // old candidate distinct() paid, strictly more pruning);
  // every stage is key-partitioned and no all-pairs path exists. No
  // per-row broadcast of the corpus anywhere; the distinct-shingle
  // aggregate (dfBySh) may auto-broadcast when it is under the
  // threshold, which is equally skew-safe — at corpus scale it exceeds
  // the threshold and plans as the skew-splittable shuffle join.
  val q104_jaccard_join: Q = (s, dir) => {
    val T = 0.5 // strict threshold (jaccard > T), matches q43
    // sh is kept SORTED (array_sort) so the verify stage can count the
    // intersection with an allocation-free merge scan instead of
    // array_intersect's per-row hash set — see sorted_intersect_count.
    // docs persist, measured: docs-persist 5.0 s / no-persist 13.0 s /
    // pref-persist 13.8 s (sf0.1 bench median) — the verify stage joins
    // the shingle arrays twice against every candidate pair, and the
    // cache feeds those joins. One cost rides along: an
    // InMemoryRelation source defeats AQE's exchange-reuse
    // canonicalization across the self-join (TableCacheQueryStage does
    // not canonicalize over the analyzer's attribute dedup), so the
    // pref pipeline runs twice HERE. At 100 TB the trade flips: this
    // cache would be corpus-sized, a scale deployment drops it (or
    // DISK_ONLY), and the UNCACHED plan's two pref sides canonicalize
    // equal — ReusedExchange then serves side b from side a's shuffle
    // files, which PlanAuditSpec proves on an uncached all-shuffle
    // replica of exactly this shape.
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), array_sort(array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1), element_at(col("ws"), i + 2)))))
        .as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // df via a map-side-combined groupBy + equi-join back to the
    // postings, NOT a count window over the shingle partition: shingle
    // frequency in a real corpus is Zipfian, and a window partitioned
    // by the raw shingle key funnels a boilerplate trigram's ENTIRE
    // posting list into one WindowExec partition that AQE cannot split
    // (skew handling applies to shuffle joins only). The partial agg
    // ships ~n_mappers rows per hot shingle instead of n_docs posting
    // rows, and the join back on `s` IS AQE-skew-splittable — the
    // single unsplittable-hot-partition hazard disappears while the
    // prefix math (df asc, shingle asc total order) stays identical.
    // postings is referenced by both dfBySh and the join probe, so the
    // explode runs more than once — DELIBERATELY unpersisted: docs is
    // cached, re-exploding it is cheap CPU, and measured A/B at sf0.1
    // shows no gain from persisting, while at corpus scale a postings
    // cache materializes a |docs|x|shingles| relation orders of
    // magnitude larger than docs.
    val postings = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfBySh = postings.groupBy("s").agg(count(lit(1)).as("df"))
    // Per-doc shingles re-sorted by global rarity (df asc, shingle asc —
    // a total order shared by every doc). Two prefix lengths, both in
    // integer math so no float edge can shorten a prefix and cost
    // recall (ceil(n/2) = (n+1)/2, ceil(2n/3) = (2n+2)/3):
    //  - p1 = n - ceil(T*n) + 1: the PROBING prefix (prefix-filter
    //    lemma — a pair with jaccard > T shares a token inside both
    //    docs' first p1);
    //  - p2 = n - ceil(2T/(1+T)*n) + 1: the shorter INDEXING prefix,
    //    valid for the SMALLER doc of a pair (PPJoin, Xiao et al.
    //    WWW'08): jaccard > T forces overlap c > T/(1+T)*(na+nb) >=
    //    2T/(1+T)*nb for nb <= na, and the globally-first shared token
    //    then ranks <= nb - c + 1 <= p2 in the smaller doc (and <= p1
    //    in the larger). Probing the long prefix against indexing the
    //    short one cuts candidates ~2x at identical recall 1.
    val ordered = postings.join(dfBySh, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("os"),
        count(lit(1)).as("n"))
      .withColumn("p1", col("n") - floor((col("n") + 1) / 2) + 1)
      .withColumn("p2", col("n") - floor((lit(2) * col("n") + 2) / 3) + 1)
    // pref is NOT persisted (measured slower — see the docs note): the
    // self-join's two sides are written as identical subtrees so that
    // the at-scale (uncached, all-shuffle) plan reuses ONE exchange.
    // For that reuse to be real the sides must canonicalize identically
    // AFTER column pruning — which is why the indexing-prefix cut below
    // is a SYMMETRIC join condition (`when(a smaller, a.r <= a.p2)
    // .otherwise(b.r <= b.p2)`): an asymmetric spelling (only
    // b.r <= b.p2) lets the optimizer prune p2 off side a, the
    // subtrees diverge, and the exchange computes twice at every scale.
    val pref = ordered
      .select(col("doc_id"), col("n"), col("p2"),
        posexplode(expr("slice(transform(os, x -> x.s), 1, int(p1))")))
      .select(col("doc_id"), col("n"), col("p2"),
        (col("pos") + 1).as("r"), col("col").as("s"))
    // Candidate generation with the three PPJoin reductions, all
    // recall-preserving (each discards only pairs PROVABLY at or below
    // T, never a qualifying one):
    //  1. size filter: jaccard > T forces the smaller doc to hold more
    //     than T times the larger's shingles (c <= min, union >= max);
    //  2. indexing-prefix cut: the SMALLER side of a pair matches only
    //     within its short p2 prefix (ties designate side a) — spelled
    //     symmetrically so both join sides canonicalize identically
    //     (see the reuse note above);
    //  3. positional filter (replaces the candidate distinct() — same
    //     shuffle, strictly more pruning): the globally-first shared
    //     token has the MIN rank among shared tokens in BOTH docs, so
    //     overlap c <= 1 + min(na - min_ra, nb - min_rb), and
    //     jaccard > T needs c >= floor(T/(1+T)*(na+nb)) + 1.
    // Measured at sf0.1: 409,103 candidate pairs under the plain prefix
    // filter, ~205k after the size + indexing-prefix cuts, ~121k
    // after the positional filter — a 3.4x cut on the verify stage's
    // input (the stage that dominated the bench at 10.7 s; the corpus'
    // shared vocabulary makes trigram prefixes collide heavily, so the
    // verify stage itself is also rebuilt around a sorted-merge count).
    val candidates = pref.as("a")
      .join(pref.as("b"),
        col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")) * lit(2) >
            greatest(col("a.n"), col("b.n")) &&
          when(col("a.n") <= col("b.n"), col("a.r") <= col("a.p2"))
            .otherwise(col("b.r") <= col("b.p2")))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(min(col("a.r")).as("ra"), min(col("b.r")).as("rb"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .filter(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
        floor((col("na") + col("nb")) / 3) + 1)
      .select(col("ia"), col("ib"))
    // verify: exact jaccard from a sorted-merge intersection COUNT (the
    // docs' shingle arrays are pre-sorted) — no per-pair hash set, no
    // materialized intersection array; stays in whole-stage codegen
    candidates
      .join(docs.select(col("doc_id").as("ia"), col("sh").as("sha")), "ia")
      .join(docs.select(col("doc_id").as("ib"), col("sh").as("shb")), "ib")
      .withColumn("c",
        graft.functions.ArrayExprs.sorted_intersect_count(
          col("sha"), col("shb")))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("c")))
      .filter(col("jaccard") > T)
      .select(col("ia"), col("ib"), dround(col("jaccard"), 4).as("jaccard"))
      .orderBy("ia", "ib")
  }

  // ---- 44. Embedding-cosine near-dup, exact, block-partitioned ----
  // Exact all-pairs via a block-partitioned self-join (no corpus
  // broadcast): each vector goes to block g = hash(id) % B; side A is
  // replicated to block-pair keys (g, j≥g), side B to (i≤g, g), and an
  // equi-join on (pi, pj) hands each task exactly one pair of blocks —
  // memory is bounded by two blocks regardless of corpus size, and the
  // B(B+1)/2 block pairs parallelize across executors.
  //
  // Why not an LSH prefilter (the q43b pattern): the fixture's sim>0.4
  // pairs are ALL random-tail pairs at 0.40–0.60 (no planted embedding
  // near-dups; measured max sim 0.60 at sf0.1). SRP bit-agreement at
  // sim 0.4 is 0.63 vs the 0.50 background, so no banding scheme reaches
  // recall 1 without admitting ~every pair — an exact threshold this low
  // on random vectors is inherently O(n²) compute; what CAN be fixed at
  // scale is the memory/broadcast shape, which this plan does. The
  // approximate scale path for real (high-sim) near-dups stays
  // SimilarityQueries.q46_ann_lsh / q46b_ann_ivf.
  val q44_embed_neardup: Q = (s, dir) => {
    val B = 8
    val e = t(s, dir, "embeddings")
      .withColumn("g", pmod(hash(col("vec_id")), lit(B)))
    val aSide = e
      .withColumn("pj", explode(sequence(col("g"), lit(B - 1))))
      .select(col("g").as("pi"), col("pj"),
        col("vec_id").as("aid"), col("embedding").as("ea"))
    val bSide = e
      .withColumn("pi", explode(sequence(lit(0), col("g"))))
      .select(col("pi"), col("g").as("pj"),
        col("vec_id").as("bid"), col("embedding").as("eb"))
    aSide.join(bSide, Seq("pi", "pj"))
      // same-block pairs match in both orientations — keep one; cross-block
      // pairs match exactly once (A carries the lower block by construction)
      .filter(col("pi") < col("pj") || col("aid") < col("bid"))
      .withColumn("sim", cosine_similarity(col("ea"), col("eb")))
      .filter(col("sim") > 0.4)
      .select(least(col("aid"), col("bid")).as("ia"),
        greatest(col("aid"), col("bid")).as("ib"),
        dround(col("sim"), 4).as("sim"))
      .orderBy("ia", "ib")
  }

  val q44_embed_neardup_sql: String =
    """WITH s AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib,
      |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS sim
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |)
      |SELECT ia, ib, round(sim, 4) AS sim FROM s
      |WHERE sim > 0.4 ORDER BY ia, ib""".stripMargin

  // ---- 142. Semantic dedup — the SemDeDup-shaped DECISION on top of
  // q44's detection: a vector is DOMINATED when any lower-id vector
  // sits within cosine >= tau of it; dominated rows drop, every other
  // row is its group's greedy representative (lowest id wins — the
  // deterministic tie-break that makes the kept set well-defined
  // without computing connected components). The pair plan is q44's
  // block-partitioned join (each id joins only its triangular block
  // pairs — never an all-pairs broadcast), so the same plan that
  // detects near-dups also decides them; this exact form is the ORACLE
  // ANCHOR — the 100 TB path is q142b below, which scopes the pair join
  // by IVF cell (row 107's frozen model) with the decision rule
  // unchanged and gates against this query's exact semantics.
  // Output: per-label survivor census (count + id-sum), hash-matched
  // against DuckDB computing the same relational algebra. ----
  val q142_semantic_dedup: Q = (s, dir) => {
    val B = 8
    val e = t(s, dir, "embeddings")
      .withColumn("g", pmod(hash(col("vec_id")), lit(B)))
    val aSide = e
      .withColumn("pj", explode(sequence(col("g"), lit(B - 1))))
      .select(col("g").as("pi"), col("pj"),
        col("vec_id").as("aid"), col("embedding").as("ea"))
    val bSide = e
      .withColumn("pi", explode(sequence(lit(0), col("g"))))
      .select(col("pi"), col("g").as("pj"),
        col("vec_id").as("bid"), col("embedding").as("eb"))
    val dominated = aSide.join(bSide, Seq("pi", "pj"))
      .filter(col("pi") < col("pj") || col("aid") < col("bid"))
      .filter(cosine_similarity(col("ea"), col("eb")) > 0.4)
      // the HIGHER id of every close pair is dominated
      .select(greatest(col("aid"), col("bid")).as("vec_id"))
      .distinct()
    t(s, dir, "embeddings")
      .join(dominated, Seq("vec_id"), "left_anti")
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_kept"),
        sum("vec_id").cast("long").as("kept_id_sum"))
      .orderBy("label")
  }

  // ---- 142b. CELL-SCOPED semantic dedup — row 112's 100 TB path.
  // q142's decision rule over a candidate set generated from IVF cells
  // (the row-107 frozen coarse quantizer) instead of the triangular
  // all-pairs join: every vector is assigned to its `nprobe` nearest
  // cells (the SemDeDup shape — dedup WITHIN a k-means cluster; the
  // multi-assignment covers cell-boundary pairs the single-cell form
  // would split), and pairs form only WITHIN a shared cell, so the
  // candidate count is sum_c n_c² — the quadratic is cut by the cluster
  // count K, the knob SemDeDup scales with the corpus (K grows with N,
  // cell occupancy stays bounded, candidates stay ~N·occupancy). The
  // decision rule is IDENTICAL to q142: the higher id of every tau-close
  // pair is dominated; survivors are the greedy lowest-id
  // representatives. Exactness contract: false positives are impossible
  // (cosines are exact — a candidate pair only dominates if it truly
  // clears tau); recall is exact whenever every tau-close pair shares a
  // probed cell — guaranteed for duplicate/near-identical vectors
  // (identical inputs get identical cell assignments under ANY frozen
  // model) and empirically exact on clustered embeddings (DedupSpec
  // gates it against the all-pairs ground truth on both fixtures,
  // plus candidate-count ≪ N²/2). ----
  private[graft] def semanticCellPairs(cents: Seq[(Int, Seq[Double])],
      corpus: DataFrame, nprobe: Int): DataFrame = {
    def dv(c: Column): Column = transform(c, x => x.cast("double"))
    val assigned = corpus.select(col("vec_id"), col("embedding"),
        explode(slice(
          SketchQueries.cellScores(cents, col("embedding")),
          1, nprobe)).as("cs"))
      .select(col("vec_id"), col("embedding"),
        (col("cs").getField("ncid") * -1).as("cell"))
    assigned
      .select(col("cell"), col("vec_id").as("aid"), col("embedding").as("ea"))
      .join(assigned.select(col("cell"), col("vec_id").as("bid"),
        col("embedding").as("eb")), Seq("cell"))
      .filter(col("aid") < col("bid"))
  }

  /** The dominated-id set of the cell-scoped plan: higher id of every
    * tau-close candidate pair. Pairs sharing several probe cells score
    * the cosine once per shared cell (bounded by nprobe²) — cheaper
    * than a wide pre-distinct shuffle of (pair, embeddings). */
  private[graft] def semanticDedupDominated(cents: Seq[(Int, Seq[Double])],
      corpus: DataFrame, tau: Double, nprobe: Int = 2): DataFrame =
    semanticCellPairs(cents, corpus, nprobe)
      .filter(cosine_similarity(col("ea"), col("eb")) >= tau)
      .select(col("bid").as("vec_id"))
      .distinct()

  /** q142b corpus: the embeddings fixture plus PLANTED duplicates
    * (copies of vec_id < 50 at id+1,000,000) — the fixture itself has
    * no pairs above the SemDeDup operating threshold (measured max
    * cosine 0.60), so the planted copies make the dominated set
    * non-trivial while keeping the oracle exact: a copy's only tau-close
    * partner is its identical original (copy-to-other cosine equals the
    * original's ≤ 0.60). Shared by the query and its DuckDB oracle. */
  private[graft] def q142bCorpus(s: SparkSession, dir: String): DataFrame = {
    val e0 = t(s, dir, "embeddings").select("vec_id", "embedding", "label")
    e0.unionByName(e0.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding"), col("label")))
  }

  val q142b_semantic_dedup_cells: Q = (s, dir) => {
    val corpus = q142bCorpus(s, dir)
    // the row-107 coarse geometry (K=16 x 3 Lloyd, deterministic seeds);
    // in production the model loads frozen from a persisted AnnIndex
    // root (AnnIndex.loadModel) — DedupSpec pins that composition
    val cents = SketchQueries.kmeansCentroids(s,
      corpus.select("vec_id", "embedding"), k = 16, iters = 3)
    val dominated = semanticDedupDominated(cents, corpus, tau = 0.85)
    corpus
      .join(dominated, Seq("vec_id"), "left_anti")
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_kept"),
        sum("vec_id").cast("long").as("kept_id_sum"))
      .orderBy("label")
  }

  val q142b_semantic_dedup_cells_sql: String =
    """WITH corpus AS (
      |  SELECT vec_id, embedding, label FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, embedding, label FROM embeddings
      |  WHERE vec_id < 50
      |), s AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib,
      |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS sim
      |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      |), dom AS (
      |  SELECT DISTINCT ib AS vec_id FROM s WHERE sim >= 0.85
      |)
      |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_kept,
      |  CAST(sum(vec_id) AS BIGINT) AS kept_id_sum
      |FROM corpus
      |WHERE vec_id NOT IN (SELECT vec_id FROM dom)
      |GROUP BY label ORDER BY label""".stripMargin

  val q142_semantic_dedup_sql: String =
    """WITH s AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib,
      |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS sim
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |), dom AS (
      |  SELECT DISTINCT ib AS vec_id FROM s WHERE sim > 0.4
      |)
      |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_kept,
      |  CAST(sum(vec_id) AS BIGINT) AS kept_id_sum
      |FROM embeddings
      |WHERE vec_id NOT IN (SELECT vec_id FROM dom)
      |GROUP BY label ORDER BY label""".stripMargin

  val queries: Map[String, Q] = Map(
    "q40_dedup_exact" -> q40_dedup_exact,
    "q41_minhash_lsh" -> q41_minhash_lsh,
    "q42_simhash" -> q42_simhash,
    "q43b_lsh_verified" -> q43b_lsh_verified,
    "q104_jaccard_join" -> q104_jaccard_join,
    "q44_embed_neardup" -> q44_embed_neardup,
    "q142_semantic_dedup" -> q142_semantic_dedup,
    "q142b_semantic_dedup_cells" -> q142b_semantic_dedup_cells)

  val oracles: Map[String, String] = Map(
    "q40_dedup_exact" -> q40_dedup_exact_sql,
    "q142_semantic_dedup" -> q142_semantic_dedup_sql,
    "q142b_semantic_dedup_cells" -> q142b_semantic_dedup_cells_sql,
    // q41/q42: minhash + simhash families not expressible in DuckDB —
    // rows-only check; cross-validated against q43 in DedupSpec.
    // q43's exact all-pairs form is spec-only ground truth; its oracle
    // SQL lives on as q43b's check (identical output, scale-safe plan):
    "q43b_lsh_verified" -> q43_ngram_jaccard_sql,
    // q104 shares the contract: same pairs, deterministic-recall path
    "q104_jaccard_join" -> q43_ngram_jaccard_sql,
    "q44_embed_neardup" -> q44_embed_neardup_sql)
}
