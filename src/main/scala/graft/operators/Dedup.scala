package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._

/** Document deduplication for training-data pipelines, at four rungs of the
  * exactness ladder: exact (hash groupBy), MinHash+LSH (shingle → signature
  * → band bucket join → jaccard verify), SimHash (bit-sum fingerprint +
  * banded hamming join), and blocked n-gram jaccard.
  *
  * Scale notes (100 TB):
  *  - exact dedup groups on a 64-bit md5 prefix, never on raw text — the
  *    shuffle moves 8-byte keys, not documents;
  *  - MinHash/LSH is the linear-time path: candidates come from equality
  *    joins on band keys (shuffle on small hex keys); the quadratic jaccard
  *    verify runs only inside buckets, whose size LSH keeps tiny;
  *  - pair enumeration always emits (min_id, max_id) once, via id ordering
  *    inside the bucket join;
  *  - everything is built-in expressions — codegen'd, no UDF.
  */
object Dedup {

  /** Exact dedup groups: fingerprint → keeper (min id) + multiplicity. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Canonical text normalization for dedup: lowercase, strip everything
    * outside [a-z0-9 ] to spaces, collapse runs, trim. Deliberately
    * engine-portable (lower + two regexp_replace + trim — identical
    * semantics in DuckDB), so normalized fingerprints hash-verify. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** Exact dedup groups over NORMALIZED text (d1b) — the form production
    * pipelines use: case, punctuation, and whitespace variants of the
    * same content land in one group. Same plan as [[exactGroups]]: one
    * count shuffle on the md5-prefix fingerprint, never the text. */
  def exactGroupsNormalized(docs: DataFrame, textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame =
    docs.groupBy(fingerprint(normalizeText(col(textCol))).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact-dedup survivor set: one row per distinct text (the min-id row). */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val keepers = exactGroups(docs, textCol, idCol)
      .select(col("keeper_id").as(idCol))
    docs.join(keepers, idCol) // semi-ish inner on unique keeper ids
  }

  /** Per-doc MinHash signatures (k salted md5-min permutations over n-word
    * shingles) as columns sig_0..sig_{k-1}, plus band keys band_0.. for LSH
    * (rowsPerBand signatures per band). */
  def minhashSignatures(docs: DataFrame, k: Int = 8, shingleN: Int = 3,
                        rowsPerBand: Int = 2, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(k <= minhashCoeffs.size, s"at most ${minhashCoeffs.size} permutations")
    require(k % rowsPerBand == 0,
      s"rowsPerBand=$rowsPerBand must divide k=$k — trailing signatures would be silently excluded from all bands, cutting LSH recall")
    // two-step materialization: one md5 per TOKEN, then integer-only shingle
    // hashes, then k cheap affine-permutation folds — no shingle strings
    val withH = docs.select(col(idCol), tokenHashes(tokens(col(textCol))).as("__th"))
      .select(col(idCol), hashedShingles(col("__th"), shingleN).as("__hs"))
    val sigs = (0 until k).map(i => minhashFromHashes(col("__hs"), i).as(s"sig_$i"))
    val sigDf = withH.select(col(idCol) +: sigs: _*)
    val sigCols = (0 until k).map(i => col(s"sig_$i"))
    val bands = (0 until k / rowsPerBand).map(b =>
      bandKey(sigCols, b, rowsPerBand).as(s"band_$b"))
    sigDf.select((col(idCol) +: sigCols) ++ bands: _*)
  }

  /** MinHash-LSH near-dup pairs: docs sharing any band key become candidates;
    * candidates are verified with exact shingle jaccard ≥ threshold.
    * One equality-join shuffle on (band_idx, band_key); distinct on the pair
    * id removes multi-band duplicates before the (expensive) verify. */
  def minhashPairs(docs: DataFrame, threshold: Double, k: Int = 8,
                   shingleN: Int = 3, rowsPerBand: Int = 2,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nBands = k / rowsPerBand
    val sigs = minhashSignatures(docs, k, shingleN, rowsPerBand, textCol, idCol)
    val bands = sigs.select(col(idCol),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band_idx"), col(s"band_$b").as("bkey"))): _*)).as("b"))
      .select(col(idCol), col("b.band_idx"), col("b.bkey"))
      .filter(col("bkey").isNotNull)
      // pre-shuffle on the join key so both self-join sides reuse one
      // exchange — the 8-pass minhash scan runs once, not twice
      .repartition(col("band_idx"), col("bkey"))
    val left = bands.select(col(idCol).as("id_a"), col("band_idx"), col("bkey"))
    val right = bands.select(col(idCol).as("id_b"), col("band_idx"), col("bkey"))
    val cand = left.join(right, Seq("band_idx", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // Verify only candidate docs. The candidate ID SET is derived from the
    // pre-shuffled `bands` frame (ids in buckets of size ≥ 2), NOT from
    // `cand`: consuming `cand` twice would re-run the whole band join per
    // consumer, while `bands` is already an exchange all consumers reuse.
    // No broadcast hint: on a dup-heavy corpus the candidate set is NOT
    // small — let AQE pick the join strategy from real sizes.
    val candIds = bands
      .withColumn("__bsize",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("bkey"))))
      .filter(col("__bsize") > 1)
      .select(col(idCol)).distinct()
    val sh = docs.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), tokenHashes(tokens(col(textCol))).as("__th"))
      .select(col(idCol), array_distinct(hashedShingles(col("__th"), shingleN)).as("sh"))
    cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** Incremental near-dup check: a FRESH batch against an EXISTING corpus —
    * the ingest-time shape (production persists the corpus side's
    * signatures once; each arriving batch only computes its own). Same
    * LSH architecture as [[minhashPairs]]: candidates from a band-key
    * equality join ACROSS the two sides (never new×corpus cartesian),
    * verify by exact shingle jaccard on the semi-join-pruned candidates.
    * Returns (new_id, corpus_id, jac ≥ threshold). */
  def minhashPairsAcross(corpus: DataFrame, fresh: DataFrame, threshold: Double,
                         k: Int = 8, shingleN: Int = 3, rowsPerBand: Int = 2,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nBands = k / rowsPerBand
    def bands(docs: DataFrame) =
      minhashSignatures(docs, k, shingleN, rowsPerBand, textCol, idCol)
        .select(col(idCol),
          explode(array((0 until nBands).map(b =>
            struct(lit(b).as("band_idx"), col(s"band_$b").as("bkey"))): _*)).as("b"))
        .select(col(idCol), col("b.band_idx"), col("b.bkey"))
        .filter(col("bkey").isNotNull)
    val cand = bands(fresh).select(col(idCol).as("new_id"), col("band_idx"), col("bkey"))
      .join(bands(corpus).select(col(idCol).as("corpus_id"), col("band_idx"), col("bkey")),
        Seq("band_idx", "bkey"))
      .select("new_id", "corpus_id").distinct()
    def shingleSets(docs: DataFrame, ids: DataFrame, as: String) =
      docs.join(ids, docs(idCol) === ids(as), "left_semi")
        .select(col(idCol).as(as), tokenHashes(tokens(col(textCol))).as("__th"))
        .select(col(as), array_distinct(hashedShingles(col("__th"), shingleN)).as(s"sh_$as"))
    cand
      .join(shingleSets(fresh, cand.select("new_id"), "new_id"), "new_id")
      .join(shingleSets(corpus, cand.select("corpus_id"), "corpus_id"), "corpus_id")
      .withColumn("jac", jaccard(col("sh_new_id"), col("sh_corpus_id")))
      .filter(col("jac") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jac"))
  }

  /** Transitive near-dup clusters from candidate pairs: connected
    * components by iterative min-id label propagation. Returns one row per
    * clustered doc — (doc id, cluster id = min doc id in its component,
    * cluster size); docs in no pair are their own trivial cluster and are
    * omitted.
    *
    * Scale design: the standard big-graph CC loop — each iteration is one
    * equality join of the (cached, deduped, bidirectional) edge list with
    * the current labels plus a min-aggregate, i.e. two bounded shuffles; it
    * converges in O(component diameter) iterations, and near-dup components
    * have tiny diameters (dup rings, not paths). The driver loop only reads
    * a changed-row COUNT per iteration — no data is collected.
    *
    * `pointerHalving` follows each label one extra hop per round (two more
    * joins) so chains converge in O(log diameter) rounds — worth it only
    * when components are long paths; near-dup graphs are clique-ish, so the
    * default is off, and the loop AUTO-ENABLES it if convergence hasn't
    * landed within a few plain rounds (a long-chain component slipped in) —
    * halving never changes the fixpoint, only how fast it's reached. */
  def dupClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                  maxIter: Int = 20, pointerHalving: Boolean = false,
                  maxDriverEdges: Long = 1L << 22): DataFrame = {
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val (tA, tB) = (pairs.schema(idA).dataType, pairs.schema(idB).dataType)
    if (integral(tA) && integral(tB))
      dupClustersLong(pairs, idA, idB, maxIter, pointerHalving, maxDriverEdges)
    else
      dupClustersAny(pairs, idA, idB, maxIter, pointerHalving, maxDriverEdges)
  }

  /** Arbitrary-id (string/UUID/date/...) clustering: build a surrogate-key
    * dictionary over the DISTINCT ids appearing in any pair, run the long
    * CC on the surrogates, map both output id columns back. The dictionary
    * assignment is a range-partitioned global sort + `zipWithIndex` — order-
    * preserving (consecutive ranges land in consecutive partition indices),
    * so the component's min SURROGATE is the min ORIGINAL id under the id
    * type's natural ordering, and `cluster_id` keeps its usual meaning. No
    * single-partition rank window: zipWithIndex costs one extra count job
    * for the per-partition offsets and otherwise stays fully parallel; the
    * dictionary holds only ids that occur in a pair (clustered docs), never
    * the corpus. */
  private def dupClustersAny(pairs: DataFrame, idA: String, idB: String,
                             maxIter: Int, pointerHalving: Boolean,
                             maxDriverEdges: Long): DataFrame = {
    val idType = pairs.schema(idA).dataType
    require(pairs.schema(idB).dataType == idType,
      s"dupClusters: $idA (${pairs.schema(idA).dataType}) and $idB " +
        s"(${pairs.schema(idB).dataType}) must share one id type")
    val spark = pairs.sparkSession
    // The pair DAG (an LSH band join + jaccard verify, typically) is the
    // expensive part, and this path consumes it several times — dictionary
    // build, parity count, surrogate mapping. Persist the two-column
    // projection ONCE; every downstream consumer reads the cached rows.
    val pr = pairs.select(col(idA), col(idB)).persist()
    // r15 fast path: up to maxDriverEdges the component structure fits on
    // the driver (the dupClustersLong economics), and for STRING ids the
    // driver can reproduce Spark's sort order exactly (UTF8String binary
    // order), so the whole surrogate-dictionary machinery — global sort +
    // zipWithIndex + two mapping joins + two recovery joins, ~8 jobs over
    // a tiny graph — collapses into one collect + union-find.
    if (idType == StringType) {
      val nIn = pr.count()
      if (nIn <= maxDriverEdges)
        try return driverUnionFindUtf8(pr, idA, idB)
        finally pr.unpersist()
    }
    val dictSchema = StructType(Seq(StructField("id", idType),
      StructField("__sid", LongType, nullable = false)))
    try {
      val ids = pr.select(col(idA).as("id"))
        .union(pr.select(col(idB).as("id")))
        .filter(col("id").isNotNull).distinct()
      val dict = spark.createDataFrame(
        ids.orderBy(col("id")).rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.get(0), i)
        }, dictSchema).persist()
      try {
        val mapped = pr
          .join(dict.select(col("id").as(idA), col("__sid").as("__sa")), idA)
          .join(dict.select(col("id").as(idB), col("__sid").as("__sb")), idB)
          .select(col("__sa").as(idA), col("__sb").as(idB))
        // inner joins drop null-id edges silently — count parity fails loudly
        // instead (cached-scan actions; the long path never pays them)
        val (nIn, nMapped) = (pr.count(), mapped.count())
        require(nMapped == nIn,
          s"dupClusters: ${nIn - nMapped} pairs carry NULL $idA/$idB values")
        val longOut = dupClustersLong(mapped, idA, idB, maxIter, pointerHalving,
          maxDriverEdges)
        val res = longOut
          .join(dict.select(col("__sid").as("doc_id"), col("id").as("__doc")), "doc_id")
          .join(dict.select(col("__sid").as("cluster_id"), col("id").as("__cl")), "cluster_id")
          .select(col("__doc").as("doc_id"), col("__cl").as("cluster_id"),
            col("cluster_size"))
        // the dictionary and pair cache feed the returned plan — materialize
        // the result before releasing either
        res.localCheckpoint(true)
      } finally dict.unpersist()
    } finally pr.unpersist()
  }

  private def dupClustersLong(pairs: DataFrame, idA: String, idB: String,
                              maxIter: Int, pointerHalving: Boolean,
                              maxDriverEdges: Long): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint
    // materialize the (possibly expensive) pair DAG ONCE; the reversed
    // direction is then a cheap scan of the cached rows, not a recompute
    val p = pairs.select(col(idA).cast(LongType).as("src"),
      col(idB).cast(LongType).as("dst")).persist()
    // One cached-scan job counts edges AND surviving casts: a NULL integral
    // id would silently merge everything it touches into one bogus
    // component — fail loudly instead (non-integral ids never reach this
    // path; [[dupClusters]] routes them through the surrogate dictionary).
    val cnt = p.agg(count(lit(1)), count(col("src")), count(col("dst"))).head()
    val nEdges = cnt.getLong(0)
    if (cnt.getLong(1) != nEdges || cnt.getLong(2) != nEdges) {
      p.unpersist() // don't leak the cached blocks into the shared session
      throw new IllegalArgumentException(
        s"dupClusters: ${2 * nEdges - cnt.getLong(1) - cnt.getLong(2)} pair id values " +
          s"failed the LongType cast ($idA/$idB must be integral and non-null)")
    }
    if (nEdges == 0) { // no pairs → no non-trivial clusters (sum(NULL) NPEs below)
      p.unpersist()
      return p.sparkSession.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("cluster_id"),
          lit(0L).as("cluster_size")).limit(0)
    }
    // Size-adaptive strategy, the broadcast-join pattern applied to CC: a
    // near-dup PAIR graph is orders of magnitude smaller than the corpus
    // that produced it (only docs with a band collision AND a verified
    // jaccard appear), so up to `maxDriverEdges` (~4M edges ≈ 64 MB of
    // longs) the whole component structure fits on the driver and a
    // union-find closes it in one pass — no per-round join/shuffle/
    // checkpoint latency, which dominates the distributed loop on
    // synchronous round count (8-10 rounds × fixed job cost). Past the
    // threshold the O(diameter)-round distributed loop below takes over;
    // both paths produce identical output and are spec-equivalence-pinned.
    if (nEdges <= maxDriverEdges) {
      try return driverUnionFind(p)
      finally p.unpersist()
    }
    // cache edges already hash-partitioned on the per-iteration join key:
    // the cached partitioning satisfies the join requirement, so only the
    // (small) label side shuffles each round, never the edge list
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst"))
      .persist()
    try {
      // Each round is cut off from its ancestry with an EAGER localCheckpoint,
      // not persist(): a persisted frame still carries its full logical plan,
      // and the loop references the previous round twice (join + union), so
      // lineage — and Catalyst's planning work — would DOUBLE per iteration.
      // Checkpointing keeps every round's plan O(1). (GraphX does the same
      // periodic materialization for its Pregel loops.)
      //
      // first propagation round folded into the init: lbl = min(self, neighbors)
      var labels = edges.groupBy(col("src")).agg(min(col("dst")).as("__mn"))
        .select(col("src").as("id"), least(col("src"), col("__mn")).as("lbl"))
        .localCheckpoint(true)
      // labels only ever decrease, so an unchanged sum ⇔ a fixpoint — one
      // tiny scalar action per round instead of a join-and-count
      var prevSum = labels.agg(sum(col("lbl"))).head().getLong(0)
      var it = 0
      var converged = false
      // auto-escalation threshold: clique-ish components converge in 2-3
      // plain rounds; still-moving labels past this point mean a long-chain
      // component, where halving's O(log d) beats the plain O(d) walk
      val halveAfter = 6
      while (!converged && it < maxIter) {
        val halving = pointerHalving || it >= halveAfter
        val prop = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
          .select(col("src").as("id"), col("lbl"))
          .union(labels)
          .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        // pointer halving: follow the label one hop through the new map —
        // chains converge in O(log diameter) rounds instead of O(diameter)
        val propCached = if (halving) Some(prop.localCheckpoint(true)) else None
        val next = (propCached match {
          case Some(pp) => // the halving join reads prop twice — compute once
            pp.join(pp.select(col("id").as("lbl"), col("lbl").as("__lbl2")), Seq("lbl"), "left")
              .select(col("id"), coalesce(col("__lbl2"), col("lbl")).as("lbl"))
          case None => prop
        }).localCheckpoint(true)
        val s = next.agg(sum(col("lbl"))).head().getLong(0)
        converged = s == prevSum
        prevSum = s
        // the superseded round's checkpoint blocks are dead weight the
        // CacheManager can't see (Dataset.unpersist is a no-op on them) —
        // free them now, not at some eventual driver GC
        unpersistCheckpoint(labels)
        propCached.foreach(unpersistCheckpoint)
        labels = next
        it += 1
      }
      require(converged, s"label propagation did not converge in $maxIter iterations")
      val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
      val out = labels.join(sizes, "lbl")
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"), col("cluster_size"))
      // the final labels checkpoint feeds the returned plan — materialize the
      // result before releasing it
      val res = out.localCheckpoint(true)
      unpersistCheckpoint(labels)
      res
    } finally { edges.unpersist(); p.unpersist() }
  }

  /** Driver-side union-find over a collected (src, dst) edge frame — the
    * small-graph fast path of [[dupClusters]]. Union attaches the larger
    * root under the smaller, so each component's root IS its min id; path
    * compression keeps finds near-O(1). Output schema matches the
    * distributed loop exactly: (doc_id, cluster_id = component min,
    * cluster_size). */
  private def driverUnionFind(p: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val seen = scala.collection.mutable.LongMap.empty[Unit]
    p.collect().foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      seen(a) = (); seen(b) = ()
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val labels = seen.keys.map(id => id -> find(id)).toSeq
    val sizes = labels.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val spark = p.sparkSession
    import spark.implicits._
    labels.map { case (id, lbl) => (id, lbl, sizes(lbl)) }
      .toDF("doc_id", "cluster_id", "cluster_size")
  }

  /** [[driverUnionFind]] for STRING ids — the small-graph fast path of
    * [[dupClustersAny]]. `cluster_id` is the component's minimum id under
    * UTF8String BINARY order (unsigned UTF-8 byte comparison), which is
    * exactly the order the surrogate dictionary's `orderBy(id)` sorts
    * StringType by — so both paths emit identical rows (spec-pinned).
    * NULL ids fail loudly with the dictionary path's parity message. */
  private def driverUnionFindUtf8(pr: DataFrame, idA: String,
                                  idB: String): DataFrame = {
    import org.apache.spark.unsafe.types.UTF8String
    val idx = new java.util.HashMap[String, Integer]()
    val ids = scala.collection.mutable.ArrayBuffer.empty[String]
    val parent = scala.collection.mutable.ArrayBuffer.empty[Int]
    def intern(s: String): Int = {
      val cached = idx.get(s)
      if (cached != null) cached.intValue()
      else { val i = ids.size; idx.put(s, i); ids += s; parent += i; i }
    }
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    var nulls = 0L
    pr.collect().foreach { row =>
      if (row.isNullAt(0) || row.isNullAt(1)) nulls += 1
      else {
        val ra = find(intern(row.getString(0)))
        val rb = find(intern(row.getString(1)))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
    }
    require(nulls == 0,
      s"dupClusters: $nulls pairs carry NULL $idA/$idB values")
    // per-component min id under UTF8 binary order + component sizes
    val minId = scala.collection.mutable.HashMap.empty[Int, String]
    val size = scala.collection.mutable.HashMap.empty[Int, Long]
    ids.indices.foreach { i =>
      val r = find(i)
      size(r) = size.getOrElse(r, 0L) + 1L
      val cur = minId.get(r)
      if (cur.isEmpty || UTF8String.fromString(ids(i))
            .compareTo(UTF8String.fromString(cur.get)) < 0)
        minId(r) = ids(i)
    }
    val spark = pr.sparkSession
    import spark.implicits._
    ids.indices.map { i =>
      val r = find(i)
      (ids(i), minId(r), size(r))
    }.toDF("doc_id", "cluster_id", "cluster_size")
  }

  /** Per-doc 16-bit SimHash fingerprints — the single-pass native form:
    * one md5 digest per token, no nibble-array materialization, no HOF
    * lambda interpretation (graft.expressions.SimHash16FromTokens;
    * spec-pinned bit-identical to the nibble composition the DuckDB
    * oracle replays — round 13 cut d3's signature scan ~2× with it). */
  def simhashes(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), graft.expressions.SimHash16
      .simhash16FromTokens(graft.functions.TextFunctions.tokens(col(textCol)))
      .as("simhash16"))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming.
    *
    * The load-bearing scale property: simhash16 lives in a 2^16-VALUE
    * space, so the quadratic candidate step runs over DISTINCT HASHES
    * (≤65,536 rows at ANY corpus size), never over documents:
    *
    *  1. ONE exchange of (id, hash) on the hash, reused by every consumer
    *     below (ReuseExchange on the identical repartition subplan);
    *  2. hash-level near pairs over the distinct values via the banded
    *     pigeonhole (split 16 bits into maxHamming+1 chunks — any pair
    *     within the bound shares an exact chunk — then bit_count
    *     verifies): bounded by the value space, independent of corpus;
    *  3. hamming-0 doc pairs: partition-local self-join on the hash;
    *  4. cross-hash doc pairs: join the tiny hash-pair table onto the
    *     corpus (AQE broadcasts it at runtime; the h_a probe reuses the
    *     step-1 partitioning, so only the partner-hash hop shuffles, and
    *     it moves docs × present-neighbors rows — output-bound).
    *
    * Pairs are unique by construction (a doc pair maps to exactly one
    * ordered hash pair), so there is no terminal distinct. The previous
    * per-document band join was (docs/bucket)² per bucket — quadratic in
    * the corpus, ~10M candidates at sf0.1 against ~10^4 real pairs. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 2,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 16 / chunks
    val sh = simhashes(docs, textCol, idCol).repartition(col("simhash16"))
    // 3. identical hashes: no exchange beyond sh's own (both sides reuse it)
    val same = sh.select(col(idCol).as("id_a"), col("simhash16"))
      .join(sh.select(col(idCol).as("id_b"), col("simhash16")), "simhash16")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(lit(0L)).as("hamming")) // typed like the cross branch
    // 2. the value-space candidate step: distinct() folds into sh's
    // partitioning (no exchange), the band join runs on ≤2^16 rows
    val hs = sh.select(col("simhash16")).distinct()
    val banded = hs.select(col("simhash16"),
      explode(array((0 until chunks).map(cix =>
        struct(lit(cix).as("chunk_idx"),
          shiftright(col("simhash16"), cix * bitsPer)
            .bitwiseAND(lit((1L << bitsPer) - 1)).as("chunk"))): _*)).as("c"))
      .select(col("simhash16"), col("c.chunk_idx"), col("c.chunk"))
    val hashPairs = banded
      .select(col("simhash16").as("h_a"), col("chunk_idx"), col("chunk"))
      .join(banded.select(col("simhash16").as("h_b"), col("chunk_idx"), col("chunk")),
        Seq("chunk_idx", "chunk"))
      .filter(col("h_a") < col("h_b"))
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("h_a"), col("h_b"), col("hamming")).distinct()
    // 4. expand hash pairs to doc pairs; least/greatest restores id order
    val cross = sh.select(col(idCol).as("__ia"), col("simhash16").as("h_a"))
      .join(hashPairs, "h_a")
      .join(sh.select(col(idCol).as("__ib"), col("simhash16").as("h_b")), "h_b")
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("hamming"))
    same.unionByName(cross)
  }

  /** Blocked n-gram jaccard: candidate pairs share a blocking key (source +
    * length bucket — cheap equality join, no cartesian), verified with exact
    * shingle jaccard. The honest-quadratic baseline to MinHash's linear
    * path; blocking bounds the quadratic term to within-block pairs.
    *
    * `maxBlock` caps the quadratic: blocks larger than it are excluded from
    * pairing (a single hot block — one popular source × one common length —
    * is otherwise an unbounded O(n²) straggler at 100 TB). The count rides
    * on the same exchange as the join (window partitioned by the shuffle
    * keys — no extra shuffle). Dropped blocks are NOT silent: route them
    * through [[minhashPairs]] (the linear-time path) or audit them with
    * [[oversizedBlocks]]. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, shingleN: Int = 3,
                        lenBucket: Int = 20, maxBlock: Int = 256,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol), col("source"),
      floor(col("n_chars") / lenBucket).as("len_b"),
      tokenHashes(tokens(col(textCol))).as("__th"))
      .select(col(idCol), col("source"), col("len_b"),
        array_distinct(hashedShingles(col("__th"), shingleN)).as("sh"))
      .repartition(col("source"), col("len_b")) // shared exchange for both sides
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"), col("len_b"))))
      .filter(col("__bn") <= maxBlock)
    val l = base.select(col(idCol).as("id_a"), col("source"), col("len_b"), col("sh").as("sh_a"))
    val r = base.select(col(idCol).as("id_b"), col("source"), col("len_b"), col("sh").as("sh_b"))
    l.join(r, Seq("source", "len_b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** Audit companion to [[ngramJaccardPairs]]'s cap: the blocks it would
    * exclude, with sizes — so a pipeline can count/route them explicitly
    * instead of losing coverage silently. */
  def oversizedBlocks(docs: DataFrame, lenBucket: Int = 20,
                      maxBlock: Int = 256): DataFrame =
    docs.groupBy(col("source"), floor(col("n_chars") / lenBucket).as("len_b"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBlock)

  /** Embedding near-dup pairs: same-label blocking, cosine ≥ threshold.
    * Norms are precomputed per VECTOR (one pass over n rows) rather than per
    * pair (n² passes); the per-pair work is a single dot product. Both sides
    * share one pre-shuffled exchange.
    *
    * `maxBlock` caps the within-label quadratic exactly like
    * [[ngramJaccardPairs]] — a label holding most of the corpus is otherwise
    * one O(n²) straggler; route oversized labels through [[minhashPairs]] or
    * an ANN index instead. */
  /** Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540): the
    * blocking structure is LEARNED — k-means cells from
    * [[Similarity.ivfTrain]] — instead of a given label, so semantically
    * close vectors land in the same block even when no metadata says so.
    * Within each cell, a vector is DROPPED iff a LOWER-id vector shares
    * the cell with cosine ≥ threshold: a deterministic, order-free keep
    * rule (no greedy chain whose outcome depends on visit order), one
    * within-cell pair scan. Returns every vector with its cell and
    * verdict, so the caller either anti-joins the drops or audits the
    * rate.
    *
    * Scale shape: cell assignment is the zero-exchange broadcast-centroid
    * map ([[Similarity.assignCells]]); the pair scan is cell-blocked like
    * [[embeddingPairs]]'s label blocks (never all-pairs) with the same
    * `maxCell` cap against a degenerate clustering; at 100 TB nlist grows
    * with the corpus so cells stay ~√n-sized and the quadratic stays
    * local. */
  def semanticDedup(emb: DataFrame, cents: Seq[(Int, Seq[Double])],
                    threshold: Double, maxCell: Int = 65536,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions._
    require(threshold > 0 && threshold <= 1, s"bad cosine threshold $threshold")
    val assigned = Similarity.assignCells(emb, cents, vecCol)
      .select(col(idCol), col("cell"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nrm"))
    val base = assigned.repartition(col("cell"))
      .withColumn("__cn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))))
      .filter(col("__cn") <= maxCell)
    val keep = base.select(col(idCol).as("id_keep"), col("cell"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val cand = base.select(col(idCol).as("id_drop"), col("cell"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    val dropped = keep.join(cand, Seq("cell"))
      .filter(col("id_keep") < col("id_drop"))
      .filter(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))
        >= threshold)
      .select(col("id_drop")).distinct()
    assigned.select(col(idCol), col("cell"))
      .join(dropped.withColumn("__d", lit(true)),
        col(idCol) === col("id_drop"), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("__d"), lit(false)).as("is_dup"))
  }

  def embeddingPairs(emb: DataFrame, threshold: Double, maxBlock: Int = 4096,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     blockCol: String = "label"): DataFrame = {
    import graft.functions.VectorFunctions._
    val base = emb.select(col(idCol), col(blockCol), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
      .repartition(col(blockCol))
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(blockCol))))
      .filter(col("__bn") <= maxBlock)
    val l = base.select(col(idCol).as("id_a"), col(blockCol),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val r = base.select(col(idCol).as("id_b"), col(blockCol),
      col("v").as("v_b"), col("nrm").as("n_b"))
    l.join(r, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select(col(blockCol), col("id_a"), col("id_b"), col("cos"))
  }
}
