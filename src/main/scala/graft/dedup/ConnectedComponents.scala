package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-duplicate edge list —
  * the clustering step a real dedup pipeline needs AFTER pair generation
  * (MinHash/SimHash/Jaccard emit pairs; near-duplication is transitive
  * only through chains, so canonical group assignment = component id).
  *
  * The reference deduplicates single-process via pandas `duplicated()`
  * (exact keys only — /root/reference/src/preprocessing.py); at 10^12-row
  * scale the transitive grouping has to be a fixpoint of bounded
  * DataFrame passes. This is the alternating large-star / small-star
  * algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
  * "Connected Components in MapReduce and Beyond", SoCC 2014): converges
  * in O(log² n) rounds, and every round is two key-partitioned
  * aggregations + joins — NO per-node neighbor lists are ever
  * materialized (no collect_list), so a mega-component hub with millions
  * of neighbors costs one extra join row per neighbor, not one task's
  * memory. At convergence the edge set is a forest of stars rooted at
  * each component's minimum id.
  *
  * Iteration state is cut with `localCheckpoint` (the logical plan would
  * otherwise double per round and the analyzer, not the executors,
  * becomes the bottleneck); a cluster deployment with a checkpoint dir
  * would use reliable `checkpoint` for the same purpose.
  */
object ConnectedComponents {

  /** One large-star round: every node u connects each strictly-larger
    * neighbor v to m(u) = min(Γ(u) ∪ u). Expressed as a groupBy(min) +
    * join so high-degree hubs never concentrate in one task.
    */
  private[dedup] def largeStar(e: DataFrame): DataFrame = {
    val dir = directed(e)
    val mins = dir.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    canonical(dir.join(mins, "src").where(col("dst") > col("src"))
      .select(col("dst").as("a"), col("m").as("b")))
  }

  /** One small-star round: every node u connects its strictly-smaller
    * neighbors (and itself) to the minimum of that set.
    */
  private[dedup] def smallStar(e: DataFrame): DataFrame = {
    val dir = directed(e)
    val smaller = dir.where(col("dst") < col("src"))
    val mins = smaller.groupBy("src").agg(min("dst").as("m"))
    val leaves = smaller.join(mins, "src")
      .select(col("dst").as("a"), col("m").as("b"))
    val centers = mins.select(col("src").as("a"), col("m").as("b"))
    canonical(leaves.union(centers))
  }

  private def directed(e: DataFrame): DataFrame =
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))

  /** Undirected-canonical form: src < dst, self-loops dropped, distinct. */
  private def canonical(e: DataFrame): DataFrame =
    e.where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .distinct()

  /** Component assignment for every node that appears in `edges`:
    * (id, component) where component = min node id of the component.
    * Nodes not present in any edge are absent (see [[assign]]).
    */
  /** Ids must be integral: cast("long") on a string id column would turn
    * every endpoint NULL and silently report all-singleton components.
    * Map string ids to longs FIRST (zipWithUniqueId / a dense dim join —
    * not a 64-bit hash, whose collisions would silently merge groups).
    */
  private def requireIntegralId(df: DataFrame, c: String, who: String): Unit = {
    val t = df.schema(c).dataType
    require(t.isInstanceOf[org.apache.spark.sql.types.ByteType] ||
        t.isInstanceOf[org.apache.spark.sql.types.ShortType] ||
        t.isInstanceOf[org.apache.spark.sql.types.IntegerType] ||
        t.isInstanceOf[org.apache.spark.sql.types.LongType],
      s"$who: id column '$c' is $t — connected components needs integral " +
        "ids (map string ids to longs first; a hash would merge groups on collision)")
  }

  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    requireIntegralId(edges, srcCol, "components")
    requireIntegralId(edges, dstCol, "components")
    import org.apache.spark.sql.GraftBridge
    // each round's localCheckpoint caches an edge-list-sized RDD; at
    // 10^12-row scale leaving O(log n) of them resident is a real
    // storage-memory leak, so every superseded round is unpersisted as
    // soon as the convergence check no longer reads it (only the FINAL
    // star forest stays cached — the returned frame reads it lazily).
    // The checkpoint's own RDD is taken from the frame's LogicalRDD plan,
    // so concurrent jobs' cached RDDs are never touched.
    def checkpointTracked(df: DataFrame)
        : (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
      val out = df.localCheckpoint(true)
      (out, GraftBridge.checkpointRdd(out))
    }
    var (e, eRdd) = checkpointTracked(canonical(edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))))
    // Small-graph tier (optimization guide §1.2: the distributed loop's
    // per-round fixed cost — checkpoint job + fingerprint job + ~6
    // exchanges — dominates any graph whose edge list fits the driver):
    // at or below the cap the exact same (id, component=min id) mapping
    // comes from one collect + union-find. The cap bounds driver memory
    // (16 B/edge; 1M edges ≈ 16 MB) and is config-tunable; above it the
    // O(log² n) star rounds run unchanged — a 10^12-row corpus' verified
    // near-dup graph takes that path.
    val maxDriverEdges = edges.sparkSession.conf
      .getOption("spark.graft.cc.maxDriverEdges").map(_.toLong)
      .getOrElse(1000000L)
    // convergence check = ONE cheap agg job per round: the (count,
    // xor-of-edge-hash) fingerprint of a round is compared to the
    // previous round's (already known — no extra scan of `e`). Equal
    // fingerprints are necessary for set equality but probabilistic, so
    // convergence is CONFIRMED exactly with a single anti-join job that
    // runs only on the round that matches: both sides are canonical +
    // distinct, hence equal counts + empty next∖e ⟹ next = e.
    // (Replaces two exceptAll jobs per round. XOR, not SUM: commutative,
    // duplicate-free input, and immune to ANSI long-overflow.)
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var eFp = fingerprint(e)
    if (eFp._1 > 0 && eFp._1 <= maxDriverEdges) {
      val collected = e.collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != c) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      collected.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        // min-id root so the representative IS the component id
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      parent.keySet().forEach(id => out += ((id, find(id))))
      eRdd.foreach(_.unpersist(false))
      val spark = edges.sparkSession
      import spark.implicits._
      return out.toSeq.toDF("id", "component")
    }
    var converged = eFp._1 == 0L
    var it = 0
    while (!converged && it < maxIter) {
      val (next, nextRdd) = checkpointTracked(smallStar(largeStar(e)))
      val nextFp = fingerprint(next)
      converged = nextFp == eFp &&
        next.join(e, Seq("src", "dst"), "left_anti").isEmpty
      eRdd.foreach(_.unpersist(false))
      e = next; eRdd = nextRdd; eFp = nextFp
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    // star forest: every canonical edge is (root, member)
    val members = e.select(col("dst").as("id"), col("src").as("component"))
    val roots = e.select(col("src").as("id"), col("src").as("component")).distinct()
    members.union(roots)
  }

  /** Component id for EVERY vertex: vertices absent from the edge list
    * are their own singleton component.
    */
  def assign(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    requireIntegralId(vertices, idCol, "assign")
    val comp = components(edges, srcCol, dstCol, maxIter)
    vertices.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("component"))
  }

  /** The one-call near-dup GROUPING surface: MinHash/LSH candidate pairs →
    * exact-Jaccard verification → transitive closure → canonical groups.
    * Returns (idCol, group_id, group_size): group_id = min doc id of the
    * duplicate cluster, singletons included. This is the full
    * "deduplicate a corpus" pipeline at its 100-TB shape — every stage is
    * the scale-audited operator it composes (O(hashes)/doc signature
    * state, id-only banded joins, candidate-bounded verification, star
    * contraction).
    *
    * Recall math for the LSH defaults (Leskovec–Rajaraman–Ullman, MMDS
    * ch.3): with `numHashes` = b·r split into b = `bands` of r rows, a
    * pair at true Jaccard s becomes a candidate with p = 1 − (1 − s^r)^b.
    * At the defaults (64 hashes, 16 bands → r = 4) a pair AT the
    * verification threshold s = 0.7 is caught with p ≈ 0.988; s = 0.8 →
    * 0.9998. q64 runs bands = 32 (r = 2), the operating point that holds
    * p ≥ 1 − 4·10⁻¹⁰ at s = 0.7 and p ≈ 0.97 even at s = 0.4 — chosen so
    * LSH misses are negligible next to the s ≥ `estJaccardMin` = 0.4
    * signature prefilter, which is what actually bounds candidate volume.
    * Verification then makes precision exact, so recall of the banding is
    * the ONLY approximation in the whole pipeline.
    *
    * `track` observes every DataFrame the composed stages persist (see
    * [[graft.dedup.Dedup.verifyJaccard]]) — long-running callers pass a
    * collector and unpersist once the returned frame is materialized.
    */
  def dupGroups(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      estJaccardMin: Double = 0.4, threshold: Double = 0.7,
      track: DataFrame => Unit = _ => ()): DataFrame = {
    requireIntegralId(df, idCol, "dupGroups")
    val sigs = Dedup.minhashSignatures(df, idCol, textCol, shingleK, numHashes)
    // estJaccardMin <= threshold: the est prefilter is strictly dominated
    // by the exact verification — banding-only candidates give the same
    // verified pairs with two fewer joins and no signature persist. An
    // estJaccardMin ABOVE the verify threshold is a genuine extra
    // condition and keeps the est path.
    val cands =
      if (estJaccardMin <= threshold)
        Dedup.minhashBandPairs(sigs, idCol, bands, sigLen = numHashes)
      else Dedup.minhashLshCandidates(sigs, idCol, bands, estJaccardMin,
        track, sigLen = numHashes).select("a_id", "b_id")
    val verified = Dedup.verifyJaccard(df, cands,
      idCol, textCol, shingleK, threshold, track)
    val comp = assign(df.select(idCol), idCol, verified, "a_id", "b_id")
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("group_size"))
    comp.join(sizes, "component")
      .select(col(idCol), col("component").as("group_id"), col("group_size"))
  }
}
