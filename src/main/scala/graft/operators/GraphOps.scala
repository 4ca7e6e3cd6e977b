package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed graph primitives needed by training-data pipelines —
  * chiefly connected components, which turns near-duplicate PAIRS (from
  * MinHash/SimHash/n-gram Jaccard candidate generation, DedupOps) into
  * duplicate CLUSTERS so "keep one document per cluster" is well-defined
  * even when duplicates chain (a~b, b~c but not a~c).
  *
  * Scale design: the iterative driver loop runs a fixed small number of
  * rounds; every round is three narrow shuffles (neighbor join, min agg,
  * pointer-jump join) over (id, label) rows — no adjacency
  * materialization beyond the edge list, no driver-side graph. Pointer jumping (comp := comp(comp)) makes
  * label convergence logarithmic in component diameter, so even
  * pathological chain-shaped duplicate clusters converge in ~log2(n)
  * rounds, the same bound as the large-star/small-star MapReduce
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"). `localCheckpoint` after each round truncates lineage —
  * without it the plan doubles per iteration and Catalyst re-optimizes
  * an exponentially growing tree.
  */
object GraphOps {

  /** Connected components of an undirected graph given as an edge list.
    *
    * @param edges any DataFrame whose FIRST TWO columns are the edge
    *              endpoints (any orderable, nullable-free type; ids of
    *              one component must be mutually comparable).
    * @return (id, comp) — every vertex mapped to the minimum vertex id
    *         of its component (a canonical, deterministic cluster key).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val u = edges.columns(0)
    val v = edges.columns(1)
    // Checkpoint the raw edge list BEFORE symmetrizing: the input is
    // typically an expensive subtree (an LSH/Jaccard pair pipeline), and
    // union(e, e.swap) would otherwise embed that subtree twice in the
    // plan. After the checkpoint, the union reads materialized rows.
    val eRaw = edges.select(col(u).as("u"), col(v).as("v"))
      .filter(col("u") =!= col("v")).localCheckpoint()
    // Size-adaptive layout (r20): the iteration frames are (id, label)
    // pairs — for near-dup graphs a few thousand rows — but they inherit
    // the edge BUILD's fan-out (its checkpoint keeps the producing
    // stage's partition count), and per-task fixed costs (shuffle-writer
    // setup, codec buffers — measured ~100 ms/task on this box) then
    // dominate every round's map stages. One scalar count on the
    // materialized checkpoint picks a partition count proportional to
    // the data (~128k edge rows per task, capped at the session's
    // cores); the coalesce is NARROW (no shuffle — it only concatenates
    // already-materialized local blocks). At scale the count lands at
    // the core cap and the layout is unchanged.
    val m = eRaw.count()
    val targetParts = math.min(
      edges.sparkSession.sparkContext.defaultParallelism.toLong,
      1L + m / 131072L).toInt
    val e = if (eRaw.rdd.getNumPartitions > targetParts)
      eRaw.coalesce(targetParts) else eRaw
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    // Initialization IS the first propagation round: min over self and
    // all neighbors comes straight off the symmetrized edge list in one
    // aggregate — for clique-shaped duplicate clusters (the common case)
    // labels are already final and the loop exits after one
    // no-change round.
    var labels = sym.groupBy(col("u"))
      .agg(min(least(col("u"), col("v"))).as("comp"))
      .withColumnRenamed("u", "id").localCheckpoint()
    // Convergence detection: per-vertex labels are monotonically
    // non-increasing (min over self+neighbors, then a jump to an equal or
    // smaller label), so for INTEGRAL ids the exact decimal label total
    // strictly decreases until the fixpoint — comparing one scalar per
    // round replaces a join-and-diff of old vs new labels (one fewer
    // shuffle per round). The shortcut is gated on integral types only:
    // fractional ids (Double/Float/scaled Decimal) would round under the
    // DecimalType(38,0) cast, so a sub-unit label change could leave the
    // sum unchanged and declare convergence early. Those — and string
    // fingerprints — take the exact join-and-diff path instead.
    val numericIds = labels.schema("comp").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("comp").cast(DecimalType(38, 0)))).head().getDecimal(0))
    def unchanged(next: DataFrame, prev: DataFrame): Boolean =
      next.join(prev.withColumnRenamed("comp", "comp_old"), "id")
        .filter(col("comp") =!= col("comp_old")).isEmpty
    var prevSum = if (numericIds) labelSum(labels) else None
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // each vertex takes the min label over itself and its neighbors
      val viaNbr = sym
        .join(labels.select(col("id").as("v"), col("comp")), "v")
        .select(col("u").as("id"), col("comp"))
      val minned = labels.union(viaNbr)
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer jumping: comp := comp(comp) — labels propagate through
      // labels, halving remaining path length every round. (r20 measured
      // note: a 3-fold jump composition per round was tried and REVERTED
      // — it does cut rounds on a synthetic 256-chain (5 vs ~9) but the
      // real near-dup graph converged in 6 rounds either way, so the two
      // extra joins per round bought nothing here.)
      val jumped = minned
        .join(minned.select(col("id").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("comp2"), col("comp")).as("comp"))
      val next = jumped.localCheckpoint()
      if (numericIds) {
        val s = labelSum(next)
        // a null sum (decimal overflow near the 38-digit cap) carries no
        // information — None == None must NOT read as converged; fall
        // back to the exact join-and-diff for such rounds
        done = (s, prevSum) match {
          case (Some(a), Some(b)) => a == b
          case _ => unchanged(next, labels)
        }
        prevSum = s
      } else {
        done = unchanged(next, labels)
      }
      labels = next
      iter += 1
    }
    if (sys.env.get("SPARK_GRAFT_CC_DEBUG").contains("1"))
      System.err.println(s"[cc] converged after $iter iterations, m=$m")
    labels
  }

  /** k-core subgraph by iterative peeling: repeatedly delete every
    * vertex with degree < k (and its edges) until no vertex falls below
    * k — the standard cohesion filter (a 2-core strips trees and
    * pendant chains; higher k isolates densely-knit groups). Returns
    * the surviving vertices with their within-core degree.
    *
    * Peeling is monotone (degrees only drop as vertices leave), so the
    * fixpoint is unique and rounds PAST the fixpoint are no-ops — which
    * is what lets a fixed-unroll oracle reproduce the converged answer.
    * Convergence is probed with one scalar edge-count per round (the
    * connectedComponents discipline: a count beats a join-and-diff by a
    * shuffle), each round's survivor edge list is localCheckpoint'd so
    * the lineage stays one round deep, and every exchange after the
    * first carries the (shrinking) edge list, never the source scan.
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    val cu = edges.columns(0)
    val cv = edges.columns(1)
    var e = edges.select(col(cu).as("u"), col(cv).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var m = e.count()
    // Size-adaptive coalesce tried and REVERTED (r20): unlike the CC
    // loop (whose per-round frames are per-NODE labels, tiny next to
    // the edges), every kCore peel round re-joins the FULL edge set —
    // the 128k-rows/task layout gave the 600k-edge co-purchase graph 5
    // partitions and serialized the peel joins (quiet 1.95 s -> 2.34 s
    // measured). The edge build's fan-out is the right layout here.
    var done = m == 0L
    var iter = 0
    while (!done && iter < maxIter) {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val keep = sym.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
      val e2 = e.join(keep.select(col("u")), Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .select("u", "v").localCheckpoint()
      val m2 = e2.count()
      done = m2 == m || m2 == 0L
      e = e2
      m = m2
      iter += 1
    }
    // An unconverged exit would silently return a SUPERSET of the core
    // (vertices still peelable) — fail loudly instead; extreme peel
    // depths (a 2k-vertex pendant chain) are a maxIter choice the
    // caller must make consciously, not a wrong answer.
    if (!done) throw new IllegalStateException(
      s"kCore(k=$k) did not converge within $maxIter peel rounds " +
        s"($m edges still shrinking); raise maxIter")
    e.union(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy("u").agg(count(lit(1)).as("core_degree"))
      .select(col("u").as("id"), col("core_degree"))
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own label; each round, a node adopts the most
    * frequent label among its in-neighbors, ties broken by the SMALLEST
    * label, isolated nodes (or nodes whose neighbors all lack labels
    * this round) keep their current label. Fully deterministic — unlike
    * the textbook randomized-order LPA — so the result is
    * oracle-checkable and stable across reruns and cluster layouts.
    *
    * Scale design: each round is edge-keyed — one join of the edge list
    * with the label frame (both shuffle on node ids), one
    * (node, label) count aggregate, and a per-node arg-max window whose
    * rank-1 filter plans as WindowGroupLimit (map-side top-1, so the
    * exchange carries one row per (node, distinct neighbor label), not
    * the neighbor multiset). Per-round localCheckpoint caps lineage
    * exactly like [[pageRank]]; nothing corpus-sized ever reaches the
    * driver.
    *
    * @param nodes single-column frame of ALL node ids (labels are kept
    *              for isolated nodes too).
    * @param edges first two columns = directed src,dst; pass both
    *              directions for an undirected graph.
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, iters: Int = 3): DataFrame = {
    val idCol = nodes.columns(0)
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst"))
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("label"))
    for (_ <- 1 to iters) {
      val counts = e.join(labels.select(col("id").as("src_id"), col("label")),
          col("src") === col("src_id"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("c").desc, col("label"))
      val best = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst").as("id"), col("label").as("new_label"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Synchronous BFS from one source: returns (id, lvl) for every node
    * reachable within `maxDepth` hops — the distance/reachability probe
    * next to [[connectedComponents]]' membership and
    * [[labelPropagation]]'s communities (e.g. "how many hops from a
    * seed document does its near-dup neighborhood extend").
    *
    * Scale design: per round, ONE edge-keyed join of the edge list with
    * the current frontier plus an anti join against the seen set (both
    * id-keyed exchanges over (id, lvl) longs — never payloads), with
    * the usual per-round localCheckpoint lineage cap. Frontier-bounded:
    * a round's work is proportional to the frontier's out-edges, the
    * textbook level-synchronous BFS the Pregel-likes run.
    */
  def bfsLevels(edges: DataFrame, source: Long, maxDepth: Int = 6): DataFrame = {
    // checkpoint at entry (the connectedComponents discipline): every
    // round joins the edge list, so an expensive caller subtree would
    // otherwise re-run maxDepth times
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst")).localCheckpoint()
    val spark = edges.sparkSession
    var levels = spark.range(1)
      .select(lit(source).as("id"), lit(0L).as("lvl"))
      .localCheckpoint()
    var k = 1
    var frontierEmpty = false
    while (k <= maxDepth && !frontierEmpty) {
      val frontier = levels.filter(col("lvl") === (k - 1).toLong)
      val next = e.join(frontier.select(col("id").as("src")), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(levels.select("id"), Seq("id"), "left_anti")
        .withColumn("lvl", lit(k.toLong))
      levels = levels.unionByName(next).localCheckpoint()
      // one scalar to the driver per round; stop when the wave dies out
      frontierEmpty = levels.filter(col("lvl") === k.toLong).isEmpty
      k += 1
    }
    levels
  }

  /** Duplicate-cluster assignment: near-dup pairs → (id, cluster_id)
    * where cluster_id is the minimum doc id of the connected component.
    * Only documents that appear in at least one pair are returned —
    * singletons are trivially their own cluster and joining them in
    * would shuffle the whole corpus for no information.
    */
  def dupClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b"): DataFrame =
    connectedComponents(pairs.select(idA, idB))
      .select(col("id"), col("comp").as("cluster_id"))

  /** Exact triangle count over an undirected edge list — the standard
    * graph-density / community-cohesion statistic (clustering
    * coefficient numerator).
    *
    * Scale design: the textbook degree-ordered orientation (Cohen,
    * "Graph Twiddling in a MapReduce World"; also the node-iterator++
    * bound) — every edge is directed from its lower-(degree, id)
    * endpoint to the higher, so each triangle is generated by exactly
    * ONE wedge at its lowest-ordered vertex and, crucially, wedge
    * fan-out per vertex is bounded by its OUT-degree, which the
    * orientation caps at O(sqrt(m)) even for power-law hubs: a
    * celebrity node with 10^7 neighbors contributes no wedges at all
    * unless its neighbors have higher degree still. Three shuffles do
    * all the work (degree agg, wedge self-join on src, closing-edge
    * semi-equi-join); nothing is ever collected to the driver.
    *
    * @param edges DataFrame whose first two columns are the endpoints
    *              of an undirected edge (self-loops and duplicate /
    *              reversed edges are normalized away).
    * @return one row: (n_nodes, n_edges, n_triangles).
    */
  /** Serialized size of a bloom filter over `n` items at `fpp`:
    * m = -n·ln(fpp)/ln(2)² bits (~1.20 bytes/item at fpp 0.01, i.e.
    * ~1.2 GB per 1e9 edges), plus a small header. Used to decide
    * whether the wedge prefilter's filter fits the broadcast budget.
    */
  private[graft] def bloomBytes(n: Long, fpp: Double): Long =
    (-n * math.log(fpp) / (math.log(2) * math.log(2)) / 8.0).toLong + 64L

  /** Shared triangle-enumeration plumbing: canonical undirected edges,
    * degrees, degree-ordered orientation, and the bloom-pruned triangle
    * row set (one row per triangle, all three vertices). See
    * [[triangleCount]] for the orientation/skew rationale.
    *
    * `maxBloomBytes`: the wedge prefilter is an OPTIMIZATION — the
    * exact closing join is unconditionally correct — so when the edge
    * count would need a bloom beyond this budget (it must broadcast to
    * every task), the prefilter is skipped and the full wedge set goes
    * to the exact join. Correctness parity of the two paths is a spec
    * invariant (`GraphOpsSpec` forces the fallback with a 0 budget).
    */
  private def triangleRows(edges: DataFrame,
      maxBloomBytes: Long = 512L << 20): (DataFrame, DataFrame, DataFrame) = {
    val u = col(edges.columns(0))
    val v = col(edges.columns(1))
    // Canonical undirected form: (min, max), no self-loops, distinct.
    // Checkpoint: the edge list is typically an expensive subtree (a
    // co-occurrence self-join) and is branched 4x below (degree x2,
    // wedges, closing probe) — without truncation each branch re-runs it.
    val und = edges.select(least(u, v).as("a"), greatest(u, v).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val nEdgesCnt = und.count() // cheap: und is checkpointed
    // r20: below this MEASURED edge count the |V|-bounded degree table
    // (|V| <= 2|E|) fits the broadcast budget — broadcasting it turns
    // the two orientation joins into map-side hash joins, so the edge
    // list crosses NO exchange to orient (a checkpointed frame carries
    // no size statistics, so Catalyst would otherwise plan both as
    // shuffle joins). Past the gate — the 100 TB co-occurrence graph —
    // the original shuffle-join orientation runs unchanged. GraphOpsSpec
    // pins count parity of the two paths.
    val broadcastEdges = nEdgesCnt <= 8L * 1000 * 1000
    // checkpointed once on the broadcast path: the degree frame feeds
    // both orientation joins here plus the callers' per-node outputs
    val deg0 = {
      val d = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      if (broadcastEdges) d.localCheckpoint() else d
    }
    val deg = if (broadcastEdges) broadcast(deg0) else deg0
    // Orient each edge low -> high in the strict total order (degree, id).
    val withDeg = und
      .join(deg.withColumnsRenamed(Map("n" -> "a", "d" -> "da")), "a")
      .join(deg.withColumnsRenamed(Map("n" -> "b", "d" -> "db")), "b")
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("src"),
      when(lowFirst, col("b")).otherwise(col("a")).as("dst"),
      when(lowFirst, col("db")).otherwise(col("da")).as("ddeg"))
      .localCheckpoint()
    // Wedges at src, neighbor pair ordered by the SAME (degree, id)
    // order the edges were oriented by, so the closing edge — if it
    // exists — is stored exactly as (x -> y).
    val e1 = oriented.select(col("src"), col("dst").as("x"), col("ddeg").as("dx"))
    val e2 = oriented.select(col("src"), col("dst").as("y"), col("ddeg").as("dy"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("src"), col("x"), col("y"))
    // Bloom-prune non-closing wedges map-side (see triangleCount doc),
    // unless the filter itself would outgrow the broadcast budget — the
    // exact join below is correct either way, the bloom only cuts the
    // wedge shuffle. (r20 measured note: an exact broadcast-hash closing
    // probe was tried under the same gate and REVERTED — building and
    // shipping the |E|-row hash relation cost more per run than the
    // 1.2 B/edge bloom it replaced; the bloom stays the closing-side
    // shape at every scale.)
    val closing = oriented.select(
      xxhash64(col("src"), col("dst")).as("ek"), col("src").as("x"), col("dst").as("y"))
    val expected = math.max(nEdgesCnt, 1000L)
    val prunedWedges =
      if (bloomBytes(expected, 0.01) <= maxBloomBytes)
        BloomJoin.bloomPrefilter(
          wedges.withColumn("ek", xxhash64(col("x"), col("y"))),
          closing, "ek", "ek",
          expectedItems = expected, fpp = 0.01)
      else wedges
    val tri = prunedWedges.join(closing.drop("ek"), Seq("x", "y"))
      .select(col("src"), col("x"), col("y"))
    (und, deg0, tri)
  }

  def triangleCount(edges: DataFrame,
      maxBloomBytes: Long = 512L << 20): DataFrame = {
    val (und, deg, triRows) = triangleRows(edges, maxBloomBytes)
    // Wedges outnumber edges ~sqrt(m):1 and only a few percent close
    // into triangles, so the closing equi-join's shuffle of the full
    // wedge set IS the cost of this operator (measured 41M wedges vs
    // 1.2M edges on the sf0.1 co-purchase graph). A broadcast bloom
    // over the hashed edge keys drops non-closing wedges MAP-SIDE,
    // inside the wedge-join stage, before the exchange — the exact
    // join then verifies survivors (bloom false positives and xxhash64
    // key collisions just pass a few extra rows into the exact check).
    // At extreme edge counts the bloom is ~1.2 GB/1e9 edges (the
    // bloomBytes formula, asserted in GraphOpsSpec): still
    // broadcastable where a 30x wedge shuffle is not — and past
    // maxBloomBytes the prefilter drops out entirely, with count
    // parity proven by the forced-fallback spec case.
    val tri = triRows.agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
  }

  /** Local clustering coefficient per vertex: cc(v) = 2·t(v) / (d(v)·
    * (d(v)−1)) where t(v) is the number of triangles through v — the
    * per-node cohesion score (spam rings and boilerplate clusters are
    * high-cc; bridges are low). Reuses [[triangleRows]]'s oriented,
    * bloom-pruned enumeration; each triangle is then charged to all
    * three vertices by one generator + count (no second pair join).
    *
    * @return (n, d, t, cc) for every vertex, d ≥ 1; t = 0 and cc = 0
    *         for vertices on no triangle.
    */
  def clusteringCoefficients(edges: DataFrame,
      maxBloomBytes: Long = 512L << 20): DataFrame = {
    val (_, deg, triRows) = triangleRows(edges, maxBloomBytes)
    val perNode = triRows
      .select(explode(array(col("src"), col("x"), col("y"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("t"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n"), col("d"), coalesce(col("t"), lit(0L)).as("t"),
        when(col("d") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("t"), lit(0L)) /
            (col("d") * (col("d") - lit(1)))).as("cc"))
  }

  /** PageRank by power iteration — document authority over a similarity
    * (or link) graph, the classic quality prior for corpus curation.
    *
    * Same scale discipline as [[connectedComponents]]: a fixed small
    * number of rounds, each round two narrow shuffles (contribution
    * join keyed on src, sum keyed on dst) over (id, pr) rows;
    * `localCheckpoint` per round truncates lineage so round t+1 reads
    * round t's materialized rows instead of re-optimizing (and
    * re-executing) an exponentially growing tree. Edge weights (1/deg)
    * are materialized ONCE up front — the expensive edge-producing
    * subtree (an LSH/Jaccard pipeline) never re-runs. One scalar
    * (|V|) crosses the driver.
    *
    * Dangling mass: vertices with no out-edges leak their rank (the
    * standard simplification); ranks still order vertices correctly for
    * curation use. Fully deterministic: per-edge contributions are
    * quantized to a 1e-12 grid and summed exactly in BIGINT (per-vertex
    * sums are bounded by the quantized total mass, 1e12, so no
    * overflow at any graph size), then one identical double op chain
    * per vertex per round — bit-identical across runs, partitionings,
    * and engines (the q_embed_centroid accumulation discipline).
    * Quantization error is <= 5e-13 per in-edge per round, invisible at
    * any sane output rounding.
    *
    * @param vertices one-column frame of vertex ids (isolated vertices
    *                 keep the teleport rank).
    * @param edges    directed (src, dst) pairs in the FIRST TWO columns;
    *                 pass both directions for an undirected graph.
    */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val idCol = vertices.columns(0)
    val e = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).cast(DoubleType).as("deg"))
    val wEdges = e.join(deg, "src").localCheckpoint()
    val verts = vertices.select(col(idCol).as("id")).localCheckpoint()
    val n = verts.count().toDouble
    var pr = verts.withColumn("pr", lit(1.0) / lit(n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val sums = wEdges.join(pr, wEdges("src") === pr("id"))
        .select(col("dst").as("id"),
          floor(col("pr") / col("deg") * lit(1e12) + lit(0.5))
            .cast(org.apache.spark.sql.types.LongType).as("ci"))
        .groupBy("id").agg(sum(col("ci")).as("s"))
      pr = verts.join(sums, Seq("id"), "left")
        .select(col("id"),
          ((lit(1.0) - lit(damping)) / lit(n) +
            lit(damping) * (coalesce(col("s"), lit(0L)).cast(DoubleType) / lit(1e12)))
            .as("pr"))
        .localCheckpoint()
    }
    pr
  }
}
