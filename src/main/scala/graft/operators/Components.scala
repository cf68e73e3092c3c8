package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components at scale: alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14). The 100 TB path behind the near-dup clustering API — min-label
  * propagation (the gate default in `queries.Pipeline`) converges in
  * O(diameter) rounds, which is fine for quasi-clique near-dup components;
  * star alternation converges in O(log² n) rounds on ANY graph shape, so
  * it is the right tool when edges chain (e.g. transitive similarity at
  * loose thresholds).
  *
  * Both operations are plain groupBy/join rounds — equi-shuffles only, no
  * driver-side graph state; each round is ONE job (`localCheckpoint`
  * truncates the plan, and convergence is detected from an `observe`d
  * (count, hash-sum) signature collected by that same job, like the
  * propagation path in `queries.Pipeline`).
  */
object Components {

  /** Large-star: for every node u, connect all strictly-larger neighbors
    * of u to the minimum of the closed neighborhood Γ⁺(u).
    */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    val m = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("m"))
    sym.join(m, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Small-star: for every node u, connect u and all smaller neighbors of
    * u to the minimum of {u} ∪ smaller neighbors.
    */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    val canon = edges.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val m = canon.groupBy(col("src")).agg(min(col("dst")).as("m"))
    val withM = canon.join(m, "src")
    withM.select(col("dst").as("src"), col("m").as("dst"))
      .unionAll(withM.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Component id (= minimum reachable vertex id) for every vertex that
    * appears in `edges` (long `src`/`dst` columns). Isolated vertices
    * don't appear — union the vertex table downstream if needed.
    *
    * @return (vertex, component) DataFrame
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    var e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var prevSig: Option[(Long, Long)] = None
    var converged = e.isEmpty
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val obs = Observation()
      val next = smallStar(largeStar(e))
        .observe(obs,
          count(lit(1)).as("n"),
          // xor (not sum): overflow-free under ANSI mode, and the edge
          // set is distinct, so the xor is a faithful set signature
          coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("h"))
        .localCheckpoint()
      val row = scala.concurrent.Await
        .result(obs.future, scala.concurrent.duration.Duration(30, "s"))
      val sig = (row.getAs[Long]("n"), row.getAs[Long]("h"))
      // the edge multiset is deterministic, so an unchanged (count,
      // hash-sum) signature means an unchanged edge set (modulo a 2^-64
      // collision) — the star alternation has reached its fixpoint
      converged = prevSig.contains(sig)
      prevSig = Some(sig)
      e = next
      rounds += 1
    }
    // fixpoint edges all point at roots: (larger vertex, its component);
    // roots get their own id
    val verts = e.select(col("src").as("vertex"), col("dst").as("component"))
      .unionAll(e.select(col("dst").as("vertex"), col("dst").as("component")))
    verts.groupBy(col("vertex")).agg(min(col("component")).as("component"))
  }
}
