package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association rules (market-basket support / confidence /
  * lift — the Agrawal/Srikant Apriori setting restricted to 2-item
  * rules, which is the part that matters at warehouse scale: longer
  * itemsets are mined from the surviving pairs, not from raw data).
  *
  * Scale posture (100 TB of baskets): pair generation is a per-basket
  * self-join — Σ |basket|² candidates — so basket SIZE, not basket
  * count, is the cost driver. Real transaction baskets are tens of
  * items; a degenerate basket (a crawler session with 10⁵ "items")
  * would dominate the run quadratically, so baskets over
  * `maxBasketSize` are EXCLUDED up front rather than burning the
  * stage (same cap discipline as Linkage blocks / Dedup buckets;
  * run [[graft.operators.Profile.skewReport]] on the basket key to
  * see what a given cap would cut).
  * The min-support filter runs ON THE PAIR COUNTS before item stats
  * attach — the heavy table shrinks before any join. Counts are
  * integers; confidence and lift are 6dp-rounded ratios of exact
  * counts, reproducible on any engine.
  */
object Association {

  /** Directed 2-item rules from a (basket, item) relation.
    *
    * Returns (ante, cons, supp_pair, supp_ante, supp_cons, conf,
    * lift) for every ordered pair whose co-occurrence count reaches
    * `minSupport`: conf = supp_pair/supp_ante,
    * lift = supp_pair·N / (supp_ante·supp_cons) with N = distinct
    * baskets (lift > 1 ⇒ positive association). Duplicate (basket,
    * item) rows collapse first; each unordered pair is counted once
    * and emitted in both directions.
    */
  def pairRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2L,
      maxBasketSize: Option[Int] = Some(10000)): DataFrame = {
    // In-row pair expansion over each basket's sorted distinct item
    // array (the co-purchase edge derivation's shape): ONE shuffle —
    // the groupBy(basket), whose collect_set also subsumes the old
    // (basket, item) DISTINCT — replaces the former distinct + basket
    // self-join exchanges, and per-basket arrays are bounded by the
    // size cap, not the data. Item support and the basket count read
    // the same persisted basket table, so the heavy input collapses
    // exactly once. Memory note: the pair generator materializes
    // O(|basket|²) structs per row while exploding — bounded by the
    // cap, which is the documented quadratic-cost valve either way.
    val baskets = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("ps"))
    val sized = (maxBasketSize match {
      case None => baskets
      case Some(cap) => baskets.filter(size(col("ps")) <= cap)
    }).persist()
    val itemCnt = sized.select(explode(col("ps")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("supp"))
    val nBaskets = sized.agg(count(lit(1)).as("__n"))
    val pairArr = flatten(transform(col("ps"), (x, i) =>
      transform(
        slice(col("ps"), i + lit(2),
          greatest(lit(0), size(col("ps")) - i - lit(1))),
        y => struct(x.as("i"), y.as("j")))))
    val pairCnt = sized.select(explode(pairArr).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("supp_pair"))
      .filter(col("supp_pair") >= minSupport)
    val directed = pairCnt
      .select(col("i").as("ante"), col("j").as("cons"), col("supp_pair"))
      .unionByName(pairCnt.select(col("j").as("ante"),
        col("i").as("cons"), col("supp_pair")))
    val out = directed
      .join(itemCnt.select(col("i").as("ante"),
        col("supp").as("supp_ante")), Seq("ante"))
      .join(itemCnt.select(col("i").as("cons"),
        col("supp").as("supp_cons")), Seq("cons"))
      .crossJoin(broadcast(nBaskets))
      .select(col("ante"), col("cons"), col("supp_pair"),
        col("supp_ante"), col("supp_cons"),
        round(try_divide(col("supp_pair"), col("supp_ante")), 6)
          .as("conf"),
        round(col("supp_pair").cast("double") * col("__n") /
          (col("supp_ante").cast("double") * col("supp_cons")), 6)
          .as("lift"))
      // materialize the rule table (item-pair cardinality — far
      // smaller than the basket relation), then release the basket
      // cache: the jaccardPairs output/cache discipline
      .localCheckpoint()
    sized.unpersist()
    out
  }
}
