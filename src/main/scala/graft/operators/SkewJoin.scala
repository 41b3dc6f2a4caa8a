package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys. A sort-merge/hash join shuffles both
  * sides by the join key — one mega-key (the classic null-ish user, the
  * boilerplate document source) lands an entire cluster's worth of rows
  * on one task. AQE's skew-join splitting handles the sort-merge case at
  * runtime; salting is the plan-level tool for when it can't (hash
  * aggregation on the key downstream, or a dim side small enough to
  * replicate but too big to broadcast).
  *
  * Mechanics: every fact row gets a uniform salt in [0, salt); the dim
  * side is replicated `salt` times; the join key becomes (key, salt) so
  * the mega-key spreads over `salt` tasks. The result multiset is
  * IDENTICAL to the unsalted join — salting only changes partitioning —
  * which is what the oracle gate checks. Cost: dim side shuffles `salt`×
  * its size; pick salt ≈ (mega-key rows / target partition rows).
  */
object SkewJoin {

  /** `saltBasis`: columns the salt hash is computed from. It must be
    * DETERMINISTIC per row — a nondeterministic salt (row id, rand) can
    * re-assign rows to different reducers when a fetch failure recomputes
    * only some map tasks, duplicating/losing join rows (the SPARK-23207
    * hazard). It should also (a) vary within the hot key, and (b) contain
    * only columns the query reads anyway, so the salt doesn't widen the
    * scan and break column pruning. Empty (default) = all columns: always
    * safe, but reads the full row.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, salt: Int = 8,
                 saltBasis: Seq[String] = Nil): DataFrame = {
    val basis = if (saltBasis.nonEmpty) saltBasis else fact.columns.toSeq
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(basis.map(fact(_)): _*)), lit(salt.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
