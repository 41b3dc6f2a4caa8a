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

  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, salt: Int = 8): DataFrame = {
    // any per-row value spreads a hot key; the row id costs nothing and —
    // unlike hashing the whole row (struct(*)) — leaves column pruning
    // intact, so the fact scan still reads only the columns the query
    // needs. The join RESULT is salt-assignment-independent.
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
