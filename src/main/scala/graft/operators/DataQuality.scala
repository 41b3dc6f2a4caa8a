package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality profiling + declarative constraint validation — the
  * admission gate of a 100 TB ingest (the Deequ/great-expectations
  * analog, re-expressed as plain Catalyst aggregates).
  *
  * Shape contract, both entry points: metrics are computed in ONE
  * aggregate pass over the table (a single scan feeding map-side partial
  * aggregation; no per-column jobs, no driver loops). The per-column /
  * per-check report rows are then exploded from that single aggregate
  * row — report size is O(columns + checks), never O(rows), so the
  * result is driver-safe at any corpus size.
  *
  * The one deliberate exception is [[Check.ForeignKey]]: referential
  * containment needs the dimension table, so it runs as one extra
  * broadcast LEFT ANTI aggregate (dimension tables are the small side
  * by construction) unioned into the same report.
  *
  * 100 TB note: the DEFAULT `n_distinct` is `approx_count_distinct`
  * (one streaming HLL per column, no Expand) — that is the wide-table
  * production shape. `exact = true` swaps in exact `count_distinct` for
  * oracle replay; multiple exact distincts in one aggregate plan through
  * an Expand (rows × #distinct-columns before the partial agg), which is
  * a scale-killer on wide tables — use it only when the report must be
  * exactly reproducible.
  */
object DataQuality {

  /** One-pass per-column profile. Numeric columns fill
    * `min_num/max_num/avg_num` (6 dp); string/timestamp columns fill
    * `min_str/max_str` (native-type ordering, then cast) — doubles are
    * never round-tripped through strings, whose formatting is
    * engine-specific.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    val fields = cols.map(c => df.schema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no such column: $c")))
    def isNum(t: DataType): Boolean = t.isInstanceOf[NumericType]
    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      val nd = if (exact) count_distinct(c) else approx_count_distinct(c)
      Seq(
        count(c).as(s"${f.name}__nn"),
        nd.as(s"${f.name}__nd")) ++
      (if (isNum(f.dataType))
        Seq(round(min(c).cast("double"), 6).as(s"${f.name}__min"),
            round(max(c).cast("double"), 6).as(s"${f.name}__max"),
            round(avg(c.cast("double")), 6).as(s"${f.name}__avg"))
      else
        Seq(min(c).cast("string").as(s"${f.name}__mins"),
            max(c).cast("string").as(s"${f.name}__maxs")))
    }
    // Unsplittable-input spread (r17, guide §2.5): a single-file /
    // single-row-group scan caps the aggregate's parallelism at one
    // task no matter the split config, and the exact path's Expand
    // (rows × #distinct-columns) then runs serially. When the scan
    // plans fewer partitions than the session's cores, one projected
    // repartition (just the profiled columns, input-sized) spreads the
    // aggregate; at corpus scale the scan already carries ≥ cores
    // splits and this is a no-op. Aggregate results are partition-
    // independent for the exact statistics (counts, min, max, exact
    // distinct); avg over doubles is NOT associative, so its 6-dp
    // rounding is best-effort under re-partitioning — deterministic
    // for a fixed input and core count, but a different partitioning
    // could in principle flip the last digit at a rounding boundary
    // (r17 advice; documented rather than decimal-reworked so the
    // established oracle arithmetic stays byte-identical).
    // The width probe is Dedup.planWidth (r18) — no second physical
    // planning pass on the build path.
    val base = df.select(cols.map(col): _*)
    val target = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (Dedup.planWidth(base).exists(_ < target)) base.repartition(target)
      else base
    val row = spread.agg(count(lit(1)).as("__n"), aggs: _*)
    val reports = fields.map { f =>
      val (minN, maxN, avgN, minS, maxS) =
        if (isNum(f.dataType))
          (col(s"${f.name}__min"), col(s"${f.name}__max"), col(s"${f.name}__avg"),
           lit(null).cast("string"), lit(null).cast("string"))
        else
          (lit(null).cast("double"), lit(null).cast("double"), lit(null).cast("double"),
           col(s"${f.name}__mins"), col(s"${f.name}__maxs"))
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${f.name}__nn")).as("n_nulls"),
        col(s"${f.name}__nd").as("n_distinct"),
        minN.as("min_num"), maxN.as("max_num"), avgN.as("avg_num"),
        minS.as("min_str"), maxS.as("max_str"))
    }
    row.select(explode(array(reports: _*)).as("p")).select("p.*")
  }

  /** A declarative table constraint. `metric` semantics per check:
    * completeness = non-null ratio (passes when ≥ `minRatio`); all
    * others = violation count (pass when 0).
    */
  sealed trait Check { def checkName: String; def colName: String }
  object Check {
    /** Non-null ratio ≥ minRatio. */
    final case class Completeness(colName: String, minRatio: Double = 1.0)
        extends Check { val checkName = "completeness" }
    /** Zero duplicate values (nulls excluded): count − count_distinct. */
    final case class Uniqueness(colName: String)
        extends Check { val checkName = "uniqueness" }
    /** Non-null values inside [lo, hi]. */
    final case class InRange(colName: String, lo: Double, hi: Double)
        extends Check { val checkName = "range" }
    /** Non-null values drawn from an allowed set. */
    final case class InSet(colName: String, values: Seq[String])
        extends Check { val checkName = "in_set" }
    /** Non-null values matching a regex (contains-match, RE2-safe subset). */
    final case class Matches(colName: String, regex: String)
        extends Check { val checkName = "pattern" }
    /** Every non-null value exists in `dim(dimCol)` (referential
      * integrity); dim is broadcast — dimension tables are small by
      * construction.
      */
    final case class ForeignKey(colName: String, dim: DataFrame, dimCol: String)
        extends Check { val checkName = "foreign_key" }
  }
  import Check._

  /** Evaluates all checks, returning one report row per check:
    * (check_name, col_name, metric, passed). Single-table checks share
    * ONE aggregate pass; each ForeignKey adds one broadcast anti-join
    * aggregate, unioned in.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val (fks, scalars) = checks.partition(_.isInstanceOf[ForeignKey])
    def violations(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))
    val aggs: Seq[(Check, Column)] = scalars.zipWithIndex.map { case (chk, i) =>
      val c = col(chk.colName)
      val m = chk match {
        case Completeness(_, _) => round(count(c).cast("double") / count(lit(1)), 6)
        case Uniqueness(_)      => (count(c) - count_distinct(c)).cast("double")
        case InRange(_, lo, hi) => violations(c.isNotNull && (c < lo || c > hi)).cast("double")
        case InSet(n, vs)       => violations(c.isNotNull && !c.isin(vs: _*)).cast("double")
        case Matches(_, re)     => violations(c.isNotNull && !c.rlike(re)).cast("double")
        case _: ForeignKey      => throw new IllegalStateException("partitioned above")
      }
      chk -> m.as(s"m$i")
    }
    def passed(chk: Check, metric: Column): Column = chk match {
      case Completeness(_, minRatio) => metric >= minRatio
      case _                         => metric === 0.0
    }
    val scalarReport = aggs.headOption.map { case (_, first) =>
      val row = df.agg(first, aggs.tail.map(_._2): _*)
      val reports = aggs.zipWithIndex.map { case ((chk, _), i) =>
        struct(lit(chk.checkName).as("check_name"), lit(chk.colName).as("col_name"),
          col(s"m$i").as("metric"), passed(chk, col(s"m$i")).as("passed"))
      }
      row.select(explode(array(reports: _*)).as("r")).select("r.*")
    }
    val fkReports = fks.map { case fk @ ForeignKey(c, dim, dimCol) =>
      df.filter(col(c).isNotNull)
        .join(broadcast(dim.select(col(dimCol))), col(c) === col(dimCol), "left_anti")
        .agg(count(lit(1)).cast("double").as("metric"))
        .select(lit(fk.checkName).as("check_name"), lit(c).as("col_name"),
          col("metric"), (col("metric") === 0.0).as("passed"))
    }
    val all = scalarReport.toSeq ++ fkReports
    require(all.nonEmpty, "validate needs at least one check")
    all.reduce(_.unionByName(_))
  }
}
