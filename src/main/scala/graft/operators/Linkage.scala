package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic RECORD LINKAGE (Fellegi & Sunter
  * 1969, JASA — the standard model behind every dedup/linkage system
  * from census matching to Splink): candidate pairs from BLOCKING,
  * scored by summing per-field log-likelihood-ratio weights —
  * agreement on field f contributes log2(m_f / u_f), disagreement
  * log2((1−m_f) / (1−u_f)), where m = P(agree | same entity) and
  * u = P(agree | different entities). High score ⇒ link, low ⇒
  * non-link, between ⇒ clerical review; the caller picks thresholds
  * on the emitted score.
  *
  * This is the ENTITY-level sibling of the document near-dup family
  * ([[Dedup]]): fields instead of shingles, explicit error model
  * instead of similarity thresholds. DRIVER-EXT (reference
  * `/root/reference/` is empty; no file:line citation possible —
  * SURVEY.md §0 protocol).
  *
  * Scale shape: the candidate set is the BLOCKED equi-join — never a
  * cartesian; pick block keys so the largest block is bounded
  * (blocking-key skew is the operator's one hot spot, same cure as
  * every bucketed join: composite/salted keys, or pre-screen with
  * [[Blocking.sortedNeighborhood]]). Field comparison and scoring
  * are row-local codegen expressions on the joined rows; weights are
  * driver-side constants. Nothing collects.
  *
  * Missing-data contract: if EITHER side of a field is null the
  * field contributes weight 0 (the Fellegi–Sunter treatment of
  * missingness — no evidence either way), NOT the disagreement
  * weight; two nulls are likewise no evidence. Spec-pinned. */
object Linkage {

  /** Field comparison spec: `m` = P(values agree | records refer to
    * the same entity), `u` = P(agree | different entities). Both in
    * (0, 1) and m > u (otherwise agreement on the field is not
    * evidence FOR a link and the model is misparameterized).
    * `jwThreshold`: when set, "agree" means Jaro–Winkler similarity
    * ≥ the threshold (the native
    * [[graft.expressions.TextExpressions.JaroWinkler]] codegen
    * comparator, DuckDB-exact) instead of exact equality — the
    * standard treatment for name fields, where 'JONES'/'JONSE' is
    * agreement-grade evidence that equality throws away. Only
    * meaningful on string fields; m/u should be re-estimated for the
    * fuzzy definition of agreement (a looser comparator raises BOTH,
    * u especially). */
  case class FieldSpec(col: String, m: Double, u: Double,
                       jwThreshold: Option[Double] = None) {
    require(m > 0 && m < 1 && u > 0 && u < 1,
      s"$col: m and u must be in (0,1), got m=$m u=$u")
    require(m > u, s"$col: m ($m) must exceed u ($u)")
    jwThreshold.foreach(t => require(t > 0 && t <= 1,
      s"$col: jwThreshold must be in (0,1], got $t"))
    def agreeWeight: Double = math.log(m / u) / math.log(2.0)
    def disagreeWeight: Double =
      math.log((1 - m) / (1 - u)) / math.log(2.0)
  }

  /** Score all blocked candidate pairs of `a` × `b`. Both frames
    * must carry `blockCols` and every field column; ids are taken
    * from `aId` / `bId`. Returns (id_a, id_b, n_agree, score) —
    * one row per candidate pair, score = Σ field weights. */
  def linkPairs(a: DataFrame, aId: String, b: DataFrame, bId: String,
                blockCols: Seq[String], fields: Seq[FieldSpec])
  : DataFrame = {
    require(blockCols.nonEmpty,
      "linkPairs requires blocking columns — an unblocked cross join " +
        "is a cartesian at corpus scale; block, or pre-screen with " +
        "Blocking.sortedNeighborhood")
    require(fields.nonEmpty, "linkPairs needs at least one field")
    val af = a.select((aId +: blockCols ++: fields.map(_.col))
      .distinct.map(c => a(c).as(s"__a_$c")): _*)
    val bf = b.select((bId +: blockCols ++: fields.map(_.col))
      .distinct.map(c => b(c).as(s"__b_$c")): _*)
    val joined = af.join(bf,
      blockCols.map(c => col(s"__a_$c") === col(s"__b_$c")).reduce(_ && _))
    def agreeCond(f: FieldSpec): Column = f.jwThreshold match {
      case Some(t) => graft.expressions.TextExpressions.jaroWinkler(
        col(s"__a_${f.col}").cast("string"),
        col(s"__b_${f.col}").cast("string")) >= t
      case None => col(s"__a_${f.col}") === col(s"__b_${f.col}")
    }
    def fieldWeight(f: FieldSpec): Column =
      when(col(s"__a_${f.col}").isNull || col(s"__b_${f.col}").isNull,
        lit(0.0))
        .when(agreeCond(f), lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight))
    def fieldAgree(f: FieldSpec): Column =
      when(col(s"__a_${f.col}").isNotNull &&
        col(s"__b_${f.col}").isNotNull && agreeCond(f), 1).otherwise(0)
    joined.select(
      col(s"__a_$aId").as("id_a"), col(s"__b_$bId").as("id_b"),
      fields.map(fieldAgree).reduce(_ + _).as("n_agree"),
      fields.map(fieldWeight).reduce(_ + _).as("score"))
  }

  /** [[linkPairs]] + three-way Fellegi–Sunter decision: `link` at or
    * above `upper`, `non_link` below `lower`, `review` between. */
  def classify(a: DataFrame, aId: String, b: DataFrame, bId: String,
               blockCols: Seq[String], fields: Seq[FieldSpec],
               lower: Double, upper: Double): DataFrame = {
    require(lower <= upper, s"lower $lower must be <= upper $upper")
    linkPairs(a, aId, b, bId, blockCols, fields)
      .withColumn("decision",
        when(col("score") >= upper, lit("link"))
          .when(col("score") < lower, lit("non_link"))
          .otherwise(lit("review")))
  }
}
