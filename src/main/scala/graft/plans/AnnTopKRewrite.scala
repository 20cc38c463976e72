package graft.plans

import graft.functions.{CosineSim, LshBucket, VectorKernels}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Opt-in ANN rewrite (the documented 100 TB path for vector top-k,
  * SURVEY.md §4.3): an exact
  *
  *   ORDER BY cosine_sim(emb, <literal probe>) DESC LIMIT k
  *
  * over a store that carries an LSH bucket column becomes the same top-k
  * over only the buckets within Hamming radius r of the probe's bucket —
  * the probe's bucket id is computed AT PLAN TIME from the literal, so the
  * inserted predicate is scan-prunable (partition/cluster key at scale).
  *
  * The rewrite trades exactness for a bounded candidate scan, so it is off
  * unless `spark.graft.ann.rewrite.enabled=true`. Bucket column name,
  * hyperplane count/seed, and radius are conf-controlled and must match
  * how the store column was produced ([[LshBucket]]).
  */
object AnnTopKRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.ann.rewrite.enabled"
  val BucketColKey = "spark.graft.ann.bucketCol"
  val NBitsKey = "spark.graft.ann.nbits"
  val SeedKey = "spark.graft.ann.seed"
  val RadiusKey = "spark.graft.ann.radius"

  private def confStr(k: String, dflt: String): String =
    SQLConf.get.getConfString(k, dflt)

  private def alreadyRewritten(plan: LogicalPlan): Boolean =
    plan match {
      case Filter(cond, _) =>
        cond.find(_.isInstanceOf[BitwiseCount]).isDefined
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (confStr(EnabledKey, "false") != "true") return plan
    val bucketCol = confStr(BucketColKey, "lsh_b")
    val nbits = confStr(NBitsKey, "12").toInt
    val seed = confStr(SeedKey, "42").toLong
    val radius = confStr(RadiusKey, "5").toInt

    // Build the Hamming-radius candidate filter over `child`. Uses the
    // store's bucket column when present; otherwise buckets on the fly
    // from the cosine's vector side (still prunes the sort input; a
    // persisted bucket column additionally prunes the scan at scale).
    def mkFilter(cs: CosineSim, child: LogicalPlan): Option[LogicalPlan] =
      cs.right match {
        case Literal(arr: ArrayData, ArrayType(FloatType, _))
            if !alreadyRewritten(child) =>
          val pb = VectorKernels.lshBucket(arr, nbits, seed)
          val bucketExpr: Expression = child.output
            .find(_.name == bucketCol)
            .getOrElse(LshBucket(cs.left, nbits, seed))
          Some(Filter(
            LessThanOrEqual(
              BitwiseCount(BitwiseXor(bucketExpr, Literal(pb))),
              Literal(radius)),
            child))
        case _ => None
      }

    plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_,
          srt @ Sort(SortOrder(sortExpr, Descending, _, _) +: _, true,
            schild, _))) =>
        val rewritten = sortExpr match {
          // ORDER BY cosine_sim(...) directly
          case cs: CosineSim =>
            mkFilter(cs, schild).map(f =>
              gl.copy(child = ll.copy(child = srt.copy(child = f))))
          // ORDER BY an alias of cosine_sim computed in the Project below
          case a: Attribute => schild match {
            case p @ Project(fields, pchild) =>
              fields.collectFirst {
                case al @ Alias(cs: CosineSim, _) if al.exprId == a.exprId => cs
              }.flatMap(cs => mkFilter(cs, pchild)).map(f =>
                gl.copy(child = ll.copy(child =
                  srt.copy(child = p.copy(child = f)))))
            case _ => None
          }
          case _ => None
        }
        rewritten.getOrElse(gl)
    }
  }
}
