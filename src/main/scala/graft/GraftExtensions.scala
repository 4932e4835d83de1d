package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.{DotProductExpr, MinHashSignatureExpr, SimHash64Expr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b)")`
  * works next to the Column API.
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * The Column API ([[graft.functions.VectorOps]]) does NOT require this
  * registration — it builds the expressions directly — so library code
  * works in unconfigured sessions (e.g. an external harness's session);
  * the extension only adds the SQL-name surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes exactly two array arguments")
        DotProductExpr(args.head, args(1))
      }))
    // minhash_signature(hashes, nPerms): signature over pre-hashed
    // shingles with the engine's fixed-seed permutation coefficients —
    // SQL users produce sketches interchangeable with the Column API's.
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "minhash_signature(hashes, nPerms) takes an array and a literal perm count")
        val nPerms = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"nPerms must be an integer literal, got $other")
        }
        val coefs = graft.operators.NearDup.permCoefs(nPerms)
        MinHashSignatureExpr(args.head, coefs.map(_._1).toSeq, coefs.map(_._2).toSeq)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokenHashes) takes one array argument")
        SimHash64Expr(args.head)
      }))
  }
}
