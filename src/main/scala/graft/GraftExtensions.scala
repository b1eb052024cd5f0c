package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSimilarity, DotProduct, SortedIntersectCount}

/** `SparkSessionExtensions` registration (custom-operator ladder rung (c)
  * surface): exposes the native vector expressions to SQL as
  * `graft_dot(a, b)` / `graft_cosine(a, b)`. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — the Scala API
  * (`Similarity.dot`/`cosine`) builds the expressions directly and needs
  * no registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String, build: (Expression, Expression) => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[CosineSimilarity].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects exactly 2 arguments")
        build(children(0), children(1))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("graft_dot", DotProduct.apply))
    ext.injectFunction(binary("graft_cosine", CosineSimilarity.apply))
    ext.injectFunction(binary("graft_sorted_inter", SortedIntersectCount.apply))
  }
}
