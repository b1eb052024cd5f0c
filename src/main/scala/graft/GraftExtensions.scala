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
    // Spark's own bloom-filter sketch machinery (what AQE runtime filters
    // use internally) is public but not SQL-registered — expose it so a
    // pipeline can build a key bloom on a small side and prune a big-side
    // scan BEFORE the shuffle join (semi-join pruning by hand where the
    // optimizer can't see the opportunity, e.g. across materialization
    // boundaries). graft_bloom_agg(xxhash64(k), nItems, nBits) -> binary;
    // graft_might_contain(bloom, xxhash64(k)) -> boolean.
    ext.injectFunction((new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_bloom_agg expects (hash, nItems, nBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))
      }))
    ext.injectFunction(binary("graft_might_contain",
      (b, h) => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(b, h)))

    // Text-pipeline surface for pure-SQL users (the reference's audience
    // runs dbt SQL models): each builder applies the same Column
    // combinators the Scala API uses (Text.*), so SQL and Scala produce
    // the IDENTICAL expression tree — codegen'd builtins, no UDFs, and
    // one implementation to keep correct. Registered here rather than as
    // session UDFs so any session with the extension gets them, including
    // thriftserver/SQL-only deployments.
    textFns.foreach { case (name, f) => ext.injectFunction(unaryText(name, f)) }
  }

  private val textFns: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = {
    import graft.functions.Text
    Seq(
      "graft_normalize" -> Text.normalize _,
      "graft_langid" -> Text.langId _,
      "graft_tokens_ws" -> Text.tokenCountWs _,
      "graft_tokens_bpe" -> Text.tokenCountBpe _,
      "graft_stopword_ratio" -> Text.stopwordRatio _,
      "graft_mean_word_len" -> Text.meanWordLen _,
      "graft_quality" -> Text.qualityScore _,
      "graft_fingerprint" -> Text.fingerprintMd5 _)
  }

  private def unaryText(name: String,
                        build: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(graft.functions.Text.getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name expects exactly 1 argument")
        org.apache.spark.sql.GraftColumns.eagerExpression(
          build(org.apache.spark.sql.GraftColumns.column(children(0))))
      })
}
