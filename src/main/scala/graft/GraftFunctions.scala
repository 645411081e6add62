package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArgmaxCell, CharEntropy, CosineSimilarity, DotProduct, MinHashSig, MisraGries, NfcNormalize, PolyHash, SimHashWord, SquaredL2, TermCounts}

/** THE single source of the native-function registrations (VERDICT r17
  * #8): one list of (identifier, info, builder) tuples consumed by BOTH
  * wiring routes —
  *
  *  - [[GraftExtensions]] injects each tuple via
  *    `SparkSessionExtensions.injectFunction` for sessions built with
  *    `spark.sql.extensions=graft.GraftExtensions` (the shared-cluster
  *    deployment shape);
  *  - [[registerAll]] registers the same tuples directly into an
  *    existing session's function registry (the embedded shape, and what
  *    each expression object's own `register(spark)` does one-at-a-time).
  *
  * Both routes construct the same expression nodes from the same
  * builders, so plans and codegen are identical either way — and a new
  * native function added here is automatically on every path
  * (ExtensionsSmokeSpec plans the whole registry against a session wired
  * through this list alone). */
object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def fn(name: String, usage: String, arity: Int,
                 builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), { args: Seq[Expression] =>
      require(args.length == arity, s"$name expects $arity argument(s)")
      builder(args)
    })

  /** All native functions, one tuple each. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("cosine_similarity",
      "cosine_similarity(a, b) - cosine similarity of two float/double arrays",
      2, args => CosineSimilarity(args.head, args(1))),
    fn("dot_product",
      "dot_product(a, b) - dot product of two float/double arrays",
      2, args => DotProduct(args.head, args(1))),
    fn("squared_l2",
      "squared_l2(a, b) - squared L2 distance of two float/double arrays",
      2, args => SquaredL2(args.head, args(1))),
    fn("poly_hash",
      "poly_hash(s) - 31-base polynomial rolling hash of a string mod 1e9+7",
      1, args => PolyHash(args.head)),
    fn("nfc_normalize",
      "nfc_normalize(s) - Unicode NFC (canonical composition) normalization",
      1, args => NfcNormalize(args.head)),
    fn("char_entropy",
      "char_entropy(s) - Shannon entropy (bits) over the string's Unicode code points",
      1, args => CharEntropy(args.head)),
    fn("simhash_word",
      "simhash_word(shingles, word) - 60-bit SimHash of a string array; word picks the md5 hex slice (0 or 1)",
      2, args => SimHashWord(args.head, args(1))),
    fn("minhash_sig",
      "minhash_sig(shingles, k) - k-hash MinHash signature (array<bigint>) of a string array",
      2, args => MinHashSig(args.head, args(1))),
    fn("term_counts",
      "term_counts(arr) - per-row distinct-term occurrence counts: array<struct<term string, tf bigint>>, terms ascending",
      1, args => TermCounts(args.head)),
    fn("argmax_cell",
      "argmax_cell(ed, ids, centroids) - id of the max-cosine centroid (6dp rounding, ties to lowest id); ids/centroids must be foldable literals",
      3, args => ArgmaxCell(args.head, args(1), args(2)))) :+
    ((FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(col, k) - mergeable Misra-Gries heavy-hitters sketch (term -> estimate map)"),
      MisraGries.builder))

  /** Registers every native function into `spark`'s own registry —
    * idempotent (re-registration replaces with an identical builder). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
