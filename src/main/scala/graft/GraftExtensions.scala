package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharEntropy, CosineSimilarity, DotProduct, MinHashSig, MisraGries, NfcNormalize, PolyHash, SimHashWord, TermCounts}

/** Library entry point for `spark.sql.extensions` — registers graft's
  * native Catalyst expressions on every session built with
  *
  * {{{
  * --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * so `cosine_similarity` / `dot_product` / `poly_hash` resolve in SQL and
  * `expr(...)` without per-session `register(spark)` calls — the deployment
  * shape a shared cluster uses (one config line, every notebook/job gets
  * the functions). The per-object `register` methods stay for embedded use;
  * both routes construct the same expression nodes, so plans and codegen
  * are identical either way. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two float/double arrays"),
      { args: Seq[Expression] =>
        require(args.length == 2, "cosine_similarity expects 2 arguments")
        CosineSimilarity(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(a, b) - dot product of two float/double arrays"),
      { args: Seq[Expression] =>
        require(args.length == 2, "dot_product expects 2 arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      info("poly_hash",
        "poly_hash(s) - 31-base polynomial rolling hash of a string mod 1e9+7"),
      { args: Seq[Expression] =>
        require(args.length == 1, "poly_hash expects 1 argument")
        PolyHash(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode NFC (canonical composition) normalization"),
      { args: Seq[Expression] =>
        require(args.length == 1, "nfc_normalize expects 1 argument")
        NfcNormalize(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      info("char_entropy",
        "char_entropy(s) - Shannon entropy (bits) over the string's Unicode code points"),
      { args: Seq[Expression] =>
        require(args.length == 1, "char_entropy expects 1 argument")
        CharEntropy(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_word"),
      info("simhash_word",
        "simhash_word(shingles, word) - 60-bit SimHash of a string array; word picks the md5 hex slice (0 or 1)"),
      { args: Seq[Expression] =>
        require(args.length == 2, "simhash_word expects 2 arguments")
        SimHashWord(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(shingles, k) - k-hash MinHash signature (array<bigint>) of a string array"),
      { args: Seq[Expression] =>
        require(args.length == 2, "minhash_sig expects 2 arguments")
        MinHashSig(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("term_counts"),
      info("term_counts",
        "term_counts(arr) - per-row distinct-term occurrence counts: array<struct<term string, tf bigint>>, terms ascending"),
      { args: Seq[Expression] =>
        require(args.length == 1, "term_counts expects 1 argument")
        TermCounts(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(col, k) - mergeable Misra-Gries heavy-hitters sketch (term -> estimate map)"),
      MisraGries.builder))
    // HOF dot-product / squared-norm shapes rewrite to the codegen'd
    // DotProduct kernel (bit-identical semantics — see NativeVectorRewrite)
    ext.injectOptimizerRule(_ => graft.plans.NativeVectorRewrite)
  }
}
