package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions hook — the injection path for clusters where the
  * session is built by infrastructure, not application code:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * registers every custom expression in the catalog at session build time
  * (the configuration-owned equivalent of `functions.registerAll`, which
  * remains for sessions the library creates itself — GraftSession).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String,
                 build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      build)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("parse_turn",
      "fused grok parse of a transcript turn -> struct(op, db, tbl, payload)",
      exprs => ParseTurn(exprs.head)))
    ext.injectFunction(fn("valid_turn",
      "single-pass op-whitelist + db-blacklist admission predicate",
      exprs => ValidTurn(exprs.head)))
    ext.injectFunction(fn("json_kv_raw",
      "top-level JSON object -> map<key, raw-json-token>",
      exprs => JsonKvRaw(exprs.head)))
    ext.injectFunction(fn("json_unquote",
      "decode a raw JSON string token; passthrough otherwise",
      exprs => JsonUnquote(exprs.head)))
    ext.injectFunction(fn("json_arr_raw",
      "raw JSON array token -> array of raw element tokens",
      exprs => JsonArrRaw(exprs.head)))
    ext.injectFunction(fn("simhash64",
      "64-bit SimHash of a token array (FNV-1a bit votes)",
      exprs => SimHash64(exprs.head)))
    ext.injectFunction(fn("simhash_poly",
      "62-bit cross-engine SimHash of a token array (PolyHash31 bit votes)",
      exprs => SimHashPoly(exprs.head)))
    ext.injectFunction(fn("rolling_hash",
      "Karp-Rabin polynomial fingerprint mod 2^61-1",
      exprs => RollingHash(exprs.head)))
    ext.injectFunction(fn("poly_hash31",
      "cross-engine polynomial fingerprint mod 2^31-1 (first 64 bytes)",
      exprs => PolyHash31(exprs.head)))
  }
}
