package graft

import org.apache.spark.sql.functions._
import graft.functions.{json_kv_raw, json_unquote}
import graft.operators.Pipeline

/** The single-pass raw-token JSON reader behind the renderers, and the
  * value-TYPE probing it restores: the reference renderer switches on the
  * actual runtime type (/root/reference/transformer/transformer.go:34-52),
  * so a numeric-looking JSON *string* like "89799" must stay quoted and
  * infer VARCHAR — information get_json_object destroys by stripping
  * quotes (round-1 bug, ADVICE.md item 1).
  */
class JsonKvSpec extends SparkSuite {

  private val T = "2024-01-01 10:00:00"

  private def kvOf(json: String): Map[String, String] = {
    import spark.implicits._
    val rows = Seq(json).toDF("payload")
      .select(json_kv_raw(col("payload")).as("kv"))
      .collect()
    Option(rows(0).getAs[Map[String, String]]("kv")).orNull
  }

  test("raw tokens keep quotes/braces; keys decode escapes") {
    val kv = kvOf("""{"a":1,"b":"x","c":{"n":2},"d":[1,2],"e":null,"f\n":true}""")
    assert(kv("a") == "1")
    assert(kv("b") == "\"x\"")
    assert(kv("c") == """{"n":2}""")
    assert(kv("d") == "[1,2]")
    assert(kv("e") == "null")
    assert(kv("f\n") == "true")
  }

  test("invalid primitive tokens reject the whole object (nothing unvalidated reaches SQL)") {
    // an unquoted junk run like abc'def must NOT tokenize — it would
    // otherwise render BARE into a statement via the number branch
    assert(kvOf("""{"x":abc'def}""") == null)
    assert(kvOf("""{"x":nulll}""") == null)
    assert(kvOf("""{"x":1.2.3}""") == null)
    assert(kvOf("""{"x":--5}""") == null)
    // valid number forms pass, including exponent/leading-zero relaxations
    assert(kvOf("""{"a":1e5,"b":-2.5E-3,"c":07}""") ==
      Map("a" -> "1e5", "b" -> "-2.5E-3", "c" -> "07"))
    // exponent numbers render bare and type FLOAT — consistent pair
    val df = turns(("c1", 1, "user",
      """INS test.t {"_id":"e1","x":1e5}""", "tool_0", T))
    assert(stmtsOrdered(Pipeline.renderInsertDynamic(parsedValid(df))) ==
      Seq("INSERT INTO test.t (_id, x) VALUES ('e1', 1e5);"))
    val ddl = Pipeline.ddlCreateTablesDynamic(parsedValid(df))
      .select("stmt").collect().map(_.getString(0)).toSeq
    assert(ddl == Seq("CREATE TABLE IF NOT EXISTS test.t " +
      "(_id VARCHAR(255) PRIMARY KEY, x FLOAT);"))
  }

  test("duplicate keys: LAST occurrence wins with a single entry (Go map decode semantics)") {
    // the reference decodes into map[string]interface{} — encoding/json
    // overwrites on duplicate keys; a dup-keyed MapData would leak the
    // key twice through map_keys into rendered column lists
    assert(kvOf("""{"a":1,"a":2}""") == Map("a" -> "2"))
    assert(kvOf("""{"a":1,"b":"x","a":null}""") ==
      Map("a" -> "null", "b" -> "\"x\""))
    val df = turns(("c1", 1, "user",
      """INS test.t {"_id":"d1","k":1,"k":2}""", "tool_0", T))
    assert(stmtsOrdered(Pipeline.renderInsertDynamic(parsedValid(df))) ==
      Seq("INSERT INTO test.t (_id, k) VALUES ('d1', 2);"))
  }

  test("mismatched bracket KINDS reject at tokenization (r2 ADVICE: '{]' is not well-formed)") {
    // a shared depth counter would accept these as valid raw tokens
    assert(kvOf("""{"a":{]}""") == null)
    assert(kvOf("""{"a":[}}""") == null)
    assert(kvOf("""{"a":[1,{"b":2]}}""") == null)
    // matched deep nesting still tokenizes
    assert(kvOf("""{"a":{"b":[{"c":[[]]}]}}""")("a") == """{"b":[{"c":[[]]}]}""")
    // nesting depth is capped (parser practice, bounds the kind stack):
    // 512 deep passes, 513 rejects as malformed
    val deep512 = "[" * 512 + "]" * 512
    assert(kvOf(s"""{"a":$deep512}""")("a") == deep512)
    assert(kvOf(s"""{"a":${"[" * 513 + "]" * 513}}""") == null)
  }

  test("whitespace tolerated; non-objects and malformed input yield null") {
    assert(kvOf("""  { "a" : 1 , "b" : [ 1, {"x":"}"} ] } """)("b") == """[ 1, {"x":"}"} ]""")
    assert(kvOf("[1,2]") == null)
    assert(kvOf("garbage") == null)
    assert(kvOf("""{"a":1""") == null)
    assert(kvOf("""{"a":1} trailing""") == null)
    assert(kvOf("{}") == Map.empty[String, String])
  }

  test("json_unquote decodes escapes; passthrough for non-strings") {
    import spark.implicits._
    val rows = Seq(
      "\"a\\\"b\\\\c\\nd\\u0041\"" -> "a\"b\\c\ndA",
      "123" -> "123",
      "{\"x\":1}" -> "{\"x\":1}").toDF("raw", "want")
      .select(json_unquote(col("raw")).as("got"), col("want"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("numeric-looking JSON strings stay quoted in DML and VARCHAR in DDL (transformer.go:37-48,238-239)") {
    val df = turns(("c1", 1, "user",
      """INS test.t {"_id":"51","zip":"89799","n":89799,"flag":"true","b":true,"f":"1.5","x":1.5}""",
      "tool_0", T))
    val p = parsedValid(df)
    assert(stmtsOrdered(Pipeline.renderInsertDynamic(p)) == Seq(
      "INSERT INTO test.t (_id, b, f, flag, n, x, zip) " +
        "VALUES ('51', true, '1.5', 'true', 89799, 1.5, '89799');"))
    val ddl = Pipeline.ddlCreateTablesDynamic(p)
      .select("stmt").collect().map(_.getString(0)).toSeq
    assert(ddl == Seq(
      "CREATE TABLE IF NOT EXISTS test.t (_id VARCHAR(255) PRIMARY KEY, b BOOLEAN, " +
        "f VARCHAR(255), flag VARCHAR(255), n INTEGER, x FLOAT, " +
        "zip VARCHAR(255));"))
  }

  test("property: 200 generated objects — keys recovered exactly, values round-trip (vs to_json)") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.functions.{from_json, map_keys}
    import org.apache.spark.sql.types.{MapType, StringType}
    import spark.implicits._
    val keyGen = Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('"'), 1 -> Gen.const('\\'),
      1 -> Gen.const('\n'), 1 -> Gen.const('é'))).map(_.mkString.take(12))
    val valGen = Gen.oneOf[Any](
      Gen.alphaStr.map(identity[Any]), Gen.long.map(identity[Any]),
      Gen.oneOf(true, false).map(identity[Any]),
      Gen.const(null).map(identity[Any]))
    val objGen = Gen.mapOfN(4, Gen.zip(keyGen, valGen))
    val objs = Gen.listOfN(200, objGen).sample.get.filter(_.nonEmpty)
    // serialize with a known-good escaper (the same rules json.org defines)
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    def ser(m: Map[String, Any]): String = m.map {
      case (k, v: String) => s""""${esc(k)}":"${esc(v)}""""
      case (k, null) => s""""${esc(k)}":null"""
      case (k, v) => s""""${esc(k)}":$v"""
    }.mkString("{", ",", "}")
    val df = objs.map(ser).toDF("payload")
      .withColumn("kv", json_kv_raw(col("payload")))
    // cross-check against Spark's own JSON reader (values decoded): every
    // key present with the same decoded scalar
    val viaSpark = df.select(
      from_json(col("payload"), MapType(StringType, StringType)).as("ref"),
      col("kv")).collect()
    viaSpark.zip(objs).foreach { case (row, obj) =>
      val kv = row.getAs[Map[String, String]]("kv")
      assert(kv != null, s"tokenizer rejected ${ser(obj)}")
      assert(kv.keySet == obj.keySet.map(_.toString))
      obj.foreach {
        case (k, v: String) => assert(kv(k) == "\"" + esc(v) + "\"")
        case (k, null) => assert(kv(k) == "null")
        case (k, v) => assert(kv(k) == v.toString)
      }
    }
    // and map_keys order is document order (stable input for array_sort)
    val nKeys = df.select(map_keys(col("kv"))).collect()
      .map(_.getSeq[String](0).length).sum
    assert(nKeys == objs.map(_.size).sum)
  }

  test("escaped quotes inside JSON strings render with SQL '' doubling") {
    val df = turns(("c1", 1, "tool",
      """DEL test.t {"_id":"O'Brien \"Jr\""}""", "tool_0", T))
    assert(stmtsOrdered(Pipeline.renderDeleteDynamic(parsedValid(df))) ==
      Seq("DELETE FROM test.t WHERE _id = 'O''Brien \"Jr\"';"))
  }
}
