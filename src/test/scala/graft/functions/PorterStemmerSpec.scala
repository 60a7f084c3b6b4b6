package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests for the vendored Porter stemmer against the worked
  * examples of the published algorithm (Porter 1980) — full-pipeline
  * expectations, i.e. what stem() returns after all steps. */
class PorterStemmerSpec extends AnyFunSuite {

  private val examples = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+ fixups)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // steps 2-4 compositions
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "digitizer" -> "digit", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl", "triplicate" -> "triplic",
    "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr",
    "hopeful" -> "hope", "goodness" -> "good", "revival" -> "reviv",
    "allowance" -> "allow", "inference" -> "infer", "airliner" -> "airlin",
    "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt",
    "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("Porter paper examples") {
    for ((in, want) <- examples)
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
  }

  test("short words and nulls pass through") {
    assert(PorterStemmer.stem("ab") == "ab")
    assert(PorterStemmer.stem("a") == "a")
    assert(PorterStemmer.stem(null) == null)
  }

  test("oracle stem map matches the implementation") {
    // the q15/q31 DuckDB oracles embed these stems as a VALUES list —
    // this pins the map to the implementation
    val map = Map("customer" -> "custom", "key" -> "kei", "merge" -> "merg",
      "query" -> "queri", "table" -> "tabl", "value" -> "valu")
    for ((w, s) <- map) assert(PorterStemmer.stem(w) == s)
    val identity = Seq("agg", "batch", "big", "column", "data", "fast",
      "filter", "group", "hash", "join", "line", "order", "part", "row",
      "scan", "slow", "small", "sort", "spark", "stream", "vector",
      "window", "the")
    for (w <- identity) assert(PorterStemmer.stem(w) == w, s"identity $w")
  }
}
