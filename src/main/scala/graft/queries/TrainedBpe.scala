package graft.queries

/** BPE merge list trained offline by `tools/TrainBpe` on the sf0.01
  * documents word-count table (Sennrich et al. 2016; deterministic
  * argmax with lexicographic tie-break). Like [[TrainedCentroids]] and
  * [[TrainedProjection]], the model is a BUILD ARTIFACT baked as
  * literals: the production shape is train-on-aggregate offline, apply
  * at scale as a per-row expression chain
  * (`TextAnalysis.applyBpe`). The q105 DuckDB oracle is DERIVED from
  * these same literals — one definition, no dual-copy drift. */
object TrainedBpe {
  // paste from: sbt "runMain graft.tools.TrainBpe /root/testdata/sf0.01 40"
  // (trained on the 31-word sf0.01 vocabulary; 40 merge rounds)
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"))
}
