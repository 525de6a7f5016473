package graft.operators

/** BPE merge table trained by `runMain graft.TrainBpe` on /root/testdata/sf0.001
  * (maxVocab 4096, minPairCount 2, 32 merges; histogram of
  * 31 distinct words). GENERATED -- regenerate via TrainBpe
  * rather than editing.
  */
object TrainedMerges {
  val Merges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("s", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("m", "er"),
    ("a", "t"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("d", "ow"),
    ("in", "dow"),
    ("w", "indow"),
    ("d", "er"),
    ("or", "der"),
    ("or", "t"),
    ("s", "ort"),
    ("par", "t"),
    ("u", "p"),
    ("a", "g"),
    ("ag", "g"),
    ("a", "lu"),
    ("alu", "e"),
    ("v", "alue"),
    ("in", "e")
  )
}
