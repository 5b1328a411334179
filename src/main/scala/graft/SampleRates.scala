package graft

/** Registry of every salted-md5 sampling rate used for BOUNDARY
  * PLACEMENT (range-split / quantile passes). The scale contract of a
  * sampled-boundary pass is that the ordered machinery it feeds (since
  * r12: the Boundaries distributed prefix-sum — range-partitioned, no
  * single task ever holds the relation) sees only
  * `fraction · |relation|` rows — a real bound only when the fraction
  * is planner-sized. `Ceiling` (1/32 ≈ 3.1%) is
  * the declared maximum; PlanQualitySpec reads this registry and fails
  * if any rate exceeds it, so a nominally "rate-bounded" pass can never
  * quietly carry a 25% rate again (the round-9 events_rfm lesson).
  *
  * Membership is `substr(md5(salt || key), 1, hex.length) < hex` — a
  * pure function of the key, so Spark and the DuckDB oracle pick the
  * identical sample. fraction = parseInt(hex, 16) / 16^len.
  */
object SampleRates {
  val Ceiling: Double = 1.0 / 32.0

  /** query/pass name → md5-prefix threshold (lowercase hex). */
  val rates: Map[String, String] = Map(
    // 65/4096 ≈ 1.6% of distinct l_orderkey feed the split-boundary rank
    "layout_range_split" -> "041",
    // 5/256 ≈ 2.0% of users feed the MONETARY quintile boundary only
    // (recency/frequency boundaries are EXACT, from value histograms)
    "events_rfm_monetary" -> "05",
    // the profile_quantile_sample_curve sweep brackets the rfm rate:
    // 2/256 ≈ 0.8% below it, 8/256 = 3.125% at the ceiling. Same salt
    // ("rfm|") and prefix length as events_rfm_monetary, so the three
    // samples NEST (lo ⊂ rfm ⊂ hi) — the curve varies exactly one knob
    "profile_quantile_curve_lo" -> "02",
    "profile_quantile_curve_hi" -> "08")

  def fraction(hex: String): Double =
    java.lang.Long.parseLong(hex, 16).toDouble / math.pow(16.0, hex.length.toDouble)
}
