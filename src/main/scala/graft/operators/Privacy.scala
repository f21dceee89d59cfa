package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines
  * (beyond-parity; SURVEY.md §7.3#7): the scrub a corpus must pass
  * before any training run.
  *
  * Everything is `regexp_count` / `regexp_replace` built-ins — pure
  * per-row codegen'd projections that fuse into the scan stage, no
  * shuffle, no UDF — so the operator costs one linear pass at any
  * corpus size.
  *
  * The patterns deliberately use only portable regex constructs
  * (character classes, bounded repetition, ASCII `\b`) that mean the
  * same thing in Java's engine and in RE2-family engines, so results
  * are verifiable against a second engine. They are heuristics in the
  * usual precision/recall trade: an IPv4 pattern that accepts 999.0.0.1
  * would over-redact; one demanding valid octets is not expressible
  * without alternation both engines still share — kept simple here and
  * documented per pattern.
  */
object Privacy {

  /** Category -> (pattern, replacement token). Order matters: SSN
    * before phone (a dashed SSN is also a plausible phone fragment);
    * redaction applies in this sequence. */
  val categories: Seq[(String, String, String)] = Seq(
    // local-part @ domain.tld — the standard liberal email shape
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // dotted quad; \b keeps it from matching inside longer digit runs
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    // US SSN dashed form
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    // 13-19 digit card number, optionally dash/space grouped by 4
    ("card", "\\b[0-9]{4}([ -]?[0-9]{4}){3}\\b", "<CARD>"),
    // NANP-ish phone: optional +1, 3-3-4 groups with separators. The
    // word boundary sits BEFORE the first digit (a leading \b would
    // reject "(555) ..." — space-to-paren is not a boundary)
    ("phone", "(\\+?1[ .-])?\\(?\\b[0-9]{3}\\)?[ .-][0-9]{3}[ .-][0-9]{4}\\b", "<PHONE>"))

  /** Hit count per category as one column each (`pii_<name>`). */
  def detect(text: Column): Seq[(String, Column)] =
    categories.map { case (name, pattern, _) =>
      s"pii_$name" -> regexp_count(text, lit(pattern))
    }

  /** Text with every category replaced by its token, applied in
    * [[categories]] order so overlapping patterns resolve
    * deterministically (SSN wins over phone). */
  def redact(text: Column): Column =
    categories.foldLeft(text) { case (c, (_, pattern, token)) =>
      regexp_replace(c, lit(pattern), lit(token))
    }

  /** Salted-hash pseudonymization (the GDPR-pipeline sibling of
    * [[redact]]): each listed column is replaced by the SHA-256 of
    * salt+value — deterministic, so the pseudonym still joins and
    * groups across tables sharing the salt, while the raw identifier
    * never leaves the cluster. Nulls stay null (a hashed null would
    * mint a fake cross-row link). Row-local codegen projection,
    * shuffle-free. */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      when(col(c).isNotNull,
        sha2(concat_ws("", lit(salt), col(c).cast("string")), 256))))

  /** Annotate a corpus with per-category counts, a total, and the
    * redacted text. Detection counts run against the ORIGINAL text
    * (counts after redaction would always be zero). */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val counted = detect(t).foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }
    counted
      .withColumn("pii_total",
        detect(t).map(_._2.cast("long")).reduce(_ + _))
      .withColumn("text_redacted", redact(t))
  }

  /** k-anonymity by suppression: every row whose quasi-identifier
    * equivalence class (the exact combination of `quasiCols` values)
    * has fewer than k members gets those columns NULLed — the
    * release-gate guarantee that no quasi-identifier combination
    * isolates fewer than k people. Appends `class_size` (pre-
    * suppression, the audit number) and `suppressed`.
    *
    * Scale shape: one window partitioned by the quasi columns — the
    * same hash partitioning a groupBy would use, parallel in classes;
    * no global pass, no driver state. Suppression keeps the row
    * (counts, joins on non-quasi keys survive); drop
    * `suppressed = true` rows afterwards for the stricter variant. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2: $k")
    require(quasiCols.nonEmpty, "kAnonymize needs quasi-identifier columns")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    val sized = df.withColumn("class_size", count(lit(1)).over(w))
      .withColumn("suppressed", col("class_size") < k)
    val masked = df.schema.fields.map { f =>
      if (quasiCols.contains(f.name))
        when(!col("suppressed"), col(f.name)).as(f.name)
      else col(f.name)
    }
    sized.select(masked.toIndexedSeq
      :+ col("class_size") :+ col("suppressed"): _*)
  }

  /** l-diversity suppression — the follow-up k-anonymity needs
    * (Machanavajjhala et al. 2007): a class can be k-large yet still
    * leak when every member SHARES the sensitive value (the
    * homogeneity attack). Each quasi-identifier class must carry at
    * least `l` distinct sensitive values; failing classes get their
    * quasi columns NULLed — [[kAnonymize]]'s suppression contract,
    * applied to diversity instead of size. Appends
    * `distinct_sensitive` (pre-suppression audit) and `suppressed`.
    * NULL sensitive values don't count toward diversity (both
    * engines' count-distinct semantics).
    *
    * Scale shape: one groupBy over the quasi columns collapses the
    * table to its class-diversity counters (map-side combined, no
    * per-class set buffer in a window), then one equi-join back on
    * the same keys — null-safe (`<=>`), since a NULL quasi value is
    * itself a class. */
  def lDiversify(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 2, s"l-diversity needs l >= 2: $l")
    require(quasiCols.nonEmpty, "lDiversify needs quasi-identifier columns")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot be a quasi identifier")
    val div = df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c"))
        :+ col("distinct_sensitive"): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    val joined = df.join(div, cond)
      .withColumn("suppressed", col("distinct_sensitive") < l)
    val masked = df.schema.fields.map { f =>
      if (quasiCols.contains(f.name))
        when(!col("suppressed"), col(f.name)).as(f.name)
      else col(f.name)
    }
    joined.select(masked.toIndexedSeq
      :+ col("distinct_sensitive") :+ col("suppressed"): _*)
  }

  /** CDF of the ±`bound`-truncated two-sided geometric (discrete
    * Laplace) distribution, P(k) ∝ e^{-ε|k|} — precomputed ON THE
    * DRIVER so the distributed plan (and the SQL oracle, which
    * receives these exact doubles as literals) never calls libm.
    * Entry j is P(noise ≤ j − bound) after renormalization. */
  def geometricCdf(epsilon: Double, bound: Int): IndexedSeq[Double] = {
    require(epsilon > 0, s"epsilon must be > 0: $epsilon")
    require(bound >= 1, s"noise bound must be >= 1: $bound")
    val p = math.exp(-epsilon)
    val weights = (-bound to bound).map(k => math.pow(p, math.abs(k)))
    val total = weights.sum
    weights.scanLeft(0.0)(_ + _).tail.map(_ / total).toIndexedSeq
  }

  /** ε-differentially-private group counts — the two-sided geometric
    * (discrete Laplace) mechanism at sensitivity 1, the release gate
    * for publishing corpus composition stats (per-language counts,
    * per-source counts) without letting any single document's
    * presence be inferred. Noise is truncated at ±`noiseBound`
    * (choose it so the tail is negligible: at ε = 0.5, B = 64 leaves
    * < 1e-13 mass — the standard bounded-geometric deployment, with
    * the truncation accounted as the mechanism's δ).
    *
    * The noise is SEEDED and portable: u = the rolling-31 hash of
    * "group:seed" at 53-bit resolution, walked down the
    * driver-precomputed [[geometricCdf]] literals — bit-reproducible
    * on any engine, which is an AUDIT feature (re-running a release
    * reproduces it exactly). A new release must use a fresh seed:
    * re-using one across releases lets averaging strip the noise,
    * and publishing the seed voids the guarantee entirely.
    *
    * Output carries ONLY (group, n_noisy) — the true count never
    * leaves the mechanism, and the 0-clamp is post-processing, which
    * preserves DP. One aggregation, one row per group; the noise walk
    * is a row-local fold over 2·bound+1 literals.
    *
    * WHICH groups appear is itself a release: emitting only the
    * groups present in the data reveals every rare group's presence
    * exactly (a singleton group's row exists iff its one document
    * does — unbounded privacy loss, no noise involved). Pass
    * `domain` — the PUBLICLY-KNOWN group universe (language codes,
    * source registry) — to release one noisy row per domain value,
    * absent groups included (count 0 + noise, clamped) and
    * out-of-domain data groups withheld; then the row set carries no
    * information. Without a domain the count VALUES are still
    * ε-DP, but the release is only safe when the group set is
    * already public knowledge. */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
      seed: Long, noiseBound: Int = 64,
      domain: Option[Seq[String]] = None): DataFrame = {
    val bound = noiseBound
    val cdf = geometricCdf(epsilon, bound)
    val cdfArr = array(cdf.map(lit): _*)
    val counts = domain match {
      case Some(d) =>
        require(d.nonEmpty, "empty group domain")
        val spark = df.sparkSession
        import spark.implicits._
        val dataCounts = df
          .groupBy(col(groupCol).cast("string").as(groupCol))
          .agg(count(lit(1)).as("__n"))
        d.distinct.toDF(groupCol)
          .join(dataCounts, Seq(groupCol), "left")
          .select(col(groupCol), coalesce(col("__n"), lit(0L)).as("__n"))
      case None =>
        df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    }
    // token_hash64 (rolling-31 + fmix64), not the bare polynomial:
    // short group keys leave the polynomial's high bits zero, which
    // would pin u near 0 and slam every count to the -bound tail.
    // 2^53 divides 2^64, so the unsigned residue mod 2^53 is
    // independent of the hash's signed reinterpretation — the SQL
    // replay needs no sign fix-up. The NULL group hashes through a
    // NUL sentinel (a null-intolerant hash would null u, empty
    // the CDF walk, and pin that group's noise at -bound on every
    // seed — a deterministic release, i.e. no privacy at all).
    val u = pmod(graft.functions.TextExpressions.token_hash64(
        concat(coalesce(col(groupCol).cast("string"), lit("\u0000")),
          lit(":" + seed))),
      lit(1L << 53)).cast("double") / (1L << 53).toDouble
    val noise = size(filter(cdfArr, c => c <= u)) - lit(bound)
    counts.select(col(groupCol),
      greatest(col("__n") + noise, lit(0L)).as("n_noisy"))
  }

  /** Seeded portable geometric noise for `keyCol`, walked down a
    * driver-precomputed CDF exactly as [[dpCounts]] does — with a
    * mechanism `tag` mixed into the hash key so composed releases
    * over the same groups and seed (a sum AND a count, priv3) draw
    * INDEPENDENT noise: without the tag both mechanisms would walk
    * the same uniform and the composition accounting would be void. */
  private def taggedNoise(keyCol: Column, tag: String, seed: Long,
      cdf: IndexedSeq[Double], bound: Int): Column = {
    val u = pmod(graft.functions.TextExpressions.token_hash64(
        concat(coalesce(keyCol.cast("string"), lit("\u0000")),
          lit(":" + tag + ":" + seed))),
      lit(1L << 53)).cast("double") / (1L << 53).toDouble
    size(filter(array(cdf.map(lit): _*), c => c <= u)) - lit(bound)
  }

  /** Per-unit clipped, quantized per-group step sums — the bounded-
    * sensitivity integer statistic under both [[dpSum]] and
    * [[dpMean]]. Each unit's total is clamped to [0, clipCents] and
    * deterministically rounded to one of `steps`+1 levels (grain
    * g = clipCents/steps), so adding or removing a unit moves a
    * group's step sum by at most `steps` — the sensitivity the noise
    * is calibrated to. Returns (group, __steps, __units). */
  private def clippedStepSums(df: DataFrame, unitCol: String,
      groupCol: String, valueCents: Column, clipCents: Long,
      steps: Int, checkDisjoint: Boolean): DataFrame = {
    require(clipCents > 0, s"clip bound must be positive: $clipCents")
    require(steps >= 1 && clipCents % steps == 0,
      s"steps must divide clipCents evenly: $clipCents / $steps")
    val g = clipCents / steps
    val perUnit = df
      .groupBy(col(unitCol).as("__unit"),
        col(groupCol).cast("string").as(groupCol))
      .agg(sum(valueCents).as("__s"))
    if (checkDisjoint) {
      // the sensitivity argument needs each unit in exactly ONE group
      // (group = an attribute of the unit); a unit spread over m
      // groups would cost m*epsilon, silently. One bounded
      // aggregation pass, loud failure.
      val chk = perUnit.agg(count(lit(1)),
        countDistinct(col("__unit"))).collect()(0)
      require(chk.getLong(0) == chk.getLong(1),
        s"${chk.getLong(0) - chk.getLong(1)} unit(s) contribute to " +
          "more than one group — the per-group epsilon accounting " +
          "assumes disjoint groups; pre-assign each unit a single " +
          "group or pass checkDisjoint = false after re-budgeting")
    }
    // deterministic midpoint rounding in exact integer+IEEE steps
    // (values <= clip + g/2 << 2^53, so the double math is exact and
    // SQL-replayable)
    val q = floor((least(greatest(col("__s"), lit(0L)), lit(clipCents))
        + lit(g / 2)).cast("double") / lit(g.toDouble)).cast("long")
    perUnit.select(col(groupCol), q.as("__q"))
      .groupBy(col(groupCol))
      .agg(sum(col("__q")).as("__steps"), count(lit(1)).as("__units"))
  }

  /** ε-DP group SUMS under bounded per-unit contribution — the
    * release gate for publishing per-source totals (spend, tokens,
    * bytes) where one UNIT (customer, author) owns many rows. The
    * pipeline: per-unit totals → clamp to [0, clipCents] → midpoint-
    * round to `steps` levels of grain g = clipCents/steps → group
    * step sums → two-sided geometric noise at sensitivity `steps`
    * (CDF of [[geometricCdf]](ε/steps, noiseBound), same truncation-
    * as-δ accounting as [[dpCounts]]) → 0-clamp → rescale by g.
    *
    * The quantization is what keeps the mechanism's noise walk
    * bounded (2·noiseBound+1 literals) AND engine-replayable; its
    * utility cost is nil — the geometric noise at sensitivity
    * `steps` dwarfs the ±g/2 rounding, exactly as Laplace(clip/ε)
    * noise dwarfs cents. In production swap the walk for inverse-CDF
    * sampling if auditability is not required; the semantics here
    * are the audited-release ones.
    *
    * `domain` (a 1-column frame of the PUBLIC group universe, e.g.
    * the nation dimension) plays priv1's role: one noisy row per
    * domain value, so the row set reveals no presence. Scale shape:
    * two aggregations (per-unit, per-group) + a row-local noise
    * projection; only (unit, group, cents) triples ever shuffle. */
  def dpSum(df: DataFrame, unitCol: String, groupCol: String,
      valueCents: Column, clipCents: Long, steps: Int, epsilon: Double,
      seed: Long, noiseBound: Int = 512,
      domain: Option[DataFrame] = None,
      checkDisjoint: Boolean = true): DataFrame = {
    val g = clipCents / steps
    val cdf = geometricCdf(epsilon / steps, noiseBound)
    val grp = clippedStepSums(df, unitCol, groupCol, valueCents,
      clipCents, steps, checkDisjoint)
    val based = withDomain(grp, groupCol, domain)
    based.select(col(groupCol),
      (greatest(col("__steps")
          + taggedNoise(col(groupCol), "sum", seed, cdf, noiseBound),
        lit(0L)) * lit(g)).as("sum_noisy_cents"))
  }

  /** ε-DP group MEANS released the composable way: the noisy sum
    * (mechanism of [[dpSum]], budget εSum) alongside a noisy UNIT
    * count (sensitivity-1 geometric, budget εCnt, independent noise
    * via the mechanism tag) and their quotient — total privacy cost
    * εSum + εCnt by sequential composition. Publishing the pair
    * rather than only the quotient is deliberate: consumers can
    * re-derive the mean, reweight, or aggregate further, all as
    * post-processing. */
  def dpMean(df: DataFrame, unitCol: String, groupCol: String,
      valueCents: Column, clipCents: Long, steps: Int,
      epsSum: Double, epsCnt: Double, seed: Long,
      noiseBound: Int = 512, cntBound: Int = 64,
      domain: Option[DataFrame] = None,
      checkDisjoint: Boolean = true): DataFrame = {
    val g = clipCents / steps
    val sumCdf = geometricCdf(epsSum / steps, noiseBound)
    val cntCdf = geometricCdf(epsCnt, cntBound)
    val grp = clippedStepSums(df, unitCol, groupCol, valueCents,
      clipCents, steps, checkDisjoint)
    val based = withDomain(grp, groupCol, domain)
    based.select(col(groupCol),
        greatest(col("__units")
            + taggedNoise(col(groupCol), "cnt", seed, cntCdf, cntBound),
          lit(0L)).as("n_noisy"),
        (greatest(col("__steps")
            + taggedNoise(col(groupCol), "sum", seed, sumCdf, noiseBound),
          lit(0L)) * lit(g)).as("sum_noisy_cents"))
      .withColumn("mean_noisy",
        col("sum_noisy_cents").cast("double")
          / greatest(col("n_noisy"), lit(1L)).cast("double"))
  }

  /** Left-join a (group, __steps, __units) frame onto the public
    * `domain` universe: absent groups release noise-only rows,
    * out-of-domain data groups are withheld (the priv1 contract). */
  private def withDomain(grp: DataFrame, groupCol: String,
      domain: Option[DataFrame]): DataFrame = domain match {
    case Some(d) =>
      require(d.columns.length == 1,
        s"domain frame must have exactly one column: ${d.columns.mkString(",")}")
      d.select(col(d.columns(0)).cast("string").as(groupCol)).distinct()
        .join(grp, Seq(groupCol), "left")
        .select(col(groupCol),
          coalesce(col("__steps"), lit(0L)).as("__steps"),
          coalesce(col("__units"), lit(0L)).as("__units"))
    case None => grp
  }
}
