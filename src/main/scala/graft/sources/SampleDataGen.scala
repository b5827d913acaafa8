package graft.sources

import java.nio.file.{Files, Paths}

import scala.util.Random

/** Deterministic synthetic-data generator — the S12 fixture tool.
  *
  * Semantic port of the reference `sample_data/generate_sample_data.py`:
  * same schemas, id formats, value domains, weighted distributions
  * (policy statuses 4:1:1:1 ACTIVE-heavy, payment statuses 4:1:1
  * COMPLETED-heavy, stories 40/50/10, ~15% of policies file 1-3 claims
  * weighted 70/25/5, billing-period driven payment counts). Seeded and
  * deterministic for a given seed; NOT bit-identical to the Python
  * output (different RNG stream — a documented divergence; the reference
  * pins seed 42 for repeatability, which this port preserves per-JVM).
  */
object SampleDataGen {

  private val CoverageTypes = graft.model.Schemas.Domains.coverageTypes
  private val ConstructionTypes = Seq("FRAME", "MASONRY", "CONCRETE", "STEEL", "WOOD", "MANUFACTURED")
  private val RoofTypes = Seq("SHINGLE", "TILE", "METAL", "FLAT", "SLATE", "WOOD_SHAKE")
  private val OccupancyTypes = Seq("PRIMARY", "SECONDARY", "RENTAL", "VACANT")
  private val FloodZones = Seq("A", "AE", "V", "VE", "B", "C", "X", "X500")
  private val WindZones = Seq("1", "2", "3", "4", "5")
  private val ClaimTypes = graft.model.Schemas.Domains.claimTypes
  private val ClaimStatuses = graft.model.Schemas.Domains.claimStatuses
  // ACTIVE-weighted, as in the reference (4× ACTIVE)
  private val PolicyStatuses = Seq("ACTIVE", "ACTIVE", "ACTIVE", "ACTIVE",
    "CANCELLED", "EXPIRED", "PENDING")
  private val PaymentMethods = graft.model.Schemas.Domains.paymentMethods
  private val PaymentStatuses = Seq("COMPLETED", "COMPLETED", "COMPLETED", "COMPLETED",
    "FAILED", "PENDING")
  private val Channels = graft.model.Schemas.Domains.channels
  private val Causes = Seq("HURRICANE", "TORNADO", "HAIL", "LIGHTNING", "FIRE",
    "BURST_PIPE", "THEFT", "VANDALISM", "TREE_FALL", "SINKHOLE", "FLOOD", "WIND")
  private val States = Seq("FL", "TX", "LA", "SC", "NC", "GA", "AL", "MS", "CA", "IL")
  private val FirstNames = Seq("James", "Mary", "Robert", "Patricia", "John", "Jennifer",
    "Michael", "Linda", "David", "Elizabeth", "William", "Barbara")
  private val LastNames = Seq("Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
    "Miller", "Davis", "Rodriguez", "Martinez", "Wilson", "Anderson")
  private val Streets = Seq("Oak", "Maple", "Cedar", "Pine", "Elm", "Magnolia", "Palm")

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.length))
  private def weighted(r: Random, items: Seq[(Int, Int)]): Int = {
    val total = items.map(_._2).sum
    var x = r.nextInt(total)
    items.find { case (_, w) => { x -= w; x < 0 } }.get._1
  }
  private def dateStr(r: Random, startDay: Int, spanDays: Int): String = {
    val d = java.time.LocalDate.of(2020, 1, 1).plusDays(startDay + r.nextInt(spanDays))
    d.toString
  }

  private def csvEscape(v: String): String =
    if (v.contains(",") || v.contains("\"")) "\"" + v.replace("\"", "\"\"") + "\"" else v

  private def writeCsv(path: String, header: Seq[String], rows: Seq[Seq[String]]): Unit = {
    val content = (header.mkString(",") +: rows.map(_.map(csvEscape).mkString(",")))
      .mkString("\n")
    Files.writeString(Paths.get(path), content)
  }

  /** Generate the four raw CSVs into `outDir`. Returns row counts per
    * table. `nPolicies` scales everything like the reference's `--rows`. */
  def generate(outDir: String, nPolicies: Int, seed: Long = 42L): Map[String, Int] = {
    val r = new Random(seed)
    Files.createDirectories(Paths.get(outDir))
    val nProperties = math.max(1, (nPolicies * 0.8).toInt)

    val properties = (1 to nProperties).map { i =>
      val created = dateStr(r, 0, 1600)
      Seq(f"PROP-$i%07d",
        s"${100 + r.nextInt(9900)} ${pick(r, Streets)} St",
        "City" + r.nextInt(50), pick(r, States),
        (10000 + r.nextInt(89999)).toString, s"County${r.nextInt(30)}",
        (25.0 + r.nextDouble() * 17).formatted("%.7f"),
        (-124.0 + r.nextDouble() * 44).formatted("%.7f"),
        (1950 + r.nextInt(75)).toString,
        (800 + r.nextInt(43) * 100).toString,
        weighted(r, Seq(1 -> 40, 2 -> 50, 3 -> 10)).toString,
        pick(r, ConstructionTypes), pick(r, RoofTypes), pick(r, OccupancyTypes),
        pick(r, FloodZones), pick(r, WindZones),
        (80000 + r.nextInt(1420000)).toString + ".00",
        created + "T00:00:00", created + "T00:00:00")
    }
    writeCsv(s"$outDir/raw_properties.csv", Seq("property_id", "street_address", "city",
      "state", "zip_code", "county", "latitude", "longitude", "year_built",
      "square_footage", "stories", "construction_type", "roof_type", "occupancy_type",
      "flood_zone", "wind_zone", "property_value", "created_at", "updated_at"), properties)

    val policies = (1 to nPolicies).map { i =>
      val first = pick(r, FirstNames); val last = pick(r, LastNames)
      val eff = dateStr(r, 0, 1400)
      val exp = java.time.LocalDate.parse(eff).plusYears(1).toString
      val premium = 600 + r.nextInt(4500)
      Seq(f"POL-$i%07d", first, last,
        s"${first.toLowerCase}.${last.toLowerCase}${r.nextInt(999)}@example.com",
        f"PROP-${1 + r.nextInt(nProperties)}%07d",
        pick(r, CoverageTypes), eff, exp, pick(r, PolicyStatuses),
        premium.toString + ".00", Seq(500, 1000, 2500, 5000)(r.nextInt(4)).toString + ".00",
        (100000 + r.nextInt(1400000)).toString + ".00",
        f"AGT-${r.nextInt(500)}%04d", pick(r, Channels),
        eff + "T00:00:00", exp + "T00:00:00")
    }
    writeCsv(s"$outDir/raw_policies.csv", Seq("policy_id", "policyholder_first_name",
      "policyholder_last_name", "policyholder_email", "property_id", "coverage_type_code",
      "effective_date", "expiration_date", "status", "annual_premium", "deductible",
      "coverage_limit", "agent_id", "channel", "created_at", "updated_at"), policies)

    // ~15% of policies file 1-3 claims, weighted 70/25/5 (reference :169-183)
    var claimId = 0
    val claims = policies.flatMap { p =>
      if (r.nextDouble() < 0.15) {
        val n = weighted(r, Seq(1 -> 70, 2 -> 25, 3 -> 5))
        (1 to n).map { _ =>
          claimId += 1
          val claimDate = dateStr(r, 0, 1500)
          val reported = java.time.LocalDate.parse(claimDate).plusDays(r.nextInt(30)).toString
          val status = pick(r, ClaimStatuses)
          val closed = if (status == "CLOSED") java.time.LocalDate.parse(reported)
            .plusDays(10 + r.nextInt(120)).toString else ""
          val amount = 500 + r.nextInt(95000)
          Seq(f"CLM-$claimId%07d", p.head, claimDate, reported, closed,
            pick(r, ClaimTypes), status, amount.toString + ".00",
            (amount * (50 + r.nextInt(50)) / 100).toString + ".00",
            Seq(500, 1000, 2500)(r.nextInt(3)).toString + ".00",
            f"ADJ-${r.nextInt(200)}%04d", pick(r, Causes), "claim",
            reported + "T00:00:00", reported + "T00:00:00")
        }
      } else Nil
    }
    writeCsv(s"$outDir/raw_claims.csv", Seq("claim_id", "policy_id", "claim_date",
      "reported_date", "closed_date", "claim_type", "claim_status", "claim_amount",
      "approved_amount", "deductible_applied", "adjuster_id", "cause_of_loss",
      "description", "created_at", "updated_at"), claims)

    // payments per policy driven by billing period (reference :207-254)
    var premId = 0
    val premiums = policies.flatMap { p =>
      val (period, nPays) = Seq(("MONTHLY", 12), ("QUARTERLY", 4),
        ("SEMI_ANNUAL", 2), ("ANNUAL", 1))(r.nextInt(4))
      val annual = p(9).dropRight(3).toInt
      val eff = java.time.LocalDate.parse(p(6))
      (0 until nPays).map { k =>
        premId += 1
        val due = eff.plusMonths(k.toLong * (12 / nPays))
        val paid = due.plusDays(r.nextInt(15) - 5L)
        Seq(f"PRM-$premId%08d", p.head, paid.toString, due.toString,
          (annual.toDouble / nPays).formatted("%.2f"),
          pick(r, PaymentMethods), pick(r, PaymentStatuses), period,
          due.toString, due.plusMonths((12 / nPays).toLong).toString,
          paid.toString + "T00:00:00")
      }
    }
    writeCsv(s"$outDir/raw_premiums.csv", Seq("premium_id", "policy_id", "payment_date",
      "due_date", "amount", "payment_method", "payment_status", "billing_period",
      "period_start_date", "period_end_date", "created_at"), premiums)

    Map("policies" -> policies.size, "properties" -> properties.size,
      "claims" -> claims.size, "premiums" -> premiums.size)
  }
}
