package graft.functions

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/** Date parsing with BCE + open-precision semantics.
  *
  * Re-expression of the reference's date handling
  * (`pipeline/process/utils/mapper_utils.py:241-494` make_datetime,
  * `pipeline/sources/general/wikidata/mapper.py:76-119` precision wrapper,
  * `pipeline/process/base/mapper.py:188-271` century phrases,
  * `pipeline/sources/lux/marklogic/mapper.py:83-97` BCE epoch seconds).
  *
  * Semantics: a date string + optional precision yields a closed interval
  * `[begin, end]` of ISO strings where `end = begin + 1 precision-unit - 1s`.
  * Years are proleptic-Gregorian ISO (year 0 = 1 BCE), always rendered
  * 4-digit zero-padded with a leading '-' for BCE; values NEVER pass
  * through TimestampType (BCE-unsafe) — epoch seconds are derived as Long.
  *
  * Deviations from the reference (documented, deliberate):
  *  - the EDTF library's double end-second subtraction quirk is not
  *    reproduced; end is always exactly next-period-start minus 1s;
  *  - locale fallbacks beyond English month names are unsupported.
  */
object DateLib {

  final case class DateRange(begin: String, end: String)

  private val parenPrefix = "^\\([^)]*\\)\\s*".r
  private val eightDigit = "^\\d{8}$".r
  private val sixDigit = "^\\d{6}$".r
  private val shortYearIso = "^(-?)(\\d{2,3})(-\\d\\d-\\d\\d([^0-9].*|$))".r
  private val germanBc = "^(?:(\\d\\d)\\.(\\d\\d)\\.)?v(\\d{2,3})$".r
  // numeric-year-only: "1000 BC"; century phrases keep their own suffix
  private val bceSuffix = "(?i)^(\\d{1,4})\\s+(?:B\\.?C\\.?E?\\.?|BCE)$".r
  private val isoLike =
    "^(-?)(\\d{1,6})(?:-(\\d{1,2})(?:-(\\d{1,2})(?:[T ](\\d{1,2}):(\\d{1,2})(?::(\\d{1,2}))?Z?)?)?)?$".r
  private val masked = "^(-?)(\\d{1,3})(X{1,3})$".r
  private val approxYear = "^(-?\\d{1,4})[?~]$".r
  private val yearRange = "^(-?\\d{1,4})\\s*-\\s*(-?\\d{1,4})$".r
  private val century =
    "(?i)^(?:early|mid|late)?\\s*(\\d{1,2})(?:st|nd|rd|th) century( (?:B\\.?C\\.?E?\\.?|BCE))?$".r
  private val centuryRange =
    "(?i)^(?:early|mid|late)?\\s*(\\d{1,2})(?:st|nd|rd|th) century\\s*-\\s*(?:early|mid|late)?\\s*(\\d{1,2})(?:st|nd|rd|th) century$".r
  private val monthNames: Map[String, Int] = {
    val full = Seq("january", "february", "march", "april", "may", "june",
      "july", "august", "september", "october", "november", "december")
    (full.zipWithIndex.map { case (m, i) => m -> (i + 1) } ++
      full.zipWithIndex.map { case (m, i) => m.take(3) -> (i + 1) }).toMap
  }
  // "September 2002" / "Sep 2002" / "19 September 2002" / "September 19, 2002"
  private val monthYear = "(?i)^([a-z]{3,9})\\.?,?\\s+(\\d{3,4})$".r
  private val dayMonthYear = "(?i)^(\\d{1,2})(?:st|nd|rd|th)?\\s+([a-z]{3,9})\\.?,?\\s+(\\d{3,4})$".r
  private val monthDayYear = "(?i)^([a-z]{3,9})\\.?\\s+(\\d{1,2})(?:st|nd|rd|th)?,?\\s+(\\d{3,4})$".r
  private val numericDmy = "^(\\d{1,2})[./](\\d{1,2})[./](\\d{4})$".r
  private val numericYmd = "^(\\d{4})[./](\\d{1,2})[./](\\d{1,2})$".r

  /** F15: Hebrew-calendar conversion (mapper_utils.py:200-211). Years
    * above 4500 (~740 CE) are taken as Hebrew dates — month numbering as
    * the reference's calendar library: Nisan=1..Elul=6, Tishrei=7..
    * Adar I=12, Adar II=13 — and converted to the proleptic-Gregorian
    * day via the standard molad arithmetic with the four postponement
    * rules (Dershowitz & Reingold, Calendrical Calculations; public
    * algorithm). Verified against known anchors: 5784-07-01 ->
    * 2023-09-16, 5784-01-15 -> 2024-04-23. */
  object Hebrew {
    def isLeap(y: Int): Boolean = (7 * y + 1) % 19 < 7
    /** Days from the Hebrew epoch to Rosh Hashanah of `year`. */
    def elapsedDays(year: Int): Long = {
      val monthsElapsed = 235L * ((year - 1) / 19) + 12L * ((year - 1) % 19) +
        (7L * ((year - 1) % 19) + 1) / 19
      val partsElapsed = 204L + 793L * (monthsElapsed % 1080)
      val hoursElapsed = 5L + 12L * monthsElapsed +
        793L * (monthsElapsed / 1080) + partsElapsed / 1080
      val day = 1L + 29L * monthsElapsed + hoursElapsed / 24
      val parts = (hoursElapsed % 24) * 1080 + partsElapsed % 1080
      val postponed =
        if (parts >= 19440 ||
          (day % 7 == 2 && parts >= 9924 && !isLeap(year)) ||
          (day % 7 == 1 && parts >= 16789 && isLeap(year - 1))) day + 1
        else day
      if (postponed % 7 == 0 || postponed % 7 == 3 || postponed % 7 == 5)
        postponed + 1
      else postponed
    }
    def yearLength(y: Int): Long = elapsedDays(y + 1) - elapsedDays(y)
    def monthLength(y: Int, m: Int): Int = m match {
      case 1 | 3 | 5 | 7 | 11 => 30 // Nisan, Sivan, Av, Tishrei, Shevat
      case 8 => if (yearLength(y) % 10 == 5) 30 else 29 // Heshvan (full yr)
      case 9 => if (yearLength(y) % 10 == 3) 29 else 30 // Kislev (defic. yr)
      case 12 => if (isLeap(y)) 30 else 29 // Adar I leap / Adar normal
      case _ => 29 // Iyar, Tammuz, Elul, Tevet, Adar II
    }
    /** Months of year y in civil order, Tishrei first. */
    private def civilOrder(y: Int): Seq[Int] =
      (7 to (if (isLeap(y)) 13 else 12)) ++ (1 to 6)
    /** Rata Die (proleptic-Gregorian day number, 1 = 0001-01-01) of the
      * Hebrew date, or None when the date is invalid for that year. */
    def toRataDie(y: Int, m: Int, d: Int): Option[Long] = {
      val months = civilOrder(y)
      if (y < 1 || !months.contains(m) || d < 1 || d > monthLength(y, m)) None
      else {
        val offset = months.takeWhile(_ != m).map(monthLength(y, _)).sum
        Some(elapsedDays(y) - 1373428L + offset + (d - 1))
      }
    }
    private val cum = Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
    private def gregLeap(y: Int) = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
    private def rdOfJan1(y: Int): Long =
      365L * (y - 1) + (y - 1) / 4 - (y - 1) / 100 + (y - 1) / 400 + 1
    /** RD -> proleptic-Gregorian (year, month, day). */
    def gregorianOf(rd: Long): (Int, Int, Int) = {
      val d0 = rd - 1
      val n400 = d0 / 146097; val d1 = d0 % 146097
      val n100 = d1 / 36524; val d2 = d1 % 36524
      val n4 = d2 / 1461; val d3 = d2 % 1461
      val n1 = d3 / 365
      val year0 = (400 * n400 + 100 * n100 + 4 * n4 + n1).toInt
      val year = if (n100 == 4 || n1 == 4) year0 else year0 + 1
      val doy = (rd - rdOfJan1(year)).toInt // 0-based day of year
      val leapAdj = if (gregLeap(year)) 1 else 0
      def before(m: Int) = cum(m - 1) + (if (m > 2) leapAdj else 0)
      var m = 12
      while (m > 1 && doy < before(m)) m -= 1
      (year, m, doy - before(m) + 1)
    }
  }

  /** Precision char -> ChronoUnit for interval width. */
  private def unitOf(prec: Char): ChronoUnit = prec match {
    case 'Y' => ChronoUnit.YEARS
    case 'M' => ChronoUnit.MONTHS
    case 'D' => ChronoUnit.DAYS
    case 'h' => ChronoUnit.HOURS
    case 'm' => ChronoUnit.MINUTES
    case _   => ChronoUnit.SECONDS
  }

  /** ISO render with sign + 4-digit-padded year (BCE-safe, no Z). */
  def fmt(dt: LocalDateTime): String = {
    val y = dt.getYear
    val sign = if (y < 0) "-" else ""
    f"$sign${math.abs(y)}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02dT${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
  }

  private def range(begin: LocalDateTime, prec: Char): DateRange = {
    val end = begin.plus(1, unitOf(prec)).minusSeconds(1)
    DateRange(fmt(begin), fmt(end))
  }

  private def rangeYears(y1: Int, y2: Int): DateRange =
    DateRange(fmt(LocalDateTime.of(y1, 1, 1, 0, 0, 0)),
      fmt(LocalDateTime.of(y2, 1, 1, 0, 0, 0).plusYears(1).minusSeconds(1)))

  /** Parse a cleaned ISO-component string into (begin, inferred precision). */
  private def parseIso(sign: String, y: String, mo: String, d: String,
      h: String, mi: String, s: String): Option[(LocalDateTime, Char)] = {
    val year = y.toInt * (if (sign == "-") -1 else 1)
    val prec: Char =
      if (s != null) 's' else if (mi != null) 'm' else if (h != null) 'h'
      else if (d != null) 'D' else if (mo != null) 'M' else 'Y'
    try Some((LocalDateTime.of(year,
      if (mo != null) mo.toInt else 1, if (d != null) d.toInt else 1,
      if (h != null) h.toInt else 0, if (mi != null) mi.toInt else 0,
      if (s != null) s.toInt else 0), prec))
    catch { case _: Exception => None }
  }

  /** The main entry: date string (+ optional precision Y/M/D/h/m/s) ->
    * closed [begin, end] interval, or None if unparseable/garbage. */
  def makeDatetime(rawIn: String, precision: String = ""): Option[DateRange] = {
    if (rawIn == null) return None
    var v = parenPrefix.replaceFirstIn(rawIn, "")
      .replace("edtf", "").replace("=", "-").trim
    if (eightDigit.matches(v)) v = s"${v.substring(0, 4)}-${v.substring(4, 6)}-${v.substring(6)}"
    if (v.isEmpty || v.startsWith("9999") || v == "0000" ||
      v.toLowerCase(java.util.Locale.ROOT).contains("jh") || v.length > 34) return None
    if (v.startsWith("- ")) v = "-" + v.substring(2).trim
    if (v.startsWith("0000-12-31") || v.startsWith("0000-01-01")) v = "0001" + v.substring(4)
    v = shortYearIso.replaceAllIn(v, m =>
      m.group(1) + ("0" * (4 - m.group(2).length)) + m.group(2) + m.group(3))
    if (v.contains("-00T00:00:00")) v = v.substring(0, v.indexOf('T'))
    germanBc.findFirstMatchIn(v).foreach { m =>
      // German "v" (vor Christus) is human BCE numbering too: N BCE -> ISO -(N-1)
      val isoY = 1 - m.group(3).toInt
      val ys = if (isoY == 0) "0000" else f"-${-isoY}%04d"
      v = if (m.group(1) != null) s"$ys-${m.group(2)}-${m.group(1)}" else ys
    }
    if (sixDigit.matches(v)) v = s"${v.substring(0, 4)}-${v.substring(4)}"
    // BCE suffix form uses human year numbering (no year zero), while ISO is
    // astronomical (year 0 = 1 BCE) — same convention the century path uses,
    // so "1000 BC" and "10th century BCE" agree: year N BCE -> ISO -(N-1).
    bceSuffix.findFirstMatchIn(v).foreach { m =>
      val isoY = 1 - m.group(1).trim.toInt
      v = if (isoY == 0) "0000" else f"-${-isoY}%04d"
    }

    val effPrec: String => Char = inferred =>
      if (precision.nonEmpty) precision.head else inferred.head

    v match {
      case century(n, bce) =>
        val c = n.toInt
        // Nth century CE: years (N-1)*100 .. (N-1)*100+99;
        // Nth century BCE: years N*100..(N-1)*100+1 BCE -> ISO 1-N*100 .. -(N-1)*100
        if (bce != null) Some(rangeYears(1 - c * 100, -((c - 1) * 100)))
        else Some(rangeYears((c - 1) * 100, (c - 1) * 100 + 99))
      case centuryRange(a, b) =>
        Some(rangeYears((a.toInt - 1) * 100, (b.toInt - 1) * 100 + 99))
      case masked(sign, digits, xs) =>
        // EDTF masked year: the X run is the unknown span, so "1XX" is the
        // 3-digit range 100-199, not 1000-1999.
        val missing = xs.length
        val lo = (digits + "0" * missing).toInt
        val hi = (digits + "9" * missing).toInt
        if (sign == "-") Some(rangeYears(-hi, -lo)) else Some(rangeYears(lo, hi))
      case approxYear(y) =>
        val yr = y.toInt
        Some(rangeYears(yr - 1, yr + 1))
      case yearRange(a, b) if a.toInt <= b.toInt && a.length == 4 =>
        Some(rangeYears(a.toInt, b.toInt))
      case isoLike(sign, y, mo, d, h, mi, s) =>
        if (y.toInt > 4500 && sign.isEmpty) {
          // Hebrew-calendar year (mapper_utils.py:200-211, :488-492):
          // convert the y-m-d through the calendar arithmetic — time of
          // day drops to midnight, precision is kept
          val inferred: Char =
            if (s != null) 's' else if (mi != null) 'm' else if (h != null) 'h'
            else if (d != null) 'D' else if (mo != null) 'M' else 'Y'
          Hebrew.toRataDie(y.toInt, if (mo != null) mo.toInt else 1,
              if (d != null) d.toInt else 1)
            .map { rd =>
              val (gy, gm, gd) = Hebrew.gregorianOf(rd)
              range(LocalDateTime.of(gy, gm, gd, 0, 0, 0),
                if (precision.nonEmpty) precision.head else inferred)
            }
        }
        else parseIso(sign, y, mo, d, h, mi, s).map { case (begin, inferred) =>
          range(begin, if (precision.nonEmpty) precision.head else inferred)
        }
      case monthYear(mn, y) if monthNames.contains(mn.toLowerCase(java.util.Locale.ROOT).take(3)) &&
          monthNames.contains(mn.toLowerCase(java.util.Locale.ROOT)) || monthNames.contains(mn.toLowerCase(java.util.Locale.ROOT).take(3)) =>
        monthNames.get(mn.toLowerCase(java.util.Locale.ROOT)).orElse(monthNames.get(mn.toLowerCase(java.util.Locale.ROOT).take(3)))
          .flatMap(m => try Some(range(LocalDateTime.of(y.toInt, m, 1, 0, 0, 0),
            effPrec("M"))) catch { case _: Exception => None })
      case dayMonthYear(d, mn, y) =>
        monthNames.get(mn.toLowerCase(java.util.Locale.ROOT)).orElse(monthNames.get(mn.toLowerCase(java.util.Locale.ROOT).take(3)))
          .flatMap(m => try Some(range(LocalDateTime.of(y.toInt, m, d.toInt, 0, 0, 0),
            effPrec("D"))) catch { case _: Exception => None })
      case monthDayYear(mn, d, y) =>
        monthNames.get(mn.toLowerCase(java.util.Locale.ROOT)).orElse(monthNames.get(mn.toLowerCase(java.util.Locale.ROOT).take(3)))
          .flatMap(m => try Some(range(LocalDateTime.of(y.toInt, m, d.toInt, 0, 0, 0),
            effPrec("D"))) catch { case _: Exception => None })
      case numericDmy(a, b, y) =>
        // day-first when unambiguous, else month-first
        val (dd, mm) = if (a.toInt > 12) (a.toInt, b.toInt) else (b.toInt, a.toInt)
        try Some(range(LocalDateTime.of(y.toInt, mm, dd, 0, 0, 0), effPrec("D")))
        catch { case _: Exception => None }
      case numericYmd(y, m, d) =>
        try Some(range(LocalDateTime.of(y.toInt, m.toInt, d.toInt, 0, 0, 0), effPrec("D")))
        catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Wikidata wrapper: `+YYYY-MM-DDT00:00:00Z` + numeric precision
    * (11=day, 10=month, 9=year; <9 decade/century/millennium -> None). */
  def makeDatetimeWikidata(time: String, precision: Int): Option[DateRange] = {
    if (precision < 9) return None
    var t = if (time.startsWith("+")) time.substring(1) else time
    if (t.endsWith("Z")) t = t.dropRight(1)
    // unknown month/day encoded as -00: clamp to -01 (not the sign digit)
    if (t.length > 1) t = s"${t.charAt(0)}${t.substring(1).replace("-00", "-01")}"
    val neg = t.startsWith("-")
    val body = if (neg) t.substring(1) else t
    val parts = body.split("[-T]")
    val precChar = precision match { case 9 => "Y" case 10 => "M" case _ => "D" }
    // malformed time strings would otherwise index past the split
    // (totality — the fuzz battery's finds, not reachable from the
    // wikidata mapper's well-formed +Y-M-DT…Z inputs but total is
    // total): a body of only separator chars ("-", "T") splits to an
    // EMPTY array, and month precision needs a month component
    if (parts.isEmpty) return None
    if (precision == 10 && parts.length < 2) return None
    val trimmed = precision match {
      case 9 => parts(0)
      case 10 => s"${parts(0)}-${parts(1)}"
      case _ =>
        val dayParts = body.split("T")
        if (dayParts.isEmpty) return None
        dayParts(0)
    }
    makeDatetime((if (neg) "-" else "") + trimmed, precChar)
  }

  /** F12: BCE-safe epoch seconds from an ISO string (proleptic Gregorian,
    * int64 — the reference needed numpy for the same reason). */
  def epochSeconds(iso: String): Option[Long] = iso match {
    case isoLike(sign, y, mo, d, h, mi, s) =>
      try {
        val year = y.toInt * (if (sign == "-") -1 else 1)
        Some(LocalDateTime.of(year,
          if (mo != null) mo.toInt else 1, if (d != null) d.toInt else 1,
          if (h != null) h.toInt else 0, if (mi != null) mi.toInt else 0,
          if (s != null) s.toInt else 0).toEpochSecond(java.time.ZoneOffset.UTC))
      } catch { case _: Exception => None }
    case _ => None
  }

  /** F5: BCE-aware year extraction from a timespan begin string. */
  def yearOf(iso: String): Option[Int] = {
    if (iso == null || iso.isEmpty) None
    else if (iso.startsWith("-"))
      iso.substring(1).split("[-T]").headOption.flatMap(y =>
        y.toIntOption.map(i => -i))
    else iso.split("[-T]").headOption.flatMap(_.toIntOption)
  }

  private val maxLifeSeconds: Long = 122L * 365 * 24 * 3600 + 30 * 24 * 3600

  /** F4: birth/death sanity — die after born, live at most ~122 years. */
  def plausibleLifespan(bornBegin: String, diedEnd: String): Boolean =
    (epochSeconds(bornBegin), epochSeconds(diedEnd)) match {
      case (Some(b), Some(d)) => d >= b && (d - b) <= maxLifeSeconds
      case _ => true // missing data never disqualifies
    }
}
