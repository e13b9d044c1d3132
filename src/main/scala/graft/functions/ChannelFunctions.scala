package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions reproducing the reference's projections —
  * pure `Column → Column` (whole-stage-codegen'd built-ins, no UDFs).
  *
  * P1 linear rescale: `src/receiver/main.cpp:68-71` — Arduino integer
  * `map(x, 1000,2000 → 172,1811)`: linear interpolation with TRUNCATING
  * integer division; out-of-range inputs extrapolate (0 → −1467).
  *
  * P2 MAC format: `lib/TargetManager/TargetManager.h:202-208` —
  * `"%02X:%02X:%02X:%02X:%02X:%02X"` colon-hex.
  *
  * P3 derived remaining-TTL: `lib/TargetManager/TargetManager.h:169-178` —
  * `max(0, override_timeout - now)` converted to ms, computed at
  * serialization time.
  */
object ChannelFunctions {

  /** P1: SBUS linear rescale, exact integer semantics of Arduino `map`:
    * out = outLo + (x - inLo) * (outHi - outLo) div (inHi - inLo), with
    * `div` truncating toward zero (matches C++ and DuckDB `//`).
    * Canonical instance: map(x, 1000, 2000, 172, 1811). */
  def linearRescale(x: Column, inLo: Int, inHi: Int, outLo: Int, outHi: Int): Column = {
    // Truncating integer division via double divide + cast-to-long (casts
    // truncate toward zero, matching C++ `/` and DuckDB `//`; numerator is
    // far below 2^53 so the divide is exact where it matters).
    val num = (x.cast("long") - inLo) * (outHi - outLo)
    (lit(outLo) + (num.cast("double") / (inHi - inLo)).cast("long")).cast("int")
  }

  /** P1 canonical SBUS mapping 1000–2000 µs → 172–1811. */
  def sbusRescale(x: Column): Column = linearRescale(x, 1000, 2000, 172, 1811)

  /** P2: render a 48-bit integer as an upper-case colon-hex MAC string.
    * The engine derives synthetic stable MACs from keys (the reference
    * hard-codes 8 peer MACs, `src/transmitter/main.cpp:42-49`). */
  def macFormat(key: Column): Column = {
    // Knuth multiplicative hash over the low 24 bits of the key: the
    // pre-multiply mask keeps the product ≤ 2^56, so the function is
    // total over the full long domain (no ANSI overflow, and the DuckDB
    // twin computes the identical value instead of raising out-of-range).
    val h = (key.cast("long") bitwiseAND lit(0xFFFFFFL)) * lit(2654435761L)
    val bytes = (5 to 0 by -1).map(i => shiftright(h, 8 * i) bitwiseAND lit(255L))
    format_string("%02X:%02X:%02X:%02X:%02X:%02X", bytes: _*)
  }

  /** P3: remaining override TTL in ms at snapshot time `nowMs`, floored at
    * zero (`TargetManager.h:169-178`). */
  def overrideRemainingMs(deadlineMs: Column, nowMs: Column): Column =
    greatest(lit(0L), deadlineMs - nowMs)

  /** ST2: per-element sentinel merge — take `incoming` unless it is the
    * `-1` skip sentinel, else keep `current`
    * (`src/transmitter/main.cpp:199-212`). Scalar form. */
  def sentinelMerge(incoming: Column, current: Column): Column =
    coalesce(nullif(incoming, lit(-1)), current)

  /** ST2 array form: merge two fixed-width channel arrays element-wise
    * (atomic variant — the reference's partial application on invalid
    * later elements is documented as a deviation, SURVEY.md §4.3.3). */
  def sentinelMergeArray(incoming: Column, current: Column): Column =
    zip_with(incoming, current, (n, o) => coalesce(nullif(n, lit(-1)), o))
}
