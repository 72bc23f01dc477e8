package graft

import org.scalatest.funsuite.AnyFunSuite

/** The throughput-floor gate's logic, tripped synthetically (r18
  * verdict item 3: "floors armed … a synthetic-slowdown test proving
  * the gate trips"): the full rate run is a multi-minute sf1 drill, so
  * the gate decision is factored pure and drilled here, and the main's
  * exit-1 path reduces to `floorViolations.nonEmpty`.
  */
class GauntletRateSpec extends AnyFunSuite {

  test("floors are ARMED by default at the conservative clean-window bars") {
    assert(GauntletRate.parseFloors(None) === GauntletRate.DefaultFloors)
    assert(GauntletRate.DefaultFloors("st8") === 60000.0)
    assert(GauntletRate.DefaultFloors("st24") === 1500.0)
  }

  test("knob forms: bare number = both frames, per-frame pairs, 0 disarms") {
    assert(GauntletRate.parseFloors(Some("5000")) ===
      Map("st8" -> 5000.0, "st24" -> 5000.0))
    assert(GauntletRate.parseFloors(Some("st8=70000,st24=2000")) ===
      Map("st8" -> 70000.0, "st24" -> 2000.0))
    assert(GauntletRate.parseFloors(Some("0")) === Map.empty)
    assert(GauntletRate.parseFloors(Some("")) === GauntletRate.DefaultFloors)
  }

  test("synthetic slowdown trips the gate; clean-window rates pass it") {
    val clean = Map("st8" -> 120200.0, "st24" -> 2900.0) // r18 measured
    assert(GauntletRate.floorViolations(clean, GauntletRate.DefaultFloors).isEmpty)
    // a 10x regression on either frame must trip, naming the frame
    val st8Slow = GauntletRate.floorViolations(
      clean.updated("st8", 12020.0), GauntletRate.DefaultFloors)
    assert(st8Slow.size === 1 && st8Slow.head.startsWith("st8:"), st8Slow)
    val st24Slow = GauntletRate.floorViolations(
      clean.updated("st24", 290.0), GauntletRate.DefaultFloors)
    assert(st24Slow.size === 1 && st24Slow.head.startsWith("st24:"), st24Slow)
    // even the r18 SLOW-WINDOW take (67.5k / 1.63k) clears the halved
    // floors — the bars guard regressions, not host windows
    val slowWindow = Map("st8" -> 67500.0, "st24" -> 1630.0)
    assert(GauntletRate.floorViolations(slowWindow, GauntletRate.DefaultFloors).isEmpty)
    // disarmed floors never trip
    assert(GauntletRate.floorViolations(
      Map("st8" -> 1.0, "st24" -> 1.0), Map.empty).isEmpty)
  }
}
