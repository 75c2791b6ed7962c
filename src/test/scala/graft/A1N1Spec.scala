package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.helpers.A1N1._

/** Mirrors reference tests/helpers_test.py value-for-value. */
class A1N1Spec extends AnyFunSuite {

  test("col2num") {
    assert(col2num("A") == 0)
    assert(col2num("Z") == 25)
    assert(col2num("AA") == 26)
  }

  test("num2col") {
    assert(num2col(1) == "A")
    assert(num2col(26) == "Z")
    assert(num2col(27) == "AA")
  }

  test("cell2coords") {
    assert(cell2coords("A1") == (Some(0), Some(0)))
    assert(cell2coords("AA5") == (Some(26), Some(4)))
    assert(cell2coords("Z26") == (Some(25), Some(25)))
    assert(cell2coords("A") == (Some(0), None))
    assert(cell2coords("AA") == (Some(26), None))
    assert(cell2coords("1") == (None, Some(0)))
    val e = intercept[IllegalArgumentException](cell2coords("1A"))
    assert(e.getMessage == "Could not parse range 1A")
  }

  test("range2tab") {
    assert(range2tab("A1:A") == (0, 0, Some(0), None))
    assert(range2tab("A1:A5") == (0, 0, Some(0), Some(4)))
    assert(range2tab("A1:B") == (0, 0, Some(1), None))
    assert(range2tab("A1:B5") == (0, 0, Some(1), Some(4)))
    assert(range2tab("A1:*") == (0, 0, None, None))
    assert(intercept[IllegalArgumentException](range2tab("*:A"))
      .getMessage == "Could not parse range *")
    assert(intercept[IllegalArgumentException](range2tab("AB"))
      .getMessage == "Could not parse range AB")
    assert(intercept[IllegalArgumentException](range2tab("A:B:C"))
      .getMessage == "Could not parse range A:B:C")
    assert(intercept[IllegalArgumentException](range2tab("A:*"))
      .getMessage == "Could not parse range A:*")
    assert(intercept[IllegalArgumentException](range2tab("1:*"))
      .getMessage == "Could not parse range 1:*")
  }
}
