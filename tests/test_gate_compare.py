"""Pin tools/run_gate.py's compare to the driver's strict semantics.

The r6 driver rejected three gates whose oracle emitted float64 where
Spark emitted bigint (1771.0 vs 1771); the selfcheck's old lenient
``av == bv`` fallback accepted them. These tests reproduce that exact
failure mode so the compare can never silently re-loosen.
"""

import math
import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_gate import compare


def test_cross_dtype_int_vs_float_fails():
    # the r6 HUGEINT->float64 oracle shape: values equal, dtypes not
    spark = pd.DataFrame({"k": ["a", "b"], "n": [1771, 5]})
    duck = pd.DataFrame({"k": ["a", "b"], "n": [1771.0, 5.0]})
    assert compare("t", spark, duck), "1 vs 1.0 must FAIL like the driver hash"


def test_same_dtype_passes():
    spark = pd.DataFrame({"k": ["a", "b"], "n": [1771, 5]})
    duck = pd.DataFrame({"n": [5, 1771], "k": ["b", "a"]})  # order/col-order free
    assert compare("t", spark, duck) == []


def test_nan_equals_nan():
    spark = pd.DataFrame({"v": [1.5, float("nan")]})
    duck = pd.DataFrame({"v": [float("nan"), 1.5]})
    assert compare("t", spark, duck) == []


def test_none_equals_none_object_col():
    spark = pd.DataFrame({"v": pd.Series(["x", None], dtype=object)})
    duck = pd.DataFrame({"v": pd.Series([None, "x"], dtype=object)})
    assert compare("t", spark, duck) == []


def test_value_mismatch_fails():
    spark = pd.DataFrame({"v": [1, 2]})
    duck = pd.DataFrame({"v": [1, 3]})
    assert compare("t", spark, duck)
