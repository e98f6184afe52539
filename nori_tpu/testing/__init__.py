"""Statistical verification harness (reference layer L8, SURVEY.md §4).

The reference has no unit-test framework; correctness is enforced by
chi^2 tests on sampling routines (src/chi2test.cpp, src/warptest.cpp)
and Student's t-tests on estimator means (src/ttest.cpp), both built on
wjakob's `hypothesis` helpers (vendored submodule, absent from the
snapshot — reimplemented here from its call contract).

This package provides:
  * hypothesis — chi2_test / students_t_test / cell integration
  * chi2 plugin ("<test type=chi2test>") and ttest plugin
    ("<test type=ttest>") runnable from scene XMLs
  * warp test helpers used by tests/test_warp.py (warptest CLI parity)
"""

from nori_tpu.testing import chi2 as _chi2  # noqa: F401
from nori_tpu.testing import ttest as _ttest  # noqa: F401
