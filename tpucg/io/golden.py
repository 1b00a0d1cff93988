"""The reference's shipped golden SPD systems, as hand-checkable constants.

Values transcribed from the reference's data files (SURVEY.md §4.1):
- 2x2: ``matrixA.txt`` / ``vectorb.txt`` / ``initialguess.txt`` —
  [[2,-1],[-1,2]] x = [1,0], x0 = 0, exact solution [2/3, 1/3]; float32 CG at
  tol 1e-6 converges in 2 iterations (``point-to-point.c`` is the whole
  reference program compiled at ROWS=4 just to run systems this size).
- 4x4: ``matrixA1.txt`` / ``vectorb1.txt`` / ``X0.txt`` — eigs ~0.85..11.66,
  b = [-1,0,-3,1], x0 = 0, exact solution [-1,1,-1,1]; 4 iterations.

These are math facts, not copied code: they exist so `tpucg selftest` and the
test suite can validate any install without the reference repo present.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

GOLDEN_2X2: Dict[str, np.ndarray] = dict(
    A=np.array([[2.0, -1.0], [-1.0, 2.0]], np.float32),
    b=np.array([1.0, 0.0], np.float32),
    x0=np.zeros(2, np.float32),
    x_star=np.array([2.0 / 3.0, 1.0 / 3.0], np.float32),
    iters=2,
)

GOLDEN_4X4: Dict[str, np.ndarray] = dict(
    A=np.array(
        [
            [7.0, 3.0, -1.0, 2.0],
            [3.0, 8.0, 1.0, -4.0],
            [-1.0, 1.0, 4.0, -1.0],
            [2.0, -4.0, -1.0, 6.0],
        ],
        np.float32,
    ),
    b=np.array([-1.0, 0.0, -3.0, 1.0], np.float32),
    x0=np.zeros(4, np.float32),
    x_star=np.array([-1.0, 1.0, -1.0, 1.0], np.float32),
    iters=4,
)
