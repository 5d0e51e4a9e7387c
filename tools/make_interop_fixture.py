"""Generate tests/golden/pandas_fixed_interop.h5 with REAL pandas/PyTables.

Run this on a machine where the `tables` package is installed and commit the
output; tests/test_io.py::test_pandas_fixed_fixture_loads then verifies that
coolpuppy_tpu's raw-h5py fixed-format codec (io/pandas_hdf.py) reads genuine
pandas `to_hdf` bytes — closing the interop gap that the environment this
repo is developed in cannot close (no PyTables available there). The frame
below must stay in sync with the expectations in that test.
"""

import os

import numpy as np
import pandas as pd


def main():
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "pandas_fixed_interop.h5",
    )
    df = pd.DataFrame(
        {
            "group": ["++", "--", "all"],
            "n": np.array([3, 5, 8], dtype=np.int64),
            "score": np.array([0.25, -1.5, 2.0]),
            "flag": [True, False, True],
        }
    )
    df.to_hdf(out, key="annotation", mode="w")  # fixed format, like lib/io.py
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
