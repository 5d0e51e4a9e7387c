"""Parse the reference's own golden output files (tests/loop_ref.np.txt etc.)
with our yaml-free legacy loader — the on-disk formats must interoperate.
(The binary .cool inputs behind these matrices are absent from the reference
snapshot, so numerical reproduction is covered by synthetic oracles instead.)
"""

import os

import numpy as np
import pytest

from coolpuppy_tpu.io import load_array_with_header

REF = "/root/reference/tests"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_load_reference_loop_golden():
    meta = load_array_with_header(os.path.join(REF, "loop_ref.np.txt"))
    assert meta["data"].shape == (21, 21)
    assert meta["coverage_norm"] is True
    assert meta["nshifts"] == 10
    assert meta["pad"] == 100  # v0.9-era header: pad in kb
    assert meta["expected"] is None
    assert np.isfinite(meta["data"]).all()


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_load_reference_tad_golden():
    meta = load_array_with_header(os.path.join(REF, "tad_ref.np.txt"))
    assert meta["data"].shape == (99, 99)
    assert meta["rescale"] is True
    assert meta["local"] is True


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_load_reference_bed2_golden():
    meta = load_array_with_header(os.path.join(REF, "bed2_ref.np.txt"))
    assert meta["data"].shape == (21, 21)
