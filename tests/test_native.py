"""Native C++ host library vs numpy fallback equivalence."""

import numpy as np
import pytest

from dist_gnn_tpu.utils import native


@pytest.mark.skipif(not native.available(), reason="libdistgnn_host.so not built")
def test_build_csc_matches_numpy():
    rng = np.random.default_rng(0)
    n, e = 500, 5000
    dst = rng.integers(0, n, e).astype(np.int32)
    src = rng.integers(0, n, e).astype(np.int32)
    probs = rng.random(e).astype(np.float32)
    indptr, indices, out_probs = native.build_csc(dst, src, n, probs)
    # numpy oracle
    counts = np.bincount(dst, minlength=n)
    ref_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=ref_indptr[1:])
    np.testing.assert_array_equal(indptr.astype(np.int64), ref_indptr)
    # per-row multisets must match (order within a row is unspecified)
    order = np.argsort(dst, kind="stable")
    ref_indices = src[order]
    ref_probs = probs[order]
    for r in range(n):
        lo, hi = ref_indptr[r], ref_indptr[r + 1]
        assert sorted(indices[lo:hi].tolist()) == sorted(ref_indices[lo:hi].tolist())
        np.testing.assert_allclose(
            np.sort(out_probs[lo:hi]), np.sort(ref_probs[lo:hi])
        )


@pytest.mark.skipif(not native.available(), reason="libdistgnn_host.so not built")
def test_extract_subcsc():
    rng = np.random.default_rng(1)
    n, e = 200, 3000
    dst = rng.integers(0, n, e).astype(np.int32)
    src = rng.integers(0, n, e).astype(np.int32)
    indptr, indices, _ = native.build_csc(dst, src, n, None)
    cache = rng.choice(n, 50, replace=False).astype(np.int32)
    sub_indptr, sub_indices, _ = native.extract_subcsc(cache, indptr, indices)
    indptr64 = indptr.astype(np.int64)
    for i, nid in enumerate(cache):
        np.testing.assert_array_equal(
            sub_indices[sub_indptr[i] : sub_indptr[i + 1]],
            indices[indptr64[nid] : indptr64[nid + 1]],
        )
