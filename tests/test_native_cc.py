"""Native C++ connected-components vs scipy oracle."""

import numpy as np
import pytest
from scipy import ndimage as ndi

native_cc = pytest.importorskip("saber_tpu.native.cc")


def _partitions_equal(a, b):
    """Same partition up to label permutation."""
    assert (a > 0).sum() == (b > 0).sum()
    mapping = {}
    for la, lb in zip(a.ravel(), b.ravel()):
        if la == 0:
            assert lb == 0
            continue
        if la in mapping:
            assert mapping[la] == lb
        else:
            assert lb not in mapping.values()
            mapping[la] = lb


@pytest.mark.parametrize("conn", [1, 2])
def test_2d_matches_scipy(rng, conn):
    m = rng.random((80, 95)) > 0.65
    got, ngot = native_cc.label(m, conn)
    want, nwant = ndi.label(m, ndi.generate_binary_structure(2, conn))
    assert ngot == nwant
    _partitions_equal(got, want)


@pytest.mark.parametrize("conn", [1, 2, 3])
def test_3d_matches_scipy(rng, conn):
    m = rng.random((24, 30, 28)) > 0.7
    got, ngot = native_cc.label(m, conn)
    want, nwant = ndi.label(m, ndi.generate_binary_structure(3, conn))
    assert ngot == nwant
    _partitions_equal(got, want)


def test_empty_and_full():
    assert native_cc.label(np.zeros((5, 5), bool))[1] == 0
    lab, n = native_cc.label(np.ones((5, 5, 5), bool))
    assert n == 1 and lab.max() == 1


def test_dispatch_through_ops_layer(rng):
    """ops.connected.label uses the native kernel when available."""
    from saber_tpu.ops.connected import label as ops_label
    m = rng.random((40, 40)) > 0.6
    got, n = ops_label(m, connectivity=2)
    want, nw = ndi.label(m, ndi.generate_binary_structure(2, 2))
    assert n == nw
    _partitions_equal(np.asarray(got), want)


def test_speed_parity_large(rng):
    """Native kernel is at least competitive with scipy on a big volume.

    Best-of-3 each and a loose bound: this is a sanity check against a
    10×-class regression, not a benchmark — single-shot timings on a
    contended CI host have shown >4× jitter (hence 3 samples per side:
    one clean run apiece suffices under any pathological schedule).
    """
    import time
    m = rng.random((128, 256, 256)) > 0.6

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best_of(lambda: native_cc.label(m, 3))
    t_scipy = best_of(
        lambda: ndi.label(m, ndi.generate_binary_structure(3, 3)))
    assert t_native < t_scipy * 5  # sanity bound, not a strict benchmark
