"""Native C++ projection core: exact parity with the numpy path."""

import time

import numpy as np
import pytest

from rangeldm_tpu.geometry import get_spec, range_image_np
from rangeldm_tpu import native
from conftest import synthetic_scan

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("sensor", ["kitti360", "kitti360_vanilla"])
def test_native_matches_numpy(rng, sensor):
    spec = get_spec(sensor)
    pc = synthetic_scan(rng, n=30000)
    img_n, mask_n, cw_n = native.range_image_native(pc, spec)
    img_p, mask_p, cw_p = range_image_np(pc, spec)
    np.testing.assert_allclose(img_n, img_p, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(mask_n, mask_p)
    np.testing.assert_array_equal(cw_n, cw_p)


def test_native_ring_mode(rng):
    spec = get_spec("nuscenes")
    pc = synthetic_scan(rng, n=10000, n_beams=32, with_ring=True)
    img_n, _, _ = native.range_image_native(pc, spec)
    img_p, _, _ = range_image_np(pc, spec)
    np.testing.assert_allclose(img_n, img_p, rtol=1e-5, atol=1e-5)


def test_native_log_encoding(rng):
    spec = get_spec("kitti360", log=True)
    pc = synthetic_scan(rng, n=10000)
    img_n, _, _ = native.range_image_native(pc, spec)
    img_p, _, _ = range_image_np(pc, spec)
    np.testing.assert_allclose(img_n, img_p, rtol=1e-5, atol=1e-5)


def test_native_faster_than_numpy(rng):
    spec = get_spec("kitti360")
    pc = synthetic_scan(rng, n=120000)
    native.range_image_native(pc, spec)  # warm
    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best_of(lambda: native.range_image_native(pc, spec))
    t_numpy = best_of(lambda: range_image_np(pc, spec))
    # typically 5-20x; leave headroom for loaded CI machines
    assert t_native < t_numpy, (t_native, t_numpy)


def test_native_tie_break_matches_numpy(rng):
    """Equal-range duplicate returns in one pixel: the numpy path's stable
    descending sort writes the largest original index last (it wins); the
    native scatter must agree or cached datasets differ across machines."""
    spec = get_spec("kitti360")
    base = synthetic_scan(rng, n=2000)
    # duplicate every point with a different intensity (same xyz -> same
    # pixel, same range); the later copy must win in both paths
    dup = base.copy()
    dup[:, 3] = base[:, 3] + 0.25
    pc = np.concatenate([base, dup])
    img_n, _, _ = native.range_image_native(pc, spec)
    img_p, _, _ = range_image_np(pc, spec)
    np.testing.assert_allclose(img_n, img_p, rtol=1e-5, atol=1e-5)


def test_native_rounding_parity_at_scale(rng):
    """np.round is half-to-EVEN; the C++ core must round the same way
    (std::nearbyint, not lround's half-away-from-zero) — at 200k points a
    handful land on exact .5 column/row fractions and used to bin into
    the neighbouring pixel (2/200k mismatches). Also covers the widened
    kitti beam-search window."""
    from rangeldm_tpu import native
    from rangeldm_tpu.geometry import get_spec, range_image_np
    pc = synthetic_scan(rng, n=200000)
    spec = get_spec("kitti360")
    img_n, mask_n, cw_n = range_image_np(pc, spec)
    img_c, mask_c, cw_c = native.range_image_native(pc, spec)
    np.testing.assert_array_equal(mask_n, mask_c)
    np.testing.assert_array_equal(img_n, img_c)
    np.testing.assert_array_equal(cw_n, cw_c)


def test_native_rejects_xyz_only_clouds(rng):
    """An (N, 3) cloud must raise like the numpy path does — the C++ core
    would otherwise read the next point's x as intensity (and one float
    past the buffer for the last point)."""
    from rangeldm_tpu import native
    from rangeldm_tpu.geometry import get_spec
    pc = synthetic_scan(rng, n=1000)[:, :3].copy()
    with pytest.raises(ValueError, match="4-column"):
        native.range_image_native(pc, get_spec("kitti360"))
