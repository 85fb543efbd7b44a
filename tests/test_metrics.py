"""Metrics tests: histogram conventions, MMD/JSD golden values vs direct
numpy math, FRD Frechet identities, MAE baselines, RangeNet structure."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rangeldm_tpu.metrics.histogram import (
    point_cloud_to_histogram, kitti_histogram, histogram_batch_jax,
)
from rangeldm_tpu.metrics.mmd import compute_mmd
from rangeldm_tpu.metrics.jsd import compute_jsd, jsd_2d
from rangeldm_tpu.metrics.frd import (
    compute_frd, frechet_distance, frd_indices, features_to_activations,
)
from rangeldm_tpu.metrics.mae import (
    densification_mae, inpainting_mae, segmentation_iou,
    segmentation_accuracy,
)


def test_histogram_matches_numpy_histogramdd(rng):
    pc = rng.uniform(-90, 90, (5000, 3)).astype(np.float32)
    h = point_cloud_to_histogram(pc)
    expect, _ = np.histogramdd(pc[:, :2], bins=100,
                               range=([-80, 80], [-80, 80]))
    np.testing.assert_array_equal(h, expect)
    assert h.sum() <= 5000


def test_histogram_jax_matches_host(rng):
    pc = rng.uniform(-90, 90, (2, 4000, 2)).astype(np.float32)
    mask = np.ones((2, 4000), bool)
    hj = np.asarray(histogram_batch_jax(jnp.asarray(pc), jnp.asarray(mask)))
    for b in range(2):
        expect, _ = np.histogramdd(pc[b], bins=100,
                                   range=([-80, 80], [-80, 80]))
        np.testing.assert_array_equal(hj[b], expect)


def test_kitti_histogram_depth_mask(rng):
    pc = np.array([[1, 0, 0], [10, 0, 0], [70.5, 0, 0]], np.float32)
    h = kitti_histogram(pc)
    assert h.sum() == 1  # only the 10 m point survives 3-70 m


def test_mmd_golden_small():
    """MMD vs a direct O(N^2) numpy evaluation with the reference kernel."""
    rng = np.random.default_rng(0)
    A = [rng.random((10, 10)) for _ in range(4)]
    B = [rng.random((10, 10)) for _ in range(5)]
    got = compute_mmd(A, B)

    def gaussian(x, y, sigma=0.5):
        d = np.linalg.norm(x / x.sum() - y / y.sum())
        return np.exp(-d * d / (2 * sigma * sigma))

    def disc(S1, S2):
        return np.mean([[gaussian(a, b) for b in S2] for a in S1])

    expect = disc(A, A) + disc(B, B) - 2 * disc(A, B)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_mmd_identical_sets_zero():
    rng = np.random.default_rng(1)
    A = [rng.random((10, 10)) for _ in range(6)]
    assert abs(compute_mmd(A, list(A))) < 1e-6


def test_jsd_golden():
    from scipy.spatial.distance import jensenshannon
    rng = np.random.default_rng(2)
    p = rng.random(100)
    q = rng.random(100)
    np.testing.assert_allclose(jsd_2d(p, q),
                               jensenshannon(p / p.sum(), q / q.sum()),
                               rtol=1e-8)
    A = [rng.random((10, 10)) for _ in range(3)]
    B = [rng.random((10, 10)) for _ in range(3)]
    got = compute_jsd(A, B)
    expect = jensenshannon(np.sum(A, 0).ravel() / np.sum(A),
                           np.sum(B, 0).ravel() / np.sum(B))
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_frechet_identities():
    rng = np.random.default_rng(3)
    mu = rng.random(8)
    a = rng.random((32, 8))
    sigma = np.cov(a, rowvar=False)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    mu2 = mu + 1.0
    d = frechet_distance(mu, sigma, mu2, sigma)
    np.testing.assert_allclose(d, 8.0, rtol=1e-6)  # ||mu1-mu2||^2


def test_frd_indices_deterministic():
    i1, i2 = frd_indices(), frd_indices()
    np.testing.assert_array_equal(i1, i2)
    assert len(np.unique(i1)) == 4096


def test_frd_feature_ordering(rng):
    """NHWC -> torch-CHW flattening must match for index parity."""
    f = rng.standard_normal((1, 4, 6, 3)).astype(np.float32)
    idx = np.array([0, 1, 24, 47])
    act = features_to_activations(f, idx)
    chw = f[0].transpose(2, 0, 1).ravel()
    np.testing.assert_array_equal(act[0], chw[idx])


def test_compute_frd_runs(rng):
    fa = rng.standard_normal((20, 4, 8, 2)).astype(np.float32)
    fb = fa + 0.5
    d = compute_frd(fa, fb, n_dims=16)
    assert d > 0 and np.isfinite(d)


def test_densification_mae(rng):
    target = rng.uniform(0.1, 0.9, (2, 16, 32)).astype(np.float32)
    res = target.copy()
    out = densification_mae(res, target)
    assert out["mae"] == 0.0
    assert out["mae_nearest"] > 0.0
    assert out["mae_bicubic"] > 0.0


def test_inpainting_mae():
    t = np.zeros((1, 8, 128), np.float32)
    r = t.copy()
    r[:, :, :64] += np.log2(2.0) / 6  # decoded delta = 1 everywhere masked
    v = inpainting_mae(r, t, masked_columns=64)
    # sum |2^(v*6)-1 - 0| over 8*64 = 512 px / (8*128)
    np.testing.assert_allclose(v, 0.5, rtol=1e-5)


def test_iou_and_accuracy():
    gt = np.array([0, 0, 1, 1, 2, 2])
    pr = np.array([0, 1, 1, 1, 2, 0])
    acc = segmentation_accuracy(pr, gt)
    np.testing.assert_allclose(acc, 4 / 6)
    from sklearn.metrics import jaccard_score
    np.testing.assert_allclose(segmentation_iou(pr, gt),
                               jaccard_score(gt, pr, average="weighted"),
                               rtol=1e-8)


def test_rangenet_structure(rng):
    from rangeldm_tpu.metrics.rangenet import RangeNet
    m = RangeNet(with_head=True)
    x = jnp.zeros((1, 16, 64, 5))
    vs = m.init(jax.random.PRNGKey(0), x)
    feats, logits = m.apply(vs, x)
    assert feats.shape == (1, 16, 64, 32)
    assert logits.shape == (1, 16, 64, 20)


def test_rangenet_converter_structure(rng):
    """Synthesize torch state dicts in the lidar-bonnetal grammar and check
    the converted tree matches RangeNet.init leaf-for-leaf."""
    from rangeldm_tpu.metrics.rangenet import (
        RangeNet, convert_rangenet_state_dict, _BLOCKS_53, _CHANNELS,
    )

    def conv_w(o, i, k):
        return rng.standard_normal((o, i, k, k)).astype(np.float32)

    bsd = {}
    bsd["conv1.weight"] = conv_w(32, 5, 3)
    for nm, c in (("bn1", 32),):
        bsd[f"{nm}.weight"] = np.ones(c, np.float32)
        bsd[f"{nm}.bias"] = np.zeros(c, np.float32)
        bsd[f"{nm}.running_mean"] = np.zeros(c, np.float32)
        bsd[f"{nm}.running_var"] = np.ones(c, np.float32)

    def bn(sd, key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)
        sd[f"{key}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{key}.running_var"] = np.ones(c, np.float32)

    cin = 32
    for stage, (nb, ch) in enumerate(zip(_BLOCKS_53, _CHANNELS[1:]), 1):
        bsd[f"enc{stage}.conv.weight"] = conv_w(ch, cin, 3)
        bn(bsd, f"enc{stage}.bn", ch)
        for b in range(nb):
            bsd[f"enc{stage}.residual_{b}.conv1.weight"] = conv_w(ch // 2, ch, 1)
            bn(bsd, f"enc{stage}.residual_{b}.bn1", ch // 2)
            bsd[f"enc{stage}.residual_{b}.conv2.weight"] = conv_w(ch, ch // 2, 3)
            bn(bsd, f"enc{stage}.residual_{b}.bn2", ch)
        cin = ch

    dsd = {}
    chans = [(1024, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
    for i, (ci, co) in enumerate(chans):
        dec = f"dec{5 - i}"
        dsd[f"{dec}.upconv.weight"] = rng.standard_normal(
            (ci, co, 1, 4)).astype(np.float32)
        dsd[f"{dec}.upconv.bias"] = np.zeros(co, np.float32)
        bn(dsd, f"{dec}.bn", co)
        # decoder BasicBlock(inplanes=co, planes=[ci, co]): 1x1 co->ci,
        # 3x3 ci->co (decoders/darknet.py:12-23, 112)
        dsd[f"{dec}.residual.conv1.weight"] = conv_w(ci, co, 1)
        bn(dsd, f"{dec}.residual.bn1", ci)
        dsd[f"{dec}.residual.conv2.weight"] = conv_w(co, ci, 3)
        bn(dsd, f"{dec}.residual.bn2", co)

    hsd = {"1.weight": conv_w(20, 32, 3), "1.bias": np.zeros(20, np.float32)}

    converted = convert_rangenet_state_dict(bsd, dsd, hsd)
    m = RangeNet(with_head=True)
    ref = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 5)))
    shapes = lambda t: jax.tree.map(lambda x: tuple(x.shape), t)  # noqa: E731
    assert shapes(ref["params"]) == shapes(converted["params"])
    assert shapes(ref["batch_stats"]) == shapes(converted["batch_stats"])
    feats, logits = m.apply(converted, jnp.zeros((1, 8, 32, 5)))
    assert np.isfinite(np.asarray(feats)).all()


def test_profiling_helpers(tmp_path):
    from rangeldm_tpu.utils.profiling import (
        device_memory_stats, maybe_trace, step_annotation,
    )
    with maybe_trace(None, enabled=False):
        pass
    with step_annotation("unit-test"):
        _ = jnp.ones((4,)) + 1
    stats = device_memory_stats()
    assert isinstance(stats, dict)


@pytest.mark.heavy
def test_frd_pipeline_end_to_end(rng):
    """LaserScan projection -> RangeNet (random weights) -> seed-0 Frechet:
    identical scan sets give FRD ~0; disjoint sets give FRD > 0."""
    from conftest import synthetic_scan
    from rangeldm_tpu.metrics.frd import compute_frd
    from rangeldm_tpu.metrics.frd_pipeline import extract_features
    from rangeldm_tpu.metrics.rangenet import RangeNet

    model = RangeNet(with_head=False)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 5)))

    set_a = [synthetic_scan(rng, n=2000) for _ in range(6)]
    set_b = [s + np.array([5.0, 0, 0, 0], np.float32) for s in set_a]

    fa = extract_features(model, vs, set_a, batch_size=3, h=16, w=64)
    fb = extract_features(model, vs, set_b, batch_size=3, h=16, w=64)
    assert fa.shape == (6, 16, 64, 32)

    same = compute_frd(fa, fa.copy(), n_dims=64)
    diff = compute_frd(fa, fb, n_dims=64)
    assert abs(same) < 1e-4
    assert diff > same
    assert np.isfinite(diff)


def test_generated_sample_files_numeric_order(tmp_path):
    """compute_frd_for_dirs must truncate the unpadded {i}.bin dumps in
    INTEGER index order: a lexicographic sort under limit picks
    {0, 1, 10, ...} — a different subset than the reference's first-N."""
    from rangeldm_tpu.metrics.frd_pipeline import generated_sample_files
    for i in range(12):
        (tmp_path / f"{i}.bin").write_bytes(b"\0" * 16)
    got = [int(f.rsplit("/", 1)[-1][:-4])
           for f in generated_sample_files(str(tmp_path), 3)]
    assert got == [0, 1, 2]
    import pytest
    with pytest.raises(FileNotFoundError, match="no generated"):
        generated_sample_files(str(tmp_path / "empty"), 3)


def test_segmentation_scores_reject_mismatched_index_sets(tmp_path):
    """Equal-count result/target dirs with different index sets must error
    instead of silently pairing by position (the reference pairs by
    integer filename, iou.py)."""
    import pytest
    from rangeldm_tpu.metrics.frd_pipeline import compute_segmentation_scores
    for sub, idxs in (("result", [0, 1, 3]), ("target", [0, 1, 2])):
        d = tmp_path / f"densification_{sub}"
        d.mkdir()
        for i in idxs:
            np.save(d / f"{i}.npy", np.zeros((8, 16, 1), np.float32))
    with pytest.raises(ValueError, match="index set"):
        compute_segmentation_scores(str(tmp_path), "densification",
                                    rangenet_dir="unused-never-loaded")


def test_chamfer_all_invalid_side_is_nan():
    """A side with zero valid points has no defined chamfer — the metric
    must surface NaN, not the 1e30 masking sentinel."""
    from rangeldm_tpu.metrics.chamfer import chamfer_distance
    a = np.random.default_rng(0).standard_normal((32, 3)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((16, 3)).astype(np.float32)
    d = chamfer_distance(a, b, b_valid=np.zeros(16, bool))
    assert np.isnan(float(d))
    d = chamfer_distance(a, b, a_valid=np.zeros(32, bool))
    assert np.isnan(float(d))
    # both sides valid stays finite and positive
    assert float(chamfer_distance(a, b)) > 0


def test_frd_from_activations_matches_compute_frd(rng):
    """compute_frd == host subsample + frd_from_activations (the pipeline
    gathers the same subsample on device)."""
    from rangeldm_tpu.metrics.frd import (
        compute_frd, features_to_activations, frd_from_activations,
        frd_indices,
    )
    fa = rng.standard_normal((6, 4, 8, 3)).astype(np.float32)
    fb = rng.standard_normal((6, 4, 8, 3)).astype(np.float32)
    idx = frd_indices(n_dims=16, total=4 * 8 * 3)
    via_acts = frd_from_activations(features_to_activations(fa, idx),
                                    features_to_activations(fb, idx))
    assert via_acts == pytest.approx(compute_frd(fa, fb, n_dims=16))
