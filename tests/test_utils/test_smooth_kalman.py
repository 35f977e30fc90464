"""Smoothing + Kalman utility tests (host-side).

(ref coverage: tests/test/test_utils/test_smooth.py and the Kalman
usage in _execute/main.py:483-497.)"""

import numpy as np

from mayamatchmovesolver_tpu.utils import kalmanfilter, smooth


def test_smooth_noop_below_width_one():
    data = [1.0, 5.0, 2.0, 8.0]
    for t in smooth.SMOOTH_TYPES:
        out = smooth.smooth(t, data, 1.0)
        np.testing.assert_allclose(out, data)


def test_average_smooth_reduces_variance():
    rng = np.random.RandomState(0)
    data = rng.randn(50)
    out = np.asarray(smooth.average_smooth(data, 3.0))
    assert out.std() < data.std()
    assert len(out) == len(data)


def test_gaussian_smooth_constant_preserved():
    data = [4.2] * 20
    out = smooth.gaussian_smooth(data, 5.0)
    np.testing.assert_allclose(out, data, atol=1e-12)


def test_fourier_smooth_filters():
    t = np.linspace(0, 4 * np.pi, 64)
    clean = np.sin(t)
    noisy = clean + 0.3 * np.sin(40 * t)
    for filtr in ("gaussian", "triangle", "box"):
        out = np.asarray(smooth.fourier_smooth(noisy, 4.0, filtr=filtr))
        assert len(out) == len(noisy)
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()


def test_kalman_update_reduces_variance():
    a = kalmanfilter.State(value=1.0, mean=1.0, variance=2.0)
    b = kalmanfilter.State(value=1.4, mean=1.4, variance=1.0)
    fused = kalmanfilter.update(a, b)
    assert fused.variance < min(a.variance, b.variance)
    assert a.mean < fused.mean < b.mean


def test_kalman_predict_adds():
    a = kalmanfilter.State(value=1.0, mean=1.0, variance=0.5)
    b = kalmanfilter.State(value=0.2, mean=0.2, variance=0.1)
    pred = kalmanfilter.predict(a, b)
    np.testing.assert_allclose(pred.mean, 1.2)
    np.testing.assert_allclose(pred.variance, 0.6)


def test_rootframe_selection():
    from mayamatchmovesolver_tpu.solver import rootframe

    enable = np.zeros((2, 10))
    enable[0, 0:6] = 1
    enable[1, 4:10] = 1
    frames = list(range(1, 11))
    roots = rootframe.get_root_frames_from_markers(enable, frames)
    assert 1 in roots and 6 in roots  # marker 0 start/end
    assert 5 in roots and 10 in roots  # marker 1 start/end

    divided = rootframe.root_frames_subdivide([1, 20], 5)
    assert max(
        b - a for a, b in zip(divided, divided[1:])
    ) <= 5

    combined = rootframe.root_frames_list_combine([1, 5], [5, 9])
    assert combined == [1, 5, 9]
