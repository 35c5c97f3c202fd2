"""The bench orchestrator's host-side pieces (no jax, no TPU): child-output
parsing and the synthetic-workload/baseline plumbing the driver-recorded
headline depends on (round-2 postmortem: an orchestration bug, not a
kernel, lost the round's number)."""

import numpy as np

import bench


def test_last_json_dict_ignores_scalar_lines():
    text = ('some log line\n{"metric": "m", "value": 1.5}\n'
            'null\n42\n"tail"')
    assert bench._last_json_dict(text) == {"metric": "m", "value": 1.5}
    assert bench._last_json_dict("no json here\nnull\n17") is None
    assert bench._last_json_dict("") is None
    # last dict wins
    two = '{"a": 1}\n{"b": 2}'
    assert bench._last_json_dict(two) == {"b": 2}


def test_make_workload_shapes_and_determinism():
    X, z, Xs = bench.make_workload(4, 32, 8, 3)
    assert X.shape == (4, 32, 3) and z.shape == (4, 32) and \
        Xs.shape == (4, 8, 3)
    assert (X[..., 2] == 0).all()          # time axis pinned
    X2, z2, _ = bench.make_workload(4, 32, 8, 3)
    np.testing.assert_array_equal(X, X2)   # seeded: baseline and child see
    np.testing.assert_array_equal(z, z2)   # identical expert datasets


def test_baseline_rate_runs_scipy_path():
    X, z, Xs = bench.make_workload(2, 48, 8, 3)
    rate = bench.baseline_rate(X, z, Xs, n_sample=1)
    assert np.isfinite(rate) and rate > 0
