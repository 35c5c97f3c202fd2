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


def test_classify_timeout_cold_compile_vs_stall():
    # cold cache: a MISS logged during warm-up names the program and the fix
    cold = [{"t": 0.1, "event": "start", "mode": "gpr"},
            {"t": 8.0, "event": "warmup_start"},
            {"t": 9.2, "event": "cache_miss", "program": "_lbfgs_pool_jit"}]
    msg = bench._classify_timeout(cold, 280)
    assert "cold compile cache" in msg and "_lbfgs_pool_jit" in msg \
        and "prewarm" in msg
    # stall: every lookup hit, still stuck in warm-up => tunnel stall
    stall = [{"t": 0.1, "event": "start", "mode": "gpr"},
             {"t": 8.0, "event": "warmup_start"},
             {"t": 9.0, "event": "cache_hit", "program": "_lbfgs_pool_jit"}]
    msg = bench._classify_timeout(stall, 280)
    assert "tunnel stall" in msg and "cold" not in msg
    # stall after a completed warm-up => measurement stall, cache warm
    meas = stall + [{"t": 60.0, "event": "warmup_done", "secs": 52.0},
                    {"t": 61.0, "event": "measure_start"}]
    assert "measured sweep" in bench._classify_timeout(meas, 280)
    # no events at all
    assert "before jax init" in bench._classify_timeout([], 280)


def test_progress_file_roundtrip(tmp_path, monkeypatch):
    path = tmp_path / "p.progress"
    monkeypatch.setenv(bench._PROGRESS_ENV, str(path))
    bench._progress("start", mode="gpr")
    bench._progress("cache_miss", program="jit_foo")
    events = bench._read_progress(str(path))
    assert [e["event"] for e in events] == ["start", "cache_miss"]
    assert events[1]["program"] == "jit_foo"
    # corrupt lines are skipped, not fatal
    with open(path, "a") as fh:
        fh.write("not json\n")
    assert len(bench._read_progress(str(path))) == 2


def test_cache_log_handler_parses_jax_messages(tmp_path, monkeypatch):
    import logging
    path = tmp_path / "p.progress"
    monkeypatch.setenv(bench._PROGRESS_ENV, str(path))
    h = bench._CacheLogHandler()
    # the exact formats jax._src.compiler emits (hit lower-case, MISS caps)
    rec = logging.LogRecord("jax._src.compiler", logging.DEBUG, "", 0,
                            "Persistent compilation cache hit for '%s' with "
                            "key %r", ("jit_sweep", "abc"), None)
    h.emit(rec)
    rec = logging.LogRecord("jax._src.compiler", logging.DEBUG, "", 0,
                            "PERSISTENT COMPILATION CACHE MISS for '%s' with "
                            "key %r", ("jit__lbfgs_pool_jit", "def"), None)
    h.emit(rec)
    assert h.hits == ["jit_sweep"] and h.misses == ["jit__lbfgs_pool_jit"]
    events = bench._read_progress(str(path))
    assert [e["event"] for e in events] == ["cache_hit", "cache_miss"]
    # a miss is only significant once jax confirms a >=1s compile — tiny op
    # compiles (never persisted) must not flag a warm cache as cold
    assert h.significant_misses() == []
    rec = logging.LogRecord("jax._src.compiler", logging.DEBUG, "", 0,
                            "'%s' took at least 1.00 seconds to compile "
                            "(%.2fs)", ("jit__lbfgs_pool_jit", 780.0), None)
    h.emit(rec)
    assert h.significant_misses() == ["jit__lbfgs_pool_jit"]


def test_run_child_strips_leaked_warmup_flag(monkeypatch):
    """A GPSAT_BENCH_WARMUP_ONLY leaked from a user's prewarm shell must not
    turn 'all'-mode children into warm-up-only runs (their result would have
    no 'value' key and the extras loop would KeyError before the mandatory
    JSON line prints)."""
    captured = {}

    def fake_run(cmd, capture_output, text, timeout, env):
        captured["env"] = env

        class R:
            stdout = '{"value": 1.0, "unit": "u"}'
            stderr = ""
            returncode = 0
        return R()

    monkeypatch.setenv("GPSAT_BENCH_WARMUP_ONLY", "1")
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    result = bench._run_child("gpr", timeout_s=5.0, measure_baseline=False)
    assert result == {"value": 1.0, "unit": "u"}
    assert "GPSAT_BENCH_WARMUP_ONLY" not in captured["env"]
    assert captured["env"]["GPSAT_BENCH_NO_BASELINE"] == "1"


def test_classify_timeout_short_gap_is_ambiguous():
    """A cache_miss immediately before the cap is cold-compile OR a stall
    after a trivial-op miss — the verdict must say retry-first, while a long
    silent gap after the miss is confidently a cold compile."""
    ev = [{"t": 1.0, "event": "start"}, {"t": 2.0, "event": "warmup_start"},
          {"t": 250.0, "event": "cache_miss", "program": "jit_subtract"}]
    msg = bench._classify_timeout(ev, 280.0)
    assert "retry" in msg and "prewarm" in msg
    ev[-1]["t"] = 30.0
    msg = bench._classify_timeout(ev, 280.0)
    assert "cold compile cache" in msg and "jit_subtract" in msg
